package graft

import graft.functions.{Hashing, Strings, TextAnalysis}
import graft.model.{Doc, Span, SpanKind}
import graft.tokenize.SpanTokenizer
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties (SURVEY.md §5): tokenizer totality, offset
  * monotonicity, normalization idempotence, sketch invariants.
  */
class PropertiesSpec extends AnyFunSuite {
  /** scalatestplus bridge is not in the offline cache; run ScalaCheck directly. */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  private val rawKind = Gen.oneOf(
    SpanKind.Html, SpanKind.PdfText, SpanKind.TableRaw, SpanKind.Media,
    SpanKind.Edi, "garbage")
  private val rawSpan: Gen[(String, String)] = for {
    k <- rawKind
    t <- Gen.asciiPrintableStr
  } yield (k, t)
  private val doc: Gen[Doc] = for {
    id <- Gen.alphaNumStr.map("doc_" + _)
    spans <- Gen.listOfN(6, rawSpan)
  } yield Doc(id, spans.zipWithIndex.map { case ((k, t), i) =>
    Span(k, t, if (k == SpanKind.Media) s"ref_$i" else "", i)
  })

  test("tokenizer is total and offsets are exactly 0..n-1") {
    check(Prop.forAll(doc) { d =>
      val out = SpanTokenizer.extract(d)
      out.spans.map(_.offset) == out.spans.indices &&
        out.n_spans == out.spans.length
    })
  }

  test("tokenizer is deterministic and input-order independent") {
    check(Prop.forAll(doc) { d =>
      val shuffled = Doc(d.doc_id, d.spans.reverse)
      SpanTokenizer.extract(d) == SpanTokenizer.extract(shuffled)
    })
  }

  test("normalizeWhitespace is idempotent") {
    check(Prop.forAll { (s: String) =>
      val once = Strings.normalizeWhitespace(s)
      Strings.normalizeWhitespace(once) == once
    })
  }

  test("cleanOcrText is idempotent") {
    check(Prop.forAll { (s: String) =>
      val once = Strings.cleanOcrText(s)
      Strings.cleanOcrText(once) == once
    })
  }

  test("levenshtein is a metric (symmetry + identity + triangle on samples)") {
    val short = Gen.resize(12, Gen.asciiPrintableStr)
    check(Prop.forAll(short, short, short) { (a: String, b: String, c: String) =>
      val ab = Strings.levenshtein(a, b)
      ab == Strings.levenshtein(b, a) &&
        Strings.levenshtein(a, a) == 0 &&
        ab <= Strings.levenshtein(a, c) + Strings.levenshtein(c, b)
    })
  }

  test("minhash similarity estimates Jaccard within tolerance") {
    val words = Gen.listOfN(60, Gen.oneOf("alpha", "beta", "gamma", "delta",
      "epsilon", "zeta", "eta", "theta", "iota", "kappa"))
    check(Prop.forAll(words, words) { (w1: List[String], w2: List[String]) =>
      val s1 = TextAnalysis.shingles(w1.mkString(" "), 2).toSet
      val s2 = TextAnalysis.shingles(w2.mkString(" "), 2).toSet
      val trueJ =
        if (s1.isEmpty && s2.isEmpty) 1.0
        else if (s1.isEmpty || s2.isEmpty) 0.0
        else s1.intersect(s2).size.toDouble / s1.union(s2).size
      val est = Hashing.minhashSimilarity(
        Hashing.minhashSignature(s1, 128), Hashing.minhashSignature(s2, 128))
      math.abs(est - trueJ) <= 0.25
    })
  }

  test("simhash: identical inputs hash identically; hamming bounded") {
    check(Prop.forAll(Gen.listOfN(20, Gen.alphaStr)) { (ws: List[String]) =>
      val h1 = Hashing.simhash64(ws)
      val h2 = Hashing.simhash64(ws)
      h1 == h2 && Hashing.hammingDistance64(h1, h2) == 0
    })
  }

  test("lsh band keys: equal signatures share all bands") {
    check(Prop.forAll(Gen.listOfN(16, Gen.choose(Long.MinValue, Long.MaxValue))) {
      (xs: List[Long]) =>
        val sig = xs.toArray
        Hashing.lshBandKeys(sig, 4).sameElements(Hashing.lshBandKeys(sig.clone(), 4))
    })
  }

  test("fingerprint stable under whitespace jitter") {
    check(Prop.forAll(Gen.listOfN(30, Gen.alphaStr.suchThat(_.nonEmpty))) {
      (ws: List[String]) =>
        val a = ws.mkString(" ")
        val b = ws.mkString("   ")
        TextAnalysis.fingerprint(a) == TextAnalysis.fingerprint(b) &&
          TextAnalysis.fingerprintFull(a) == TextAnalysis.fingerprintFull(b)
    })
  }

  test("winnowed fingerprint buckets near-dups; full fingerprint separates them") {
    // appending a suffix leaves the min-8 window hashes intact when the
    // suffix windows hash high — winnowing is a NEAR-DUP bucket key
    val base = "the quick brown fox jumps over the lazy dog again and again " * 4
    val long = base * 8
    // full fingerprint: any content change must change the fold
    assert(TextAnalysis.fingerprintFull(long) != TextAnalysis.fingerprintFull(long + " tail"))
    assert(TextAnalysis.fingerprintFull(long) == TextAnalysis.fingerprintFull(long.toUpperCase))
    // winnowed fingerprint of a doc vs itself + one word: equal whenever the
    // new windows don't displace the 8 minima (holds for this fixture)
    val win1 = TextAnalysis.fingerprint(long)
    val win2 = TextAnalysis.fingerprint(long + " zzz")
    assert(win1 == win2, "suffix displaced a winnowing minimum unexpectedly")
  }

  test("token-array minhash/simhash fast paths are bit-identical to the string-shingle forms") {
    check(Prop.forAll(Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr)).map(_.mkString(" "))) { text =>
      val toks = Strings.splitWs(if (text == null) "" else text.toLowerCase)
      val fast = Hashing.minhashFromTokens(toks, 3, 64).toSeq
      val slow = Hashing.minhashSignature(TextAnalysis.shingles(text, 3).toSet, 64).toSeq
      val fastSim = Hashing.simhashFromTokens(toks)
      val slowSim = Hashing.simhash64(TextAnalysis.shingles(text, 1))
      fast == slow && fastSim == slowSim
    })
  }
}
