package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GoldenEval
import graft.functions.GoldenEval.compareField

/** EXACT/NORMALIZED/FUZZY/NUMERIC match ladder goldens — semantics pinned
  * to the reference's src/evaluation/metrics.py:286-454.
  */
class GoldenEvalSpec extends AnyFunSuite {

  test("none handling: both-none match, single-none no-match") {
    assert(compareField(None, None, "exact") == GoldenEval.MatchResult(true, 1.0))
    assert(compareField(Some("x"), None, "exact") == GoldenEval.MatchResult(false, 0.0))
    assert(compareField(None, Some("x"), "normalized") == GoldenEval.MatchResult(false, 0.0))
  }

  test("exact: string equality; similarity is raw Levenshtein ratio") {
    assert(compareField(Some("AB"), Some("AB"), "exact").isMatch)
    val r = compareField(Some("kitten"), Some("sitting"), "exact")
    assert(!r.isMatch && math.abs(r.similarity - (1.0 - 3.0 / 7)) < 1e-12)
    // case matters at EXACT
    assert(!compareField(Some("ab"), Some("AB"), "exact").isMatch)
  }

  test("normalized: case/whitespace-insensitive equality") {
    assert(compareField(Some("John  Doe"), Some("john doe"), "normalized").isMatch)
    assert(compareField(Some("  a b "), Some("A\tB"), "normalized").isMatch)
    assert(!compareField(Some("john doe"), Some("jane doe"), "normalized").isMatch)
  }

  test("fuzzy: ratio threshold 0.85 on normalized strings") {
    // one char dropped from a 10-char string: ratio 0.9 >= 0.85
    assert(compareField(Some("montgomery"), Some("montgomer"), "fuzzy").isMatch)
    // short string, one char off: 3/4 = 0.75 < 0.85
    assert(!compareField(Some("abcd"), Some("abce"), "fuzzy").isMatch)
    val r = compareField(Some("ABCD"), Some("abcd"), "fuzzy")
    assert(r.isMatch && r.similarity == 1.0) // normalization first
  }

  test("numeric: currency stripped, relative tolerance, fallbacks") {
    assert(compareField(Some("$1,234.50"), Some("1234.50"), "numeric").isMatch)
    // within 1% relative tolerance
    assert(compareField(Some("100"), Some("100.9"), "numeric").isMatch)
    assert(!compareField(Some("100"), Some("102"), "numeric").isMatch)
    // zero expected: only zero matches
    assert(compareField(Some("0"), Some("0.00"), "numeric").isMatch)
    assert(!compareField(Some("0"), Some("1"), "numeric").isMatch)
    // unparseable -> normalized fallback
    assert(compareField(Some("n/a"), Some("N/A"), "numeric").isMatch)
    assert(!compareField(Some("n/a"), Some("12"), "numeric").isMatch)
  }

  test("levenshtein ratio edge cases") {
    assert(GoldenEval.levRatio("", "") == 1.0)
    assert(GoldenEval.levRatio("a", "") == 0.0)
    assert(GoldenEval.levRatio("abc", "abc") == 1.0)
    assert(math.abs(GoldenEval.levRatio("flaw", "lawn") - 0.5) < 1e-12)
  }
}
