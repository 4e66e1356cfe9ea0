package graft.functions

/** Golden-dataset evaluation: the EXACT / NORMALIZED / FUZZY / NUMERIC
  * field-match ladder with similarity scoring. Semantics pinned to the
  * reference's src/evaluation/metrics.py:286-454 (normalize, Levenshtein
  * ratio, currency-stripping number parse, per-level match + fallbacks).
  */
object GoldenEval {

  val FuzzyThreshold = 0.85
  val NumericTolerance = 0.01

  private val wsRe = java.util.regex.Pattern.compile("\\s+")
  private val curRe = java.util.regex.Pattern.compile("[$€£¥,]")

  /** `_normalize`: lowercase, trim, collapse whitespace. */
  def normalize(v: String): String =
    if (v == null) "" else wsRe.matcher(v.trim.toLowerCase).replaceAll(" ")

  /** `_levenshtein_ratio`: 1 - distance / max_len. */
  def levRatio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    val m = a.length; val n = b.length
    var prev = Array.tabulate(n + 1)(identity)
    var curr = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      curr(0) = i
      var j = 1
      while (j <= n) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        curr(j) = math.min(math.min(curr(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    1.0 - prev(n).toDouble / math.max(m, n)
  }

  /** `_parse_number`: strip currency symbols and thousands separators. */
  def parseNumber(v: String): Option[Double] = {
    if (v == null) return None
    val s = curRe.matcher(v.trim).replaceAll("").trim
    if (s.isEmpty) None
    else try Some(s.toDouble) catch { case _: Exception => None }
  }

  final case class MatchResult(isMatch: Boolean, similarity: Double)

  /** `compare_field`: None/None match, single-None no-match, then the
    * level-specific comparison (NUMERIC falls back to NORMALIZED when a
    * side does not parse).
    */
  def compareField(
      expected: Option[String],
      extracted: Option[String],
      level: String,
      fuzzyThreshold: Double = FuzzyThreshold,
      numericTolerance: Double = NumericTolerance): MatchResult = {
    (expected, extracted) match {
      case (None, None) => MatchResult(isMatch = true, 1.0)
      case (None, _) | (_, None) => MatchResult(isMatch = false, 0.0)
      case (Some(e), Some(x)) =>
        level match {
          case "exact" =>
            if (e == x) MatchResult(isMatch = true, 1.0)
            else MatchResult(isMatch = false, levRatio(e, x))
          case "fuzzy" =>
            val sim = levRatio(normalize(e), normalize(x))
            MatchResult(sim >= fuzzyThreshold, sim)
          case "numeric" =>
            (parseNumber(e), parseNumber(x)) match {
              case (Some(ne), Some(nx)) =>
                if (ne == 0.0) MatchResult(nx == 0.0, if (nx == 0.0) 1.0 else 0.0)
                else {
                  val rel = (ne - nx).abs / ne.abs
                  MatchResult(rel <= numericTolerance, math.max(0.0, 1.0 - rel))
                }
              case _ => // fall back to normalized comparison
                compareField(expected, extracted, "normalized")
            }
          case _ => // "normalized" (and the reference's default fallback)
            val (ne, nx) = (normalize(e), normalize(x))
            if (ne == nx) MatchResult(isMatch = true, 1.0)
            else MatchResult(isMatch = false, levRatio(ne, nx))
        }
    }
  }
}
