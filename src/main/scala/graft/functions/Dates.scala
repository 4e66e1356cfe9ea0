package graft.functions

import java.time.LocalDate
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder, ResolverStyle}
import java.time.temporal.ChronoField
import java.util.Locale
import scala.util.matching.Regex

/** Date parsing/formatting with the reference's permissive semantics
  * (src/utils/date_utils.py:17-91): 13 regex-gated formats, then 5 fallback
  * formats, returning None when nothing matches. Two-digit years use the
  * strptime pivot (00-68 -> 20xx, 69-99 -> 19xx).
  */
object Dates {

  private def fmt(pattern: String): DateTimeFormatter =
    new DateTimeFormatterBuilder()
      .parseCaseInsensitive()
      .appendPattern(pattern)
      .toFormatter(Locale.US)
      .withResolverStyle(ResolverStyle.STRICT)

  /** strptime-compatible two-digit-year formatter: base range 1969..2068. */
  private def fmt2y(prefix: String, sep: String): DateTimeFormatter =
    new DateTimeFormatterBuilder()
      .parseCaseInsensitive()
      .appendPattern(prefix + sep)
      .appendValueReduced(ChronoField.YEAR, 2, 2, 1969)
      .toFormatter(Locale.US)
      .withResolverStyle(ResolverStyle.STRICT)

  private def fmtCompact2y: DateTimeFormatter =
    new DateTimeFormatterBuilder()
      .parseCaseInsensitive()
      .appendPattern("MMdd")
      .appendValueReduced(ChronoField.YEAR, 2, 2, 1969)
      .toFormatter(Locale.US)
      .withResolverStyle(ResolverStyle.STRICT)

  // (gate regex, formatter) pairs in reference order (date_utils.py:17-35)
  private val gated: Seq[(Regex, DateTimeFormatter)] = Seq(
    ("^\\d{1,2}/\\d{1,2}/\\d{4}$".r, fmt("M/d/uuuu")),
    ("^\\d{1,2}-\\d{1,2}-\\d{4}$".r, fmt("M-d-uuuu")),
    ("^\\d{1,2}/\\d{1,2}/\\d{2}$".r, fmt2y("M/d", "/")),
    ("^\\d{1,2}-\\d{1,2}-\\d{2}$".r, fmt2y("M-d", "-")),
    ("^\\d{4}-\\d{2}-\\d{2}$".r, fmt("uuuu-MM-dd")),
    ("^\\d{4}/\\d{2}/\\d{2}$".r, fmt("uuuu/MM/dd")),
    ("^\\w+ \\d{1,2}, \\d{4}$".r, fmt("MMMM d, uuuu")),
    ("^\\w+ \\d{1,2} \\d{4}$".r, fmt("MMMM d uuuu")),
    ("^\\d{1,2} \\w+ \\d{4}$".r, fmt("d MMMM uuuu")),
    ("^\\w{3} \\d{1,2}, \\d{4}$".r, fmt("MMM d, uuuu")),
    ("^\\w{3} \\d{1,2} \\d{4}$".r, fmt("MMM d uuuu")),
    ("^\\d{8}$".r, fmt("MMdduuuu")),
    ("^\\d{6}$".r, fmtCompact2y))

  private val fallbacks: Seq[DateTimeFormatter] = Seq(
    fmt("M/d/uuuu"), fmt("M-d-uuuu"), fmt("uuuu-M-d"), fmt("d/M/uuuu"), fmt("d-M-uuuu"))

  /** Parse to LocalDate or None (reference returns `default`). */
  def parseDate(s: String): Option[LocalDate] = {
    if (s == null) return None
    val t = s.trim
    if (t.isEmpty) return None
    gated.foreach { case (re, f) =>
      if (re.findFirstIn(t).isDefined) {
        try return Some(LocalDate.parse(t, f))
        catch { case _: Exception => () }
      }
    }
    fallbacks.foreach { f =>
      try return Some(LocalDate.parse(t, f))
      catch { case _: Exception => () }
    }
    None
  }

  /** Normalize any accepted format to ISO yyyy-MM-dd; None if unparseable.
    * Reference: date_utils.py normalize_date.
    */
  def normalizeDate(s: String): Option[String] =
    parseDate(s).map(_.format(DateTimeFormatter.ISO_LOCAL_DATE))

  def isValidDate(s: String): Boolean = parseDate(s).isDefined

  /** Signed day difference d2 - d1; None if either unparseable. */
  def dateDifferenceDays(d1: String, d2: String): Option[Long] =
    for (a <- parseDate(d1); b <- parseDate(d2))
      yield java.time.temporal.ChronoUnit.DAYS.between(a, b)

  /** True if the parsed dates are non-strictly ascending. */
  def datesInOrder(ds: Seq[String]): Boolean = {
    val parsed = ds.flatMap(parseDate)
    if (parsed.length != ds.length) return false
    parsed.sliding(2).forall {
      case Seq(a, b) => !a.isAfter(b)
      case _ => true
    }
  }

  /** Date plausibility window used by the hallucination detector
    * (pattern_detector.py:221-223): year >= 1900 and not more than
    * 2 years past `asOf`.
    */
  def isPlausibleDate(s: String, asOf: LocalDate): Boolean =
    parseDate(s).exists { d =>
      d.getYear >= 1900 && !d.isAfter(asOf.plusDays(365L * 2))
    }

  /** Age in whole years as of a date, adjusting for a birthday not yet
    * reached (date_utils.py:214-250). None when the birth date is
    * unparseable.
    */
  def calculateAge(birthDate: String, asOf: LocalDate): Option[Int] =
    parseDate(birthDate).map { b =>
      val raw = asOf.getYear - b.getYear
      val beforeBirthday = asOf.getMonthValue < b.getMonthValue ||
        (asOf.getMonthValue == b.getMonthValue && asOf.getDayOfMonth < b.getDayOfMonth)
      if (beforeBirthday) raw - 1 else raw
    }

  /** Parse "start <sep> end" date ranges; the separator ladder and the
    * single-date fallback mirror date_utils.py:118-157.
    */
  def parseDateRange(s: String): (Option[LocalDate], Option[LocalDate]) = {
    if (s == null || s.isEmpty) return (None, None)
    val seps = Seq(" - ", "-", " to ", " through ")
    seps.find(s.contains) match {
      case Some(sep) =>
        val Array(a, b) = s.split(java.util.regex.Pattern.quote(sep), 2)
        (parseDate(a.trim), parseDate(b.trim))
      case None =>
        val d = parseDate(s)
        (d, d)
    }
  }

  /** PDF `D:YYYYMMDDHHmmSS` date prefix parse
    * (reference pdf_processor.py:816-838): take the date part only.
    */
  def parsePdfDate(s: String): Option[LocalDate] = {
    if (s == null) return None
    val t = s.trim.stripPrefix("D:")
    if (t.length < 8 || !t.take(8).forall(_.isDigit)) return None
    try Some(LocalDate.of(t.take(4).toInt, t.slice(4, 6).toInt, t.slice(6, 8).toInt))
    catch { case _: Exception => None }
  }
}
