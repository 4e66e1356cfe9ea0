package graft

import java.time.LocalDate
import graft.functions.Dates
import org.scalatest.funsuite.AnyFunSuite

/** Parity with reference src/utils/date_utils.py:17-91 (13 gated formats +
  * 5 fallbacks, strptime two-digit-year pivot).
  */
class DatesSpec extends AnyFunSuite {

  test("docstring goldens") {
    assert(Dates.parseDate("01/15/2024").contains(LocalDate.of(2024, 1, 15)))
    assert(Dates.parseDate("2024-01-15").contains(LocalDate.of(2024, 1, 15)))
    assert(Dates.parseDate("January 15, 2024").contains(LocalDate.of(2024, 1, 15)))
  }

  test("all 13 gated formats") {
    val d = LocalDate.of(2024, 1, 5)
    assert(Dates.parseDate("1/5/2024").contains(d))
    assert(Dates.parseDate("1-5-2024").contains(d))
    assert(Dates.parseDate("1/5/24").contains(d))
    assert(Dates.parseDate("1-5-24").contains(d))
    assert(Dates.parseDate("2024-01-05").contains(d))
    assert(Dates.parseDate("2024/01/05").contains(d))
    assert(Dates.parseDate("January 5, 2024").contains(d))
    assert(Dates.parseDate("January 5 2024").contains(d))
    assert(Dates.parseDate("5 January 2024").contains(d))
    assert(Dates.parseDate("Jan 5, 2024").contains(d))
    assert(Dates.parseDate("Jan 5 2024").contains(d))
    assert(Dates.parseDate("01052024").contains(d))
    assert(Dates.parseDate("010524").contains(d))
  }

  test("two-digit-year strptime pivot: 00-68 -> 20xx, 69-99 -> 19xx") {
    assert(Dates.parseDate("1/5/68").contains(LocalDate.of(2068, 1, 5)))
    assert(Dates.parseDate("1/5/69").contains(LocalDate.of(1969, 1, 5)))
    assert(Dates.parseDate("1/5/99").contains(LocalDate.of(1999, 1, 5)))
    assert(Dates.parseDate("1/5/00").contains(LocalDate.of(2000, 1, 5)))
  }

  test("fallback: day-first rescues invalid US month") {
    assert(Dates.parseDate("25/12/2024").contains(LocalDate.of(2024, 12, 25)))
    assert(Dates.parseDate("25-12-2024").contains(LocalDate.of(2024, 12, 25)))
  }

  test("case-insensitive month names") {
    assert(Dates.parseDate("JANUARY 5, 2024").contains(LocalDate.of(2024, 1, 5)))
    assert(Dates.parseDate("jan 5, 2024").contains(LocalDate.of(2024, 1, 5)))
  }

  test("failures return None") {
    assert(Dates.parseDate("").isEmpty)
    assert(Dates.parseDate(null).isEmpty)
    assert(Dates.parseDate("not a date").isEmpty)
    assert(Dates.parseDate("13/45/2024").isEmpty)
  }

  test("helpers") {
    assert(Dates.normalizeDate("01/15/2024").contains("2024-01-15"))
    assert(Dates.isValidDate("2024-02-29"))      // leap
    assert(!Dates.isValidDate("2023-02-29"))
    assert(Dates.dateDifferenceDays("01/01/2024", "01/31/2024").contains(30L))
    assert(Dates.datesInOrder(Seq("01/01/2024", "01/02/2024", "01/02/2024")))
    assert(!Dates.datesInOrder(Seq("01/02/2024", "01/01/2024")))
    val asOf = LocalDate.of(2026, 8, 16)
    assert(Dates.isPlausibleDate("01/01/2024", asOf))
    assert(!Dates.isPlausibleDate("01/01/1899", asOf))
    assert(!Dates.isPlausibleDate("01/01/2031", asOf))
    assert(Dates.parsePdfDate("D:20240115120000").contains(LocalDate.of(2024, 1, 15)))
    assert(Dates.parsePdfDate("garbage").isEmpty)
  }

  test("calculate_age adjusts for unreached birthdays (date_utils.py:214-250)") {
    val asOf = LocalDate.of(2024, 6, 15)
    assert(Dates.calculateAge("01/15/1990", asOf).contains(34))
    assert(Dates.calculateAge("12/15/1990", asOf).contains(33)) // birthday later in year
    assert(Dates.calculateAge("06/15/1990", asOf).contains(34)) // birthday today
    assert(Dates.calculateAge("not a date", asOf).isEmpty)
  }

  test("parse_date_range: separators + single-date fallback (date_utils.py:118-157)") {
    assert(Dates.parseDateRange("01/01/2024 - 01/31/2024") ==
      (Some(LocalDate.of(2024, 1, 1)), Some(LocalDate.of(2024, 1, 31))))
    assert(Dates.parseDateRange("01/01/2024 to 01/31/2024") ==
      (Some(LocalDate.of(2024, 1, 1)), Some(LocalDate.of(2024, 1, 31))))
    val single = Dates.parseDateRange("01/15/2024")
    assert(single._1 == single._2 && single._1.contains(LocalDate.of(2024, 1, 15)))
    assert(Dates.parseDateRange("") == (None, None))
  }
}
