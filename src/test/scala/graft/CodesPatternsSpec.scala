package graft

import graft.functions.{Codes, Patterns}
import org.scalatest.funsuite.AnyFunSuite

/** Parity with reference validators (src/schemas/validators.py,
  * src/validation/medical_codes.py) and the hallucination pattern detector
  * (src/validation/pattern_detector.py:151-232).
  */
class CodesPatternsSpec extends AnyFunSuite {

  test("NPI modified Luhn (80840 prefix)") {
    assert(Codes.validateNpi("1234567893"))        // validators.py docstring golden
    assert(!Codes.validateNpi("1234567890"))       // bad checksum
    assert(!Codes.validateNpi("9234567893"))       // must start 1|2
    assert(!Codes.validateNpi("123456789"))        // 9 digits
    assert(Codes.validateNpi("123-456-7893"))      // separators stripped
    assert(!Codes.validateNpi(null))
  }

  test("CPT / ICD-10 / HCPCS / NDC / POS shapes") {
    assert(Codes.validCpt("99213"))
    assert(!Codes.validCpt("9921"))
    assert(!Codes.validCpt("A9213"))
    assert(Codes.validIcd10("E11.9"))
    assert(Codes.validIcd10("A00"))
    assert(Codes.validIcd10("e11.9"))              // case-insensitive
    assert(!Codes.validIcd10("U07.1"))             // U excluded from [A-TV-Z]
    assert(!Codes.validIcd10("123"))
    assert(Codes.validHcpcs("J1100"))
    assert(!Codes.validHcpcs("j1100"))
    assert(Codes.validNdc("12345-6789-01"))
    assert(Codes.validNdc("12345678901"))
    assert(!Codes.validNdc("1234-56-789"))
    assert(Codes.validPos("11"))
    assert(!Codes.validPos("35"))
    assert(Codes.normalizePhone("(555) 123-4567").contains("5551234567"))
    assert(Codes.normalizePhone("555.123.4567").contains("5551234567"))
    assert(Codes.normalizePhone("12345").isEmpty)
    assert(Codes.validSsn("123-45-6789"))
    assert(!Codes.validSsn("000-45-6789"))
    assert(!Codes.validSsn("666-45-6789"))
    assert(!Codes.validSsn("923-45-6789"))
    assert(!Codes.validSsn("123-00-6789"))
  }

  test("placeholder patterns (pattern_detector.py:151-170)") {
    for (v <- Seq("N/A", "na", "TBD", "xxx", "XXXX", "placeholder", "unknown",
        "not applicable", "notavailable", "none", "null", "undefined",
        "to be determined", "pending", "missing", "[value]", "<name>", "___",
        "***", "...."))
      assert(Patterns.isPlaceholder(v), s"expected placeholder: $v")
    for (v <- Seq("Alice Smith", "99213", "real value", ""))
      assert(!Patterns.isPlaceholder(v), s"not placeholder: $v")
  }

  test("generic names/addresses and test data") {
    assert(Patterns.isGenericName("John Doe"))
    assert(Patterns.isGenericName("  jane   smith "))
    assert(!Patterns.isGenericName("Alice Cooper"))
    assert(Patterns.isGenericAddress("123 Main St"))
    assert(!Patterns.isGenericAddress("17 Accacia Ave"))
    assert(Patterns.isTestData("test"))
    assert(Patterns.isTestData("Sample 3"))
    assert(Patterns.isTestData("demo42"))
    assert(!Patterns.isTestData("testimony"))
  }

  test("sequential/repeated digits (test_reconciler.py:120-135)") {
    assert(Patterns.isSequentialDigits("12345"))
    assert(Patterns.isSequentialDigits("54321"))
    assert(!Patterns.isSequentialDigits("99213"))
    assert(Patterns.hasRepeatedDigits("99999"))
    assert(!Patterns.hasRepeatedDigits("9999"))
  }

  test("round numbers + suspicion scoring") {
    assert(Patterns.isSuspiciousRoundNumber(1000.0, "currency"))
    assert(!Patterns.isSuspiciousRoundNumber(1001.0, "currency"))
    // one critical placeholder = 0.8 >= 0.70 threshold
    assert(Patterns.isLikelyHallucination(Seq("N/A", "Alice")))
    // clean record scores 0
    assert(Patterns.suspicionScore(Seq("Alice Smith", "42.17")) == 0.0)
    // score capped at 1.0
    assert(Patterns.suspicionScore(Seq("N/A", "TBD", "none", "null")) == 1.0)
  }
}
