package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SchemaVersioning._

/** Mirrors the reference's schema-versioning unit behaviors
  * (`tests/unit/test_schema_versioning.py`): deterministic content hashes,
  * register/bump semantics (removal → minor, else patch, unchanged → same
  * version), diff classification with is_breaking, result migration, and
  * the reference's deliberate bump-vs-breaking asymmetry on type changes.
  */
class SchemaVersioningSpec extends AnyFunSuite {

  private val v1 = Seq(
    Field("claim_id", "string", required = true),
    Field("patient_name", "string", required = true),
    Field("total", "number", required = true),
    Field("notes", "string", required = false))

  test("hash is deterministic and order-insensitive (sorted by name)") {
    assert(schemaHash(v1) == schemaHash(v1.reverse))
    assert(schemaHash(v1).matches("[0-9a-f]{64}"))
  }

  test("hash changes with type, required flag, and field set") {
    val typ = v1.map(f => if (f.name == "total") f.copy(fieldType = "string") else f)
    val req = v1.map(f => if (f.name == "notes") f.copy(required = true) else f)
    assert(schemaHash(typ) != schemaHash(v1))
    assert(schemaHash(req) != schemaHash(v1))
    assert(schemaHash(v1.tail) != schemaHash(v1))
  }

  test("register: unchanged returns the same version, changed bumps patch") {
    assert(registerVersion("1.0.0", v1, v1) == ("1.0.0", false))
    val added = v1 :+ Field("auth_code", "string", required = false)
    assert(registerVersion("1.0.0", v1, added) == ("1.0.1", true))
    assert(registerVersion("2.3.7", v1, added) == ("2.3.8", true))
  }

  test("register: a removed field bumps minor and resets patch") {
    val removed = v1.filterNot(_.name == "notes")
    assert(registerVersion("1.0.0", v1, removed) == ("1.1.0", true))
    assert(registerVersion("2.3.7", v1, removed) == ("2.4.0", true))
  }

  test("diff classifies added / removed / type / required changes") {
    val v2 = v1.filterNot(_.name == "notes")
      .map(f => if (f.name == "total") f.copy(fieldType = "string") else f) :+
      Field("auth_code", "string", required = false)
    val d = diff(v1, v2)
    assert(d.changes.map(c => (c.changeType, c.fieldName)) == Seq(
      ("field_added", "auth_code"), ("field_removed", "notes"),
      ("field_type_changed", "total")))
    assert(d.isBreaking)
    assert(d.summary == "1 field(s) added; 1 field(s) removed; 1 other change(s)")
  }

  test("reference asymmetry: type change is breaking but only bumps patch") {
    val typ = v1.map(f => if (f.name == "total") f.copy(fieldType = "string") else f)
    assert(diff(v1, typ).isBreaking)
    assert(bumpVersion("1.0.0", v1, typ) == "1.0.1")
  }

  test("diff on identical schemas: no changes, not breaking, 'No changes'") {
    val d = diff(v1, v1)
    assert(d.changes.isEmpty && !d.isBreaking && d.summary == "No changes")
  }

  test("migrate: added fields appear as None, removed drop, renames move") {
    val result = v1.map(f => f.name -> Option(f.name + "_v")).toMap
    val added = migrate(result,
      Diff(Seq(Change("field_added", "auth_code")), isBreaking = false, ""))
    assert(added("auth_code").isEmpty && added.size == 5)
    val removed = migrate(result,
      Diff(Seq(Change("field_removed", "notes")), isBreaking = true, ""))
    assert(!removed.contains("notes") && removed.size == 3)
    val renamed = migrate(result,
      Diff(Seq(Change("field_renamed", "total",
        oldValue = Some("total"), newValue = Some("total_charges"))),
        isBreaking = false, ""))
    assert(renamed("total_charges").contains("total_v") && !renamed.contains("total"))
  }
}
