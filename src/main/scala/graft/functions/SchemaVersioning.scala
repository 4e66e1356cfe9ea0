package graft.functions

/** Schema versioning and migration (reference `src/schemas/versioning.py`):
  * content-hash change detection, semver bumps, field-level diffs with a
  * breaking-change flag, and result migration across versions.
  *
  * Two reference quirks mirrored deliberately:
  *  - the HASH covers (name, field_type, str(required)) of name-sorted
  *    fields with Python's capitalized booleans (`versioning.py:329-344`);
  *  - the VERSION BUMP treats only field REMOVALS as breaking (minor bump,
  *    `versioning.py:346-365`) while `diff().is_breaking` also counts type
  *    changes (`versioning.py:253-256`) — the two rules disagree on a
  *    type-changed schema, and we reproduce that asymmetry rather than
  *    "fixing" it.
  *
  * FIELD_RENAMED exists in the reference enum and migration switch but is
  * never produced by `_compute_changes` — same here: `migrate` handles a
  * rename change if handed one, `diff` never emits it.
  */
object SchemaVersioning {

  final case class Field(name: String, fieldType: String, required: Boolean)

  final case class Change(
      changeType: String,
      fieldName: String,
      oldValue: Option[String] = None,
      newValue: Option[String] = None)

  final case class Diff(changes: Seq[Change], isBreaking: Boolean, summary: String)

  /** SHA-256 over name-sorted (name, type, str(required)) triples —
    * `versioning.py:329-344` byte-for-byte (no cross-field rules here, and
    * an empty rule list contributes nothing there either).
    */
  def schemaHash(fields: Seq[Field]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    fields.sortBy(_.name).foreach { f =>
      md.update(f.name.getBytes("UTF-8"))
      md.update(f.fieldType.getBytes("UTF-8"))
      md.update((if (f.required) "True" else "False").getBytes("UTF-8"))
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Field-level changes, `versioning.py:367-420`: added, removed, then
    * type/required changes on common fields. The reference iterates dict
    * insertion order; we sort by (change_type, field_name) for a
    * deterministic relational surface — same change SET.
    */
  def diff(from: Seq[Field], to: Seq[Field]): Diff = {
    val fm = from.map(f => f.name -> f).toMap
    val tm = to.map(f => f.name -> f).toMap
    val added = to.filterNot(f => fm.contains(f.name))
      .map(f => Change("field_added", f.name, None, Some(f.fieldType)))
    val removed = from.filterNot(f => tm.contains(f.name))
      .map(f => Change("field_removed", f.name, Some(f.fieldType), None))
    val common = from.filter(f => tm.contains(f.name))
    val typeChanged = common.filter(f => tm(f.name).fieldType != f.fieldType)
      .map(f => Change("field_type_changed", f.name,
        Some(f.fieldType), Some(tm(f.name).fieldType)))
    val reqChanged = common.filter(f => tm(f.name).required != f.required)
      .map(f => Change("field_required_changed", f.name,
        Some(f.required.toString), Some(tm(f.name).required.toString)))
    val changes = (added ++ removed ++ typeChanged ++ reqChanged)
      .sortBy(c => (c.changeType, c.fieldName))
    val isBreaking = changes.exists(c =>
      c.changeType == "field_removed" || c.changeType == "field_type_changed")
    val parts = Seq(
      if (added.nonEmpty) Some(s"${added.size} field(s) added") else None,
      if (removed.nonEmpty) Some(s"${removed.size} field(s) removed") else None, {
        val other = changes.size - added.size - removed.size
        if (other > 0) Some(s"$other other change(s)") else None
      }).flatten
    Diff(changes, isBreaking,
      if (parts.nonEmpty) parts.mkString("; ") else "No changes")
  }

  /** Next semver, `versioning.py:346-365`: removals bump minor and reset
    * patch; anything else bumps patch. (Type changes do NOT bump minor —
    * the reference's own comment admits the rule is narrower than
    * is_breaking.)
    */
  def bumpVersion(current: String, from: Seq[Field], to: Seq[Field]): String = {
    val parts = current.split('.')
    if (parts.length != 3) return "1.0.1"
    val (maj, min, pat) = (parts(0).toInt, parts(1).toInt, parts(2).toInt)
    val removed = from.map(_.name).toSet -- to.map(_.name).toSet
    if (removed.nonEmpty) s"$maj.${min + 1}.0" else s"$maj.$min.${pat + 1}"
  }

  /** Register semantics (`versioning.py:125-165`): unchanged content hash →
    * the current version; changed → the bumped version.
    */
  def registerVersion(current: String, from: Seq[Field], to: Seq[Field])
      : (String, Boolean) = {
    if (schemaHash(from) == schemaHash(to)) (current, false)
    else (bumpVersion(current, from, to), true)
  }

  /** Migrate an extraction result across a diff (`versioning.py:277-327`):
    * added fields appear as None, removed fields drop, renames move.
    */
  def migrate(result: Map[String, Option[String]], d: Diff)
      : Map[String, Option[String]] =
    d.changes.foldLeft(result) { (r, c) =>
      c.changeType match {
        case "field_added" =>
          if (r.contains(c.fieldName)) r else r + (c.fieldName -> None)
        case "field_removed" => r - c.fieldName
        case "field_renamed" =>
          (c.oldValue, c.newValue) match {
            case (Some(o), Some(n)) if r.contains(o) => r - o + (n -> r(o))
            case _ => r
          }
        case _ => r
      }
    }
}
