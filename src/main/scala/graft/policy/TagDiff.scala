package graft.policy

import graft.model.{ModifiedField, TagChanges}

/** P3 — structured tag diff + error-type inference
  * (tag_comparison.py:53-224), ported with the reference's tolerant
  * normalizers: list entries may be raw strings or `{tag: ...}` dicts;
  * scalars may be strings or `{tag|value: ...}` dicts.
  *
  * Inputs are loosely-typed maps (parsed JSON), mirroring the open-shaped
  * JSONB the reference tolerates (SURVEY §7.4 risk 3).
  */
object TagDiff {

  val ListCategories: Set[String] = Set(
    "style_identity", "context", "construction_details", "pairing_tags")

  val ScalarCategories: Set[String] = Set(
    "fit", "formality", "length", "silhouette", "pattern", "top_layer_role",
    "shoe_type", "profile", "closure")

  /** tag_comparison.py:35-41 `_to_list`. */
  private[policy] def toList(v: Any): Seq[String] = v match {
    case null | None => Nil
    case l: Seq[_] => l.map {
      case s: String => s
      case m: Map[_, _] =>
        val mm = m.asInstanceOf[Map[String, Any]]
        mm.getOrElse("tag", mm.toString).toString
      case other => other.toString
    }
    case other => Seq(other.toString)
  }

  /** tag_comparison.py:44-50 `_to_scalar`. */
  private[policy] def toScalar(v: Any): Option[String] = v match {
    case null | None => None
    case "" => None
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      mm.get("tag").orElse(mm.get("value")).map(_.toString)
    case Some(x) => toScalar(x)
    case other => Some(other.toString)
  }

  /** compute_tag_changes (tag_comparison.py:53-157). */
  def computeTagChanges(original: Map[String, Any], corrected: Map[String, Any]): TagChanges = {
    val added = scala.collection.mutable.ListBuffer.empty[String]
    val removed = scala.collection.mutable.ListBuffer.empty[String]
    val modified = scala.collection.mutable.ListBuffer.empty[ModifiedField]
    val unchanged = scala.collection.mutable.ListBuffer.empty[String]

    def diffList(cat: String): Unit = {
      val origSet = toList(original.getOrElse(cat, null)).toSet
      val corrSet = toList(corrected.getOrElse(cat, null)).toSet
      (corrSet -- origSet).foreach(t => added += s"$cat:$t")
      (origSet -- corrSet).foreach(t => removed += s"$cat:$t")
      (origSet & corrSet).foreach(t => unchanged += s"$cat:$t")
    }

    def diffScalar(cat: String): Unit = {
      val o = toScalar(original.getOrElse(cat, null))
      val c = toScalar(corrected.getOrElse(cat, null))
      (o, c) match {
        case (None, Some(cv)) => added += s"$cat:$cv"
        case (Some(ov), None) => removed += s"$cat:$ov"
        case (Some(ov), Some(cv)) if ov != cv =>
          modified += ModifiedField(cat, ov, cv)
        case (Some(ov), _) => unchanged += s"$cat:$ov"
        case _ => ()
      }
    }

    val allCats = (original.keySet ++ corrected.keySet).toSeq.sorted
    allCats.foreach { cat =>
      if (ListCategories(cat)) diffList(cat)
      else if (ScalarCategories(cat)) diffScalar(cat)
      else {
        // unknown category: list-shaped values diff as lists, else scalar
        val isListShaped =
          original.get(cat).exists(_.isInstanceOf[Seq[_]]) ||
            corrected.get(cat).exists(_.isInstanceOf[Seq[_]])
        if (isListShaped) diffList(cat) else diffScalar(cat)
      }
    }

    TagChanges(
      added = added.toList.sorted,
      removed = removed.toList.sorted,
      modified = modified.toList, // insertion order, as in the reference
      unchanged = unchanged.toList.sorted)
  }

  /** infer_error_types (tag_comparison.py:160-224). */
  def inferErrorTypes(changes: TagChanges): Seq[String] = {
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    if (changes.removed.size >= 2) errors += "overtagging"
    if (changes.added.size >= 2) errors += "undertagging"
    if (changes.removed.exists(_.startsWith("construction_details:")))
      errors += "wrong_construction"
    if (changes.removed.exists(_.startsWith("style_identity:")) ||
      changes.added.exists(_.startsWith("style_identity:")))
      errors += "wrong_style_identity"
    if (changes.modified.exists(_.category == "fit")) errors += "wrong_fit"
    if (changes.modified.exists(_.category == "formality")) errors += "wrong_formality"
    if (changes.added.size + changes.removed.size + changes.modified.size >= 4)
      errors += "low_confidence"
    errors.toList.sorted
  }

  /** X16 — change-summary string (curation_history_service.py:94-111):
    * "Added: a, b; Removed: c; Modified: fit: x → y". */
  def changeSummary(changes: TagChanges): String = {
    val parts = Seq(
      if (changes.added.nonEmpty) Some("Added: " + changes.added.mkString(", ")) else None,
      if (changes.removed.nonEmpty) Some("Removed: " + changes.removed.mkString(", ")) else None,
      if (changes.modified.nonEmpty)
        Some("Modified: " + changes.modified
          .map(m => s"${m.category}: ${m.from} → ${m.to}").mkString(", "))
      else None).flatten
    parts.mkString("; ")
  }
}
