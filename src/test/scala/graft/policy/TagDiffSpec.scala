package graft.policy

import graft.model.{ModifiedField, TagChanges}
import org.scalatest.funsuite.AnyFunSuite

/** P3 goldens from the reference's doctests (tag_comparison.py:71-91 and
  * :177-186). Note: the docstring example shows unsorted `added`, but the
  * code returns `sorted(added)` (tag_comparison.py:153) — we match the code.
  */
class TagDiffSpec extends AnyFunSuite {

  private val orig = Map[String, Any](
    "style_identity" -> Seq("classic", "minimal"),
    "fit" -> "regular",
    "formality" -> "casual",
    "construction_details" -> Seq("flat-front"))

  private val corr = Map[String, Any](
    "style_identity" -> Seq("classic", "preppy"),
    "fit" -> "relaxed",
    "formality" -> "casual",
    "construction_details" -> Seq("flat-front", "pleated"))

  test("compute_tag_changes doctest (tag_comparison.py:71-91)") {
    val c = TagDiff.computeTagChanges(orig, corr)
    assert(c.added == Seq("construction_details:pleated", "style_identity:preppy"))
    assert(c.removed == Seq("style_identity:minimal"))
    assert(c.modified == Seq(ModifiedField("fit", "regular", "relaxed")))
    assert(c.unchanged.contains("style_identity:classic"))
    assert(c.unchanged.contains("formality:casual"))
    assert(c.unchanged.contains("construction_details:flat-front"))
  }

  test("identity diff: everything unchanged") {
    val c = TagDiff.computeTagChanges(orig, orig)
    assert(c.added.isEmpty && c.removed.isEmpty && c.modified.isEmpty)
    assert(c.unchanged.size == 5) // 3 list tags + 2 scalars
  }

  test("dict-shaped entries are normalized via tag key (tag_comparison.py:35-50)") {
    val o = Map[String, Any](
      "style_identity" -> Seq(Map("tag" -> "classic", "confidence" -> 0.9)),
      "fit" -> Map("tag" -> "slim"))
    val c = Map[String, Any]("style_identity" -> Seq("classic"), "fit" -> "slim")
    val d = TagDiff.computeTagChanges(o, c)
    assert(d.added.isEmpty && d.removed.isEmpty && d.modified.isEmpty)
    assert(d.unchanged == Seq("fit:slim", "style_identity:classic"))
  }

  test("scalar add/remove and empty-string-as-None") {
    val d = TagDiff.computeTagChanges(
      Map("pattern" -> "solid", "length" -> ""),
      Map("length" -> "cropped"))
    assert(d.added == Seq("length:cropped"))
    assert(d.removed == Seq("pattern:solid"))
  }

  test("unknown categories: list-shaped diffs as list, scalar as scalar") {
    val d = TagDiff.computeTagChanges(
      Map("custom_tags" -> Seq("x", "y"), "vibe" -> "warm"),
      Map("custom_tags" -> Seq("y", "z"), "vibe" -> "cool"))
    assert(d.added == Seq("custom_tags:z"))
    assert(d.removed == Seq("custom_tags:x"))
    assert(d.modified == Seq(ModifiedField("vibe", "warm", "cool")))
    assert(d.unchanged == Seq("custom_tags:y"))
  }

  test("infer_error_types doctest (tag_comparison.py:177-186)") {
    val changes = TagChanges(
      added = Seq("context:everyday", "pairing_tags:high-versatility"),
      removed = Seq("style_identity:minimal", "construction_details:pleated"),
      modified = Seq(ModifiedField("fit", "regular", "relaxed")),
      unchanged = Nil)
    assert(TagDiff.inferErrorTypes(changes) == Seq(
      "low_confidence", "overtagging", "undertagging",
      "wrong_construction", "wrong_fit", "wrong_style_identity"))
  }

  test("error types: thresholds at exactly 2 and 4") {
    assert(TagDiff.inferErrorTypes(TagChanges(Seq("context:a"), Nil, Nil, Nil)).isEmpty)
    assert(TagDiff.inferErrorTypes(
      TagChanges(Seq("context:a", "context:b"), Nil, Nil, Nil)) == Seq("undertagging"))
    val four = TagChanges(Seq("context:a"), Seq("length:b"),
      Seq(ModifiedField("pattern", "x", "y"), ModifiedField("profile", "p", "q")), Nil)
    assert(TagDiff.inferErrorTypes(four).contains("low_confidence"))
  }

  test("round-trip invariant: added ∩ removed = ∅ (property)") {
    val rng = new scala.util.Random(7)
    val fields = Seq("style_identity", "context", "fit", "formality", "pattern", "zzz")
    val vals = Seq("a", "b", "c", "d")
    def randMap(): Map[String, Any] = fields.flatMap { f =>
      if (rng.nextBoolean()) None
      else if (TagDiff.ListCategories(f) || f == "zzz")
        Some(f -> Seq.fill(rng.nextInt(3))(vals(rng.nextInt(vals.size))))
      else Some(f -> vals(rng.nextInt(vals.size)))
    }.toMap
    for (_ <- 1 to 300) {
      val (o, c) = (randMap(), randMap())
      val d = TagDiff.computeTagChanges(o, c)
      assert(d.added.toSet.intersect(d.removed.toSet).isEmpty)
      assert(d.added == d.added.sorted && d.removed == d.removed.sorted)
      val self = TagDiff.computeTagChanges(o, o)
      assert(self.added.isEmpty && self.removed.isEmpty && self.modified.isEmpty)
    }
  }

  test("change summary format (curation_history_service.py:94-111)") {
    val c = TagDiff.computeTagChanges(orig, corr)
    assert(TagDiff.changeSummary(c) ==
      "Added: construction_details:pleated, style_identity:preppy; " +
        "Removed: style_identity:minimal; Modified: fit: regular → relaxed")
  }
}
