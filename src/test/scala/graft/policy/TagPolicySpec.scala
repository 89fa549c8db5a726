package graft.policy

import graft.model._
import graft.vocab.{PolicyThresholds, Vocabularies => V}
import org.scalatest.funsuite.AnyFunSuite

/** P1 goldens: the reference's own self-test input
  * (tag_policy.py:1015-1029) plus threshold-boundary and category cases.
  */
class TagPolicySpec extends AnyFunSuite {

  private val sampleBottom = AiTagOutput(
    category = Some("bottom"),
    styleIdentity = Seq(
      TagWithConfidence("workwear", 0.77),
      TagWithConfidence("rugged", 0.65)),
    silhouette = Some(TagWithConfidence("straight", 0.86)),
    context = Seq(TagWithConfidence("everyday", 0.82)),
    constructionDetails = Seq(TagWithConfidence("flat-front", 0.74)),
    pattern = Some(TagWithConfidence("solid", 0.85)),
    pairingTags = Seq(
      TagWithConfidence("neutral-base", 0.72),
      TagWithConfidence("easy-dress-down", 0.68)))

  test("reference self-test golden (tag_policy.py:1011-1043)") {
    val r = TagPolicy(sampleBottom)
    assert(r.curationStatus == "needs_review")
    assert(r.curationReasons ==
      Seq("style_identity_needs_passive_review", "missing_fit"))
    val tf = r.tagsFinal
    assert(tf.category == "bottom")
    assert(tf.styleIdentity == Seq("workwear")) // rugged 0.65 < flag 0.70
    assert(tf.fit.contains("regular")) // defaulted
    assert(tf.silhouette.contains("straight"))
    assert(tf.length.isEmpty)
    assert(tf.context == Seq("everyday"))
    assert(tf.constructionDetails == Seq("flat-front")) // 0.74 >= details_flag 0.70
    assert(tf.pattern.contains("solid"))
    assert(tf.pairingTags == Seq("neutral-base", "easy-dress-down"))
    assert(tf.formality.contains("casual")) // defaulted
    assert(tf.topLayerRole.isEmpty) // bottom, not top
    assert(r.suppressedTags ==
      Seq(SuppressedTag("style_identity", "rugged", 0.65, "below_flag_threshold")))
    assert(r.defaultsApplied == Seq(
      AppliedDefault("formality", "casual", "default_fallback"),
      AppliedDefault("fit", "regular", "required_missing_or_suppressed")))
    assert(r.tagPolicyVersion == "tag_policy_v2.5")
  }

  test("missing style identity is critical → needs_fix") {
    val r = TagPolicy(AiTagOutput(category = Some("bottom")))
    assert(r.curationStatus == "needs_fix")
    assert(r.curationReasons.contains("missing_style_identity"))
    assert(r.tagsFinal.fit.contains("regular"))
    assert(r.tagsFinal.silhouette.contains("straight")) // bottom default
    assert(r.tagsFinal.formality.contains("casual"))
  }

  test("upper silhouette default is neutral") {
    val r = TagPolicy(AiTagOutput(category = Some("outerwear")))
    assert(r.tagsFinal.silhouette.contains("neutral"))
    assert(r.tagsFinal.topLayerRole.isEmpty) // outerwear is not top
  }

  test("top layer role: mid keywords beat base keywords") {
    assert(TagPolicy.determineTopLayerRole("Knit Polo Shirt", "").contains("mid"))
    assert(TagPolicy.determineTopLayerRole("Classic Polo", "").contains("base"))
    assert(TagPolicy.determineTopLayerRole("Cargo Pants", "").isEmpty)
    val r = TagPolicy(AiTagOutput(category = Some("top")),
      productName = Some("Mystery Item"))
    assert(r.tagsFinal.topLayerRole.contains("base"))
    assert(r.curationReasons.contains("missing_top_layer_role"))
    assert(r.defaultsApplied.contains(
      AppliedDefault("top_layer_role", "base", "could_not_determine_from_name")))
  }

  test("footwear: shoe_type below auto is kept but flagged needs_review") {
    val r = TagPolicy(AiTagOutput(
      category = Some("footwear"),
      styleIdentity = Seq(TagWithConfidence("classic", 0.9)),
      shoeType = Some(TagWithConfidence("sneakers", 0.75)),
      profile = Some(TagWithConfidence("chunky", 0.8))))
    assert(r.tagsFinal.shoeType.contains("sneakers"))
    assert(r.curationStatus == "needs_review")
    assert(r.curationReasons.contains("shoe_type_low_confidence"))
    assert(r.tagsFinal.fit.isEmpty) // no apparel fields for footwear
    assert(r.tagsFinal.silhouette.isEmpty)
    assert(r.tagsFinal.profile.contains("chunky"))
  }

  test("footwear: missing shoe_type defaults to dress-shoes and needs_fix") {
    val r = TagPolicy(AiTagOutput(
      category = Some("footwear"),
      styleIdentity = Seq(TagWithConfidence("classic", 0.9))))
    assert(r.tagsFinal.shoeType.contains("dress-shoes"))
    assert(r.tagsFinal.profile.contains("standard"))
    assert(r.curationStatus == "needs_fix")
  }

  test("thresholds are inclusive (>=)") {
    val r = TagPolicy(AiTagOutput(
      category = Some("bottom"),
      styleIdentity = Seq(TagWithConfidence("classic", 0.85)), // exactly auto
      fit = Some(TagWithConfidence("slim", 0.65)), // exactly flag
      silhouette = Some(TagWithConfidence("wide", 0.65)))) // exactly allow
    assert(r.tagsFinal.styleIdentity == Seq("classic"))
    assert(!r.curationReasons.contains("style_identity_needs_passive_review"))
    assert(r.tagsFinal.fit.contains("slim"))
    assert(r.curationReasons.contains("fit_low_confidence"))
    assert(r.tagsFinal.silhouette.contains("wide"))
    assert(r.curationReasons.contains("silhouette_low_confidence"))
    assert(r.curationStatus == "needs_review") // silhouette_low_confidence triggers
  }

  test("illegal style tag → illegal_tag_returned → needs_review") {
    val r = TagPolicy(AiTagOutput(
      category = Some("bottom"),
      styleIdentity = Seq(
        TagWithConfidence("spacewear", 0.99),
        TagWithConfidence("classic", 0.9))))
    assert(r.tagsFinal.styleIdentity == Seq("classic"))
    assert(r.curationStatus == "needs_review")
    assert(r.suppressedTags.head ==
      SuppressedTag("style_identity", "spacewear", 0.99, "illegal_tag"))
  }

  test("style identity takes top 2 by confidence, stable on ties") {
    val r = TagPolicy(AiTagOutput(
      category = Some("bottom"),
      styleIdentity = Seq(
        TagWithConfidence("classic", 0.80),
        TagWithConfidence("minimal", 0.95),
        TagWithConfidence("workwear", 0.80))))
    assert(r.tagsFinal.styleIdentity == Seq("minimal", "classic"))
  }

  test("fit invalid for category is suppressed then defaulted") {
    val r = TagPolicy(AiTagOutput(
      category = Some("bottom"),
      styleIdentity = Seq(TagWithConfidence("classic", 0.9)),
      fit = Some(TagWithConfidence("oversized", 0.95)))) // upper-only fit
    assert(r.tagsFinal.fit.contains("regular"))
    assert(r.suppressedTags.contains(
      SuppressedTag("fit", "oversized", 0.95, "invalid_for_category")))
  }

  test("property: outputs always within vocab, required fields present") {
    val rng = new scala.util.Random(42)
    val allTags = (V.StyleIdentity ++ V.FitBottom ++ V.FitUpper ++ V.Length ++
      V.SilhouetteBottom ++ V.SilhouetteUpper ++ V.Formality ++ V.Context ++
      V.DetailsBottom ++ V.DetailsUpper ++ V.Pattern ++ V.Pairing ++
      V.ShoeType ++ V.ShoeProfile ++ V.ShoeClosure ++ Set("bogus", "junk")).toSeq.sorted
    def randTag() = TagWithConfidence(allTags(rng.nextInt(allTags.size)),
      math.rint(rng.nextDouble() * 140 - 20) / 100.0)
    def opt() = if (rng.nextBoolean()) Some(randTag()) else None
    def seqN(n: Int) = Seq.fill(rng.nextInt(n + 1))(randTag())
    for (_ <- 1 to 500) {
      val cat = Seq("bottom", "top", "top_base", "outerwear", "footwear", "weird")(rng.nextInt(6))
      val out = AiTagOutput(Some(cat), seqN(4), opt(), opt(), opt(), opt(),
        seqN(3), seqN(3), opt(), seqN(4), opt(), opt(), opt())
      val r = TagPolicy(out, productName = Some("test polo"))
      assert(Set("approved", "needs_review", "needs_fix")(r.curationStatus))
      assert(r.tagsFinal.styleIdentity.forall(V.StyleIdentity))
      assert(r.tagsFinal.styleIdentity.size <= 2)
      assert(r.tagsFinal.context.size <= 2 && r.tagsFinal.context.forall(V.Context))
      assert(r.tagsFinal.pairingTags.size <= 3 && r.tagsFinal.pairingTags.forall(V.Pairing))
      assert(r.tagsFinal.formality.exists(V.Formality)) // always defaulted
      if (cat == "footwear") {
        assert(r.tagsFinal.shoeType.exists(V.ShoeType))
        assert(r.tagsFinal.profile.exists(V.ShoeProfile))
        assert(r.tagsFinal.fit.isEmpty && r.tagsFinal.silhouette.isEmpty)
      } else {
        val validFit = if (cat == "bottom") V.FitBottom else V.FitUpper
        val validSil = if (cat == "bottom") V.SilhouetteBottom else V.SilhouetteUpper
        assert(r.tagsFinal.fit.exists(validFit))
        assert(r.tagsFinal.silhouette.exists(validSil))
        assert(r.tagsFinal.shoeType.isEmpty)
      }
      assert(r.curationReasons.distinct == r.curationReasons)
    }
  }
}
