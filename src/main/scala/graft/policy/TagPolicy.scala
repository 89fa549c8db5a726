package graft.policy

import graft.model._
import graft.vocab.{PolicyThresholds, Vocabularies => V}
import scala.collection.mutable.ListBuffer

/** P1 — the tag-policy decision layer (tag_policy.py:557-976
  * `apply_tag_policy`), ported near-literally as a pure deterministic
  * function: AI sensor output × (category, name, subcategory, thresholds) →
  * canonical tags + curation status/reasons + suppressed/defaults audit.
  *
  * Pure and I/O-free ⇒ used via `Dataset.map` (SURVEY §2.12): projection-only
  * and Catalyst-opaque, but pushdown still applies upstream, and at cluster
  * scale it parallelizes embarrassingly (no shuffle).
  */
object TagPolicy {

  val PolicyVersion = "tag_policy_v2.5" // tag_policy.py:58

  private def isBottom(c: String) = c == "bottom"
  private def isTop(c: String) = Set("top", "top_base", "top_mid")(c)
  private def isShoes(c: String) = c == "footwear"

  /** tag_policy.py:493-514 — mid keywords checked before base. */
  def determineTopLayerRole(name: String, subcategory: String): Option[String] = {
    val text = s"$name $subcategory".toLowerCase
    if (V.TopLayerMid.exists(text.contains)) Some("mid")
    else if (V.TopLayerBase.exists(text.contains)) Some("base")
    else None
  }

  /** tag_policy.py:517-525 — stable sort by confidence desc, take n.
    * (Python list.sort is stable; Scala sortBy is stable — ties keep
    * arrival order in both.) */
  private def pickTopN(tags: Seq[TagWithConfidence], n: Int, minConf: Double) =
    tags.filter(_.confidence >= minConf).sortBy(-_.confidence).take(n)

  def apply(
      tagsAiRaw: AiTagOutput,
      category: Option[String] = None,
      thresholds: PolicyThresholds = PolicyThresholds.Default,
      productName: Option[String] = None,
      subcategory: Option[String] = None): PolicyResult = {

    val t = thresholds
    val cat = category.orElse(tagsAiRaw.category).getOrElse("top")

    val reasons = ListBuffer.empty[String]
    val suppressed = ListBuffer.empty[SuppressedTag]
    val defaults = ListBuffer.empty[AppliedDefault]

    // 0. TOP LAYER ROLE (tag_policy.py:593-609)
    var topLayerRole: Option[String] = None
    if (isTop(cat)) {
      determineTopLayerRole(productName.getOrElse(""), subcategory.getOrElse("")) match {
        case Some(role) => topLayerRole = Some(role)
        case None =>
          reasons += "missing_top_layer_role"
          topLayerRole = Some("base")
          defaults += AppliedDefault("top_layer_role", "base", "could_not_determine_from_name")
      }
    }

    // 1. STYLE IDENTITY (tag_policy.py:614-643)
    val styleKept = tagsAiRaw.styleIdentity.flatMap { obj =>
      if (!V.StyleIdentity(obj.tag)) {
        suppressed += SuppressedTag("style_identity", obj.tag, obj.confidence, "illegal_tag")
        reasons += "illegal_tag_returned"
        None
      } else if (obj.confidence < t.styleIdentityFlag) {
        suppressed += SuppressedTag("style_identity", obj.tag, obj.confidence, "below_flag_threshold")
        None
      } else Some(obj)
    }
    val styleSelected = pickTopN(styleKept, 2, t.styleIdentityFlag)
    val styleIdentity = styleSelected.map(_.tag)
    if (styleIdentity.isEmpty) reasons += "missing_style_identity"
    else if (styleSelected.exists(_.confidence < t.styleIdentityAuto))
      reasons += "style_identity_needs_passive_review"

    // 1b. FORMALITY (tag_policy.py:648-669)
    var formality: Option[String] = None
    tagsAiRaw.formality.foreach { obj =>
      if (!V.Formality(obj.tag)) {
        suppressed += SuppressedTag("formality", obj.tag, obj.confidence, "illegal_tag")
        reasons += "illegal_formality_tag"
      } else if (obj.confidence < t.formalityFlag) {
        suppressed += SuppressedTag("formality", obj.tag, obj.confidence, "below_flag_threshold")
      } else {
        formality = Some(obj.tag)
        if (obj.confidence < t.formalityAuto) reasons += "formality_low_confidence"
      }
    }
    if (formality.isEmpty) {
      formality = Some("casual")
      defaults += AppliedDefault("formality", "casual", "default_fallback")
    }

    // 2. FIT (tag_policy.py:674-704) — apparel only
    var fit: Option[String] = None
    if (!isShoes(cat)) {
      val validFits = if (isBottom(cat)) V.FitBottom else V.FitUpper
      tagsAiRaw.fit match {
        case None => reasons += "missing_fit"
        case Some(obj) =>
          if (!validFits(obj.tag)) {
            suppressed += SuppressedTag("fit", obj.tag, obj.confidence, "invalid_for_category")
            reasons += "missing_fit"
          } else if (obj.confidence < t.fitFlag) {
            suppressed += SuppressedTag("fit", obj.tag, obj.confidence, "below_flag_threshold")
            reasons += "missing_fit"
          } else {
            fit = Some(obj.tag)
            if (obj.confidence < t.fitAuto) reasons += "fit_low_confidence"
          }
      }
      if (fit.isEmpty) {
        fit = Some("regular")
        defaults += AppliedDefault("fit", "regular", "required_missing_or_suppressed")
      }
    }

    // 3. SILHOUETTE (tag_policy.py:709-745) — apparel only
    var silhouette: Option[String] = None
    if (!isShoes(cat)) {
      val valid = if (isBottom(cat)) V.SilhouetteBottom else V.SilhouetteUpper
      tagsAiRaw.silhouette match {
        case None => reasons += "missing_silhouette"
        case Some(obj) =>
          if (!valid(obj.tag)) {
            suppressed += SuppressedTag("silhouette", obj.tag, obj.confidence, "invalid_for_category")
            reasons += "missing_silhouette"
          } else if (obj.confidence < t.silhouetteAllow) {
            suppressed += SuppressedTag("silhouette", obj.tag, obj.confidence, "below_allow_threshold")
            reasons += "missing_silhouette"
          } else {
            silhouette = Some(obj.tag)
            if (obj.confidence < t.silhouetteAuto) reasons += "silhouette_low_confidence"
          }
      }
      if (silhouette.isEmpty) {
        val d = if (isBottom(cat)) "straight" else "neutral"
        silhouette = Some(d)
        defaults += AppliedDefault("silhouette", d, "required_missing_or_suppressed")
      }
    }

    // 4. LENGTH (tag_policy.py:750-764) — apparel only, optional
    var length: Option[String] = None
    if (!isShoes(cat)) {
      tagsAiRaw.length.foreach { obj =>
        if (!V.Length(obj.tag))
          suppressed += SuppressedTag("length", obj.tag, obj.confidence, "illegal_tag")
        else if (obj.confidence < t.lengthAllow)
          suppressed += SuppressedTag("length", obj.tag, obj.confidence, "below_allow_threshold")
        else length = Some(obj.tag)
      }
    }

    // 5. CONTEXT (tag_policy.py:769-789)
    val contextKept = tagsAiRaw.context.flatMap { obj =>
      if (!V.Context(obj.tag)) {
        suppressed += SuppressedTag("context", obj.tag, obj.confidence, "illegal_tag")
        None
      } else if (obj.confidence < t.contextAllow) {
        suppressed += SuppressedTag("context", obj.tag, obj.confidence, "below_allow_threshold")
        None
      } else Some(obj)
    }
    val context = pickTopN(contextKept, 2, t.contextAllow).map(_.tag)

    // 6. CONSTRUCTION / DETAILS (tag_policy.py:794-825) — apparel only
    var constructionDetails: Seq[String] = Nil
    if (!isShoes(cat)) {
      val valid = if (isBottom(cat)) V.DetailsBottom else V.DetailsUpper
      val kept = tagsAiRaw.constructionDetails.flatMap { obj =>
        if (!valid(obj.tag)) {
          suppressed += SuppressedTag("construction_details", obj.tag, obj.confidence, "invalid_for_category")
          reasons += "category_inappropriate_detail"
          None
        } else if (obj.confidence < t.detailsFlag) {
          suppressed += SuppressedTag("construction_details", obj.tag, obj.confidence, "below_flag_threshold")
          None
        } else Some(obj)
      }
      constructionDetails = pickTopN(kept, 2, t.detailsFlag).map(_.tag)
    }

    // 7. PATTERN (tag_policy.py:830-843)
    var pattern: Option[String] = None
    tagsAiRaw.pattern.foreach { obj =>
      if (!V.Pattern(obj.tag))
        suppressed += SuppressedTag("pattern", obj.tag, obj.confidence, "illegal_tag")
      else if (obj.confidence < t.patternAllow)
        suppressed += SuppressedTag("pattern", obj.tag, obj.confidence, "below_allow_threshold")
      else pattern = Some(obj.tag)
    }

    // 8. PAIRING TAGS (tag_policy.py:848-868)
    val pairingKept = tagsAiRaw.pairingTags.flatMap { obj =>
      if (!V.Pairing(obj.tag)) {
        suppressed += SuppressedTag("pairing_tags", obj.tag, obj.confidence, "illegal_tag")
        None
      } else if (obj.confidence < t.pairingAllow) {
        suppressed += SuppressedTag("pairing_tags", obj.tag, obj.confidence, "below_allow_threshold")
        None
      } else Some(obj)
    }
    val pairingTags = pickTopN(pairingKept, 3, t.pairingAllow).map(_.tag)

    // 9. SHOE FIELDS (tag_policy.py:873-942) — footwear only
    var shoeType: Option[String] = None
    var profile: Option[String] = None
    var closure: Option[String] = None
    if (isShoes(cat)) {
      tagsAiRaw.shoeType match {
        case None => reasons += "missing_shoe_type"
        case Some(obj) =>
          if (!V.ShoeType(obj.tag)) {
            suppressed += SuppressedTag("shoe_type", obj.tag, obj.confidence, "illegal_tag")
            reasons += "missing_shoe_type"
          } else if (obj.confidence < t.shoeTypeAuto) {
            suppressed += SuppressedTag("shoe_type", obj.tag, obj.confidence, "below_auto_threshold")
            reasons += "shoe_type_low_confidence"
            shoeType = Some(obj.tag) // still allowed, flagged (tag_policy.py:891-892)
          } else shoeType = Some(obj.tag)
      }
      if (shoeType.isEmpty) {
        shoeType = Some("dress-shoes")
        defaults += AppliedDefault("shoe_type", "dress-shoes", "required_missing_or_suppressed")
      }

      tagsAiRaw.profile match {
        case None => reasons += "missing_shoe_profile"
        case Some(obj) =>
          if (!V.ShoeProfile(obj.tag))
            suppressed += SuppressedTag("profile", obj.tag, obj.confidence, "illegal_tag")
          else if (obj.confidence < t.shoeProfileAllow)
            suppressed += SuppressedTag("profile", obj.tag, obj.confidence, "below_allow_threshold")
          else profile = Some(obj.tag)
      }
      if (profile.isEmpty) {
        profile = Some("standard")
        defaults += AppliedDefault("profile", "standard", "default_fallback")
      }

      tagsAiRaw.closure.foreach { obj =>
        if (!V.ShoeClosure(obj.tag))
          suppressed += SuppressedTag("closure", obj.tag, obj.confidence, "illegal_tag")
        else if (obj.confidence < t.shoeClosureAllow)
          suppressed += SuppressedTag("closure", obj.tag, obj.confidence, "below_allow_threshold")
        else closure = Some(obj.tag)
      }
    }

    // 10. STATUS (tag_policy.py:947-964)
    val criticalReasons = Set("missing_style_identity", "missing_shoe_type")
    val reviewTriggers = Set(
      "style_identity_needs_passive_review", "category_inappropriate_detail",
      "illegal_tag_returned", "silhouette_low_confidence", "shoe_type_low_confidence")
    val status =
      if (reasons.exists(criticalReasons)) "needs_fix"
      else if (reasons.exists(reviewTriggers)) "needs_review"
      else "approved"

    PolicyResult(
      tagsFinal = CanonicalTags(
        category = cat,
        styleIdentity = styleIdentity,
        fit = fit,
        silhouette = silhouette,
        length = length,
        context = context,
        constructionDetails = constructionDetails,
        pattern = pattern,
        pairingTags = pairingTags,
        formality = formality,
        topLayerRole = topLayerRole,
        shoeType = shoeType,
        profile = profile,
        closure = closure),
      curationStatus = status,
      curationReasons = reasons.toList.distinct, // first-occurrence order (tag_policy.py:967)
      suppressedTags = suppressed.toList,
      defaultsApplied = defaults.toList,
      tagPolicyVersion = PolicyVersion)
  }
}
