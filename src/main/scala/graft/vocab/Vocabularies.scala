package graft.vocab

/** Canonical tag vocabularies and policy thresholds, frozen from the
  * reference (refitd_tagger.py:56-257 and tag_policy.py:251-340).
  * Pure Scala — zero Spark dependencies (SURVEY §7.1 step 1).
  */
object Vocabularies {

  val StyleIdentity: Set[String] = Set(
    "minimal", "classic", "preppy", "workwear", "streetwear", "rugged",
    "tailoring", "elevated-basics", "normcore", "sporty", "outdoorsy",
    "western", "vintage", "grunge", "punk", "utilitarian")

  val FitBottom: Set[String] = Set("skinny", "slim", "regular", "relaxed", "baggy")
  val FitUpper: Set[String] = Set("skinny", "slim", "regular", "relaxed", "oversized")

  val Length: Set[String] = Set("cropped", "regular", "long")

  val SilhouetteBottom: Set[String] = Set("straight", "tapered", "wide")
  val SilhouetteUpper: Set[String] =
    Set("neutral", "relaxed", "boxy", "structured", "tailored", "longline")

  /** Ordered 1-5: athletic < casual < smart-casual < business-casual < formal
    * (the O5 ordinal sort in docs/supabase_schema.sql:471-478). */
  val Formality: Set[String] =
    Set("athletic", "casual", "smart-casual", "business-casual", "formal")
  val FormalityOrder: Map[String, Int] = Map(
    "athletic" -> 1, "casual" -> 2, "smart-casual" -> 3,
    "business-casual" -> 4, "formal" -> 5)

  val Context: Set[String] =
    Set("everyday", "work-appropriate", "travel", "evening", "weekend")

  val MaterialsApparel: Set[String] =
    Set("denim", "cotton", "wool", "linen", "leather", "synthetic", "blend")
  val MaterialsShoes: Set[String] =
    Set("leather", "suede", "canvas", "knit", "synthetic", "blend")

  val DetailsBottom: Set[String] =
    Set("pleated", "flat-front", "cargo", "drawstring", "elastic-waist")
  val DetailsUpper: Set[String] = Set("structured-shoulder", "dropped-shoulder")

  val ColorFamily: Set[String] = Set(
    "black", "white", "grey", "navy", "brown", "beige", "olive", "blue",
    "green", "red", "multi")

  val Pattern: Set[String] = Set("solid", "stripe", "check", "textured")

  val Pairing: Set[String] = Set(
    "neutral-base", "statement-piece", "easy-dress-up", "easy-dress-down",
    "high-versatility")

  val ShoeType: Set[String] = Set(
    "sneakers", "boots", "loafers", "derbies", "oxfords", "sandals",
    "dress-shoes")
  val ShoeProfile: Set[String] = Set("sleek", "standard", "chunky")
  val ShoeClosure: Set[String] = Set("lace-up", "slip-on", "buckle")

  /** Top-layer-role keyword lists (tag_policy.py:251-274); mid is checked
    * before base (tag_policy.py:504-514). */
  val TopLayerBase: Seq[String] = Seq(
    "tshirt", "t-shirt", "tee", "long sleeve", "shirt", "polo", "tank", "henley")
  val TopLayerMid: Seq[String] = Seq(
    "sweater", "cardigan", "hoodie", "hoodies", "knit", "knitwear",
    "pullover", "sweatshirt", "fleece", "quarter-zip", "half-zip", "zip-up")
}

/** Confidence thresholds (tag_policy.py:285-340 PolicyThresholds). */
final case class PolicyThresholds(
    styleIdentityAuto: Double = 0.85,
    styleIdentityFlag: Double = 0.70,
    fitAuto: Double = 0.80,
    fitFlag: Double = 0.65,
    silhouetteAuto: Double = 0.80,
    silhouetteAllow: Double = 0.65,
    lengthAllow: Double = 0.70,
    contextAllow: Double = 0.70,
    detailsAllow: Double = 0.80,
    detailsFlag: Double = 0.70,
    patternAllow: Double = 0.70,
    pairingAllow: Double = 0.65,
    formalityAuto: Double = 0.80,
    formalityFlag: Double = 0.65,
    shoeTypeAuto: Double = 0.80,
    shoeProfileAllow: Double = 0.70,
    shoeClosureAllow: Double = 0.70)

object PolicyThresholds {
  val Default: PolicyThresholds = PolicyThresholds()
}
