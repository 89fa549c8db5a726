package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.policy.{AiResponseParser, TagPolicy}
import graft.vocab.PolicyThresholds

/** Input row for the tagging stage: a raw LLM response plus routing info. */
final case class RawTagResponse(
    product_id: String,
    category: String,
    product_name: String,
    subcategory: String,
    raw_response: String)

/** Flat, column-friendly projection of a PolicyResult. */
final case class TaggedProduct(
    product_id: String,
    category: String,
    curation_status: String,
    curation_reasons: Seq[String],
    style_identity: Seq[String],
    fit: Option[String],
    silhouette: Option[String],
    length: Option[String],
    context: Seq[String],
    construction_details: Seq[String],
    pattern: Option[String],
    pairing_tags: Seq[String],
    formality: Option[String],
    top_layer_role: Option[String],
    shoe_type: Option[String],
    profile: Option[String],
    closure: Option[String],
    n_suppressed: Int,
    n_defaults: Int,
    parse_failed: Boolean,
    tag_policy_version: String)

/** The P2∘P1 tagging stage (SURVEY §3.1 step 6): parse raw LLM output,
  * apply the tag policy, emit canonical tags + curation audit.
  *
  * Implemented as a typed `Dataset.map` over pure functions — deterministic,
  * I/O-free, no shuffle; Catalyst-opaque but projection-only, so upstream
  * pushdown/pruning is unaffected and it parallelizes linearly at cluster
  * scale.
  */
object TagStage {

  def run(input: Dataset[RawTagResponse],
          thresholds: PolicyThresholds = PolicyThresholds.Default): Dataset[TaggedProduct] = {
    import input.sparkSession.implicits._
    input.map { row =>
      val parsed = AiResponseParser.parse(row.raw_response, row.category)
      val ai = parsed.getOrElse(AiTagOutput(category = Some(row.category)))
      val r = TagPolicy(ai, Some(row.category), thresholds,
        Some(row.product_name), Some(row.subcategory))
      val tf = r.tagsFinal
      TaggedProduct(
        product_id = row.product_id,
        category = tf.category,
        curation_status = r.curationStatus,
        curation_reasons = r.curationReasons,
        style_identity = tf.styleIdentity,
        fit = tf.fit,
        silhouette = tf.silhouette,
        length = tf.length,
        context = tf.context,
        construction_details = tf.constructionDetails,
        pattern = tf.pattern,
        pairing_tags = tf.pairingTags,
        formality = tf.formality,
        top_layer_role = tf.topLayerRole,
        shoe_type = tf.shoeType,
        profile = tf.profile,
        closure = tf.closure,
        n_suppressed = r.suppressedTags.size,
        n_defaults = r.defaultsApplied.size,
        parse_failed = parsed.isEmpty,
        tag_policy_version = r.tagPolicyVersion)
    }
  }

  /** Wrap a DataFrame with the expected columns into the typed input. */
  def fromDataFrame(df: DataFrame): Dataset[RawTagResponse] = {
    import df.sparkSession.implicits._
    df.select(
      col("product_id").cast("string"),
      col("category").cast("string"),
      col("product_name").cast("string"),
      col("subcategory").cast("string"),
      col("raw_response").cast("string")).as[RawTagResponse]
  }
}
