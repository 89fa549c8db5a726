package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.etl.{Pipeline, TagStage}

/** Flagship domain-operator queries: the P2∘P1 tag pipeline as a typed
  * Dataset.map stage over deterministically synthesized LLM responses
  * (q44 — hash-matched against a DuckDB oracle that restates the policy
  * rollup, AND ScalaTest-golden-verified against the reference's own
  * examples), and the P9 variant-group representative selection
  * (oracle-checked).
  */
object DomainQueries {

  /** Deterministic synthetic raw LLM response per part row: category,
    * style/fit/silhouette/formality candidates and confidences all derived
    * from p_partkey so every run (and every engine) sees identical input.
    * Built as a concat chain, not format_string — java.util.Formatter
    * re-parses the template per row and was a measurable slice of q44;
    * every confidence numerator is 40-99, so "0.%02d" ≡ '0.' || n. */
  private def syntheticResponses(s: SparkSession, d: String): DataFrame = {
    val k = col("p_partkey")
    def pick(m: Int, xs: String*) =
      element_at(array(xs.map(lit): _*), (pmod(k, lit(m)) + 1).cast("int"))
    def conf(mult: Int, mod: Int, off: Int) =
      (pmod(k * mult, lit(mod)) + off).cast("string")
    part(s, d).select(
      k.cast("string").as("product_id"),
      pick(3, "bottom", "top", "footwear").as("category"),
      col("p_name").as("product_name"),
      lit("").as("subcategory"),
      concat(
        lit("{\"style_identity\": [{\"tag\": \""),
        pick(5, "workwear", "classic", "minimal", "streetwear", "spacewear"),
        lit("\", \"confidence\": 0."), conf(7, 50, 50),
        lit("},\n {\"tag\": \""),
        pick(3, "rugged", "vintage", "sporty"),
        lit("\", \"confidence\": 0."), conf(13, 60, 40),
        lit("}],\n \"fit\": {\"tag\": \""),
        pick(3, "slim", "oversized", "baggy"),
        lit("\", \"confidence\": 0."), conf(11, 50, 50),
        lit("},\n \"silhouette\": {\"tag\": \""),
        pick(3, "straight", "boxy", "wide"),
        lit("\", \"confidence\": 0."), conf(17, 40, 60),
        lit("},\n \"formality\": {\"tag\": \""),
        pick(4, "casual", "formal", "athletic", "dressy"),
        lit("\", \"confidence\": 0."), conf(19, 50, 50),
        lit("},\n \"shoe_type\": {\"tag\": \""),
        pick(3, "sneakers", "boots", "moon-boots"),
        lit("\", \"confidence\": 0."), conf(23, 40, 60),
        lit("},\n \"profile\": {\"tag\": \"standard\", \"confidence\": 0.85},\n \"pattern\": {\"tag\": \""),
        pick(3, "solid", "stripe", "plaid"),
        lit("\", \"confidence\": 0."), conf(29, 50, 50),
        lit("}}")).as("raw_response"))
  }

  // P2∘P1 end-to-end: parse → policy → status rollup. Oracle-checked: the
  // synthetic inputs are pure functions of p_partkey, so the oracle below
  // re-derives every parser vocab drop and policy threshold decision from
  // first principles as integer CASE logic (2-decimal confidences compare
  // exactly as their integer numerators) — an independent reconstruction
  // of the tag_policy.py:557-976 semantics for this closed input family.
  private def q44(s: SparkSession, d: String): DataFrame =
    TagStage.run(TagStage.fromDataFrame(syntheticResponses(s, d)))
      .groupBy(col("category"), col("curation_status"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_suppressed").cast("long")).as("total_suppressed"),
        sum(col("n_defaults").cast("long")).as("total_defaults"),
        sum(when(col("parse_failed"), 1L).otherwise(0L)).as("n_parse_failed"))
      .orderBy(col("category"), col("curation_status"))

  // P9: variant-group representative (argmax by image count) — oracle-checked.
  private def q45(s: SparkSession, d: String): DataFrame = {
    val products = orders(s, d).select(
      col("o_orderkey"),
      when(pmod(col("o_orderkey"), lit(5)) > 0,
        col("o_orderkey") - pmod(col("o_orderkey"), lit(5))).as("parent_id"),
      array_repeat(lit("img"), pmod(col("o_orderkey"), lit(4)).cast("int")).as("images"))
    Pipeline.variantRepresentatives(products, "o_orderkey", "parent_id", "images")
      .orderBy(col("group_key"))
  }

  // P7/P8: granular curation patch + mark-curated fan-out, end-to-end over
  // synthesized tags. Oracle-checked per product: the patched JSON's
  // observable fields (surviving array entry, deleted_tags record, change
  // summary, feedback row) are extracted and compared against the oracle's
  // from-first-principles reconstruction — verifying applyTagPatch /
  // feedbackChangeSummary semantics without requiring byte-identical JSON
  // rendering across engines. CurationSpec goldens pin the full shapes.
  private def q49(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.etl.Curation
    val products = part(s, d).select(
      col("p_partkey").cast("string").as("product_id"),
      format_string(
        """{"category": "bottom", "style_identity": ["%s", "extra"], "fit": "slim"}""",
        element_at(split(col("p_name"), " "), 1)).as("tags_final"))
    val patches = part(s, d).select(
      col("p_partkey").cast("string").as("product_id"),
      lit("style_identity").as("field_name"),
      lit("remove").as("action"),
      element_at(split(col("p_name"), " "), 1).as("value"),
      lit("bench-curator").as("curator"),
      lit("synthetic removal").as("feedback_reason"),
      lit("incorrect_value").as("feedback_category"))
      .as[Curation.TagPatch]
    // one patch pass, materialized once, fanned out to both sinks — the
    // separate results/feedback branches would each re-execute the patch
    val combined = Curation.patchTagsCombined(products, patches)
      .localCheckpoint(true)
    val results = combined.select(col("result.*"))
    val feedback = combined
      .filter(col("feedback").isNotNull)
      .select(col("feedback.*"))
    val marked = Curation.markCurated(
      results.withColumn("original_ai_tags", lit("{}")),
      "bench-curator", "2026-02-27 00:00:00")
    marked.historyAppend
      .join(feedback.toDF()
        .select(col("product_id"), col("removed_value").as("feedback_removed")),
        Seq("product_id"))
      .select(
        col("product_id"),
        get_json_object(col("corrected_tags"), "$.style_identity[0]").as("remaining_tag"),
        get_json_object(col("corrected_tags"), "$.deleted_tags.style_identity[0].value").as("deleted_value"),
        get_json_object(col("corrected_tags"), "$.fit").as("fit"),
        col("change_summary"),
        col("feedback_removed"),
        col("curator"))
  // no trailing orderBy (r4): the sampling pass re-ran the post-checkpoint
  // join + JSON extractions; driver compare is order-insensitive
  }

  private val ExportSystemPrompt = "You are a fashion product tagging assistant."

  // A13: the full export-stats rollup (token estimate over the REAL JSONL
  // line built by TrainingExport.buildExampleJson, per-category counts,
  // GPT-4o cost arithmetic — export_training_data.py:206-232). The oracle
  // below reconstructs each three-message JSONL line character-exactly in
  // DuckDB (to_json escaping ≡ json4s JString rendering on this ASCII
  // input; Jackson pretty-print ≡ the literal " : "-separated template),
  // so the byte length — and hence estimate_tokens — matches exactly.
  private def q73(s: SparkSession, d: String): DataFrame = {
    val cat = element_at(array(lit("bottom"), lit("top"), lit("footwear")),
      (pmod(col("p_partkey"), lit(3)) + 1).cast("int"))
    val records = part(s, d).select(
      cat.as("category"),
      col("p_name").as("product_name"),
      col("p_type").as("description"),
      col("p_brand").as("brand_name"),
      format_string("""{"category": "%s", "fit": "slim"}""", cat).as("corrected_tags"))
    graft.export.TrainingExport.exportStatsByCategory(records, ExportSystemPrompt)
  }

  // P5 — the JSONL WRITER itself, oracle-checked per line (VERDICT r3
  // item 4): md5 + byte length of every emitted line, keyed by part. The
  // DuckDB oracle rebuilds each three-message line character-exactly (same
  // reconstruction q73 uses for lengths, here hashed), so any drift in
  // json4s escaping, the indent-2 user template, or Jackson's pretty
  // rendering of the assistant JSON hash-fails the row.
  private def q93(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cat = element_at(array(lit("bottom"), lit("top"), lit("footwear")),
      (pmod(col("p_partkey"), lit(3)) + 1).cast("int"))
    part(s, d).select(
      col("p_partkey"),
      format_string("""{"category": "%s", "fit": "slim"}""", cat).as("corrected_tags"),
      col("p_name").as("product_name"),
      cat.as("category"),
      col("p_type").as("description"),
      col("p_brand").as("brand_name"))
      .as[(Long, String, String, String, String, String)]
      .map { case (k, tags, name, c, desc, brand) =>
        (k, graft.export.TrainingExport.buildExampleJson(
          ExportSystemPrompt, tags, Option(name), Option(c), Option(desc),
          Option(brand)))
      }
      .toDF("product_id", "line")
      .select(col("product_id"), md5(col("line")).as("line_md5"),
        length(col("line")).cast("long").as("line_len"))
  }

  // P6 — validate_training_data.py:40-126 over a deterministic mix of
  // valid and broken examples (missing required tags, empty
  // style_identity list, blank formality, a footwear-path line). The
  // oracle re-derives every error string — including the "Line N:"
  // prefixes — from the p_partkey%5 construction rule.
  private def q94(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = pmod(col("p_partkey"), lit(5))
    val tags = when(m === 0, lit(
      """{"style_identity": ["classic"], "fit": "slim", "formality": "casual", "length": "regular", "context": "daily", "pairing_tags": ["jeans"]}"""))
      .when(m === 1, lit("""{"style_identity": ["classic"], "formality": "casual"}"""))
      .when(m === 2, lit("""{"style_identity": [], "fit": "slim", "formality": "casual", "length": "regular"}"""))
      .when(m === 3, lit("""{"style_identity": ["classic"], "fit": "slim", "formality": " ", "length": "regular"}"""))
      .otherwise(lit("""{"shoe_type": "boots", "profile": "low", "formality": "casual"}"""))
    val cat = when(m === 4, lit("shoes")).otherwise(lit("top"))
    val lines = part(s, d).select(
      col("p_partkey"), tags.as("corrected_tags"),
      col("p_name").as("product_name"), cat.as("category"),
      col("p_type").as("description"), col("p_brand").as("brand_name"))
      .as[(Long, String, String, String, String, String)]
      .map { case (k, t, name, c, desc, brand) =>
        (k, graft.export.TrainingExport.buildExampleJson(
          ExportSystemPrompt, t, Option(name), Option(c), Option(desc),
          Option(brand)))
      }
    graft.export.TrainingValidate.validateNumbered(lines)
      .select(
        col("line_num"),
        size(col("errors")).cast("long").as("n_errors"),
        size(col("warnings")).cast("long").as("n_warnings"),
        array_join(col("errors"), " | ").as("errors_joined"))
  }

  // D3 — infer_error_types (tag_comparison.py:160-224) + the X16 change
  // summary, driven through the real computeTagChanges diff on typed maps.
  // Seven residue classes cover every error rule: no-change, overtagging
  // (2 list removals), undertagging (2 list additions), construction
  // removal, fit modification, the 4-change low_confidence trigger, and
  // an UNKNOWN category diffed by shape inference.
  private def q100(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.policy.TagDiff
    part(s, d).select(col("p_partkey")).as[Long].map { k =>
      val v = s"s${k % 7}"
      val (orig, corr): (Map[String, Any], Map[String, Any]) = (k % 7) match {
        case 0 => (Map("fit" -> "slim", "style_identity" -> Seq("keep")),
          Map("fit" -> "slim", "style_identity" -> Seq("keep")))
        case 1 => (Map("style_identity" -> Seq(s"a$v", s"b$v", "keep")),
          Map("style_identity" -> Seq("keep")))
        case 2 => (Map("style_identity" -> Seq("keep")),
          Map("style_identity" -> Seq("keep", s"x$v", s"y$v")))
        case 3 => (Map("construction_details" -> Seq(s"c$v")),
          Map.empty[String, Any])
        case 4 => (Map("fit" -> "slim"), Map("fit" -> "baggy"))
        case 5 => (Map("fit" -> "slim", "formality" -> "casual",
          "pairing_tags" -> Seq("p1")),
          Map("fit" -> "baggy", "formality" -> "formal",
            "context" -> Seq("c9")))
        case _ => (Map("material" -> Seq("wool")),
          Map("material" -> Seq("wool", "silk")))
      }
      val ch = TagDiff.computeTagChanges(orig, corr)
      (k, ch.added.mkString(","), ch.removed.mkString(","),
        ch.unchanged.mkString(","),
        TagDiff.inferErrorTypes(ch).mkString(","),
        TagDiff.changeSummary(ch))
    }.toDF("part_id", "added", "removed", "unchanged", "error_types",
      "change_summary")
  }

  // X18 — _format_curator_feedback (export_training_data.py:40-96): the
  // CURATOR FEEDBACK block as it lands in the system message, one
  // feedback shape per residue (deleted with reason, added without,
  // modified with reason, none). Extracted from the REAL emitted line via
  // get_json_object so the whole P5 path runs.
  private def q102(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val m = pmod(col("p_partkey"), lit(4))
    val tags = when(m === 0, lit("""{"fit": "slim"}"""))
      .when(m === 1, lit(
        """{"fit": "slim", "deleted_tags": {"style_identity": [{"value": "vintage", "reason": "too generic"}]}}"""))
      .when(m === 2, lit(
        """{"fit": "slim", "added_tags": {"fit": [{"tag": "slim"}]}}"""))
      .otherwise(lit(
        """{"fit": "slim", "modified_tags": {"formality": {"from": "casual", "to": "formal", "reason": "dressier"}}}"""))
    val lines = part(s, d).select(
      col("p_partkey"), tags.as("corrected_tags"),
      col("p_name").as("product_name"), lit("top").as("category"),
      col("p_type").as("description"), col("p_brand").as("brand_name"))
      .as[(Long, String, String, String, String, String)]
      .map { case (k, t, name, c, desc, brand) =>
        (k, graft.export.TrainingExport.buildExampleJson(
          ExportSystemPrompt, t, Option(name), Option(c), Option(desc),
          Option(brand)))
      }
      .toDF("part_id", "line")
    lines.select(col("part_id"),
      get_json_object(col("line"), "$.messages[0].content").as("system_content"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q44_tag_pipeline" -> q44 _,
    "q45_variant_representatives" -> q45 _,
    "q49_curation_patch" -> q49 _,
    "q73_export_cost_stats" -> q73 _,
    "q93_export_jsonl_lines" -> q93 _,
    "q94_export_validation" -> q94 _,
    "q100_error_classify" -> q100 _,
    "q102_curator_feedback" -> q102 _
  )

  /** Generated oracle for q44: the synthetic response per part is fully
    * determined by p_partkey, so the parser's vocab filtering and every
    * policy threshold reduce to integer comparisons on the confidence
    * numerators ((p*k)%m+c, two-decimal values). Facts encoded below,
    * validated against the reference vocabularies (refitd_tagger.py):
    * spacewear (style slot 5), dressy (formality slot 4), moon-boots
    * (footwear's only shoe_type) and plaid (footwear's pattern) are
    * out-of-vocab → parser-dropped; every other synthesized tag is legal
    * for its category. Footwear therefore always misses shoe_type →
    * needs_fix + dress-shoes default. Thresholds: style flag .70/auto
    * .85, fit flag .65, silhouette allow .65/auto .80, formality flag
    * .65, pattern allow .70. top_layer_role defaults unless a layer
    * keyword occurs in the product name (tag_policy.py:493-514). */
  private def tagPipelineOracle: String = {
    val midKw = Seq("sweater", "cardigan", "hoodie", "hoodies", "knit",
      "knitwear", "pullover", "sweatshirt", "fleece", "quarter-zip",
      "half-zip", "zip-up")
    val baseKw = Seq("tshirt", "t-shirt", "tee", "long sleeve", "shirt",
      "polo", "tank", "henley")
    val kw = (midKw ++ baseKw)
      .map(k => s"lower(p_name) LIKE '%$k%'").mkString(" OR ")
    s"""WITH b AS (
       | SELECT p_partkey%3 AS m3, p_partkey%4 AS m4, p_partkey%5 AS m5,
       |  CASE p_partkey%3 WHEN 0 THEN 'bottom' WHEN 1 THEN 'top' ELSE 'footwear' END AS category,
       |  (p_partkey*7)%50+50 AS c1, (p_partkey*13)%60+40 AS c2,
       |  (p_partkey*11)%50+50 AS cf, (p_partkey*17)%40+60 AS cs,
       |  (p_partkey*19)%50+50 AS cfo, (p_partkey*29)%50+50 AS cp,
       |  CASE WHEN NOT ($kw) THEN 1 ELSE 0 END AS tl_def
       | FROM part),
       |d AS (
       | SELECT category, m3, tl_def,
       |  (CASE WHEN m5 <> 4 AND c1 < 70 THEN 1 ELSE 0 END +
       |   CASE WHEN c2 < 70 THEN 1 ELSE 0 END) AS style_supp,
       |  ((m5 = 4 OR c1 < 70) AND c2 < 70) AS style_missing,
       |  ((m5 <> 4 AND c1 >= 70 AND c1 < 85) OR (c2 >= 70 AND c2 < 85)) AS style_review,
       |  CASE WHEN m4 <> 3 AND cfo < 65 THEN 1 ELSE 0 END AS form_supp,
       |  CASE WHEN m4 = 3 OR cfo < 65 THEN 1 ELSE 0 END AS form_def,
       |  CASE WHEN cf < 65 THEN 1 ELSE 0 END AS fit_supp,
       |  CASE WHEN cs < 65 THEN 1 ELSE 0 END AS sil_supp,
       |  (cs >= 65 AND cs < 80) AS sil_review,
       |  CASE WHEN cp < 70 THEN 1 ELSE 0 END AS pat_supp
       | FROM b),
       |r AS (
       | SELECT category,
       |  CASE WHEN m3 = 2 THEN style_supp + form_supp
       |       ELSE style_supp + form_supp + fit_supp + sil_supp + pat_supp END AS n_suppressed,
       |  CASE WHEN m3 = 2 THEN form_def + 1
       |       WHEN m3 = 1 THEN form_def + fit_supp + sil_supp + tl_def
       |       ELSE form_def + fit_supp + sil_supp END AS n_defaults,
       |  CASE WHEN m3 = 2 THEN 'needs_fix'
       |       WHEN style_missing THEN 'needs_fix'
       |       WHEN style_review OR sil_review THEN 'needs_review'
       |       ELSE 'approved' END AS curation_status
       | FROM d)
       |SELECT category, curation_status, COUNT(*) AS n,
       | CAST(SUM(n_suppressed) AS BIGINT) AS total_suppressed,
       | CAST(SUM(n_defaults) AS BIGINT) AS total_defaults,
       | CAST(SUM(0) AS BIGINT) AS n_parse_failed
       |FROM r GROUP BY category, curation_status ORDER BY category, curation_status""".stripMargin
  }

  /** q73 oracle: rebuild each JSONL line character-exactly (DuckDB
    * `to_json` string escaping ≡ json4s JString; Jackson default pretty ≡
    * the 2-space " : " template on this flat object), then the reference's
    * max(1, len/4) token estimate and cost arithmetic per category. */
  private def exportCostOracle: String =
    s"""WITH rec AS (
       |  SELECT CASE p_partkey%3 WHEN 0 THEN 'bottom' WHEN 1 THEN 'top'
       |              ELSE 'footwear' END AS category,
       |         p_name, p_type, p_brand
       |  FROM part),
       |lines AS (
       |  SELECT category,
       |    '{"messages":[{"role":"system","content":' ||
       |    CAST(to_json('$ExportSystemPrompt') AS VARCHAR) ||
       |    '},{"role":"user","content":' ||
       |    CAST(to_json('{' || chr(10) ||
       |      '  "title": ' || CAST(to_json(p_name) AS VARCHAR) || ',' || chr(10) ||
       |      '  "category": ' || CAST(to_json(category) AS VARCHAR) || ',' || chr(10) ||
       |      '  "description": ' || CAST(to_json(p_type) AS VARCHAR) || ',' || chr(10) ||
       |      '  "brand": ' || CAST(to_json(p_brand) AS VARCHAR) || chr(10) ||
       |      '}') AS VARCHAR) ||
       |    '},{"role":"assistant","content":' ||
       |    CAST(to_json('{' || chr(10) ||
       |      '  "category" : ' || CAST(to_json(category) AS VARCHAR) || ',' || chr(10) ||
       |      '  "fit" : "slim"' || chr(10) ||
       |      '}') AS VARCHAR) ||
       |    '}]}' AS line
       |  FROM rec)
       |SELECT category,
       |  COUNT(*) AS n_examples,
       |  CAST(SUM(GREATEST(1, length(line) // 4)) AS BIGINT) AS est_tokens,
       |  CAST(CAST(SUM(GREATEST(1, length(line) // 4)) AS BIGINT) AS DOUBLE)
       |    / 1000000.0 * 25.0 AS est_cost_usd
       |FROM lines
       |GROUP BY category
       |ORDER BY category""".stripMargin

  /** q93 oracle: the q73 line reconstruction, keyed per part and hashed —
    * md5 over the character-exact rebuild pins the writer's bytes. */
  private def exportLinesOracle: String =
    s"""WITH rec AS (
       |  SELECT p_partkey,
       |         CASE p_partkey%3 WHEN 0 THEN 'bottom' WHEN 1 THEN 'top'
       |              ELSE 'footwear' END AS category,
       |         p_name, p_type, p_brand
       |  FROM part),
       |lines AS (
       |  SELECT p_partkey,
       |    '{"messages":[{"role":"system","content":' ||
       |    CAST(to_json('$ExportSystemPrompt') AS VARCHAR) ||
       |    '},{"role":"user","content":' ||
       |    CAST(to_json('{' || chr(10) ||
       |      '  "title": ' || CAST(to_json(p_name) AS VARCHAR) || ',' || chr(10) ||
       |      '  "category": ' || CAST(to_json(category) AS VARCHAR) || ',' || chr(10) ||
       |      '  "description": ' || CAST(to_json(p_type) AS VARCHAR) || ',' || chr(10) ||
       |      '  "brand": ' || CAST(to_json(p_brand) AS VARCHAR) || chr(10) ||
       |      '}') AS VARCHAR) ||
       |    '},{"role":"assistant","content":' ||
       |    CAST(to_json('{' || chr(10) ||
       |      '  "category" : ' || CAST(to_json(category) AS VARCHAR) || ',' || chr(10) ||
       |      '  "fit" : "slim"' || chr(10) ||
       |      '}') AS VARCHAR) ||
       |    '}]}' AS line
       |  FROM rec)
       |SELECT p_partkey AS product_id, md5(line) AS line_md5,
       |       CAST(length(line) AS BIGINT) AS line_len
       |FROM lines ORDER BY product_id""".stripMargin

  /** q94 oracle: every validation outcome — counts AND the exact error
    * strings with their "Line N:" prefixes — re-derived from the
    * p_partkey%5 construction rule. */
  private def exportValidationOracle: String =
    """SELECT p_partkey AS line_num,
      |  CAST(CASE p_partkey%5 WHEN 1 THEN 2 WHEN 2 THEN 1 WHEN 3 THEN 1
      |       ELSE 0 END AS BIGINT) AS n_errors,
      |  CAST(CASE WHEN p_partkey%5 = 0 THEN 0 ELSE 2 END AS BIGINT) AS n_warnings,
      |  CASE p_partkey%5
      |    WHEN 1 THEN 'Line ' || p_partkey || ': Missing required tag ''fit'' | Line '
      |                 || p_partkey || ': Missing required tag ''length'''
      |    WHEN 2 THEN 'Line ' || p_partkey || ': ''style_identity'' must be non-empty list'
      |    WHEN 3 THEN 'Line ' || p_partkey || ': ''formality'' must be non-empty string'
      |    ELSE '' END AS errors_joined
      |FROM part ORDER BY line_num""".stripMargin

  /** q100 oracle: every diff list, error set, and summary string restated
    * per residue class (the diff inputs are pure functions of
    * p_partkey%7, and TagChanges sorts its lists). */
  private def errorClassifyOracle: String =
    """SELECT p_partkey AS part_id,
      |  CASE p_partkey%7 WHEN 2 THEN 'style_identity:xs2,style_identity:ys2'
      |    WHEN 5 THEN 'context:c9' WHEN 6 THEN 'material:silk'
      |    ELSE '' END AS added,
      |  CASE p_partkey%7 WHEN 1 THEN 'style_identity:as1,style_identity:bs1'
      |    WHEN 3 THEN 'construction_details:cs3' WHEN 5 THEN 'pairing_tags:p1'
      |    ELSE '' END AS removed,
      |  CASE p_partkey%7 WHEN 0 THEN 'fit:slim,style_identity:keep'
      |    WHEN 1 THEN 'style_identity:keep' WHEN 2 THEN 'style_identity:keep'
      |    WHEN 6 THEN 'material:wool' ELSE '' END AS unchanged,
      |  CASE p_partkey%7 WHEN 1 THEN 'overtagging,wrong_style_identity'
      |    WHEN 2 THEN 'undertagging,wrong_style_identity'
      |    WHEN 3 THEN 'wrong_construction' WHEN 4 THEN 'wrong_fit'
      |    WHEN 5 THEN 'low_confidence,wrong_fit,wrong_formality'
      |    ELSE '' END AS error_types,
      |  CASE p_partkey%7
      |    WHEN 1 THEN 'Removed: style_identity:as1, style_identity:bs1'
      |    WHEN 2 THEN 'Added: style_identity:xs2, style_identity:ys2'
      |    WHEN 3 THEN 'Removed: construction_details:cs3'
      |    WHEN 4 THEN 'Modified: fit: slim → baggy'
      |    WHEN 5 THEN 'Added: context:c9; Removed: pairing_tags:p1; Modified: fit: slim → baggy, formality: casual → formal'
      |    WHEN 6 THEN 'Added: material:silk'
      |    ELSE '' END AS change_summary
      |FROM part ORDER BY part_id""".stripMargin

  /** q102 oracle: the system-message content — prompt plus the CURATOR
    * FEEDBACK block — rebuilt line by line per feedback shape. */
  private def curatorFeedbackOracle: String =
    s"""SELECT p_partkey AS part_id,
       |  CASE p_partkey%4
       |    WHEN 0 THEN '$ExportSystemPrompt'
       |    WHEN 1 THEN '$ExportSystemPrompt' || chr(10) || chr(10) ||
       |      'CURATOR FEEDBACK' || chr(10) ||
       |      '- Removed ''vintage'' from style_identity: too generic'
       |    WHEN 2 THEN '$ExportSystemPrompt' || chr(10) || chr(10) ||
       |      'CURATOR FEEDBACK' || chr(10) || '- Added ''slim'' to fit'
       |    ELSE '$ExportSystemPrompt' || chr(10) || chr(10) ||
       |      'CURATOR FEEDBACK' || chr(10) ||
       |      '- Changed formality from ''casual'' to ''formal'': dressier'
       |  END AS system_content
       |FROM part ORDER BY part_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q44_tag_pipeline" -> tagPipelineOracle,
    "q73_export_cost_stats" -> exportCostOracle,
    "q93_export_jsonl_lines" -> exportLinesOracle,
    "q94_export_validation" -> exportValidationOracle,
    "q100_error_classify" -> errorClassifyOracle,
    "q102_curator_feedback" -> curatorFeedbackOracle,
    "q49_curation_patch" ->
      ("SELECT CAST(p_partkey AS VARCHAR) AS product_id, " +
        "'extra' AS remaining_tag, t AS deleted_value, 'slim' AS fit, " +
        "'Removed: style_identity:' || t AS change_summary, " +
        "t AS feedback_removed, 'bench-curator' AS curator " +
        "FROM (SELECT p_partkey, string_split(p_name, ' ')[1] AS t FROM part) " +
        "ORDER BY product_id"),
    "q45_variant_representatives" ->
      ("SELECT group_key, o_orderkey AS representative_id FROM " +
        "(SELECT o_orderkey, group_key, ROW_NUMBER() OVER " +
        "(PARTITION BY group_key ORDER BY n_img DESC, o_orderkey) AS rn FROM " +
        "(SELECT o_orderkey, COALESCE(CASE WHEN o_orderkey % 5 > 0 " +
        "THEN o_orderkey - o_orderkey % 5 END, o_orderkey) AS group_key, " +
        "o_orderkey % 4 AS n_img FROM orders)) WHERE rn = 1 ORDER BY group_key")
  )
}
