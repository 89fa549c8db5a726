package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.Multimodal

/** T5 — the generator read-path spec (docs/Generator Execution & Scoring
  * Model: hard filters → candidate pools per slot → additive bounded
  * scoring → assembly one-per-slot → outfit scoring), plus the multimodal
  * feature rollup. Scores are floored to exact integers (e6) before any
  * cross-row summation so results are engine-exact.
  */
object GeneratorQueries {

  /** Additive bounded score, all IEEE double ops in fixed order:
    * 0.5·price_norm + 0.3·freshness + 0.2·priority_weight, floored at 1e-6. */
  private def scoredCandidates(s: SparkSession, d: String): DataFrame = {
    val ord = when(col("o_orderpriority") === "1-URGENT", 1)
      .when(col("o_orderpriority") === "2-HIGH", 2)
      .when(col("o_orderpriority") === "3-MEDIUM", 3)
      .when(col("o_orderpriority") === "4-NOT SPECIFIED", 4)
      .otherwise(5)
    orders(s, d)
      .filter(col("o_orderstatus") =!= "F") // hard filter
      .withColumn("price_norm", col("o_totalprice") / 600000.0)
      .withColumn("freshness",
        lit(1.0) / (lit(1.0) +
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).cast("double") / 365.0))
      .withColumn("wt", (lit(6) - ord).cast("double") / 5.0)
      .withColumn("score_e6",
        floor((col("price_norm") * 0.5 + col("freshness") * 0.3 + col("wt") * 0.2) * 1e6)
          .cast("long"))
  }

  // Candidate pools: per-slot top-2 by bounded additive score.
  private def q46(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("score_e6").desc, col("o_orderkey"))
    scoredCandidates(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select(col("o_orderpriority").as("slot"), col("rk"),
        col("o_orderkey"), col("score_e6"))
      .orderBy(col("slot"), col("rk"))
  }

  // Assembly: exactly one product per slot with NO duplicate product across
  // slots (generator doc §6) — greedy in slot/priority order via
  // Assembly.assembleDistinct. The product identity is the customer
  // (o_custkey), which unlike o_orderkey CAN top several slots, so the
  // cross-slot exclusion is actually exercised. Outfit score = Σ slot scores.
  private def q47(s: SparkSession, d: String): DataFrame = {
    val cands = scoredCandidates(s, d).select(
      col("o_orderpriority").as("slot"),
      col("o_custkey").as("product_id"),
      col("score_e6"))
    graft.operators.Assembly.assembleDistinct(cands, "slot", "product_id", "score_e6")
      .withColumn("outfit_score_e6", sum(col("score_e6")).over(Window.partitionBy()))
      .orderBy(col("slot"))
  }

  // Multimodal: binary assets from documents → batched decode-stub →
  // per-kind rollup. The byte histogram is stubbed; byte/frame accounting
  // is exact and oracle-checked.
  private def q48(s: SparkSession, d: String): DataFrame =
    Multimodal.featureStats(
      Multimodal.decodeFeatures(
        Multimodal.assetsFromText(documents(s, d), "doc_id", "text")))

  // Frame sampling over the video assets: every 4th 64-byte frame, with
  // per-frame content hashes — the sampled-frame inventory a vision
  // training pipeline feeds to its decoder. Oracle reconstructs every
  // frame hash via substr+md5 (payloads are ASCII text standins).
  private def q65(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.assetsFromText(documents(s, d), "doc_id", "text"),
      frameBytes = 64, stride = 4)
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_sampled"),
        countDistinct(col("frame_md5")).as("n_distinct_frames"),
        min(col("frame_md5")).as("min_frame_md5"),
        max(col("offset")).as("max_offset"))
      .orderBy(col("asset_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_generator_pools" -> q46 _,
    "q47_outfit_assembly" -> q47 _,
    "q48_multimodal_stats" -> q48 _,
    "q65_frame_sampling" -> q65 _
  )

  private val scoredCte =
    "WITH scored AS (SELECT o_orderpriority, o_orderkey, " +
      "CAST(FLOOR((o_totalprice / 600000.0 * 0.5 + " +
      "1.0 / (1.0 + CAST(datediff('day', o_orderdate, DATE '2002-01-01') AS DOUBLE) / 365.0) * 0.3 + " +
      "CAST(6 - (CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 " +
      "WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4 ELSE 5 END) AS DOUBLE) / 5.0 * 0.2" +
      ") * 1e6) AS BIGINT) AS score_e6 " +
      "FROM orders WHERE o_orderstatus <> 'F'), " +
      "ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority " +
      "ORDER BY score_e6 DESC, o_orderkey) AS rk FROM scored) "

  /** q47 oracle: the greedy walk unrolled per slot — the 5 order
    * priorities ARE the slot set, processed in ascending (= priority)
    * order, each excluding every earlier slot's pick. */
  private def outfitAssemblyOracle: String = {
    val slots = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val base =
      "WITH scored AS (SELECT o_orderpriority AS slot, o_custkey AS product_id, " +
        "CAST(FLOOR((o_totalprice / 600000.0 * 0.5 + " +
        "1.0 / (1.0 + CAST(datediff('day', o_orderdate, DATE '2002-01-01') AS DOUBLE) / 365.0) * 0.3 + " +
        "CAST(6 - (CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 " +
        "WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4 ELSE 5 END) AS DOUBLE) / 5.0 * 0.2" +
        ") * 1e6) AS BIGINT) AS score_e6 " +
        "FROM orders WHERE o_orderstatus <> 'F'), " +
        "best AS (SELECT slot, product_id, MAX(score_e6) AS score_e6 " +
        "FROM scored GROUP BY slot, product_id)"
    val stepCtes = slots.zipWithIndex.map { case (slot, i) =>
      val exclusions =
        if (i == 0) ""
        else " AND product_id NOT IN (" +
          (0 until i).map(j => s"SELECT product_id FROM s$j").mkString(" UNION ") + ")"
      s", s$i AS (SELECT slot, product_id, score_e6 FROM best " +
        s"WHERE slot = '$slot'$exclusions ORDER BY score_e6 DESC, product_id LIMIT 1)"
    }.mkString
    val unionAll = slots.indices.map(i => s"SELECT * FROM s$i").mkString(" UNION ALL ")
    base + stepCtes +
      s", picks AS ($unionAll) " +
      "SELECT slot, product_id, score_e6, " +
      "CAST(SUM(score_e6) OVER () AS BIGINT) AS outfit_score_e6 " +
      "FROM picks ORDER BY slot"
  }

  val oracle: Map[String, String] = Map(
    "q46_generator_pools" ->
      (scoredCte + "SELECT o_orderpriority AS slot, rk, o_orderkey, score_e6 " +
        "FROM ranked WHERE rk <= 2 ORDER BY slot, rk"),
    "q47_outfit_assembly" -> outfitAssemblyOracle,
    // The decoder must parse back out of the container headers exactly what
    // the id-derived builder put in — the oracle re-derives those values
    // from doc_id, so a parser that misreads any header field hash-fails.
    "q48_multimodal_stats" ->
      ("SELECT kind, COUNT(*) AS n_assets, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes, " +
        "CAST(SUM(n_frames) AS BIGINT) AS total_frames, " +
        "CAST(SUM(pixels) AS BIGINT) AS total_pixels, " +
        "CAST(SUM(channels) AS BIGINT) AS total_channels, " +
        "CAST(MAX(sample_rate) AS INT) AS max_sample_rate FROM " +
        "(SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' " +
        "ELSE 'video' END AS kind, CAST(LENGTH(text) AS BIGINT) AS n_bytes, " +
        "CASE WHEN doc_id % 3 = 2 THEN GREATEST(1, CAST(FLOOR(LENGTH(text) / 64) AS BIGINT)) " +
        "ELSE 1 END AS n_frames, " +
        "CASE WHEN doc_id % 3 = 0 THEN (16 + doc_id % 500) * (16 + doc_id % 300) " +
        "WHEN doc_id % 3 = 2 THEN (320 + (doc_id % 4) * 160) * (240 + (doc_id % 4) * 120) " +
        "ELSE 0 END AS pixels, " +
        "CASE WHEN doc_id % 3 = 0 THEN 3 + doc_id % 2 " +
        "WHEN doc_id % 3 = 1 THEN 1 + doc_id % 2 ELSE 0 END AS channels, " +
        "CASE WHEN doc_id % 3 = 1 THEN 8000 * (1 + doc_id % 5) ELSE 0 END AS sample_rate " +
        "FROM documents) GROUP BY kind ORDER BY kind"),
    "q65_frame_sampling" ->
      ("WITH v AS (SELECT doc_id AS asset_id, text, " +
        "GREATEST(1, CAST(FLOOR(LENGTH(text) / 64) AS BIGINT)) AS n_frames " +
        "FROM documents WHERE doc_id % 3 = 2), " +
        "fr AS (SELECT asset_id, i AS frame_idx, CAST(i * 64 AS BIGINT) AS off, " +
        "md5(substr(text, CAST(i * 64 + 1 AS BIGINT), 64)) AS fmd5 " +
        "FROM v, UNNEST(range(0, n_frames)) u(i) WHERE i % 4 = 0) " +
        "SELECT asset_id, COUNT(*) AS n_sampled, " +
        "CAST(COUNT(DISTINCT fmd5) AS BIGINT) AS n_distinct_frames, " +
        "MIN(fmd5) AS min_frame_md5, MAX(off) AS max_offset " +
        "FROM fr GROUP BY asset_id ORDER BY asset_id")
  )
}
