package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.{Sampling, SequencePacking}

/** Training-data curation queries: deterministic stratified sampling and
  * sequence packing over `documents` — the corpus-shaping steps between
  * dedup/quality-filtering and export. Both oracle-checked (md5 picks and
  * windowed running sums are engine-portable).
  */
object TrainingQueries {

  // Stratified sampling: exactly 20 docs per language by md5 order, plus
  // a ~25% hash-sampled flag — deterministic across engines.
  private def q61(s: SparkSession, d: String): DataFrame =
    Sampling.stratifiedExact(documents(s, d), "doc_id", "lang", n = 20)
      .select(col("doc_id"), col("lang"),
        (Sampling.hashSlot(col("doc_id"), "graft") < math.round(0.25 * 65536).toInt)
          .as("in_quarter_sample"))
      .orderBy(col("doc_id"))

  // Concat-and-chop sequence packing: 256-token windows over 8 shards
  // (portable pmod sharding so the oracle reproduces the layout).
  private def q62(s: SparkSession, d: String): DataFrame =
    SequencePacking.concatChop(documents(s, d), "doc_id", "text",
      capacity = 256, shards = 8, shardBy = Some(pmod(col("doc_id"), lit(8))))
      .select(col("shard"), col("doc_id"), col("n_tokens"),
        col("start_offset"), col("first_window"), col("last_window"),
        col("n_windows"))
      .orderBy(col("doc_id"))

  // The full corpus-curation pipeline as ONE query: exact dedup
  // (keep-first) → quality filter → stratified sample (≤50/lang by md5
  // order) → per-language stats. The composition every pretraining corpus
  // goes through between ingest and packing; each stage reuses the
  // oracle-verified operator.
  private def q63(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Dedup
    import graft.functions.TextAnalysis
    val deduped = Dedup.exactDedup(documents(s, d), "text", "doc_id")
    val filtered = deduped
      .filter(TextAnalysis.qualityScore(col("text"), Nil) >= 0.5)
    Sampling.stratifiedExact(filtered, "doc_id", "lang", n = 50)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("total_tokens"),
        sum(TextAnalysis.tokenEstimate(col("text"))).as("total_est_tokens"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_stratified_sample" -> q61 _,
    "q62_sequence_packing" -> q62 _,
    "q63_corpus_curation" -> q63 _
  )

  val oracle: Map[String, String] = Map(
    "q63_corpus_curation" ->
      ("WITH dd AS (SELECT doc_id, lang, text FROM " +
        "(SELECT doc_id, lang, text, ROW_NUMBER() OVER " +
        "(PARTITION BY lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) " +
        "ORDER BY doc_id) AS rn FROM documents) WHERE rn = 1), " +
        "q AS (SELECT doc_id, lang, text, " +
        "len(string_split_regex(text, '\\s+')) AS n, " +
        "len(list_distinct(string_split_regex(text, '\\s+'))) AS dtok FROM dd), " +
        "f AS (SELECT * FROM q WHERE " +
        "(LEAST(CAST(n AS DOUBLE) / 20.0, 1.0) + CAST(dtok AS DOUBLE) / n) / 2.0 >= 0.5), " +
        "sampled AS (SELECT * FROM f QUALIFY ROW_NUMBER() OVER " +
        "(PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR) || ':graft'), doc_id) <= 50) " +
        "SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n) AS BIGINT) AS total_tokens, " +
        "CAST(SUM(GREATEST(1, CAST(FLOOR(LENGTH(text) / 4.0) AS BIGINT))) AS BIGINT) AS total_est_tokens " +
        "FROM sampled GROUP BY lang ORDER BY lang"),
    "q61_stratified_sample" ->
      ("SELECT doc_id, lang, " +
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':graft'), 1, 4))::INT < 16384 " +
        "AS in_quarter_sample FROM (" +
        "SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang " +
        "ORDER BY md5(CAST(doc_id AS VARCHAR) || ':graft'), doc_id) AS rk " +
        "FROM documents) WHERE rk <= 20 ORDER BY doc_id"),
    "q62_sequence_packing" ->
      ("SELECT shard, doc_id, n_tokens, start_offset, " +
        "CAST(FLOOR(start_offset / 256.0) AS BIGINT) AS first_window, " +
        "CAST(FLOOR((start_offset + n_tokens - 1) / 256.0) AS BIGINT) AS last_window, " +
        "CAST(FLOOR((start_offset + n_tokens - 1) / 256.0) - FLOOR(start_offset / 256.0) + 1 AS BIGINT) AS n_windows " +
        "FROM (SELECT shard, doc_id, n_tokens, " +
        "COALESCE(CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS start_offset " +
        "FROM (SELECT doc_id % 8 AS shard, doc_id, " +
        "CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens " +
        "FROM documents)) ORDER BY doc_id")
  )
}
