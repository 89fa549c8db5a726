package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextAnalysis

/** Corpus-statistics query set over `documents` — round-3 extensions of
  * the training-data pipeline: cross-document novelty, per-source
  * distribution outliers, exact quantile bucketing, and TF-IDF salient
  * terms. All oracle-checked; every float emitted is either a single IEEE
  * operation on exact integers or e6-floored (oracle-parity rules).
  */
object CorpusQueries {

  // Cross-document n-gram novelty: the fraction of a doc's distinct
  // 3-gram shingles whose corpus-wide FIRST occurrence (min doc_id) is
  // this doc — the "how much new text does this doc add" signal used to
  // prioritize crawl ingestion. The decomposition avoids ever joining on
  // the shingle: n_shingles is the ROW-LOCAL distinct-array size, and
  // n_novel is a per-doc COUNT over the first-seen table itself (each
  // shingle's min doc credits exactly one doc) — so the only shuffles
  // are the partial-aggregating per-shingle min (map-side combine makes
  // stop-word trigram skew a non-event, unlike a shingle-partitioned
  // window) and a tiny doc-keyed rollup + left join. Measured at x10:
  // shingle-join shape 2.79 s, shingle-window shape 0.99 s (fastest but
  // combiner-less — one straggler task per hot shingle on a real web
  // corpus), this shape 1.70 s in r3 — of which the shingling pass ran
  // TWICE (two plan branches); with the r4 localCheckpoint it reads
  // 0.82-1.06 s, at parity with the window shape while keeping the
  // map-side combine that survives hot-shingle skew.
  private def q79(s: SparkSession, d: String): DataFrame = {
    // localCheckpoint: the two consumers below (row-local n_shingles and
    // the exploded first-seen branch) are separate plan branches — without
    // materialization the tokenize + graft_shingles + array_distinct pass
    // over the whole corpus runs TWICE (same pattern as LinkAnalysis's
    // checkpointed edge list)
    val docsSh = documents(s, d)
      .select(col("doc_id"),
        array_distinct(call_function("graft_shingles", col("text"), lit(3)))
          .as("arr"))
      .localCheckpoint(true)
    val base = docsSh
      .select(col("doc_id"), size(col("arr")).cast("long").as("n_shingles"))
      .filter(col("n_shingles") > 0)
    val novel = docsSh
      .select(col("doc_id"), explode(col("arr")).as("shingle"))
      .groupBy(col("shingle"))
      .agg(min(col("doc_id")).as("first_doc"))
      .groupBy(col("first_doc").as("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    base.join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_shingles"))
  }

  // Per-source length outliers: z-score of n_chars against the source's
  // distribution, computed from EXACT integer sums (n, Σx, Σx²) so both
  // engines derive bit-identical doubles: mean = s1/n and
  // sd = sqrt(n·s2 − s1²)/n are each one correctly-rounded IEEE op on
  // exact integers. The per-source stats row is a broadcast (sources are
  // few); no window, no second shuffle.
  private def q81(s: SparkSession, d: String): DataFrame = {
    // All squared terms in DECIMAL(38,0), starting at the PER-ROW square:
    // n_chars² wraps Long for a single ~3e9-char doc, and Σ n_chars²
    // wraps for ~9 TB of text in one source — both silent in non-ANSI
    // Spark. decimal(38,0) covers the full Long input range (s1² ≤
    // 8.5e37) with the same exact integer values, so tested-scale hashes
    // are unchanged; the oracle side keeps DuckDB's native HUGEINT sums
    // (which are exact per-row too). s1 itself stays Long — it cannot
    // overflow below 9 exabytes of text per source.
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val stats = documents(s, d)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("n_chars")).as("s1"),
        sum(dec(col("n_chars")) * dec(col("n_chars"))).as("s2"))
      .withColumn("var_num",
        dec(col("n")) * col("s2") - dec(col("s1")) * dec(col("s1")))
    val mean = col("s1").cast("double") / col("n")
    val sd = sqrt(col("var_num").cast("double")) / col("n")
    val z = (col("n_chars") - mean) / sd
    documents(s, d)
      .join(broadcast(stats), Seq("source"))
      .select(
        col("doc_id"), col("source"), col("n_chars"),
        when(col("var_num") > 0, floor(z * 1e6).cast("long"))
          .otherwise(0L).as("z_e6"),
        when(col("var_num") > 0, abs(z) > 2.0)
          .otherwise(lit(false)).as("is_outlier"))
  }

  // Exact quality quartiles: global rank over (quality DESC, doc_id) via
  // the scalable GlobalRank operator (range partition + offset ranks — no
  // single-partition window), bucket b = (rank−1)·4 div N, then the
  // per-quartile rollup. The count(*) feeding N is a parquet-metadata
  // scan. Integer `div` keeps the bucket boundary exact in both engines.
  private def q83(s: SparkSession, d: String): DataFrame = {
    val n = documents(s, d).count()
    val scored = documents(s, d)
      .select(col("doc_id"),
        TextAnalysis.qualityScore(col("text"), Nil).as("quality"))
    graft.operators.GlobalRank
      .withGlobalRank(scored, "rk", col("quality").desc, col("doc_id"))
      .withColumn("quartile",
        (expr(s"(rk - 1) * 4 div ${n}L") + 1L).cast("int"))
      .groupBy(col("quartile"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(floor(col("quality") * 1e6).cast("long")).as("min_q_e6"),
        max(floor(col("quality") * 1e6).cast("long")).as("max_q_e6"))
      .orderBy(col("quartile"))
  }

  // TF-IDF-style salient terms per language: tf = term count within the
  // language, df = number of languages containing the term, score = tf/df
  // (one IEEE division — parity-safe; a log-idf would hang the hash on
  // transcendental rounding). Top-5 per language, token tie-break.
  // Two-phase top-k: a language's whole vocabulary in ONE window
  // partition would serialize the ranking through a handful of straggler
  // tasks (few languages = giant partitions), so phase 1 takes the top-5
  // per (lang, token-hash salt) — 64 bounded partitions per language,
  // fully parallel — and phase 2 ranks only the ≤ 5·64 survivors per
  // language. The per-lang top-5 is always contained in the union of the
  // per-salt top-5s, so the output is identical to the one-window form.
  private def q85(s: SparkSession, d: String): DataFrame = {
    val tf = documents(s, d)
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    val score = col("tf").cast("double").divide(col("df"))
    val w1 = Window.partitionBy(col("lang"), pmod(xxhash64(col("token")), lit(64)))
      .orderBy(score.desc, col("token"))
    val w2 = Window.partitionBy(col("lang"))
      .orderBy(score.desc, col("token"))
    tf.join(df_, Seq("token"))
      .withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= 5)
      .withColumn("rk", row_number().over(w2).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("rk"), col("token"), col("tf"), col("df"),
        floor(col("tf").cast("double") / col("df") * 1e6).cast("long").as("score_e6"))
      .orderBy(col("lang"), col("rk"))
  }

  // Hierarchical subtotals (ROLLUP): per (lang, source), per lang, and
  // grand total in one pass — Spark plans the three grouping sets as ONE
  // expand + aggregate (no re-scan per level). The corpus has no NULL
  // group keys, so subtotal rows are safely labeled via coalesce.
  private def q89(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .rollup(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        max(col("n_chars")).as("max_chars"))
      .select(
        coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("n_docs"), col("total_chars"), col("max_chars"))
      .orderBy(col("lang"), col("source"))

  // Arbitrary GROUPING SETS (the general form q89's ROLLUP is a special
  // case of): non-hierarchical set list {(lang, source), (source), ()}
  // — a rollup could not produce the (source)-only level — with
  // grouping_id() disambiguating genuine nulls from aggregation levels.
  // One Expand + one aggregate pass, same single-shuffle shape as q89.
  private def q130(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .groupingSets(
        Seq(Seq(col("lang"), col("source")), Seq(col("source")), Seq()),
        col("lang"), col("source"))
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"))
      .select(
        coalesce(col("lang"), lit("ALL")).as("lang"),
        coalesce(col("source"), lit("ALL")).as("source"),
        col("gid"), col("n_docs"), col("total_chars"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q130_grouping_sets" -> q130 _,
    "q79_ngram_novelty" -> q79 _,
    "q81_source_zscore" -> q81 _,
    "q83_quality_quartiles" -> q83 _,
    "q85_tfidf_terms" -> q85 _,
    "q89_rollup_subtotals" -> q89 _
  )

  val oracle: Map[String, String] = Map(
    // grouping_id bit order: Spark numbers grouped columns left-to-right
    // MSB-first over (lang, source) — DuckDB's GROUPING(lang, source)
    // uses the same convention, so the ids line up directly
    "q130_grouping_sets" ->
      ("SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source, " +
        "CAST(GROUPING(lang, source) AS BIGINT) AS gid, " +
        "COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars " +
        "FROM documents GROUP BY GROUPING SETS ((lang, source), (source), ())"),
    "q89_rollup_subtotals" ->
      ("SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source, " +
        "COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars, " +
        "MAX(n_chars) AS max_chars FROM documents " +
        "GROUP BY ROLLUP(lang, source) ORDER BY lang, source"),
    "q79_ngram_novelty" ->
      ("WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS l FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, unnest(list_transform(generate_series(1, len(l) - 2), " +
        "i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS s FROM t), " +
        "f AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s) " +
        "SELECT sh.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles, " +
        "CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel, " +
        "CAST(SUM(CASE WHEN f.first_doc = sh.doc_id THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) " +
        "AS novelty FROM sh JOIN f ON f.s = sh.s GROUP BY sh.doc_id"),
    "q81_source_zscore" ->
      // s1/s2 stay HUGEINT (DuckDB's native SUM type) so var_num is exact
      // for the full Long input range, mirroring the decimal(38,0) Spark side
      ("WITH st AS (SELECT source, COUNT(*) AS n, " +
        "SUM(n_chars) AS s1, " +
        "SUM(n_chars * n_chars) AS s2 FROM documents GROUP BY source), " +
        "sv AS (SELECT source, n, s1, s2, n * s2 - s1 * s1 AS var_num FROM st) " +
        "SELECT d.doc_id, d.source, d.n_chars, " +
        "CASE WHEN sv.var_num > 0 THEN CAST(FLOOR(" +
        "(d.n_chars - CAST(s1 AS DOUBLE) / n) / (sqrt(CAST(var_num AS DOUBLE)) / n) " +
        "* 1000000.0) AS BIGINT) ELSE 0 END AS z_e6, " +
        "CASE WHEN sv.var_num > 0 THEN " +
        "abs((d.n_chars - CAST(s1 AS DOUBLE) / n) / (sqrt(CAST(var_num AS DOUBLE)) / n)) > 2.0 " +
        "ELSE FALSE END AS is_outlier " +
        "FROM documents d JOIN sv ON sv.source = d.source"),
    "q83_quality_quartiles" ->
      ("WITH q AS (SELECT doc_id, " +
        "(LEAST(CAST(len(l) AS DOUBLE) / 20.0, 1.0) + " +
        "CAST(len(list_distinct(l)) AS DOUBLE) / len(l)) / 2.0 AS quality " +
        "FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS l FROM documents)), " +
        "r AS (SELECT doc_id, quality, " +
        "ROW_NUMBER() OVER (ORDER BY quality DESC, doc_id) AS rk, " +
        "COUNT(*) OVER () AS n FROM q) " +
        "SELECT CAST((rk - 1) * 4 // n + 1 AS INT) AS quartile, " +
        "COUNT(*) AS n_docs, " +
        "CAST(MIN(FLOOR(quality * 1000000.0)) AS BIGINT) AS min_q_e6, " +
        "CAST(MAX(FLOOR(quality * 1000000.0)) AS BIGINT) AS max_q_e6 " +
        "FROM r GROUP BY 1 ORDER BY quartile"),
    "q85_tfidf_terms" ->
      ("WITH tf AS (SELECT lang, unnest(string_split_regex(text, '\\s+')) AS token " +
        "FROM documents), " +
        "tfc AS (SELECT lang, token, COUNT(*) AS tf FROM tf GROUP BY lang, token), " +
        "dfc AS (SELECT token, COUNT(*) AS df FROM tfc GROUP BY token), " +
        "r AS (SELECT tfc.lang, tfc.token, tfc.tf, dfc.df, " +
        "ROW_NUMBER() OVER (PARTITION BY tfc.lang " +
        "ORDER BY CAST(tfc.tf AS DOUBLE) / dfc.df DESC, tfc.token) AS rk " +
        "FROM tfc JOIN dfc ON dfc.token = tfc.token) " +
        "SELECT lang, CAST(rk AS BIGINT) AS rk, token, CAST(tf AS BIGINT) AS tf, " +
        "CAST(df AS BIGINT) AS df, " +
        "CAST(FLOOR(CAST(tf AS DOUBLE) / df * 1000000.0) AS BIGINT) AS score_e6 " +
        "FROM r WHERE rk <= 5 ORDER BY lang, rk")
  )
}
