package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextAnalysis
import graft.operators.Dedup

/** Deduplication query set over `documents`: exact-hash dedup (oracle),
  * keep-first dedup (oracle), pairwise n-gram Jaccard (oracle), and the
  * non-SQL-expressible MinHash-LSH / SimHash operators (rows-only check;
  * ScalaTest covers their semantics on constructed near-dup fixtures).
  */
object DedupQueries {

  // Exact-dup stats: corpus size vs distinct normalized texts.
  private def q35(s: SparkSession, d: String): DataFrame =
    documents(s, d).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(Dedup.normalized(col("text"))).as("n_distinct"),
      (count(lit(1)) - countDistinct(Dedup.normalized(col("text")))).as("n_dup_rows"))

  // Keep-first exact dedup — the surviving rows (S5-style row_number
  // semantics over a content hash).
  private def q36(s: SparkSession, d: String): DataFrame =
    Dedup.exactDedup(documents(s, d), "text", "doc_id")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  // n-gram Jaccard between consecutive docs (deterministic pair choice;
  // the pairwise-similarity kernel LSH verification uses).
  private def q37(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"),
        array_distinct(TextAnalysis.tokens(col("text"))).as("toks"))
    docs.as("a")
      .join(docs.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.toks"), col("b.toks"))).as("n_common"),
        size(array_union(col("a.toks"), col("b.toks"))).as("n_union"),
        Dedup.jaccard(col("a.toks"), col("b.toks")).as("jaccard"))
      .orderBy(col("doc_a"))
  }

  // MinHash-LSH near-dup candidates (rows-only: banded xxhash64 signatures
  // have no DuckDB equivalent). Deterministic output.
  private def q38(s: SparkSession, d: String): DataFrame =
    Dedup.minHashLsh(documents(s, d), "doc_id", "text",
      numPerms = 32, numBands = 8, shingleN = 3, threshold = 0.3)
      .select(col("id_a"), col("id_b"), col("n_common"), col("n_union"),
        floor(col("jaccard") * 1e6).cast("long").as("jaccard_e6"))
      .orderBy(col("id_a"), col("id_b"))

  // SimHash signatures (rows-only): 64-bit near-dup fingerprints.
  private def q39(s: SparkSession, d: String): DataFrame =
    Dedup.simHashTable(documents(s, d), "doc_id", "text")
      .select(col("id").as("doc_id"), col("simhash"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q35_exact_dedup_stats" -> q35 _,
    "q36_dedup_keep_first" -> q36 _,
    "q37_jaccard_pairs" -> q37 _,
    "q38_minhash_lsh" -> q38 _,
    "q39_simhash" -> q39 _
  )

  val oracle: Map[String, String] = Map(
    "q35_exact_dedup_stats" ->
      ("SELECT COUNT(*) AS n_docs, " +
        "COUNT(DISTINCT lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS n_distinct, " +
        "COUNT(*) - COUNT(DISTINCT lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS n_dup_rows " +
        "FROM documents"),
    "q36_dedup_keep_first" ->
      ("SELECT doc_id, lang, source FROM " +
        "(SELECT doc_id, lang, source, ROW_NUMBER() OVER " +
        "(PARTITION BY lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) " +
        "ORDER BY doc_id) AS rn FROM documents) WHERE rn = 1 ORDER BY doc_id"),
    "q37_jaccard_pairs" ->
      ("SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "CAST(len(list_filter(list_distinct(a.l), x -> list_contains(b.l, x))) AS INT) AS n_common, " +
        "CAST(len(list_distinct(a.l)) + len(list_distinct(b.l)) - " +
        "len(list_filter(list_distinct(a.l), x -> list_contains(b.l, x))) AS INT) AS n_union, " +
        "CAST(len(list_filter(list_distinct(a.l), x -> list_contains(b.l, x))) AS DOUBLE) / " +
        "(len(list_distinct(a.l)) + len(list_distinct(b.l)) - " +
        "len(list_filter(list_distinct(a.l), x -> list_contains(b.l, x)))) AS jaccard " +
        "FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS l FROM documents) a " +
        "JOIN (SELECT doc_id, string_split_regex(text, '\\s+') AS l FROM documents) b " +
        "ON b.doc_id = a.doc_id + 1 ORDER BY doc_a")
  )
}
