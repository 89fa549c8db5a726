package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 as a maintained index — the IR-warehouse form of q117's
  * scoring (Robertson & Zaragoza 2009; Okapi k1 = 1.2, b = 0.75, the
  * Lucene-default shape). The insight that makes BM25 incrementally
  * maintainable is that its ENTIRE model is two exactly-mergeable
  * relations:
  *
  *  - [[docStats]]: one row per doc of (id, dl, tf_term…) — 5 longs at
  *    3 query terms, merged by plain union (per-doc properties);
  *  - [[corpusAgg]]: ONE row of (n_docs, total_tokens, df_term…) — all
  *    sums, merged by adding columns ([[mergeAgg]]).
  *
  * A daily batch therefore tokenizes ONLY itself (the two text kernels
  * run over batch rows alone), adds its 1-row aggregate delta, and
  * rescoring is pure arithmetic over the persisted stat rows — the
  * corpus text is never touched again. Rescoring must touch every
  * stat row because BM25 is GLOBAL: a batch shifts n_docs/avgdl/df, so
  * every document's score moves (the classic reason search engines
  * refresh idf lazily); the point of the state is that this touch is
  * ~16 bytes/doc of integers, not the corpus.
  *
  * Exactness contract: [[scoreFromState]] reproduces q117's expression
  * tree double-for-double (same literals, same association), so the
  * incremental composition is gated by the q117 oracle VERBATIM — the
  * q181 convention: incremental ≡ from-scratch, hash-identical.
  */
object Bm25Index {

  /** Per-document index rows — the persisted per-doc state:
    * (idCol, dl, tf_<term>…). One pass of the two row-local text
    * kernels over `docs`; no shuffle. */
  def docStats(docs: DataFrame, idCol: String, textCol: String,
               terms: Seq[String]): DataFrame = {
    val vocabLit = array(terms.map(t => array(lit(t))): _*)
    docs
      .withColumn("__c",
        call_function("graft_keyword_counts", col(textCol), vocabLit))
      .withColumn("__m", call_function("graft_text_metrics", col(textCol)))
      .select(col(idCol) +:
        element_at(col("__m"), 1).cast("long").as("dl") +:
        terms.indices.map(i =>
          element_at(col("__c"), i + 1).cast("long").as(s"tf_${terms(i)}")): _*)
  }

  /** The 1-row additive corpus aggregate of a doc-stats relation:
    * (n_docs, total_tokens, df_<term>…). */
  def corpusAgg(stats: DataFrame, terms: Seq[String]): DataFrame =
    stats.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_tokens") +:
        terms.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)

  /** Merge two corpus aggregates by column addition — the additive
    * state contract (counts, token totals, and document frequencies
    * all add across disjoint corpora). */
  def mergeAgg(a: DataFrame, b: DataFrame, terms: Seq[String]): DataFrame =
    a.unionByName(b).agg(
      sum(col("n_docs")).as("n_docs"),
      sum(col("total_tokens")).as("total_tokens") +:
        terms.map(t => sum(col(s"df_$t")).as(s"df_$t")): _*)

  /** Score every indexed document from state alone: stat rows × the
    * broadcast 1-row aggregate. Output (idCol, dl, tf_<term>…,
    * bm25_e6) for docs matching ≥ 1 term — q117's schema, q117's
    * doubles. */
  def scoreFromState(stats: DataFrame, agg: DataFrame, idCol: String,
                     terms: Seq[String]): DataFrame = {
    val avgdl = col("total_tokens").cast("double") / col("n_docs").cast("double")
    def term(t: String): Column = {
      val tf = col(s"tf_$t").cast("double")
      val dfT = col(s"df_$t").cast("double")
      val idf = (col("n_docs").cast("double") - dfT + lit(0.5)) / (dfT + lit(0.5))
      (idf * (tf * lit(2.2))) /
        (tf + lit(1.2) * (lit(1.0) - lit(0.75) +
          lit(0.75) * (col("dl").cast("double") / avgdl)))
    }
    stats.crossJoin(broadcast(agg))
      .filter(terms.map(t => col(s"tf_$t") > 0).reduce(_ || _))
      .select(col(idCol) +: col("dl") +:
        terms.map(t => col(s"tf_$t")) :+
        floor(terms.map(term).reduce(_ + _) * lit(1000000.0))
          .cast("long").as("bm25_e6"): _*)
  }

  /** The incremental composition — the daily shape: persisted
    * warehouse stat rows + persisted warehouse aggregate + a NEW
    * batch. Only the batch runs the text kernels; its aggregate delta
    * adds onto the warehouse's; every indexed doc rescored from state.
    * Answers exactly what a from-scratch q117 over warehouse ∪ batch
    * answers (oracle-gated). */
  def scoreIncremental(warehouseStats: DataFrame, warehouseAgg: DataFrame,
                       batch: DataFrame, idCol: String, textCol: String,
                       terms: Seq[String]): DataFrame = {
    // two consumers (delta agg + scoring union) — pin so the batch's
    // text kernels run once (the q117 localCheckpoint rationale)
    val bStats = docStats(batch, idCol, textCol, terms).localCheckpoint(true)
    val merged = mergeAgg(warehouseAgg, corpusAgg(bStats, terms), terms)
    scoreFromState(warehouseStats.unionByName(bStats), merged, idCol, terms)
  }
}
