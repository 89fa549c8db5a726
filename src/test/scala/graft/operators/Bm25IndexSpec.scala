package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the BM25 index-state contract: the two relations merge
  * exactly, and the incremental composition answers what a
  * from-scratch score over the union answers. */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("spark", "query")
  private val wh = Seq(
    (1L, "spark spark query engine"),
    (2L, "nothing relevant here at all"),
    (3L, "query planner inside spark"),
    (4L, "spark")).toDF("doc_id", "text")
  private val batch = Seq(
    (7L, "query query query spark"),
    (8L, "unrelated batch document"),
    (9L, "spark streams")).toDF("doc_id", "text")

  test("corpusAgg merges additively: agg(a ∪ b) = mergeAgg(agg a, agg b)") {
    val sa = Bm25Index.docStats(wh, "doc_id", "text", terms)
    val sb = Bm25Index.docStats(batch, "doc_id", "text", terms)
    val direct = Bm25Index.corpusAgg(sa.unionByName(sb), terms)
      .collect().head.toSeq
    val merged = Bm25Index.mergeAgg(
        Bm25Index.corpusAgg(sa, terms), Bm25Index.corpusAgg(sb, terms), terms)
      .collect().head.toSeq
    assert(merged === direct)
  }

  test("scoreIncremental ≡ from-scratch scoreFromState over the union") {
    val union = wh.unionByName(batch)
    val fullStats = Bm25Index.docStats(union, "doc_id", "text", terms)
    val full = Bm25Index.scoreFromState(
        fullStats, Bm25Index.corpusAgg(fullStats, terms), "doc_id", terms)
      .collect().map(_.toSeq).toSet
    val whStats = Bm25Index.docStats(wh, "doc_id", "text", terms)
    val incr = Bm25Index.scoreIncremental(
        whStats, Bm25Index.corpusAgg(whStats, terms),
        batch, "doc_id", "text", terms)
      .collect().map(_.toSeq).toSet
    assert(incr === full)
    // global sensitivity really holds: warehouse doc 1's score under
    // the merged stats differs from its warehouse-only score (the
    // batch moved n_docs/avgdl/df — rescoring from state is REQUIRED,
    // not an implementation choice)
    val whOnly = Bm25Index.scoreFromState(
        whStats, Bm25Index.corpusAgg(whStats, terms), "doc_id", terms)
      .filter(col("doc_id") === 1L).select("bm25_e6").as[Long].head()
    val mergedScore = Bm25Index.scoreIncremental(
        whStats, Bm25Index.corpusAgg(whStats, terms),
        batch, "doc_id", "text", terms)
      .filter(col("doc_id") === 1L).select("bm25_e6").as[Long].head()
    assert(whOnly !== mergedScore)
  }

  test("non-matching docs are absent; tf/dl columns carry the state") {
    val stats = Bm25Index.docStats(wh, "doc_id", "text", terms)
    val scored = Bm25Index.scoreFromState(
      stats, Bm25Index.corpusAgg(stats, terms), "doc_id", terms)
    assert(!scored.select("doc_id").as[Long].collect().contains(2L))
    val row = stats.filter(col("doc_id") === 1L)
      .select("dl", "tf_spark", "tf_query").as[(Long, Long, Long)].head()
    assert(row === ((4L, 2L, 1L)))
  }
}
