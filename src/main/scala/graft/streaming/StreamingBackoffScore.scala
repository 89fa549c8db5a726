package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming order-n Stupid Backoff scoring — the ingest-time twin of
  * q161's batch scorer: documents arrive as a stream, the trained gram
  * count table and token total ([[graft.operators.NgramLm
  * .backoffTables]]) are STATIC warehouse relations, and every
  * micro-batch is scored by 2n-1 stream-static left joins plus one
  * streaming aggregate.
  *
  * Two deliberate differences from the batch plan, forced by streaming
  * semantics, neither able to change results:
  *
  *  - no distinct-gram factoring (a streaming frame cannot
  *    `distinct()`): every position row carries its own 2n-1 lookups.
  *    A micro-batch is small, so the batch path's factoring argument
  *    (positions >> distinct grams) does not apply anyway;
  *  - the lookups are per-column JOINS rather than the unpivot+pivot
  *    (chained streaming aggregates are not allowed; stream-static
  *    joins are stateless and unrestricted).
  *
  * What CANNOT drift: the scoring arithmetic — the twin evaluates
  * [[graft.operators.NgramLm.backoffLadder]] VERBATIM over identically
  * named columns, and the key expressions are the shared
  * `NgramLm.keyExprs` (the q155/StreamingLmScore precedent).
  * StreamingBackoffScoreSpec pins the twin to the oracle-green batch
  * query by live MemoryStream replay.
  *
  * Contract: a document's full text arrives in ONE stream row (grams
  * derive row-locally; a doc split across batches scores its halves
  * separately — the StreamingContamination contract). At 100 TB the
  * count table is a bucketed warehouse table re-read per micro-batch
  * by stream-static planning; only the micro-batch itself shuffles.
  */
object StreamingBackoffScore {

  /** Per-document (doc_id, n_ngrams, n_oov, sum_s_e9, score_e9) under
    * the static (grams, nTok) model of order n. Streaming aggregate —
    * read the sink in Complete mode (or Update for incremental sinks). */
  def scores(docs: DataFrame, idCol: Column, textCol: Column,
             grams: DataFrame, nTok: Long, n: Int): DataFrame = {
    import graft.operators.NgramLm
    val pos = docs
      .select(idCol.as("doc_id"),
        explode(call_function("graft_shingles", textCol, lit(n))).as("g"))
      .withColumn("t", split(col("g"), " "))
    val keys = NgramLm.keyExprs(n)
    val keyed = keys.foldLeft(pos) { case (df, (role, k)) =>
      df.withColumn(s"__k_$role", k)
    }
    val joined = keys.foldLeft(keyed) { case (df, (role, _)) =>
      val cName = (if (role.startsWith("n")) "cn" else "cd") + role.drop(1)
      df.join(
        grams.select(col("k").as(s"__k_$role"), col("c").as(s"__c_$role")),
        Seq(s"__k_$role"), "left")
        .withColumn(cName, coalesce(col(s"__c_$role"), lit(0L)))
    }
    joined
      .withColumn("n_tok", lit(nTok))
      .withColumn("s_e9", NgramLm.backoffLadder(n))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(col(s"cn$n") === 0, 1L).otherwise(0L)).as("n_oov"),
        sum(col("s_e9")).as("sum_s_e9"))
      .withColumn("score_e9", expr("sum_s_e9 div n_ngrams"))
  }
}
