package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming LM quality scoring — the ingest-time twin of q155's batch
  * smoothed-bigram scorer: documents arrive as a stream, the trained
  * count tables ([[graft.operators.NgramLm.modelTables]]) are STATIC
  * warehouse relations, and every micro-batch is scored by the same
  * stream-static left joins + streaming aggregate. The scoring tail is
  * the SAME code path as the batch query (`NgramLm.scoreExploded`), so
  * the twin cannot drift from the oracle-green batch semantics —
  * pinned live by StreamingLmScoreSpec (MemoryStream replay, the
  * q153/T1/SCD2 precedent).
  *
  * Contract: a document's full text arrives in ONE stream row (bigrams
  * are derived row-locally; a doc split across batches would score its
  * halves separately — same contract as StreamingContamination). At
  * 100 TB the count tables are bucketed warehouse tables re-read per
  * micro-batch by Spark's stream-static planning; only the micro-batch
  * itself ever shuffles.
  */
object StreamingLmScore {

  /** Per-document (n_bigrams, n_oov, sum_p_e9, score_e9) under the
    * given static model tables. Streaming aggregate — read the sink in
    * Complete mode (or Update for incremental sinks). */
  def scores(docs: DataFrame, idCol: Column, textCol: Column,
             bi: DataFrame, uni: DataFrame, vocabSize: Long): DataFrame =
    graft.operators.NgramLm.scoreExploded(
      docs.select(idCol.as("doc_id"),
          explode(call_function("graft_shingles", textCol, lit(2))).as("bg"))
        .withColumn("w1", split(col("bg"), " ").getItem(0)),
      "doc_id", bi, uni, lit(vocabSize))
}
