package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming decontamination — the ingest-time twin of q153's batch
  * 13-gram kill rule: documents arrive as a stream, the train-split
  * shingle set is a STATIC warehouse table, and every micro-batch is
  * checked with a stream-static inner join (Spark plans the static side
  * once; no state grows on it). The running per-document dirty count is
  * maintained by a streaming aggregate, so when the stream drains the
  * result equals the batch query exactly — pinned by
  * StreamingContaminationSpec against oracle-green q153 on the sf0.01
  * fixture (the T1/SCD2 replay precedent).
  *
  * Contract: a document's full text arrives in ONE stream row (the
  * shingle set is derived row-locally via array_distinct, so there is no
  * cross-batch distinct state; a doc_id split across batches would
  * double-count shared shingles). At 100 TB the static side is the
  * distinct-shingle warehouse table — bucketed or bloom-fronted exactly
  * as in the batch path (q113); the stream side only ever shuffles its
  * own micro-batch.
  */
object StreamingContamination {

  /** Per-document count of distinct n-gram shingles that appear in
    * `trainShingles` (one `shingle` column, pre-distinct). Streaming
    * aggregate — read the sink in Complete mode. */
  def dirtyCounts(evalDocs: DataFrame, textCol: Column, idCol: Column,
                  trainShingles: DataFrame, n: Int): DataFrame =
    evalDocs
      .select(idCol.as("doc_id"),
        explode(array_distinct(
          call_function("graft_shingles", textCol, lit(n)))).as("shingle"))
      .join(trainShingles, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dirty_13grams"))
}
