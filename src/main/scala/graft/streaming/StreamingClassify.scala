package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.NaiveBayes

/** Streaming Naive Bayes classification over an accumulating model
  * warehouse — the ingest-time twin of q195's incremental batch
  * operator (and therefore, transitively, of the oracle-green q193
  * full train): documents arrive as a stream; each micro-batch is
  * classified by [[NaiveBayes.classifyIncremental]] against the count
  * state accumulated from every earlier batch MERGED with its own
  * (priors, smoothing denominators and |V| all move with the merge —
  * exactly the q195 semantics), appends its decisions to the decision
  * log, then appends its own (label, word, c) and (label, d) state
  * rows to the warehouse.
  *
  * A document is classified exactly once — in its arrival micro-batch,
  * against the model of everything seen UP TO AND INCLUDING that batch
  * — so each chunk's decisions equal the batch operator run on (prefix
  * warehouse, chunk), pinned by StreamingClassifySpec's chunked replay
  * (the StreamingNearDup convention). The state appends are
  * UNAGGREGATED parquet rows: [[NaiveBayes.classifyIncremental]]'s
  * merge group-bys anyway, so duplicate (label, word) rows across
  * appends are exact by construction (counts add).
  *
  * Contracts: one full document per stream row (the
  * StreamingContamination convention). At 100 TB the state is the
  * vocabulary-bounded count table of the batch operator; the stream
  * side only ever tokenizes its own micro-batch.
  */
object StreamingClassify {

  /** foreachBatch sink: classify-then-append against the warehouse
    * under `warehouseDir` (layout: word_counts/, doc_counts/,
    * decisions/ — all parquet, one `batch=<id>` partition dir per
    * micro-batch).
    *
    * Replay-idempotent (r11, ADVICE): every write targets the batch's
    * OWN partition dir with mode overwrite, so a foreachBatch replay
    * after stream restart REPLACES its earlier (possibly partial)
    * output instead of appending a duplicate — the additive NB state
    * never double-counts, and decisions stay exactly-once. Warehouse
    * reads take `batch < batchId` (partition-pruned), which is both
    * the prefix-model semantics AND what makes the replayed batch
    * blind to its own earlier partial state rows. */
  def nbSink(warehouseDir: String, idCol: String, labelCol: String,
             textCol: String)
            (batchDf: DataFrame, batchId: Long): Unit = {
    val spark = batchDf.sparkSession
    // classified AND mined for state — pin once
    val batch = batchDf.select(col(idCol), col(labelCol), col(textCol))
      .localCheckpoint(true)
    val wcPath = s"$warehouseDir/word_counts"
    val dcPath = s"$warehouseDir/doc_counts"
    def readPrefix(p: String, cols: Seq[String],
                   empty: => DataFrame): DataFrame =
      if (WarehouseFs.exists(spark, p))
        spark.read.parquet(p).where(col("batch") < batchId)
          .select(cols.map(col): _*)
      else empty
    val whWc = readPrefix(wcPath, Seq("src", "w", "c"),
      NaiveBayes.wordCounts(batch.limit(0), labelCol, textCol))
    val whDc = readPrefix(dcPath, Seq("src", "d"),
      NaiveBayes.docCounts(batch.limit(0), labelCol))
    NaiveBayes
      .classifyIncremental(whWc, whDc, batch, idCol, labelCol, textCol)
      .write.mode("overwrite")
      .parquet(s"$warehouseDir/decisions/batch=$batchId")
    NaiveBayes.wordCounts(batch, labelCol, textCol)
      .write.mode("overwrite").parquet(s"$wcPath/batch=$batchId")
    NaiveBayes.docCounts(batch, labelCol)
      .write.mode("overwrite").parquet(s"$dcPath/batch=$batchId")
  }

  /** Wire a document stream into the sink. Read results from
    * `<warehouseDir>/decisions`. */
  def run(docs: DataFrame, idCol: String, labelCol: String, textCol: String,
          warehouseDir: String, checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(nbSink(warehouseDir, idCol, labelCol, textCol) _)
      .start()
}
