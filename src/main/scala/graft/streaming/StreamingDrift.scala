package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.DriftMonitor

/** Streaming PSI drift gate over an accumulating histogram warehouse —
  * the ingest-time twin of q205's incremental batch operator (and
  * transitively of the oracle-green q203 full scan): values arrive as
  * a stream; each micro-batch's bin counts merge (by addition — the
  * q181 mergeable-state argument) onto the counts accumulated from
  * every earlier batch, and the PSI of the reference snapshot vs
  * everything-seen-so-far is re-gated and logged per batch.
  *
  * The per-batch gate artifact equals the batch operator run on
  * (reference bins, prefix ∪ batch bins) — pinned by
  * StreamingDriftSpec's chunked replay (the StreamingClassify
  * convention). A monitoring consumer reads the LATEST batch's psi
  * partition; the history of partitions is the drift trajectory.
  *
  * Replay-idempotent (the r11 StreamingClassify convention): every
  * write targets the batch's own `batch=<id>` partition dir with mode
  * overwrite, and state reads take `batch < batchId` — a foreachBatch
  * replay after restart replaces its earlier (possibly partial) output
  * instead of double-counting the additive histogram state.
  *
  * At 100 TB the state is the bin-cardinality histogram table; the
  * stream side only ever bins its own micro-batch.
  */
object StreamingDrift {

  /** foreachBatch sink against the warehouse under `warehouseDir`
    * (layout: ref_bins/ — written once via [[writeReference]];
    * cur_bins/ and psi/ — one `batch=<id>` partition per micro-batch).
    */
  def psiSink(warehouseDir: String, valueCol: String, binWidth: Long)
             (batchDf: DataFrame, batchId: Long): Unit = {
    val spark = batchDf.sparkSession
    val refPath = s"$warehouseDir/ref_bins"
    require(WarehouseFs.exists(spark, refPath),
      s"StreamingDrift needs the reference histogram at $refPath — " +
        "call writeReference(...) before starting the stream " +
        "(existence is resolved through the path's Hadoop FileSystem, " +
        "so hdfs:///s3a:// warehouses work)")
    val curPath = s"$warehouseDir/cur_bins"
    val batchBins = DriftMonitor
      .binCounts(batchDf, valueCol, binWidth).localCheckpoint(true)
    val prior =
      if (WarehouseFs.exists(spark, curPath))
        spark.read.parquet(curPath).where(col("batch") < batchId)
          .select(col("bin"), col("n"))
      else batchBins.limit(0)
    val refBins = spark.read.parquet(refPath).select(col("bin"), col("n"))
    DriftMonitor
      .psiFromBinCounts(refBins, DriftMonitor.mergeBinCounts(prior, batchBins))
      .write.mode("overwrite").parquet(s"$warehouseDir/psi/batch=$batchId")
    batchBins.write.mode("overwrite").parquet(s"$curPath/batch=$batchId")
  }

  /** Persist the reference snapshot's histogram once, before the
    * stream starts. */
  def writeReference(reference: DataFrame, valueCol: String, binWidth: Long,
                     warehouseDir: String): Unit =
    DriftMonitor.binCounts(reference, valueCol, binWidth)
      .write.mode("overwrite").parquet(s"$warehouseDir/ref_bins")

  /** Wire a value stream into the sink. Read the trajectory from
    * `<warehouseDir>/psi` (partitioned by batch). */
  def run(values: DataFrame, valueCol: String, binWidth: Long,
          warehouseDir: String, checkpointDir: String): StreamingQuery =
    values.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(psiSink(warehouseDir, valueCol, binWidth) _)
      .start()
}
