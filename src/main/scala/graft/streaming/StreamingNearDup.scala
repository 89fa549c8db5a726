package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming near-dup detection over an accumulating MinHash-LSH
  * signature warehouse — the ingest-time twin of q185's incremental
  * batch operator (and therefore, transitively, of the oracle-green
  * q38 full rebuild): documents arrive as a stream; each micro-batch
  * probes the band warehouse accumulated from every earlier batch via
  * [[Dedup.minHashLshIncremental]] (batch↔warehouse AND batch↔batch
  * pairs), appends the emitted pairs to the pair log, then appends its
  * own band rows + docs to the warehouse. A pair is emitted exactly
  * once — in the micro-batch where its LATER member arrives — so when
  * the stream drains, the pair log equals the from-scratch batch pair
  * list over everything that streamed (pinned by
  * StreamingNearDupSpec's chunked replay, the T1/SCD2 precedent).
  *
  * Contracts: one full document per stream row, ids unique across the
  * stream (the StreamingContamination convention). The `maxBucket`
  * degenerate-bucket bound is evaluated against the rows seen SO FAR —
  * prefix-monotone, so the stream can only be MORE permissive than the
  * final batch bound on buckets that end overfull; at the default
  * (1000 per (band, bhash)) no realistic corpus prefix triggers it,
  * and the replay spec's fixture never does. At 100 TB the band
  * warehouse is the bucketed-by-(band, bhash) table of the batch
  * operator; the stream side only ever shuffles its own micro-batch.
  */
object StreamingNearDup {

  /** foreachBatch sink: probe-then-append against the warehouse under
    * `warehouseDir` (layout: bands/, docs/, pairs/ — all parquet,
    * append-only). */
  def lshPairsSink(warehouseDir: String, idCol: String, textCol: String,
                   numPerms: Int = 32, numBands: Int = 8, shingleN: Int = 3,
                   threshold: Double = 0.5, maxBucket: Int = 1000)
                  (batchDf: DataFrame, batchId: Long): Unit = {
    val spark = batchDf.sparkSession
    // probed by the pair search AND appended after — pin once
    val batch = batchDf.select(col(idCol), col(textCol)).localCheckpoint(true)
    val bandsPath = s"$warehouseDir/bands"
    val docsPath = s"$warehouseDir/docs"
    def readOr(p: String, empty: => DataFrame): DataFrame =
      if (WarehouseFs.exists(spark, p)) spark.read.parquet(p) else empty
    val whBands = readOr(bandsPath,
      Dedup.lshBandWarehouse(batch.limit(0), idCol, textCol,
        numPerms, numBands, shingleN))
    val whDocs = readOr(docsPath, batch.limit(0))
    Dedup.minHashLshIncremental(whBands, whDocs, batch, idCol, textCol,
        numPerms, numBands, shingleN, threshold, maxBucket)
      .write.mode("append").parquet(s"$warehouseDir/pairs")
    Dedup.lshBandWarehouse(batch, idCol, textCol, numPerms, numBands, shingleN)
      .write.mode("append").parquet(bandsPath)
    batch.write.mode("append").parquet(docsPath)
  }

  /** Wire a document stream into the sink. Read results from
    * `<warehouseDir>/pairs`. */
  def run(docs: DataFrame, idCol: String, textCol: String,
          warehouseDir: String, checkpointDir: String,
          numPerms: Int = 32, numBands: Int = 8, shingleN: Int = 3,
          threshold: Double = 0.5, maxBucket: Int = 1000): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(lshPairsSink(warehouseDir, idCol, textCol,
        numPerms, numBands, shingleN, threshold, maxBucket) _)
      .start()
}
