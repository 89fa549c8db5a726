package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import graft.etl.Pipeline

/** T1 — incremental ingest as Structured Streaming (SURVEY §2.10).
  *
  * The reference's incremental-batch pattern (pipeline.py:148-244 +
  * tracker.py:128-163: "process only unseen keys, mark seen after load")
  * maps to a stream with per-batch anti-join dedup in `foreachBatch`, or —
  * for exactly-once cross-batch dedup without an external table — to
  * `flatMapGroupsWithState` keyed state.
  *
  * Scale: state is partitioned by key across executors (RocksDB-backed
  * state store in production configs); the anti-join variant broadcasts
  * only the seen-keys projection.
  */
object IncrementalIngest {

  /** foreachBatch sink: drop already-seen keys (against the current
    * warehouse state) and append the remainder as parquet. */
  def dedupedAppendSink(warehousePath: String, key: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val seen =
      try spark.read.parquet(warehousePath).select(col(key))
      catch { case _: Exception => spark.emptyDataFrame.withColumn(key, lit(null)) }
    val fresh = if (seen.columns.contains(key))
      Pipeline.incrementalFilter(batch, seen, key) else batch
    // within-batch dedup too: first row per key wins
    fresh.dropDuplicates(key)
      .write.mode("append").parquet(warehousePath)
  }

  /** Start the T1 stream: JSON landing zone → dedup → parquet warehouse. */
  def run(spark: SparkSession, landingPath: String, warehousePath: String,
          checkpoint: String, key: String,
          schema: org.apache.spark.sql.types.StructType): StreamingQuery =
    spark.readStream.schema(schema).json(landingPath)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch(dedupedAppendSink(warehousePath, key) _)
      .start()

  /** Keyed record for stateful streaming dedup. */
  final case class Keyed(key: String, payload: String)

  /** Cross-batch first-seen-wins dedup with keyed state
    * (flatMapGroupsWithState): a key's row is emitted only the first time
    * the key is ever seen across the stream's lifetime; later occurrences
    * are dropped. State per key is one boolean — bounded and partitioned. */
  def firstSeenOnly(ds: Dataset[Keyed]): Dataset[Keyed] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Boolean, Keyed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, values, state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); values.take(1) }
      }
  }

  /** T2/T3-flavored stream: per-window event counts with a watermark —
    * late data beyond the watermark is dropped, state is bounded. */
  def windowedEventCounts(events: DataFrame, tsCol: String,
                          watermark: String = "10 minutes",
                          window: String = "5 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(functions_window(col(tsCol), window), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  private def functions_window(c: org.apache.spark.sql.Column, w: String) =
    org.apache.spark.sql.functions.window(c, w)

  /** T4 — selective-refresh priority queue (batch query over state): rank
    * stale keys by a bounded additive priority and emit the top refresh
    * candidates (docs/Inventory Ingestion & Freshness Pipeline §178-208). */
  def refreshQueue(products: DataFrame, lastCheckedCol: String, asOf: String,
                   clickWeight: org.apache.spark.sql.Column,
                   limit: Int,
                   tieBreak: Seq[org.apache.spark.sql.Column] = Nil): DataFrame =
    products
      .withColumn("age_days",
        datediff(lit(asOf).cast("date"), col(lastCheckedCol)))
      .withColumn("priority",
        least(col("age_days").cast("double") / 30.0, lit(1.0)) * 0.6 +
          least(clickWeight, lit(1.0)) * 0.4)
      // tieBreak makes the cut at `limit` deterministic when priorities
      // collide (equal ages + equal weights are common in practice)
      .orderBy(col("priority").desc +: tieBreak: _*)
      .limit(limit)
}
