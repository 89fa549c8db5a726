package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table loaders for the driver testdata directories
  * (`/root/testdata/sf*` — see TESTDATA.md). All queries take the sf
  * directory as a parameter so the same code runs at any scale factor.
  *
  * Scale note: these are plain parquet scans — Catalyst pushes filters and
  * prunes columns into the scan (verify with `.explain("formatted")`:
  * `PushedFilters` / `ReadSchema`). At cluster scale the same loaders work
  * unchanged against a partitioned warehouse path.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events` with `ts` surfaced as nanos-since-epoch LONG, whatever the
    * file's physical flavor. The event family does exact integer window
    * arithmetic on nanos (see EventQueries), so the loader owns the
    * normalization:
    *
    *  - `LongType`: parquet TIMESTAMP(NANOS) read under
    *    `spark.sql.legacy.parquet.nanosAsLong` (the original driver data
    *    and `tools/gen_scaled_data.py` output) — already nanos.
    *  - `TimestampNTZType` (driver data regenerated as naive
    *    timestamp[us], Spark's default inference): rebuilt from wall-clock
    *    parts — `unix_date`/`hour`/`minute`/`date_part('SECOND')` are all
    *    tz-independent on NTZ, so the result equals DuckDB's
    *    `epoch_ns(ts)` (naive-as-UTC) under ANY session time zone. All
    *    codegen'd date/time intrinsics, no conf toggling.
    *  - `TimestampType`: raw parquet micros are epoch micros
    *    (no reader tz conversion for INT64 timestamps) — `unix_micros`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    graft.plans.GraftExtensions.ensure(s)
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType | TimestampType =>
        df.withColumn("ts", call_function("graft_ts_nanos", col("ts")))
      case other =>
        throw new IllegalStateException(s"unsupported events.ts type: $other")
    }
  }

  /** Epoch nanos of a TIMESTAMP_NTZ wall clock interpreted as UTC —
    * session-tz-independent by construction (every part function is
    * defined on the wall clock itself). Micro fraction comes from
    * `date_part('SECOND')`'s DECIMAL(8,6); the cast back to long is exact.
    * This is the declarative twin TablesSpec pins [[graft.plans.GraftTsNanos]]
    * against — the query path uses the kernel (one codegen'd multiply).
    */
  private[graft] def ntzEpochNanos(c: Column): Column =
    (unix_date(to_date(c)).cast(LongType) * lit(86400000000L) +
      hour(c).cast(LongType) * lit(3600000000L) +
      minute(c).cast(LongType) * lit(60000000L) +
      (date_part(lit("SECOND"), c) * lit(1000000)).cast(LongType)) * lit(1000L)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
