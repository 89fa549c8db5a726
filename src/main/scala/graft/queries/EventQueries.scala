package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Event-time analytics over the `events` stream table — the batch twins
  * of the streaming semantics (§2.10): tumbling-window aggregation and
  * gap-based sessionization.
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), surfaced as nanos-since-epoch
  * longs (`nanosAsLong`) — all window/gap math below is exact integer
  * arithmetic on nanos, so results are engine-exact by construction
  * (DuckDB side uses epoch_ns()).
  */
object EventQueries {

  private val HourNs = 3600L * 1000 * 1000 * 1000
  private val GapNs = 1800L * 1000 * 1000 * 1000 // 30-minute session gap

  // Tumbling 1-hour windows: per (hour, event_type) counts + exact sums.
  private def q56(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("hour_start_ns", (col("ts") - pmod(col("ts"), lit(HourNs))).cast("long"))
      .groupBy(col("hour_start_ns"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy(col("hour_start_ns"), col("event_type"))

  // Gap-based sessionization: a new session starts after >30 min idle;
  // per user: session count, events, busiest session size.
  private def q57(s: SparkSession, d: String): DataFrame = {
    // DuckDB reads TIMESTAMP(NANOS) parquet at microsecond precision —
    // truncate our nanos likewise so gap comparisons are engine-exact
    // even when a gap lands within 1µs of the threshold.
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = events(s, d)
      .withColumn("ts", (col("ts") - pmod(col("ts"), lit(1000L))).cast("long"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts") - col("prev_ts") > GapNs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessions
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_event_windows" -> q56 _,
    "q57_sessionization" -> q57 _
  )

  val oracle: Map[String, String] = Map(
    "q56_event_windows" ->
      ("SELECT hour_start_ns, event_type, COUNT(*) AS n, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value FROM " +
        "(SELECT epoch_ns(ts) - epoch_ns(ts) % 3600000000000 AS hour_start_ns, " +
        "event_type, value FROM events) " +
        "GROUP BY 1, 2 ORDER BY hour_start_ns, event_type"),
    "q57_sessionization" ->
      ("WITH t AS (SELECT user_id, event_id, epoch_ns(ts) AS tns FROM events), " +
        "flagged AS (SELECT user_id, tns, event_id, " +
        "CASE WHEN lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) IS NULL " +
        "OR tns - lag(tns) OVER (PARTITION BY user_id ORDER BY tns, event_id) > 1800000000000 " +
        "THEN 1 ELSE 0 END AS new_session FROM t), " +
        "sess AS (SELECT user_id, SUM(new_session) OVER " +
        "(PARTITION BY user_id ORDER BY tns, event_id ROWS UNBOUNDED PRECEDING) AS session_id " +
        "FROM flagged), " +
        "per_session AS (SELECT user_id, session_id, COUNT(*) AS n_events " +
        "FROM sess GROUP BY 1, 2) " +
        "SELECT user_id, COUNT(*) AS n_sessions, CAST(SUM(n_events) AS BIGINT) AS n_events, " +
        "MAX(n_events) AS max_session_events FROM per_session " +
        "GROUP BY user_id ORDER BY user_id")
  )
}
