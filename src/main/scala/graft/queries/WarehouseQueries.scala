package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.operators.{AggState, Scd2}

/** Warehouse-maintenance queries: the operations a long-lived 100 TB
  * store runs BETWEEN queries — versioned dimension history (SCD2) and
  * incremental rollup maintenance (mergeable aggregate state). Both are
  * oracle-checked the strong way: DuckDB re-derives the same answer from
  * first principles over the raw tables, while Spark runs the actual
  * maintenance machinery.
  */
object WarehouseQueries {

  // SCD2 history over the events change log: per user, the versioned
  // event_type timeline (a new version only when the type actually
  // changes), with half-open [valid_from, valid_to) nanos validity and
  // a current-row flag. One exchange for both windows (Scd2Spec).
  private def q122(s: SparkSession, d: String): DataFrame = {
    val log = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    Scd2.fromChangeLog(log, Seq("user_id"), "ts", "event_id", Seq("event_type"))
    // (user_id, version) is a key — transform-shaped output, no sort:
    // the harness canonical-sorts, a trailing orderBy would re-run the
    // whole window pipeline in the range-sampling pass (q114 lesson).
  }

  // Incremental rollup maintenance: history state (orders strictly
  // before the cut) ⊕ batch state (the rest) must equal the rollup a
  // full re-scan derives — which is exactly what the DuckDB twin
  // computes. The merge shuffle moves 2×|groups| state rows, never the
  // fact table; that asymmetry IS the operator (AggState scaladoc).
  private def q124(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val keys = Seq("o_orderpriority", "o_orderstatus")
    val cut = to_date(lit("1995-06-01"))
    // to_date works on DATE / NTZ / LTZ alike — the split only needs to
    // partition rows exactly once (the oracle re-derives from ALL rows)
    val hist = AggState.build(
      o.filter(to_date(col("o_orderdate")) < cut), keys, "o_totalprice")
    val batch = AggState.build(
      o.filter(to_date(col("o_orderdate")) >= cut), keys, "o_totalprice")
    AggState.merge(keys, Seq(hist, batch))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q122_scd2_history" -> q122 _,
    "q124_agg_state_merge" -> q124 _)

  val oracle: Map[String, String] = Map(
    "q122_scd2_history" ->
      ("WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_id, event_type " +
        "FROM events), " +
        "o AS (SELECT user_id, t, event_id, event_type, " +
        "lag(event_type) OVER w AS prev, row_number() OVER w AS rn FROM e " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), " +
        "c AS (SELECT * FROM o WHERE rn = 1 OR prev IS DISTINCT FROM event_type), " +
        "v AS (SELECT user_id, event_type, " +
        "CAST(row_number() OVER w2 AS BIGINT) AS version, " +
        "t AS valid_from, lead(t) OVER w2 AS valid_to FROM c " +
        "WINDOW w2 AS (PARTITION BY user_id ORDER BY t, event_id)) " +
        "SELECT user_id, event_type, version, valid_from, valid_to, " +
        "valid_to IS NULL AS is_current FROM v"),
    "q124_agg_state_merge" ->
      ("SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS sum_cents, " +
        "MIN(o_totalprice) AS min_v, MAX(o_totalprice) AS max_v " +
        "FROM orders GROUP BY o_orderpriority, o_orderstatus"))
}
