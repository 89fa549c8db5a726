package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every query module's declared queries + DuckDB oracle SQL.
  * Each `queries` entry is one implemented operator from SURVEY.md §2;
  * entries without an `oracleSql` twin are non-SQL-expressible (typed
  * Dataset.map operators, LSH, etc.) and get the driver's rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_join_rollup")(spark, "/root/testdata/sf0.001")

  /** Every query self-registers graft's native functions on the caller's
    * session (idempotent) — the driver may hand us a session built without
    * `spark.sql.extensions=graft.plans.GraftExtensions`. */
  private def withGraftFunctions(
      fn: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (spark, dir) => {
      graft.plans.GraftExtensions.ensure(spark)
      fn(spark, dir)
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rawQueries.map { case (k, v) => k -> withGraftFunctions(v) }

  private def rawQueries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.ArrayJsonQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.SimQueries.queries ++
      graft.queries.DomainQueries.queries ++
      graft.queries.GeneratorQueries.queries ++
      graft.queries.MiscQueries.queries ++
      graft.queries.TrainingQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.CorpusQueries.queries ++
      graft.queries.ScalarOpsQueries.queries ++
      graft.queries.SinkQueries.queries ++
      graft.queries.ClusterQueries.queries ++
      graft.queries.WarehouseQueries.queries ++
      graft.queries.CapstoneQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracle ++
      graft.queries.ArrayJsonQueries.oracle ++
      graft.queries.TextQueries.oracle ++
      graft.queries.DedupQueries.oracle ++
      graft.queries.SimQueries.oracle ++
      graft.queries.DomainQueries.oracle ++
      graft.queries.GeneratorQueries.oracle ++
      graft.queries.MiscQueries.oracle ++
      graft.queries.TrainingQueries.oracle ++
      graft.queries.EventQueries.oracle ++
      graft.queries.CorpusQueries.oracle ++
      graft.queries.ScalarOpsQueries.oracle ++
      graft.queries.SinkQueries.oracle ++
      graft.queries.ClusterQueries.oracle ++
      graft.queries.WarehouseQueries.oracle ++
      graft.queries.CapstoneQueries.oracle
}
