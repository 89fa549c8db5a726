package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic invariants for the funnel and cohort queries (q86/q87) —
  * ordering constraints and conservation the oracle hash cannot express
  * as properties. */
class EventAnalyticsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def run(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q86: funnel stages are ordered and stage labels match the times") {
    val out = run("q86_event_funnel").cache()
    // strict sequencing: click after view, purchase after click
    assert(out.filter(col("click_t").isNotNull &&
      col("click_t") <= col("view_t")).count() === 0)
    assert(out.filter(col("purchase_t").isNotNull &&
      col("purchase_t") <= col("click_t")).count() === 0)
    // a purchase_t without a click_t is impossible by construction
    assert(out.filter(col("purchase_t").isNotNull &&
      col("click_t").isNull).count() === 0)
    // stage label consistency
    assert(out.filter(col("stage") === "purchase" &&
      col("purchase_t").isNull).count() === 0)
    assert(out.filter(col("stage") === "view" &&
      col("click_t").isNotNull).count() === 0)
    // exactly the viewing users appear
    val viewers = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(out.count() === viewers)
    out.unpersist()
  }

  test("q87: offset-0 equals cohort size and later offsets never exceed it") {
    val out = run("q87_retention_cohorts").cache()
    assert(out.filter(col("day_offset") < 0).count() === 0)
    val day0 = out.filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users").as("cohort_size"))
    // every cohort has its day-0 row (first activity IS day 0)
    val cohorts = out.select(col("cohort_day")).distinct().count()
    assert(day0.count() === cohorts)
    val exceed = out.join(day0, Seq("cohort_day"))
      .filter(col("n_users") > col("cohort_size")).count()
    assert(exceed === 0L)
    // cohort sizes partition the user base
    val totalUsers = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id")).distinct().count()
    val sumCohorts = day0.agg(sum(col("cohort_size"))).head().getLong(0)
    assert(sumCohorts === totalUsers)
    out.unpersist()
  }
}
