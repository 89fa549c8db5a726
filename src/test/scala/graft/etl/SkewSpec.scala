package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew handling at the two layers the engine relies on:
  *  - AQE's runtime skew-join split (the default path for skewed joins —
  *    verified here by forcing tiny skew thresholds and checking the
  *    final adaptive plan actually split the hot partition);
  *  - the explicit two-phase salting utilities (Pipeline.saltedCount /
  *    saltedArgmax) for aggregations, already spec-covered in
  *    PipelineSpec — results equality re-asserted here on a skewed key.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ

      // 100k rows on ONE key vs uniform keys — a classic hot partition
      val left = spark.range(100000).select(
        when($"id" < 95000, lit(7L)).otherwise($"id").as("k"),
        concat(lit("payload-payload-payload-"), $"id").as("v"))
      val right = spark.range(200).select($"id".as("k"), lit("dim").as("d"))
      val joined = left.join(right, "k")
      // only the hot key (7) has a right-side match; collecting finalizes
      // THIS dataframe's adaptive plan (count() would build its own)
      assert(joined.collect().length == 95000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the skewed join side:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("salted aggregation equals plain aggregation on a skewed key") {
    val df = spark.range(50000)
      .select(when($"id" < 49000, lit("hot")).otherwise(lit("cold")).as("key"))
    val plain = df.groupBy($"key").count().as[(String, Long)].collect().toMap
    val salted = Pipeline.saltedCount(df, "key", saltBuckets = 16)
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }
}
