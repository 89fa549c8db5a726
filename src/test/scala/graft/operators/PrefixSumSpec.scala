package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def randRows(seed: Int, n: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (1L to n.toLong).map(id => (id, rnd.nextInt(100).toLong))
  }

  test("running total equals the single-partition window twin") {
    val rows = randRows(7, 5000)
    val df = rows.toDF("id", "w").repartition(8) // scrambled input placement
    val (got, total) = PrefixSum.withRunningTotal(df, "w", "cum", col("id"))
    val want = rows.toDF("id", "w")
      .withColumn("cum", sum(col("w")).over(
        Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.select("id", "w", "cum").as[(Long, Long, Long)].collect().sorted
      === want.select("id", "w", "cum").as[(Long, Long, Long)].collect().sorted)
    assert(total === rows.map(_._2).sum)
  }

  test("no Window and no single-partition exchange in the plan") {
    val df = randRows(3, 100).toDF("id", "w")
    val (got, _) = PrefixSum.withRunningTotal(df, "w", "cum", col("id"))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window operator leaked in:\n$plan")
    assert(!plan.contains("SinglePartition"), s"single partition in:\n$plan")
  }

  test("budgetFill keeps the greedy prefix and cuts the first over-budget row") {
    val df = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L)).toDF("id", "w")
    // budget 25: rows 1, 2 fit (cum 10, 20); row 3 (cum 30) is cut
    val got = PrefixSum.budgetFill(df, "w", 25L, col("id"))
      .select("id").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 2L))
    // exact-boundary budget keeps the boundary row
    val exact = PrefixSum.budgetFill(df, "w", 30L, col("id"))
      .select("id").as[Long].collect().sorted
    assert(exact.toSeq === Seq(1L, 2L, 3L))
  }

  test("systematicPps matches the sequential reference and sums to k") {
    val rows = randRows(11, 800).map { case (id, w) => (id, w + 1) } // all positive
    val df = rows.toDF("id", "w").repartition(6)
    val k = 50
    val got = PrefixSum.systematicPps(df, "w", k, "cum", col("id"))
      .select("id", "n_picks").as[(Long, Long)].collect().toMap
    // sequential reference: thresholds j*W/k, j = 1..k (the integer form:
    // row picked floor(cum*k/W) - floor(prev*k/W) times)
    val W = rows.map(_._2).sum
    var prev = 0L
    val want = rows.sortBy(_._1).flatMap { case (id, w) =>
      val cum = prev + w
      val n = cum * k / W - prev * k / W
      prev = cum
      if (n >= 1) Some(id -> n) else None
    }.toMap
    assert(got === want)
    assert(got.values.sum === k.toLong, "expected-size contract: picks sum to k")
  }

  test("zero-weight rows are never picked; heavy rows draw with multiplicity") {
    val df = Seq((1L, 0L), (2L, 90L), (3L, 0L), (4L, 10L)).toDF("id", "w")
    val got = PrefixSum.systematicPps(df, "w", 10, "cum", col("id"))
      .select("id", "n_picks").as[(Long, Long)].collect().toMap
    assert(!got.contains(1L) && !got.contains(3L))
    assert(got(2L) === 9L, "weight 90/100 at k=10 -> 9 picks")
    assert(got(4L) === 1L)
  }

  test("result is invariant under input partitioning") {
    val rows = randRows(23, 1000)
    val a = PrefixSum.systematicPps(rows.toDF("id", "w").repartition(13), "w", 37, "cum", col("id"))
      .select("id", "n_picks").as[(Long, Long)].collect().sorted.toSeq
    val b = PrefixSum.systematicPps(rows.toDF("id", "w").coalesce(1), "w", 37, "cum", col("id"))
      .select("id", "n_picks").as[(Long, Long)].collect().sorted.toSeq
    assert(a === b)
  }

  test("null weights fail loud") {
    val df = Seq((1L, Some(5L)), (2L, None)).toDF("id", "w")
    val e = intercept[Exception] {
      PrefixSum.withRunningTotal(df, "w", "cum", col("id"))._1.collect()
    }
    assert(e.getMessage != null)
  }
}
