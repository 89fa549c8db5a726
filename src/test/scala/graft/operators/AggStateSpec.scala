package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class AggStateSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("g")

  private def facts(seed: Int, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(_ => (s"g${rnd.nextInt(5)}",
      math.round(rnd.nextDouble() * 10000) / 100.0)).toDF("g", "v")
  }

  private def canon(df: DataFrame): Seq[(String, Long, Long, Double, Double)] =
    df.select(col("g"), col("n"), col("sum_cents"), col("min_v"), col("max_v"))
      .as[(String, Long, Long, Double, Double)].collect.toSeq.sortBy(_._1)

  test("merge of a random 3-way split equals the full rebuild") {
    val all = facts(7, 3000).cache()
    val parts = all.randomSplit(Array(0.2, 0.5, 0.3), seed = 11)
    val merged = AggState.merge(keys, parts.toSeq.map(p => AggState.build(p, keys, "v")))
    assert(canon(merged) === canon(AggState.build(all, keys, "v")))
    all.unpersist()
  }

  test("merge is associative: (a+b)+c == a+(b+c)") {
    val a = AggState.build(facts(1, 500), keys, "v")
    val b = AggState.build(facts(2, 700), keys, "v")
    val c = AggState.build(facts(3, 300), keys, "v")
    val left = AggState.merge(keys, Seq(AggState.merge(keys, Seq(a, b)), c))
    val right = AggState.merge(keys, Seq(a, AggState.merge(keys, Seq(b, c))))
    assert(canon(left) === canon(right))
  }

  test("groups absent from one side pass through (union semantics)") {
    val a = AggState.build(Seq(("only_a", 1.0)).toDF("g", "v"), keys, "v")
    val b = AggState.build(Seq(("only_b", 2.0), ("only_b", 4.0)).toDF("g", "v"), keys, "v")
    val m = canon(AggState.merge(keys, Seq(a, b)))
    assert(m === Seq(("only_a", 1L, 100L, 1.0, 1.0), ("only_b", 2L, 600L, 2.0, 4.0)))
  }

  test("state build is one map-side-combined shuffle (partial aggregate)") {
    val plan = AggState.build(facts(9, 100), keys, "v")
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1)
    assert(plan.contains("partial_"), s"no partial aggregate in:\n$plan")
  }

  // ---- freq state: exact mergeable quantiles ----

  private def freqCanon(df: DataFrame): Seq[(String, Long, Long)] =
    df.select(col("g"), col("v_cents"), col("n"))
      .as[(String, Long, Long)].collect.toSeq.sorted

  test("freq merge of a random 3-way split equals the full rebuild") {
    val all = facts(13, 3000).cache()
    val parts = all.randomSplit(Array(0.25, 0.4, 0.35), seed = 17)
    val merged = AggState.mergeFreq(keys,
      parts.toSeq.map(p => AggState.buildFreq(p, keys, "v")))
    assert(freqCanon(merged) === freqCanon(AggState.buildFreq(all, keys, "v")))
    all.unpersist()
  }

  test("quantiles from merged freq state match a reference sort at several q") {
    val all = facts(21, 2000).cache()
    val parts = all.randomSplit(Array(0.5, 0.5), seed = 3)
    val merged = AggState.mergeFreq(keys,
      parts.toSeq.map(p => AggState.buildFreq(p, keys, "v")))
    val data = all.as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(v => math.round(v._2 * 100)).sorted).toMap
    for ((qn, qd) <- Seq((1, 4), (1, 2), (3, 4), (9, 10), (1, 1))) {
      val got = AggState.quantileFromFreq(merged, keys, qn, qd)
        .select(col("g"), col("n"), col("q_cents"))
        .as[(String, Long, Long)].collect().toSeq.sorted
      val want = data.toSeq.map { case (g, vs) =>
        // lower/disc quantile: element at rank ceil(n*q) (1-based)
        val rank = (vs.length.toLong * qn + qd - 1) / qd
        (g, vs.length.toLong, vs(math.max(rank, 1L).toInt - 1))
      }.sorted
      assert(got === want, s"q=$qn/$qd")
    }
    all.unpersist()
  }

  test("medianMadOutliers equals the two-walk window derivation exactly") {
    val all = facts(29, 2500).cache()
    val st = AggState.buildFreq(all, keys, "v")
    val got = AggState.medianMadOutliers(st, keys)
      .select(col("g"), col("n"), col("median_cents"), col("mad_cents"),
        col("n_outliers"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
    // reference: driver-side sort per group, same lower-median rule
    val data = all.as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(v => math.round(v._2 * 100)).sorted).toMap
    def lowerMedian(vs: Seq[Long]): Long = {
      val rank = (vs.length.toLong + 1) / 2 // ceil(n/2), 1-based
      vs(rank.toInt - 1)
    }
    val want = data.toSeq.map { case (g, vs) =>
      val med = lowerMedian(vs.toSeq)
      val devs = vs.map(v => math.abs(v - med)).sorted.toSeq
      val mad = lowerMedian(devs)
      (g, vs.length.toLong, med, mad, devs.count(_ > 3 * mad).toLong)
    }.sorted
    assert(got === want)
    all.unpersist()
  }

  test("medianMadOutliers edge cases: singleton, all-equal, even split") {
    val df = Seq(
      ("one", 5.0), // singleton group: med=500, MAD=0, outliers=0
      ("eq", 2.0), ("eq", 2.0), ("eq", 2.0), // all equal: MAD=0, outliers=0
      ("even", 1.0), ("even", 2.0), ("even", 3.0), ("even", 4.0)
      // even n: lower median = 200; devs sorted = 100,100,100,200 ->
      // MAD = lower median of devs = 100; outliers: dev > 300 -> none
    ).toDF("g", "v")
    val got = AggState
      .medianMadOutliers(AggState.buildFreq(df, keys, "v"), keys)
      .select(col("g"), col("n"), col("median_cents"), col("mad_cents"),
        col("n_outliers"))
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got === Seq(
      ("eq", 3L, 200L, 0L, 0L),
      ("even", 4L, 200L, 100L, 0L),
      ("one", 1L, 500L, 0L, 0L)))
  }

  test("medianMadOutliers flags a far outlier through the 3-MAD gate") {
    // 5 values at 100, one at 10000: med=100, devs={0 x5, 9900},
    // MAD=0 -> gate is dev > 0 -> exactly the far point flags
    val df = (Seq.fill(5)(("g", 1.0)) :+ (("g", 100.0))).toDF("g", "v")
    val got = AggState
      .medianMadOutliers(AggState.buildFreq(df, keys, "v"), keys)
      .select(col("n"), col("median_cents"), col("mad_cents"), col("n_outliers"))
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((6L, 100L, 0L, 1L)))
  }

  test("medianMadOutliers packs to group arrays in two exchanges") {
    val st = AggState.buildFreq(facts(31, 500), keys, "v")
    val plan = AggState.medianMadOutliers(st, keys)
      .queryExecution.executedPlan.toString
    // one exchange for the fact->state aggregate, one for the pack;
    // everything after is row-local array folds
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      s"compact median/MAD walk re-shuffles:\n$plan")
  }

  test("freq quantile walk shares one exchange over state rows") {
    val st = AggState.buildFreq(facts(5, 500), keys, "v")
    val plan = AggState.quantileFromFreq(st, keys, 1, 2)
      .queryExecution.executedPlan.toString
    // one exchange for the fact->state aggregate, one for the state
    // windows + final aggregate (same partition keys, reused)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      s"quantile walk re-shuffles state:\n$plan")
  }
}
