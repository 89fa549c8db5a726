package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[HeavyHitters]] — the sketch estimate must be one-sided (never below
  * the true count: the property the exactness of the prune rests on),
  * the gate must equal the plain exact formulation, and the prune must
  * actually prune (otherwise the operator is a no-op wrapper). */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish fixture: key k_i appears i times for i in 1..40, plus one
  // giant key — exact counts are known in closed form.
  private lazy val rows =
    (1 to 40).flatMap(i => Seq.fill(i)(s"k$i")) ++ Seq.fill(500)("giant")
  private lazy val df = rows.toDF("k")

  test("estimate is never below the true count, for every key") {
    val sk = HeavyHitters.sketchBytes(df, col("k"), 1e-3, 0.99, 42)
    val bad = df.groupBy(col("k")).agg(count(lit(1)).as("exact"))
      .withColumn("est", HeavyHitters.estimate(sk, col("k")))
      .filter(col("est") < col("exact"))
      .count()
    assert(bad === 0)
  }

  test("exactAtLeast equals the plain GROUP BY ... HAVING formulation") {
    for (thr <- Seq(1L, 10L, 35L, 100L, 1000L)) {
      val got = HeavyHitters.exactAtLeast(df, "k", thr)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val want = df.groupBy(col("k")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= thr)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got === want, s"threshold $thr")
    }
  }

  test("the prune actually rejects light keys map-side") {
    // 2000 distinct singletons + the giant: with eps=1e-4 the worst-case
    // overestimate is ~eps * N ≈ 0.25, so every singleton's estimate is
    // far below the threshold and the exact group-by sees (almost) only
    // the giant's rows
    val wide = ((1 to 2000).map(i => s"solo$i") ++ Seq.fill(500)("giant")).toDF("k")
    val sk = HeavyHitters.sketchBytes(wide, col("k"), 1e-4, 0.99, 42)
    val survivors = wide.filter(HeavyHitters.estimate(sk, col("k")) >= 100).count()
    assert(survivors < 600, s"prune kept $survivors of 2500 rows")
    assert(survivors >= 500) // the giant always survives (one-sidedness)
  }

  test("exactAtLeastFraction derives the threshold from the sketch total") {
    // 540 + 500 rows total = 1040; denom 10 → threshold 104 → only giant
    val got = HeavyHitters.exactAtLeastFraction(df, "k", denom = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("giant", 500L)))
  }

  test("integral keys go through the long path consistently") {
    val nums = ((1 to 50).map(_.toLong) ++ Seq.fill(200)(7L)).toDF("k")
    val got = HeavyHitters.exactAtLeast(nums, "k", 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((7L, 201L)))
  }

  test("incremental count-state form ≡ from-scratch over the union, " +
      "threshold global across the merge (r10)") {
    for (m <- Seq(2, 3, 5)) {
      val tagged = rows.zipWithIndex
        .map { case (k, i) => (k, i % m == 0) }.toDF("k", "b")
      val wh = tagged.filter(!col("b")).select("k")
      val batch = tagged.filter(col("b")).select("k")
      val incr = HeavyHitters.exactAtLeastFractionIncremental(
          HeavyHitters.countState(wh, "k"), batch, "k", denom = 10)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val full = HeavyHitters.exactAtLeastFraction(df, "k", denom = 10)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(incr === full, s"mod $m")
    }
    // global-threshold sensitivity: a heavy batch can DEMOTE a
    // warehouse hitter (the bar moves with the merged total)
    val wh2 = Seq.fill(100)("a").toDF("k") // 100/100 -> a is a hitter alone
    val batch2 = Seq.fill(950)("z").toDF("k") // merged total 1050, thr 105
    val incr2 = HeavyHitters.exactAtLeastFractionIncremental(
        HeavyHitters.countState(wh2, "k"), batch2, "k", denom = 10)
      .collect().map(_.getString(0)).toSet
    assert(incr2 === Set("z")) // 'a' fell under the merged bar
  }
}
