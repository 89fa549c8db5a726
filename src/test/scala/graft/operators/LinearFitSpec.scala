package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinearFitSpec extends SparkSpec {
  import spark.implicits._

  private def fit(rows: Seq[(Long, Long, Long)], lambda: Long = 0L)
      : Map[String, BigInt] = {
    val df = LinearFit.normalEquations3(
      rows.toDF("x1", "x2", "y"), col("x1"), col("x2"), col("y"), lambda)
    val r = df.head()
    df.columns.zipWithIndex.map { case (c, i) =>
      c -> BigInt(r.getDecimal(i).toBigInteger)
    }.toMap
  }

  /** Independent reference: the same sums and 3x3 Cramer determinants
    * computed over BigInt with cofactor expansion along a DIFFERENT
    * row (the third) than the operator's first-row expansion. */
  private def reference(rows: Seq[(Long, Long, Long)], lambda: Long)
      : (BigInt, BigInt, BigInt, BigInt) = {
    def det3(m: Array[Array[BigInt]]): BigInt =
      m(2)(0) * (m(0)(1) * m(1)(2) - m(0)(2) * m(1)(1)) -
        m(2)(1) * (m(0)(0) * m(1)(2) - m(0)(2) * m(1)(0)) +
        m(2)(2) * (m(0)(0) * m(1)(1) - m(0)(1) * m(1)(0))
    val n = BigInt(rows.size)
    def s(f: ((Long, Long, Long)) => BigInt) = rows.map(f).sum
    val (sx1, sx2) = (s(r => BigInt(r._1)), s(r => BigInt(r._2)))
    val a22 = s(r => BigInt(r._1) * r._1) + lambda
    val a23 = s(r => BigInt(r._1) * r._2)
    val a33 = s(r => BigInt(r._2) * r._2) + lambda
    val b = Array(s(r => BigInt(r._3)), s(r => BigInt(r._1) * r._3),
      s(r => BigInt(r._2) * r._3))
    val a = Array(Array(n, sx1, sx2), Array(sx1, a22, a23), Array(sx2, a23, a33))
    def repl(i: Int) = a.indices.map(r =>
      a(r).indices.map(c => if (c == i) b(r) else a(r)(c)).toArray).toArray
    (det3(a), det3(repl(0)), det3(repl(1)), det3(repl(2)))
  }

  test("exact textbook case: y = 3 + 2*x1 - x2 is recovered exactly " +
      "(numerators are integer multiples of det)") {
    val rows = for (x1 <- 0L to 4L; x2 <- 0L to 3L)
      yield (x1, x2, 3L + 2L * x1 - x2)
    val got = fit(rows)
    assert(got("det") !== BigInt(0))
    assert(got("w0_num") === got("det") * 3)
    assert(got("w1_num") === got("det") * 2)
    assert(got("w2_num") === got("det") * -1)
  }

  test("matches the independent BigInt reference on random data, with " +
      "and without ridge") {
    val rnd = new scala.util.Random(168)
    val rows = Seq.fill(200)((rnd.nextInt(500).toLong,
      rnd.nextInt(3000).toLong, rnd.nextInt(4000).toLong))
    Seq(0L, 7L, 1000L).foreach { lam =>
      val got = fit(rows, lam)
      val (d, n0, n1, n2) = reference(rows, lam)
      assert((got("det"), got("w0_num"), got("w1_num"), got("w2_num"))
        === ((d, n0, n1, n2)), s"lambda=$lam")
    }
  }

  test("Cramer identity: A * w_num = det * b holds componentwise " +
      "(the certificate a consumer can re-check)") {
    val rnd = new scala.util.Random(99)
    val rows = Seq.fill(80)((rnd.nextInt(100).toLong,
      rnd.nextInt(900).toLong, rnd.nextInt(1200).toLong))
    val g = fit(rows, 5L)
    val a = Array(
      Array(g("n"), g("sx1"), g("sx2")),
      Array(g("sx1"), g("sx1x1") + 5, g("sx1x2")),
      Array(g("sx2"), g("sx1x2"), g("sx2x2") + 5))
    val w = Array(g("w0_num"), g("w1_num"), g("w2_num"))
    val b = Array(g("sy"), g("sx1y"), g("sx2y"))
    (0 until 3).foreach { i =>
      val lhs = (0 until 3).map(j => a(i)(j) * w(j)).sum
      assert(lhs === g("det") * b(i), s"row $i of A*w = det*b")
    }
  }

  test("ridge perturbs the solution (lambda actually lands on the " +
      "diagonal) but never the sufficient statistics") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(50)((rnd.nextInt(50).toLong,
      rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
    val plain = fit(rows, 0L)
    val ridged = fit(rows, 1000L)
    Seq("n", "sx1", "sx2", "sx1x1", "sx1x2", "sx2x2", "sy", "sx1y", "sx2y")
      .foreach(c => assert(plain(c) === ridged(c), c))
    assert(plain("det") !== ridged("det"))
  }

  test("residualGate: an exactly-linear corpus has all-zero residuals " +
      "and no outliers; a planted deviant row is the only flag") {
    val clean = (for (x1 <- 1L to 6L; x2 <- 1L to 5L)
      yield (x1 * 10 + x2, x1, x2, 7L + 2L * x1 + 3L * x2)).toSeq
    val planted = (999L, 3L, 3L, 7L + 2L * 3 + 3L * 3 + 50L)
    def gate(rows: Seq[(Long, Long, Long, Long)], tauNum: Long) =
      LinearFit.residualGate(rows.toDF("id", "x1", "x2", "y"), Seq("id"),
          col("x1"), col("x2"), col("y"), tauNum, 1L)
        .select(col("id"), col("resid_num").cast("string"), col("is_outlier"))
        .as[(Long, String, Boolean)].collect()
    gate(clean, 1L).foreach { case (id, r, flag) =>
      assert(BigInt(r) === BigInt(0), s"row $id residual")
      assert(!flag, s"row $id flagged")
    }
    // with one deviant row the fit shifts, but only the plant's residual
    // can exceed tau = 25 y-units (the other 30 rows share the blame in
    // proportion to leverage, each far below it)
    val flagged = gate(clean :+ planted, 25L).filter(_._3).map(_._1)
    assert(flagged === Seq(999L), s"flagged: $flagged")
  }

  test("residualGate broadcasts the 1-row model — no shuffle lands on " +
      "the corpus side") {
    val df = LinearFit.residualGate(
      (1L to 50L).map(i => (i, i % 7, i % 11, i % 5)).toDF("id", "x1", "x2", "y"),
      Seq("id"), col("x1"), col("x2"), col("y"), 1L, 1L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"model must broadcast:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"corpus rows must not shuffle:\n$p")
  }

  test("the plan is one partial-aggregated pass: no join, no window, " +
      "one single-partition combine") {
    val df = LinearFit.normalEquations3(
      (1L to 10L).map(i => (i, i * 2, i * 3)).toDF("x1", "x2", "y"),
      col("x1"), col("x2"), col("y"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_"), s"map-side combine missing:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }
}
