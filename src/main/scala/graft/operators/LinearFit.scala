package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact closed-form linear-model training by distributed normal
  * equations — the one genuinely DISTRIBUTED step of fitting the
  * linear/logistic quality filters a corpus pipeline runs (q150
  * consumes such a model as an external artifact; this produces one
  * in-engine): regression of y on (1, x1, x2) needs only the 3×3
  * Gram matrix XᵀX and Xᵀy, which is ONE map-side-combined aggregate
  * of 9 sums over the corpus — fixed-size state, no second pass, no
  * iteration, no shuffle beyond the single-row final combine. This is
  * the textbook scalable shape (Spark MLlib's own normal-equation
  * solver, CCNet's per-feature statistics): 100 TB of rows flow
  * through partial aggregates into 9 numbers.
  *
  * The solve stays EXACT and engine-portable: Cramer's rule over the
  * aggregated integers — the output is the determinant of (XᵀX + λI')
  * and the three numerator determinants, pure products and sums with
  * ZERO divisions (weights are the rationals w_i = num_i / det; a
  * consumer divides once, at whatever precision it wants). All
  * arithmetic runs in Decimal(38,0) — Spark's exact 128-bit decimal —
  * and the oracle replays it in DuckDB HUGEINT (also 128-bit), so the
  * hash gate covers the entire train computation bit-for-bit.
  *
  * Magnitude contract (what keeps 38 digits honest): |det| ≲
  * n·Σx1²·Σx2² — for n rows with |x| ≤ X, that is n³X⁴. The sf0.1
  * corpus point is ~1e23; an x100 replica ~1e29; the bound crosses
  * 1e38 only near n ~ 1e8 with X ~ 1e3. Past that, production
  * mean-centers/scales features first (standard practice — it only
  * changes the basis, not the model) or solves the collected 3×3 on
  * the driver in BigInt; the SUFFICIENT-STATISTICS pass — the part
  * that touches the corpus — is magnitude-safe far beyond that
  * (9 sums of n·X·Y terms).
  *
  * λ (integer ridge) is added to the x1/x2 diagonal only — the
  * intercept is never penalized (standard ridge); λ=0 is plain OLS.
  */
object LinearFit {

  private val D = DecimalType(38, 0)

  /** One-row training artifact: the 9 sufficient statistics
    * (n, sx1, sx2, sx1x1, sx1x2, sx2x2, sy, sx1y, sx2y) followed by
    * det and the Cramer numerators (w0_num, w1_num, w2_num) for
    * y ≈ w0 + w1·x1 + w2·x2. All Decimal(38,0). Inputs must be
    * integer-valued expressions (cast happens here). */
  def normalEquations3(df: DataFrame, x1: Column, x2: Column, y: Column,
                       ridgeLambda: Long = 0L): DataFrame = {
    val stats = df.select(
        x1.cast(D).as("__x1"), x2.cast(D).as("__x2"), y.cast(D).as("__y"))
      .agg(
        count(lit(1)).cast(D).as("n"),
        sum(col("__x1")).as("sx1"),
        sum(col("__x2")).as("sx2"),
        sum(col("__x1") * col("__x1")).as("sx1x1"),
        sum(col("__x1") * col("__x2")).as("sx1x2"),
        sum(col("__x2") * col("__x2")).as("sx2x2"),
        sum(col("__y")).as("sy"),
        sum(col("__x1") * col("__y")).as("sx1y"),
        sum(col("__x2") * col("__y")).as("sx2y"))
    val lam = lit(ridgeLambda).cast(D)
    // A = [[n, sx1, sx2], [sx1, sx1x1+λ, sx1x2], [sx2, sx1x2, sx2x2+λ]]
    val a11 = col("n"); val a12 = col("sx1"); val a13 = col("sx2")
    val a22 = col("sx1x1") + lam; val a23 = col("sx1x2")
    val a33 = col("sx2x2") + lam
    val b1 = col("sy"); val b2 = col("sx1y"); val b3 = col("sx2y")
    stats.select(
      col("n"), col("sx1"), col("sx2"), col("sx1x1"), col("sx1x2"),
      col("sx2x2"), col("sy"), col("sx1y"), col("sx2y"),
      (a11 * (a22 * a33 - a23 * a23)
        - a12 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * a23 - a22 * a13)).as("det"),
      (b1 * (a22 * a33 - a23 * a23)
        - a12 * (b2 * a33 - a23 * b3)
        + a13 * (b2 * a23 - a22 * b3)).as("w0_num"),
      (a11 * (b2 * a33 - a23 * b3)
        - b1 * (a12 * a33 - a23 * a13)
        + a13 * (a12 * b3 - b2 * a13)).as("w1_num"),
      (a11 * (a22 * b3 - b2 * a23)
        - a12 * (a12 * b3 - b2 * a13)
        + b1 * (a12 * a23 - a22 * a13)).as("w2_num"))
  }

  /** Train-then-apply in one lazy plan — the quality-filter training
    * loop closed end to end: fit on the corpus (ONE sufficient-stats
    * aggregate), broadcast the 1-row exact model, flag every row whose
    * target strays from the fit by more than τ = `tauNum/tauDen` in y
    * units. Division-free throughout: the row residual is
    * resid_num = y·det − (w0_num + w1_num·x1 + w2_num·x2)  (= residual
    * × det exactly), and the gate |resid_num|·tauDen > tauNum·det
    * cross-multiplies τ — XᵀX(+λ) is positive-definite for full-rank
    * features so det > 0 and the inequality never flips. Output =
    * `keepCols` ++ (x1, x2, y, resid_num, is_outlier). */
  def residualGate(df: DataFrame, keepCols: Seq[String],
                   x1: Column, x2: Column, y: Column,
                   tauNum: Long, tauDen: Long,
                   ridgeLambda: Long = 0L): DataFrame = {
    require(tauNum >= 0 && tauDen > 0, s"tau $tauNum/$tauDen must be >= 0")
    val model = normalEquations3(df, x1, x2, y, ridgeLambda)
      .select(col("det"), col("w0_num"), col("w1_num"), col("w2_num"))
    val resid = (y.cast(D) * col("det")) -
      (col("w0_num") + col("w1_num") * x1.cast(D) + col("w2_num") * x2.cast(D))
    df.crossJoin(broadcast(model))
      .select(keepCols.map(col) ++ Seq(
        x1.cast(D).as("x1"), x2.cast(D).as("x2"), y.cast(D).as("y"),
        resid.as("resid_num"),
        (abs(resid) * lit(tauDen).cast(D) >
          lit(tauNum).cast(D) * col("det")).as("is_outlier")): _*)
  }
}
