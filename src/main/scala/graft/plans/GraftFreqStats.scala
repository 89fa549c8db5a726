package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Median + MAD + k·MAD outlier count over a SORTED frequency grid, in
  * one O(n) pass: `graft_freq_stats(fs, total, madK)` where `fs` is the
  * per-group state array<struct<v_cents: long, n: long>> sorted by
  * value (AggState.medianMadOutliers' packed form) and `total` = Σn.
  * Returns `[median, mad, n_outliers]`.
  *
  * Why a kernel (measured, sf0.1 q144): the declarative form is three
  * `aggregate()` folds plus an `array_sort` of a transformed struct
  * array — higher-order functions evaluate their lambda per element in
  * interpreted Catalyst, ~0.5-0.6 s per pack stage at 150k grid
  * entries. This expression walks primitive long arrays. The deviation
  * grid needs NO sort at all: deviations of a value-sorted grid form
  * two monotone runs around the median (decreasing below, increasing
  * above), so a two-pointer merge enumerates them in ascending order —
  * the textbook O(n) median-of-deviations walk.
  *
  * Quantile rule: identical to [[graft.operators.AggState.quantileFromFreq]]
  * (smallest value whose cumulative count satisfies cum*2 >= total —
  * lower median, integer arithmetic). AggStateSpec pins kernel ==
  * window-walk == driver reference on random data; the q144 oracle
  * pins it cross-engine.
  */
case class GraftFreqStats(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 2 && fields.forall(_.dataType == LongType) =>
      if (second.dataType == LongType && third.dataType == LongType)
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "graft_freq_stats needs long total and madK arguments")
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_freq_stats needs array<struct<long, long>> sorted by value")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_freq_stats"

  override def nullSafeEval(fs: Any, total: Any, madK: Any): Any =
    GraftFreqStats.stats(fs.asInstanceOf[ArrayData],
      total.asInstanceOf[Long], madK.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (fs, t, k) => s"graft.plans.GraftFreqStats.stats($fs, $t, $k)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): GraftFreqStats =
    copy(first = f, second = s, third = t)
}

object GraftFreqStats {

  def stats(fs: ArrayData, total: Long, madK: Long): ArrayData = {
    val n = fs.numElements()
    if (n == 0 || total <= 0)
      return new GenericArrayData(Array[Any](0L, 0L, 0L))
    val vs = new Array[Long](n)
    val cs = new Array[Long](n)
    var sum = 0L
    var i = 0
    while (i < n) {
      val row = fs.getStruct(i, 2)
      vs(i) = row.getLong(0)
      cs(i) = row.getLong(1)
      sum += cs(i)
      i += 1
    }
    // Defensive contract check: both quantile walks below terminate only
    // when the cumulative count reaches total/2. A caller passing a
    // `total` larger than 2x the grid's actual count sum (the function is
    // SQL-registered, so any session query can) would otherwise exhaust
    // both pointers and index cs(-1). Return the zero sentinel instead of
    // crashing the task.
    if (2L * sum < total)
      return new GenericArrayData(Array[Any](0L, 0L, 0L))
    // median: smallest grid value with cum*2 >= total
    var cum = 0L
    var mi = 0
    i = 0
    var found = false
    while (i < n && !found) {
      cum += cs(i)
      if (2L * cum >= total) { mi = i; found = true }
      i += 1
    }
    val med = vs(mi)
    // MAD: deviations of a value-sorted grid are two monotone runs
    // around the median — merge them ascending with two pointers
    // (entries sharing a deviation value accumulate consecutively, so
    // the crossing value is the merged-grid quantile exactly)
    var l = mi - 1
    var r = mi
    cum = 0L
    var mad = 0L
    found = false
    while (!found) { // total >= 1 guarantees the crossing is reached
      val dl = if (l >= 0) med - vs(l) else Long.MaxValue
      val dr = if (r < n) vs(r) - med else Long.MaxValue
      if (dl <= dr) {
        cum += cs(l)
        if (2L * cum >= total) { mad = dl; found = true }
        l -= 1
      } else {
        cum += cs(r)
        if (2L * cum >= total) { mad = dr; found = true }
        r += 1
      }
    }
    // k·MAD gate
    val bound = madK * mad
    var out = 0L
    i = 0
    while (i < n) {
      val d = math.abs(vs(i) - med)
      if (d > bound) out += cs(i)
      i += 1
    }
    new GenericArrayData(Array[Any](med, mad, out))
  }
}
