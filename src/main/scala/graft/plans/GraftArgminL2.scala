package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression `graft_argmin_l2(vec, centroids)`: the
  * 0-based index of the centroid with the smallest squared-L2 distance
  * to `vec`, all in exact long arithmetic — the k-means assignment step
  * ([[graft.operators.KMeans]]) as one codegen'd loop.
  *
  * Replaces the `transform`/`zip_with`/`aggregate` HOF chain: Catalyst
  * higher-order functions are interpreted (lambda per element, boxed
  * longs), which measured ~96 µs/row at k=8, d=64 — and the cost is per
  * ROW, so it scales with the corpus. This loop is whole-stage-codegen
  * at any k; the HOF twin remains in KMeansSpec as the parity pin.
  *
  * Contract (matches the HOF `array_position(dists, array_min(dists))`):
  * first-minimal index wins ties; a null or length-mismatched centroid
  * entry is skipped (never best); empty or all-skipped centroid list →
  * null. Overflow: |component| ≤ 2²¹ after quantization ⇒ per-term
  * (x−y)² ≤ 2⁴⁴, safe for d < 2¹⁹ dims in a signed long.
  */
case class GraftArgminL2(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_argmin_l2 requires (array<bigint>, array<array<bigint>>), " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmin_l2"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val vec = l.asInstanceOf[ArrayData]
    val cents = r.asInstanceOf[ArrayData]
    val k = cents.numElements()
    val n = vec.numElements()
    var best = -1
    var bestDist = 0L
    var j = 0
    while (j < k) {
      if (!cents.isNullAt(j)) {
        val c = cents.getArray(j)
        if (c.numElements() == n) {
          var dist = 0L
          var t = 0
          while (t < n) {
            val diff = vec.getLong(t) - c.getLong(t)
            dist += diff * diff
            t += 1
          }
          if (best < 0 || dist < bestDist) {
            best = j
            bestDist = dist
          }
        }
      }
      j += 1
    }
    if (best < 0) null else best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, cents) => {
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestDist = ctx.freshName("bestDist")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val c = ctx.freshName("c")
      val dist = ctx.freshName("dist")
      val diff = ctx.freshName("diff")
      s"""
        |final int $k = $cents.numElements();
        |final int $n = $vec.numElements();
        |int $best = -1;
        |long $bestDist = 0L;
        |for (int $j = 0; $j < $k; $j++) {
        |  if ($cents.isNullAt($j)) continue;
        |  final org.apache.spark.sql.catalyst.util.ArrayData $c = $cents.getArray($j);
        |  if ($c.numElements() != $n) continue;
        |  long $dist = 0L;
        |  for (int $t = 0; $t < $n; $t++) {
        |    final long $diff = $vec.getLong($t) - $c.getLong($t);
        |    $dist += $diff * $diff;
        |  }
        |  if ($best < 0 || $dist < $bestDist) { $best = $j; $bestDist = $dist; }
        |}
        |if ($best < 0) { ${ev.isNull} = true; } else { ${ev.value} = $best; }
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftArgminL2 =
    copy(left = newLeft, right = newRight)
}
