package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: cosine similarity between two float/double
  * array columns, with the reference's guards (length mismatch → 0.0,
  * zero magnitude → 0.0 — embeddings.py:389-404).
  *
  * Why a custom Expression (SURVEY §7.3 "promote only if bench demands"):
  * the portable `aggregate(zip_with(...))` formulation runs on the
  * interpreted higher-order-function path — fine at test scale, but at
  * corpus scale every probe is O(N·d) lambda dispatches. This version
  * compiles to a tight primitive loop inside whole-stage codegen (and the
  * interpreted `nullSafeEval` twin matches it bit-for-bit: same sequential
  * fold order, so oracle parity is preserved).
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isVector(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVector(left.dataType) && isVector(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine requires array<float>/array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @inline private def elemAt(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return 0.0
    val af = elemIsFloat(left)
    val bf = elemIsFloat(right)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = elemAt(a, i, af)
      val y = elemAt(b, i, bf)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val den = java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb)
    if (den == 0.0) 0.0 else dot / den
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val bGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val den = ctx.freshName("den")
      s"""
        |final int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.value} = 0.0;
        |} else {
        |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    final double $x = (double) $a.$aGet($i);
        |    final double $y = (double) $b.$bGet($i);
        |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        |  }
        |  final double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
        |  ${ev.value} = ($den == 0.0) ? 0.0 : $dot / $den;
        |}
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
