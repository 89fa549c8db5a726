package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression `graft_argmax_cosine(vec, centroids)`: the
  * 0-based index of the centroid (an array of vectors) with the highest
  * cosine similarity to `vec` — IVF cell assignment in one codegen'd loop.
  *
  * Replaces the O(k) nested `when`-chain fold at the IvfIndex call site
  * (round-3 VERDICT item 3): the fold's generated code grows linearly in k
  * and blows past JVM/codegen method limits near realistic cell counts
  * (k ≈ 1024 for a 100 TB corpus), falling back to interpreted evaluation;
  * this kernel is a fixed-size loop whatever k is.
  *
  * Exact-parity contract with the fold it replaces: per-centroid scores are
  * computed with [[CosineSimilarity]]'s formula and accumulation order
  * (length mismatch → 0.0, zero magnitude → 0.0), the probe's norm is
  * hoisted out of the loop (same fold order over the probe → bit-identical
  * sqrt input), ties keep the FIRST maximal index (the fold's strict
  * `>` update), and comparisons follow Spark SQL's NaN ordering (NaN
  * greater than every finite value — `when(score > best)` in the fold is
  * Catalyst's nan-safe compare, NOT Java's always-false `>`). Empty
  * centroid list → null. Null ENTRIES inside the centroid array are
  * skipped (never best; all-null → null) — the fold never accepted null
  * centroids, so this is new surface, defined sanely rather than
  * emulating the fold's null-propagation accidents.
  */
case class GraftArgmaxCosine(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isVector(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = right.dataType match {
    case ArrayType(inner, _) if isVector(left.dataType) && isVector(inner) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_argmax_cosine requires (array<float|double>, " +
        s"array<array<float|double>>), got ${left.dataType.simpleString} " +
        s"and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmax_cosine"

  private def vecIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def centIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val vec = l.asInstanceOf[ArrayData]
    val cents = r.asInstanceOf[ArrayData]
    val k = cents.numElements()
    if (k == 0) return null
    val n = vec.numElements()
    val vf = vecIsFloat
    val cf = centIsFloat
    var na = 0.0
    var i = 0
    while (i < n) {
      val x = if (vf) vec.getFloat(i).toDouble else vec.getDouble(i)
      na += x * x
      i += 1
    }
    val sqna = java.lang.Math.sqrt(na)
    var best = -1
    var bestScore = 0.0
    var j = 0
    while (j < k) {
      val c = if (cents.isNullAt(j)) null else cents.getArray(j)
      if (c != null) {
        var score = 0.0
        if (c.numElements() == n) {
          var dot = 0.0
          var nb = 0.0
          var t = 0
          while (t < n) {
            val x = if (vf) vec.getFloat(t).toDouble else vec.getDouble(t)
            val y = if (cf) c.getFloat(t).toDouble else c.getDouble(t)
            dot += x * y
            nb += y * y
            t += 1
          }
          val den = sqna * java.lang.Math.sqrt(nb)
          score = if (den == 0.0) 0.0 else dot / den
        }
        // Spark SQL comparison semantics: NaN > every finite value (the
        // fold's `when(score > best)` is Catalyst's nan-safe compare, not
        // Java's always-false NaN `>`)
        if (best < 0 || nanSafeGt(score, bestScore)) {
          best = j
          bestScore = score
        }
      }
      j += 1
    }
    if (best < 0) null else best
  }

  /** Catalyst's total-order `>` on doubles: NaN beats every non-NaN. */
  @inline private def nanSafeGt(a: Double, b: Double): Boolean =
    a > b || (java.lang.Double.isNaN(a) && !java.lang.Double.isNaN(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vGet = if (vecIsFloat) "getFloat" else "getDouble"
    val cGet = if (centIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (vec, cents) => {
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val na = ctx.freshName("na")
      val sqna = ctx.freshName("sqna")
      val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val den = ctx.freshName("den")
      val score = ctx.freshName("score")
      s"""
        |final int $k = $cents.numElements();
        |if ($k == 0) {
        |  ${ev.isNull} = true;
        |} else {
        |  final int $n = $vec.numElements();
        |  double $na = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    final double $x = (double) $vec.$vGet($i);
        |    $na += $x * $x;
        |  }
        |  final double $sqna = java.lang.Math.sqrt($na);
        |  int $best = -1;
        |  double $bestScore = 0.0;
        |  for (int $j = 0; $j < $k; $j++) {
        |    if ($cents.isNullAt($j)) continue;
        |    final org.apache.spark.sql.catalyst.util.ArrayData $c = $cents.getArray($j);
        |    double $score = 0.0;
        |    if ($c.numElements() == $n) {
        |      double $dot = 0.0; double $nb = 0.0;
        |      for (int $t = 0; $t < $n; $t++) {
        |        final double $x = (double) $vec.$vGet($t);
        |        final double $y = (double) $c.$cGet($t);
        |        $dot += $x * $y; $nb += $y * $y;
        |      }
        |      final double $den = $sqna * java.lang.Math.sqrt($nb);
        |      $score = ($den == 0.0) ? 0.0 : $dot / $den;
        |    }
        |    // Spark SQL NaN ordering: NaN > every non-NaN (nan-safe compare)
        |    if ($best < 0 || $score > $bestScore ||
        |        (Double.isNaN($score) && !Double.isNaN($bestScore))) {
        |      $best = $j; $bestScore = $score;
        |    }
        |  }
        |  if ($best < 0) { ${ev.isNull} = true; } else { ${ev.value} = $best; }
        |}
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftArgmaxCosine =
    copy(left = newLeft, right = newRight)
}
