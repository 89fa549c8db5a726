package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Native probe for a serialized count-min sketch:
  * `graft_cms_estimate(sketch, key)` → the sketch's (over-)estimate of
  * `key`'s frequency. The companion of the builtin `count_min_sketch`
  * aggregate, which builds the sketch distributed (per-partition counter
  * matrices, element-wise-added on merge) but ships it back as opaque
  * bytes with no row-level probe — this expression closes the loop so a
  * plan can FILTER on estimated frequency map-side, before any shuffle.
  *
  * The sketch argument must be a CONSTANT (a literal holding the
  * aggregate's result — same contract as Spark's own
  * `BloomFilterMightContain`); it is deserialized once per expression
  * instance and referenced from generated code, so the per-row cost is
  * `depth` hash-and-min probes, inside whole-stage codegen.
  *
  * Key hashing matches the aggregate exactly: the builtin adds string
  * keys as their UTF-8 bytes (`addBinary`), so the probe estimates over
  * the same bytes; integral keys go through the long path on both
  * sides. The estimate is one-sided — never below the true count —
  * which is what makes frequency-threshold pruning on it EXACT after an
  * exact verify (see [[graft.operators.HeavyHitters]]).
  */
case class GraftCmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_cms_estimate requires a binary sketch as the first " +
          s"argument, got ${left.dataType.simpleString}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "the sketch must be a constant — aggregate it first and pass " +
          "the bytes as a literal")
    else right.dataType match {
      case StringType | LongType | IntegerType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_estimate supports string and integral keys, got " +
          t.simpleString)
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cms_estimate"

  @transient private lazy val sketch: CountMinSketch = {
    val bytes = left.eval(null)
    if (bytes == null) null
    else CountMinSketch.readFrom(bytes.asInstanceOf[Array[Byte]])
  }

  override def nullSafeEval(sketchBytes: Any, key: Any): Any =
    right.dataType match {
      case StringType =>
        sketch.estimateCount(key.asInstanceOf[UTF8String].getBytes)
      case LongType =>
        sketch.estimateCount(java.lang.Long.valueOf(key.asInstanceOf[Long]))
      case _ =>
        sketch.estimateCount(java.lang.Long.valueOf(key.asInstanceOf[Int].toLong))
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (sketch == null) {
      // null sketch literal — nullSafeCodeGen's guard short-circuits on the
      // constant-null child, so the body below never executes
      return nullSafeCodeGen(ctx, ev, (_, _) => s"${ev.value} = -1L;")
    }
    val cms = ctx.addReferenceObj("graftCms", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (_, key) => {
      val call = right.dataType match {
        case StringType => s"$cms.estimateCount($key.getBytes())"
        case _ =>
          s"$cms.estimateCount((Object) java.lang.Long.valueOf((long) $key))"
      }
      s"${ev.value} = $call;"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftCmsEstimate =
    copy(left = newLeft, right = newRight)
}
