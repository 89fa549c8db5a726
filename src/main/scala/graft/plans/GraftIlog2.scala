package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Column form of [[graft.functions.IntLog2.ilog2e16]] — the exact
  * fixed-point binary logarithm (2^16 · log2 x as a long, defined by
  * the bit-specified mantissa-squaring algorithm, zero
  * transcendentals). Exposing it as an expression lets DECLARATIVE
  * plans price information quantities (entropy, KL divergence,
  * likelihood costs) with arithmetic any engine replays exactly —
  * the oracle side is the same 16-step HUGEINT chain the q175/q177
  * twins already run.
  *
  * Input must be a positive long (the algorithm's domain); null in →
  * null out.
  */
case class GraftIlog2(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_ilog2_e16 needs a bigint argument")

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_ilog2_e16"

  override def nullSafeEval(input: Any): Any =
    graft.functions.IntLog2.ilog2e16(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IntLog2.ilog2e16($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftIlog2 =
    copy(child = newChild)
}
