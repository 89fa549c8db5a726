package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Nanos-since-epoch LONG from a timestamp column, tz-independent.
  *
  * Both TIMESTAMP_NTZ and TIMESTAMP are physically a long of
  * microseconds — NTZ counts wall-clock micros from 1970-01-01 00:00:00
  * (no zone), LTZ counts UTC-instant micros. Either way the number DuckDB's
  * `epoch_ns(ts)` reports for the same parquet value is exactly that long
  * ×1000: DuckDB treats naive timestamps as-written, and Spark's parquet
  * reader performs no zone conversion for INT64 timestamps. So the whole
  * conversion is one codegen'd multiply — no `unix_date`/`hour`/`second`
  * decomposition (TablesSpec pins this kernel to that 5-intrinsic
  * declarative twin), and crucially no dependence on
  * `spark.sql.session.timeZone`, which a host application's session may
  * set to anything.
  *
  * The event family (EventQueries, streaming twins) does exact integer
  * window arithmetic on the result; see `Tables.events`.
  */
case class GraftTsNanos(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case TimestampNTZType | TimestampType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ts_nanos needs a timestamp argument, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ts_nanos"

  override def nullSafeEval(ts: Any): Any =
    ts.asInstanceOf[Long] * 1000L

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$c * 1000L")

  override protected def withNewChildInternal(newChild: Expression): GraftTsNanos =
    copy(child = newChild)
}
