package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native md5-hex expression, output byte-identical to Spark's `md5` (and
  * DuckDB's — the cross-engine hash every portable dedup operator is
  * keyed on), but ~2× cheaper per call: Spark's stock `Md5` goes through
  * commons-codec `DigestUtils.md5Hex`, which calls
  * `MessageDigest.getInstance("MD5")` — a synchronized JCA provider
  * lookup plus a fresh digest allocation — for EVERY row. The portable
  * MinHash path computes 9 digests per shingle row (1 keying + 8 lane
  * groups), so that per-call overhead dominates the suite's heaviest
  * queries (q38/q39/q64). This version holds one `MessageDigest` per
  * thread and hex-encodes straight into the UTF8String buffer.
  */
case class GraftMd5(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5 requires a string or binary argument, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_md5"

  private def isString: Boolean = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (isString) GraftMd5.hexUtf8(input.asInstanceOf[UTF8String])
    else GraftMd5.hex(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isString) "hexUtf8" else "hex"
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftMd5.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftMd5 =
    copy(child = newChild)
}

object GraftMd5 {
  /** Column-API entry point (requires the function registered on the
    * session — GraftExtensions.ensure, which every SparkEntry query and
    * spec session performs). */
  def column(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function("graft_md5", c)

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".getBytes

  def hexUtf8(s: UTF8String): UTF8String = hex(s.getBytes)

  def hex(bytes: Array[Byte]): UTF8String = {
    val d = digest.get()
    d.reset()
    val raw = d.digest(bytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((raw(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(raw(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }
}
