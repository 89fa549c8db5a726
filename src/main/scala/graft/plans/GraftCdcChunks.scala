package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunks of one document as an array — the codegen'd
  * kernel behind [[graft.operators.ContentChunking]]. Identical rule to
  * the declarative HOF twin (boundary after code-point position i, for
  * i in [w, len-1], iff md5 of the w-code-point window ending at i has
  * first hex nibble '0'; the final end is forced at len): ONE byte walk
  * builds the code-point→byte offset table, each window digests
  * in-place from the UTF-8 buffer (zero substring/hex allocation — the
  * nibble test reads the first RAW digest byte), chunks are zero-copy
  * byte slices. The HOF twin pays an interpreted lambda + a Column md5
  * (hex string) + a JVM substring per POSITION; the kernel is one pass.
  * ContentChunkingSpec pins kernel ≡ HOF twin on crafted + random +
  * supplementary-char corpora; the q174 oracle is unchanged.
  */
case class GraftCdcChunks(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("graft_cdc_chunks needs a string text argument")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("graft_cdc_chunks needs a literal int window")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_cdc_chunks"

  override def nullSafeEval(t: Any, w: Any): Any =
    GraftCdcChunks.chunks(t.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, w) => s"graft.plans.GraftCdcChunks.chunks($t, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftCdcChunks =
    copy(left = newLeft, right = newRight)
}

object GraftCdcChunks {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def chunks(text: UTF8String, w: Int): ArrayData = {
    require(w >= 1, s"graft_cdc_chunks window $w < 1")
    val bytes = text.getBytes
    val n = text.numChars()
    if (n == 0)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    // code-point index -> byte offset (offs(n) = total bytes)
    val offs = new Array[Int](n + 1)
    var bi = 0
    var ci = 0
    while (ci < n) {
      offs(ci) = bi
      val b = bytes(bi) & 0xff
      bi += (if (b < 0x80) 1 else if ((b & 0xe0) == 0xc0) 2
             else if ((b & 0xf0) == 0xe0) 3 else 4)
      ci += 1
    }
    offs(n) = bytes.length
    val d = digest.get()
    val ends = new scala.collection.mutable.ArrayBuffer[Int](16)
    var i = w
    while (i <= n - 1) {
      d.reset()
      d.update(bytes, offs(i - w), offs(i) - offs(i - w))
      if ((d.digest()(0) & 0xf0) == 0) ends += i
      i += 1
    }
    ends += n
    val out = new Array[Any](ends.length)
    var k = 0
    var start = 0
    while (k < ends.length) {
      val e = ends(k)
      out(k) = UTF8String.fromBytes(bytes, offs(start), offs(e) - offs(start))
      start = e
      k += 1
    }
    new GenericArrayData(out)
  }
}
