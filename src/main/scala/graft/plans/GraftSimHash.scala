package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Portable SimHash kernel: the 64-bit ±1-vote fingerprint of one
  * NORMALIZED document in a single pass — identical to the declarative
  * explode → conv-nibbles → 64 SUM votes → nibble-assembly pipeline
  * (spec-pinned; the q39 DuckDB oracle still rebuilds it in SQL), minus
  * its explode shuffle and 64-column aggregation. Per token: first 8
  * bytes of md5 as a big-endian long; vote tally per bit; result bit set
  * where the tally is strictly positive; emitted as the 16-hex string the
  * oracle compares. Matches the declarative edge semantics exactly: an
  * empty normalized text still contributes one empty token (split
  * semantics), which votes with md5("")'s bits.
  */
case class GraftSimHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_simhash needs a string argument")

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    GraftSimHash.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftSimHash.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftSimHash =
    copy(child = newChild)
}

object GraftSimHash {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".getBytes

  def fingerprint(norm: UTF8String): UTF8String = {
    val bytes = norm.getBytes
    val votes = new Array[Int](64)
    val md = digest.get()

    def voteToken(from: Int, until: Int): Unit = {
      md.reset()
      md.update(bytes, from, until - from)
      val raw = md.digest()
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (raw(i) & 0xffL); i += 1 }
      var b = 0
      while (b < 64) {
        votes(b) += (if (((v >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }

    // tokens are the space-separated runs of the normalized text; an
    // empty text is one empty token (split("", '\s+') semantics)
    var start = 0
    var b = 0
    while (b < bytes.length) {
      if (bytes(b) == ' ') { voteToken(start, b); start = b + 1 }
      b += 1
    }
    voteToken(start, bytes.length)

    var r = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) r |= (1L << bit)
      bit += 1
    }
    val out = new Array[Byte](16)
    var j = 0
    while (j < 16) {
      out(j) = HEX(((r >>> (4 * (15 - j))) & 0xf).toInt)
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}
