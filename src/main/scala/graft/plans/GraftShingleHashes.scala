package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit hash of every n-token shingle of one document — the
  * allocation-free sibling of [[GraftShingles]] for pipelines that only
  * ever compare shingles for EQUALITY (span dedup's duplicated-position
  * count): emitting `xxhash64`-style longs instead of shingle strings
  * removes one UTF8String allocation per position AND shrinks the
  * downstream shuffle key to 8 bytes. Measured at the x10 point the
  * string kernel spends 0.55 s of q123's 1.47 s building 2.5M shingle
  * strings it immediately hashes away.
  *
  * Token enumeration is bit-compatible with `split(text, "\\s+")` at
  * limit -1 (the [[GraftShingles]] contract): Java's default `\s` is the
  * six ASCII whitespace bytes, none of which occur inside a UTF-8
  * multi-byte sequence, so a single byte walk reproduces the exact token
  * boundaries — including the leading empty token of
  * whitespace-prefixed text and the trailing empty token of
  * whitespace-suffixed text. Per-token FNV-1a over the raw bytes, then
  * an order-dependent polynomial combine across the window; equal token
  * sequences always collide (no false negatives), distinct sequences
  * collide with ~2^-64 probability (one-sided over-flag — the
  * ExactSubstr production contract; see SpanDedup's scaladoc).
  *
  * Array length equals `graft_shingles`' for the same input, so
  * positions line up across both kernels by construction.
  */
case class GraftShingleHashes(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("graft_shingle_hashes needs a string text argument")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("graft_shingle_hashes needs a literal int n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(t: Any, n: Any): Any =
    GraftShingleHashes.hashes(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.plans.GraftShingleHashes.hashes($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftShingleHashes =
    copy(left = newLeft, right = newRight)
}

object GraftShingleHashes {

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L
  private final val Mix = 0x9e3779b97f4a7c15L

  /** Java regex `\s` without UNICODE flags: exactly these six bytes. */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def hashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // Pass 1: token hashes, split(\s+, -1) boundary semantics.
    // Upper bound on token count: len/1 + 1; size lazily via builder.
    var tokenHashes = new Array[Long](math.max(8, len / 4 + 2))
    var nTok = 0
    @inline def push(h: Long): Unit = {
      if (nTok == tokenHashes.length)
        tokenHashes = java.util.Arrays.copyOf(tokenHashes, nTok * 2)
      tokenHashes(nTok) = h
      nTok += 1
    }
    var i = 0
    var h = FnvOffset
    while (i < len) {
      val b = bytes(i)
      if (isWs(b)) {
        push(h) // token ended (possibly the empty leading token)
        h = FnvOffset
        i += 1
        while (i < len && isWs(bytes(i))) i += 1 // \s+ greedy
      } else {
        h = (h ^ (b & 0xffL)) * FnvPrime
        i += 1
      }
    }
    push(h) // final token — empty when text ends in whitespace, as split(-1) keeps
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    // Pass 2: order-dependent combine per n-window.
    val out = new Array[Any](nTok - n + 1)
    var s = 0
    while (s <= nTok - n) {
      var acc = Mix
      var j = 0
      while (j < n) {
        acc = (acc ^ tokenHashes(s + j)) * FnvPrime
        acc ^= (acc >>> 29)
        j += 1
      }
      out(s) = java.lang.Long.valueOf(acc)
      s += 1
    }
    new GenericArrayData(out)
  }
}
