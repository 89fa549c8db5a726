package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Portable MinHash signature kernel: the full numPerms-lane signature of
  * one NORMALIZED document in a single pass — semantically identical to
  * the declarative shingleRows → md5 keying → 32 MIN aggregates pipeline
  * (spec-pinned, and the q38/q69 DuckDB oracles still rebuild the same
  * signatures in SQL), but with none of its distributed overhead: the
  * declarative form shuffles every shingle row to sort it under a
  * per-document window (lead), then shuffles again for the MIN
  * aggregation. Signatures are a per-document property; this computes
  * them where the document already is.
  *
  * Contract: input text is already `Dedup.normalized` (whitespace runs
  * collapsed to single spaces, trimmed, lowercased), so token boundaries
  * are exactly the 0x20 bytes and an n-token shingle is the byte slice
  * from token i's start to token i+n-1's end — the same string
  * `concat_ws(" ", tokens...)` produces. Per shingle: md5 → 32-hex
  * ascii; per lane group g: md5("g:" + hex32); lane = 8-hex slice packed
  * into a long (unsigned compare ≡ hex-string compare); running minima.
  * Documents with fewer than n tokens yield all-sentinel lanes
  * ("ffffffff"), matching the declarative COALESCE.
  */
case class GraftMinHash(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("graft_minhash needs a string text argument")
    else if (second.dataType != IntegerType || third.dataType != IntegerType ||
      !second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure("graft_minhash needs literal int numPerms and n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(t: Any, perms: Any, n: Any): Any =
    GraftMinHash.signature(t.asInstanceOf[UTF8String],
      perms.asInstanceOf[Int], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, p, n) => s"graft.plans.GraftMinHash.signature($t, $p, $n)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): GraftMinHash =
    copy(first = f, second = s, third = t)
}

object GraftMinHash {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".getBytes

  private def unpack(packed: Long): UTF8String = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) {
      out(i) = ((packed >>> (8 * (7 - i))) & 0xff).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def signature(norm: UTF8String, numPerms: Int, n: Int): ArrayData = {
    require(numPerms % 4 == 0 && numPerms <= 40,
      "numPerms must be a multiple of 4, at most 40 (single-digit group prefixes)")
    require(n >= 1, "shingle width n must be >= 1")
    val bytes = norm.getBytes
    // token starts: 0 and every byte after a space (normalized text has
    // only single 0x20 separators); "" counts as one empty token
    var nTokens = 1
    var b = 0
    while (b < bytes.length) { if (bytes(b) == ' ') nTokens += 1; b += 1 }
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    b = 0
    while (b < bytes.length) {
      if (bytes(b) == ' ') { starts(t) = b + 1; t += 1 }
      b += 1
    }
    starts(nTokens) = bytes.length + 1 // virtual separator past the end
    val nShingles = nTokens - n + 1
    val nGroups = numPerms / 4
    val minima = Array.fill(numPerms)(-1L) // 0xffff... = unsigned max
    if (nShingles > 0) {
      val md = digest.get()
      val hexBuf = new Array[Byte](34) // "g:" prefix + 32 hex chars
      var i = 0
      while (i < nShingles) {
        val from = starts(i)
        val until = starts(i + n) - 1 // drop the trailing separator
        md.reset()
        md.update(bytes, from, until - from)
        val raw = md.digest()
        var j = 0
        while (j < 16) {
          hexBuf(2 + 2 * j) = HEX((raw(j) >> 4) & 0xf)
          hexBuf(2 + 2 * j + 1) = HEX(raw(j) & 0xf)
          j += 1
        }
        hexBuf(1) = ':'
        var g = 0
        while (g < nGroups) {
          // group prefixes are single ascii digits for numPerms <= 40
          hexBuf(0) = ('0' + g).toByte
          md.reset()
          md.update(hexBuf, 0, 34)
          val graw = md.digest()
          var lane = 0
          while (lane < 4) {
            var packed = 0L
            var k = 0
            while (k < 4) {
              val c = graw(4 * lane + k)
              packed = (packed << 8) | HEX((c >> 4) & 0xf)
              packed = (packed << 8) | HEX(c & 0xf)
              k += 1
            }
            val idx = 4 * g + lane
            if (java.lang.Long.compareUnsigned(packed, minima(idx)) < 0) {
              minima(idx) = packed
            }
            lane += 1
          }
          g += 1
        }
        i += 1
      }
    }
    val out = new Array[Any](numPerms)
    var i = 0
    while (i < numPerms) {
      out(i) = if (minima(i) == -1L && nShingles <= 0) UTF8String.fromString("ffffffff")
        else unpack(minima(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
