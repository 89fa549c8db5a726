package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-entropy statistics in one row-local pass:
  * `[n_chars, n_distinct, num_e16]` where `num_e16 = n·lg(n) −
  * Σ_c cnt(c)·lg(cnt(c))` over the code-point histogram and `lg` is
  * the exact fixed-point [[graft.functions.IntLog2.ilog2e16]]. The
  * Shannon entropy in bits is `num_e16 / (n · 2^16)` — but the
  * DIVISION is left to the caller so every emitted quantity is an
  * exact long both engines agree on bit-for-bit (low-entropy gating is
  * the Gopher/C4 repetitive-garbage filter; transcendental log2 would
  * make the score engine-dependent, the PMI caveat).
  *
  * The declarative twin (position explode → per-char groupBy →
  * graft_ilog2_e16 → doc rollup) pays a corpus-wide shuffle of one row
  * per CHARACTER for a per-document property; this kernel is the
  * zero-shuffle form (the GraftMinHash argument). CharEntropySpec pins
  * kernel ≡ twin; the q180 oracle replays the histogram + ilog2 chain
  * in SQL.
  *
  * Empty/null-safe: "" → [0, 0, 0].
  */
case class GraftCharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_char_entropy needs a string argument")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_char_entropy"

  override def nullSafeEval(input: Any): Any =
    GraftCharEntropy.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftCharEntropy.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftCharEntropy =
    copy(child = newChild)
}

object GraftCharEntropy {

  def stats(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val hist = new scala.collection.mutable.LongMap[Long](64)
    var n = 0L
    var b = 0
    while (b < bytes.length) {
      val c = bytes(b) & 0xff
      var cp = 0
      var width = 0
      if (c < 0x80) { cp = c; width = 1 }
      else if ((c & 0xe0) == 0xc0) {
        cp = ((c & 0x1f) << 6) | (bytes(b + 1) & 0x3f); width = 2
      } else if ((c & 0xf0) == 0xe0) {
        cp = ((c & 0x0f) << 12) | ((bytes(b + 1) & 0x3f) << 6) |
          (bytes(b + 2) & 0x3f); width = 3
      } else {
        cp = ((c & 0x07) << 18) | ((bytes(b + 1) & 0x3f) << 12) |
          ((bytes(b + 2) & 0x3f) << 6) | (bytes(b + 3) & 0x3f); width = 4
      }
      hist.update(cp.toLong, hist.getOrElse(cp.toLong, 0L) + 1L)
      n += 1
      b += width
    }
    if (n == 0) return new GenericArrayData(Array[Any](0L, 0L, 0L))
    val lg = graft.functions.IntLog2.ilog2e16 _
    var sum = 0L
    var distinct = 0L
    hist.foreachValue { c =>
      distinct += 1
      sum += c * lg(c)
    }
    val num = n * lg(n) - sum
    new GenericArrayData(Array[Any](n, distinct, num))
  }
}
