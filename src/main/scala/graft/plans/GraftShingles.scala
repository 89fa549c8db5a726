package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All n-token shingles of one document as an array — the row-local
  * generator feeding `explode(...)` where shingles are needed as JOIN
  * KEYS (contamination checks, posting lists). The declarative
  * `shingleRows` (posexplode → per-doc window lead) produces the same
  * rows but pays a corpus-wide shuffle+sort just to pair each token with
  * its successors; generating the array in place keeps the explode
  * shuffle-free. Token semantics are Spark's `split(text, "\\s+")`
  * verbatim (same JDK call, limit -1); shingles join with single spaces.
  * Documents with fewer than n tokens yield an empty array — exactly the
  * rows the declarative form null-filters away.
  */
case class GraftShingles(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("graft_shingles needs a string text argument")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("graft_shingles needs a literal int n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(t: Any, n: Any): Any =
    GraftShingles.shingles(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.plans.GraftShingles.shingles($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftShingles =
    copy(left = newLeft, right = newRight)
}

object GraftShingles {
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = Whitespace.split(text.toString, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}
