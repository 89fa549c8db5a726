package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-token-shingle count of one document in one pass — the
  * row-local replacement for shingleRows → groupBy countDistinct, which
  * shuffles every shingle of the corpus to count a per-document
  * property (and then joins the counts back to the document row).
  *
  * Token semantics are EXACTLY Spark's `split(text, "\\s+")`: the same
  * JDK `Pattern.split(input, -1)` call, so leading/trailing empty-token
  * edges (text starting or ending in whitespace) agree with the
  * declarative pipeline by construction rather than by re-derivation.
  * Shingles are the `concat_ws(" ")` joins of n consecutive tokens;
  * distinctness via a per-document hash set. Documents with fewer than
  * n tokens count 0, matching countDistinct over an all-null group.
  */
case class GraftShingleCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("graft_shingle_count needs a string text argument")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("graft_shingle_count needs a literal int n")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_shingle_count"

  override def nullSafeEval(t: Any, n: Any): Any =
    GraftShingleCount.count(t.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.plans.GraftShingleCount.count($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftShingleCount =
    copy(left = newLeft, right = newRight)
}

object GraftShingleCount {
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  def count(text: UTF8String, n: Int): Long = {
    val toks = Whitespace.split(text.toString, -1)
    if (toks.length < n) return 0L
    val seen = new java.util.HashSet[String]()
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
      seen.add(sb.toString)
      i += 1
    }
    seen.size.toLong
  }
}
