package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document keyword-profile occurrence counts in one token pass — the
  * row-local replacement for the explode → conditional-SUM shape behind
  * language-ID: a per-document property must not fan every token of the
  * corpus into a shuffle. Returns one occurrence count per vocabulary
  * (duplicate tokens count each occurrence, matching
  * `sum(when(t.isin(vocab), 1))` over exploded tokens).
  *
  * Token semantics are EXACTLY Spark's `split(text, "\\s+")` (same JDK
  * `Pattern.split(input, -1)` call). The vocabulary argument must be a
  * foldable array-of-arrays literal; its hash sets are built once per
  * expression instance, not per row.
  */
case class GraftKeywordCounts(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("graft_keyword_counts needs a string text argument")
    else if (!right.foldable ||
      !right.dataType.isInstanceOf[ArrayType] ||
      !right.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[ArrayType])
      TypeCheckResult.TypeCheckFailure(
        "graft_keyword_counts needs a literal array<array<string>> vocabulary")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_keyword_counts"

  @transient private lazy val vocabSets: Array[java.util.HashSet[String]] = {
    val outer = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(outer.numElements()) { i =>
      val inner = outer.getArray(i)
      val s = new java.util.HashSet[String]()
      var j = 0
      while (j < inner.numElements()) { s.add(inner.getUTF8String(j).toString); j += 1 }
      s
    }
  }

  override def nullSafeEval(t: Any, v: Any): Any =
    GraftKeywordCounts.count(t.asInstanceOf[UTF8String], vocabSets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("vocabSets", vocabSets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev,
      (t, _) => s"graft.plans.GraftKeywordCounts.count($t, $setsRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftKeywordCounts =
    copy(left = newLeft, right = newRight)
}

object GraftKeywordCounts {
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  def count(text: UTF8String,
            sets: Array[java.util.HashSet[String]]): ArrayData = {
    val toks = Whitespace.split(text.toString, -1)
    val counts = new Array[Long](sets.length)
    var i = 0
    while (i < toks.length) {
      var k = 0
      while (k < sets.length) {
        if (sets(k).contains(toks(i))) counts(k) += 1L
        k += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}
