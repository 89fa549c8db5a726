package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token metrics in one code-point pass:
  * `[n_tokens, content_chars, bpe_tokens, n_chars]` — the quantities q31
  * previously derived from three separate Java-regex passes per row
  * (two `split("\\s+")`s, a `regexp_extract_all` that materializes every
  * match string just to be counted, and a `regexp_replace` that builds
  * the stripped string just to be measured).
  *
  * Exact replications of the declarative semantics (spec-pinned):
  * - n_tokens = size(split(text, "\\s+")) with Java's limit=-1 edges:
  *   equals (number of whitespace runs) + 1 — leading/trailing
  *   whitespace produce empty tokens, the empty string is one token.
  * - content_chars = code points outside Java regex `\s` (the ASCII set
  *   { space, \t, \n, \x0B, \f, \r } — NOT unicode whitespace).
  * - bpe_tokens = count of `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+` matches:
  *   maximal same-class runs over {ascii-letter, ascii-digit, other},
  *   whitespace separating (non-ascii letters are 'other' — exactly as
  *   the regex classifies them).
  * - n_chars = length(text) in code points (for the //4 estimator).
  */
case class GraftTextMetrics(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_text_metrics needs a string argument")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_text_metrics"

  override def nullSafeEval(input: Any): Any =
    GraftTextMetrics.metrics(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftTextMetrics.metrics($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftTextMetrics =
    copy(child = newChild)
}

object GraftTextMetrics {

  private final val WS = 0
  private final val LETTER = 1
  private final val DIGIT = 2
  private final val OTHER = 3

  @inline private def classify(cp: Int): Int =
    if (cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' || cp == '\r') WS
    else if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) LETTER
    else if (cp >= '0' && cp <= '9') DIGIT
    else OTHER

  def metrics(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    var wsRuns = 0L
    var contentChars = 0L
    var bpeTokens = 0L
    var nChars = 0L
    var prevClass = -1
    var b = 0
    while (b < bytes.length) {
      val c = bytes(b) & 0xff
      val width = if (c < 0x80) 1 else if (c < 0xe0) 2 else if (c < 0xf0) 3 else 4
      // multi-byte code points are never whitespace/letter/digit here:
      // Java regex \s, [A-Za-z], [0-9] are all ASCII classes
      val cls = if (width == 1) classify(c) else OTHER
      if (cls == WS) { if (prevClass != WS) wsRuns += 1 }
      else {
        contentChars += 1
        if (cls != prevClass) bpeTokens += 1
      }
      nChars += 1
      prevClass = cls
      b += width
    }
    new GenericArrayData(
      Array[Any](wsRuns + 1, contentChars, bpeTokens, nChars))
  }
}
