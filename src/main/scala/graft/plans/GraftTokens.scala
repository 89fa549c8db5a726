package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokenizer — the byte-walk replacement for
  * `split(text, "\\s+")` in the hot tokenize paths.
  *
  * `split` compiles and runs a real regex per row; on corpus-wide
  * tokenize passes (set-sim join, budget fill, PMI counting, inverted
  * index) the regex machinery dominates the scan. Java's default `\s`
  * is six ASCII bytes, none of which occur inside a UTF-8 multi-byte
  * sequence, so one byte walk reproduces the EXACT `split(\s+, -1)`
  * boundary semantics ([[GraftShingleHashes]]'s proven contract):
  * maximal whitespace runs separate tokens, whitespace-prefixed text
  * yields a leading empty token, whitespace-suffixed text a trailing
  * empty token, and the empty string one empty token. Tokens are
  * zero-copy slices of the input's byte buffer (`UTF8String.fromBytes`
  * with offsets), so the kernel allocates one array + one UTF8String
  * header per token and no intermediate strings.
  *
  * TokensParitySpec pins kernel == `split(text, '\\s+')` on the edge
  * battery (empties, runs, multi-byte, non-\s Unicode spaces) and a
  * random fuzz corpus; every oracle keeps the `string_split_regex`
  * twin unchanged because the semantics are identical.
  */
case class GraftTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("graft_tokens needs a string argument")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_tokens"

  override def nullSafeEval(t: Any): Any =
    GraftTokens.tokens(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.plans.GraftTokens.tokens($t)")

  override protected def withNewChildInternal(newChild: Expression): GraftTokens =
    copy(child = newChild)
}

object GraftTokens {

  /** Java regex `\s` without UNICODE flags: exactly these six bytes. */
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def tokens(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var out = new Array[Any](math.max(8, len / 4 + 2))
    var nTok = 0
    @inline def push(start: Int, end: Int): Unit = {
      if (nTok == out.length)
        out = java.util.Arrays.copyOf(
          out.asInstanceOf[Array[AnyRef]], nTok * 2).asInstanceOf[Array[Any]]
      out(nTok) = UTF8String.fromBytes(bytes, start, end - start)
      nTok += 1
    }
    var i = 0
    var tokStart = 0
    while (i < len) {
      if (isWs(bytes(i))) {
        push(tokStart, i) // token ended (possibly the empty leading token)
        i += 1
        while (i < len && isWs(bytes(i))) i += 1 // \s+ greedy
        tokStart = i
      } else {
        i += 1
      }
    }
    push(tokStart, len) // final token — empty when text ends in whitespace
    if (nTok == out.length) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], nTok).asInstanceOf[Array[Any]])
  }
}
