package graft.plans

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** On-demand JSON scalar extraction: the long value of one TOP-LEVEL
  * field, parsed by a streaming token walk over the raw bytes — no tree
  * is ever built. This is the per-query answer to the open-JSON scan gap
  * vs vectorized engines (`from_json` materializes an InternalRow per
  * document even for a single-field schema); the ingest-time answer
  * (parse once, store typed — `x_json_*` bench lines) remains the
  * warehouse default.
  *
  * Semantics mirror `from_json(json, struct<f: long>).getField(f)` and
  * are pinned to it by JsonKernelSpec: null on malformed or truncated
  * documents (the walk validates the whole top-level object, skipping
  * nested children), null when the field is absent, JSON-null, or not an
  * integral number; repeated fields keep the LAST occurrence, nested
  * occurrences of the same name never match.
  */
case class GraftJsonLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("graft_json_long needs a string json argument")
    else if (right.dataType != StringType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("graft_json_long needs a literal field name")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_json_long"

  override def nullSafeEval(json: Any, field: Any): Any = {
    val r = GraftJsonLong.extract(
      json.asInstanceOf[UTF8String], field.asInstanceOf[UTF8String])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (j, f) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.plans.GraftJsonLong.extract($j, $f);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftJsonLong =
    copy(left = newLeft, right = newRight)
}

object GraftJsonLong {
  private val factory = new JsonFactory()

  /** Null = malformed / truncated / absent / non-integral. */
  def extract(json: UTF8String, field: UTF8String): java.lang.Long = {
    val f = field.toString
    try {
      val p = factory.createParser(json.getBytes)
      try {
        if (p.nextToken() != JsonToken.START_OBJECT) return null
        var result: java.lang.Long = null
        var token = p.nextToken()
        while (token == JsonToken.FIELD_NAME) {
          val name = p.currentName()
          token = p.nextToken()
          if (name == f) {
            result =
              if (token == JsonToken.VALUE_NUMBER_INT) java.lang.Long.valueOf(p.getLongValue)
              else null
          }
          if (token.isStructStart) p.skipChildren()
          token = p.nextToken()
        }
        // validate the full top-level object — a truncated document must
        // read as null exactly like from_json, even if the field was seen
        if (token != JsonToken.END_OBJECT) return null
        result
      } finally p.close()
    } catch { case _: Exception => null }
  }
}
