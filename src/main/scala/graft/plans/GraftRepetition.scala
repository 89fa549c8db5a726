package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Gopher repetition battery (Rae et al. 2021, "Scaling Language
  * Models: ... Gopher", Table A1 — the standard pretraining quality
  * filters every large corpus pipeline applies), computed in ONE
  * row-local pass: per document,
  *
  *   `[top2, top3, top4, dup5, dup6, dup7, dup8, dup9, dup10]`
  *
  * where for n = 2..4 `topN` is the character mass of the MOST FREQUENT
  * n-gram (`max_count × gram_len`, ties on count broken by the LONGEST
  * such gram — a deterministic total rule both engines can replay), and
  * for n = 5..10 `dupN` is the character mass of all DUPLICATED n-gram
  * occurrences (`Σ count·len over grams with count ≥ 2`). Gram length
  * is CODE POINTS including the joining spaces — the unit Spark's
  * `length()` and DuckDB's `length()` agree on. Downstream divides by
  * `length(text)` for Gopher's fractions; the raw masses stay integers
  * here so the kernel output is hash-exact and the fraction rule
  * (fixed-point `div`) lives in one place, the query.
  *
  * Tokens are the engine's whitespace contract ([[GraftShingles]] —
  * Java `split("\\s+", -1)` verbatim); n-grams join with single spaces,
  * so a DuckDB twin counting `list_transform` grams over
  * `string_split_regex` hash-matches.
  *
  * Why a kernel and not a groupBy: the statistic is WITHIN-document —
  * shuffling every (doc, gram) pair to count per-doc duplicates pays a
  * corpus-wide exchange for a row-local property (the q75/q64/q39
  * argument). At 100 TB this is a pure map over the scan; the 9 orders
  * share one token array and one reused hash map.
  */
case class GraftRepetition(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("graft_repetition needs a string argument")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_repetition"

  override def nullSafeEval(input: Any): Any =
    GraftRepetition.battery(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftRepetition.battery($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftRepetition =
    copy(child = newChild)
}

object GraftRepetition {
  private val Whitespace = java.util.regex.Pattern.compile("\\s+")
  val TopOrders: Range = 2 to 4
  val DupOrders: Range = 5 to 10

  def battery(text: UTF8String): ArrayData = {
    val toks = Whitespace.split(text.toString, -1)
    val out = new Array[Any](TopOrders.size + DupOrders.size)
    val counts = new java.util.HashMap[String, Long]()
    val sb = new java.lang.StringBuilder()
    var slot = 0
    var n = TopOrders.head
    while (n <= DupOrders.last) {
      counts.clear()
      var p = 0
      while (p <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(p + j))
          j += 1
        }
        val k = sb.toString
        counts.put(k, counts.getOrDefault(k, 0L) + 1L)
        p += 1
      }
      var acc = 0L
      if (n <= TopOrders.last) {
        // top: max count, then longest gram among that count
        var maxC = 0L
        var maxLen = 0L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val len = gramLen(e.getKey)
          if (e.getValue > maxC) { maxC = e.getValue; maxLen = len }
          else if (e.getValue == maxC && len > maxLen) maxLen = len
        }
        acc = maxC * maxLen
      } else {
        // dup: total character mass of duplicated occurrences
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue >= 2L)
            acc += e.getValue * gramLen(e.getKey)
        }
      }
      out(slot) = acc
      slot += 1
      n += 1
    }
    new GenericArrayData(out)
  }

  /** Code-point length of a gram string — the unit Spark `length()`
    * and DuckDB `length()` agree on (NOT UTF-16 String.length). */
  private def gramLen(g: String): Long =
    g.codePointCount(0, g.length).toLong
}
