package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern blocklist statistics in ONE text pass — the Aho-Corasick
  * automaton (Aho & Corasick 1975) applied to the corpus-hygiene gate
  * every pretraining pipeline runs: banned phrases, boilerplate markers,
  * policy strings. `graft_blocklist(text, patterns)` returns
  *
  *   `[n_hits, n_patterns, banned_chars, cnt_0, ..., cnt_{P-1}]`
  *
  * where `cnt_p` counts the NON-OVERLAPPING leftmost-greedy occurrences
  * of pattern p as a raw SUBSTRING of the text (Python `str.count` /
  * SQL `(length(t) - length(replace(t, p, ''))) / length(p)` semantics —
  * the form a DuckDB twin can vectorize, which keeps the cross-engine
  * compare honest), `n_hits = Σ cnt_p`, `n_patterns` counts patterns
  * with ≥ 1 occurrence, and `banned_chars = Σ cnt_p · length(p)` with
  * pattern length in CODE POINTS (the unit both engines' `length()`
  * agree on).
  *
  * Substring semantics, not token semantics, on purpose: blocklists are
  * phrases ("batch batch"), partial words, and markup fragments — the
  * [[GraftKeywordCounts]] token-set kernel cannot express them. The
  * automaton makes the scan O(len + matches) TOTAL regardless of the
  * pattern count, where the naive shape is P separate `contains`/
  * `locate`/`replace` passes — at 100 TB with a thousand-entry
  * blocklist that is the difference between one pass and a thousand.
  * Greedy-leftmost non-overlap is enforced per pattern with a
  * last-match-end cursor: Aho-Corasick emits matches in increasing end
  * order, and for a fixed pattern increasing end implies increasing
  * start, so "count if start > last end" replays the leftmost-greedy
  * scan exactly.
  *
  * The pattern argument must be a foldable `array<string>` literal —
  * the automaton is built once per expression instance (driver side,
  * shipped inside the serialized plan) and referenced from generated
  * code; the per-row cost is one goto-graph walk. Patterns must be
  * non-empty and distinct (a duplicate pattern would double-count the
  * same occurrences into `n_hits`).
  *
  * The statistic is row-local — a pure map over the scan, zero shuffle
  * (the q162/q75/q39 argument). Position arithmetic runs on UTF-16
  * units while the occurrence COUNTS are unit-independent (an
  * occurrence is a substring equality — the same set of matches
  * whether indexed by code unit or code point), so DuckDB's
  * code-point `replace` twin hash-matches.
  */
case class GraftBlocklist(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure("graft_blocklist needs a string text argument")
    else if (right.dataType != ArrayType(StringType) &&
      right.dataType != ArrayType(StringType, containsNull = false))
      TypeCheckResult.TypeCheckFailure(
        "graft_blocklist needs an array<string> pattern list, got " +
          right.dataType.simpleString)
    else if (!right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "the pattern list must be a constant — pass it as a literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_blocklist"

  @transient private lazy val automaton: AhoCorasick = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val pats = Array.tabulate(arr.numElements()) { i =>
      require(!arr.isNullAt(i), "graft_blocklist patterns must be non-null")
      arr.getUTF8String(i).toString
    }
    require(pats.forall(_.nonEmpty), "graft_blocklist patterns must be non-empty")
    require(pats.distinct.length == pats.length,
      "graft_blocklist patterns must be distinct")
    new AhoCorasick(pats)
  }

  override def nullSafeEval(text: Any, pats: Any): Any =
    GraftBlocklist.stats(text.asInstanceOf[UTF8String], automaton)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("graftAc", automaton,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, (text, _) =>
      s"${ev.value} = graft.plans.GraftBlocklist.stats($text, $ac);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftBlocklist =
    copy(left = newLeft, right = newRight)
}

object GraftBlocklist {

  /** One automaton walk; see the class doc for the count semantics. */
  def stats(text: UTF8String, ac: AhoCorasick): ArrayData = {
    val s = text.toString
    val p = ac.patternCount
    val counts = new Array[Long](p)
    val lastEnd = new Array[Int](p)
    java.util.Arrays.fill(lastEnd, -1)
    var state = 0
    var i = 0
    while (i < s.length) {
      state = ac.step(state, s.charAt(i))
      val outs = ac.outputs(state)
      var j = 0
      while (j < outs.length) {
        val pat = outs(j)
        if (i - ac.lengthUtf16(pat) + 1 > lastEnd(pat)) {
          counts(pat) += 1
          lastEnd(pat) = i
        }
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](3 + p)
    var hits = 0L
    var matched = 0L
    var chars = 0L
    var k = 0
    while (k < p) {
      hits += counts(k)
      if (counts(k) > 0) matched += 1
      chars += counts(k) * ac.lengthCodePoints(k)
      out(3 + k) = counts(k)
      k += 1
    }
    out(0) = hits
    out(1) = matched
    out(2) = chars
    new GenericArrayData(out)
  }
}

/** Aho-Corasick goto/fail/output automaton over UTF-16 units. Built once
  * per expression instance from the literal pattern list; immutable and
  * serializable (it ships inside the physical plan). Transitions are
  * flattened to per-state sorted char/next arrays (binary search, no
  * boxing in the scan); output links are pre-flattened per state (own
  * pattern ids ++ outputs reachable through fail links), so the scan
  * never walks the fail chain for outputs. The fail-chain walk inside
  * `step` is the classic amortized-O(1) form: the automaton depth only
  * grows one level per input char, and every fail jump strictly
  * decreases it.
  */
final class AhoCorasick(patterns: Array[String]) extends Serializable {

  val patternCount: Int = patterns.length
  private val lenU16: Array[Int] = patterns.map(_.length)
  private val lenCp: Array[Int] =
    patterns.map(p => p.codePointCount(0, p.length))

  def lengthUtf16(p: Int): Int = lenU16(p)
  def lengthCodePoints(p: Int): Int = lenCp(p)

  // flattened automaton: per state, sorted transition chars + targets,
  // the fail link, and the resolved output set
  private val (chars, nexts, fail, outs) = AhoCorasick.build(patterns)

  def outputs(state: Int): Array[Int] = outs(state)

  def step(state: Int, c: Char): Int = {
    var s = state
    while (true) {
      val cs = chars(s)
      val idx = java.util.Arrays.binarySearch(cs, c)
      if (idx >= 0) return nexts(s)(idx)
      if (s == 0) return 0
      s = fail(s)
    }
    0 // unreachable
  }
}

private object AhoCorasick {

  private final class Node {
    val next = new java.util.TreeMap[Character, Integer]()
    var ends: List[Int] = Nil
    var fail: Int = 0
  }

  /** Trie + BFS fail links, flattened to parallel arrays. */
  def build(patterns: Array[String])
      : (Array[Array[Char]], Array[Array[Int]], Array[Int], Array[Array[Int]]) = {
    val nodes = scala.collection.mutable.ArrayBuffer(new Node)
    var pi = 0
    while (pi < patterns.length) {
      val pat = patterns(pi)
      var node = 0
      var i = 0
      while (i < pat.length) {
        val c = Character.valueOf(pat.charAt(i))
        val t = nodes(node).next.get(c)
        if (t == null) {
          nodes += new Node
          nodes(node).next.put(c, nodes.length - 1)
          node = nodes.length - 1
        } else node = t.intValue()
        i += 1
      }
      nodes(node).ends = pi :: nodes(node).ends
      pi += 1
    }
    // BFS fail links: fail(child of root) = root; otherwise follow the
    // parent's fail chain to the deepest proper-suffix state with the
    // same outgoing char.
    val queue = new java.util.ArrayDeque[Integer]()
    nodes(0).next.forEach((_, child) => queue.add(child))
    while (!queue.isEmpty) {
      val n = queue.poll().intValue()
      nodes(n).next.forEach { (c, child) =>
        var f = nodes(n).fail
        var t = nodes(f).next.get(c)
        while (t == null && f != 0) {
          f = nodes(f).fail
          t = nodes(f).next.get(c)
        }
        nodes(child.intValue()).fail =
          if (t != null && t.intValue() != child.intValue()) t.intValue() else 0
        queue.add(child)
      }
    }
    val chars = nodes.map { n =>
      val cs = new Array[Char](n.next.size)
      var i = 0
      n.next.forEach((c, _) => { cs(i) = c.charValue(); i += 1 })
      cs // TreeMap iteration is key-sorted, so cs is sorted
    }.toArray
    val nexts = nodes.map { n =>
      val ts = new Array[Int](n.next.size)
      var i = 0
      n.next.forEach((_, t) => { ts(i) = t.intValue(); i += 1 })
      ts
    }.toArray
    val fail = nodes.map(_.fail).toArray
    val outs = Array.tabulate(nodes.length) { n0 =>
      val acc = scala.collection.mutable.ArrayBuffer.empty[Int]
      var n = n0
      while (n != 0) { // root holds no patterns (patterns are non-empty)
        acc ++= nodes(n).ends
        n = nodes(n).fail
      }
      acc.sorted.toArray
    }
    (chars, nexts, fail, outs)
  }
}
