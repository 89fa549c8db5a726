package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The Aho-Corasick blocklist kernel's count contract: non-overlapping
  * leftmost-greedy substring occurrences per pattern (Python str.count
  * semantics — the same arithmetic as the DuckDB replace-trick the q163
  * oracle runs), aggregated to [n_hits, n_patterns, banned_chars,
  * per-pattern counts]. Pinned against an independent String.indexOf
  * reference on crafted edges and fuzzed word soup.
  */
class GraftBlocklistSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: Python str.count semantics via indexOf. */
  private def refCount(text: String, pat: String): Long = {
    var n = 0L
    var from = 0
    var i = text.indexOf(pat, from)
    while (i >= 0) {
      n += 1
      from = i + pat.length
      i = text.indexOf(pat, from)
    }
    n
  }

  private def refStats(text: String, pats: Seq[String]): Seq[Long] = {
    val counts = pats.map(p => refCount(text, p))
    Seq(counts.sum,
      counts.count(_ > 0).toLong,
      counts.zip(pats).map { case (c, p) =>
        c * p.codePointCount(0, p.length)
      }.sum) ++ counts
  }

  private def kernel(texts: Seq[String], pats: Seq[String]): Seq[Seq[Long]] =
    texts.toDF("text")
      .select(call_function("graft_blocklist", col("text"), typedLit(pats)))
      .collect()
      .map(_.getSeq[Long](0).toSeq)
      .toSeq

  private def check(texts: Seq[String], pats: Seq[String]): Unit = {
    val got = kernel(texts, pats)
    val want = texts.map(t => refStats(t, pats))
    assert(got === want, s"patterns=$pats")
  }

  test("prefix-chain patterns count independently (he/she/hers shape)") {
    check(
      Seq("ushers say she is here", "hers hers she", "", "h"),
      Seq("he", "she", "hers", "h"))
  }

  test("self-overlapping pattern counts leftmost-greedy, not all matches") {
    // "batch batch batch" contains "batch batch" at two starts (0 and 6)
    // but greedy non-overlap counts ONE — the replace-trick arithmetic
    check(
      Seq("batch batch batch", "batch batch batch batch", "aaa", "aaaa"),
      Seq("batch batch", "aa"))
    // the full-phrase pattern still fires alongside its prefix
    check(Seq("batch batch batch x batch batch"),
      Seq("batch batch", "batch batch batch"))
  }

  test("mid-word fragments, absent patterns, and the zero row") {
    val got = kernel(Seq("slow window row", "nothing here"),
      Seq("ow", "gdpr"))
    assert(got(0) === Seq(3L, 1L, 6L, 3L, 0L)) // ow in slow/window/row
    assert(got(1) === Seq(0L, 0L, 0L, 0L, 0L))
  }

  test("banned_chars counts pattern length in code points") {
    // U+1D49A (mathematical script g) is 2 UTF-16 units, 1 code point
    val g = new String(Character.toChars(0x1D49A))
    val pat = s"x${g}y" // 3 code points, 4 UTF-16 units
    val got = kernel(Seq(s"a x${g}y b x${g}y"), Seq(pat))
    assert(got.head === Seq(2L, 1L, 6L, 2L))
  }

  test("null text yields null, empty text yields zeros") {
    val rows = Seq[(java.lang.Long, String)]((1L, null), (2L, ""))
      .toDF("id", "text")
      .select(call_function("graft_blocklist", col("text"), typedLit(Seq("x"))))
      .collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getSeq[Long](0) === Seq(0L, 0L, 0L, 0L))
  }

  test("duplicate / empty patterns are rejected") {
    intercept[Exception] { kernel(Seq("a"), Seq("x", "x")) }
    intercept[Exception] { kernel(Seq("a"), Seq("x", "")) }
  }

  test("fuzz: kernel matches the indexOf reference on random word soup") {
    val rnd = new scala.util.Random(163)
    val vocab = Seq("slow", "batch", "merge", "window", "row", "a", "ow")
    val pats = Seq("slow", "batch batch", "batch batch batch", "ow",
      "merge slow", "a a", "row")
    val texts = Seq.fill(300) {
      Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    check(texts, pats)
  }

  test("single-pattern automaton degenerates to indexOf counting") {
    check(Seq("abababab", "bbbb", "ab"), Seq("abab"))
  }
}
