package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // 40 distinct filler tokens — no accidental 3-shingle repeats
  private def filler(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("a shared passage flags one merged span in both docs, exact bounds") {
    val passage = "p0 p1 p2 p3 p4 p5 p6 p7" // 8 tokens, shared
    val docs = Seq(
      (1L, s"${filler("a", 5)} $passage ${filler("b", 5)}"),
      (2L, s"${filler("c", 3)} $passage")).toDF("doc_id", "text")
    val spans = SpanDedup.dupSpans(docs, "doc_id", "text", 3)
      .as[(Long, Int, Int)].collect.toSeq.sortBy(_._1)
    // doc 1: passage occupies tokens [5, 13); every 3-shingle inside it is
    // shared, so flagged starts are 5..10 and the merged span is [5, 13)
    assert(spans === Seq((1L, 5, 13), (2L, 3, 11)))
  }

  test("spanReportIncremental ≡ full spanReport filtered to batch docs, " +
      "across batch↔warehouse, batch↔batch, and warehouse-only dups (r10)") {
    val passage = "p0 p1 p2 p3 p4 p5 p6 p7"
    val bpass = "q0 q1 q2 q3 q4 q5"
    val wpass = "w0 w1 w2 w3 w4"
    val docs = Seq(
      (1L, s"${filler("a", 5)} $passage ${filler("b", 5)}"),   // wh, shares with batch 2
      (3L, s"${filler("c", 6)} $wpass ${filler("d", 6)}"),     // wh, shares with wh 5 ONLY
      (5L, s"${filler("e", 4)} $wpass ${filler("f", 4)}"),     // wh
      (2L, s"${filler("g", 3)} $passage"),                     // batch ← wh dup
      (4L, s"$bpass ${filler("h", 5)}"),                       // batch ← batch dup
      (6L, s"${filler("i", 2)} $bpass"),                       // batch
      (8L, filler("j", 12)))                                   // batch, clean
      .toDF("doc_id", "text")
    val isBatch = col("doc_id") % 2 === 0
    val incr = SpanDedup.spanReportIncremental(
        SpanDedup.shingleHashCounts(docs.filter(!isBatch), "text", 3),
        docs.filter(isBatch), "doc_id", "text", 3)
      .as[(Long, Long, Long, Long)].collect().toMap2
    val full = SpanDedup.spanReport(docs, "doc_id", "text", 3)
      .filter(col("doc_id") % 2 === 0)
      .as[(Long, Long, Long, Long)].collect().toMap2
    assert(incr === full)
    // batch↔warehouse dup found, batch↔batch dup found, clean doc zero,
    // and the warehouse-only dup (3,5) never leaks into the answer
    assert(incr(2L)._1 > 0 && incr(4L)._1 > 0 && incr(6L)._1 > 0)
    assert(incr(8L) === ((0L, 0L, 0L)))
    assert(!incr.contains(3L) && !incr.contains(5L))
  }

  private implicit class Tup4Ops(rows: Array[(Long, Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long, Long)] =
      rows.map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
  }

  test("two separated shared passages stay two islands; back-to-back merge") {
    val p1 = "x0 x1 x2 x3"
    val p2 = "y0 y1 y2 y3"
    val docs = Seq(
      (1L, s"$p1 ${filler("m", 6)} $p2"),      // separated: two spans
      (2L, s"$p1 $p2"),                        // adjacent in doc 2
      (3L, s"${filler("z", 4)} $p1 $p2 ${filler("w", 4)}")).toDF("doc_id", "text")
    val rep = SpanDedup.spanReport(docs, "doc_id", "text", 3)
      .as[(Long, Long, Long, Long)].collect.toSeq.sortBy(_._1)
    val byDoc = rep.map(r => r._1 -> r).toMap
    assert(byDoc(1L)._2 === 2L) // two islands
    // docs 2/3 share the CONCATENATION p1+p2 too (the junction shingles
    // x2 x3 y0 etc. appear in both), so their spans merge into one
    assert(byDoc(2L)._2 === 1L && byDoc(2L)._3 === 8L)
    assert(byDoc(3L)._2 === 1L && byDoc(3L)._3 === 8L)
  }

  test("within-doc repetition counts as duplication") {
    val docs = Seq(
      (1L, s"r0 r1 r2 ${filler("u", 5)} r0 r1 r2")).toDF("doc_id", "text")
    val spans = SpanDedup.dupSpans(docs, "doc_id", "text", 3)
      .as[(Long, Int, Int)].collect.toSeq.sortBy(_._2)
    assert(spans === Seq((1L, 0, 3), (1L, 8, 11)))
  }

  test("corpus with no repeats reports all zeros, every doc present") {
    val docs = Seq((1L, filler("a", 10)), (2L, filler("b", 10))).toDF("doc_id", "text")
    val rep = SpanDedup.spanReport(docs, "doc_id", "text", 3)
      .as[(Long, Long, Long, Long)].collect.toSeq
    assert(rep.size === 2 && rep.forall(r => r._2 == 0L && r._3 == 0L && r._4 == 0L))
  }

  test("removeSpans cuts exactly the flagged tokens and rebuilds the rest") {
    val passage = "p0 p1 p2 p3 p4"
    val d1 = s"${filler("a", 4)} $passage ${filler("b", 3)}"
    val d2 = s"$passage ${filler("c", 6)}"
    val out = SpanDedup.removeSpans(
      Seq((1L, d1), (2L, d2)).toDF("doc_id", "text"), "doc_id", "text", 3)
      .as[(Long, String, Long)].collect.toSeq.sortBy(_._1)
    def md5s(s: String) =
      Seq(s).toDF("s").select(md5(col("s"))).head().getString(0)
    assert(out === Seq(
      (1L, md5s(s"${filler("a", 4)} ${filler("b", 3)}"), 5L),
      (2L, md5s(filler("c", 6)), 5L)))
  }

  test("removeSpans leaves a repeat-free corpus byte-identical") {
    val docs = Seq((1L, filler("u", 9)), (2L, filler("v", 7))).toDF("doc_id", "text")
    val out = SpanDedup.removeSpans(docs, "doc_id", "text", 3)
      .join(docs.select(col("doc_id"), md5(col("text")).as("orig")), "doc_id")
    assert(out.filter(col("cleaned_md5") =!= col("orig") ||
      col("n_removed") =!= 0L).count() === 0)
  }

  test("exact confirm pass survives forced hash collisions; default = exact on collision-free keys") {
    // Fold the shingle hash into 2 buckets: nearly every position becomes
    // a pass-1 candidate, and only the confirm pass separates true
    // repeats from collision noise. Result must be bit-identical to the
    // full-width key on a corpus with one real shared passage.
    val passage = "q0 q1 q2 q3 q4 q5"
    val docs = Seq(
      (1L, s"${filler("a", 7)} $passage ${filler("b", 4)}"),
      (2L, s"$passage ${filler("c", 9)}"),
      (3L, filler("d", 12))).toDF("doc_id", "text")
    def run(buckets: Long, exact: Boolean) =
      SpanDedup.dupSpansImpl(docs, "doc_id", "text", 3, buckets, exact)
        .as[(Long, Int, Int)].collect.toSeq.sorted
    val truth = Seq((1L, 7, 13), (2L, 0, 6))
    assert(run(0L, exact = true) === truth)
    assert(run(0L, exact = false) === truth) // full-width key: no collisions
    assert(run(2L, exact = true) === truth)
    assert(run(1L, exact = true) === truth) // ONE bucket: worst case
    // and the coarse key WITHOUT confirm genuinely over-flags — the
    // contract difference the exact variant exists for
    assert(run(1L, exact = false).size > truth.size)
  }

  test("hash kernel token boundaries match split(\\s+, -1) on edge-case whitespace") {
    // Same dup detection through graft_shingle_hashes as through the
    // string kernel on texts with leading/trailing/repeated whitespace
    // and tabs: token positions must line up for spans to agree.
    val docs = Seq(
      (1L, "  e0 e1\te2  e3 e0 e1\te2"),  // leading ws → empty first token
      (2L, "e0 e1 e2 trail0 trail1 "),    // trailing ws → empty last token
      (3L, "x0  x1\n x2")).toDF("doc_id", "text")
    val viaHash = SpanDedup.dupSpans(docs, "doc_id", "text", 3)
      .as[(Long, Int, Int)].collect.toSeq.sorted
    // doc 1 tokens: ["", e0, e1, e2, e3, e0, e1, e2] — shingle
    // (e0,e1,e2) occurs at doc-1 positions 1 and 5 AND doc-2 position 0
    // (its tokens are [e0,e1,e2,trail0,trail1,""]), so three spans; the
    // positions only line up if the byte-walk kept the empty leading /
    // trailing tokens exactly where split(\s+, -1) puts them
    assert(viaHash === Seq((1L, 1, 4), (1L, 5, 8), (2L, 0, 3)))
  }

  test("docs shorter than n yield no shingles and no spans") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    assert(SpanDedup.dupSpans(docs, "doc_id", "text", 3).count() === 0)
    assert(SpanDedup.spanReport(docs, "doc_id", "text", 3).count() === 3)
  }
}
