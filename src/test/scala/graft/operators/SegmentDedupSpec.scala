package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: literal global first-occurrence fold over
    * the docs in (id, pos) order, plain Scala collections. */
  private def reference(docs: Seq[(Long, String)], delim: String,
                        join: String): Map[Long, (String, Long, Long)] = {
    val seen = scala.collection.mutable.Set[String]()
    docs.sortBy(_._1).map { case (id, text) =>
      val segs = text.split(delim, -1).toSeq.filter(_.nonEmpty)
      val (kept, removed) = segs.foldLeft((Vector[String](), 0L)) {
        case ((k, r), s) =>
          if (seen.add(s)) (k :+ s, r) else (k, r + 1L)
      }
      id -> ((kept.mkString(join), segs.size.toLong, removed))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], delim: String,
                  join: String = "\n"): Map[Long, (String, Long, Long)] =
    SegmentDedup
      .dedupSegments(docs.toDF("doc_id", "text"), "doc_id", "text", delim, join)
      .as[(Long, String, Long, Long)].collect()
      .map { case (id, t, n, r) => id -> ((t, n, r)) }.toMap

  test("paragraph dedup: boilerplate paragraphs vanish after their global " +
      "first occurrence; unique content stays, in order") {
    val boiler = "Accept our cookies to continue."
    val docs = Seq(
      1L -> s"$boiler\n\nAlpha unique body.\n\nShared footer text.",
      2L -> s"Beta unique body.\n\n$boiler\n\nShared footer text.",
      3L -> s"$boiler\n\nShared footer text.")
    val got = run(docs, "\n{2,}", "\n\n")
    assert(got === reference(docs, "\n{2,}", "\n\n"))
    assert(got(1L) === ((s"$boiler\n\nAlpha unique body.\n\nShared footer text.", 3L, 0L)))
    assert(got(2L) === (("Beta unique body.", 3L, 2L)))
    assert(got(3L) === (("", 2L, 2L)), "a doc that is pure boilerplate empties out")
  }

  test("within-doc repeats are removed too (only the first survives)") {
    val docs = Seq(7L -> "x\ny\nx\nz\ny")
    assert(run(docs, "\n") === Map(7L -> (("x\ny\nz", 5L, 2L))))
  }

  test("blank segments are dropped, never deduplicated") {
    // 'a\n\n\nb': splitting on single \n yields blanks between — they
    // disappear from the rebuild but do not consume the dedup slot
    val docs = Seq(1L -> "a\n\n\nb", 2L -> "\n\nc\n\n")
    val got = run(docs, "\n")
    assert(got(1L) === (("a\nb", 2L, 0L)))
    assert(got(2L) === (("c", 1L, 0L)))
  }

  test("matches the reference on a random corpus and is invariant to " +
      "input partitioning") {
    val rnd = new scala.util.Random(167)
    val lines = Vector.tabulate(30)(i => s"line body $i")
    val docs = (1L to 60L).map { id =>
      id -> Seq.fill(2 + rnd.nextInt(8))(lines(rnd.nextInt(lines.size)))
        .mkString("\n")
    }
    val want = reference(docs, "\n", "\n")
    assert(run(docs, "\n") === want)
    val shuffled = SegmentDedup.dedupSegments(
        docs.toDF("doc_id", "text").repartition(7, col("text")),
        "doc_id", "text", "\n")
      .as[(Long, String, Long, Long)].collect()
      .map { case (id, t, n, r) => id -> ((t, n, r)) }.toMap
    assert(shuffled === want,
      "(doc_id, pos) ordering makes the winner partitioning-independent")
  }

  /** Reference for the incremental form: the same fold, seeded with
    * every warehouse segment before the batch plays. */
  private def referenceIncr(warehouse: Seq[String], docs: Seq[(Long, String)],
                            delim: String, join: String)
      : Map[Long, (String, Long, Long)] = {
    val seen = scala.collection.mutable.Set[String]()
    warehouse.foreach(t => t.split(delim, -1).filter(_.nonEmpty).foreach(seen.add))
    docs.sortBy(_._1).map { case (id, text) =>
      val segs = text.split(delim, -1).toSeq.filter(_.nonEmpty)
      val (kept, removed) = segs.foldLeft((Vector[String](), 0L)) {
        case ((k, r), s) =>
          if (seen.add(s)) (k :+ s, r) else (k, r + 1L)
      }
      id -> ((kept.mkString(join), segs.size.toLong, removed))
    }.toMap
  }

  private def runIncr(wh: Seq[String], docs: Seq[(Long, String)],
                      delim: String): Map[Long, (String, Long, Long)] =
    SegmentDedup.dedupSegmentsIncremental(
        wh.toDF("text").withColumn("doc_id", lit(0L)),
        docs.toDF("doc_id", "text"), "doc_id", "text", delim)
      .as[(Long, String, Long, Long)].collect()
      .map { case (id, t, n, r) => id -> ((t, n, r)) }.toMap

  test("incremental dedup: warehouse-seen segments die on arrival, " +
      "batch-internal dedup still applies, matches the seeded reference") {
    val wh = Seq("old boilerplate\nwarehouse only line", "old boilerplate")
    val batch = Seq(
      10L -> "old boilerplate\nfresh alpha",
      11L -> "fresh alpha\nfresh beta\nfresh beta",
      12L -> "warehouse only line")
    val got = runIncr(wh, batch, "\n")
    assert(got === referenceIncr(wh, batch, "\n", "\n"))
    assert(got(10L) === (("fresh alpha", 2L, 1L)))
    assert(got(11L) === (("fresh beta", 3L, 2L)),
      "within-batch repeats and cross-doc batch repeats both die")
    assert(got(12L) === (("", 1L, 1L)))
  }

  test("an empty warehouse makes the incremental form identical to the " +
      "plain operator on the batch") {
    val rnd = new scala.util.Random(171)
    val lines = Vector.tabulate(20)(i => s"line $i")
    val docs = (1L to 40L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(6))(lines(rnd.nextInt(lines.size)))
        .mkString("\n")
    }
    assert(runIncr(Seq(), docs, "\n") === run(docs, "\n"))
  }

  test("incremental plan: the membership join and the first-occurrence " +
      "window share ONE batch-side hash exchange") {
    val df = SegmentDedup.dedupSegmentsIncremental(
      Seq("a\nb").toDF("text"), Seq((1L, "a\nc")).toDF("doc_id", "text"),
      "doc_id", "text", "\n")
    val p = df.queryExecution.executedPlan.toString
    val hExchanges = p.linesIterator
      .count(_.contains("Exchange hashpartitioning(__h"))
    assert(hExchanges <= 2,
      s"expected one __h exchange per side (window must reuse the join's):\n$p")
    assert(p.contains("- Window ["), s"first-occurrence window missing:\n$p")
  }

  test("conservation: kept + removed = nonblank segments, and total kept " +
      "equals total distinct segments across the corpus") {
    val rnd = new scala.util.Random(42)
    val lines = Vector.tabulate(12)(i => s"seg$i")
    val docs = (1L to 40L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(6))(lines(rnd.nextInt(lines.size)))
        .mkString("\n")
    }
    val got = run(docs, "\n")
    docs.foreach { case (id, text) =>
      val n = text.split("\n", -1).count(_.nonEmpty)
      val (t, segs, removed) = got(id)
      assert(segs === n.toLong)
      val keptCount = if (t.isEmpty) 0 else t.split("\n", -1).length
      assert(keptCount + removed === segs, s"doc $id")
    }
    val distinct = docs.flatMap(_._2.split("\n", -1)).filter(_.nonEmpty).distinct.size
    val totalKept = got.values.map { case (t, _, _) =>
      if (t.isEmpty) 0 else t.split("\n", -1).length
    }.sum
    assert(totalKept === distinct,
      "exactly one survivor per distinct segment corpus-wide")
  }
}
