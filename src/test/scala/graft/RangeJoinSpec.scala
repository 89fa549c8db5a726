package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Binned interval join: half-open bounds, bin-spanning intervals, key
  * isolation, and equivalence to the theta-join it avoids. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("half-open [start, end) bounds with bin-spanning intervals") {
    val intervals = Seq(
      ("a", 10L, 30L, "i1"), // spans bins 1-2 at width 10
      ("a", 25L, 26L, "i2"),
      ("b", 10L, 30L, "i3")  // same window, other key
    ).toDF("key", "s", "e", "iid")
    val points = Seq(
      ("a", 10L, "p_at_start"),   // == start: included
      ("a", 29L, "p_before_end"), // end-1: included
      ("a", 30L, "p_at_end"),     // == end: excluded
      ("a", 25L, "p_mid"),
      ("b", 25L, "p_other_key")
    ).toDF("key", "t", "pid")

    val got = RangeJoin
      .intervalJoin(intervals, points, Seq("key"), "s", "e", "t", 10L)
      .select("iid", "pid").as[(String, String)].collect().toSet

    assert(got === Set(
      ("i1", "p_at_start"), ("i1", "p_before_end"), ("i1", "p_mid"),
      ("i2", "p_mid"),
      ("i3", "p_other_key")))
  }

  test("empty and inverted intervals match nothing and fan out no bins") {
    val intervals = Seq(
      ("a", 20L, 20L, "empty"),    // [20, 20) = ∅
      ("a", 30L, 10L, "inverted"), // end < start
      ("a", 10L, 12L, "ok")
    ).toDF("key", "s", "e", "iid")
    val points = Seq(("a", 11L, "p1"), ("a", 20L, "p2")).toDF("key", "t", "pid")

    val got = RangeJoin
      .intervalJoin(intervals, points, Seq("key"), "s", "e", "t", 10L)
      .select("iid", "pid").as[(String, String)].collect().toSet
    assert(got === Set(("ok", "p1")))

    // degenerate intervals must not even reach the join as candidates
    val binned = intervals.withColumn("__bin",
      explode(when($"e" > $"s",
        sequence(expr("s DIV 10"), expr("(e - 1) DIV 10"))).otherwise(array())))
    assert(binned.filter($"iid" =!= "ok").count() === 0)
  }

  test("agrees with the naive theta-join across bin widths") {
    val rnd = new scala.util.Random(7)
    val intervals = (1 to 120).map { i =>
      val s = rnd.nextInt(1000).toLong
      (s"k${i % 4}", s, s + 1 + rnd.nextInt(80), i.toLong)
    }.toDF("key", "s", "e", "iid")
    val points = (1 to 400).map(i =>
      (s"k${i % 5}", rnd.nextInt(1100).toLong, i.toLong)).toDF("key", "t", "pid")

    val naive = intervals.as("i")
      .join(points.as("p"),
        $"i.key" === $"p.key" && $"p.t" >= $"i.s" && $"p.t" < $"i.e")
      .select($"iid", $"pid")

    for (width <- Seq(1L, 7L, 64L, 2048L)) {
      val ours = RangeJoin
        .intervalJoin(intervals, points, Seq("key"), "s", "e", "t", width)
        .select("iid", "pid")
      assert(ours.exceptAll(naive).isEmpty && naive.exceptAll(ours).isEmpty,
        s"binWidth=$width diverged from theta-join")
    }
  }

  test("interval-overlap join agrees with the theta-join, duplicate-free, across widths") {
    val rnd = new scala.util.Random(13)
    val left = (1 to 100).map { i =>
      val s = rnd.nextInt(1000).toLong
      (s"k${i % 3}", s, s + 1 + rnd.nextInt(120), i.toLong)
    }.toDF("key", "as", "ae", "aid")
    val right = (1 to 100).map { i =>
      val s = rnd.nextInt(1000).toLong
      (s"k${i % 4}", s, s + 1 + rnd.nextInt(40), i.toLong)
    }.toDF("key", "bs", "be", "bid")
    val naive = left.as("a").join(right.as("b"),
        $"a.key" === $"b.key" && $"a.as" < $"b.be" && $"b.bs" < $"a.ae")
      .select($"aid", $"bid").collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(naive.nonEmpty && naive.size === naive.distinct.size)
    for (width <- Seq(1L, 9L, 50L, 4096L)) {
      val ours = RangeJoin.intervalOverlapJoin(left, right, Seq("key"),
          "as", "ae", "bs", "be", width)
        .select("aid", "bid").collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
      assert(ours.size === ours.distinct.size,
        s"binWidth=$width emitted duplicate pairs")
      assert(ours.sorted === naive.sorted, s"binWidth=$width diverged")
    }
  }

  test("interval-overlap: touching intervals do not match; empty intervals match nothing") {
    val l = Seq(("k", 0L, 10L, 1L), ("k", 50L, 50L, 2L)).toDF("key", "as", "ae", "aid")
    val r = Seq(("k", 10L, 20L, 1L), ("k", 9L, 10L, 2L), ("k", 40L, 60L, 3L))
      .toDF("key", "bs", "be", "bid")
    val got = RangeJoin.intervalOverlapJoin(l, r, Seq("key"),
        "as", "ae", "bs", "be", 8L)
      .select("aid", "bid").collect().toSeq.map(x => (x.getLong(0), x.getLong(1)))
    // [0,10) vs [10,20): touch only -> no; vs [9,10): overlap at 9 -> yes;
    // [50,50) is empty -> nothing, even inside [40,60)
    assert(got === Seq((1L, 2L)))
  }
}
