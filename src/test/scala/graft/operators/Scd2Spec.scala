package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  // (key, t, tie, attr)
  private def hist(rows: (String, Long, Long, String)*) =
    Scd2.fromChangeLog(rows.toDF("k", "t", "id", "attr"),
      Seq("k"), "t", "id", Seq("attr"))

  test("versions only where the tracked attribute changes; intervals chain") {
    val out = hist(
      ("a", 10L, 1L, "x"), ("a", 20L, 2L, "x"), ("a", 30L, 3L, "y"),
      ("a", 40L, 4L, "y"), ("a", 50L, 5L, "x"),
      ("b", 15L, 6L, "z")).orderBy("k", "version")
      .as[(String, String, Long, Long, Option[Long], Boolean)].collect.toSeq
    assert(out === Seq(
      ("a", "x", 1L, 10L, Some(30L), false),
      ("a", "y", 2L, 30L, Some(50L), false),
      ("a", "x", 3L, 50L, None, true),
      ("b", "z", 1L, 15L, None, true)))
  }

  test("null transitions version correctly (null-safe change detection)") {
    val out = hist(
      ("a", 1L, 1L, null), ("a", 2L, 2L, null), ("a", 3L, 3L, "v"),
      ("a", 4L, 4L, null))
      .orderBy("version")
      .as[(String, String, Long, Long, Option[Long], Boolean)].collect.toSeq
    assert(out.map(r => (Option(r._2), r._4, r._5)) === Seq(
      (None, 1L, Some(3L)), (Some("v"), 3L, Some(4L)), (None, 4L, None)))
  }

  test("simultaneous rows order by the tie-break deterministically") {
    val out = hist(("a", 5L, 2L, "second"), ("a", 5L, 1L, "first"))
      .orderBy("version")
      .as[(String, String, Long, Long, Option[Long], Boolean)].collect.toSeq
    assert(out.map(_._2) === Seq("first", "second"))
    assert(out.head._5 === Some(5L)) // zero-length interval, still chained
  }

  test("exactly one exchange: the change filter reuses the window's shuffle") {
    val log = (1 to 100).map(i => (s"k${i % 7}", i.toLong, i.toLong,
      s"v${i % 3}")).toDF("k", "t", "id", "attr")
    val plan = Scd2.fromChangeLog(log, Seq("k"), "t", "id", Seq("attr"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1, s"expected 1 exchange, plan:\n$plan")
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("k"), col("attr"), col("version"), col("valid_from"),
      col("valid_to"), col("is_current"))
      .as[(String, String, Long, Long, Option[Long], Boolean)].collect.toSet

  test("applyIncrement equals the full rebuild on random splits, chained") {
    val rnd = new scala.util.Random(23)
    val log = (1 to 600).map { i =>
      (s"k${rnd.nextInt(25)}", (i * 10).toLong, i.toLong, s"v${rnd.nextInt(3)}")
    }
    def df(rows: Seq[(String, Long, Long, String)]) =
      rows.toDF("k", "t", "id", "attr")
    val full = canon(Scd2.fromChangeLog(df(log), Seq("k"), "t", "id", Seq("attr")))
    for (cut <- Seq(100L, 3000L, 5990L)) {
      val h = Scd2.fromChangeLog(df(log.filter(_._2 <= cut)), Seq("k"), "t", "id", Seq("attr"))
      val inc = Scd2.applyIncrement(h, df(log.filter(_._2 > cut)),
        Seq("k"), "t", "id", Seq("attr"))
      assert(canon(inc) === full, s"cut=$cut")
    }
    // chained: two increments in sequence
    val h1 = Scd2.fromChangeLog(df(log.filter(_._2 <= 2000)), Seq("k"), "t", "id", Seq("attr"))
    val h2 = Scd2.applyIncrement(h1, df(log.filter(r => r._2 > 2000 && r._2 <= 4000)),
      Seq("k"), "t", "id", Seq("attr"))
    val h3 = Scd2.applyIncrement(h2, df(log.filter(_._2 > 4000)),
      Seq("k"), "t", "id", Seq("attr"))
    assert(canon(h3) === full)
  }

  test("applyIncrement: untouched keys re-emit unchanged; new keys start at 1") {
    val h = Scd2.fromChangeLog(
      Seq(("old", 10L, 1L, "x"), ("old", 20L, 2L, "y"),
        ("idle", 15L, 3L, "z")).toDF("k", "t", "id", "attr"),
      Seq("k"), "t", "id", Seq("attr"))
    val out = canon(Scd2.applyIncrement(h,
      Seq(("old", 30L, 4L, "x"), ("fresh", 25L, 5L, "a")).toDF("k", "t", "id", "attr"),
      Seq("k"), "t", "id", Seq("attr")))
    assert(out === Set(
      ("old", "x", 1L, 10L, Some(20L), false),
      ("old", "y", 2L, 20L, Some(30L), false),   // open version closed by the batch
      ("old", "x", 3L, 30L, None, true),         // ordinal continues
      ("idle", "z", 1L, 15L, None, true),        // byte-identical passthrough
      ("fresh", "a", 1L, 25L, None, true)))      // new key starts at 1
  }

  test("multi-column keys and multiple tracked attributes") {
    val df = Seq(
      ("a", "p", 1L, 1L, "x", 10), ("a", "p", 2L, 2L, "x", 10),
      ("a", "p", 3L, 3L, "x", 11), ("a", "q", 4L, 4L, "x", 10))
      .toDF("k1", "k2", "t", "id", "s", "i")
    val out = Scd2.fromChangeLog(df, Seq("k1", "k2"), "t", "id", Seq("s", "i"))
    assert(out.count() === 3) // i-change versions, q is its own key
    assert(out.filter(col("is_current")).count() === 2)
  }
}
