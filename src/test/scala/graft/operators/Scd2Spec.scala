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
