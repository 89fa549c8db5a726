package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

/** Semantics of the union+window as-of join: <= convention at equal
  * timestamps, left-outer nulls, per-key isolation, and equivalence to
  * the naive theta-join + argmax formulation it replaces. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf = Seq(
    // (id, key, t)
    (1L, "a", 100L),
    (2L, "a", 200L),
    (3L, "a", 50L), // before every right row
    (4L, "b", 100L),
    (5L, "c", 100L) // key with no right rows at all
  ).toDF("id", "key", "t")

  private def rightDf = Seq(
    // (key, rt, v)
    ("a", 100L, "a@100"), // equal-time: must match id=1 (<= semantics)
    ("a", 150L, "a@150"),
    ("b", 99L, "b@99"),
    ("b", 101L, "b@101") // after id=4: must not match
  ).toDF("key", "rt", "v")

  private def run = AsOfJoin
    .backward(leftDf, rightDf, Seq("key"), "t", "rt", Seq("v", "rt"))
    .orderBy("id")
    .collect()
    .map(r => (r.getLong(0), Option(r.getString(3)), Option(r.get(4)).map(_.asInstanceOf[Long])))

  test("matches latest right row at-or-before left time, null when none") {
    assert(run.toSeq === Seq(
      (1L, Some("a@100"), Some(100L)), // equal timestamp is visible
      (2L, Some("a@150"), Some(150L)), // latest of the two priors
      (3L, None, None),                // left precedes all right rows
      (4L, Some("b@99"), Some(99L)),   // future right row ignored
      (5L, None, None)                 // key absent from right side
    ))
  }

  test("null keys never match (SQL join semantics)") {
    val l = Seq((1L, null.asInstanceOf[String], 100L), (2L, "a", 100L))
      .toDF("id", "key", "t")
    val r = Seq((null.asInstanceOf[String], 50L, "null@50"), ("a", 50L, "a@50"))
      .toDF("key", "rt", "v")
    val got = AsOfJoin.backward(l, r, Seq("key"), "t", "rt", Seq("v"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(3))))
    // the null-key left row must NOT pick up the null-key right row
    assert(got.toSeq === Seq((1L, None), (2L, Some("a@50"))))
  }

  test("agrees with the naive theta-join + argmax on random data") {
    val rnd = new scala.util.Random(42)
    val l = (1 to 300).map(i => (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong))
      .toDF("id", "key", "t")
    // unique (key, rt): one right row per (key, time) by construction
    val r = (1 to 200).map { i =>
      (s"k${i % 7}", (i * 13 % 997).toLong, s"p$i")
    }.distinct.toDF("key", "rt", "v")
      .groupBy("key", "rt").agg(max("v").as("v"))

    val ours = AsOfJoin.backward(l, r, Seq("key"), "t", "rt", Seq("v"))
      .select("id", "asof_v")

    val naive = l.as("l")
      .join(r.as("r"), $"l.key" === $"r.key" && $"r.rt" <= $"l.t", "left")
      .groupBy($"l.id".as("id"))
      .agg(max_by($"r.v", $"r.rt").as("asof_v"))

    assert(ours.exceptAll(naive).isEmpty && naive.exceptAll(ours).isEmpty)
  }

  test("backwardViaJoin is result-identical to the union-window form") {
    // the fixed-case table (equal timestamps, left-outer nulls, absent
    // keys) plus the 300-row random replay — both forms must agree row
    // for row, since the bucketed-history probe swaps shapes, not
    // semantics
    val viaJoin = AsOfJoin
      .backwardViaJoin(leftDf, rightDf, Seq("key"), "t", "rt", Seq("v", "rt"))
    val window = AsOfJoin
      .backward(leftDf, rightDf, Seq("key"), "t", "rt", Seq("v", "rt"))
    assert(viaJoin.exceptAll(window).isEmpty && window.exceptAll(viaJoin).isEmpty)

    val rnd = new scala.util.Random(7)
    val l = (1 to 300).map(i => (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong))
      .toDF("id", "key", "t")
    val r = (1 to 200).map(i => (s"k${i % 7}", (i * 13 % 997).toLong, s"p$i"))
      .toDF("key", "rt", "v")
      .groupBy("key", "rt").agg(max("v").as("v"))
    val a = AsOfJoin.backwardViaJoin(l, r, Seq("key"), "t", "rt", Seq("v"))
    val b = AsOfJoin.backward(l, r, Seq("key"), "t", "rt", Seq("v"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
