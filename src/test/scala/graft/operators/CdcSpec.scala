package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  // base: (k, v); log: (k, v, seq, op)
  private def run(base: Seq[(String, Int)], log: Seq[(String, Int, Long, String)]) =
    Cdc.applyLog(
      base.toDF("k", "v").withColumn("seq", lit(-1L)).select("k", "v", "seq"),
      log.toDF("k", "v", "seq", "op"),
      Seq("k"), "op", Seq("seq"))
      .select("k", "v").as[(String, Int)].collect.toSeq.sortBy(_._1)

  test("replay semantics: passthrough, override, delete, insert, revival") {
    val out = run(
      base = Seq(("untouched", 1), ("updated", 2), ("deleted", 3), ("revived", 4)),
      log = Seq(
        ("updated", 20, 1L, "upsert"),
        ("updated", 21, 2L, "upsert"),      // last op wins
        ("deleted", 99, 1L, "upsert"),
        ("deleted", 0, 2L, "delete"),       // upsert-then-delete → gone
        ("revived", 0, 1L, "delete"),
        ("revived", 40, 2L, "upsert"),      // delete-then-upsert → back
        ("inserted", 50, 1L, "upsert")))    // no base row
    assert(out === Seq(("inserted", 50), ("revived", 40),
      ("untouched", 1), ("updated", 21)))
  }

  test("log order comes from orderCols, not input row order") {
    val out = run(base = Seq(),
      log = Seq(("k", 2, 9L, "upsert"), ("k", 1, 10L, "delete"),
        ("k", 3, 5L, "upsert")))
    assert(out === Seq()) // seq 10 (delete) is last despite middle position
  }

  test("matches a per-key sequential replay on random streams") {
    val rnd = new scala.util.Random(13)
    val base = (0 until 40).map(i => (s"k$i", i))
    val log = (0 until 400).map { i =>
      (s"k${rnd.nextInt(60)}", rnd.nextInt(1000), i.toLong,
        if (rnd.nextInt(4) == 0) "delete" else "upsert")
    }
    val expected = {
      val st = scala.collection.mutable.Map(base.map { case (k, v) => k -> v }: _*)
      log.sortBy(_._3).foreach { case (k, v, _, op) =>
        if (op == "delete") st.remove(k) else st(k) = v
      }
      st.toSeq.sortBy(_._1)
    }
    assert(run(base, log) === expected)
  }

  test("one map-side-combined shuffle: partial max_by, no window sort") {
    val base = (1 to 50).map(i => (s"k$i", i)).toDF("k", "v")
      .withColumn("seq", lit(-1L)).select("k", "v", "seq")
    val log = (1 to 200).map(i => (s"k${i % 70}", i, i.toLong,
      if (i % 5 == 0) "delete" else "upsert")).toDF("k", "v", "seq", "op")
    val plan = Cdc.applyLog(base, log, Seq("k"), "op", Seq("seq"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1)
    assert(plan.contains("partial_"), s"no partial aggregate in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
  }

  test("schema contract is enforced") {
    val base = Seq(("k", 1)).toDF("k", "v")
    val logBad = Seq(("k", 1, "upsert", 9L)).toDF("k", "v", "op", "extra")
    intercept[IllegalArgumentException] {
      Cdc.applyLog(base, logBad, Seq("k"), "op", Seq("v"))
    }
  }
}
