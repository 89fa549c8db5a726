package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins ShardPlanner.planShards to an independent LPT reference and
  * the plan invariants: every group assigned exactly once, shard_load
  * is the exact sum of its groups, lowest-index tie-break, and the
  * degenerate 1-shard plan. */
class ShardPlannerSpec extends SparkSpec {
  import spark.implicits._

  private def reference(ws: Seq[(String, Long)], n: Int): Map[String, Int] = {
    val loads = new Array[Long](n)
    ws.sortBy { case (g, w) => (-w, g) }.map { case (g, w) =>
      val best = loads.zipWithIndex.minBy { case (l, i) => (l, i) }._2
      loads(best) += w
      g -> best
    }.toMap
  }

  private def run(rows: Seq[(String, Long)], n: Int) =
    ShardPlanner.planShards(rows.toDF("source", "n_chars"), "source", "n_chars", n)
      .as[(String, Long, Int, Long)].collect().toSeq

  test("planShards ≡ LPT reference (crafted + random), loads exact") {
    val rnd = new scala.util.Random(31)
    val corpora = Seq(
      Seq("a" -> 10L, "b" -> 10L, "c" -> 10L, "d" -> 1L), // tie-heavy
      (0 until 40).map(i => s"s$i" -> (rnd.nextInt(1000) + 1).toLong)
    )
    corpora.foreach { ws =>
      // duplicate rows per group to prove the weight aggregate
      val rows = ws.flatMap { case (g, w) => Seq(g -> (w - w / 2), g -> (w / 2)) }
        .filter(_._2 > 0)
      val agg = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      Seq(1, 3, 4).foreach { n =>
        val got = run(rows, n)
        val ref = reference(agg.toSeq, n)
        assert(got.map(_._1).sorted === agg.keys.toSeq.sorted, s"n=$n")
        got.foreach { case (g, w, s, _) =>
          assert(w === agg(g), s"weight of $g")
          assert(s === ref(g), s"shard of $g at n=$n")
        }
        // shard_load = exact sum of the shard's weights
        val bySh = got.groupBy(_._3)
        got.foreach { case (_, _, s, load) =>
          assert(load === bySh(s).map(_._2).sum)
        }
        if (n == 1) assert(got.forall(_._3 == 0))
      }
    }
  }

  test("the group-list collect is bounded: past maxGroups it refuses") {
    val rows = (0 until 12).map(i => s"g$i" -> 1L)
    intercept[IllegalArgumentException] {
      ShardPlanner.planShards(rows.toDF("source", "n_chars"),
        "source", "n_chars", 2, maxGroups = 10)
    }
    // exactly at the bound it still plans every group
    assert(ShardPlanner.planShards(rows.toDF("source", "n_chars"),
      "source", "n_chars", 2, maxGroups = 12).count() === 12L)
  }

  test("equal weights tie-break to the lowest-index shard, round-robin") {
    val got = run(Seq("a" -> 5L, "b" -> 5L, "c" -> 5L), 3)
      .map(r => r._1 -> r._3).toMap
    // LPT order a,b,c (weight ties break group-ascending); each lands
    // on the first empty slot
    assert(got === Map("a" -> 0, "b" -> 1, "c" -> 2))
  }

  test("non-integral weights refuse with a message; all-NULL groups " +
      "plan at weight 0 (r11, ADVICE)") {
    val e = intercept[IllegalArgumentException] {
      ShardPlanner.planShards(
        Seq("a" -> 1.5, "b" -> 2.5).toDF("source", "n_chars"),
        "source", "n_chars", 2)
    }
    assert(e.getMessage.contains("must be integral"))
    // a group whose weights are all NULL used to NPE — it now plans
    // at weight 0 (and, being lightest, lands last in LPT order)
    val rows = Seq(("a", Some(7L)), ("b", None), ("a", Some(3L)))
    val got = ShardPlanner.planShards(
        rows.toDF("source", "n_chars"), "source", "n_chars", 2)
      .as[(String, Long, Int, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("a") === ("a", 10L, 0, 10L))
    assert(got("b") === ("b", 0L, 1, 0L))
  }
}
