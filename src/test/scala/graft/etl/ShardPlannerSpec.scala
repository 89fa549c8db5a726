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

  private def replanRun(existing: Seq[(String, Long, Int)],
                        delta: Seq[(String, Long)], n: Int, budget: Int) =
    ShardPlanner.replanShards(
        existing.toDF("source", "weight", "shard"),
        delta.toDF("source", "n_chars"), "source", "n_chars", n, budget)
      .as[(String, Long, Int, Long, Boolean)].collect().toSeq

  test("replan: a no-op batch moves nothing (r11, q206)") {
    val existing = Seq(("a", 10L, 0), ("b", 8L, 1), ("c", 3L, 1))
    val got = replanRun(existing, Seq.empty, 2, budget = 5)
      .map(r => r._1 -> r).toMap
    assert(got.size === 3)
    existing.foreach { case (g, w, s) =>
      val (_, w2, s2, _, moved) = got(g)
      assert((w2, s2, moved) === (w, s, false), g)
    }
    // loads preserved exactly
    assert(got("a")._4 === 10L && got("b")._4 === 11L && got("c")._4 === 11L)
  }

  test("replan: moves never exceed the budget; budget 0 keeps every " +
      "changed group; weights still merge (r11, q206)") {
    val rnd = new scala.util.Random(47)
    val groups = (0 until 20).map(i => s"g$i")
    val base = groups.map(g => g -> (rnd.nextInt(500) + 1).toLong)
    val existing = run(base, 4).map(t => (t._1, t._2, t._3))
    // a delta that inflates half the groups hard (so fresh greedy
    // targets differ from kept shards) plus two new groups
    val delta = groups.take(10).map(g => g -> (rnd.nextInt(2000) + 500).toLong) ++
      Seq("new1" -> 900L, "new2" -> 50L)
    Seq(0, 1, 2, 100).foreach { budget =>
      val got = replanRun(existing, delta, 4, budget)
      assert(got.count(_._5) <= budget, s"budget $budget")
      // every group exactly once, weights merged
      val exMap = existing.map(t => t._1 -> t._2).toMap
      val dMap = delta.toMap
      assert(got.map(_._1).sorted ===
        (groups ++ Seq("new1", "new2")).sorted)
      got.foreach { case (g, w, _, _, _) =>
        assert(w === exMap.getOrElse(g, 0L) + dMap.getOrElse(g, 0L), g)
      }
      // shard_load = exact sum of its groups
      val bySh = got.groupBy(_._3)
      got.foreach { case (_, _, s, load, _) =>
        assert(load === bySh(s).map(_._2).sum)
      }
      if (budget == 0) {
        val ex = existing.map(t => t._1 -> t._3).toMap
        got.filter(r => ex.contains(r._1)).foreach { case (g, _, s, _, m) =>
          assert(s === ex(g) && !m, s"budget 0 moved $g")
        }
      }
    }
  }

  test("replan: new groups place on the lightest shard without " +
      "consuming budget (r11, q206)") {
    val existing = Seq(("a", 10L, 0), ("b", 4L, 1))
    // budget 0: the new group must still place (on shard 1, lighter)
    val got = replanRun(existing, Seq("n" -> 5L), 2, budget = 0)
      .map(r => r._1 -> r).toMap
    assert(got("n")._3 === 1 && !got("n")._5)
    assert(got("n")._4 === 9L)
  }

  test("replan with an unbounded budget ≡ fresh greedy over the kept " +
      "loads (independent reference, r11, q206)") {
    val rnd = new scala.util.Random(53)
    (0 until 3).foreach { trial =>
      val groups = (0 until 15).map(i => s"g$i")
      val base = groups.map(g => g -> (rnd.nextInt(300) + 1).toLong)
      val existing = run(base, 3).map(t => (t._1, t._2, t._3))
      val delta = groups.filter(_ => rnd.nextBoolean()).map(g =>
        g -> (rnd.nextInt(400) + 1).toLong) ++ Seq(s"x$trial" -> 250L)
      val exMap = existing.map(t => t._1 -> ((t._2, t._3))).toMap
      val dMap = delta.toMap
      // independent replay: kept loads, then minBy-greedy in LPT order,
      // every changed group free to move (budget = ∞)
      val loads = Array.fill(3)(0L)
      existing.filter(t => !dMap.contains(t._1))
        .foreach(t => loads(t._3) += t._2)
      val expect = dMap.toSeq
        .map { case (g, dw) =>
          (g, exMap.get(g).map(_._1).getOrElse(0L) + dw, exMap.get(g).map(_._2))
        }
        .sortBy { case (g, w, _) => (-w, g) }
        .map { case (g, w, old) =>
          val best = loads.zipWithIndex.minBy { case (l, i) => (l, i) }._2
          val tgt = old match {
            case Some(s0) if best == s0 => s0
            case Some(_) => best
            case None => best
          }
          loads(tgt) += w
          g -> ((tgt, old.exists(_ != tgt)))
        }.toMap
      val got = replanRun(existing, delta, 3, budget = Int.MaxValue)
      got.filter(r => expect.contains(r._1)).foreach { case (g, _, s, _, m) =>
        assert((s, m) === expect(g), s"trial $trial group $g")
      }
    }
  }

  test("replan refusals: duplicate existing groups, out-of-range shard " +
      "ids, bounded collects (r11, q206)") {
    intercept[IllegalArgumentException] {
      replanRun(Seq(("a", 1L, 0), ("a", 2L, 1)), Seq("b" -> 1L), 2, 1)
    }
    intercept[IllegalArgumentException] {
      replanRun(Seq(("a", 1L, 7)), Seq("b" -> 1L), 2, 1)
    }
    intercept[IllegalArgumentException] {
      ShardPlanner.replanShards(
        (0 until 12).map(i => (s"g$i", 1L, 0)).toDF("source", "weight", "shard"),
        Seq("b" -> 1L).toDF("source", "n_chars"),
        "source", "n_chars", 2, 1, maxGroups = 10)
    }
    intercept[IllegalArgumentException] {
      ShardPlanner.replanShards(
        Seq(("a", 1L, 0)).toDF("source", "weight", "shard"),
        (0 until 12).map(i => s"d$i" -> 1L).toDF("source", "n_chars"),
        "source", "n_chars", 2, 1, maxGroups = 10)
    }
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
