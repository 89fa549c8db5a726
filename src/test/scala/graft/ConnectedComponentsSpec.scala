package graft

import graft.operators.ConnectedComponents

/** Min-label connected components: multi-hop chains (forces >1 round),
  * isolated singletons, duplicate/symmetric edge input, and equivalence
  * with a brute-force union-find on random graphs. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chains, cliques, and isolated nodes resolve to min-id components") {
    // component {1,2,3,4,5} as a chain (diameter 4), clique {10,11,12},
    // isolated 20; edge 3-2 duplicated and reversed on purpose
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("src", "dst")
    val nodes = (Seq(20L) ++ (1L to 5L) ++ (10L to 12L)).toDF("id")
    val got = ConnectedComponents.minLabel(edges, nodes)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("edge endpoints outside the node universe drop and never " +
      "propagate labels (the documented minLabel contract)") {
    // 0 is NOT in nodes: edge (0,2) must not pull 2's component down to
    // 0, and no row for 0 may be emitted; edge (7,8) with 8 unknown
    // must leave 7 a singleton; the 0-2 edge must also not bridge to 1
    // THROUGH the unknown node (1-0-2 is not a path when 0 is outside)
    val edges = Seq((0L, 2L), (1L, 0L), (7L, 8L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 7L).toDF("id")
    val got = ConnectedComponents.minLabel(edges, nodes)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 2L, 7L -> 7L))
  }

  test("alternating star: same answers as minLabel on mixed shapes") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("src", "dst")
    val nodes = (Seq(20L) ++ (1L to 5L) ++ (10L to 12L)).toDF("id")
    val got = ConnectedComponents.alternatingStar(edges, nodes)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("alternating star: 10k-node chain converges in O(log^2) rounds") {
    // diameter 9999 — minLabel would need 9999 rounds; the alternation
    // must finish in a polylog handful
    val n = 10000L
    val edges = spark.range(n - 1)
      .selectExpr("id AS src", "id + 1 AS dst")
    val nodes = spark.range(n).toDF("id")
    val (labels, rounds) =
      ConnectedComponents.alternatingStarWithRounds(edges, nodes)
    assert(rounds <= 20, s"took $rounds rounds")
    val comps = labels.selectExpr("count(distinct component)", "min(component)", "count(*)")
      .as[(Long, Long, Long)].head()
    assert(comps == ((1L, 0L, n)))
  }

  test("auto falls back past the diameter budget and still answers right") {
    val n = 64L // chain of diameter 63 > budget 5
    val edges = spark.range(n - 1).selectExpr("id AS src", "id + 1 AS dst")
    val nodes = spark.range(n).toDF("id")
    val got = ConnectedComponents.auto(edges, nodes, diameterBudget = 5)
      .as[(Long, Long)].collect().toMap
    assert(got.size == n && got.values.forall(_ == 0L))
  }

  test("agrees with union-find on random graphs") {
    val rnd = new scala.util.Random(11)
    val n = 60
    val edgeList = (1 to 70).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // reference: driver-side union-find
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edgeList.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
    // min-id canonicalization: union-find roots are not necessarily the
    // min member, so remap each root to its component minimum
    val minOfRoot = expected.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
    val want = expected.map { case (k, r) => k -> minOfRoot(r) }

    val got = ConnectedComponents.minLabel(
      edgeList.toDF("src", "dst"), (0L until n.toLong).toDF("id"))
      .as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  // ---- incremental maintenance ----

  private def fullCC(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] =
    ConnectedComponents.auto(edges.toDF("src", "dst"), nodes.toDF("id"))
      .as[(Long, Long)].collect().toMap

  private def incr(oldEdges: Seq[(Long, Long)], oldNodes: Seq[Long],
                   newEdges: Seq[(Long, Long)], newNodes: Seq[Long]): Map[Long, Long] = {
    val warehouse = ConnectedComponents.auto(
      oldEdges.toDF("src", "dst"), oldNodes.toDF("id"))
    ConnectedComponents.incrementalMinLabel(
        warehouse, newEdges.toDF("src", "dst"), newNodes.toDF("id"))
      .as[(Long, Long)].collect().toMap
  }

  test("incremental: bridge edge merges two warehouse components; new chain attaches") {
    // warehouse: {1,2} and {10,11}, isolated 20; batch: bridge 2-10,
    // new node 30 chained to 20, brand-new pair {40,41}
    val got = incr(
      oldEdges = Seq((1L, 2L), (10L, 11L)), oldNodes = Seq(1L, 2L, 10L, 11L, 20L),
      newEdges = Seq((2L, 10L), (30L, 20L), (40L, 41L)),
      newNodes = Seq(30L, 40L, 41L))
    assert(got === Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L,
      20L -> 20L, 30L -> 20L, 40L -> 40L, 41L -> 40L))
  }

  test("incremental: no new edges leaves the warehouse labeling unchanged") {
    val old = fullCC(Seq((1L, 2L), (3L, 4L)), Seq(1L, 2L, 3L, 4L))
    val got = incr(Seq((1L, 2L), (3L, 4L)), Seq(1L, 2L, 3L, 4L),
      Seq.empty, Seq(9L))
    assert(got === old + (9L -> 9L))
  }

  test("incremental: empty warehouse is plain CC") {
    val edges = Seq((5L, 6L), (6L, 7L))
    val got = incr(Seq.empty, Seq.empty, edges, Seq(5L, 6L, 7L, 8L))
    assert(got === fullCC(edges, Seq(5L, 6L, 7L, 8L)))
  }

  test("incremental: re-ingested node keeps its warehouse label") {
    val got = incr(Seq((1L, 2L)), Seq(1L, 2L),
      newEdges = Seq.empty, newNodes = Seq(2L))
    assert(got === Map(1L -> 1L, 2L -> 1L))
  }

  test("incremental equals from-scratch CC at random splits of random graphs") {
    val rnd = new scala.util.Random(176)
    (1 to 5).foreach { trial =>
      val n = 40
      val nodes = (0L until n.toLong)
      val edges = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val cut = 10 + rnd.nextInt(20)
      val oldNodes = nodes.filter(_ < cut)
      val newNodes = nodes.filter(_ >= cut)
      val (oldE, newE) = edges.partition { case (a, b) => a < cut && b < cut }
      val got = incr(oldE, oldNodes, newE, newNodes)
      assert(got === fullCC(edges, nodes), s"trial $trial cut $cut")
    }
  }
}
