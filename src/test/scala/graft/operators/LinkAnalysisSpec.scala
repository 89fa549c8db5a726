package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixed-point PageRank values on a 4-node path graph —
  * pins the exact integer arithmetic (div-then-damp order) the q88 oracle
  * mirrors. */
class LinkAnalysisSpec extends SparkSpec {

  test("two iterations on a path graph match hand-computed fixed-point values") {
    import spark.implicits._
    // path 1-2-3 (symmetrized), node 4 isolated
    val pairs = Seq((1L, 2L), (2L, 3L))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1)))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val out = LinkAnalysis.pageRankFixedPoint(edges, nodes, iters = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // iter1: in_sums 1<-500k, 2<-2M, 3<-500k, 4<-0
    // iter2: in_sums 1<-925k, 2<-1.15M, 3<-925k
    assert(out(1L) === (1L, 936250L))
    assert(out(2L) === (2L, 1127500L))
    assert(out(3L) === (1L, 936250L))
    assert(out(4L) === (0L, 150000L))
  }

  test("isolated graph: every node settles at the base mass") {
    import spark.implicits._
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val nodes = (1L to 10L).toDF("id")
    val out = LinkAnalysis.pageRankFixedPoint(edges, nodes, iters = 3)
    assert(out.filter(col("rank") =!= 150000L).count() === 0)
  }

  test("deterministic across repeated runs") {
    import spark.implicits._
    val pairs = (1L to 50L).map(i => (i, i % 10 + 100L))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
    val nodes = (1L to 200L).toDF("id")
    def run() = LinkAnalysis.pageRankFixedPoint(edges, nodes, iters = 4)
      .orderBy(col("id")).collect().map(_.getLong(2)).toSeq
    assert(run() === run())
  }
}
