package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def randDf(n: Int, groups: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (s"g${rnd.nextInt(groups)}", rnd.nextInt(10000).toDouble, i.toLong))
      .toDF("g", "score", "id")
  }

  test("equals the window row_number formulation on random data") {
    val df = randDf(5000, 17, 3).cache()
    for (k <- Seq(1, 3, 10)) {
      val viaAgg = TopK.perGroup(df, Seq("g"), Seq("score", "id"), Seq(), k)
        .select("g", "rank", "score", "id")
        .as[(String, Long, Double, Long)].collect.toSet
      val w = Window.partitionBy(col("g")).orderBy(col("score").desc, col("id").desc)
      val viaWin = df.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k).select("g", "rank", "score", "id")
        .as[(String, Long, Double, Long)].collect.toSet
      assert(viaAgg === viaWin, s"k=$k")
    }
    df.unpersist()
  }

  test("groups smaller than k emit all their rows, ranked") {
    val df = Seq(("a", 5.0, 1L), ("a", 3.0, 2L), ("b", 9.0, 3L)).toDF("g", "score", "id")
    val out = TopK.perGroup(df, Seq("g"), Seq("score", "id"), Seq(), 10)
      .as[(String, Long, Double, Long)].collect.toSeq.sorted
    assert(out === Seq(("a", 1L, 5.0, 1L), ("a", 2L, 3.0, 2L), ("b", 1L, 9.0, 3L)))
  }

  test("payload columns ride along without joining the ordering") {
    val df = Seq(("a", 2.0, 1L, "x"), ("a", 7.0, 2L, "y")).toDF("g", "score", "id", "p")
    val out = TopK.perGroup(df, Seq("g"), Seq("score", "id"), Seq("p"), 1)
      .select("g", "rank", "p").as[(String, Long, String)].collect.toSeq
    assert(out === Seq(("a", 1L, "y")))
  }

  test("plan: object-hash aggregate with a partial pass; no window, no pre-shuffle full sort") {
    val plan = TopK.perGroup(randDf(1000, 7, 5), Seq("g"), Seq("score", "id"), Seq(), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"no object agg in:\n$plan")
    assert(plan.contains("partial_"), s"no partial pass in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1)
  }
}
