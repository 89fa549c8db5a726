package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalRank must match row_number() over a global ORDER BY exactly —
  * the operator exists to produce the identical ranks without the
  * single-partition window exchange. */
class GlobalRankSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("ranks equal the single-partition window row_number") {
    val sorted = docs.select(col("doc_id"), col("n_chars"))
    val viaWindow = sorted.withColumn("rk",
      row_number().over(Window.orderBy(col("n_chars").desc, col("doc_id")))
        .cast("long"))
    val viaOp = GlobalRank.withGlobalRank(sorted, "rk",
      col("n_chars").desc, col("doc_id"))
    assert(viaOp.count() === sorted.count())
    assert(viaWindow.exceptAll(viaOp).isEmpty && viaOp.exceptAll(viaWindow).isEmpty)
  }

  test("ranks are a 1..N permutation and stable across evaluations") {
    val ranked = GlobalRank.withGlobalRank(
      docs.select(col("doc_id")), "rk", col("doc_id"))
    val n = docs.count()
    val stats = ranked.agg(
      min(col("rk")).as("lo"), max(col("rk")).as("hi"),
      countDistinct(col("rk")).as("d")).head()
    assert(stats.getLong(0) === 1L)
    assert(stats.getLong(1) === n)
    assert(stats.getLong(2) === n)
    // identity sort: rank is doc_id's position in ascending order
    val mismatch = ranked
      .withColumn("expected",
        row_number().over(Window.orderBy(col("doc_id"))).cast("long"))
      .filter(col("rk") =!= col("expected")).count()
    assert(mismatch === 0L)
  }

  test("randomized datasets with ties, negatives and nulls match the window form") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 200 + trial * 137
      // heavy ties (values mod 7), negatives, and ~10% nulls in the sort key
      val rows = (1 to n).map { i =>
        val v: java.lang.Long =
          if (rnd.nextInt(10) == 0) null
          else java.lang.Long.valueOf(rnd.nextInt(7).toLong - 3)
        (i.toLong, v)
      }
      val df = rows.toDF("id", "k")
      val viaOp = GlobalRank.withGlobalRank(df, "rk", col("k").desc, col("id"))
      val viaWindow = df.withColumn("rk",
        row_number().over(Window.orderBy(col("k").desc, col("id"))).cast("long"))
      assert(viaOp.exceptAll(viaWindow).isEmpty &&
        viaWindow.exceptAll(viaOp).isEmpty,
        s"trial $trial: rank mismatch vs window row_number")
    }
  }

  test("ranking stays distributed — no single-partition collapse") {
    val ranked = GlobalRank.withGlobalRank(
      docs.select(col("doc_id")), "rk", col("doc_id"))
    // The returned DF wraps the ranked RDD (LogicalRDD), so its plan
    // string cannot reveal an exchange hidden in the RDD lineage — assert
    // the physical partitioning directly: the range repartition must leave
    // the data spread across >1 partition on a dataset that is larger than
    // one partition (sf0.001 documents ≫ 4-partition test config).
    assert(docs.count() > 4, "fixture must exceed the partition count")
    assert(ranked.rdd.getNumPartitions > 1,
      s"rank path collapsed to ${ranked.rdd.getNumPartitions} partition(s)")
    // and the plan on top of the RDD never re-introduces a 1-partition sort
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"))
  }
}
