package graft.plans

import graft.SparkSpec
import graft.functions.VectorOps
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f)),
    (2L, Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(0.3f, -0.7f, 0.2f), Seq(-0.1f, 0.4f, 0.9f)),
    (4L, Seq(0.0f, 0.0f, 0.0f), Seq(1.0f, 1.0f, 1.0f)), // zero magnitude
    (5L, Seq(1.0f, 1.0f), Seq(1.0f, 1.0f, 1.0f))) // length mismatch
    .toDF("id", "a", "b")

  test("native expression is registered and bit-matches the portable HOF form") {
    val both = vecs.select(
      col("id"),
      call_function("graft_cosine", col("a"), col("b")).as("native"),
      VectorOps.cosine(col("a"), col("b")).as("portable"))
      .as[(Long, Double, Double)].collect()
    both.foreach { case (id, n, p) =>
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(p),
        s"id=$id native=$n portable=$p")
    }
    val byId = both.map(r => r._1 -> r._2).toMap
    assert(byId(1L) == 1.0 && byId(2L) == 0.0)
    assert(byId(4L) == 0.0 && byId(5L) == 0.0) // guards
  }

  test("SQL registration works and the plan stays in whole-stage codegen") {
    vecs.createOrReplaceTempView("cs_vecs")
    val df = spark.sql("SELECT id, graft_cosine(a, b) AS s FROM cs_vecs")
    assert(df.count() == 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("lambdafunction"), plan) // no interpreted HOF path
  }

  test("SparkEntry self-registers the function on a session lacking it") {
    val s2 = spark.newSession()
    s2.sessionState.functionRegistry.dropFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_cosine"))
    val df = graft.SparkEntry.queries("q40_cosine_scores")(s2, "/root/testdata/sf0.001")
    assert(df.count() > 0) // would fail with UNRESOLVED_ROUTINE without ensure()
  }

  test("double-array inputs work too") {
    val d = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0))).toDF("a", "b")
      .select(call_function("graft_cosine", col("a"), col("b")))
      .as[Double].head()
    assert(d == 1.0)
  }
}
