package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 80% of fact rows on key 0 — the funnel shape salting exists for
  private def fact = spark.range(0, 1000)
    .select(col("id").as("row_id"),
      when(pmod(col("id"), lit(5)) < 4, lit(0L))
        .otherwise(pmod(col("id"), lit(7))).as("k"))
  private def dim = spark.range(0, 7)
    .select(col("id").as("k"), concat(lit("d"), col("id")).as("label"))

  test("salted inner join equals the plain join under a skewed key") {
    val plain = fact.join(dim, Seq("k")).select("row_id", "k", "label")
    val salted = SkewJoin.salted(fact, dim, "k", col("row_id"), buckets = 8)
      .select("row_id", "k", "label")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    assert(salted.count() === 1000)
  }

  test("left join keeps unmatched fact rows null-padded") {
    val sparse = dim.filter(col("k") < 3)
    val salted = SkewJoin.salted(fact, sparse, "k", col("row_id"),
      buckets = 4, joinType = "left")
    val plain = fact.join(sparse, Seq("k"), "left")
    assert(salted.count() === 1000)
    assert(salted.filter(col("label").isNull).count() ===
      plain.filter(col("label").isNull).count())
  }

  test("salt is deterministic (task-retry safe): two runs bucket identically") {
    val a = fact.withColumn("__salt", pmod(hash(col("row_id")), lit(8)))
      .select("row_id", "__salt")
    val b = fact.withColumn("__salt", pmod(hash(col("row_id")), lit(8)))
      .select("row_id", "__salt")
    assert(a.exceptAll(b).isEmpty)
    // and the hot key's rows actually spread across buckets
    val spread = fact.filter(col("k") === 0)
      .select(pmod(hash(col("row_id")), lit(8)).as("s"))
      .distinct().count()
    assert(spread >= 6, s"hot key spread over only $spread of 8 buckets")
  }

  test("with broadcast disabled the salted join shuffles on (k, salt)") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = SkewJoin.salted(fact, dim, "k", col("row_id"), buckets = 8)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(plan.contains("__salt"), plan)
    }
  }

  private def withSQLConf[T](kvs: (String, String)*)(f: => T): T = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
