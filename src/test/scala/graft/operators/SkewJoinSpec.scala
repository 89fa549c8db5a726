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

  test("salted refuses inputs that already carry a __salt column") {
    val poisoned = fact.withColumn("__salt", lit(3))
    intercept[IllegalArgumentException] {
      SkewJoin.salted(poisoned, dim, "k", col("row_id"), buckets = 8)
    }
    intercept[IllegalArgumentException] {
      SkewJoin.salted(fact, dim.withColumn("__salt", lit(1)), "k", col("row_id"))
    }
  }

  // fact-vs-fact right side: several rows per key (a dimension has one)
  private def rightFact = spark.range(0, 21)
    .select(pmod(col("id"), lit(7)).as("k"),
      (col("id") * 10).as("payload"))

  test("hotSplit inner join equals the plain join under a skewed key") {
    val plain = fact.join(rightFact, Seq("k")).select("row_id", "k", "payload")
    val split = SkewJoin.hotSplit(fact, rightFact, "k", hotThreshold = 100)
      .select("row_id", "k", "payload")
    assert(split.exceptAll(plain).isEmpty && plain.exceptAll(split).isEmpty)
  }

  test("hotSplit left join null-extends hot AND cold keys missing from right") {
    // right misses hot key 0 (broadcast branch must null-extend) and
    // cold keys 4-6 (shuffle branch must null-extend)
    val sparse = rightFact.filter(col("k").between(1, 3))
    val split = SkewJoin.hotSplit(fact, sparse, "k",
      hotThreshold = 100, joinType = "left")
    val plain = fact.join(sparse, Seq("k"), "left")
    assert(split.count() === plain.count())
    assert(split.filter(col("payload").isNull).count() ===
      plain.filter(col("payload").isNull).count())
  }

  test("hotSplit is semantics-preserving at degenerate thresholds") {
    val plain = fact.join(rightFact, Seq("k")).select("row_id", "k", "payload")
    for (t <- Seq(1L, 1000000000L)) { // all-hot and all-cold
      val split = SkewJoin.hotSplit(fact, rightFact, "k", hotThreshold = t)
        .select("row_id", "k", "payload")
      assert(split.exceptAll(plain).isEmpty && plain.exceptAll(split).isEmpty, s"t=$t")
    }
  }

  test("hotSplit plans the hot branch broadcast, the cold branch shuffled") {
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = SkewJoin.hotSplit(fact, rightFact, "k", hotThreshold = 100)
        .queryExecution.executedPlan.toString
      // the hot-key rows join map-side: an INNER BroadcastHashJoin (the
      // semi/anti split joins are LeftSemi/LeftAnti — not counted here)
      assert("BroadcastHashJoin [^\\n]*Inner".r.findFirstIn(plan).isDefined, plan)
      // the cold keys go through a normal shuffle join
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
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
