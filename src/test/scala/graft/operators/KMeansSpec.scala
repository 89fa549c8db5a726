package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // Two well-separated groups on a line plus a planted near-dup pair:
  // ids 0-3 near (1,0), ids 4-7 near (-1,0); ids 8/9 are near-identical
  // copies of each other inside the first group.
  private def corpus = Seq(
    (0L, Seq(1.00f, 0.01f)), (1L, Seq(0.98f, -0.02f)),
    (2L, Seq(1.02f, 0.03f)), (3L, Seq(0.97f, 0.00f)),
    (4L, Seq(-1.00f, 0.02f)), (5L, Seq(-0.99f, -0.01f)),
    (6L, Seq(-1.01f, 0.00f)), (7L, Seq(-0.98f, 0.03f)),
    (8L, Seq(0.99f, 0.01f)), (9L, Seq(0.99f, 0.0100001f))
  ).toDF("vec_id", "embedding")

  test("fit separates the two groups regardless of seed draw") {
    val (assigned, cents) = KMeans.fit(corpus, "vec_id", "embedding", k = 2, iters = 3)
    val byCell = assigned.select($"vec_id", $"cluster_id").as[(Long, Int)]
      .collect().toMap
    val left = Set(0L, 1L, 2L, 3L, 8L, 9L).map(byCell)
    val right = Set(4L, 5L, 6L, 7L).map(byCell)
    assert(left.size == 1 && right.size == 1 && left != right,
      s"groups not separated: $byCell")
    // centroids converged near ±2^20 on dim 1, near 0 on dim 2
    assert(cents.map(c => math.abs(math.abs(c.head) - 1048576L)).forall(_ < 60000),
      cents.map(_.mkString("[", ",", "]")).mkString(" "))
  }

  test("fit is deterministic: two runs produce identical centroids and cells") {
    val (a1, c1) = KMeans.fit(corpus, "vec_id", "embedding", k = 3, iters = 2)
    val (a2, c2) = KMeans.fit(corpus, "vec_id", "embedding", k = 3, iters = 2)
    assert(c1.toSeq == c2.toSeq)
    assert(a1.select("vec_id", "cluster_id").exceptAll(
      a2.select("vec_id", "cluster_id")).isEmpty)
  }

  test("assignment ties break to the lowest cell id") {
    val one = Seq((0L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
      .withColumn("__v", KMeans.quantize(col("embedding")))
    // cells 0 and 1 are equidistant (identical centroids, both nearer
    // than cell 2) — array_position must take the first occurrence.
    val cents = Array[Seq[Long]](Seq(9L, 9L), Seq(9L, 9L), Seq(0L, 0L))
    val cell = KMeans.assign(one, cents).select("cluster_id").as[Int].head()
    assert(cell == 0)
  }

  test("a centroid that captures no rows carries over unchanged") {
    // k=3 over 2 tight groups: at least one seed ends up empty after the
    // first update unless all three seeds landed apart; force the shape
    // with an outlier-free two-point corpus.
    val two = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val (_, cents) = KMeans.fit(two, "vec_id", "embedding", k = 3, iters = 2)
    assert(cents.length == 3)
    // every centroid is still a 2-dim long vector (no NaN/crash path)
    assert(cents.forall(_.length == 2))
  }

  test("argmin-L2 kernel matches the HOF twin (incl. duplicate-centroid ties)") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 300L).map(i =>
      (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("__v", KMeans.quantize(col("embedding")))
    val cents0 = Array.fill(5)(Seq.fill(16)((rnd.nextInt(2097152) - 1048576).toLong))
    val cents = cents0 :+ cents0(2) // duplicate → guaranteed tie candidates
    val kernel = KMeans.assign(df, cents).select("vec_id", "cluster_id")
    val hof = KMeans.assignHof(df, cents).select("vec_id", "cluster_id")
    assert(kernel.exceptAll(hof).isEmpty && hof.exceptAll(kernel).isEmpty)
    // the duplicate at index 5 can never win a tie against index 2
    assert(kernel.filter($"cluster_id" === 5).count() == 0)
  }

  test("quantization is the exact floor of x*2^20") {
    val q = Seq((0L, Seq(0.5f, -0.5f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
      .select(KMeans.quantize(col("embedding")).as("v"))
      .as[Seq[Long]].head()
    assert(q == Seq(524288L, -524288L, 0L, 1048576L))
  }

  test("SemDeDup shape: planted near-identical pair lands in one cluster " +
    "and the higher id is the one dropped by the greedy rule") {
    val (fitted, _) = KMeans.fit(corpus, "vec_id", "embedding", k = 2, iters = 3)
    val assigned = fitted.select($"vec_id", $"embedding", $"cluster_id").localCheckpoint()
    val cells = assigned.select($"vec_id", $"cluster_id").as[(Long, Int)].collect().toMap
    assert(cells(8L) == cells(9L))
    val pairs = assigned.as("x").join(assigned.as("y"),
        $"x.cluster_id" === $"y.cluster_id" && $"x.vec_id" < $"y.vec_id")
      .withColumn("cos", call_function("graft_cosine", $"x.embedding", $"y.embedding"))
      .filter($"cos" >= 0.999999)
    val droppedIds = pairs.select($"y.vec_id").as[Long].collect().toSet
    // 9 has the near-identical smaller-id twin 8, so it must be dropped;
    // 0 (the smallest id in its cluster) can never be.
    assert(droppedIds.contains(9L) && !droppedIds.contains(0L), droppedIds)
  }

  test("qualityFromState off a HAND-PLANTED assignment no fit produced " +
      "— the report is a pure function of state (r12)") {
    // 4 unit-grid vectors; a deliberately non-Lloyd assignment (vec 3
    // is parked in cell 0 far from its centroid) with hand centroids
    val vecs = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(1.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val assign = Seq((0L, 0), (1L, 0), (2L, 1), (3L, 0))
      .toDF("vec_id", "cluster_id")
    val s = 1048576L // 2^20
    val cents = Seq(Seq(0L, 0L), Seq(0L, s))
    val rows = KMeans.qualityFromState(assign, vecs,
        "vec_id", "embedding", cents)
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))).toMap
    // cell 0 members: d²(v0)=0, d²(v1)=s², d²(v3)=2s² → mean = s²
    assert(rows(0) == ((3L, s * s, 1, s * s)))
    // cell 1: only v2, exactly on its centroid
    assert(rows(1) == ((1L, 0L, 0, s * s)))
  }

  test("qualityFromState(fit state) ≡ the fit-path report (r12)") {
    val (assigned, cents) = KMeans.fit(corpus, "vec_id", "embedding", k = 2, iters = 2)
    // the fit path: distances off the carried __v (q201's shape)
    val centLit = typedlit(cents.indices.map(i => i -> cents(i)).toMap)
    val direct = assigned
      .withColumn("__d", KMeans.sqDist($"__v", element_at(centLit, $"cluster_id")))
      .groupBy($"cluster_id")
      .agg(count(lit(1)).as("n_members"),
        sum($"__d".cast("decimal(38,0)")).as("__ssw"))
      .select($"cluster_id", $"n_members",
        expr("cast(__ssw div n_members as bigint)").as("mean_ssw"))
      .join(KMeans.nnCentroids(spark, cents.toSeq), Seq("cluster_id"))
      .collect().map(r => r.getInt(0) -> r.toSeq).toMap
    val fromState = KMeans.qualityFromState(
        assigned.select($"vec_id", $"cluster_id"), corpus,
        "vec_id", "embedding", cents.toSeq)
      .collect().map(r => r.getInt(0) -> r.toSeq).toMap
    assert(fromState == direct)
  }
}
