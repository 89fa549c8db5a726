package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The JL sign-projection contract: deterministic md5-derived signs,
  * exact-long projection parity against an independent driver-side
  * reference, shortlist=corpus ≡ exact cosine search (the re-rank is
  * exact, so a full shortlist degenerates to brute force), and a recall
  * floor for the honest 100-shortlist at d=64 → k=16.
  */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val d = 64
  private val rnd = new scala.util.Random(164)
  private def randVec(): Seq[Float] = Seq.fill(d)(rnd.nextFloat() * 2f - 1f)
  private val corpus = (1L to 200L).map(i => (i, randVec()))
  private val probe = randVec()

  test("sign matrix is deterministic, ±1, and balanced-ish") {
    val a = RandomProjection.signs("rp", d, 16)
    val b = RandomProjection.signs("rp", d, 16)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    val flat = a.flatten
    assert(flat.forall(s => s == 1L || s == -1L))
    // md5 parity should be near-uniform; 1024 draws, allow wide margin
    val pos = flat.count(_ == 1L)
    assert(pos > 380 && pos < 644, s"suspiciously unbalanced: $pos/1024")
    // a different seed gives a different matrix
    val c = RandomProjection.signs("rp2", d, 16)
    assert(c.map(_.toSeq).toSeq !== a.map(_.toSeq).toSeq)
  }

  test("distributed projection matches the driver-side reference") {
    val sm = RandomProjection.signs("rp", d, 16)
    val got = RandomProjection
      .project(corpus.toDF("id", "vec"), "vec", "y", sm)
      .orderBy("id")
      .collect()
      .map(_.getSeq[Long](2).toSeq)
    val want = corpus.map { case (_, v) =>
      RandomProjection.projectQuery(v, sm)
    }
    assert(got.toSeq === want)
  }

  test("shortlist = corpus degenerates to exact cosine top-k") {
    val df = corpus.toDF("id", "vec")
    val jl = RandomProjection
      .jlRerankTopK(df, "id", "vec", probe, "rp", 16,
        shortlist = corpus.size, topK = 10)
      .select("id", "sim_e6")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = df
      .withColumn("sim", call_function("graft_cosine", col("vec"), typedlit(probe)))
      .filter(col("sim") > 0)
      .withColumn("sim_e6", floor(col("sim") * 1e6).cast("long"))
      .orderBy(col("sim_e6").desc, col("id").asc)
      .limit(10)
      .select("id", "sim_e6")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(jl === exact)
  }

  test("honest shortlist recalls planted near-neighbors at 4x compression") {
    // iid uniform vectors are the DEGENERATE case for any projection —
    // cosines concentrate and the exact top-10 is a set of near-ties a
    // 16-dim sketch cannot (and need not) order. The operative contract
    // is recalling genuinely-near vectors, so plant 10 of them: the
    // planted set IS the exact top-10 by a wide margin, and the JL
    // shortlist must surface it through the exact re-rank.
    val planted = (201L to 210L).map { i =>
      (i, probe.map(x => x + (rnd.nextFloat() - 0.5f) * 0.2f))
    }
    val df = (corpus ++ planted).toDF("id", "vec")
    val exact = df
      .withColumn("sim", call_function("graft_cosine", col("vec"), typedlit(probe)))
      .orderBy(col("sim").desc, col("id").asc)
      .limit(10)
      .select("id").as[Long].collect().toSet
    assert(exact === planted.map(_._1).toSet) // fixture sanity
    val jl = RandomProjection
      .jlRerankTopK(df, "id", "vec", probe, "rp", 16,
        shortlist = 50, topK = 10)
      .select("id").as[Long].collect().toSet
    assert((jl & exact).size === 10,
      s"planted near-neighbors lost by the JL shortlist: ${exact -- jl}")
  }

  test("projected values stay within the documented overflow envelope") {
    val sm = RandomProjection.signs("rp", d, 16)
    val ys = RandomProjection
      .project(corpus.toDF("id", "vec"), "vec", "y", sm)
      .select("y").collect().flatMap(_.getSeq[Long](0))
    val bound = d.toLong * (1L << 20)
    assert(ys.forall(y => math.abs(y) <= bound))
  }
}
