package graft.operators

import graft.SparkSpec
import graft.functions.IntLog2
import org.apache.spark.sql.functions._

/** Pins SourceDivergence.klMatrix to an independent brute-force
  * reference that evaluates the DEFINITION — the |V|-term sum per
  * ordered pair over the full global vocabulary, BigInt throughout —
  * so the operator's factored algebra (A − B − J − K·(N+V)) carries
  * cross-implementation evidence, not just self-consistency. Plus the
  * clamp/asymmetry/identity edge cases.
  */
class SourceDivergenceSpec extends SparkSpec {

  import spark.implicits._

  /** Brute force per the definition: KLnum(a,b) =
    * Σ_{w∈V} (c_a+1)·[lg(c_a+1) − lg(c_b+1) − (lg(N_a+V) − lg(N_b+V))],
    * kl_e9 = (10⁹·max(KLnum,0)) / ((N_a+V)·2^16) truncated. */
  private def reference(docs: Seq[(String, String)]): Map[(String, String), (Long, Long)] = {
    val lg = (x: Long) => BigInt(IntLog2.ilog2e16(x))
    val counts: Map[String, Map[String, Long]] = docs
      .groupBy(_._1)
      .map { case (src, ds) =>
        src -> ds.flatMap(_._2.split("\\s+", -1)).filter(_.nonEmpty)
          .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      }
    val vocab = counts.values.flatMap(_.keys).toSet
    val v = vocab.size.toLong
    val n = counts.map { case (s, m) => s -> m.values.sum }
    val out = for {
      a <- counts.keys; b <- counts.keys; if a != b
    } yield {
      val ka = lg(n(a) + v) - lg(n(b) + v)
      var num = BigInt(0)
      vocab.foreach { w =>
        val ca = counts(a).getOrElse(w, 0L)
        val cb = counts(b).getOrElse(w, 0L)
        num += BigInt(ca + 1) * (lg(ca + 1) - lg(cb + 1) - ka)
      }
      val shared = (counts(a).keySet & counts(b).keySet).size.toLong
      val kl = (BigInt(1000000000) * num.max(0)) / (BigInt(n(a) + v) * 65536)
      (a, b) -> (shared, kl.toLong)
    }
    out.toMap
  }

  private def run(docs: Seq[(String, String)]): Map[(String, String), (Long, Long)] =
    SourceDivergence.klMatrix(docs.toDF("source", "text"), "source", "text")
      .as[(String, String, Long, Long)].collect()
      .map { case (a, b, s, k) => (a, b) -> (s, k) }.toMap

  test("matrix ≡ brute-force definition (crafted)") {
    val docs = Seq(
      "web" -> "the cat sat on the mat",
      "web" -> "the dog sat",
      "code" -> "def f x return x x",
      "code" -> "class y def g",
      "chat" -> "hello hello the cat")
    assert(run(docs) === reference(docs))
  }

  test("matrix ≡ brute-force definition (random corpora, disjoint + overlapping)") {
    val rnd = new scala.util.Random(41)
    val words = Vector("a", "bb", "ccc", "dd", "e", "fff", "gg", "hhh", "ij", "k")
    val docs = (0 until 60).map { i =>
      val src = s"s${i % 4}"
      // source s3 draws from a disjoint sub-vocabulary
      val pool = if (i % 4 == 3) words.map(_ + "!") else words
      src -> Seq.fill(1 + rnd.nextInt(20))(pool(rnd.nextInt(pool.size))).mkString(" ")
    }
    assert(run(docs) === reference(docs))
  }

  test("identical sources clamp to zero; divergence is asymmetric") {
    val docs = Seq(
      "a" -> "x y z x", "b" -> "x y z x",
      "c" -> "x x x x x x x x y")
    val m = run(docs)
    assert(m(("a", "b"))._2 === 0L)
    assert(m(("b", "a"))._2 === 0L)
    assert(m(("a", "c"))._2 !== m(("c", "a"))._2)
    assert(m(("a", "c"))._2 > 0L)
  }

  test("empty-text and null-ish docs don't poison the matrix") {
    val docs = Seq("a" -> "x y", "a" -> "", "b" -> "x z", "b" -> "   ")
    assert(run(docs) === reference(docs))
  }

  test("incremental ≡ from-scratch at random batch splits (counts are mergeable)") {
    val rnd = new scala.util.Random(53)
    val words = Vector("u", "vv", "w", "xx", "y", "zz")
    val docs = (0 until 40).map { i =>
      s"s${i % 3}" -> Seq.fill(1 + rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" ")
    }
    val full = run(docs)
    for (seed <- Seq(1, 2, 3)) {
      val r2 = new scala.util.Random(seed)
      val (wh, batch) = docs.partition(_ => r2.nextBoolean())
      val whCounts = SourceDivergence.tokenCounts(
        wh.toDF("source", "text"), "source", "text")
      val got = SourceDivergence.klMatrixIncremental(
        whCounts, batch.toDF("source", "text"), "source", "text")
        .as[(String, String, Long, Long)].collect()
        .map { case (a, b, s, k) => (a, b) -> (s, k) }.toMap
      assert(got === full, s"seed=$seed")
    }
  }

  test("diverging terms: exact per-word contributions, top-k, tie order") {
    val docs = Seq(
      "a" -> "alpha alpha alpha beta shared shared",
      "b" -> "gamma gamma shared shared shared")
    val lg = (x: Long) => IntLog2.ilog2e16(x)
    val counts = Map(
      "a" -> Map("alpha" -> 3L, "beta" -> 1L, "shared" -> 2L),
      "b" -> Map("gamma" -> 2L, "shared" -> 3L))
    val v = 4L // alpha beta gamma shared
    val n = Map("a" -> 6L, "b" -> 5L)
    def contrib(src: String, dst: String, w: String): Long = {
      val ca = counts(src).getOrElse(w, 0L); val cb = counts(dst).getOrElse(w, 0L)
      val kab = lg(n(src) + v) - lg(n(dst) + v)
      (ca + 1) * (lg(ca + 1) - lg(cb + 1) - kab)
    }
    val got = SourceDivergence
      .divergingTerms(docs.toDF("source", "text"), "source", "text", k = 2)
      .as[(String, String, Long, Long, String)].collect()
      .map { case (a, b, r, c, w) => (a, b, r) -> (w, c) }.toMap
    // a vs b: alpha (over-represented, absent in b) must lead
    val expAB = counts("a").keys.map(w => w -> contrib("a", "b", w)).toSeq
      .sortBy { case (w, c) => (-c, w) } // word DESC on ties == reverse asc only if no ties; none here
    assert(got(("a", "b", 1L)) === ((expAB.head._1, expAB.head._2)))
    assert(got(("a", "b", 1L))._1 === "alpha")
    val expBA = counts("b").keys.map(w => w -> contrib("b", "a", w)).toSeq
      .sortBy { case (w, c) => (-c, w) }
    assert(got(("b", "a", 1L)) === ((expBA.head._1, expBA.head._2)))
    assert(got(("b", "a", 1L))._1 === "gamma")
    // k caps the per-pair output
    assert(got.keys.count { case (a, b, _) => a == "a" && b == "b" } === 2)
  }
}
