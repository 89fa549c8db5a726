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
}
