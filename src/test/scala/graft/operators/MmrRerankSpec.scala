package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins SimilaritySearch.mmrRerank to an independent sequential greedy
  * reference (plain Scala doubles, same left-to-right dot/norm order as
  * the graft_cosine kernel, same floor-e6 integerization) and to the
  * behavioral point of MMR: a near-duplicate of an already-selected hit
  * is deferred in favor of a diverse one.
  */
class MmrRerankSpec extends SparkSpec {

  import spark.implicits._

  private def cosE6(a: Seq[Float], b: Seq[Float]): Long = {
    var num = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      num += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    val den = math.sqrt(na) * math.sqrt(nb)
    val c = if (a.length != b.length || den == 0.0) 0.0 else num / den
    math.floor(c * 1e6).toLong
  }

  /** The definition, executed sequentially. */
  private def reference(corpus: Seq[(Long, Seq[Float])], probe: Seq[Float],
                        m: Int, k: Int): Seq[(Long, Long, Long, Long, Long)] = {
    val sl = corpus.map { case (id, v) => (id, v, cosE6(v, probe)) }
      .sortBy { case (id, _, r) => (-r, id) }.take(m)
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Float])]
    val remaining = scala.collection.mutable.ArrayBuffer(sl: _*)
    val out = Seq.newBuilder[(Long, Long, Long, Long, Long)]
    var rank = 1L
    while (rank <= k && remaining.nonEmpty) {
      val cands = remaining.map { case (id, v, r) =>
        val ms = if (selected.isEmpty) 0L
                 else selected.map { case (_, sv) => cosE6(v, sv) }.max
        (id, v, r, ms, r - ms)
      }
      val best = cands.minBy { case (id, _, _, _, s) => (-s, id) }
      out += ((rank, best._1, best._3, best._4, best._5))
      selected += ((best._1, best._2))
      remaining --= remaining.filter(_._1 == best._1)
      rank += 1
    }
    out.result()
  }

  private def run(corpus: Seq[(Long, Seq[Float])], probe: Seq[Float],
                  m: Int, k: Int): Seq[(Long, Long, Long, Long, Long)] =
    SimilaritySearch.mmrRerank(
      corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
      Seq(Tuple1(probe)).toDF("embedding"), "embedding", m = m, k = k)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq

  test("near-duplicate of the top hit is deferred for a diverse pick") {
    val probe = Seq(1f, 0f, 0f)
    val corpus = Seq(
      1L -> Seq(0.99f, 0.1f, 0f),   // best hit
      2L -> Seq(0.98f, 0.11f, 0f),  // its near-duplicate (2nd by relevance)
      3L -> Seq(0.7f, 0f, 0.7f))    // diverse, 3rd by relevance
    val got = run(corpus, probe, m = 3, k = 3)
    assert(got.map(_._2) === Seq(1L, 3L, 2L))
    assert(got === reference(corpus, probe, 3, 3))
  }

  test("matches the sequential reference on random corpora (several m/k)") {
    val rnd = new scala.util.Random(17)
    val dim = 8
    def vec(): Seq[Float] = Seq.fill(dim)(rnd.nextFloat() * 2 - 1)
    val corpus = (1L to 40L).map(i => i -> vec())
    val probe = vec()
    for ((m, k) <- Seq((20, 8), (10, 10), (40, 5), (3, 8))) {
      assert(run(corpus, probe, m, k) === reference(corpus, probe, m, k),
        s"m=$m k=$k")
    }
  }

  test("rank 1 is the pure relevance argmax; mmr never exceeds rel") {
    val rnd = new scala.util.Random(29)
    val corpus = (1L to 25L).map(i => i -> Seq.fill(6)(rnd.nextFloat()))
    val probe = Seq.fill(6)(rnd.nextFloat())
    val got = run(corpus, probe, m = 15, k = 6)
    val topRel = got.map(_._3).max
    assert(got.head._3 === topRel && got.head._4 === 0L)
    assert(got.forall { case (_, _, r, _, s) => s <= r })
    assert(got.map(_._2).distinct.size === got.size)
  }

  test("short corpus: k beyond shortlist emits what exists") {
    val corpus = Seq(1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f))
    val got = run(corpus, Seq(1f, 1f), m = 20, k = 8)
    assert(got.size === 2)
    assert(got.map(_._1) === Seq(1L, 2L))
  }
}
