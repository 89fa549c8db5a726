package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Dedup.minHashAccuracyCurve to an independent from-scratch
  * reference — MessageDigest md5, hand-rolled shingling, banding,
  * bucket bound, lane agreement and exact set Jaccard, integer
  * arithmetic throughout — so the operator's join shape carries
  * cross-implementation evidence. Plus: an identical pair estimates
  * exactly, prefix nesting (the k-lane estimate really is the first k
  * lanes of the one signature), and the sizes precondition.
  */
class MinHashAccuracySpec extends SparkSpec {

  import spark.implicits._

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  private def norm(t: String): String =
    t.toLowerCase.trim.replaceAll("\\s+", " ")

  private def shingles(t: String, n: Int): Seq[String] = {
    val toks = norm(t).split("\\s+", -1).filter(_.nonEmpty).toSeq
    if (toks.length < n) Seq.empty
    else toks.sliding(n).map(_.mkString(" ")).toSeq
  }

  /** 32-lane portable signature per the published construction: lane i
    * is 8 hex chars (i%4)*8.. of md5("(i/4):" ++ md5(shingle)), min
    * over shingles; sentinel when shingle-less. */
  private def signature(t: String): Vector[String] = {
    val hhs = shingles(t, 3).map(md5hex)
    (0 until 32).map { i =>
      if (hhs.isEmpty) Dedup.PortableSentinel
      else hhs.map(hh => md5hex(s"${i / 4}:$hh").substring((i % 4) * 8, (i % 4) * 8 + 8)).min
    }.toVector
  }

  private def reference(docs: Seq[(Long, String)],
                        sizes: Seq[Int]): Map[Int, (Long, Long, Long, Long)] = {
    val sigs = docs.map { case (id, t) => id -> signature(t) }.toMap
    val bands = docs.flatMap { case (id, _) =>
      (0 until 8).map(b => (b, md5hex((0 until 4).map(r => sigs(id)(4 * b + r)).mkString("|"))) -> id)
    }
    val buckets = bands.groupBy(_._1).filter(_._2.size <= 1000)
    val pairs = buckets.values.flatMap { members =>
      val ids = members.map(_._2).sorted
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    val sets = docs.map { case (id, t) => id -> shingles(t, 3).map(md5hex).toSet }.toMap
    val eligible = pairs.filter { case (a, b) => sets(a).nonEmpty && sets(b).nonEmpty }
    // zero candidates → zero rows, exactly as the operator's rollup
    if (eligible.isEmpty) Map.empty
    else sizes.map { k =>
      val errs = eligible.toSeq.map { case (a, b) =>
        val ni = (sets(a) & sets(b)).size.toLong
        val exact = ni * 1000000L / (sets(a).size + sets(b).size - ni)
        val agree = (0 until k).count(i => sigs(a)(i) == sigs(b)(i)).toLong
        agree * 1000000L / k - exact
      }
      k -> ((errs.size.toLong, errs.map(_.abs).sum / errs.size,
        errs.sum, errs.map(_.abs).max))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)],
                  sizes: Seq[Int]): Map[Int, (Long, Long, Long, Long)] =
    Dedup.minHashAccuracyCurve(docs.toDF("doc_id", "text"), "doc_id", "text",
        sizes = sizes)
      .as[(Int, Long, Long, Long, Long)].collect()
      .map { case (k, n, mae, se, mx) => k -> ((n, mae, se, mx)) }.toMap

  // near-dup rich corpus: template sentences with small edits so LSH
  // actually produces candidates at several similarity levels
  private def corpus: Seq[(Long, String)] = {
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    Seq(
      1L -> base,
      2L -> base, // identical
      3L -> base.replace("lazy", "sleepy"), // one-token edit
      4L -> base.replace("quick brown", "slow red"), // two-token edit
      5L -> "completely different text about spark shuffles and partitions going wide",
      6L -> (base + " and then some more words at the end of it"),
      7L -> "the quick brown fox jumps over the lazy dog", // prefix
      8L -> "tiny", // shingle-less (under 3 tokens)
      9L -> "also small" // shingle-less
    )
  }

  test("curve ≡ from-scratch reference (crafted near-dup corpus)") {
    val sizes = Seq(4, 8, 16, 32)
    val ref = reference(corpus, sizes)
    val got = run(corpus, sizes)
    assert(got.keySet === ref.keySet)
    sizes.foreach { k =>
      assert(got(k) === ref(k), s"k = $k")
      assert(got(k)._1 > 0L, s"k = $k must measure at least one pair")
    }
  }

  test("curve ≡ from-scratch reference (random corpora)") {
    val rnd = new scala.util.Random(11)
    val words = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    (0 until 3).foreach { trial =>
      val docs = (0 until 25).map { i =>
        (i.toLong,
          (0 until 8 + rnd.nextInt(8)).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
      }
      val sizes = Seq(8, 32)
      assert(run(docs, sizes) === reference(docs, sizes), s"trial $trial")
    }
  }

  test("an identical pair estimates exactly at every size") {
    val docs = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      2L -> "alpha beta gamma delta epsilon zeta eta theta")
    val got = run(docs, Seq(4, 32))
    Seq(4, 32).foreach { k =>
      val (n, mae, se, mx) = got(k)
      assert(n === 1L)
      assert((mae, se, mx) === ((0L, 0L, 0L)), s"k = $k")
    }
  }

  test("sizes beyond the signature are rejected") {
    intercept[IllegalArgumentException] {
      Dedup.minHashAccuracyCurve(corpus.toDF("doc_id", "text"),
        "doc_id", "text", sizes = Seq(64))
    }
  }
}
