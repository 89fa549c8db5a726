package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContentChunkingSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference chunker: code-point slicing (Spark substr
    * semantics), MessageDigest md5 over the window's UTF-8 bytes,
    * boundary iff the first hex nibble is '0'. */
  private def refChunks(text: String, w: Int): Vector[String] = {
    val cps = {
      val b = Vector.newBuilder[Int]
      var i = 0
      while (i < text.length) {
        val cp = text.codePointAt(i); b += cp; i += Character.charCount(cp)
      }
      b.result()
    }
    def sub(from: Int, until: Int): String =
      cps.slice(from, until).flatMap(Character.toChars(_)).mkString
    def isBoundary(endIncl: Int): Boolean = {
      val win = sub(endIncl - w + 1, endIncl + 1)
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(win.getBytes("UTF-8"))
      (d(0) & 0xf0) == 0
    }
    val n = cps.length
    val ends = (w to n - 1).filter(i => isBoundary(i - 1)).toVector :+ n
    // ends above are 1-based positions: candidate i in [w, n-1] checks
    // the window ending at character position i (0-based i-1)
    val uniq = ends.distinct
    uniq.zipWithIndex.map { case (e, k) =>
      val s = if (k == 0) 0 else uniq(k - 1)
      sub(s, e)
    }
  }

  private def run(docs: Seq[(Long, String)], w: Int): Map[Long, Seq[String]] =
    ContentChunking
      .withCdcChunks(docs.toDF("doc_id", "text"), "text", "chunks", w)
      .select(col("doc_id"), col("chunks"))
      .as[(Long, Seq[String])].collect().toMap

  private def runHof(docs: Seq[(Long, String)], w: Int): Map[Long, Seq[String]] =
    ContentChunking
      .withCdcChunksHof(docs.toDF("doc_id", "text"), "text", "chunks", w)
      .select(col("doc_id"), col("chunks"))
      .as[(Long, Seq[String])].collect().toMap

  test("kernel equals the declarative HOF twin (crafted + random + unicode)") {
    val rnd = new scala.util.Random(99)
    // code-point alphabet (indexing a raw string would split the
    // emoji's surrogate pair into invalid lone surrogates)
    val alpha = Vector("a", "b", "c", "d", "e", "f", " ", "😀", "\n", "é")
    val docs = Seq(1L -> "", 2L -> "tiny", 3L -> ("abcdefgh" * 12)) ++
      (10L to 40L).map { i =>
        i -> Seq.fill(rnd.nextInt(150))(alpha(rnd.nextInt(alpha.length))).mkString
      }
    Seq(1, 8, 16).foreach { w =>
      assert(run(docs, w) === runHof(docs, w), s"w=$w")
    }
  }

  private val w = 8

  test("chunks partition the text exactly (concatenation identity)") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "short",
      3L -> "",
      4L -> ("abcdefgh" * 20))
    val got = run(docs, w)
    docs.foreach { case (id, t) =>
      assert(got(id).mkString === t, s"doc $id must rebuild exactly")
    }
  }

  test("matches the independent reference chunker (crafted + supplementary chars)") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "a b c d e f g h i j k l m n o p q r s t u v w x y z",
      3L -> "emoji 😀 and supplementary 𐐀 characters mix in",
      4L -> "tiny",
      5L -> "exactly8!")
    val got = run(docs, w)
    docs.foreach { case (id, t) =>
      assert(got(id) === refChunks(t, w), s"doc $id chunk mismatch")
    }
  }

  test("matches the reference on random strings") {
    val rnd = new scala.util.Random(174)
    val alpha = "abcdefgh \n"
    val docs = (1L to 40L).map { i =>
      i -> Seq.fill(rnd.nextInt(200))(alpha(rnd.nextInt(alpha.length))).mkString
    }
    val got = run(docs, w)
    docs.foreach { case (id, t) =>
      assert(got(id) === refChunks(t, w), s"doc $id chunk mismatch")
    }
  }

  test("a text shorter than w+1 is a single chunk; empty text one empty chunk") {
    val got = run(Seq(1L -> "1234567", 2L -> "12345678", 3L -> ""), w)
    assert(got(1L) === Seq("1234567"))
    // len == w: only candidate end is len itself
    assert(got(2L) === Seq("12345678"))
    assert(got(3L) === Seq(""))
  }

  test("boundaries realign after an insertion (the CDC property shingle/segment units lack)") {
    // doc B = doc A with a prefix insertion. Past the edit + one window,
    // the boundary rule sees identical windows -> identical chunk grid;
    // composing with SegmentDedup removes B's shared tail chunk-for-chunk.
    val base = ("the quick brown fox jumps over the lazy dog while the " +
      "cat naps on the warm mat near the door and the bird sings") * 3
    val edited = "INSERTED PREFIX >>> " + base
    val a = refChunks(base, w)
    val b = refChunks(edited, w)
    val shared = b.count(a.toSet)
    assert(shared >= b.size / 2,
      s"most of the edited doc's chunks must realign (got $shared/${b.size})")
    val cleaned = SegmentDedup.dedupSegmentArray(
        ContentChunking.withCdcChunks(
          Seq(1L -> base, 2L -> edited).toDF("doc_id", "text"),
          "text", "chunks", w)
          .select(col("doc_id"), col("chunks")),
        "doc_id", "chunks", "")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(cleaned(2L)._4 >= shared - 2,
      "the realigned tail must dedupe against doc A")
    assert(cleaned(1L)._2.nonEmpty)
  }

  test("w=1 degenerates to per-character boundary candidates and still partitions") {
    val got = run(Seq(1L -> "hello world, hello chunking"), 1)
    assert(got(1L).mkString === "hello world, hello chunking")
    assert(got(1L).forall(_.nonEmpty))
  }
}
