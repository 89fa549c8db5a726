package graft.operators

import graft.SparkSpec
import graft.functions.TextAnalysis
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 1
    (3L, "completely different content about spark query engines and shuffles"),
    (4L, "The  Quick  Brown fox jumps over the lazy dog near the river bank"), // exact dup of 1 mod case/ws
    (5L, "another unrelated document mentioning joins aggregates and windows"))
    .toDF("doc_id", "text")

  test("exactDedup: case/whitespace-insensitive, keeps first by tie-break") {
    val out = Dedup.exactDedup(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L, 3L, 5L)) // 4 deduped against 1
  }

  test("minHashLsh finds the near-dup pair and not unrelated pairs") {
    val pairs = Dedup.minHashLsh(docs, "doc_id", "text",
      numPerms = 32, numBands = 16, shingleN = 3, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) || pairs.contains((1L, 4L)))
    assert(pairs.contains((1L, 4L))) // exact dup always collides
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc never pairs
  }

  test("minHashLshIncremental ≡ full rebuild filtered to batch-involving " +
      "pairs, on planted dups straddling the split (r10)") {
    // planted near-dups across every pair class: batch↔warehouse
    // (10,11), batch↔batch (12,14), warehouse↔warehouse (1,3 — must
    // NOT appear), plus unrelated noise
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappaX"),
      (5L, "totally different warehouse content about catalyst rules"),
      (10L, "one two three four five six seven eight nine ten eleven"),
      (11L, "one two three four five six seven eight nine ten twelve"),
      (12L, "red orange yellow green blue indigo violet ultraviolet rays"),
      (14L, "red orange yellow green blue indigo violet infrared rays"),
      (7L, "unrelated batch noise mentioning broadcast joins and skew"))
      .toDF("doc_id", "text")
    val isBatch = col("doc_id") % 2 === 0 || col("doc_id") === 7L
    val wh = corpus.filter(!isBatch)
    val batch = corpus.filter(isBatch)
    val incr = Dedup.minHashLshIncremental(
        Dedup.lshBandWarehouse(wh, "doc_id", "text", 32, 8, 3),
        wh, batch, "doc_id", "text",
        numPerms = 32, numBands = 8, shingleN = 3, threshold = 0.3)
      .select("id_a", "id_b", "n_common", "n_union")
      .as[(Long, Long, Int, Int)].collect().toSet
    val bids = batch.select("doc_id").as[Long].collect().toSet
    val full = Dedup.minHashLshPortable(corpus, "doc_id", "text",
        numPerms = 32, numBands = 8, shingleN = 3, threshold = 0.3)
      .select("id_a", "id_b", "n_common", "n_union")
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(incr === full.filter(p => bids(p._1) || bids(p._2)))
    // the planted cross and within-batch dups really are found...
    assert(incr.exists(p => (p._1, p._2) == ((10L, 11L)))) // batch↔warehouse
    assert(incr.exists(p => (p._1, p._2) == ((12L, 14L)))) // batch↔batch
    // ...and the warehouse-internal dup (present in the full rebuild)
    // is correctly absent from the batch-involving answer
    assert(full.exists(p => p._1 == 1L && p._2 == 3L))
    assert(!incr.exists(p => p._1 == 1L && p._2 == 3L))
  }

  test("simHashNearDupIncremental ≡ N² Hamming scan filtered to " +
      "batch-involving pairs (pigeonhole exhaustiveness, r10)") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // wh exact dup of 1
      (7L, "one two three four five six seven eight nine ten eleven"),
      (14L, "one two three four five six seven eight nine ten eleven"), // batch exact dup of 7
      (21L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // batch dup of wh 1/3
      (5L, "completely different content about spark catalyst and codegen"))
      .toDF("doc_id", "text")
    val isBatch = col("doc_id") % 7 === 0
    val wh = corpus.filter(!isBatch)
    val batch = corpus.filter(isBatch)
    val incr = Dedup.simHashNearDupIncremental(
        Dedup.simHashHexTable(wh, "doc_id", "text"),
        batch, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect().toSet
    // reference: N² over ALL fingerprints, then batch-involving filter
    val fps = Dedup.simHashHexTable(corpus, "doc_id", "text")
      .as[(Long, String)].collect()
    def ham(a: String, b: String): Long =
      a.zip(b).map { case (x, y) =>
        java.lang.Integer.bitCount(
          Integer.parseInt(x.toString, 16) ^ Integer.parseInt(y.toString, 16))
      }.sum.toLong
    val bids = Set(7L, 14L, 21L)
    val full = (for {
      (ia, ha) <- fps; (ib, hb) <- fps if ia < ib
      h = ham(ha, hb) if h <= 3
    } yield (ia, ib, h)).toSet
    assert(incr === full.filter(p => bids(p._1) || bids(p._2)))
    assert(incr.contains((7L, 14L, 0L)))  // batch↔batch exact dup
    assert(incr.contains((1L, 21L, 0L)))  // batch↔warehouse exact dup
    assert(full.contains((1L, 3L, 0L)))   // warehouse-internal dup...
    assert(!incr.exists(p => p._1 == 1L && p._2 == 3L)) // ...absent
  }

  test("packed-halves Hamming ≡ hexHamming (the r17 per-pair verify " +
      "diet: conv 32-bit halves + xor + bit_count vs the nibble chain)") {
    val rnd = new scala.util.Random(42)
    def hex16() = Seq.fill(16)("0123456789abcdef"(rnd.nextInt(16))).mkString
    val rows = Seq.fill(200)((hex16(), hex16())) :+
      (("0" * 16, "f" * 16)) :+ (("0" * 16, "0" * 16)) :+
      (("ffffffff00000000", "00000000ffffffff"))
    val df = rows.toDF("a", "b")
    def packed(c: org.apache.spark.sql.Column) = (
      conv(substring(c, 1, 8), 16, 10).cast("long"),
      conv(substring(c, 9, 8), 16, 10).cast("long"))
    val (ahi, alo) = packed(col("a")); val (bhi, blo) = packed(col("b"))
    val out = df.select(
        Dedup.hexHamming(col("a"), col("b")).as("nib"),
        (bit_count(ahi.bitwiseXOR(bhi)) + bit_count(alo.bitwiseXOR(blo)))
          .cast("long").as("pk"))
      .as[(Long, Long)].collect()
    out.foreach { case (nib, pk) => assert(nib === pk) }
  }

  test("q188 decision semantics: exact beats near, survivors chain " +
      "deterministically (branch the sf fixtures don't reach)") {
    // 1 ← near-dup family {1,2}; 4 is an exact dup of 1 (case/ws) AND
    // therefore also in 1's near-dup component — exact must win the
    // reason and the survivor must be the exact keeper
    val decisions = Dedup.dedupDecisions(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getString(2), r.getLong(3)))).toMap
    assert(decisions(1L) === ((true, "kept", 1L)))
    assert(decisions(4L)._2 === "exact_dup")
    assert(decisions(4L)._3 === 1L)
    assert(!decisions(4L)._1)
    // 2 is a near-dup of 1 (one token differs) but not an exact dup
    assert(decisions(2L) === ((false, "near_dup", 1L)))
    // unrelated docs keep themselves
    assert(decisions(3L) === ((true, "kept", 3L)))
    assert(decisions(5L) === ((true, "kept", 5L)))
  }

  test("incremental ≡ full-filtered holds on random corpora and random " +
      "splits (LSH and SimHash warehouses, seeded property sweep)") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    for (round <- 1 to 3) {
      val corpus = (1L to 40L).map { id =>
        // clusters of near-dups: base text per id%6 family + light noise
        val base = Seq.fill(8)(vocab((id % 6).toInt + rnd.nextInt(2))).zipWithIndex
          .map { case (w, i) => if (rnd.nextInt(10) == 0) vocab(rnd.nextInt(8)) else w + i }
        (id, base.mkString(" "))
      }.toDF("doc_id", "text")
      val m = 2 + rnd.nextInt(4)
      val isBatch = col("doc_id") % m === 0
      val wh = corpus.filter(!isBatch)
      val batch = corpus.filter(isBatch)
      val bids = batch.select("doc_id").as[Long].collect().toSet

      val lshIncr = Dedup.minHashLshIncremental(
          Dedup.lshBandWarehouse(wh, "doc_id", "text", 32, 8, 3),
          wh, batch, "doc_id", "text", 32, 8, 3, threshold = 0.3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val lshFull = Dedup.minHashLshPortable(corpus, "doc_id", "text",
          32, 8, 3, threshold = 0.3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(lshIncr === lshFull.filter(p => bids(p._1) || bids(p._2)),
        s"LSH round $round (mod $m)")

      val shIncr = Dedup.simHashNearDupIncremental(
          Dedup.simHashHexTable(wh, "doc_id", "text"),
          batch, "doc_id", "text", maxHamming = 3)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val fps = Dedup.simHashHexTable(corpus, "doc_id", "text")
        .as[(Long, String)].collect()
      def ham(a: String, b: String): Int =
        a.zip(b).map { case (x, y) =>
          java.lang.Integer.bitCount(
            Integer.parseInt(x.toString, 16) ^ Integer.parseInt(y.toString, 16))
        }.sum
      val shFull = (for {
        (ia, ha) <- fps; (ib, hb) <- fps
        if ia < ib && ham(ha, hb) <= 3
      } yield (ia, ib)).toSet
      assert(shIncr === shFull.filter(p => bids(p._1) || bids(p._2)),
        s"SimHash round $round (mod $m)")
    }
  }

  test("minHash signatures are deterministic across evaluations, MaxValue for short docs") {
    def sigs() = Dedup.minHashSignatures(docs, "doc_id", "text", 16, 3)
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    assert(sigs().toSeq == sigs().toSeq)
    val short = Dedup.minHashSignatures(Seq((9L, "one two")).toDF("doc_id", "text"),
      "doc_id", "text", 4, 3).as[(Long, Seq[Long])].head()
    assert(short._2.forall(_ == Long.MaxValue)) // no shingles → sentinel slots
  }

  test("graft_minhash kernel equals the declarative signature pipeline") {
    val rnd = new scala.util.Random(9)
    val words = Seq("fox", "dog", "née", "42", "the", "a", "über")
    val cases = Seq(
      "", "one", "one two", "one two three", // 0/1/2/3 tokens: sentinel edge
      "  padded   whitespace  runs\tand tabs ", // normalization input
      "née über ϕϑ mixed unicode tokens here okay",
      "same same same same same" // identical shingles
    ) ++ (1 to 40).map(_ =>
      (1 to 3 + rnd.nextInt(25)).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val kernel = graft.operators.Dedup
      .minHashSignaturesPortable(df, "doc_id", "text", 32, 3)
    val declar = graft.operators.Dedup
      .minHashSignaturesPortableDeclarative(df, "doc_id", "text", 32, 3)
    assert(kernel.exceptAll(declar).isEmpty && declar.exceptAll(kernel).isEmpty)
  }

  test("graft_simhash kernel equals the declarative vote pipeline") {
    val rnd = new scala.util.Random(13)
    val words = Seq("fox", "dog", "née", "42", "the", "a", "über")
    val cases = Seq("", " ", "one", "  padded  runs ", "née über ϕϑ unicode") ++
      (1 to 40).map(_ =>
        (1 to 1 + rnd.nextInt(25)).map(_ => words(rnd.nextInt(words.size))).mkString(" "))
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val kernel = graft.operators.Dedup.simHashHexTable(df, "doc_id", "text")
    val declar = graft.operators.Dedup.simHashHexTableDeclarative(df, "doc_id", "text")
    assert(kernel.exceptAll(declar).isEmpty && declar.exceptAll(kernel).isEmpty)
  }

  test("simHash: near-dups within small hamming distance, unrelated far") {
    val hashes = Dedup.simHashTable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hashes(1L), hashes(4L)) == 0) // normalized-identical
    assert(hamming(hashes(1L), hashes(2L)) <= 16) // near-dup: one word differs
    assert(hamming(hashes(1L), hashes(3L)) > 16) // unrelated
  }

  test("embeddingNearDupIncremental ≡ full rebuild filtered to " +
    "batch-involving pairs, on every 2-vs-rest split") {
    // three planted near-dup groups (identical/near vectors) + noise;
    // small dims so the 6-plane buckets actually collide
    def vec(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val rows = Seq(
      (1L, vec(1.0, 0.0, 0.1, 0.0)),
      (2L, vec(0.99, 0.01, 0.1, 0.0)),  // ~dup of 1
      (3L, vec(0.0, 1.0, 0.0, 0.1)),
      (4L, vec(0.01, 0.99, 0.0, 0.1)),  // ~dup of 3
      (5L, vec(-1.0, -0.5, 0.3, -0.2)), // unrelated
      (6L, vec(0.98, 0.02, 0.12, 0.01)) // third member of group 1
    )
    val df = rows.toDF("vec_id", "embedding")
    val full = Dedup.embeddingNearDup(df, "vec_id", "embedding",
        threshold = 0.8, numPlanes = 4, dim = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(full.nonEmpty, "fixture must contain near-dups")
    val ids = rows.map(_._1)
    for (a <- ids; b <- ids if a < b) {
      val batchIds = Set(a, b)
      val inc = Dedup.embeddingNearDupIncremental(
          Dedup.embeddingSigWarehouse(
            df.filter(!col("vec_id").isin(batchIds.toSeq: _*)),
            "vec_id", "embedding", numPlanes = 4, dim = 4),
          df.filter(col("vec_id").isin(batchIds.toSeq: _*)),
          "vec_id", "embedding", threshold = 0.8, numPlanes = 4, dim = 4)
        .as[(Long, Long, Long)].collect().toSet
      val expect = full.filter(p =>
        batchIds.contains(p._1) || batchIds.contains(p._2))
      assert(inc === expect, s"batch {$a,$b}")
    }
  }

  test("clusterLabelVote: majority wins, ties break label-ascending, " +
    "singletons vote for themselves") {
    val base = "the quick brown fox jumps over the lazy dog by the river bank"
    val corpus = Seq(
      // a 3-doc near-dup cluster: labels en, en, fr → majority en
      (1L, "en", base),
      (2L, "en", base + " x"),
      (3L, "fr", base + " y"),
      // a 2-doc cluster with a label tie: de vs da → 'da' (ascending)
      (10L, "de", "alpha beta gamma delta epsilon zeta eta theta iota"),
      (11L, "da", "alpha beta gamma delta epsilon zeta eta theta kappa"),
      // a singleton
      (20L, "zh", "completely unrelated text about spark partitions")
    ).toDF("doc_id", "lang", "text")
    val out = Dedup.clusterLabelVote(corpus, "doc_id", "lang", "text")
      .as[(Long, String, Long, String, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out.size === 6)
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id)._4 === "en", s"doc $id cluster label")
      assert(out(id)._5 === 3L)
      assert(out(id)._6 === 2L)
    }
    assert(!out(3L)._7 && out(1L)._7) // the fr label is the suspect
    Seq(10L, 11L).foreach { id =>
      assert(out(id)._4 === "da", s"doc $id tie must break ascending")
      assert(out(id)._6 === 1L)
    }
    assert(out(20L)._4 === "zh" && out(20L)._5 === 1L && out(20L)._7)
  }

  test("jaccard: exact set semantics") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y"))).as[Double].head()
    assert(j == 0.5) // |{b,c}| / |{a,b,c,d}|
  }

  test("shingles: windows of n tokens, short docs yield empty") {
    val df = Seq("a b c d", "a b").toDF("t")
    val out = df.select(TextAnalysis.shingles(split(col("t"), " "), 3).as("s"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1).isEmpty)
  }

  test("leakage-safe split: every member of a component draws the same side") {
    // chain 0-1-2 is one component; 10 and 20 are singletons
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val nodes = Seq(0L, 1L, 2L, 10L, 20L).toDF("id")
    val split = graft.operators.ConnectedComponents.auto(pairs, nodes)
      .withColumn("split",
        when(substring(md5(col("component").cast("string")), 1, 2) < "1a",
          lit("eval")).otherwise(lit("train")))
    val perComponent = split.groupBy("component")
      .agg(countDistinct(col("split")).as("n_sides"))
      .as[(Long, Long)].collect()
    assert(perComponent.forall(_._2 == 1L), perComponent.toSeq)
    // the rule is a function of the component label alone → doc-level
    // re-draws (the leakage bug this operator exists to prevent) would
    // show as n_sides > 1 on the 3-member chain
    assert(split.filter(col("component") === 0L).count() == 3)
  }
}
