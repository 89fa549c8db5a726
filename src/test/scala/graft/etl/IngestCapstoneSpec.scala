package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{DriftMonitor, NaiveBayes}

/** The capstone's contract, proven on a planted corpus that reaches
  * every rung of the verdict ladder (the sf fixtures never plant
  * exact_dup or suspect_3gram — the q188/q202 convention):
  *
  *  1. every verdict branch fires with its evidence;
  *  2. the NB composition point: the gate's decisions equal
  *     [[NaiveBayes.classifyIncremental]] over (warehouse state,
  *     survivors) — i.e. a from-scratch train over "corpus minus
  *     drops" — and the drops are MATERIAL (an en-labeled shell doc
  *     stuffed with French would have polluted the en class: the
  *     everything-trained model scores doc 106 differently);
  *  3. the planner composition point: shard routes equal
  *     [[ShardPlanner.replanShards]] fed ONLY the kept docs (dropped
  *     docs carry 10_000-char weights — including them would move
  *     the LPT placement);
  *  4. the PSI gate constants equal the member operator's sum.
  */
class IngestCapstoneSpec extends SparkSpec {
  import spark.implicits._

  // ---- planted corpus ------------------------------------------------
  // warehouse: ids 1-5 general, 201/202 the decontamination benchmark
  // (benchmark ids sit ABOVE the batch's so 13-gram/3-gram plants are
  // not near-dup-flagged by their own source doc: the near rung only
  // defers to SMALLER-id counterparts)
  private val w1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val wA = (1 to 40).map(i => f"nd$i%02d").mkString(" ")
  private val w3 = "bonjour merci oui non paris rouge bleu vert jaune noir blanc gris"
  private val w4 = "cat dog bird fish lion tiger bear wolf fox deer"
  private val w5 = "chien chat oiseau poisson cheval vache mouton cochon canard lapin"
  private val bench1 = (1 to 20).map(i => f"bn$i%02d").mkString(" ")
  private val bench2 = (1 to 8).map(i => s"cn$i").mkString(" ")

  private def docsDf(rows: Seq[(Long, String, String, String, Long)]): DataFrame =
    rows.toDF("doc_id", "lang", "source", "text", "n_chars")

  private val warehouse = docsDf(Seq(
    (1L, "en", "s1", w1, 120L),
    (2L, "en", "s1", wA, 200L),
    (3L, "fr", "s2", w3, 130L),
    (4L, "en", "s3", w4, 90L),
    (5L, "fr", "s3", w5, 95L),
    // fr-class boosters: doc 106 is classified against a model that
    // MERGES its own en-labeled counts (the q195 semantics), so its
    // four French tokens need class counts that beat the self-count's
    // 1-bit-per-token. One quad word per booster keeps the token
    // jaccard vs 106 at 1/13 — far under the near rung's 0.3.
    (6L, "fr", "s2", "bonjour bonjour bonjour zfr1 zfr2 zfr3 zfr4 zfr5 zfr6", 85L),
    (7L, "fr", "s2", "merci merci merci zfr7 zfr8 zfr9 zfr10 zfr11 zfr12", 85L),
    (8L, "fr", "s3", "paris paris paris zfr13 zfr14 zfr15 zfr16 zfr17 zfr18", 85L),
    (9L, "fr", "s3", "rouge rouge rouge zfr19 zfr20 zfr21 zfr22 zfr23 zfr24", 85L),
    (201L, "en", "s1", bench1, 110L),
    (202L, "en", "s2", bench2, 40L)))
  private val benchmark = warehouse.filter(col("doc_id") >= 200L)

  private val batch = docsDf(Seq(
    // exact dup of doc 1 (also a shell — exact wins, more specific)
    (101L, "en", "s1", w1, 10000L),
    // near dup of doc 2: same 39-word prefix, one new tail word
    (102L, "en", "s1",
      (1 to 39).map(i => f"nd$i%02d").mkString(" ") + " ndxx", 10000L),
    // shell doc, and MATERIAL to the NB composition: en-labeled but
    // built from doc 3's French lines — if not dropped, its tokens
    // would pollute the en class that scores doc 106
    (103L, "en", "s2", "bonjour merci oui non paris rouge", 10000L),
    // dirty: bench1's first 13 words verbatim + 30 unique words
    (104L, "en", "s2",
      (1 to 13).map(i => f"bn$i%02d").mkString(" ") + " " +
        (1 to 30).map(i => s"dzz$i").mkString(" "), 10000L),
    // suspect: 6 of its 7 distinct 3-grams are bench2's (857142 e6);
    // only 9 words, so no 13-gram can exist
    (105L, "en", "s3", bench2 + " uq1", 10000L),
    // nb_disagrees: declared en, four French-class tokens dominate
    // (token jaccard vs doc 3 is 4/15 < 0.3 — near rung can't fire)
    (106L, "en", "s3", "bonjour merci paris rouge nouveau grand petit", 150L),
    // kept, existing source s1
    (107L, "en", "s1", "cat dog bird tree river mountain", 160L),
    // kept, NEW source s4 (replan must place it)
    (108L, "en", "s4", "sun moon star cloud rain snow wind storm", 170L)))

  private lazy val result = IngestCapstone.ingestDecisions(
      warehouse, batch, benchmark,
      "doc_id", "lang", "source", "text", "n_chars")
    .collect().map(r => r.getLong(0) -> r).toMap

  private def s(id: Long, c: String) =
    Option(result(id).getAs[Any](c)).map(_.toString).orNull

  test("every verdict rung fires with its evidence") {
    assert(result.size == 8)
    assert(s(101, "verdict") == "exact_dup" && s(101, "survivor") == "1")
    // exact beats shell even though every segment of 101 is dead
    assert(result(101L).getAs[Long]("n_segments") == 4 &&
      result(101L).getAs[Long]("n_removed") == 4)
    assert(s(102, "verdict") == "near_dup" && s(102, "survivor") == "2")
    assert(s(103, "verdict") == "shell_doc" && s(103, "survivor") == null)
    assert(result(103L).getAs[Long]("n_segments") == 2 &&
      result(103L).getAs[Long]("n_removed") == 2)
    assert(s(104, "verdict") == "dirty_13gram" &&
      result(104L).getAs[Long]("n_dirty_13grams") == 1)
    assert(s(105, "verdict") == "suspect_3gram" &&
      result(105L).getAs[Long]("containment_e6") == 857142L)
    assert(s(106, "verdict") == "nb_disagrees" && s(106, "predicted") == "fr")
    assert(s(107, "verdict") == "kept" && s(107, "predicted") == "en")
    assert(s(108, "verdict") == "kept")
    // dropped docs are never routed
    Seq(101L, 102L, 103L, 104L, 105L, 106L).foreach { id =>
      assert(s(id, "shard") == null && s(id, "moved") == null)
    }
  }

  test("NB gate ≡ incremental classify over (warehouse state, survivors) " +
      "— and the drops are material") {
    val survivors = batch.filter(col("doc_id").isin(106L, 107L, 108L))
    val expected = NaiveBayes.classifyIncremental(
        NaiveBayes.wordCounts(warehouse, "lang", "text"),
        NaiveBayes.docCounts(warehouse, "lang"),
        survivors, "doc_id", "lang", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[String]("predicted"), r.getAs[Long]("margin_e16")))).toMap
    Seq(106L, 107L, 108L).foreach { id =>
      assert(s(id, "predicted") == expected(id)._1)
      assert(result(id).getAs[Long]("margin_e16") == expected(id)._2)
    }
    // materiality: a model that had kept the drops (warehouse ∪ FULL
    // batch) sees doc 103's French tokens inside the en class and
    // scores 106 differently — dedup drops really feed the priors
    val polluted = NaiveBayes.classifyIncremental(
        NaiveBayes.wordCounts(warehouse, "lang", "text"),
        NaiveBayes.docCounts(warehouse, "lang"),
        batch, "doc_id", "lang", "text")
      .filter(col("doc_id") === 106L).head()
    assert(polluted.getAs[Long]("margin_e16") !=
      result(106L).getAs[Long]("margin_e16"))
  }

  test("shard routes ≡ replanShards fed only the kept docs") {
    val existing = ShardPlanner.planShards(warehouse, "source", "n_chars", 4)
    val expected = ShardPlanner.replanShards(existing,
        batch.filter(col("doc_id").isin(107L, 108L))
          .select(col("source"), col("n_chars")),
        "source", "n_chars", numShards = 4, maxMoves = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(2), r.getBoolean(4)))).toMap
    Seq(107L -> "s1", 108L -> "s4").foreach { case (id, src) =>
      assert(result(id).getAs[Int]("shard") == expected(src)._1)
      assert(result(id).getAs[Boolean]("moved") == expected(src)._2)
    }
  }

  test("fromState tolerates unaggregated/duplicated mergeable state " +
      "rows (the append-only warehouse contract, r12)") {
    val st = IngestCapstone.ingestState(warehouse, benchmark,
      "doc_id", "lang", "source", "text", "n_chars")
    // mess up every relation the way append-only ingest would:
    // segment hashes and exact classes duplicated outright (their
    // merges are distinct/min — idempotent), NB counts split across
    // extra rows (their merge ADDS, so duplication would change
    // semantics; a 0-count companion row must not).
    val doubledHashes = st.segmentHashes.unionByName(st.segmentHashes)
    val doubledClasses = st.exactClasses.unionByName(st.exactClasses)
    val splitWc = st.nbWordCounts.unionByName(
      st.nbWordCounts.withColumn("c", lit(0L)))
    val splitDc = st.nbDocCounts.unionByName(
      st.nbDocCounts.withColumn("d", lit(0L)))
    val viaMessyState = IngestCapstone.ingestDecisionsFromState(
        st.copy(segmentHashes = doubledHashes,
          exactClasses = doubledClasses,
          nbWordCounts = splitWc, nbDocCounts = splitDc),
        batch, "doc_id", "lang", "source", "text", "n_chars")
      .collect().map(r => r.getLong(0) -> r.mkString("|")).toMap
    val clean = result.map { case (k, r) => k -> r.mkString("|") }
    assert(viaMessyState == clean)
  }

  test("persistState → readState (bucketed deployment layout, r13) " +
      "answers exactly the in-plan derive path") {
    val st = IngestCapstone.ingestState(warehouse, benchmark,
      "doc_id", "lang", "source", "text", "n_chars")
    IngestCapstone.persistState(st, "capstone_state_spec", buckets = 4)
    val viaPersisted = IngestCapstone.ingestDecisionsFromState(
        IngestCapstone.readState(spark, "capstone_state_spec"),
        batch, "doc_id", "lang", "source", "text", "n_chars")
      .collect().map(r => r.getLong(0) -> r.mkString("|")).toMap
    assert(viaPersisted == result.map { case (k, r) => k -> r.mkString("|") })
  }

  test("the band probe's warehouse side is exchange-free off the " +
      "persisted (band, bhash)-bucketed table (r13, VERDICT #1)") {
    val st = IngestCapstone.ingestState(warehouse, benchmark,
      "doc_id", "lang", "source", "text", "n_chars")
    IngestCapstone.persistState(st, "capstone_state_plan", buckets = 4)
    // the probe fragment itself (the full decision query pins the
    // dedup chain behind a localCheckpoint, so its final plan cannot
    // show the band join)
    val persisted = IngestCapstone.readState(spark, "capstone_state_plan")
    val p = graft.operators.Dedup.minHashLshIncremental(
        persisted.lshBands, persisted.docs, batch, "doc_id", "text",
        threshold = 0.3)
      .queryExecution.executedPlan.toString
    // walk from the bands-table scan up to its first Join ancestor:
    // the path must carry no Exchange (a local bucket Sort is fine) —
    // the probe shuffles only the batch-proportional side, never the
    // warehouse band state
    val lines = p.linesIterator.toVector
    def indent(l: String): Int = l.indexWhere(c => !" :+-".contains(c))
    val scanIdx = lines.indexWhere(l =>
      l.contains("Scan parquet") && l.contains("capstone_state_plan_bands"))
    assert(scanIdx >= 0, s"expected a scan of the persisted band table:\n$p")
    var i = scanIdx
    var d = indent(lines(scanIdx))
    val path = Seq.newBuilder[String]
    while (i > 0 && !lines(i).contains("Join")) {
      i -= 1
      if (indent(lines(i)) < d && indent(lines(i)) >= 0) {
        d = indent(lines(i)); path += lines(i)
      }
    }
    val ancestors = path.result()
    assert(ancestors.exists(_.contains("Join")),
      s"expected the band probe join above the scan:\n$p")
    assert(!ancestors.takeWhile(!_.contains("Join"))
        .exists(_.contains("Exchange")),
      s"the warehouse band state must reach its probe join without an " +
        s"Exchange:\n${ancestors.mkString("\n")}\n$p")
  }

  test("PSI constants equal the member operator's sum") {
    val psi = DriftMonitor.psiByBin(warehouse, batch, "n_chars", 100L)
      .agg(coalesce(sum(col("psi_term_e9")), lit(0L))).head().getLong(0)
    result.values.foreach { r =>
      assert(r.getAs[Long]("psi_e9") == psi)
      assert(r.getAs[Boolean]("drift_alert") == (psi >= 100000000L))
    }
  }
}
