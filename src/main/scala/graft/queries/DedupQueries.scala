package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.TextAnalysis
import graft.operators.Dedup

/** Deduplication query set over `documents`: exact-hash dedup, keep-first
  * dedup, pairwise n-gram Jaccard, MinHash-LSH, SimHash, perceptual image
  * hash, near-dup components/survivors, and authority rank — ALL
  * hash-matched against generated DuckDB oracles (the portable md5-keyed
  * hash paths exist precisely so LSH banding is oracle-expressible;
  * ScalaTest additionally pins the fast xxhash64 production paths to the
  * portable ones on constructed near-dup fixtures).
  */
object DedupQueries {

  // Exact-dup stats: corpus size vs distinct normalized texts.
  private def q35(s: SparkSession, d: String): DataFrame =
    documents(s, d).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(Dedup.normalized(col("text"))).as("n_distinct"),
      (count(lit(1)) - countDistinct(Dedup.normalized(col("text")))).as("n_dup_rows"))

  // Keep-first exact dedup — the surviving rows (S5-style row_number
  // semantics over a content hash).
  private def q36(s: SparkSession, d: String): DataFrame =
    Dedup.exactDedup(documents(s, d), "text", "doc_id")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy(col("doc_id"))

  // n-gram Jaccard between consecutive docs (deterministic pair choice;
  // the pairwise-similarity kernel LSH verification uses).
  private def q37(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
      .select(col("doc_id"),
        array_distinct(TextAnalysis.tokens(col("text"))).as("toks"))
    docs.as("a")
      .join(docs.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.toks"), col("b.toks"))).as("n_common"),
        size(array_union(col("a.toks"), col("b.toks"))).as("n_union"),
        Dedup.jaccard(col("a.toks"), col("b.toks")).as("jaccard"))
      .orderBy(col("doc_a"))
  }

  // MinHash-LSH near-dup candidates on the PORTABLE (md5-keyed) signature
  // path — every hash is reproduced by the DuckDB oracle below, so the
  // banded bucket join + exact-Jaccard verification is hash-checked end to
  // end. The xxhash64 production path shares the same lshVerify tail and
  // stays spec-covered (DedupSpec recall fixtures).
  private def q38(s: SparkSession, d: String): DataFrame =
    Dedup.minHashLshPortable(documents(s, d), "doc_id", "text",
      numPerms = 32, numBands = 8, shingleN = 3, threshold = 0.3)
      .select(col("id_a"), col("id_b"), col("n_common"), col("n_union"),
        floor(col("jaccard") * 1e6).cast("long").as("jaccard_e6"))
      .orderBy(col("id_a"), col("id_b"))

  // SimHash fingerprints on the portable md5-bit path (oracle-checked
  // nibble by nibble; the xxhash64 long variant stays spec-covered).
  private def q39(s: SparkSession, d: String): DataFrame =
    Dedup.simHashHexTable(documents(s, d), "doc_id", "text")
      .select(col("id").as("doc_id"), col("simhash_hex"))
      .orderBy(col("doc_id"))

  // Near-dup CLUSTERS: the LSH candidate pairs become an edge set and
  // min-label connected components assign every doc its cluster (minimum
  // member doc_id) — the keep-one-per-component shape a corpus-scale
  // dedup pass actually executes. Isolated docs are singleton clusters.
  private def q69(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.minHashLshPortable(documents(s, d), "doc_id", "text",
      numPerms = 32, numBands = 8, shingleN = 3, threshold = 0.3)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val nodes = documents(s, d).select(col("doc_id").as("id"))
    // `auto`, not `minLabel`: a long chain of paraphrases (graph diameter
    // past the round budget) would make plain min-label silently return
    // split clusters with only a log warning; auto falls back to the
    // diameter-independent star alternation (VERDICT r3 item 2).
    val comps = graft.operators.ConnectedComponents.auto(pairs, nodes)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("component"))
    comps.select(col("id").as("doc_id"), col("component"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .orderBy(col("doc_id"))
  }

  // Dedup corpus reassembly: after near-dup clustering (q69's operator
  // chain), KEEP one representative per component (the minimum doc_id —
  // exactly the component label) and roll up the surviving corpus per
  // source. This is the deliverable of a dedup pass — the retained
  // document set — not just the cluster stats. One left join against the
  // (small) component table plus one rollup shuffle.
  private def q80(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.minHashLshPortable(documents(s, d), "doc_id", "text",
      numPerms = 32, numBands = 8, shingleN = 3, threshold = 0.3)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val nodes = documents(s, d).select(col("doc_id").as("id"))
    // auto (not minLabel) for the same high-diameter safety as q69.
    val kept = graft.operators.ConnectedComponents.auto(pairs, nodes)
      .filter(col("id") === col("component"))
      .select(col("id").as("doc_id"), lit(1L).as("keep"))
    documents(s, d)
      .join(kept, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("keep"), lit(0L))).as("n_kept"),
        sum(when(col("keep").isNotNull, col("n_chars")).otherwise(0L))
          .as("kept_chars"))
      .orderBy(col("source"))
  }

  // Incremental ingest dedup: a new batch (doc_id % 7 = 0 simulates the
  // day's crawl) is checked against the warehouse (the rest) — exact dups
  // by normalized content hash (broadcast-able distinct hash set) and
  // near-dups from the CROSS-SPLIT LSH band join (batch bands probe
  // warehouse bands only — within-side candidate pairs are never
  // generated, let alone Jaccard-verified; the full-corpus pair list
  // would spend ~76% of its verification work on warehouse-internal
  // pairs nobody asked about). Per batch doc: the dedup decision an
  // ingest pipeline acts on. At 100 TB the batch side is small — both
  // probes broadcast.
  private def q84(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val isBatch = (c: org.apache.spark.sql.Column) => pmod(c, lit(7)) === 0
    val whHashes = docs.filter(!isBatch(col("doc_id")))
      .select(md5(Dedup.normalized(col("text"))).as("h")).distinct()
      .withColumn("x", lit(1))
    val exact = docs.filter(isBatch(col("doc_id")))
      .select(col("doc_id"), md5(Dedup.normalized(col("text"))).as("h"))
      .join(whHashes, Seq("h"), "left")
      .select(col("doc_id"), col("x").isNotNull.as("is_exact_dup"))
    val near = Dedup.minHashLshPortableCross(docs, "doc_id", "text",
      isLeft = isBatch(col("doc_id")),
      numPerms = 32, numBands = 8, shingleN = 3, threshold = 0.3)
      .select(when(isBatch(col("id_a")), col("id_a")).otherwise(col("id_b"))
        .as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_near"))
    exact
      .join(near, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("is_exact_dup"),
        coalesce(col("n_near"), lit(0L)).as("n_near_dups"),
        when(col("is_exact_dup"), "drop_exact")
          .when(coalesce(col("n_near"), lit(0L)) > 0, "review")
          .otherwise("ingest").as("decision"))
  }

  // Authority rank over the near-dup similarity graph: 5 fixed-point
  // PageRank iterations (integer arithmetic — see LinkAnalysis scaladoc
  // for why float PageRank can never hash-match across engines). High
  // scores mark documents sitting in dense near-dup neighborhoods — the
  // canonical-copy candidates a curation pass should prefer keeping.
  private def q88(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.minHashLshPortable(documents(s, d), "doc_id", "text",
      numPerms = 32, numBands = 8, shingleN = 3, threshold = 0.3)
      .select(col("id_a"), col("id_b"))
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    val nodes = documents(s, d).select(col("doc_id").as("id"))
    graft.operators.LinkAnalysis.pageRankFixedPoint(edges, nodes)
      .select(col("id").as("doc_id"), col("degree"), col("rank").as("rank_e6"))
  }

  // Image perceptual near-dup: SimHash over byte 4-grams of the payload
  // MediaCodec locates inside each image container (the pixel-domain
  // stand-in pHash — see PerceptualHash's scaladoc for why gram-SimHash
  // and not block hashing), banded bucket join, Hamming ≤ 5 verify. The
  // oracle recomputes the md5-derived fingerprints and does the N²
  // scan — the banded join is pigeonhole-exhaustive at this threshold
  // (5 < 8 bands), so the two formulations match bit-for-bit.
  private def q112(s: SparkSession, d: String): DataFrame = {
    val assets = graft.operators.Multimodal
      .assetsFromText(documents(s, d), "doc_id", "text")
      .filter(col("kind") === "image")
    val fps = graft.operators.PerceptualHash.fingerprints(assets, portable = true)
    graft.operators.PerceptualHash
      .nearDupPairs(fps, "asset_id", "phash", maxHamming = 5)
  }

  // Entity-resolution fuzzy join (the name-level dedup modality): all
  // pairs of DISTINCT part names within Levenshtein distance 2, with each
  // name's part multiplicity. Candidates come from the deletion-
  // neighborhood blocking join (FuzzyJoin scaladoc: complete for ED<=2,
  // equi-join-shaped — never N²); the DuckDB oracle is the all-pairs
  // distance scan the blocking is provably equivalent to. The count join
  // is left to AQE (pairs are near-match-density-sized, but the distinct-
  // name dimension is unbounded at warehouse scale — no forced broadcast).
  private def q114(s: SparkSession, d: String): DataFrame = {
    val counts = part(s, d).groupBy(col("p_name")).agg(count(lit(1)).as("n"))
    graft.operators.FuzzyJoin.selfJoin(part(s, d), "p_name", maxDist = 2)
      .join(counts.as("ca"), col("key_a") === col("ca.p_name"))
      .join(counts.as("cb"), col("key_b") === col("cb.p_name"))
      .select(col("key_a").as("name_a"), col("key_b").as("name_b"),
        col("edit_dist"),
        col("ca.n").as("n_parts_a"), col("cb.n").as("n_parts_b"))
  }

  // Leakage-safe train/eval split: a near-dup GROUP must land entirely on
  // one side, or eval leaks train content (the reason dedup-aware splits
  // exist in LLM data pipelines). Split key = md5 of the component label
  // (q69's min-doc_id), not of the doc — every member inherits the
  // group's draw, so the invariant holds by construction: first md5 byte
  // < 0x1a → eval (~10.2%). One closure pass + one rollup shuffle; the
  // component table is the small side and broadcasts.
  private def q121(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.minHashLshPortable(documents(s, d), "doc_id", "text",
      numPerms = 32, numBands = 8, shingleN = 3, threshold = 0.3)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val nodes = documents(s, d).select(col("doc_id").as("id"))
    val split = graft.operators.ConnectedComponents.auto(pairs, nodes)
      .select(col("id").as("doc_id"), col("component"))
      .withColumn("split",
        when(substring(md5(col("component").cast("string")), 1, 2) < "1a",
          lit("eval")).otherwise(lit("train")))
    documents(s, d).join(split, Seq("doc_id"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        countDistinct(col("component")).as("n_groups"))
  }

  // Exact substring-span dedup (Lee et al. 2022 ExactSubstr, shingle
  // re-expression): per doc, the merged maximal spans of 5-token
  // shingles that occur anywhere else in the corpus — the passages a
  // removal pass cuts. Machinery + plan shape in
  // [[graft.operators.SpanDedup]]; the oracle re-derives spans from
  // string_split_regex shingles + the same gaps-and-islands windows.
  private def q123(s: SparkSession, d: String): DataFrame =
    graft.operators.SpanDedup.spanReport(documents(s, d), "doc_id", "text", 5)

  // The removal pass over q123's spans: cleaned text md5-pinned, per-doc
  // removed-token counts — the deliverable an ExactSubstr dedup actually
  // ships. Row-local token filtering; see SpanDedup.removeSpans.
  private def q127(s: SparkSession, d: String): DataFrame =
    graft.operators.SpanDedup.removeSpans(documents(s, d), "doc_id", "text", 5)

  // Exact set-similarity self-join (AllPairs/PPJoin prefix filter):
  // EVERY within-(lang, source)-block pair with token-set Jaccard >= 0.9,
  // integer-verified. The oracle mirrors the same prefix-filtered plan
  // (df-ranked prefixes, length + positional prunes) so BOTH engines run
  // the subquadratic algorithm — the all-pairs twin was measured
  // quadratic-infeasible on this template-generated (self-similar)
  // corpus; completeness vs brute force is SetSimJoinSpec's job.
  private def q134(s: SparkSession, d: String): DataFrame =
    graft.operators.SetSimJoin.selfJoin(
      documents(s, d), "doc_id", TextAnalysis.tokens(col("text")),
      simNum = 9, simDen = 10, blockCols = Seq("lang", "source"))

  // Cross-corpus exact set-similarity join (batch-vs-warehouse
  // incremental near-dup): doc_id % 3 == 0 plays the warehouse, the
  // rest the incoming batch (the fixture's planted near-dups are
  // same-parity, so an even/odd split would find zero cross pairs);
  // every cross pair with J >= 0.9 inside a (lang, source) block. Same
  // prefix machinery as q134, R-S form (no id ordering constraint —
  // the sides are disjoint here).
  private def q140(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    graft.operators.SetSimJoin.join(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 =!= 0),
      "doc_id", TextAnalysis.tokens(col("text")),
      simNum = 9, simDen = 10, blockCols = Seq("lang", "source"))
  }

  // Segment-level exact dedup (CCNet line dedup / RefinedWeb paragraph
  // dedup): the testdata docs are single-line token streams, so the
  // query first re-segments each doc deterministically into 3-token
  // lines (an SQL-replayable reshaping — the operator itself is
  // delimiter-regex generic and SegmentDedupSpec drives it on real
  // multi-paragraph fixtures), then keeps only the global first
  // occurrence of each exact line, ordered by (doc_id, position).
  // 3-token lines over the ~40-word generator vocabulary collide
  // heavily across docs, so both kept and removed populations are
  // well-exercised at every SF.
  private def q167(s: SparkSession, d: String): DataFrame = {
    // pre-segmented composition: chunks feed dedupSegmentArray directly —
    // building a newline-joined string for the operator to re-split was
    // measured as two wasted full text passes (the regex form exists for
    // corpora that arrive with real delimiters)
    val lined = documents(s, d)
      .withColumn("__toks", split(col("text"), "\\s+"))
      .withColumn("segs",
        transform(
          sequence(lit(1), expr("(size(__toks) + 2) div 3")),
          i => concat_ws(" ",
            slice(col("__toks"), (i - lit(1)) * lit(3) + lit(1), lit(3)))))
      .select(col("doc_id"), col("segs"))
      // materialize the segmentation ONCE (q146 precedent): the operator
      // references segs from both its dedup and rebuild branches, and the
      // interpreted HOF chunking chain defeats codegen CSE (measured:
      // inline 2.2 s, string round-trip 1.3 s, this 0.9 s at sf0.1)
      .localCheckpoint(true)
    graft.operators.SegmentDedup
      .dedupSegmentArray(lined, "doc_id", "segs", "\n")
      .select(col("doc_id"), col("n_segments"), col("n_removed"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  // Incremental segment dedup (r10): the daily-crawl shape — docs with
  // doc_id % 7 == 0 play the incoming batch, the rest the accumulated
  // warehouse; a batch line dies if the warehouse has EVER seen it or
  // an earlier batch position claimed it. Same 3-token re-segmentation
  // as q167 (here via the newline string + regex path, so BOTH public
  // entry forms stay oracle-exercised).
  private def q171(s: SparkSession, d: String): DataFrame = {
    val lined = documents(s, d)
      .withColumn("__toks", split(col("text"), "\\s+"))
      .withColumn("lined", array_join(
        transform(
          sequence(lit(1), expr("(size(__toks) + 2) div 3")),
          i => concat_ws(" ",
            slice(col("__toks"), (i - lit(1)) * lit(3) + lit(1), lit(3)))),
        "\n"))
      .select(col("doc_id"), col("lined"))
      // materialize once — warehouse AND batch sides both derive from
      // this relation, and the batch side additionally feeds the
      // operator's two branches (the q167 lesson: 1.6-2.0 s unchecked,
      // ~1.0 s materialized at sf0.1)
      .localCheckpoint(true)
    graft.operators.SegmentDedup.dedupSegmentsIncremental(
        lined.filter(col("doc_id") % 7 =!= 0),
        lined.filter(col("doc_id") % 7 === 0),
        "doc_id", "lined", "\n")
      .select(col("doc_id"), col("n_segments"), col("n_removed"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  // Content-defined chunk dedup (r9): the CDC rung of the dedup ladder
  // — boundaries are a pure function of the local 16-char window's md5
  // nibble, so an edited document's chunk grid RE-ALIGNS past the edit
  // and the shared tail dedupes chunk-for-chunk (the rsync/FastCDC
  // argument; SpanDedup's fixed shingles and SegmentDedup's author
  // delimiters both lose alignment there). Chunking is row-local and
  // shuffle-free; the dedup + exact-concatenation rebuild is the
  // oracle-green SegmentDedup machinery (joinDelim = "").
  private def q174(s: SparkSession, d: String): DataFrame = {
    val chunked = graft.operators.ContentChunking
      .withCdcChunks(documents(s, d).select(col("doc_id"), col("text")),
        "text", "chunks", w = 16)
      .select(col("doc_id"), col("chunks"))
      // materialize the md5-per-position chunking ONCE (q167 lesson):
      // the operator references it from both dedup and rebuild branches
      .localCheckpoint(true)
    graft.operators.SegmentDedup
      .dedupSegmentArray(chunked, "doc_id", "chunks", "")
      .select(col("doc_id"), col("n_segments"), col("n_removed"),
        md5(col("clean_text")).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  // Incremental connected components (r9): the daily-crawl shape for
  // the NEAR-DUP GRAPH — docs with doc_id % 5 == 0 play the incoming
  // batch; the warehouse holds the accumulated (id, component)
  // labeling of the rest. The batch's LSH pairs contract onto prior
  // component labels, CC runs on that batch-bounded merge graph, and
  // one relabel join updates the warehouse — work independent of
  // warehouse size. The oracle rebuilds the FULL recursive closure
  // from scratch (the q129/q171 contract): incremental ≡ batch,
  // hash-identical to q69's shape.
  private def q176(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.minHashLshPortable(documents(s, d), "doc_id", "text",
        numPerms = 32, numBands = 8, shingleN = 3, threshold = 0.3)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      // both splits filter this relation — the LSH chain must run once
      .localCheckpoint(true)
    val isNew = (c: org.apache.spark.sql.Column) => c % 5 === 0
    val docs = documents(s, d)
    val warehouse = graft.operators.ConnectedComponents.auto(
      pairs.filter(!isNew(col("src")) && !isNew(col("dst"))),
      docs.filter(!isNew(col("doc_id"))).select(col("doc_id").as("id")))
    val full = graft.operators.ConnectedComponents.incrementalMinLabel(
      warehouse,
      pairs.filter(isNew(col("src")) || isNew(col("dst"))),
      docs.filter(isNew(col("doc_id"))).select(col("doc_id").as("id")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("component"))
    full.select(col("id").as("doc_id"), col("component"))
      .withColumn("cluster_size", count(lit(1)).over(w))
      .orderBy(col("doc_id"))
  }

  // Incremental MinHash-LSH dedup (r10, VERDICT r9 #5): the last dedup
  // family to get its warehouse form — docs with doc_id % 7 == 0 play
  // the incoming batch, the rest the accumulated corpus whose band
  // signatures are PERSISTED state (simulated in-plan here, like
  // q171/q176/q181). Only the batch is signed; its bands probe the
  // warehouse band table; output = every verified near-dup pair that
  // mentions a batch doc. The oracle rebuilds the FULL q38 pair list
  // from scratch and filters to batch-involving pairs (the q181
  // gating contract: incremental ≡ from-scratch, hash-identical).
  private def q185(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val isNew = col("doc_id") % 7 === 0
    val warehouse = docs.filter(!isNew)
    Dedup.minHashLshIncremental(
        Dedup.lshBandWarehouse(warehouse, "doc_id", "text",
          numPerms = 32, numBands = 8, shingleN = 3),
        warehouse, docs.filter(isNew), "doc_id", "text",
        numPerms = 32, numBands = 8, shingleN = 3, threshold = 0.3)
      .select(col("id_a"), col("id_b"), col("n_common"), col("n_union"),
        floor(col("jaccard") * 1e6).cast("long").as("jaccard_e6"))
      .orderBy(col("id_a"), col("id_b"))
  }

  // Incremental SimHash near-dup (r10): the SimHash rung of the
  // incremental ladder — the %7 batch is fingerprinted and its four
  // 16-bit bands probe the persisted (id, simhash_hex) warehouse
  // (simulated in-plan, the q185/q171 convention). The oracle is the
  // full N² Hamming scan filtered to batch-involving pairs; the banded
  // probe equals it exactly by the 4-band pigeonhole at maxHamming 3.
  private def q186(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val isNew = col("doc_id") % 7 === 0
    Dedup.simHashNearDupIncremental(
        Dedup.simHashHexTable(docs.filter(!isNew), "doc_id", "text"),
        docs.filter(isNew), "doc_id", "text", maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  // Dedup DECISION table (r10): the artifact a production dedup pass
  // actually ships — one row per document with the keep/drop verdict,
  // a reason code, and the survivor it defers to. Precedence: exact
  // dup of an earlier doc (min doc_id over the normalized-text md5
  // class) beats near-dup (non-minimum member of the LSH component,
  // q69's machinery) beats kept. Deterministic end to end — the
  // whole table is one oracle hash.
  private def q188(s: SparkSession, d: String): DataFrame =
    Dedup.dedupDecisions(documents(s, d), "doc_id", "text",
        numPerms = 32, numBands = 8, shingleN = 3, threshold = 0.3)
      .orderBy(col("doc_id"))

  // Incremental pHash near-dup (r10): the IMAGE/asset rung — image
  // assets with doc_id % 4 == 0 play the incoming batch (image ids are
  // all % 3 == 0, and the % 4 split is the one that makes the sf0.001
  // fixture exercise BOTH sides of the gate: 3 batch-involving pairs
  // kept, 2 warehouse-internal pairs excluded); the rest's (asset_id,
  // phash) fingerprints are the persisted warehouse (simulated
  // in-plan). Only the batch decodes + fingerprints; the oracle is
  // q112's N² Hamming scan filtered to batch-involving pairs
  // (asset_id IS doc_id, so the % 4 predicate carries over).
  private def q190(s: SparkSession, d: String): DataFrame = {
    val assets = graft.operators.Multimodal
      .assetsFromText(documents(s, d), "doc_id", "text")
      .filter(col("kind") === "image")
    val isNew = col("asset_id") % 4 === 0
    import s.implicits._
    graft.operators.PerceptualHash.nearDupPairsIncremental(
        graft.operators.PerceptualHash
          .fingerprints(assets.filter(!isNew)
            .as[graft.operators.Multimodal.Asset], portable = true),
        assets.filter(isNew).as[graft.operators.Multimodal.Asset],
        maxHamming = 5)
      .orderBy(col("id_a"), col("id_b"))
  }

  // Incremental ExactSubstr span report (r10): the span-dedup family's
  // warehouse form — the %7 batch is shingled; a batch position dies
  // when its 5-token shingle occurs anywhere else in warehouse ∪
  // batch, probed against the persisted hash-count state (simulated
  // in-plan, the q185 convention). Oracle = q123's full-rebuild span
  // CTEs restricted to batch docs.
  private def q191(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val isNew = col("doc_id") % 7 === 0
    graft.operators.SpanDedup.spanReportIncremental(
        graft.operators.SpanDedup
          .shingleHashCounts(docs.filter(!isNew), "text", 5),
        docs.filter(isNew), "doc_id", "text", 5)
      .orderBy(col("doc_id"))
  }

  // MinHash estimation-accuracy curve (r10): the q192 ANN-recall
  // convention applied to the dedup ladder — per signature prefix
  // size k ∈ {4,8,16,32}, how far the k-lane agreement estimate sits
  // from the exact shingle-set Jaccard over the LSH candidate pairs
  // (the pairs a dedup pipeline actually adjudicates). One signature
  // computation serves all four points (lanes nest); signed error sum
  // emitted undivided (no cross-engine signed division).
  // no trailing orderBy (the q31 lesson — the sort's sampling pass
  // re-executes the whole signature chain for 4 output rows)
  private def q196(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup
      .minHashAccuracyCurve(documents(s, d), "doc_id", "text")

  // Cluster label vote (r10): near-dups should agree on labels — each
  // doc against its near-dup component's majority `lang`, the
  // disagreements being the suspect labels (label denoising through
  // the dedup graph). Rides the q69 edges exactly (threshold 0.3).
  private def q198(s: SparkSession, d: String): DataFrame =
    graft.operators.Dedup
      .clusterLabelVote(documents(s, d), "doc_id", "lang", "text")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q198_cluster_label_vote" -> q198 _,
    "q196_minhash_accuracy" -> q196 _,
    "q191_span_report_incr" -> q191 _,
    "q190_phash_incr" -> q190 _,
    "q188_dedup_decisions" -> q188 _,
    "q186_simhash_incr" -> q186 _,
    "q185_minhash_lsh_incr" -> q185 _,
    "q176_components_incr" -> q176 _,
    "q174_cdc_chunk_dedup" -> q174 _,
    "q171_segment_dedup_incr" -> q171 _,
    "q167_segment_dedup" -> q167 _,
    "q134_setsim_join" -> q134 _,
    "q140_setsim_cross_join" -> q140 _,
    "q121_leakage_safe_split" -> q121 _,
    "q123_substring_spans" -> q123 _,
    "q127_span_removal" -> q127 _,
    "q114_fuzzy_name_join" -> q114 _,
    "q112_phash_near_dup" -> q112 _,
    "q88_authority_rank" -> q88 _,
    "q35_exact_dedup_stats" -> q35 _,
    "q36_dedup_keep_first" -> q36 _,
    "q37_jaccard_pairs" -> q37 _,
    "q38_minhash_lsh" -> q38 _,
    "q39_simhash" -> q39 _,
    "q69_near_dup_components" -> q69 _,
    "q80_near_dup_survivors" -> q80 _,
    "q84_incremental_dedup" -> q84 _
  )

  /** Normalized-text expression shared by the generated oracles. */
  private[queries] val normSql =
    "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  /** `'\s+'` as a SQL literal (triple-quoted interpolations below do not
    * process backslash escapes, so the regex is injected from here). */
  private[queries] val wsRe = "'\\s+'"

  /** Generated DuckDB mirror of [[Dedup.minHashLshPortable]] (32 perms,
    * 8 bands × 4, 3-token shingles, threshold 0.3, maxBucket 1000):
    * identical md5 keying (4 × 8-hex lanes per digest), MIN-over-hex
    * signatures, banded bucket join, exact-Jaccard verification. */
  /** The portable-signature candidate chain shared by q38/q69/q196 —
    * tokens → shingle md5s → 32-lane signatures → banding → bounded
    * buckets → candidate `pairs`. */
  private def minHashCandCtes: String = {
    val sent = graft.operators.Dedup.PortableSentinel
    val mins = (0 until 32)
      .map(i => s"COALESCE(MIN(substr(md5('${i / 4}:' || hh), ${(i % 4) * 8 + 1}, 8)), '$sent') AS m$i")
      .mkString(", ")
    val bandRows = (0 until 8).map(b => s"($b)").mkString(", ")
    val bandCase = "CASE b " + (0 until 8).map { b =>
      val slots = (0 until 4).map(r => s"m${4 * b + r}").mkString(" || '|' || ")
      s"WHEN $b THEN md5($slots)"
    }.mkString(" ") + " END"
    s"""toks AS (SELECT doc_id, string_split_regex($normSql, $wsRe) AS l FROM documents),
       |sh AS (SELECT t.doc_id, md5(l[i] || ' ' || l[i+1] || ' ' || l[i+2]) AS hh
       |       FROM toks t, UNNEST(range(1, len(l) - 1)) AS u(i)),
       |sigs AS (SELECT t.doc_id, $mins
       |         FROM toks t LEFT JOIN sh ON sh.doc_id = t.doc_id GROUP BY t.doc_id),
       |banded AS (SELECT doc_id, b, $bandCase AS bhash FROM sigs, (VALUES $bandRows) bands(b)),
       |bounded AS (SELECT * FROM banded QUALIFY COUNT(*) OVER (PARTITION BY b, bhash) <= 1000),
       |pairs AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
       |          FROM bounded a JOIN bounded b2
       |          ON a.b = b2.b AND a.bhash = b2.bhash AND a.doc_id < b2.doc_id)""".stripMargin
  }

  private[queries] def minHashPairCtes: String =
    s"""$minHashCandCtes,
       |tk AS (SELECT doc_id, list_distinct(string_split_regex($normSql, $wsRe)) AS toks FROM documents),
       |jac AS (SELECT id_a, id_b,
       |  CAST(len(list_filter(ta.toks, x -> list_contains(tb.toks, x))) AS INT) AS n_common,
       |  CAST(len(ta.toks) + len(tb.toks) - len(list_filter(ta.toks, x -> list_contains(tb.toks, x))) AS INT) AS n_union
       |  FROM pairs JOIN tk ta ON ta.doc_id = pairs.id_a JOIN tk tb ON tb.doc_id = pairs.id_b)""".stripMargin

  private def minHashLshOracle: String =
    s"""WITH $minHashPairCtes
       |SELECT id_a, id_b, n_common, n_union,
       |  CAST(FLOOR(CAST(n_common AS DOUBLE) / n_union * 1000000.0) AS BIGINT) AS jaccard_e6
       |FROM jac WHERE CAST(n_common AS DOUBLE) / n_union >= 0.3 ORDER BY id_a, id_b""".stripMargin

  /** q69 oracle: the q38 pair CTEs + a recursive reachability closure.
    * `reach` enumerates (node, seed) pairs over the symmetrized edges with
    * UNION set-semantics, so min(seed) per node is the component's minimum
    * doc_id — exactly [[graft.operators.ConnectedComponents.minLabel]]'s
    * fixpoint. */
  private def nearDupComponentsOracle: String =
    s"""WITH RECURSIVE $minHashPairCtes,
       |edges AS (SELECT id_a, id_b FROM jac WHERE CAST(n_common AS DOUBLE) / n_union >= 0.3),
       |sym AS (SELECT id_a AS s, id_b AS d FROM edges UNION ALL SELECT id_b, id_a FROM edges),
       |reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
       |          UNION
       |          SELECT sym.d, reach.r FROM reach JOIN sym ON sym.s = reach.id),
       |comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id)
       |SELECT doc_id, component,
       |  CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size
       |FROM comp ORDER BY doc_id""".stripMargin

  /** Generated DuckDB mirror of [[Dedup.simHashHexTable]]: md5-prefix
    * token hashes, 64 ±1-vote sums, per-nibble hex assembly. */
  /** Shared q39/q186 fingerprint CTEs ending in fp(doc_id, simhash_hex)
    * — md5-prefix token hashes, 64 ±1-vote sums, per-nibble assembly. */
  private def simHashFpCtes: String = {
    val chars = (1 to 16)
      .map(j => s"strpos('0123456789abcdef', substr(h, $j, 1)) - 1 AS c$j")
      .mkString(", ")
    val votes = (0 until 64)
      .map(b => s"SUM((((c${16 - b / 4} >> ${b % 4}) & 1) * 2 - 1)) AS v$b")
      .mkString(", ")
    val hex = (1 to 16).map { j =>
      val base = 4 * (16 - j)
      val nib = Seq(3, 2, 1, 0)
        .map(k => s"(CASE WHEN v${base + k} > 0 THEN ${1 << k} ELSE 0 END)")
        .mkString(" + ")
      s"substr('0123456789abcdef', ($nib) + 1, 1)"
    }.mkString(" || ")
    s"""toksr AS (SELECT doc_id, unnest(string_split_regex($normSql, $wsRe)) AS t FROM documents),
       |hs AS (SELECT doc_id, substr(md5(t), 1, 16) AS h FROM toksr),
       |cs AS (SELECT doc_id, $chars FROM hs),
       |vs AS (SELECT doc_id, $votes FROM cs GROUP BY doc_id),
       |fp AS (SELECT doc_id, $hex AS simhash_hex FROM vs)""".stripMargin
  }

  private def simHashOracle: String =
    s"WITH $simHashFpCtes SELECT doc_id, simhash_hex FROM fp ORDER BY doc_id"

  /** q186 twin: the q39 fingerprint CTEs + the FULL N² Hamming scan
    * (per-nibble strpos/xor/bit_count — the exact arithmetic
    * [[graft.operators.Dedup.hexHamming]] runs), filtered to pairs
    * mentioning a batch doc. The banded incremental probe must equal
    * this scan bit-for-bit (pigeonhole over 4 bands at maxHamming 3). */
  private def simHashIncrOracle: String = {
    val nibs = (1 to 16)
      .map(j => s"strpos('0123456789abcdef', substr(simhash_hex, $j, 1)) - 1 AS n$j")
      .mkString(", ")
    val ham = (1 to 16)
      .map(j => s"bit_count(xor(a.n$j, b.n$j))")
      .mkString(" + ")
    s"""WITH $simHashFpCtes,
       |fpn AS (SELECT doc_id, $nibs FROM fp),
       |pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, ($ham) AS hamming
       |       FROM fpn a JOIN fpn b ON a.doc_id < b.doc_id)
       |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM pr
       |WHERE hamming <= 3 AND (id_a % 7 = 0 OR id_b % 7 = 0)
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q112 oracle: [[graft.operators.PerceptualHash]] fingerprints from
    * first principles — image docs are doc_id % 3 = 0 (assetsFromText's
    * kind rule) and the payload inside the container is exactly the text
    * bytes, so the grams are substr(text, i, 4); md5-prefix-64 gram
    * hashes, 64 ±1-vote sums, signed-BIGINT assembly (bit 63 via the
    * Long.MinValue term, same trick as simHashTable), then the N² scan
    * with bit_count(xor) ≤ 5 that the banded join is pigeonhole-exact
    * against. */
  private def pHashNearDupOracle: String = pHashOracle("")

  /** q190 twin: q112's N² scan restricted to batch-involving pairs. */
  private def pHashIncrOracle: String =
    pHashOracle(" AND (a.doc_id % 4 = 0 OR b.doc_id % 4 = 0)")

  private def pHashOracle(pairFilter: String): String = {
    val chars = (1 to 16)
      .map(j => s"strpos('0123456789abcdef', substr(h, $j, 1)) - 1 AS c$j")
      .mkString(", ")
    val votes = (0 until 64)
      .map(k => s"SUM((((c${16 - k / 4} >> ${k % 4}) & 1) * 2 - 1)) AS v$k")
      .mkString(", ")
    val assemble = (0 until 63)
      .map(k => s"(CASE WHEN v$k > 0 THEN ${1L << k} ELSE 0 END)")
      .mkString(" + ") +
      " + (CASE WHEN v63 > 0 THEN -9223372036854775808 ELSE 0 END)"
    s"""WITH img AS (SELECT doc_id, text FROM documents
       |            WHERE doc_id % 3 = 0 AND length(text) >= 4),
       |g AS (SELECT doc_id, md5(substr(text, CAST(i AS INT), 4)) AS h
       |      FROM img, UNNEST(range(1, length(text) - 2)) AS u(i)),
       |cs AS (SELECT doc_id, $chars FROM g),
       |vs AS (SELECT doc_id, $votes FROM cs GROUP BY doc_id),
       |p AS (SELECT doc_id, CAST($assemble AS BIGINT) AS ph FROM vs)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.ph, b.ph)) AS BIGINT) AS hamming
       |FROM p a JOIN p b ON b.doc_id > a.doc_id
       |WHERE bit_count(xor(a.ph, b.ph)) <= 5$pairFilter
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q80 oracle: the q69 recursive closure, then keep component == doc_id
    * and roll up per source. */
  private def nearDupSurvivorsOracle: String =
    s"""WITH RECURSIVE $minHashPairCtes,
       |edges AS (SELECT id_a, id_b FROM jac WHERE CAST(n_common AS DOUBLE) / n_union >= 0.3),
       |sym AS (SELECT id_a AS s, id_b AS d FROM edges UNION ALL SELECT id_b, id_a FROM edges),
       |reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
       |          UNION
       |          SELECT sym.d, reach.r FROM reach JOIN sym ON sym.s = reach.id),
       |comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id)
       |SELECT d.source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN c.component = d.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(SUM(CASE WHEN c.component = d.doc_id THEN d.n_chars ELSE 0 END) AS BIGINT) AS kept_chars
       |FROM documents d JOIN comp c ON c.doc_id = d.doc_id
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** q84 oracle: exact dups by normalized md5 against the warehouse split,
    * near-dups from the q38 pair CTEs crossing the split. */
  private def incrementalDedupOracle: String =
    s"""WITH $minHashPairCtes,
       |np AS (SELECT id_a, id_b FROM jac WHERE CAST(n_common AS DOUBLE) / n_union >= 0.3),
       |cross_near AS (SELECT CASE WHEN id_a % 7 = 0 THEN id_a ELSE id_b END AS doc_id,
       |                      COUNT(*) AS n_near
       |               FROM np WHERE (id_a % 7 = 0) <> (id_b % 7 = 0) GROUP BY 1),
       |wh AS (SELECT DISTINCT md5($normSql) AS h FROM documents WHERE doc_id % 7 <> 0),
       |ex AS (SELECT doc_id, md5($normSql) AS h FROM documents WHERE doc_id % 7 = 0)
       |SELECT ex.doc_id, wh.h IS NOT NULL AS is_exact_dup,
       |  CAST(COALESCE(cn.n_near, 0) AS BIGINT) AS n_near_dups,
       |  CASE WHEN wh.h IS NOT NULL THEN 'drop_exact'
       |       WHEN COALESCE(cn.n_near, 0) > 0 THEN 'review'
       |       ELSE 'ingest' END AS decision
       |FROM ex LEFT JOIN wh ON wh.h = ex.h
       |LEFT JOIN cross_near cn ON cn.doc_id = ex.doc_id""".stripMargin

  /** q88 oracle: the pair CTEs + 5 UNROLLED fixed-point PageRank
    * iterations (recursive CTEs cannot aggregate in the recursive term, so
    * the fixed iteration count is generated as chained CTEs). Integer ops
    * mirror [[graft.operators.LinkAnalysis.pageRankFixedPoint]] exactly:
    * `rank // degree` contributions, `(sum * 85) // 100` damping. */
  private def authorityRankOracle: String = {
    val iterCtes = (1 to 5).map { i =>
      val p = s"r${i - 1}"
      s"""r$i AS (SELECT nd.id, nd.degree, 150000 + COALESCE(s.c, 0) * 85 // 100 AS rank
         |  FROM nd LEFT JOIN (SELECT ed.dst AS id, SUM($p.rank // $p.degree) AS c
         |    FROM $p JOIN ed ON ed.src = $p.id WHERE $p.degree > 0
         |    GROUP BY ed.dst) s ON s.id = nd.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $minHashPairCtes,
       |np AS (SELECT id_a, id_b FROM jac WHERE CAST(n_common AS DOUBLE) / n_union >= 0.3),
       |ed AS (SELECT id_a AS src, id_b AS dst FROM np UNION ALL SELECT id_b, id_a FROM np),
       |dg AS (SELECT src AS id, COUNT(*) AS degree FROM ed GROUP BY src),
       |nd AS (SELECT doc_id AS id, COALESCE(dg.degree, 0) AS degree
       |       FROM documents LEFT JOIN dg ON dg.id = documents.doc_id),
       |r0 AS (SELECT id, degree, CAST(1000000 AS BIGINT) AS rank FROM nd),
       |$iterCtes
       |SELECT id AS doc_id, CAST(degree AS BIGINT) AS degree,
       |  CAST(rank AS BIGINT) AS rank_e6 FROM r5""".stripMargin
  }

  /** q121 oracle: the q69 recursive closure, then the same md5-of-label
    * split rule and per-(source, split) rollup. */
  private def leakageSafeSplitOracle: String =
    s"""WITH RECURSIVE $minHashPairCtes,
       |edges AS (SELECT id_a, id_b FROM jac WHERE CAST(n_common AS DOUBLE) / n_union >= 0.3),
       |sym AS (SELECT id_a AS s, id_b AS d FROM edges UNION ALL SELECT id_b, id_a FROM edges),
       |reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
       |          UNION
       |          SELECT sym.d, reach.r FROM reach JOIN sym ON sym.s = reach.id),
       |comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id)
       |SELECT d.source,
       |  CASE WHEN substr(md5(CAST(c.component AS VARCHAR)), 1, 2) < '1a'
       |       THEN 'eval' ELSE 'train' END AS split,
       |  COUNT(*) AS n_docs, CAST(SUM(d.n_chars) AS BIGINT) AS n_chars,
       |  CAST(COUNT(DISTINCT c.component) AS BIGINT) AS n_groups
       |FROM documents d JOIN comp c ON c.doc_id = d.doc_id
       |GROUP BY 1, 2""".stripMargin

  /** q123 oracle: positions via unnest(generate_series), duplicated
    * shingles via HAVING count>1, islands via the same running-max-end
    * windows, per-doc rollup keeping zero-span docs. */
  private def substringSpansOracle: String =
    s"""WITH t AS (SELECT doc_id, string_split_regex(text, $wsRe) AS l FROM documents),
       |s0 AS (SELECT doc_id, unnest(generate_series(1, len(l) - 4)) AS i, l FROM t),
       |s AS (SELECT doc_id, i - 1 AS pos,
       |        l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4] AS sh
       |      FROM s0),
       |d AS (SELECT sh FROM s GROUP BY sh HAVING COUNT(*) > 1),
       |f AS (SELECT s.doc_id, s.pos, s.pos + 5 AS e FROM s JOIN d USING (sh)),
       |m AS (SELECT doc_id, pos, e,
       |        max(e) OVER (PARTITION BY doc_id ORDER BY pos
       |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm
       |      FROM f),
       |i AS (SELECT doc_id, pos, e,
       |        SUM(CASE WHEN rm IS NULL OR pos > rm THEN 1 ELSE 0 END)
       |          OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS isl
       |      FROM m),
       |sp AS (SELECT doc_id, isl, MIN(pos) AS s0, MAX(e) AS e0 FROM i GROUP BY doc_id, isl),
       |r AS (SELECT doc_id, COUNT(*) AS n_dup_spans,
       |        CAST(SUM(e0 - s0) AS BIGINT) AS dup_tokens,
       |        CAST(MAX(e0 - s0) AS BIGINT) AS longest_span
       |      FROM sp GROUP BY doc_id)
       |SELECT documents.doc_id, COALESCE(n_dup_spans, 0) AS n_dup_spans,
       |  COALESCE(dup_tokens, 0) AS dup_tokens,
       |  COALESCE(longest_span, 0) AS longest_span
       |FROM documents LEFT JOIN r USING (doc_id)""".stripMargin

  /** q191 twin: q123's full-rebuild span CTEs, final select restricted
    * to batch docs (the q181 contract — incremental ≡ from-scratch). */
  private def substringSpansIncrOracle: String =
    substringSpansOracle + " WHERE documents.doc_id % 7 = 0"

  /** q127 oracle: q123's span CTEs, then token-level NOT EXISTS removal
    * and an ordered string_agg rebuild of the cleaned text. */
  private def spanRemovalOracle: String =
    s"""WITH t AS (SELECT doc_id, string_split_regex(text, $wsRe) AS l FROM documents),
       |s0 AS (SELECT doc_id, unnest(generate_series(1, len(l) - 4)) AS i, l FROM t),
       |s AS (SELECT doc_id, i - 1 AS pos,
       |        l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || l[i+4] AS sh
       |      FROM s0),
       |d AS (SELECT sh FROM s GROUP BY sh HAVING COUNT(*) > 1),
       |f AS (SELECT s.doc_id, s.pos, s.pos + 5 AS e FROM s JOIN d USING (sh)),
       |m AS (SELECT doc_id, pos, e,
       |        max(e) OVER (PARTITION BY doc_id ORDER BY pos
       |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm
       |      FROM f),
       |i AS (SELECT doc_id, pos, e,
       |        SUM(CASE WHEN rm IS NULL OR pos > rm THEN 1 ELSE 0 END)
       |          OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS isl
       |      FROM m),
       |sp AS (SELECT doc_id, isl, MIN(pos) AS sp0, MAX(e) AS ep0 FROM i GROUP BY doc_id, isl),
       |tok0 AS (SELECT doc_id, unnest(generate_series(1, len(l))) AS j, l FROM t),
       |tk AS (SELECT doc_id, j - 1 AS pos, l[j] AS tok FROM tok0),
       |kept AS (SELECT tk.doc_id, tk.pos, tk.tok FROM tk WHERE NOT EXISTS
       |  (SELECT 1 FROM sp WHERE sp.doc_id = tk.doc_id
       |     AND tk.pos >= sp.sp0 AND tk.pos < sp.ep0)),
       |c AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS cleaned,
       |        COUNT(*) AS n_kept FROM kept GROUP BY doc_id)
       |SELECT t.doc_id, md5(COALESCE(c.cleaned, '')) AS cleaned_md5,
       |  CAST(len(t.l) - COALESCE(c.n_kept, 0) AS BIGINT) AS n_removed
       |FROM t LEFT JOIN c ON c.doc_id = t.doc_id""".stripMargin

  /** q167 twin: same 3-token re-segmentation (1-based chunk index i ↦
    * pos i-1 preserves the (doc_id, pos) first-occurrence order), same
    * md5 dedup rule, ordered string_agg rebuild. DuckDB list slices
    * are 1-based inclusive and clamp like Spark's slice(arr, start, 3). */
  private def segmentDedupOracle: String =
    s"WITH t AS (SELECT doc_id, string_split_regex(text, $wsRe) AS l FROM documents), " +
      "ch AS (SELECT doc_id, i - 1 AS pos, " +
      "array_to_string(l[((i-1)*3+1):((i-1)*3+3)], ' ') AS seg " +
      "FROM (SELECT doc_id, l, unnest(generate_series(1, (len(l)+2)//3)) AS i FROM t)), " +
      "r AS (SELECT doc_id, pos, seg, " +
      "ROW_NUMBER() OVER (PARTITION BY md5(seg) ORDER BY doc_id, pos) AS rn " +
      "FROM ch WHERE seg <> '') " +
      "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments, " +
      "CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed, " +
      "md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN seg END, chr(10) ORDER BY pos), '')) AS clean_md5 " +
      "FROM r GROUP BY doc_id ORDER BY doc_id"

  /** q171 twin: same chunking CTE, warehouse membership via a distinct
    * hash set, within-batch rank only over batch occurrences. */
  private def segmentDedupIncrOracle: String =
    s"WITH t AS (SELECT doc_id, string_split_regex(text, $wsRe) AS l FROM documents), " +
      "ch AS (SELECT doc_id, i - 1 AS pos, " +
      "array_to_string(l[((i-1)*3+1):((i-1)*3+3)], ' ') AS seg " +
      "FROM (SELECT doc_id, l, unnest(generate_series(1, (len(l)+2)//3)) AS i FROM t)), " +
      "wh AS (SELECT DISTINCT md5(seg) AS h FROM ch WHERE doc_id % 7 <> 0 AND seg <> ''), " +
      "b AS (SELECT doc_id, pos, seg, md5(seg) AS h, " +
      "ROW_NUMBER() OVER (PARTITION BY md5(seg) ORDER BY doc_id, pos) AS rn " +
      "FROM ch WHERE doc_id % 7 = 0 AND seg <> ''), " +
      "r AS (SELECT b.doc_id, b.pos, b.seg, " +
      "(wh.h IS NOT NULL OR b.rn > 1) AS dead " +
      "FROM b LEFT JOIN wh ON wh.h = b.h) " +
      "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments, " +
      "CAST(SUM(CASE WHEN dead THEN 1 ELSE 0 END) AS BIGINT) AS n_removed, " +
      "md5(COALESCE(string_agg(CASE WHEN NOT dead THEN seg END, chr(10) ORDER BY pos), '')) AS clean_md5 " +
      "FROM r GROUP BY doc_id ORDER BY doc_id"

  /** q174 twin: same window-md5 boundary rule (first hex nibble '0' on
    * the 16-char window ending at i, i in [16, len-1], plus the forced
    * final end), same chunk slicing, same md5 dedup + ordered rebuild.
    * DuckDB substr/length are code-point-based like Spark's. */
  private def cdcChunkDedupOracle: String =
    "WITH ch AS (SELECT doc_id, text, list_append(" +
      "CASE WHEN length(text) - 1 >= 16 THEN " +
      "list_filter(generate_series(16, length(text) - 1), " +
      "i -> substr(md5(substr(text, CAST(i - 15 AS INTEGER), 16)), 1, 1) = '0') " +
      "ELSE CAST([] AS BIGINT[]) END, length(text)) AS ends FROM documents), " +
      "cks AS (SELECT doc_id, k AS pos, " +
      "substr(text, CAST(CASE WHEN k = 1 THEN 1 ELSE ends[k-1] + 1 END AS INTEGER), " +
      "CAST(ends[k] - CASE WHEN k = 1 THEN 0 ELSE ends[k-1] END AS INTEGER)) AS chunk " +
      "FROM (SELECT doc_id, text, ends, unnest(generate_series(1, len(ends))) AS k FROM ch)), " +
      "r AS (SELECT doc_id, pos, chunk, " +
      "ROW_NUMBER() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, pos) AS rn " +
      "FROM cks WHERE chunk <> '') " +
      "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments, " +
      "CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed, " +
      "md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, '' ORDER BY pos), '')) AS clean_md5 " +
      "FROM r GROUP BY doc_id ORDER BY doc_id"

  /** q185 twin: the q38 full-rebuild pair CTEs VERBATIM, filtered to
    * pairs mentioning a batch doc — incremental ≡ from-scratch (the
    * q181 contract). */
  private def minHashLshIncrOracle: String =
    s"""WITH $minHashPairCtes
       |SELECT id_a, id_b, n_common, n_union,
       |  CAST(FLOOR(CAST(n_common AS DOUBLE) / n_union * 1000000.0) AS BIGINT) AS jaccard_e6
       |FROM jac WHERE CAST(n_common AS DOUBLE) / n_union >= 0.3
       |  AND (id_a % 7 = 0 OR id_b % 7 = 0) ORDER BY id_a, id_b""".stripMargin

  /** q188 twin: the q69 component closure + an exact-keeper window
    * over the normalized-text md5 class, folded into the same
    * precedence CASE chain. */
  private def dedupDecisionsOracle: String =
    s"""WITH RECURSIVE $minHashPairCtes,
       |edges AS (SELECT id_a, id_b FROM jac WHERE CAST(n_common AS DOUBLE) / n_union >= 0.3),
       |sym AS (SELECT id_a AS s, id_b AS d FROM edges UNION ALL SELECT id_b, id_a FROM edges),
       |reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
       |          UNION
       |          SELECT sym.d, reach.r FROM reach JOIN sym ON sym.s = reach.id),
       |comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id),
       |ex AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5($normSql)) AS ek FROM documents)
       |SELECT e.doc_id,
       |  (e.ek >= e.doc_id AND c.component >= e.doc_id) AS kept,
       |  CASE WHEN e.ek < e.doc_id THEN 'exact_dup'
       |       WHEN c.component < e.doc_id THEN 'near_dup'
       |       ELSE 'kept' END AS reason,
       |  CAST(CASE WHEN e.ek < e.doc_id THEN e.ek
       |            WHEN c.component < e.doc_id THEN c.component
       |            ELSE e.doc_id END AS BIGINT) AS survivor
       |FROM ex e JOIN comp c ON c.doc_id = e.doc_id ORDER BY e.doc_id""".stripMargin

  /** q196 twin: the candidate chain + distinct shingle md5s for the
    * exact sets, lane-agreement prefixes for the estimates, per-k
    * UNION ALL rollup. Same non-negative-only integer divisions as
    * the operator. */
  private def minHashAccuracyOracle: String = {
    val perK = Seq(4, 8, 16, 32).map { k =>
      val agree = (0 until k)
        .map(i => s"CASE WHEN ga.m$i = gb.m$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"SELECT p.id_a, p.id_b, $k AS sig_size, " +
        s"($agree) * 1000000 // $k AS est_e6, " +
        "COALESCE(pi.ni, 0) * 1000000 // (sa.ns + sb.ns - COALESCE(pi.ni, 0)) AS exact_e6 " +
        "FROM pairs p " +
        "JOIN ss sa ON sa.doc_id = p.id_a JOIN ss sb ON sb.doc_id = p.id_b " +
        "LEFT JOIN pi ON pi.id_a = p.id_a AND pi.id_b = p.id_b " +
        "JOIN sigs ga ON ga.doc_id = p.id_a JOIN sigs gb ON gb.doc_id = p.id_b"
    }.mkString(" UNION ALL ")
    s"""WITH $minHashCandCtes,
       |dsh AS (SELECT DISTINCT doc_id, hh FROM sh WHERE hh IS NOT NULL),
       |ss AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ns FROM dsh GROUP BY 1),
       |pi AS (SELECT p.id_a, p.id_b, CAST(COUNT(*) AS BIGINT) AS ni
       |       FROM pairs p JOIN dsh a ON a.doc_id = p.id_a
       |       JOIN dsh b ON b.doc_id = p.id_b AND b.hh = a.hh GROUP BY 1, 2),
       |pts AS ($perK)
       |SELECT sig_size, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(ABS(est_e6 - exact_e6)) // COUNT(*) AS BIGINT) AS mae_e6,
       |  CAST(SUM(est_e6 - exact_e6) AS BIGINT) AS sum_err_e6,
       |  CAST(MAX(ABS(est_e6 - exact_e6)) AS BIGINT) AS max_abs_e6
       |FROM pts GROUP BY 1 ORDER BY sig_size""".stripMargin
  }

  /** q198 twin: the q69 closure + a per-component majority vote with
    * the (n DESC, label ASC) window ladder. */
  private def clusterLabelVoteOracle: String =
    s"""WITH RECURSIVE $minHashPairCtes,
       |edges AS (SELECT id_a, id_b FROM jac WHERE CAST(n_common AS DOUBLE) / n_union >= 0.3),
       |sym AS (SELECT id_a AS s, id_b AS d FROM edges UNION ALL SELECT id_b, id_a FROM edges),
       |reach AS (SELECT doc_id AS id, doc_id AS r FROM documents
       |          UNION
       |          SELECT sym.d, reach.r FROM reach JOIN sym ON sym.s = reach.id),
       |comp AS (SELECT id AS doc_id, MIN(r) AS component FROM reach GROUP BY id),
       |lab AS (SELECT d.doc_id, d.lang, c.component FROM documents d JOIN comp c USING (doc_id)),
       |vt AS (SELECT component, lang AS lbl, CAST(COUNT(*) AS BIGINT) AS n FROM lab GROUP BY 1, 2),
       |wn AS (SELECT component, lbl AS cluster_label, n AS n_label_votes,
       |  ROW_NUMBER() OVER (PARTITION BY component ORDER BY n DESC, lbl ASC) AS rn,
       |  CAST(SUM(n) OVER (PARTITION BY component) AS BIGINT) AS n_cluster FROM vt)
       |SELECT l.doc_id, l.lang, l.component, w.cluster_label, w.n_cluster,
       |  w.n_label_votes, l.lang = w.cluster_label AS label_agrees
       |FROM lab l JOIN wn w ON w.component = l.component AND w.rn = 1
       |ORDER BY l.doc_id""".stripMargin

  val oracle: Map[String, String] = Map(
    "q198_cluster_label_vote" -> clusterLabelVoteOracle,
    "q196_minhash_accuracy" -> minHashAccuracyOracle,
    "q191_span_report_incr" -> substringSpansIncrOracle,
    "q190_phash_incr" -> pHashIncrOracle,
    "q188_dedup_decisions" -> dedupDecisionsOracle,
    "q186_simhash_incr" -> simHashIncrOracle,
    "q185_minhash_lsh_incr" -> minHashLshIncrOracle,
    // q176: the incremental path must answer exactly what a from-scratch
    // closure over ALL pairs answers — the q69 oracle verbatim
    "q176_components_incr" -> nearDupComponentsOracle,
    "q174_cdc_chunk_dedup" -> cdcChunkDedupOracle,
    "q171_segment_dedup_incr" -> segmentDedupIncrOracle,
    "q167_segment_dedup" -> segmentDedupOracle,
    "q121_leakage_safe_split" -> leakageSafeSplitOracle,
    "q123_substring_spans" -> substringSpansOracle,
    "q127_span_removal" -> spanRemovalOracle,
    "q114_fuzzy_name_join" ->
      ("WITH d AS (SELECT p_name, COUNT(*) AS n FROM part GROUP BY p_name) " +
        "SELECT a.p_name AS name_a, b.p_name AS name_b, " +
        "CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist, " +
        "CAST(a.n AS BIGINT) AS n_parts_a, CAST(b.n AS BIGINT) AS n_parts_b " +
        "FROM d a JOIN d b ON a.p_name < b.p_name " +
        "AND levenshtein(a.p_name, b.p_name) <= 2 ORDER BY name_a, name_b"),
    "q112_phash_near_dup" -> pHashNearDupOracle,
    "q88_authority_rank" -> authorityRankOracle,
    "q38_minhash_lsh" -> minHashLshOracle,
    "q39_simhash" -> simHashOracle,
    "q69_near_dup_components" -> nearDupComponentsOracle,
    "q80_near_dup_survivors" -> nearDupSurvivorsOracle,
    "q84_incremental_dedup" -> incrementalDedupOracle,
    "q35_exact_dedup_stats" ->
      ("SELECT COUNT(*) AS n_docs, " +
        "COUNT(DISTINCT lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS n_distinct, " +
        "COUNT(*) - COUNT(DISTINCT lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS n_dup_rows " +
        "FROM documents"),
    "q36_dedup_keep_first" ->
      ("SELECT doc_id, lang, source FROM " +
        "(SELECT doc_id, lang, source, ROW_NUMBER() OVER " +
        "(PARTITION BY lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) " +
        "ORDER BY doc_id) AS rn FROM documents) WHERE rn = 1 ORDER BY doc_id"),
    // q134: the SAME prefix-filtered algorithm in SQL — df-ascending
    // token rank per doc, prefix length sz-ceil(tau*sz)+1, length +
    // positional prunes in the candidate join, integer cross-multiplied
    // Jaccard verification. tau = 9/10.
    "q134_setsim_join" ->
      ("WITH t AS (SELECT doc_id, lang, source, " +
        "list_distinct(string_split_regex(text, '\\s+')) AS l FROM documents), " +
        "tok AS (SELECT doc_id, lang, source, len(l) AS sz, unnest(l) AS token FROM t), " +
        "dfreq AS (SELECT token, count(*) AS df FROM tok GROUP BY 1), " +
        "ord AS (SELECT doc_id, lang, source, sz, token, " +
        "row_number() OVER (PARTITION BY doc_id ORDER BY df, token) AS pos " +
        "FROM tok JOIN dfreq USING (token)), " +
        "pre AS (SELECT * FROM ord WHERE pos <= sz - ((9*sz + 9) // 10) + 1), " +
        "cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "a.sz AS sz_a, b.sz AS sz_b " +
        "FROM pre a JOIN pre b ON a.token = b.token AND a.lang = b.lang " +
        "AND a.source = b.source AND a.doc_id < b.doc_id " +
        "AND a.sz * 10 >= 9 * b.sz AND b.sz * 10 >= 9 * a.sz " +
        "AND 1 + least(a.sz - a.pos, b.sz - b.pos) >= (9*(a.sz+b.sz) + 18) // 19 " +
        "GROUP BY 1, 2, 3, 4), " +
        "ver AS (SELECT id_a, id_b, sz_a, sz_b, " +
        "CAST(len(list_filter(ta.l, x -> list_contains(tb.l, x))) AS BIGINT) AS n_common " +
        "FROM cand JOIN t ta ON ta.doc_id = id_a JOIN t tb ON tb.doc_id = id_b) " +
        "SELECT id_a, id_b, n_common, CAST(sz_a AS BIGINT) AS sz_a, " +
        "CAST(sz_b AS BIGINT) AS sz_b FROM ver " +
        "WHERE n_common * 10 >= 9 * (sz_a + sz_b - n_common)"),
    // q140: the R-S form — the mod-3 split partitions the corpus, so
    // the union df IS the corpus df and the same ranked prefixes serve
    // both sides; the candidate join crosses sides with no id-order
    // constraint
    "q140_setsim_cross_join" ->
      ("WITH t AS (SELECT doc_id, lang, source, " +
        "list_distinct(string_split_regex(text, '\\s+')) AS l FROM documents), " +
        "tok AS (SELECT doc_id, lang, source, len(l) AS sz, unnest(l) AS token FROM t), " +
        "dfreq AS (SELECT token, count(*) AS df FROM tok GROUP BY 1), " +
        "ord AS (SELECT doc_id, lang, source, sz, token, " +
        "row_number() OVER (PARTITION BY doc_id ORDER BY df, token) AS pos " +
        "FROM tok JOIN dfreq USING (token)), " +
        "pre AS (SELECT * FROM ord WHERE pos <= sz - ((9*sz + 9) // 10) + 1), " +
        "cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
        "a.sz AS sz_a, b.sz AS sz_b " +
        "FROM pre a JOIN pre b ON a.token = b.token AND a.lang = b.lang " +
        "AND a.source = b.source AND a.doc_id % 3 = 0 AND b.doc_id % 3 <> 0 " +
        "AND a.sz * 10 >= 9 * b.sz AND b.sz * 10 >= 9 * a.sz " +
        "AND 1 + least(a.sz - a.pos, b.sz - b.pos) >= (9*(a.sz+b.sz) + 18) // 19 " +
        "GROUP BY 1, 2, 3, 4), " +
        "ver AS (SELECT id_a, id_b, sz_a, sz_b, " +
        "CAST(len(list_filter(ta.l, x -> list_contains(tb.l, x))) AS BIGINT) AS n_common " +
        "FROM cand JOIN t ta ON ta.doc_id = id_a JOIN t tb ON tb.doc_id = id_b) " +
        "SELECT id_a, id_b, n_common, CAST(sz_a AS BIGINT) AS sz_a, " +
        "CAST(sz_b AS BIGINT) AS sz_b FROM ver " +
        "WHERE n_common * 10 >= 9 * (sz_a + sz_b - n_common)"),
    "q37_jaccard_pairs" ->
      ("SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "CAST(len(list_filter(list_distinct(a.l), x -> list_contains(b.l, x))) AS INT) AS n_common, " +
        "CAST(len(list_distinct(a.l)) + len(list_distinct(b.l)) - " +
        "len(list_filter(list_distinct(a.l), x -> list_contains(b.l, x))) AS INT) AS n_union, " +
        "CAST(len(list_filter(list_distinct(a.l), x -> list_contains(b.l, x))) AS DOUBLE) / " +
        "(len(list_distinct(a.l)) + len(list_distinct(b.l)) - " +
        "len(list_filter(list_distinct(a.l), x -> list_contains(b.l, x)))) AS jaccard " +
        "FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS l FROM documents) a " +
        "JOIN (SELECT doc_id, string_split_regex(text, '\\s+') AS l FROM documents) b " +
        "ON b.doc_id = a.doc_id + 1 ORDER BY doc_a")
  )
}
