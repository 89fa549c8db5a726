package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Deduplication operators for training-data pipelines — exact,
  * MinHash-LSH, SimHash, and n-gram Jaccard — designed for 100 TB scale:
  *
  *  - signatures are computed ROW-LOCALLY (array folds, no explode), so the
  *    only shuffles are the final group-by-key / bucket-join — each keyed on
  *    a hash that distributes uniformly (no skew);
  *  - LSH candidate generation joins on (band, bandHash) buckets, never
  *    cross-joining documents — candidate count scales with true-duplicate
  *    density, not N²;
  *  - exact-Jaccard verification touches only candidate pairs.
  *
  * Generalizes the reference's seen-set/anti-join dedup (SURVEY §2.7
  * D1/D4/D6, tracker.py:107-126) to content-level near-duplication.
  */
object Dedup {

  /** Normalized text for exact-dup hashing: lowercase, collapsed
    * whitespace. */
  def normalized(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Exact dedup: keep one row per distinct normalized text (first by
    * `tieBreak` — deterministic). Scale: one hash-partitioned shuffle on the
    * 256-bit content hash; no skew (hash keys are uniform).
    *
    * Why the window and not a `min_by(struct(*))` aggregate (r8 A/B,
    * measured negative and kept as a pin): the aggregate form would
    * combine map-side — a win on a dup-HEAVY corpus — but it packs
    * every column into a struct value, which drops the aggregate out
    * of the vectorized hash path, and on this (nearly dup-free)
    * corpus it measured strictly worse: q36 0.38/0.45 → 0.45/0.45,
    * q146 2.05/2.13 → 2.27/2.34 s (interleaved ONLY-mode at sf0.1,
    * window re-confirmed after revert). Revisit only for corpora with
    * high exact-dup rates, where map-side combine shrinks the
    * exchange itself. */
  def exactDedup(df: DataFrame, textCol: String, tieBreak: String): DataFrame = {
    val w = Window.partitionBy(sha2(normalized(col(textCol)), 256))
      .orderBy(col(tieBreak))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signatures for a whole table: `numPerms` permutations
    * approximated by seeded xxhash64 over `shingleN`-token shingles.
    *
    * Shape: explode shingles → hash each ONCE → hash-aggregate `numPerms`
    * MINs per doc. Spark's higher-order array lambdas are interpreted (no
    * codegen, no cross-expression CSE), so a row-local `array_min(transform)`
    * per permutation re-evaluates the shingling numPerms times — measured
    * 100× slower. The explode+partial-agg shape is fully codegen'd and the
    * map-side partial MIN reduces the shuffle to numPerms longs per doc per
    * partition.
    *
    * Returns (id, sig array<long>); docs with fewer than `shingleN` tokens
    * get Long.MaxValue slots. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numPerms: Int, shingleN: Int): DataFrame = {
    val exploded = TextAnalysis.shingleRows(
      df.select(col(idCol).as("id"), normalized(col(textCol)).as("text")),
      "id", "text", shingleN)
      .withColumn("h", xxhash64(col("shingle")))
    // xxhash64 skips null inputs (returns the seed), so null shingles from
    // explode_outer must be masked explicitly to reach the MaxValue sentinel
    val minCols = (0 until numPerms).map { i =>
      coalesce(
        min(when(col("shingle").isNotNull, xxhash64(lit(i), col("h")))),
        lit(Long.MaxValue)).as(s"m$i")
    }
    exploded.groupBy(col("id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("id"), array((0 until numPerms).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Band hashes over a minhash signature: `numBands` hashes, each over
    * `rowsPerBand` consecutive slots. */
  def bandHashes(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      xxhash64(lit(b) +: (0 until rowsPerBand)
        .map(r => element_at(sig, b * rowsPerBand + r + 1)): _*)
    }: _*)

  /** Sentinel for empty-shingle docs in the portable signature:
    * lexicographically above every 8-hex-char md5 lane. */
  val PortableSentinel: String = "f" * 8

  /** Portable twin of [[minHashSignatures]] keyed on md5 hex instead of
    * seeded xxhash64. md5 is computed identically by Spark and DuckDB, so
    * queries built on this variant are hash-verifiable end to end;
    * fixed-width hex compares lexicographically exactly as the underlying
    * unsigned value, so MIN over the strings is a valid minhash. Each md5
    * digest yields FOUR 32-bit lanes (8 hex chars each), so `numPerms`
    * permutations cost numPerms/4 + 1 md5 calls per shingle; 32-bit
    * minhash is ample since candidates are exact-Jaccard-verified.
    * Computed by the one-pass [[graft.plans.GraftMinHash]] kernel —
    * signatures are a per-document property, and the declarative
    * explode→window-lead→MIN formulation (kept below as the spec-pinned
    * twin) pays two corpus-wide shuffles for what a row-local pass
    * computes in place. Still costlier than the xxhash64 path — prefer
    * [[minHashSignatures]] off the oracle path.
    * Returns (id, sig array<string>). */
  def minHashSignaturesPortable(df: DataFrame, idCol: String, textCol: String,
                                numPerms: Int, shingleN: Int): DataFrame =
    df.select(col(idCol).as("id"),
      call_function("graft_minhash", normalized(col(textCol)),
        lit(numPerms), lit(shingleN)).as("sig"))

  /** The pure-relational formulation of [[minHashSignaturesPortable]] —
    * the kernel's semantic pin (DedupSpec asserts equality). Lane-packing
    * alternatives benched here historically: one md5 per permutation
    * +20%; conv(hex,16,10)→long lanes +55%. */
  def minHashSignaturesPortableDeclarative(
      df: DataFrame, idCol: String, textCol: String,
      numPerms: Int, shingleN: Int): DataFrame = {
    require(numPerms % 4 == 0, "numPerms must be a multiple of 4 (md5 lanes)")
    val exploded = TextAnalysis.shingleRows(
      df.select(col(idCol).as("id"), normalized(col(textCol)).as("text")),
      "id", "text", shingleN)
      .withColumn("hh", graft.plans.GraftMd5.column(col("shingle")))
    val groups = (0 until numPerms / 4).map { g =>
      graft.plans.GraftMd5.column(concat(lit(s"$g:"), col("hh"))).as(s"g$g")
    }
    val laned = exploded.select(col("id") +: col("shingle") +: groups: _*)
    val minCols = (0 until numPerms).map { i =>
      val lane = substring(col(s"g${i / 4}"), (i % 4) * 8 + 1, 8)
      coalesce(
        min(when(col("shingle").isNotNull, lane)),
        lit(PortableSentinel)).as(s"m$i")
    }
    laned.groupBy(col("id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("id"), array((0 until numPerms).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Portable band hashes: md5 over '|'-joined slot lanes. */
  def bandHashesPortable(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { b =>
      graft.plans.GraftMd5.column(concat_ws("|", (0 until rowsPerBand)
        .map(r => element_at(sig, b * rowsPerBand + r + 1)): _*))
    }: _*)

  /** MinHash-LSH candidate pairs with exact-Jaccard verification.
    *
    * Pipeline: signature (row-local) → posexplode bands → self-join on
    * (band, bandHash) with id_a < id_b → distinct pairs → join token sets
    * back → exact Jaccard filter ≥ `threshold`.
    *
    * Returns (id_a, id_b, n_common, n_union, jaccard). Scale notes: the
    * band-bucket join shuffles on uniform 64-bit hashes; a pathological
    * bucket (constant text) is bounded by `maxBucket` via a bucket-size
    * pre-filter, trading recall on degenerate data for worst-case safety.
    */
  def minHashLsh(df: DataFrame, idCol: String, textCol: String,
                 numPerms: Int = 32, numBands: Int = 8,
                 shingleN: Int = 3, threshold: Double = 0.5,
                 maxBucket: Int = 1000): DataFrame =
    lshVerify(df, idCol, textCol, threshold, maxBucket,
      minHashSignatures(df, idCol, textCol, numPerms, shingleN),
      sig => bandHashes(sig, numBands, numPerms / numBands))

  /** [[minHashLsh]] on the portable md5-hex signatures — identical pair
    * semantics, oracle-verifiable (DuckDB reproduces every hash). */
  def minHashLshPortable(df: DataFrame, idCol: String, textCol: String,
                         numPerms: Int = 32, numBands: Int = 8,
                         shingleN: Int = 3, threshold: Double = 0.5,
                         maxBucket: Int = 1000): DataFrame =
    lshVerify(df, idCol, textCol, threshold, maxBucket,
      minHashSignaturesPortable(df, idCol, textCol, numPerms, shingleN),
      sig => bandHashesPortable(sig, numBands, numPerms / numBands))

  /** Banded signatures with degenerate buckets removed (shared by the
    * self-join and cross-split candidate generators). */
  private def boundedBands(sigs: DataFrame, bandHash: Column => Column,
                           maxBucket: Int): DataFrame = {
    val banded = sigs
      .select(col("id"), posexplode(bandHash(col("sig"))))
      .toDF("id", "band", "bhash")
    banded
      .withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy(col("band"), col("bhash"))))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
  }

  /** Exact-Jaccard verification of candidate (id_a, id_b) pairs. */
  private def verifyPairs(df: DataFrame, idCol: String, textCol: String,
                          threshold: Double, pairs: DataFrame): DataFrame = {
    val tokens = df.select(
      col(idCol).as("id"),
      array_distinct(TextAnalysis.tokens(normalized(col(textCol)))).as("toks"))
    pairs
      .join(tokens.select(col("id").as("id_a"), col("toks").as("toks_a")), "id_a")
      .join(tokens.select(col("id").as("id_b"), col("toks").as("toks_b")), "id_b")
      .withColumn("n_common", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("n_union", size(array_union(col("toks_a"), col("toks_b"))))
      .withColumn("jaccard", col("n_common").cast("double") / col("n_union"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_common"), col("n_union"), col("jaccard"))
  }

  /** Shared LSH tail: band-bucket self-join (bounded) + exact-Jaccard
    * verification on candidate pairs.
    *
    * MEASURED-NEGATIVE pin (r13): the FuzzyJoin-style bucket form —
    * groupBy(band, bhash) + sort_array(collect_list(id)) + row-local
    * i<j pair explode, killing the bucket window and the join's second
    * signature subtree — was built, oracle-checked green on all ten
    * consumers, and measured WORSE at min-of-pass ONLY-mode sf0.1
    * (q198 1.68 -> 2.16, q121 1.99 -> 2.28, q188 1.69 -> 1.82, q38/q69
    * flat): on this self-similar corpus LSH buckets run large (up to
    * the 1000 cap), so the interpreted HOF pair-generation lambdas pay
    * per-element costs the codegen'd join never does, while AQE already
    * reuses the (band, bhash) exchange for the join's second side. The
    * same rewrite WINS in [[FuzzyJoin.selfJoin]], whose deletion-variant
    * buckets are tiny. Keep the join form here. */
  private def lshVerify(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double, maxBucket: Int,
                        sigs: DataFrame, bandHash: Column => Column): DataFrame = {
    val bounded = boundedBands(sigs, bandHash, maxBucket)
    val pairs = bounded.as("a")
      .join(bounded.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    verifyPairs(df, idCol, textCol, threshold, pairs)
  }

  /** Cross-split LSH: ONLY the candidate pairs that straddle `isLeft` —
    * the incremental-ingest shape, where a small batch probes the
    * warehouse and nobody asked about warehouse-internal duplicates.
    * The full-corpus [[minHashLshPortable]] followed by a crossing filter
    * generates and Jaccard-verifies every within-side pair first
    * (~(6/7)²+(1/7)² ≈ 76% wasted work at a 1/7 batch fraction); here the
    * band join itself is left-vs-right, so within-side candidates never
    * exist. The bucket bound counts over the UNION (identical exclusion
    * set to the self-join form), so the output is exactly the crossing
    * subset of the full pair list. Pairs are normalized id_a < id_b. */
  def minHashLshPortableCross(df: DataFrame, idCol: String, textCol: String,
                              isLeft: Column,
                              numPerms: Int = 32, numBands: Int = 8,
                              shingleN: Int = 3, threshold: Double = 0.5,
                              maxBucket: Int = 1000): DataFrame = {
    val sigs = minHashSignaturesPortable(df, idCol, textCol, numPerms, shingleN)
    val split = df.select(col(idCol).as("id"), isLeft.as("__left"))
    val bounded = boundedBands(sigs,
      sig => bandHashesPortable(sig, numBands, numPerms / numBands), maxBucket)
      .join(split, Seq("id"))
    val pairs = bounded.filter(col("__left")).as("a")
      .join(bounded.filter(!col("__left")).as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash"))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
    verifyPairs(df, idCol, textCol, threshold, pairs)
  }

  /** The persisted LSH state for a corpus split: one (id, band, bhash)
    * row per document band, on the portable md5 signature path — the
    * signature-warehouse relation [[minHashLshIncremental]] probes.
    * Mergeable by construction (band rows of disjoint corpora union —
    * the q181 token-count / q171 segment-hash state contract); a
    * deployment persists it bucketed by (band, bhash) so daily probes
    * co-locate without shuffling the warehouse side. */
  def lshBandWarehouse(df: DataFrame, idCol: String, textCol: String,
                       numPerms: Int = 32, numBands: Int = 8,
                       shingleN: Int = 3): DataFrame =
    minHashSignaturesPortable(df, idCol, textCol, numPerms, shingleN)
      .select(col("id"),
        posexplode(bandHashesPortable(col("sig"), numBands, numPerms / numBands)))
      .toDF("id", "band", "bhash")

  /** Incremental MinHash-LSH near-dup detection against a persisted
    * signature warehouse — the r9-VERDICT gap in the incremental dedup
    * ladder (segments q171, components q176, KL q181 had their forms;
    * this is MinHash's). Returns every verified pair INVOLVING a batch
    * doc — batch↔warehouse and batch↔batch — exactly the subset of the
    * full-rebuild pair list that mentions the batch (oracle-gated by
    * full-rebuild equality, the q181 contract).
    *
    * Work ∝ batch, never corpus: only the BATCH is ever signed (one
    * row-local kernel pass); the warehouse contributes pre-computed
    * band rows, restricted by a semi-join to the buckets the batch
    * actually touches (bucketed-by-(band,bhash) storage makes that a
    * co-located probe with no warehouse shuffle). The bucket-size
    * bound counts batch + touched-warehouse rows — identical to the
    * full rebuild's count for every bucket that can produce a
    * batch-involving pair, so the exclusion set matches exactly.
    * Exact-Jaccard verification JOINS only candidate pairs: the tiny
    * pair list broadcasts, so the token relation streams through two
    * BroadcastHashJoins without shuffling. (r13 A-B-A, kept as a pin:
    * an explicit candidate semi-join before the tokenize — pinned
    * pair list, broadcast id set, the q196 shape — cut the verify
    * tokenize from corpus to candidates but measured strictly worse
    * on WALL at every scale: ONLY-mode sf0.1 q185 1.90 vs 1.70,
    * q208 6.6 vs 5.85; x100 probe ~22-26 vs 19.7-20.0 s warm-cache
    * interleaved. The tokenize kernel streams cache-resident scan
    * bytes; the bounding added a pair-chain pin + an extra join stage
    * that cost more than the kernel it saved. Unlike q196, where
    * candidate restriction gated a 2.5 GB SHUFFLE, verify's token
    * legs never shuffle — restriction only pays when it prunes an
    * exchange, not a streamed scan.)
    *
    * `warehouseDocs` supplies (idCol, textCol) for the verification
    * token sets of warehouse-side candidates — at scale an id-bucketed
    * table probed per candidate, never scanned per batch doc. */
  def minHashLshIncremental(warehouseBands: DataFrame, warehouseDocs: DataFrame,
                            batch: DataFrame, idCol: String, textCol: String,
                            numPerms: Int = 32, numBands: Int = 8,
                            shingleN: Int = 3, threshold: Double = 0.5,
                            maxBucket: Int = 1000): DataFrame = {
    val batchBands =
      lshBandWarehouse(batch, idCol, textCol, numPerms, numBands, shingleN)
        .withColumn("__batch", lit(true))
    val touched = batchBands.select(col("band"), col("bhash")).distinct()
    val whTouched = warehouseBands
      .join(touched, Seq("band", "bhash"), "left_semi")
      .select(col("id"), col("band"), col("bhash"))
      .withColumn("__batch", lit(false))
    // Both sides of the pair self-join consume this relation, and the
    // a-side's __batch filter defeats exchange reuse, so the union +
    // bucket window runs twice. A localCheckpoint pin was A-B-measured
    // (r10) and LOST on wall at both sf0.1 (noise) and x100 (18.4 →
    // 20.8 s; read bytes −20% but synchronous materialization costs
    // more than the recompute it saves — the q173 lesson). Left lazy
    // deliberately.
    val bounded = batchBands.unionByName(whTouched)
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col("band"), col("bhash"))))
      .filter(col("__n") <= maxBucket)
      .drop("__n")
    val pairs = bounded.filter(col("__batch")).as("a")
      .join(bounded.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
          col("a.id") =!= col("b.id"))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .distinct()
    val docs = warehouseDocs.select(col(idCol), col(textCol))
      .unionByName(batch.select(col(idCol), col(textCol)))
    verifyPairs(docs, idCol, textCol, threshold, pairs)
  }

  /** 64-bit SimHash per doc: bit b of the hash is set iff the sum of ±1
    * votes from token-hash bit b is positive.
    *
    * Same explode+partial-agg shape as [[minHashSignatures]] (and for the
    * same reason — interpreted array folds would re-hash every token 64
    * times): explode tokens → xxhash64 once → 64 codegen'd SUM aggregates
    * (map-side combined) → assemble bits. Returns (id, simhash). */
  def simHashTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(normalized(col(textCol)))
    val exploded = df.select(col(idCol).as("id"), explode_outer(toks).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val voteCols = (0 until 64).map { b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"v$b")
    }
    exploded.groupBy(col("id"))
      .agg(voteCols.head, voteCols.tail: _*)
      .select(col("id"),
        (0 until 64).map { b =>
          when(col(s"v$b") > 0,
            lit(if (b == 63) Long.MinValue else 1L << b)).otherwise(0L)
        }.reduce(_ + _).as("simhash"))
  }

  /** Portable SimHash twin of [[simHashTable]]: the per-token 64-bit hash
    * is the first 16 hex chars of md5(token) and the fingerprint is emitted
    * as a 16-char hex string — every step (md5, substring, per-nibble bit
    * votes) is computed identically by DuckDB, so this variant is
    * oracle-verifiable. Computed by the one-pass [[graft.plans.GraftSimHash]]
    * kernel (fingerprints are per-document; the declarative twin below is
    * the spec pin). Returns (id, simhash_hex). */
  def simHashHexTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      call_function("graft_simhash", normalized(col(textCol))).as("simhash_hex"))

  /** The explode → conv-nibble → 64-SUM-votes formulation of
    * [[simHashHexTable]] — the kernel's semantic pin (DedupSpec). */
  def simHashHexTableDeclarative(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hexChars = array(("0123456789abcdef").map(c => lit(c.toString)): _*)
    val toks = TextAnalysis.tokens(normalized(col(textCol)))
    // per-row: 16 nibble values of the token's 64-bit hash prefix
    val chars = df.select(col(idCol).as("id"), explode_outer(toks).as("t"))
      .withColumn("h", substring(graft.plans.GraftMd5.column(col("t")), 1, 16))
      .select(col("id") +: (1 to 16).map(j =>
        conv(substring(col("h"), j, 1), 16, 10).cast("int").as(s"c$j")): _*)
    // bit b lives in hex char 16 - b/4 at in-nibble offset b%4
    val voteCols = (0 until 64).map { b =>
      sum(shiftright(col(s"c${16 - b / 4}"), b % 4).bitwiseAND(lit(1)) * 2 - 1)
        .as(s"v$b")
    }
    val nibbleChars = (1 to 16).map { j =>
      val base = 4 * (16 - j)
      val nib = Seq(3, 2, 1, 0).map(k =>
        when(col(s"v${base + k}") > 0, lit(1 << k)).otherwise(lit(0)))
        .reduce(_ + _)
      element_at(hexChars, nib + 1)
    }
    chars.groupBy(col("id"))
      .agg(voteCols.head, voteCols.tail: _*)
      .select(col("id"), concat(nibbleChars: _*).as("simhash_hex"))
  }

  /** Hamming distance between two 16-hex-char SimHash fingerprints,
    * computed nibble-by-nibble (portable: DuckDB replays strpos/xor/
    * bit_count identically — the q39/q112 hex-carrier convention; a
    * conv(hex,16,10) → long route would overflow signed 64-bit). */
  def hexHamming(a: Column, b: Column): Column =
    (1 to 16).map { j =>
      val na = instr(lit("0123456789abcdef"), substring(a, j, 1)) - 1
      val nb = instr(lit("0123456789abcdef"), substring(b, j, 1)) - 1
      bit_count(na.bitwiseXOR(nb))
    }.reduce(_ + _).cast("long")

  /** Incremental SimHash near-dup detection against a persisted
    * fingerprint warehouse — the SimHash rung of the incremental dedup
    * ladder (MinHash has [[minHashLshIncremental]]; this closes the
    * [[simHashHexTable]] scaladoc's persisted-signature promise with an
    * actual warehouse form). `warehouseFps` is the persisted state: the
    * (id, simhash_hex) relation [[simHashHexTable]] emits, mergeable by
    * plain union (fingerprints are per-doc properties). Only the BATCH
    * is ever fingerprinted (one row-local kernel pass); its four 16-bit
    * bands (4-hex-char substrings) probe the warehouse band rows
    * restricted to touched buckets, and candidates verify with the
    * exact nibble-popcount Hamming distance.
    *
    * Pigeonhole exhaustiveness (the [[PerceptualHash.nearDupPairs]]
    * guarantee): ≤ 3 flipped bits cannot touch all 4 bands, so every
    * pair within `maxHamming ≤ 3` shares an intact band — the banded
    * probe equals the N² scan bit-for-bit (oracle-gated against that
    * scan), enforced by require. `maxBucket` bounds degenerate buckets
    * exactly like the pHash join; at the default it never triggers
    * below ~10⁵ docs per 16-bit band value.
    *
    * Returns (id_a, id_b, hamming) for every qualifying pair INVOLVING
    * a batch doc — batch↔warehouse and batch↔batch. */
  def simHashNearDupIncremental(warehouseFps: DataFrame, batch: DataFrame,
                                idCol: String, textCol: String,
                                maxHamming: Int = 3,
                                maxBucket: Int = 100000): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banded probe is exhaustive only for maxHamming <= 3 " +
        s"(pigeonhole over 4 16-bit bands); got $maxHamming")
    // r17 (guide §4): the Hamming verify runs once PER CANDIDATE PAIR —
    // every pair of docs sharing a 16-bit band bucket, measured 4.2M
    // pairs on the x10 replica where band rows number only ~200k — so
    // per-pair expression cost dominates the probe. [[hexHamming]]'s
    // 16-nibble strpos/substring chain (~96 expression nodes, two string
    // allocations per nibble) moves to the band ROWS as two packed
    // 32-bit halves (conv is exact: 8 hex chars < 2^32 fits a long),
    // and each pair pays 2 xor + 2 bit_count. Same integer, pinned by
    // DedupSpec against hexHamming; the oracle still replays the
    // nibble arithmetic on its side.
    def bandRows(fps: DataFrame): DataFrame = fps
      .select(col("id"), col("simhash_hex"),
        conv(substring(col("simhash_hex"), 1, 8), 16, 10)
          .cast("long").as("__hi"),
        conv(substring(col("simhash_hex"), 9, 8), 16, 10)
          .cast("long").as("__lo"),
        posexplode(array((0 until 4).map(j =>
          substring(col("simhash_hex"), j * 4 + 1, 4)): _*))
          .as(Seq("band", "bval")))
      .drop("simhash_hex")
    val batchBands =
      bandRows(simHashHexTable(batch, idCol, textCol))
        .withColumn("__batch", lit(true))
    val touched = batchBands.select(col("band"), col("bval")).distinct()
    // warehouseFps carries simHashHexTable's own (id, simhash_hex)
    val whTouched = bandRows(warehouseFps.select(col("id"), col("simhash_hex")))
      .join(touched, Seq("band", "bval"), "left_semi")
      .withColumn("__batch", lit(false))
    val bounded = batchBands.unionByName(whTouched)
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col("band"), col("bval"))))
      .filter(col("__n") <= maxBucket)
      .drop("__n")
    bounded.filter(col("__batch")).as("a")
      .join(bounded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.id") =!= col("b.id"))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        // hamming is symmetric, so both orientations of a batch↔batch
        // pair produce the same row and the distinct collapses them
        (bit_count(col("a.__hi").bitwiseXOR(col("b.__hi"))) +
          bit_count(col("a.__lo").bitwiseXOR(col("b.__lo"))))
          .cast("long").as("hamming"))
      // r17 (guide §2.3): filter BEFORE distinct — the threshold is a
      // per-row predicate identical across orientations, so the distinct
      // dedupes the qualifying pairs (hundreds) instead of every
      // candidate (millions): same rows out, ~10^4× smaller exchange
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The dedup DECISION table — the artifact a production dedup pass
    * ships: one row per document with the keep/drop verdict, a reason
    * code, and the survivor it defers to. Layer precedence: exact dup
    * of an earlier doc (min id over the normalized-text md5 class)
    * beats near-dup (non-minimum member of the LSH-pair connected
    * component) beats kept. A doc that is BOTH (an exact dup whose
    * component holds an even smaller member) reports exact_dup and
    * defers to its exact keeper — survivor chains resolve
    * transitively, keeper by keeper, exactly as a pipeline applies
    * them. Deterministic end to end; q188 gates the whole table under
    * one oracle hash. Output: (idCol, kept, reason, survivor). */
  def dedupDecisions(docs: DataFrame, idCol: String, textCol: String,
                     numPerms: Int = 32, numBands: Int = 8,
                     shingleN: Int = 3, threshold: Double = 0.3): DataFrame = {
    val exact = docs
      .select(col(idCol), md5(normalized(col(textCol))).as("__nh"))
      .withColumn("ek", min(col(idCol)).over(Window.partitionBy(col("__nh"))))
      .select(col(idCol), col("ek"))
    val pairs = minHashLshPortable(docs, idCol, textCol,
        numPerms, numBands, shingleN, threshold)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val comp = ConnectedComponents
      .auto(pairs, docs.select(col(idCol).as("id")))
    exact.join(comp, exact(idCol) === comp("id"))
      .select(col(idCol),
        (col("ek") >= col(idCol) && col("component") >= col(idCol))
          .as("kept"),
        when(col("ek") < col(idCol), lit("exact_dup"))
          .when(col("component") < col(idCol), lit("near_dup"))
          .otherwise(lit("kept")).as("reason"),
        when(col("ek") < col(idCol), col("ek"))
          .when(col("component") < col(idCol), col("component"))
          .otherwise(col(idCol)).cast("long").as("survivor"))
  }

  /** Estimation accuracy of the MinHash signature ITSELF — "measure,
    * don't guess" (the q192 ANN-recall convention) applied to the dedup
    * ladder: how close is the k-lane signature-agreement estimate to the
    * exact shingle-set Jaccard it stands in for, as k grows? The curve a
    * deployment reads to size its signatures (error ∝ 1/√k by the
    * Broder 1997 analysis; this measures it on THIS corpus).
    *
    * Pair universe: the LSH band candidates of the FULL `numPerms`
    * signature (the pairs a dedup pipeline actually adjudicates),
    * restricted to pairs where both sides have ≥ 1 shingle (sentinel
    * lanes estimate nothing). Signature prefixes nest — lane i is md5
    * group i/4 of the same portable construction — so ONE signature
    * computation serves every curve point. All integers: per pair,
    * est_e6(k) = agreeing-lanes·10⁶ div k vs exact_e6 = |∩|·10⁶ div |∪|
    * over distinct shingle md5s; per k the rollup emits
    * (sig_size, n_pairs, mae_e6, sum_err_e6, max_abs_e6) — the signed
    * error SUM is emitted undivided (no signed integer division to
    * disagree on cross-engine; readers divide).
    *
    * Scale shape: signature + banding is the q38 machinery (row-local
    * kernel, bounded buckets); the exact-Jaccard leg joins candidate
    * pairs against the distinct (doc, shingle-md5) relation — work ∝
    * candidates · shingles-per-doc, never N². The curve itself is
    * |sizes| rows. */
  def minHashAccuracyCurve(df: DataFrame, idCol: String, textCol: String,
                           sizes: Seq[Int] = Seq(4, 8, 16, 32),
                           numPerms: Int = 32, numBands: Int = 8,
                           shingleN: Int = 3, maxBucket: Int = 1000): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(k => k > 0 && k <= numPerms),
      "every curve point must fit inside the computed signature")
    val sigs = minHashSignaturesPortable(df, idCol, textCol, numPerms, shingleN)
      .localCheckpoint(true) // three consumers: banding + both pair sides
    val bounded = boundedBands(sigs,
      sig => bandHashesPortable(sig, numBands, numPerms / numBands), maxBucket)
    val pairs = bounded.as("a")
      .join(bounded.as("b"),
        col("a.band") === col("b.band") && col("a.bhash") === col("b.bhash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
      .localCheckpoint(true) // candidate-doc semi-join + both pair sides
    // exact shingle-set Jaccard — the quantity the signature estimates —
    // over CANDIDATE docs only (the r10 x100 lesson: shingling the whole
    // corpus here shuffled GBs for a pair list measured in thousands;
    // the semi-join keeps the exact leg ∝ candidates, as claimed)
    val candDocs = pairs
      .select(explode(array(col("id_a"), col("id_b"))).as("id")).distinct()
    val sets = TextAnalysis.shingleRows(
        df.select(col(idCol).as("id"), normalized(col(textCol)).as("text"))
          .join(candDocs, Seq("id"), "semi"),
        "id", "text", shingleN)
      .filter(col("shingle").isNotNull)
      .select(col("id"), graft.plans.GraftMd5.column(col("shingle")).as("hh"))
      .distinct()
      .localCheckpoint(true) // set sizes + both intersection sides
    val ns = sets.groupBy(col("id")).agg(count(lit(1)).as("ns"))
    val inter = pairs
      .join(sets.select(col("id").as("id_a"), col("hh")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("hh")), Seq("id_b", "hh"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("ni"))
    val base = pairs
      .join(ns.select(col("id").as("id_a"), col("ns").as("nsa")), "id_a")
      .join(ns.select(col("id").as("id_b"), col("ns").as("nsb")), "id_b")
      .join(inter, Seq("id_a", "id_b"), "left")
      .withColumn("ni", coalesce(col("ni"), lit(0L)))
      .withColumn("exact_e6", expr("ni * 1000000L div (nsa + nsb - ni)"))
      .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), "id_b")
    val melted = base.select(col("exact_e6"),
        explode(array(sizes.map { k =>
          val agree = (1 to k).map(i =>
            when(element_at(col("sig_a"), i) === element_at(col("sig_b"), i), 1L)
              .otherwise(0L)).reduce(_ + _)
          struct(lit(k).cast("int").as("sig_size"), agree.as("agree"))
        }: _*)).as("p"))
      .select(col("p.sig_size").as("sig_size"),
        expr("p.agree * 1000000L div p.sig_size").as("est_e6"),
        col("exact_e6"))
    melted.groupBy(col("sig_size"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(abs(col("est_e6") - col("exact_e6"))).as("__sae"),
        sum(col("est_e6") - col("exact_e6")).as("sum_err_e6"),
        max(abs(col("est_e6") - col("exact_e6"))).as("max_abs_e6"))
      .select(col("sig_size"), col("n_pairs"),
        expr("__sae div n_pairs").as("mae_e6"),
        col("sum_err_e6"), col("max_abs_e6"))
  }

  /** Majority-label vote over near-dup clusters — the label-denoising /
    * weak-supervision primitive: near-duplicate documents should agree
    * on labels (language, source, quality verdicts), so each doc is
    * reported against its cluster's majority label and the
    * disagreements are the suspect labels (the cluster-confidence line
    * of Northcutt et al.'s label-noise work, applied through the dedup
    * graph instead of a model). Singletons vote for themselves.
    *
    * Pipeline: the [[minHashLshPortable]] pair list → connected
    * components → per-(component, label) counts → majority (ties break
    * label-ascending via the (−n, label) sorted-struct ladder). Output:
    * (idCol, labelCol, component, cluster_label, n_cluster,
    * n_label_votes, label_agrees).
    *
    * Scale shape: everything rides the q69 LSH/components machinery
    * (candidates ∝ dup density, iterative min-label with checkpointed
    * lineage); the vote adds two component-keyed rollups of doc-sized
    * relations and one broadcast-sized winner join per component. */
  def clusterLabelVote(docs: DataFrame, idCol: String, labelCol: String,
                       textCol: String,
                       numPerms: Int = 32, numBands: Int = 8,
                       shingleN: Int = 3, threshold: Double = 0.3,
                       maxBucket: Int = 1000): DataFrame = {
    val pairs = minHashLshPortable(docs, idCol, textCol,
        numPerms, numBands, shingleN, threshold, maxBucket)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val comp = ConnectedComponents.auto(pairs, docs.select(col(idCol).as("id")))
    val labeled = docs
      .select(col(idCol).as("id"), col(labelCol).cast("string").as("__lbl"))
      .join(comp, Seq("id"))
      .localCheckpoint(true) // votes + final join both read it
    val winner = labeled
      .groupBy(col("component"), col("__lbl")).agg(count(lit(1)).as("n"))
      .groupBy(col("component"))
      .agg(sort_array(collect_list(
          struct((-col("n")).as("nn"), col("__lbl").as("l")))).getItem(0).as("w"),
        sum(col("n")).as("n_cluster"))
      .select(col("component"), col("w.l").as("cluster_label"),
        (-col("w.nn")).as("n_label_votes"), col("n_cluster"))
    labeled.join(winner, Seq("component"))
      .select(col("id").as(idCol), col("__lbl").as(labelCol),
        col("component"), col("cluster_label"), col("n_cluster"),
        col("n_label_votes"),
        (col("__lbl") === col("cluster_label")).as("label_agrees"))
  }

  /** n-gram Jaccard similarity between two token-array columns (distinct
    * semantics, integer set sizes + one IEEE division — oracle-exact). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Embedding-cosine near-duplicate pairs: bucket rows by hyperplane-LSH
    * signature (row-local), self-join inside buckets with id_a < id_b,
    * verify with exact cosine ≥ `threshold`.
    *
    * Scale twin of [[minHashLsh]] for the embedding modality: candidate
    * count ∝ near-dup density (bucket join on a 2^numPlanes-way uniform
    * signature), never N². Catches semantic dups that text shingles miss
    * (paraphrases with identical embeddings). */
  /** Persisted hyperplane-signature state for the embedding modality:
    * (id, sig, vec) — a per-vector property (union-mergeable), the
    * embedding rung's analogue of [[lshBandWarehouse]]. Vectors ride
    * the state because the verify step needs them; at scale this is
    * the sig-bucketed table the incremental probe co-locates against. */
  def embeddingSigWarehouse(df: DataFrame, idCol: String, vecCol: String,
                            numPlanes: Int = 12, seed: Long = 42L,
                            dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim
      else df.select(org.apache.spark.sql.functions.size(col(vecCol)))
        .first().getInt(0)
    val planes = SimilaritySearch.hyperplanes(numPlanes, d, seed)
    df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("sig", SimilaritySearch.lshSignature(col("vec"), planes))
  }

  /** Incremental embedding-cosine near-dup against a persisted
    * signature warehouse — the EMBEDDING rung of the incremental dedup
    * ladder (exact/segments q171, MinHash q185, SimHash q186,
    * components q176, images q190; this closes the semantic modality).
    * Returns every verified pair INVOLVING a batch vector —
    * batch↔warehouse and batch↔batch — exactly the batch-involving
    * subset of [[embeddingNearDup]]'s full-rebuild pair list (the q181
    * full-rebuild-equality contract).
    *
    * Work ∝ batch: only the batch is signed (one row-local kernel
    * pass); the warehouse contributes pre-computed (id, sig, vec)
    * rows semi-joined to the signatures the batch actually touches
    * (sig-bucketed storage makes that probe co-located). The bucket
    * bound counts batch + touched-warehouse rows — identical to the
    * full rebuild's count on every bucket that can produce a
    * batch-involving pair. One signature per vector means a pair
    * shares at most one bucket, so no distinct is needed: the
    * batch-side join emits each crossing pair exactly once
    * (batch↔batch constrained to a.id < b.id). */
  def embeddingNearDupIncremental(warehouseSigs: DataFrame, batch: DataFrame,
                                  idCol: String, vecCol: String,
                                  threshold: Double = 0.95, numPlanes: Int = 12,
                                  seed: Long = 42L, maxBucket: Int = 10000,
                                  dim: Int = -1): DataFrame = {
    val batchSigs =
      embeddingSigWarehouse(batch, idCol, vecCol, numPlanes, seed, dim)
        .withColumn("__batch", lit(true))
    val touched = batchSigs.select(col("sig")).distinct()
    val whTouched = warehouseSigs.join(touched, Seq("sig"), "left_semi")
      .select(col("id"), col("vec"), col("sig"))
      .withColumn("__batch", lit(false))
    val bounded = batchSigs.select("id", "vec", "sig", "__batch")
      .unionByName(whTouched)
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("sig"))))
      .filter(col("__n") <= maxBucket)
      .drop("__n")
    bounded.filter(col("__batch")).as("a")
      .join(bounded.as("b"),
        col("a.sig") === col("b.sig") &&
          (col("b.__batch") && col("a.id") < col("b.id") ||
            !col("b.__batch") && col("a.id") =!= col("b.id")))
      .select(
        least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        call_function("graft_cosine", col("a.vec"), col("b.vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .withColumn("cosine_e6", floor(col("cosine") * 1e6).cast("long"))
      .drop("cosine")
  }

  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double = 0.95, numPlanes: Int = 12,
                       seed: Long = 42L, maxBucket: Int = 10000,
                       dim: Int = -1): DataFrame = {
    // pass `dim` explicitly when known — the fallback sniff is one driver
    // round-trip per call (fine once, wasteful composed per-query)
    val d = if (dim > 0) dim
      else df.select(org.apache.spark.sql.functions.size(col(vecCol)))
        .first().getInt(0)
    val planes = SimilaritySearch.hyperplanes(numPlanes, d, seed)
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("sig", SimilaritySearch.lshSignature(col("vec"), planes))
    val bounded = sigs
      .withColumn("bucket_n", count(lit(1)).over(Window.partitionBy(col("sig"))))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    bounded.as("a")
      .join(bounded.as("b"),
        col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        call_function("graft_cosine", col("a.vec"), col("b.vec")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .withColumn("cosine_e6", floor(col("cosine") * 1e6).cast("long"))
      .drop("cosine")
  }
}
