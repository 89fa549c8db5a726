package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Perceptual near-duplicate detection over multimodal assets — the
  * pixel-domain twin of the text-shingle SimHash (reference tagger's
  * image-dup concern re-modeled for the engine; cf. SimHash over tokens
  * in [[Dedup.simHashTable]]).
  *
  * A real pHash DCTs a decoded, resampled luma grid; the pixel decode is
  * the external-codec boundary this engine stubs (SURVEY §2.11), so the
  * fingerprint here is SimHash over sliding byte 4-grams of the payload
  * MediaCodec locates inside the container: bit k of the 64-bit
  * fingerprint is the sign of ±1 votes from bit k of each gram's hash.
  * That keeps the two properties that make a perceptual hash useful at
  * scale, alignment-independence (an n-gram multiset has no block grid —
  * robust to insertions that shift every downstream byte, where
  * fixed-block hashing degrades to noise; measured on the sf0.01 planted
  * near-dup images: block-mean aHash separates them from the random
  * floor by NOTHING — min random Hamming 12 vs planted 13+ — while this
  * gram-SimHash puts planted pairs at 0/2/4 against a random floor of 6)
  * and a banded bucket join with a pigeonhole guarantee instead of an
  * N² scan.
  *
  * Fingerprinting is one row-local pass (no shuffle); the pair join
  * shuffles (band, value) keys exactly like [[Dedup]]'s LSH tables.
  */
object PerceptualHash {

  /** 64-bit byte-gram SimHash per decoded asset payload → (id, phash).
    *
    * `portable = true` hashes each gram with md5 (first 8 digest bytes,
    * big-endian) — bit-reproducible by any engine with md5/substr, which
    * is what the DuckDB oracle checks end to end. `portable = false`
    * swaps in lz4-java's XXH64 (bundled with Spark) for ~10× cheaper
    * gram hashing — same fingerprint geometry, different hash family, so
    * fingerprints are NOT comparable across the two modes. Assets whose
    * container fails validation or whose payload is shorter than
    * `gramLen` produce no fingerprint (same contract as q65's frame
    * sampler: undecodable assets are dropped, not zero-filled). */
  def fingerprints(assets: Dataset[Multimodal.Asset], gramLen: Int = 4,
                   portable: Boolean = true, seed: Long = 42L): DataFrame = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // one digest / hasher per partition, like a codec would be
      val md = if (portable) java.security.MessageDigest.getInstance("MD5") else null
      val xx = if (portable) null else net.jpountz.xxhash.XXHashFactory.fastestInstance().hash64()
      it.flatMap { a =>
        val d = MediaCodec.decode(a.bytes)
        if (!d.ok || d.payloadLen < gramLen) Iterator.empty
        else {
          val votes = new Array[Int](64)
          var i = d.payloadOffset
          val last = d.payloadOffset + d.payloadLen - gramLen
          while (i <= last) {
            val h =
              if (portable) {
                md.reset()
                md.update(a.bytes, i, gramLen)
                val dg = md.digest()
                // first 16 hex chars of the md5, as one big-endian long
                ((dg(0) & 0xffL) << 56) | ((dg(1) & 0xffL) << 48) |
                  ((dg(2) & 0xffL) << 40) | ((dg(3) & 0xffL) << 32) |
                  ((dg(4) & 0xffL) << 24) | ((dg(5) & 0xffL) << 16) |
                  ((dg(6) & 0xffL) << 8) | (dg(7) & 0xffL)
              } else xx.hash(a.bytes, i, gramLen, seed)
            var k = 0
            while (k < 64) {
              votes(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1)
              k += 1
            }
            i += 1
          }
          var ph = 0L
          var k = 0
          while (k < 64) {
            if (votes(k) > 0) ph |= (1L << k)
            k += 1
          }
          Iterator.single((a.asset_id, ph))
        }
      }
    }.toDF("asset_id", "phash")
  }

  /** Near-dup pairs by banded fingerprint join: split the 64-bit hash
    * into `64 / bandBits` bands, join on (band, value), verify exact
    * Hamming distance ≤ `maxHamming`.
    *
    * The pigeonhole guarantee that makes the banded join EXHAUSTIVE (no
    * recall loss vs the N² scan, so an all-pairs oracle matches
    * bit-for-bit): flipping ≤ numBands-1 bits cannot touch every band,
    * so any pair within `maxHamming ≤ numBands - 1` shares at least one
    * intact band — enforced by require, not documentation. Band width is
    * the scale dial: 8-bit bands give 256 buckets per band, enough for
    * corpora where dup density dominates (the LSH regime); a 10^10-image
    * corpus wants 16-bit bands (4 bands, maxHamming ≤ 3) or the
    * Manku-rotation table family. `maxBucket` bounds degenerate buckets
    * (e.g. the all-zero fingerprint of blank assets) exactly like
    * [[Dedup.embeddingNearDup]]. */
  def nearDupPairs(fps: DataFrame, idCol: String, hashCol: String,
                   maxHamming: Int = 5, bandBits: Int = 8,
                   maxBucket: Int = 100000): DataFrame = {
    require(bandBits > 0 && bandBits < 64 && 64 % bandBits == 0,
      s"bandBits must divide 64, got $bandBits")
    val numBands = 64 / bandBits
    require(maxHamming < numBands,
      s"banded join is exhaustive only for maxHamming <= ${numBands - 1} " +
        s"(pigeonhole over $numBands bands); got $maxHamming")
    val mask = (1L << bandBits) - 1
    val bands = array((0 until numBands).map(j =>
      shiftrightunsigned(col(hashCol), j * bandBits).bitwiseAND(lit(mask))): _*)
    val banded = fps
      .select(col(idCol).as("id"), col(hashCol).as("ph"),
        posexplode(bands).as(Seq("band", "bval")))
    val bounded = banded
      .withColumn("bucket_n",
        count(lit(1)).over(Window.partitionBy(col("band"), col("bval"))))
      .filter(col("bucket_n") <= maxBucket)
      .drop("bucket_n")
    bounded.as("a")
      .join(bounded.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.ph").as("pa"), col("b.ph").as("pb"))
      .distinct() // a close pair matches on several bands — emit once
      .select(col("id_a"), col("id_b"),
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Incremental form against a persisted fingerprint warehouse — the
    * IMAGE/asset rung of the incremental dedup ladder (text has
    * [[Dedup.minHashLshIncremental]]/[[Dedup.simHashNearDupIncremental]];
    * this is the same touched-bucket probe over [[fingerprints]]'
    * (asset_id, phash) relation, which merges by plain union). Only the
    * BATCH's assets are decoded/fingerprinted; its bands probe
    * warehouse band rows restricted to touched buckets; the same
    * pigeonhole bound applies (`maxHamming < 64/bandBits`). Returns
    * (id_a, id_b, hamming) for every qualifying pair involving a batch
    * asset — gated by full-rebuild equality (q190). */
  def nearDupPairsIncremental(warehouseFps: DataFrame,
                              batchAssets: Dataset[Multimodal.Asset],
                              maxHamming: Int = 5, bandBits: Int = 8,
                              maxBucket: Int = 100000,
                              gramLen: Int = 4,
                              portable: Boolean = true): DataFrame = {
    require(bandBits > 0 && bandBits < 64 && 64 % bandBits == 0,
      s"bandBits must divide 64, got $bandBits")
    val numBands = 64 / bandBits
    require(maxHamming < numBands,
      s"banded probe is exhaustive only for maxHamming <= ${numBands - 1} " +
        s"(pigeonhole over $numBands bands); got $maxHamming")
    val mask = (1L << bandBits) - 1
    def bandRows(fps: DataFrame): DataFrame = fps
      .select(col("asset_id").as("id"), col("phash").as("ph"),
        posexplode(array((0 until numBands).map(j =>
          shiftrightunsigned(col("phash"), j * bandBits).bitwiseAND(lit(mask))): _*))
          .as(Seq("band", "bval")))
    val batchBands =
      bandRows(fingerprints(batchAssets, gramLen, portable))
        .withColumn("__batch", lit(true))
    val touched = batchBands.select(col("band"), col("bval")).distinct()
    val whTouched = bandRows(warehouseFps)
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
        bit_count(col("a.ph").bitwiseXOR(col("b.ph")))
          .cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
