package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Planted near-dup-image recall + banding invariants for
  * [[PerceptualHash]]. Assets are genuine PNG containers (assetsFromText
  * keys ids ≡ 0 mod 3 to images), payloads differ by a few token edits —
  * the fingerprint must put the planted pair within the Hamming
  * threshold on BOTH hash families (portable md5 and fast XXH64) while
  * unrelated payloads stay at the ~32-bit random floor. */
class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  private val base = ("the quick brown fox jumps over the lazy dog " * 20).trim
  // a near-dup: two token substitutions and one insertion (length shifts,
  // so block-aligned hashing would see noise — gram voting must not)
  private val near = base
    .replaceFirst("quick", "rapid").replaceFirst("lazy", "idle") + " tail"
  private val other1 = ("colorless green ideas sleep furiously at night " * 18).trim
  private val other2 = ("pack my box with five dozen liquor jugs today " * 19).trim

  private def assets = Multimodal.assetsFromText(
    Seq((0L, base), (3L, near), (6L, other1), (9L, other2))
      .toDF("doc_id", "text"),
    "doc_id", "text")

  test("planted near-dup image pair found, unrelated pairs rejected (portable)") {
    val fps = PerceptualHash.fingerprints(assets, portable = true)
    val pairs = PerceptualHash
      .nearDupPairs(fps, "asset_id", "phash", maxHamming = 5)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((0L, 3L)),
      pairs.mkString(", "))
    assert(pairs.head.getLong(2) <= 5)
  }

  test("incremental probe ≡ full pair list filtered to batch-involving " +
      "pairs, across every split of the planted fixture (r10)") {
    val fps = PerceptualHash.fingerprints(assets, portable = true)
    val full = PerceptualHash
      .nearDupPairs(fps, "asset_id", "phash", maxHamming = 5)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(full === full.filter(p => Set((0L, 3L)).contains((p._1, p._2))))
    // every 1-vs-rest and 2-vs-2 split: incremental must equal the
    // filtered full list, including the splits where the planted pair
    // is warehouse-internal (empty answer)
    val ids = Seq(0L, 3L, 6L, 9L)
    for (batchIds <- ids.combinations(1) ++ ids.combinations(2)) {
      val bSet = batchIds.toSet
      val wh = assets.filter(a => !bSet.contains(a.asset_id))
      val batch = assets.filter(a => bSet.contains(a.asset_id))
      val incr = PerceptualHash.nearDupPairsIncremental(
          PerceptualHash.fingerprints(wh, portable = true), batch,
          maxHamming = 5)
        .select("id_a", "id_b", "hamming")
        .as[(Long, Long, Long)].collect().toSet
      assert(incr === full.filter(p => bSet(p._1) || bSet(p._2)),
        s"batch $bSet")
    }
  }

  test("fast XXH64 family finds the same planted pair") {
    val fps = PerceptualHash.fingerprints(assets, portable = false)
    val pairs = PerceptualHash
      .nearDupPairs(fps, "asset_id", "phash", maxHamming = 5)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((0L, 3L)),
      pairs.mkString(", "))
  }

  test("unrelated fingerprints sit near the 32-bit random floor") {
    val fps = PerceptualHash.fingerprints(assets, portable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((a, b) <- Seq((0L, 6L), (0L, 9L), (6L, 9L))) {
      val h = java.lang.Long.bitCount(fps(a) ^ fps(b))
      assert(h > 5, s"unrelated pair ($a,$b) at hamming $h")
    }
  }

  test("identical payloads hash identically (hamming 0)") {
    val dup = Multimodal.assetsFromText(
      Seq((0L, base), (3L, base)).toDF("doc_id", "text"), "doc_id", "text")
    val pairs = PerceptualHash
      .nearDupPairs(PerceptualHash.fingerprints(dup), "asset_id", "phash",
        maxHamming = 5)
      .collect()
    assert(pairs.length === 1 && pairs.head.getLong(2) === 0L)
  }

  test("undecodable or too-short payloads produce no fingerprint") {
    val broken = assets.map { a =>
      if (a.asset_id == 6L) a.copy(bytes = a.bytes.take(10)) else a
    }
    val ids = PerceptualHash.fingerprints(broken)
      .select("asset_id").as[Long].collect().toSet
    assert(ids === Set(0L, 3L, 9L))
  }

  test("banding requires the pigeonhole guarantee") {
    val fps = PerceptualHash.fingerprints(assets)
    intercept[IllegalArgumentException] {
      PerceptualHash.nearDupPairs(fps, "asset_id", "phash",
        maxHamming = 8, bandBits = 8) // 8 bands can only guarantee <= 7
    }
    intercept[IllegalArgumentException] {
      PerceptualHash.nearDupPairs(fps, "asset_id", "phash", bandBits = 5)
    }
  }
}
