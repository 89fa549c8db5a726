package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** High-diameter chain graph through the q69/q80 QUERY path (not just the
  * ConnectedComponents operator): a corpus of sliding-window paraphrases
  * where doc i and doc i+k share text only for k ≤ 4 (exact-Jaccard
  * verification at the q69 threshold of 0.3 rejects k ≥ 5), so the LSH
  * near-dup graph is a path-like chain with diameter ≈ n/4 ≈ 25 — well past
  * `ConnectedComponents.auto`'s 15-round min-label budget. Plain minLabel
  * would warn and return SPLIT clusters here; the query must still produce
  * one component (VERDICT r3 item 2 regression guard).
  *
  * The fixture is deterministic (md5-portable MinHash path), so this spec
  * is stable run to run.
  */
class ChainGraphQuerySpec extends SparkSpec {
  import spark.implicits._

  // 3-shingle Jaccard of (doc i, doc i+k) = (45-3k)/(45+3k): k=1 → 0.875,
  // k=8 → 0.304 (last above the 0.3 verify threshold), k=9 → 0.25. Max
  // edge skip 8 → diameter ≥ ceil(199/8) = 25 > auto's 15-round budget.
  // High adjacent similarity keeps every skip-1 band collision near-certain
  // (banding misses are correlated across a sliding window, so marginal
  // similarities flake — measured at stride 5 / j=0.80).
  private val nChain = 200
  private val winWords = 47
  private val stride = 3

  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-chaingraph").toString
    // doc i = words [i*stride, i*stride + winWords); globally unique words
    // so word-overlap algebra is exact: 3-shingle Jaccard of (i, i+k) is
    // (W - ks - 2) / (W + ks - 2) — see the class-level constants note.
    val words = (0 until (nChain * stride + winWords))
      .map(i => f"w$i%05d")
    val chain = (0 until nChain).map { i =>
      (i.toLong,
        words.slice(i * stride, i * stride + winWords).mkString(" "),
        "en", if (i % 2 == 0) "web" else "books")
    }
    // plus isolated docs that match nothing — must stay singletons
    val isolated = (0 until 3).map { i =>
      ((1000 + i).toLong,
        (0 until winWords).map(j => f"iso${i}%02d_$j%03d").mkString(" "),
        "en", "wiki")
    }
    (chain ++ isolated)
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q69 clusters a diameter-25 paraphrase chain into ONE component") {
    val out = graft.SparkEntry.queries("q69_near_dup_components")(
      spark, fixtureDir)
    val rows = out.select("doc_id", "component", "cluster_size")
      .as[(Long, Long, Long)].collect().toSeq
    val chainRows = rows.filter(_._1 < 1000)
    assert(chainRows.size === nChain)
    // min-id labeling: every chain doc carries component 0, size nChain.
    // A diameter-budget split (the minLabel failure mode) would surface
    // here as multiple component labels along the chain.
    assert(chainRows.map(_._2).toSet === Set(0L),
      s"chain split into components ${chainRows.map(_._2).toSet}")
    assert(chainRows.map(_._3).toSet === Set(nChain.toLong))
    val isoRows = rows.filter(_._1 >= 1000)
    assert(isoRows.map(r => r._2 -> r._3).toSet ===
      Set(1000L -> 1L, 1001L -> 1L, 1002L -> 1L))
  }

  test("q80 keeps exactly one survivor from the chain component") {
    val out = graft.SparkEntry.queries("q80_near_dup_survivors")(
      spark, fixtureDir)
    val bySource = out.select("source", "n_docs", "n_kept")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // chain survivor is doc 0 (source "web"); all 3 isolated wiki docs kept
    assert(bySource("web") === (nChain / 2, 1L))
    assert(bySource("books") === (nChain / 2, 0L))
    assert(bySource("wiki") === (3L, 3L))
  }
}
