package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Sampling.mixtureWeightsFromState]] — the q77 temperature weights
  * off persisted per-source count state (r12, VERDICT r11 #5). The
  * contracts: state rows merge by ADDITION (multiple rows per source
  * across ingest batches are legal), the merged artifact equals the
  * corpus-scan form, and the weight algebra is q77's exactly. */
class MixtureStateSpec extends SparkSpec {
  import spark.implicits._

  private def weights(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("unaggregated multi-batch state rows merge by addition") {
    // three batches' counts for two sources; sB only ever in one batch
    val state = Seq(
      ("sA", 9L), ("sA", 7L), ("sB", 4L), ("sA", 0L)
    ).toDF("source", "n_docs")
    val w = weights(Sampling.mixtureWeightsFromState(state))
    assert(w("sA") == ((16L, 1000000L)))
    // floor(sqrt(4)/sqrt(16)·1e6) = 500000 — exact halves, no rounding
    assert(w("sB") == ((4L, 500000L)))
  }

  test("state form ≡ corpus-scan form on a planted corpus, " +
      "chunked any way") {
    val docs = (1L to 60L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val scan = Sampling.mixtureWeightsFromState(
      docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs")))
    Seq(2, 3, 5).foreach { k =>
      val chunked = (0 until k).map(i =>
          docs.filter(col("doc_id") % k === i)
            .groupBy(col("source")).agg(count(lit(1)).as("n_docs")))
        .reduce(_.unionByName(_))
      assert(weights(Sampling.mixtureWeightsFromState(chunked)) ==
        weights(scan), s"chunking $k diverged")
    }
  }

  test("weight algebra is q77's: sqrt ratio vs the max source, floored e6") {
    val state = Seq(("big", 100L), ("small", 1L), ("mid", 25L))
      .toDF("source", "n_docs")
    val w = weights(Sampling.mixtureWeightsFromState(state))
    assert(w("big") == ((100L, 1000000L)))
    assert(w("mid") == ((25L, 500000L)))   // sqrt(25)/sqrt(100) = 0.5
    assert(w("small") == ((1L, 100000L)))  // 1/10
  }
}
