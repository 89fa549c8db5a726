package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "image payload data here"),
    (1L, "audio payload"),
    (2L, "video " * 30), // 180 chars → 2 sampled frames
    (3L, "img"))
    .toDF("doc_id", "text")

  test("assetsFromText: binary column + typed metadata") {
    val assets = Multimodal.assetsFromText(docs, "doc_id", "text").collect().sortBy(_.asset_id)
    assert(assets.map(_.kind).toSeq == Seq("image", "audio", "video", "image"))
    assert(assets(0).n_bytes == 23)
    assert(new String(assets(1).bytes, "UTF-8") == "audio payload")
  }

  test("decodeFeatures: batched kernel, normalized histogram, frame sampling") {
    val feats = Multimodal.decodeFeatures(
      Multimodal.assetsFromText(docs, "doc_id", "text")).collect().sortBy(_.asset_id)
    assert(feats.forall(_.features.length == 16))
    // histogram is a probability distribution
    assert(feats.forall(f => math.abs(f.features.sum - 1.0f) < 1e-4))
    assert(feats(2).n_frames == 180 / 64) // video: one frame per 64 bytes
    assert(feats(0).n_frames == 1) // non-video: single frame
    // determinism across runs
    val again = Multimodal.decodeFeatures(
      Multimodal.assetsFromText(docs, "doc_id", "text")).collect().sortBy(_.asset_id)
    assert(feats.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("featureStats rollup") {
    val stats = Multimodal.featureStats(Multimodal.decodeFeatures(
      Multimodal.assetsFromText(docs, "doc_id", "text")))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(stats.map(_._1).toSeq == Seq("audio", "image", "video"))
    assert(stats.find(_._1 == "image").get._2 == 2)
  }
}
