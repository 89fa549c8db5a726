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

  test("assetsFromText: genuine containers + typed metadata") {
    val assets = Multimodal.assetsFromText(docs, "doc_id", "text").collect().sortBy(_.asset_id)
    assert(assets.map(_.kind).toSeq == Seq("image", "audio", "video", "image"))
    assert(assets(0).n_bytes == 23)
    // PNG magic on images, RIFF/WAVE on audio, ftyp box on video
    assert((assets(0).bytes(0) & 0xff) == 0x89 &&
      new String(assets(0).bytes, 1, 3, "US-ASCII") == "PNG")
    assert(new String(assets(1).bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(assets(1).bytes, 8, 4, "US-ASCII") == "WAVE")
    assert(new String(assets(2).bytes, 4, 4, "US-ASCII") == "ftyp")
  }

  test("decode recovers exactly what the builders wrote into the headers") {
    val feats = Multimodal.decodeFeatures(
      Multimodal.assetsFromText(docs, "doc_id", "text")).collect().sortBy(_.asset_id)
    assert(feats.forall(_.decode_ok))
    // image id=0: w=16+0%500, h=16+0%300, RGB
    assert(feats(0).width == 16 && feats(0).height == 16 && feats(0).channels == 3)
    // image id=3: w=16+3, h=16+3, RGBA (odd id)
    assert(feats(3).width == 19 && feats(3).height == 19 && feats(3).channels == 4)
    // audio id=1: 2 channels, 8000*(1+1%5)=16000 Hz, 16-bit
    assert(feats(1).channels == 2 && feats(1).sample_rate == 16000 &&
      feats(1).bits_per_sample == 16)
    // video id=2: w=320+2*160, h=240+2*120; payload chunk frames
    assert(feats(2).width == 640 && feats(2).height == 480)
    assert(feats(2).n_frames == 180 / 64)
    assert(feats(0).n_frames == 1) // non-video: single frame
    // the parser locates the payload: n_bytes = original text length
    assert(feats.map(_.n_bytes).toSeq == Seq(23L, 13L, 180L, 3L))
  }

  test("corrupted containers fail decode instead of returning garbage") {
    import org.apache.spark.sql.functions._
    val good = Multimodal.assetsFromText(docs, "doc_id", "text")
    // flip one byte inside the PNG IHDR data (invalidates its CRC)
    val corrupted = good.map { a =>
      if (a.asset_id == 0L) {
        val b = a.bytes.clone(); b(18) = (b(18) ^ 0x7f).toByte
        a.copy(bytes = b)
      } else a
    }
    val feats = Multimodal.decodeFeatures(corrupted).collect().sortBy(_.asset_id)
    assert(!feats(0).decode_ok && feats(0).width == 0)
    assert(feats.drop(1).forall(_.decode_ok))
    // garbage bytes → unknown format, not an exception
    val junk = good.map(a => a.copy(bytes = "not a container".getBytes("UTF-8")))
    assert(Multimodal.decodeFeatures(junk).collect().forall(f => !f.decode_ok))
  }

  test("sampleFrames: mdat-located frames hash-match direct payload chunks") {
    val frames = Multimodal.sampleFrames(
      Multimodal.assetsFromText(docs, "doc_id", "text"), frameBytes = 64, stride = 1)
      .collect().sortBy(_.frame_idx)
    assert(frames.forall(_.asset_id == 2L))
    assert(frames.length == 2) // 180/64 = 2 full frames
    val payload = ("video " * 30).getBytes("UTF-8")
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = (0 until 2).map { i =>
      md.reset()
      md.digest(java.util.Arrays.copyOfRange(payload, i * 64, (i + 1) * 64))
        .map("%02x".format(_)).mkString
    }
    assert(frames.map(_.frame_md5).toSeq == expected)
    assert(frames.map(_.offset).toSeq == Seq(0L, 64L))
  }

  test("featureStats rollup aggregates decode-derived values") {
    val stats = Multimodal.featureStats(Multimodal.decodeFeatures(
      Multimodal.assetsFromText(docs, "doc_id", "text")))
      .as[(String, Long, Long, Long, Long, Long, Int)].collect().sortBy(_._1)
    assert(stats.map(_._1).toSeq == Seq("audio", "image", "video"))
    val image = stats.find(_._1 == "image").get
    assert(image._2 == 2) // n_assets
    assert(image._5 == 16L * 16 + 19L * 19) // total_pixels from parsed dims
    assert(image._6 == 3 + 4) // total_channels
    val audio = stats.find(_._1 == "audio").get
    assert(audio._7 == 16000) // max_sample_rate
  }
}
