package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video as opaque `binary` columns with typed metadata, batched
  * decode/feature-extract/frame-sample operators.
  *
  * The decode step is a REAL header decode (MediaCodec): assets are genuine
  * PNG chunk streams / WAV RIFF chunks / MP4 box trees, and the kernel
  * walks the container structure (verifying PNG CRC-32s) to recover
  * dimensions, channel counts, sample rates, and the payload region. Only
  * deep payload decode (pixel/sample data — the part that genuinely needs
  * a codec library) stays out of scope; the payload bytes are opaque text
  * standins, which keeps every downstream byte/frame/hash observable by
  * the DuckDB oracle.
  */
object Multimodal {

  /** Typed asset row: binary container + metadata. `n_bytes` is the media
    * payload size (what the decoder must also find inside the container). */
  final case class Asset(
      asset_id: Long,
      kind: String, // image | audio | video
      mime: String,
      n_bytes: Long,
      bytes: Array[Byte])

  /** Header-decoded features. Zero-valued fields are format-inapplicable
    * (e.g. sample_rate for images); `decode_ok=false` marks a container
    * that failed structural/CRC validation. */
  final case class AssetFeatures(
      asset_id: Long,
      kind: String,
      decode_ok: Boolean,
      n_bytes: Long, // payload bytes as located by the parser
      width: Int, height: Int, channels: Int,
      sample_rate: Int, bits_per_sample: Int,
      n_frames: Int)

  /** Build an asset table from any (id, text) source: the text bytes become
    * the media payload inside a structurally genuine container, with
    * id-derived dimensions/channels/rates (so the oracle can re-derive what
    * the decoder must parse back out). */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String): Dataset[Asset] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (((id % 3) + 3) % 3) match {
          case 0 =>
            val w = 16 + (id % 500).toInt
            val h = 16 + (id % 300).toInt
            val colorType = if (id % 2 == 0) 2 else 6 // RGB | RGBA
            Asset(id, "image", "image/png", payload.length.toLong,
              MediaCodec.buildPng(w, h, colorType, payload))
          case 1 =>
            val ch = 1 + (id % 2).toInt
            val rate = 8000 * (1 + (id % 5).toInt)
            Asset(id, "audio", "audio/wav", payload.length.toLong,
              MediaCodec.buildWav(ch, rate, 16, payload))
          case _ =>
            val w = 320 + (id % 4).toInt * 160
            val h = 240 + (id % 4).toInt * 120
            Asset(id, "video", "video/mp4", payload.length.toLong,
              MediaCodec.buildMp4(w, h, payload))
        }
      }
  }

  /** The real header decode: container walk + CRC validation per asset.
    * Frame count for video is payload-chunk-based (a real deployment reads
    * the stts sample table instead — same shape, one box deeper). */
  private def decodeKernel(assets: Iterator[Asset]): Iterator[AssetFeatures] =
    assets.map { a =>
      val d = MediaCodec.decode(a.bytes)
      val frames = if (d.format == "mp4") math.max(1, d.payloadLen / 64) else 1
      AssetFeatures(a.asset_id, a.kind, d.ok, d.payloadLen.toLong,
        d.width, d.height, d.channels, d.sampleRate, d.bitsPerSample, frames)
    }

  /** Batched decode over partitions — the production shape: the kernel sees
    * an iterator per partition (amortizes codec/model init per partition,
    * not per row), output is a typed Dataset ready for columnar ops. */
  def decodeFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(decodeKernel)
  }

  /** One sampled frame: index, payload-relative byte offset, content hash. */
  final case class FrameSample(
      asset_id: Long, frame_idx: Int, offset: Long, frame_md5: String)

  /** Frame sampling over video assets: the parser locates the mdat payload
    * inside the MP4 box tree, frames are fixed-size chunks of that payload
    * (`frameBytes`; shorter assets yield one partial frame), and every
    * `stride`-th frame is emitted with its md5. Chunk indexing stands in
    * for a codec's keyframe index; the batched per-partition shape (digest
    * initialized once per partition, like a codec would be) and the output
    * schema are the production design. Offsets are payload-relative, so
    * the oracle reconstructs every hash with substr+md5 over the text. */
  def sampleFrames(assets: Dataset[Asset], frameBytes: Int = 64,
                   stride: Int = 4): Dataset[FrameSample] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { a =>
        val d = MediaCodec.decode(a.bytes)
        if (!d.ok || d.format != "mp4") Iterator.empty
        else {
          val nFrames = math.max(1, d.payloadLen / frameBytes)
          (0 until nFrames by stride).iterator.map { i =>
            val start = d.payloadOffset + i * frameBytes
            val end = math.min(start + frameBytes, d.payloadOffset + d.payloadLen)
            md.reset()
            val hex = md.digest(java.util.Arrays.copyOfRange(a.bytes, start, end))
              .map("%02x".format(_)).mkString
            FrameSample(a.asset_id, i, (i * frameBytes).toLong, hex)
          }
        }
      }
    }
  }

  /** Per-kind rollup over decoded features — every aggregate derives from
    * values the parser read back out of container headers. */
  def featureStats(features: Dataset[AssetFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("n_frames").cast("long")).as("total_frames"),
        sum((col("width") * col("height")).cast("long")).as("total_pixels"),
        sum(col("channels").cast("long")).as("total_channels"),
        max(col("sample_rate")).as("max_sample_rate"))
      .orderBy(col("kind"))
}
