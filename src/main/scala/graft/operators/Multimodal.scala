package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video as opaque `binary` columns with typed metadata, batched
  * decode/feature-extract/frame-sample operators.
  *
  * The container has no image/audio codecs, so the DECODE KERNELS ARE
  * DETERMINISTIC STUBS (clearly marked below) — what is real and tested is
  * the Spark-side design: schema convention, `mapPartitions` batch shape
  * (one kernel invocation per partition, the same shape a native/Python
  * batch decoder needs), partition sizing, and downstream aggregation.
  */
object Multimodal {

  /** Typed asset row: binary payload + metadata. */
  final case class Asset(
      asset_id: Long,
      kind: String, // image | audio | video
      mime: String,
      n_bytes: Long,
      bytes: Array[Byte])

  final case class AssetFeatures(
      asset_id: Long,
      kind: String,
      n_bytes: Long,
      // 16-dim byte-histogram feature vector (STUB for a real embedding)
      features: Array[Float],
      n_frames: Int)

  /** Build an asset table from any (id, text) source — the text bytes stand
    * in for an undecodable media payload. */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String): Dataset[Asset] = {
    import df.sparkSession.implicits._
    df.select(
      col(idCol).cast("long").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      element_at(array(lit("image/jpeg"), lit("audio/wav"), lit("video/mp4")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("mime"),
      length(col(textCol)).cast("long").as("n_bytes"),
      encode(col(textCol), "UTF-8").as("bytes")).as[Asset]
  }

  /** ======== STUB ========
    * Deterministic fake "decode + feature extract": a 16-bin byte histogram
    * normalized to [0,1]. A real deployment swaps ONLY this kernel for a
    * codec call (JNI/native or `mapInPandas` + PIL/torchaudio on PySpark);
    * the batching, schema, and partitioning stay as-is. */
  private def decodeKernel(assets: Iterator[Asset]): Iterator[AssetFeatures] =
    assets.map { a =>
      val hist = new Array[Float](16)
      var i = 0
      while (i < a.bytes.length) { hist((a.bytes(i) & 0xff) >> 4) += 1f; i += 1 }
      val total = math.max(1f, a.bytes.length.toFloat)
      var b = 0
      while (b < 16) { hist(b) /= total; b += 1 }
      // "frame sample": one frame per 64-byte chunk for video, else 1
      val frames = if (a.kind == "video") math.max(1, a.bytes.length / 64) else 1
      AssetFeatures(a.asset_id, a.kind, a.n_bytes, hist, frames)
    }

  /** Batched decode over partitions — the production shape: the kernel sees
    * an iterator per partition (amortizes codec/model init per partition,
    * not per row), output is a typed Dataset ready for columnar ops. */
  def decodeFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(decodeKernel)
  }

  /** One sampled frame: index, byte offset, content hash. */
  final case class FrameSample(
      asset_id: Long, frame_idx: Int, offset: Long, frame_md5: String)

  /** Frame sampling over video assets: frames are fixed-size byte chunks
    * (`frameBytes`; assets shorter than one chunk yield a single partial
    * frame), of which every `stride`-th is emitted with its md5. The
    * chunking here is the STUB for a codec's keyframe index — a real
    * deployment swaps the slicing for container parsing; the batched
    * per-partition shape (digest instance initialized once per partition,
    * like a codec would be) and the output schema stay.
    *
    * Emitted hashes are plain md5 of the frame bytes, so the oracle
    * reconstructs them with substr+md5 (asset payloads are ASCII text
    * standins). */
  def sampleFrames(assets: Dataset[Asset], frameBytes: Int = 64,
                   stride: Int = 4): Dataset[FrameSample] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.filter(_.kind == "video").flatMap { a =>
        val nFrames = math.max(1, a.bytes.length / frameBytes)
        (0 until nFrames by stride).iterator.map { i =>
          val start = i * frameBytes
          val end = math.min(start + frameBytes, a.bytes.length)
          md.reset()
          val hex = md.digest(java.util.Arrays.copyOfRange(a.bytes, start, end))
            .map("%02x".format(_)).mkString
          FrameSample(a.asset_id, i, start.toLong, hex)
        }
      }
    }
  }

  /** Per-kind rollup over extracted features (exact integer/decimal
    * arithmetic for deterministic output). */
  def featureStats(features: Dataset[AssetFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("n_frames").cast("long")).as("total_frames"))
      .orderBy(col("kind"))
}
