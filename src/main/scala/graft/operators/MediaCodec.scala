package graft.operators

import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

/** Real container-format header codec for the multimodal operators: builds
  * and parses genuine PNG chunk streams, WAV RIFF chunk lists, and MP4 box
  * trees. The PARSER is production-shaped — magic sniffing, chunk/box
  * walking, length validation, PNG CRC-32 verification — and would read
  * dims/channels/rates off real files of these formats; only deep payload
  * decode (pixels/samples) is out of scope in this container, which is why
  * the synthetic payload region carries opaque bytes.
  *
  * Re-models the reference's media boundary (SURVEY §2.11): the reference
  * ships URLs to external vision APIs; at 100 TB the engine instead needs
  * header-level metadata extraction as a first-class batch operator.
  */
object MediaCodec {

  /** Header-decoded metadata; `ok=false` means the container failed magic,
    * structure, or CRC validation (fields are zeroed). `payloadOffset`/
    * `payloadLen` locate the media payload (PNG IDAT / WAV data / MP4
    * mdat) inside the container bytes. */
  final case class Decoded(
      format: String, // png | wav | mp4 | unknown
      ok: Boolean,
      width: Int, height: Int, channels: Int,
      sampleRate: Int, bitsPerSample: Int,
      payloadOffset: Int, payloadLen: Int)

  private val NotDecoded = Decoded("unknown", ok = false, 0, 0, 0, 0, 0, 0, 0)

  private val PngSig: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  // ---------- byte helpers ----------

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def ascii(s: String): Array[Byte] = s.getBytes(StandardCharsets.US_ASCII)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, StandardCharsets.US_ASCII)

  private def crc32(parts: Array[Byte]*): Int = {
    val c = new CRC32
    parts.foreach(p => c.update(p))
    c.getValue.toInt
  }

  // ---------- builders (synthetic but structurally genuine) ----------

  private def pngChunk(chunkType: String, data: Array[Byte]): Array[Byte] = {
    val t = ascii(chunkType)
    be32(data.length) ++ t ++ data ++ be32(crc32(t, data))
  }

  /** PNG: signature + IHDR (w, h, bit depth 8, given color type) + one IDAT
    * carrying the payload + IEND, all with valid CRC-32s. */
  def buildPng(width: Int, height: Int, colorType: Int, payload: Array[Byte]): Array[Byte] = {
    val ihdr = be32(width) ++ be32(height) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    PngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", payload) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** WAV: RIFF/WAVE with a 16-byte PCM fmt chunk and a data chunk. */
  def buildWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
               payload: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val fmt = le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate * blockAlign) ++ le16(blockAlign) ++ le16(bitsPerSample)
    ascii("RIFF") ++ le32(36 + payload.length) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16) ++ fmt ++
      ascii("data") ++ le32(payload.length) ++ payload
  }

  /** MP4: ftyp + moov[trak[tkhd(width, height as 16.16 fixed)]] +
    * mdat(payload) — a genuine ISO-BMFF box tree. */
  def buildMp4(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val ftyp = be32(16) ++ ascii("ftyp") ++ ascii("isom") ++ be32(0)
    val tkhdBody = new Array[Byte](76) // ver/flags + times + ids + matrix, zeroed
    val tkhd = be32(92) ++ ascii("tkhd") ++ tkhdBody ++
      be32(width << 16) ++ be32(height << 16)
    val trak = be32(8 + tkhd.length) ++ ascii("trak") ++ tkhd
    val moov = be32(8 + trak.length) ++ ascii("moov") ++ trak
    val mdat = be32(8 + payload.length) ++ ascii("mdat") ++ payload
    ftyp ++ moov ++ mdat
  }

  // ---------- the real parsers ----------

  /** Sniff the magic and parse the matching container; any structural
    * violation (truncated chunk, bad CRC, missing required chunk/box)
    * yields ok=false rather than an exception. */
  def decode(bytes: Array[Byte]): Decoded =
    try {
      if (bytes.length >= 8 && bytes.take(8).sameElements(PngSig)) decodePng(bytes)
      else if (bytes.length >= 12 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE")
        decodeWav(bytes)
      else if (bytes.length >= 8 && tag(bytes, 4) == "ftyp") decodeMp4(bytes)
      else NotDecoded
    } catch { case _: IndexOutOfBoundsException => NotDecoded }

  private def decodePng(b: Array[Byte]): Decoded = {
    var off = 8
    var width, height, channels, bitDepth, idatOff, idatLen = 0
    var sawIhdr, sawIend = false
    while (off + 8 <= b.length && !sawIend) {
      val len = readBe32(b, off)
      val ct = tag(b, off + 4)
      if (len < 0 || off + 12 + len > b.length) return NotDecoded
      // CRC check — covers chunk type + data, like a real decoder
      val expected = readBe32(b, off + 8 + len)
      val actual = crc32(java.util.Arrays.copyOfRange(b, off + 4, off + 8 + len))
      if (expected != actual) return NotDecoded
      ct match {
        case "IHDR" if len == 13 =>
          sawIhdr = true
          width = readBe32(b, off + 8)
          height = readBe32(b, off + 12)
          bitDepth = b(off + 16) & 0xff
          channels = (b(off + 17) & 0xff) match { // color type → samples/pixel
            case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
            case _ => return NotDecoded
          }
        case "IDAT" =>
          if (idatLen == 0) idatOff = off + 8
          idatLen += len
        case "IEND" => sawIend = true
        case _ => ()
      }
      off += 12 + len
    }
    if (sawIhdr && sawIend)
      Decoded("png", ok = true, width, height, channels, 0, bitDepth, idatOff, idatLen)
    else NotDecoded
  }

  private def decodeWav(b: Array[Byte]): Decoded = {
    val riffLen = readLe32(b, 4)
    if (riffLen + 8 > b.length) return NotDecoded
    var off = 12
    var channels, rate, bits, dataOff, dataLen = 0
    var sawFmt, sawData = false
    while (off + 8 <= b.length) {
      val ct = tag(b, off)
      val len = readLe32(b, off + 4)
      if (len < 0 || off + 8 + len > b.length) return NotDecoded
      ct match {
        case "fmt " if len >= 16 =>
          sawFmt = true
          channels = readLe16(b, off + 10)
          rate = readLe32(b, off + 12)
          bits = readLe16(b, off + 22)
        case "data" =>
          sawData = true; dataOff = off + 8; dataLen = len
        case _ => ()
      }
      off += 8 + len + (len & 1) // RIFF chunks are 2-byte aligned
    }
    if (sawFmt && sawData)
      Decoded("wav", ok = true, 0, 0, channels, rate, bits, dataOff, dataLen)
    else NotDecoded
  }

  private def decodeMp4(b: Array[Byte]): Decoded = {
    var width, height, mdatOff, mdatLen = 0
    var sawTkhd, sawMdat = false

    def walk(start: Int, end: Int): Boolean = { // false → structural error
      var off = start
      while (off + 8 <= end) {
        val size = readBe32(b, off)
        if (size < 8 || off + size > end) return false
        tag(b, off + 4) match {
          case "moov" | "trak" =>
            if (!walk(off + 8, off + size)) return false
          case "tkhd" if size >= 92 =>
            sawTkhd = true
            width = readBe32(b, off + size - 8) >>> 16 // 16.16 fixed point
            height = readBe32(b, off + size - 4) >>> 16
          case "mdat" =>
            sawMdat = true; mdatOff = off + 8; mdatLen = size - 8
          case _ => ()
        }
        off += size
      }
      off == end
    }

    if (walk(0, b.length) && sawTkhd && sawMdat)
      Decoded("mp4", ok = true, width, height, 0, 0, 0, mdatOff, mdatLen)
    else NotDecoded
  }
}
