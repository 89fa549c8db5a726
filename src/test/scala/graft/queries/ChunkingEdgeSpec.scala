package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge geometry of q76 document chunking (size 40, stride 30): boundary
  * documents that the corpus oracle run may not cover — single-token,
  * exactly-one-stride, one-past-stride, and a three-chunk doc with a
  * short tail. */
class ChunkingEdgeSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("chunk boundaries: 1, 30, 31, and 70-token documents") {
    val dir = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    def words(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")
    Seq(
      (1L, words(1), "s", "en", 1L),
      (2L, words(30), "s", "en", 1L),
      (3L, words(31), "s", "en", 1L),
      (4L, words(70), "s", "en", 1L))
      .toDF("doc_id", "text", "source", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = graft.SparkEntry.queries("q76_document_chunking")(spark, dir)
      .select(col("doc_id"), col("chunk_idx"), col("start_token"),
        col("chunk_tokens"), col("chunk_md5"))
      .as[(Long, Int, Int, Int, String)].collect()
      .sortBy(r => (r._1, r._2))

    def chunksOf(id: Long) = out.filter(_._1 == id)
    assert(chunksOf(1L).toSeq == Seq((1L, 0, 0, 1, md5hex("w1"))))
    // 30 tokens: one chunk (start 30 would be past the last token)
    assert(chunksOf(2L).map(c => (c._2, c._3, c._4)).toSeq == Seq((0, 0, 30)))
    // 31 tokens: second chunk holds just the token past the stride
    assert(chunksOf(3L).map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0, 0, 31), (1, 30, 1)))
    assert(chunksOf(3L)(1)._5 == md5hex("w31"))
    // 70 tokens: full, full, 10-token tail; overlap regions shared
    assert(chunksOf(4L).map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0, 0, 40), (1, 30, 40), (2, 60, 10)))
    assert(chunksOf(4L)(1)._5 ==
      md5hex((31 to 70).map(i => s"w$i").mkString(" ")))
  }
}
