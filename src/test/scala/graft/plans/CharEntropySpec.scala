package graft.plans

import graft.SparkSpec
import graft.functions.IntLog2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the graft_char_entropy kernel to (a) its declarative twin —
  * position explode → per-char groupBy → graft_ilog2_e16 rollup, the
  * shuffle-paying form the kernel replaces — and (b) closed-form
  * entropy identities, on crafted + random + supplementary-character
  * corpora. Also pins graft_ilog2_e16 ≡ IntLog2.ilog2e16 directly.
  */
class CharEntropySpec extends SparkSpec {

  import spark.implicits._

  private def kernel(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] =
    docs.toDF("doc_id", "text")
      .withColumn("m", call_function("graft_char_entropy", col("text")))
      .select(col("doc_id"), col("m").getItem(0), col("m").getItem(1),
        col("m").getItem(2))
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, n, d, num) => id -> (n, d, num) }.toMap

  /** The declarative twin: one row per CHARACTER through a corpus
    * shuffle — the semantics spec for the kernel's one-pass form. */
  private def twin(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val df = docs.toDF("doc_id", "text")
    val chars = df
      // Spark's sequence(1, 0) is DESCENDING [1, 0], not empty — guard
      // the empty doc out (DuckDB's generate_series(1, 0) IS empty)
      .where(length(col("text")) > 0)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")))).as("i"),
        col("text"))
      .select(col("doc_id"), col("text").substr(col("i"), lit(1)).as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
    val agg = chars.groupBy(col("doc_id")).agg(
      sum(col("c")).as("n"),
      count(lit(1)).as("d"),
      sum(col("c") * call_function("graft_ilog2_e16", col("c"))).as("s"))
      .select(col("doc_id"), col("n"), col("d"),
        (col("n") * call_function("graft_ilog2_e16", col("n")) - col("s")).as("num"))
    val got = agg.as[(Long, Long, Long, Long)].collect()
      .map { case (id, n, d, num) => id -> (n, d, num) }.toMap
    // empty docs never reach the explode — fill the [0,0,0] rows
    docs.map(_._1).map(id => id -> got.getOrElse(id, (0L, 0L, 0L))).toMap
  }

  test("graft_ilog2_e16 column ≡ IntLog2.ilog2e16") {
    val xs = Seq(1L, 2L, 3L, 7L, 100L, 65535L, 65536L, (1L << 40) + 12345L)
    val got = xs.toDF("x")
      .select(call_function("graft_ilog2_e16", col("x")))
      .as[Long].collect().toSeq
    assert(got === xs.map(IntLog2.ilog2e16))
  }

  test("kernel ≡ declarative twin (crafted + random + unicode)") {
    val rnd = new scala.util.Random(7)
    val alpha = Vector("a", "b", "c", " ", "\n", "é", "ß", "😀", "中", "0")
    val docs = Seq(
      1L -> "", 2L -> "aaaa", 3L -> "abab", 4L -> "hello world",
      5L -> "😀😀é中", 6L -> "x") ++
      (10L to 50L).map { i =>
        i -> Seq.fill(rnd.nextInt(200))(alpha(rnd.nextInt(alpha.length))).mkString
      }
    assert(kernel(docs) === twin(docs))
  }

  test("closed forms: uniform string → 0; all-distinct → lg(n)") {
    val m = kernel(Seq(1L -> "zzzzzz", 2L -> "abcdefgh"))
    assert(m(1L) === ((6L, 1L, 6L * IntLog2.ilog2e16(6) - 6L * IntLog2.ilog2e16(6))))
    assert(m(1L)._3 === 0L)
    // n distinct chars: num = n·lg(n) − n·1·lg(1) = n·lg(n)
    assert(m(2L) === ((8L, 8L, 8L * IntLog2.ilog2e16(8))))
  }

  test("entropy is permutation-invariant") {
    val m = kernel(Seq(1L -> "aabbbcc😀", 2L -> "😀cbacbab", 3L -> "b😀bacacb"))
    assert(m(1L) === m(2L))
    assert(m(2L) === m(3L))
  }
}
