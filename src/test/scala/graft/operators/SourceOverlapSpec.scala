package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("matrix counts shared distinct keys per ordered source pair") {
    // s1: {a,b,c}; s2: {b,c,d}; s3: {x}; duplicates must not double-count
    val keyed = Seq(
      ("s1", "a"), ("s1", "b"), ("s1", "c"), ("s1", "b"),
      ("s2", "b"), ("s2", "c"), ("s2", "d"),
      ("s3", "x")).toDF("src", "k")
    val got = SourceOverlap.matrix(keyed, "src", "k")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("s1", "s2", 2L, 3L, 3L)))
    SourceOverlap.releaseCache()
  }

  test("pairs are ordered (source_a < source_b), zero-overlap pairs absent") {
    val keyed = Seq(("z", "k1"), ("a", "k1"), ("m", "k2")).toDF("src", "k")
    val got = SourceOverlap.matrix(keyed, "src", "k")
      .select(col("source_a"), col("source_b"))
      .as[(String, String)].collect().toSeq
    assert(got === Seq(("a", "z")))
    SourceOverlap.releaseCache()
  }

  test("cache registry: bounded at one call's relation, release empties it") {
    SourceOverlap.releaseCache()
    assert(SourceOverlap.retainedFrames.isEmpty)
    (0 until 3).foreach { i =>
      val keyed = Seq((s"s$i", "a"), ("t", "a")).toDF("src", "k")
      SourceOverlap.matrix(keyed, "src", "k").count()
      assert(SourceOverlap.retainedFrames.size <= 1,
        s"call $i retained ${SourceOverlap.retainedFrames.size} — leak")
    }
    SourceOverlap.releaseCache()
    assert(SourceOverlap.retainedFrames.isEmpty)
  }
}
