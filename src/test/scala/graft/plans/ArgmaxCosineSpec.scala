package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** graft_argmax_cosine must be an exact drop-in for the O(k) when-fold it
  * replaced at the IvfIndex call site: bit-identical scores (same
  * accumulation order as graft_cosine), the same strict-> first-max tie
  * rule, the same 0.0 guards for zero-magnitude and length-mismatched
  * centroids — and it must keep working at the k≈256+ cell counts where
  * the fold's generated code fell out of codegen. */
class ArgmaxCosineSpec extends SparkSpec {
  import spark.implicits._

  /** The replaced implementation, verbatim (IvfIndex.assignCells pre-r4). */
  private def whenFoldArgmax(vecCol: Column, cents: Seq[Seq[Float]]): Column = {
    val scores: Seq[(Int, Column)] = cents.zipWithIndex.map { case (c, cid) =>
      cid -> call_function("graft_cosine", vecCol, typedlit(c))
    }
    scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestId, bestScore), (cid, score)) =>
        (when(score > bestScore, lit(cid)).otherwise(bestId),
          greatest(score, bestScore))
    }._1
  }

  private def randVecs(n: Int, dim: Int, seed: Long): Seq[Seq[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
  }

  test("kernel equals the when-fold on random vectors, ties, and zero vectors") {
    val dim = 16
    // centroid 2 duplicates centroid 0 (tie → first index must win),
    // centroid 5 is all-zero (score 0.0 guard), centroid 6 has the wrong
    // dimension (length-mismatch guard → 0.0)
    val base = randVecs(5, dim, seed = 7)
    val cents: Seq[Seq[Float]] = Seq(base(0), base(1), base(0), base(2),
      base(3), Seq.fill(dim)(0f), Seq.fill(dim + 3)(0.5f), base(4))
    val rows = randVecs(300, dim, seed = 42) ++
      Seq(base(0), base(2), Seq.fill(dim)(0f)) // exact hits + zero probe
    val df = rows.toDF("vec")
    val got = df.select(
      call_function("graft_argmax_cosine", col("vec"), typedlit(cents)).as("kernel"),
      whenFoldArgmax(col("vec"), cents).as("fold"))
    val mismatches = got.filter(col("kernel") =!= col("fold")).count()
    assert(mismatches === 0L)
    // the duplicate-centroid tie resolves to index 0, never 2
    assert(got.filter(col("kernel") === 2).count() === 0L)
  }

  test("k=256 assignment executes and matches a driver-side argmax") {
    val dim = 24
    val cents = randVecs(256, dim, seed = 11)
    val rows = randVecs(500, dim, seed = 13)
    val df = rows.toDF("vec")
    val got = df.select(col("vec"),
      call_function("graft_argmax_cosine", col("vec"), typedlit(cents)).as("cell"))
      .as[(Seq[Float], Int)].collect()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i).toDouble; na += a(i) * a(i).toDouble
        nb += b(i) * b(i).toDouble; i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) 0.0 else dot / den
    }
    got.foreach { case (v, cell) =>
      val scores = cents.map(c => cos(v, c))
      val expected = scores.indexOf(scores.max)
      assert(cell === expected, s"cell $cell vs argmax $expected")
    }
  }

  test("NaN scores follow Spark SQL ordering — NaN beats finite, parity with the fold") {
    // a NaN-poisoned centroid must WIN (Catalyst nan-safe compare treats
    // NaN as greater than everything), exactly like the when-fold it
    // replaced — Java's always-false NaN '>' would pick index 0 instead
    val cents: Seq[Seq[Float]] =
      Seq(Seq(1f, 0f), Seq(Float.NaN, 1f), Seq(0f, 1f))
    val df = Seq(Seq(1f, 1f), Seq(0.2f, 0.9f)).toDF("vec")
    val got = df.select(
      call_function("graft_argmax_cosine", col("vec"), typedlit(cents)).as("kernel"),
      whenFoldArgmax(col("vec"), cents).as("fold"))
      .as[(Int, Int)].collect()
    got.foreach { case (k, f) => assert(k === f, s"kernel $k vs fold $f") }
    assert(got.forall(_._1 === 1), "NaN centroid must win under SQL ordering")
  }

  test("null centroid entries are skipped; all-null yields null") {
    val df = Seq(Seq(1f, 2f)).toDF("vec")
    val mixed = array(lit(null).cast("array<float>"), typedlit(Seq(1f, 2f)),
      typedlit(Seq(-1f, -2f)))
    assert(df.select(call_function("graft_argmax_cosine", col("vec"), mixed))
      .head().getInt(0) === 1)
    val allNull = array(lit(null).cast("array<float>"),
      lit(null).cast("array<float>"))
    assert(df.select(call_function("graft_argmax_cosine", col("vec"), allNull))
      .head().isNullAt(0))
  }

  test("empty centroid list yields null; null vector yields null") {
    val df = Seq(Seq(1f, 2f)).toDF("vec")
    val r1 = df.select(call_function("graft_argmax_cosine", col("vec"),
      typedlit(Seq.empty[Seq[Float]]))).head()
    assert(r1.isNullAt(0))
    val r2 = df.select(call_function("graft_argmax_cosine",
      lit(null).cast("array<float>"), typedlit(Seq(Seq(1f, 2f))))).head()
    assert(r2.isNullAt(0))
  }
}
