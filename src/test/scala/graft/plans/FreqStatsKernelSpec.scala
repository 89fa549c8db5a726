package graft.plans

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.InternalRow
import graft.SparkSpec

/** Defensive-contract pins for the graft_freq_stats kernel (r7 ADVICE:
  * a mismatched `total` used to exhaust both MAD pointers and index
  * cs(-1), crashing any SQL caller's task with AIOOBE).
  */
class FreqStatsKernelSpec extends SparkSpec {

  private def grid(entries: (Long, Long)*): GenericArrayData =
    new GenericArrayData(entries.map { case (v, n) =>
      InternalRow(v, n): Any
    }.toArray)

  private def run(fs: GenericArrayData, total: Long, k: Long): Seq[Long] = {
    val out = GraftFreqStats.stats(fs, total, k)
    (0 until out.numElements()).map(out.getLong)
  }

  test("consistent total: median/mad/outliers on a simple grid") {
    // values 10x2, 20x3, 100x1; total 6 -> lower median 20, deviations
    // {10,10,0,0,0,80} -> mad 0; k=3 gate: |v-20| > 0 counts 10s and 100
    assert(run(grid(10L -> 2L, 20L -> 3L, 100L -> 1L), 6L, 3L) ===
      Seq(20L, 0L, 3L))
  }

  test("total exceeding 2x the grid count sum returns the zero sentinel") {
    // used to throw ArrayIndexOutOfBoundsException(-1)
    assert(run(grid(10L -> 2L, 20L -> 3L), 100L, 3L) === Seq(0L, 0L, 0L))
  }

  test("SQL caller with a mismatched total gets rows, not a task crash") {
    val row = spark.sql(
      """SELECT graft_freq_stats(
        |  array(named_struct('v_cents', 10L, 'n', 1L)), 999L, 3L) AS s
        |""".stripMargin).head().getSeq[Long](0)
    assert(row === Seq(0L, 0L, 0L))
  }

  test("empty grid and non-positive total return the zero sentinel") {
    assert(run(grid(), 5L, 3L) === Seq(0L, 0L, 0L))
    assert(run(grid(10L -> 1L), 0L, 3L) === Seq(0L, 0L, 0L))
  }
}
