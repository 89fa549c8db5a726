package graft.operators

import graft.SparkSpec
import graft.functions.IntLog2
import org.apache.spark.sql.functions._

/** Pins DriftMonitor.psiByBin to a BigInt brute-force of the
  * definition (add-one smoothing over the observed bin union, the
  * same clamped cross-multiplied term), plus: identical samples score
  * exactly zero in every bin, a planted shift scores positive where
  * the mass moved, and disjoint bin supports surface both sides. */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def reference(ref: Seq[Long], cur: Seq[Long],
                        w: Long): Map[Long, (Long, Long, Long)] = {
    val lg = (x: Long) => BigInt(IntLog2.ilog2e16(x))
    val rb = ref.groupBy(_ / w).view.mapValues(_.size.toLong).toMap
    val cb = cur.groupBy(_ / w).view.mapValues(_.size.toLong).toMap
    val bins = (rb.keySet ++ cb.keySet)
    val (b, d1, d2) =
      (bins.size.toLong, ref.size + bins.size.toLong, cur.size + bins.size.toLong)
    bins.map { bin =>
      val (a, bb) = (rb.getOrElse(bin, 0L) + 1, cb.getOrElse(bin, 0L) + 1)
      val num = (BigInt(a) * d2 - BigInt(bb) * d1) *
        (lg(a) - lg(d1) - lg(bb) + lg(d2)) * BigInt(1000000000)
      val term = num.max(0) / (BigInt(d1) * d2 * 65536)
      bin -> ((rb.getOrElse(bin, 0L), cb.getOrElse(bin, 0L), term.toLong))
    }.toMap
  }

  private def run(ref: Seq[Long], cur: Seq[Long],
                  w: Long): Map[Long, (Long, Long, Long)] =
    DriftMonitor.psiByBin(ref.toDF("v"), cur.toDF("v"), "v", w)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (b, r, c, t) => b -> ((r, c, t)) }.toMap

  test("psiByBin ≡ brute-force definition (crafted + random)") {
    val crafted = (
      Seq(10L, 15L, 110L, 120L, 250L, 260L, 270L, 505L),
      Seq(12L, 130L, 140L, 150L, 280L, 900L))
    assert(run(crafted._1, crafted._2, 100L) ===
      reference(crafted._1, crafted._2, 100L))
    val rnd = new scala.util.Random(41)
    (0 until 3).foreach { trial =>
      val ref = (0 until 200).map(_ => rnd.nextInt(1000).toLong)
      val cur = (0 until 60).map(_ => (rnd.nextInt(800) + 200).toLong)
      assert(run(ref, cur, 50L) === reference(ref, cur, 50L), s"trial $trial")
    }
  }

  test("identical samples drift exactly zero in every bin") {
    val xs = Seq(5L, 105L, 205L, 305L, 310L, 10L)
    val out = run(xs, xs, 100L)
    assert(out.nonEmpty)
    out.foreach { case (bin, (r, c, t)) =>
      assert(r === c && t === 0L, s"bin $bin")
    }
  }

  test("a planted shift scores positive where the mass moved") {
    val ref = (0 until 100).map(_ => 50L) // all mass in bin 0
    val cur = (0 until 100).map(_ => 250L) // all mass in bin 2
    val out = run(ref, cur, 100L)
    assert(out(0L)._3 > 0L && out(2L)._3 > 0L)
    // both disjoint supports surface with their zero side counted
    assert(out(0L)._1 === 100L && out(0L)._2 === 0L)
    assert(out(2L)._1 === 0L && out(2L)._2 === 100L)
  }

  test("incremental ≡ from-scratch on every split of a planted fixture " +
      "(r11, q205)") {
    val ref = Seq(10L, 15L, 110L, 120L, 250L, 260L, 270L, 505L)
    val cur = Seq(12L, 130L, 140L, 150L, 280L, 900L)
    val full = run(ref, cur, 100L)
    def viaState(refSide: Seq[Long], curA: Seq[Long], curB: Seq[Long]) =
      DriftMonitor.psiFromBinCounts(
          DriftMonitor.binCounts(refSide.toDF("v"), "v", 100L),
          DriftMonitor.mergeBinCounts(
            DriftMonitor.binCounts(curA.toDF("v"), "v", 100L),
            DriftMonitor.binCounts(curB.toDF("v"), "v", 100L)))
        .as[(Long, Long, Long, Long)].collect()
        .map { case (b, r, c, t) => b -> ((r, c, t)) }.toMap
    // every split of the current side into (accumulated state, batch) —
    // including the empty-batch and everything-is-the-batch ends
    (0 to cur.length).foreach { k =>
      val (a, b) = cur.splitAt(k)
      assert(viaState(ref, a, b) === full, s"cur split at $k")
    }
    // the reference snapshot persists as state too: psiByBin over raw
    // rows ≡ psiFromBinCounts over its own histogram, any ref split
    (0 to ref.length).foreach { k =>
      val (a, b) = ref.splitAt(k)
      val got = DriftMonitor.psiFromBinCounts(
          DriftMonitor.mergeBinCounts(
            DriftMonitor.binCounts(a.toDF("v"), "v", 100L),
            DriftMonitor.binCounts(b.toDF("v"), "v", 100L)),
          DriftMonitor.binCounts(cur.toDF("v"), "v", 100L))
        .as[(Long, Long, Long, Long)].collect()
        .map { case (b2, r, c, t) => b2 -> ((r, c, t)) }.toMap
      assert(got === full, s"ref split at $k")
    }
  }

  test("both inputs empty fails with the designed diagnostic, not an " +
      "NPE (r11, ADVICE)") {
    val empty = Seq.empty[Long].toDF("v")
    val e = intercept[IllegalArgumentException] {
      DriftMonitor.psiByBin(empty, empty, "v", 100L).collect()
    }
    assert(e.getMessage.contains("at least one observed bin"))
  }
}
