package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue matches a reference Morton interleave on random inputs") {
    def morton(a: Long, b: Long, bits: Int): Long = {
      var z = 0L
      for (i <- 0 until bits) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 15).toLong, rnd.nextInt(1 << 15).toLong))
    val got = rows.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue(Seq($"a", $"b"), 15).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z == morton(a, b, 15), s"($a,$b)") }
  }

  test("zValue rejects layouts that overflow a signed long") {
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq($"a", $"b", $"c"), 21)
    }
    intercept[IllegalArgumentException] {
      ZOrder.zValue(Seq($"a"), 10)
    }
  }

  // The reason the operator exists: on a 2-D box query, Z-layout files
  // prune on min/max stats in BOTH dimensions; a linear sort prunes in
  // one. 64x64 uniform grid, 32 files, box = 1/8 x 1/8 of the domain.
  test("Z-layout skips most files on a 2-D box query; linear layout cannot") {
    val grid = spark.range(0, 64 * 64).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))

    def touched(stats: Array[(Int, Seq[(Long, Long)])],
                xr: (Long, Long), yr: (Long, Long)): Int =
      stats.count { case (_, Seq((xmin, xmax), (ymin, ymax))) =>
        xmax >= xr._1 && xmin <= xr._2 && ymax >= yr._1 && ymin <= yr._2
      }

    val linear = grid.repartitionByRange(32, col("x"))
    val zed = ZOrder.layoutByZ(grid, Seq("x", "y"), bits = 6, numFiles = 32)
    val statsLin = ZOrder.partitionStats(linear, Seq("x", "y"))
    val statsZ = ZOrder.partitionStats(zed, Seq("x", "y"))

    val box = ((8L, 15L), (8L, 15L)) // 1/8 x 1/8 of the domain
    val tLin = touched(statsLin, box._1, box._2)
    val tZ = touched(statsZ, box._1, box._2)
    // linear on x: the x-slice hits ~1/8 of files BUT every file spans all
    // y, so an x-only filter is its best case; the box query still reads
    // every file in the x-slice. Z-layout boxes are tight in both dims.
    assert(tZ < tLin, s"z touched $tZ vs linear $tLin")
    assert(tZ <= 8, s"z-order should localize the box: touched $tZ of 32")

    // and a y-only filter (linear's blind spot): linear touches ALL files
    val yOnly = ((0L, 63L), (8L, 15L))
    val tLinY = touched(statsLin, yOnly._1, yOnly._2)
    val tZY = touched(statsZ, yOnly._1, yOnly._2)
    assert(tLinY == statsLin.length, "every linear file spans all y")
    assert(tZY < tLinY / 2, s"z touched $tZY of ${statsZ.length} on y-only")
  }
}
