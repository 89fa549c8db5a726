package graft

import org.apache.spark.sql.functions._

/** The events loader's ts surface: nanos-since-epoch longs from whatever
  * physical flavor the driver data carries. The kernel path
  * ([[graft.plans.GraftTsNanos]], one codegen'd multiply) must equal the
  * tz-independent wall-clock decomposition twin (`Tables.ntzEpochNanos`)
  * — and must not move when the session time zone does, because a host
  * application's session can be zoned anywhere.
  */
class TablesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def kernelVsTwin(): Long = {
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val viaLoader = Tables.events(spark, sf).select(col("event_id"), col("ts"))
    val viaTwin = raw.select(col("event_id"),
      Tables.ntzEpochNanos(col("ts")).as("ts"))
    assert(viaLoader.exceptAll(viaTwin).count() === 0)
    assert(viaTwin.exceptAll(viaLoader).count() === 0)
    // modular checksum — a raw sum of ~1.7e18-scale nanos overflows long
    viaLoader.agg(sum(pmod(col("ts"), lit(1000000007L)))).head().getLong(0)
  }

  test("graft_ts_nanos equals the wall-clock decomposition twin (UTC)") {
    kernelVsTwin()
  }

  test("ts surface is session-timezone-independent (Asia/Kathmandu, +05:45)") {
    val key = "spark.sql.session.timeZone"
    val prev = spark.conf.get(key)
    val utcSum = kernelVsTwin()
    try {
      spark.conf.set(key, "Asia/Kathmandu")
      assert(kernelVsTwin() === utcSum)
    } finally spark.conf.set(key, prev)
  }

  test("ts is micro-grain nanos (no sub-microsecond residue, sane epoch range)") {
    val e = Tables.events(spark, sf)
    assert(e.filter(pmod(col("ts"), lit(1000L)) =!= 0).count() === 0)
    val mn = e.agg(min(col("ts"))).head().getLong(0)
    assert(mn > 0L && mn < 4102444800L * 1000000000L) // (0, year 2100)
  }
}
