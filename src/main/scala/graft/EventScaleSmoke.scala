package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Event-pipeline scale smoke (round-4 VERDICT item 4): measured evidence
  * that the event-analytics shapes hold as the stream grows 100× — wall
  * time AND shuffle volume per query, because the scale claims to check
  * are partitioning claims: q57's sessionization and q86's funnel shuffle
  * each event exactly once (shuffle bytes ∝ stream), q87's distinct
  * (user, day) collapse bounds its join input by users×days, and q91's
  * per-day pre-aggregate shuffles the collapsed (user, day) table, not
  * the stream. A shape that re-shuffled a join product or re-expanded the
  * stream would show super-linear shuffle bytes here before it showed a
  * wall-time cliff on a cluster.
  *
  * Run: `tools/run_class.sh graft.EventScaleSmoke <dir>` against any
  * directory holding an `events.parquet` (ts already BIGINT nanos, or
  * TIMESTAMP(NANOS) via nanosAsLong). The x100 table is events-only
  * (user/event ids offset per replica — user count grows 100×, events
  * per user stay constant, matching a production stream's growth mode),
  * generated ad hoc like the dedup smoke's x100 docs, ~135 MB parquet,
  * not kept in git. Results recorded in BASELINE.md §"x100 event smoke".
  */
object EventScaleSmoke {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", 8 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage-level shuffle totals; listener delivery is async, so each
    // query waits for the bus to drain (bounded sleep) before reading
    val shufWrite = new AtomicLong(0L)
    val shufRead = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })

    val n = spark.read.parquet(s"$dir/events.parquet").count()

    def runq(name: String): (Double, Long, Long) = {
      Thread.sleep(1000) // drain listener bus from the previous query
      val w0 = shufWrite.get(); val r0 = shufRead.get()
      val t0 = System.nanoTime()
      Bench.force(SparkEntry.queries(name)(spark, dir))
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      (sec, shufWrite.get() - w0, shufRead.get() - r0)
    }

    val lines = Seq("q57_sessionization", "q86_event_funnel",
      "q87_retention_cohorts", "q91_moving_window",
      // r5 history family: q122's two-window SCD2 build and q129's
      // incremental apply (whose shuffle must track open-keys + batch,
      // NOT history depth — the claim to watch here)
      "q122_scd2_history", "q129_scd2_increment",
      "q131_time_weighted_avg").map { name =>
      val (sec, w, r) = runq(name)
      f""""${name.takeWhile(_ != '_')}":{"sec":$sec%.2f,"shuffle_write_mb":${w / 1e6}%.1f,"shuffle_read_mb":${r / 1e6}%.1f}"""
    }
    println(s"""{"dir":"$dir","n_events":$n,${lines.mkString(",")}}""")
    spark.stop()
  }
}
