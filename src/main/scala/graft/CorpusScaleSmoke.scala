package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Corpus-pipeline scale smoke (round 6): wall time AND shuffle volume
  * for the text-corpus shapes as the document set grows 100× — the
  * claims to check are candidate-volume claims: q134's prefix-filtered
  * set-sim join must shuffle candidates linearly in the corpus (blocks
  * multiply under the generator's per-replica token salting — disjoint
  * vocabularies can't cross-pair), q136's two-pass prefix sum must
  * shuffle each doc-stat row exactly once, and q138's PMI counting
  * shuffles tokens/bigrams once into their aggregates plus the bounded
  * vocabulary joins. Super-linear shuffle bytes here would expose a
  * quadratic candidate join or a re-expanded explode long before a
  * wall-time cliff on a cluster.
  *
  * Run: `tools/run_class.sh graft.CorpusScaleSmoke <dir>` against any
  * directory holding a `documents.parquet` (the x10/x100 replicas come
  * from `tools/gen_scaled_data.py`'s documents rule — ad hoc, not in
  * git). Results recorded in BASELINE.md §"x100 corpus smoke".
  */
object CorpusScaleSmoke {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", 8 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

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

    val n = spark.read.parquet(s"$dir/documents.parquet").count()

    def runq(name: String): (Double, Long, Long, Long) = {
      Thread.sleep(1000)
      val w0 = shufWrite.get(); val r0 = shufRead.get()
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      (sec, shufWrite.get() - w0, shufRead.get() - r0, rows)
    }

    val lines = Seq("q134_setsim_join", "q136_token_budget_fill",
      "q138_pmi_collocations").map { name =>
      val (sec, w, r, rows) = runq(name)
      f""""${name.takeWhile(_ != '_')}":{"sec":$sec%.2f,"shuffle_write_mb":${w / 1e6}%.1f,"shuffle_read_mb":${r / 1e6}%.1f,"rows":$rows}"""
    }
    println(s"""{"dir":"$dir","n_docs":$n,${lines.mkString(",")}}""")
    spark.stop()
  }
}
