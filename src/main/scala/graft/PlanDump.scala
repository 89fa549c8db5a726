package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed plan (and a few reuse/exchange counts)
  * for a named SparkEntry query — the `.explain("formatted")` loop the
  * build protocol prescribes, runnable via tools/run_class.sh without
  * spinning up sbt console.
  *
  * Usage: tools/run_class.sh graft.PlanDump <queryName> <sfDir> [full]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // word-start anchored (r9 ADVICE): a bare "Exchange" substring also
    // matched every ReusedExchange/BroadcastExchange occurrence,
    // inflating the one count this tool exists to report (the shuffle
    // exchange). (?<![A-Za-z]) rejects matches preceded by a letter;
    // the other keywords gain the same guard for free.
    Seq("ReusedExchange", "Exchange", "Scan parquet", "graft_shingles",
      "BroadcastExchange", "WindowExec", "SortMergeJoin", "BroadcastHashJoin")
      .foreach(k =>
        println(f"$k%-20s ${s"(?<![A-Za-z])${k}".r.findAllIn(plan).size}"))
    if (args.contains("full")) println(plan)
    spark.stop()
  }
}
