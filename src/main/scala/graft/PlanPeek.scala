package graft
import org.apache.spark.sql.SparkSession
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    val plan = df.queryExecution.executedPlan.toString
    println("EXCHANGES: " + "Exchange hashpartitioning".r.findAllIn(plan).size)
    println("BROADCASTS: " + "BroadcastHashJoin".r.findAllIn(plan).size)
    println("SMJ: " + "SortMergeJoin".r.findAllIn(plan).size)
    println(plan.take(6000))
  }
}
