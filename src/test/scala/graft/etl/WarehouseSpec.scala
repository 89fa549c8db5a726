package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join WITHOUT a shuffle exchange on either side") {
    val products = (1L to 200L).map(i => (i, s"p$i")).toDF("product_id", "name")
    val status = (1L to 200L).map(i => (i, if (i % 2 == 0) "curated" else "pending"))
      .toDF("product_id", "status")
    Warehouse.writeBucketed(products, "wh_products", "product_id", buckets = 4)
    Warehouse.writeBucketed(status, "wh_status", "product_id", buckets = 4)

    // force the sort-merge path (tiny test tables would broadcast and
    // bypass bucketing entirely)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined = spark.table("wh_products")
      .join(spark.table("wh_status"), "product_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    assert(plan.contains("Bucketed: true"), plan)
    assert(joined.count() == 200)

    // contrast: the same join over plain parquet DOES shuffle (or
    // broadcasts) — bucketing is what removed the exchange
    val dir = Files.createTempDirectory("graft-plain").toString
    products.write.mode("overwrite").parquet(s"$dir/p")
    status.write.mode("overwrite").parquet(s"$dir/s")
    try {
      val plain = spark.read.parquet(s"$dir/p")
        .join(spark.read.parquet(s"$dir/s"), "product_id")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucket-local upsert merges latest versions and preserves bucketing") {
    val base = (1L to 50L).map(i => (i, "v1", 1)).toDF("product_id", "payload", "ver")
    Warehouse.writeBucketed(base, "wh_upsert", "product_id", buckets = 4)
    val updates = Seq((7L, "v2", 2), (999L, "new", 1)).toDF("product_id", "payload", "ver")
    Warehouse.upsertBucketed(spark, "wh_upsert", updates, "product_id", "ver", buckets = 4)
    val after = spark.table("wh_upsert")
    assert(after.count() == 51)
    assert(after.filter($"product_id" === 7L).select("payload").as[String].head() == "v2")
    // still bucketed: joining with itself on the key shows no shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val self = spark.table("wh_upsert").as("a")
        .join(spark.table("wh_upsert").as("b"), "product_id")
      val p = self.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"), p)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
