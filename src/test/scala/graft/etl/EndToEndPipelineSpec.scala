package graft.etl

import graft.SparkSpec
import graft.export.{TrainingExport, TrainingValidate}
import graft.ops.CategoryMapping
import graft.sources.ProductSources
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** SURVEY §5.2 item 4 — the full lifecycle through the public APIs:
  * raw JSON tree → validate → transform → slot mapping → upsert into a
  * parquet warehouse → AI-tag stage (P2∘P1) → mark-curated fan-out →
  * stats view → training export → export validation.
  */
class EndToEndPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def writeTree(): String = {
    val root = Files.createTempDirectory("graft-e2e").toString
    def put(cat: String, pid: String, json: String): Unit = {
      val dir = Paths.get(root, cat, pid)
      Files.createDirectories(dir)
      Files.writeString(dir.resolve("metadata.json"), json)
    }
    put("jeans", "j1",
      """{"product_id": "j1", "name": "  slim  FIT jeans ", "price_current": 49.9,
          "price_original": 69.9, "colors": ["Blue", "blue"], "materials": ["denim"],
          "image_urls": ["u1", "u2"], "description": " classic  five pocket "}""")
    put("sweaters", "s1",
      """{"product_id": "s1", "name": "wool sweater", "price_current": 89.9,
          "colors": ["Grey"], "materials": ["wool"], "image_urls": ["u3"]}""")
    put("jeans", "j2",
      """{"product_id": "j2", "name": "slim fit jeans washed", "price_current": 54.9,
          "colors": ["Black"], "materials": ["denim"],
          "image_urls": ["u4", "u5", "u6"]}""") // j1's variant, more images
    put("jeans", "bad", """{"product_id": "bad", "name": "  "}""") // fails F10
    root
  }

  test("raw tree → bucketed warehouse → P9 → tagging → curation → export, end to end") {
    // EXTRACT (S3) + F10 + TRANSFORM + slot mapping (X21/X22)
    val raw = ProductSources.readProductTree(spark, writeTree())
    val clean = Pipeline.transformProducts(Pipeline.validProducts(raw))
      .withColumn("category_refitd", CategoryMapping.categoryRefitd(col("category")))
      .withColumn("top_layer_role", CategoryMapping.topLayerRole(col("category")))
    assert(clean.count() == 3) // "bad" dropped by F10

    val j1 = clean.filter($"product_id" === "j1").head()
    assert(j1.getAs[String]("name") == "Slim Fit Jeans")
    assert(j1.getAs[String]("description") == "classic five pocket")
    assert(j1.getSeq[String](j1.fieldIndex("colors")) == Seq("Blue"))
    assert(j1.getAs[String]("category_refitd") == "bottom")

    // LOAD (S5) into the BUCKETED warehouse (§7.1 step 5), then a
    // bucket-local upsert: j1's price drops, nothing else changes
    Warehouse.writeBucketed(clean.withColumn("v", lit(1)),
      "e2e_products", "product_id", buckets = 4)
    val priceUpdate = clean.filter($"product_id" === "j1")
      .withColumn("price_current", lit(39.9)).withColumn("v", lit(2))
    Warehouse.upsertBucketed(spark, "e2e_products", priceUpdate,
      "product_id", "v", buckets = 4)
    val reloaded = spark.table("e2e_products").drop("v")
    assert(reloaded.count() == 3)
    assert(reloaded.filter($"product_id" === "j1")
      .head().getAs[Double]("price_current") == 39.9)

    // P9: variant-group representative — j2 (3 images) represents j1's group
    val reps = Pipeline.variantRepresentatives(
      reloaded.withColumn("parent_id",
        when($"product_id".startsWith("j"), lit("j1"))),
      "product_id", "parent_id", "image_urls")
      .orderBy("group_key")
      .as[(String, String)].collect().toSeq
    assert(reps == Seq(("j1", "j2"), ("s1", "s1")))

    // AI TAGGING (P2∘P1 via TagStage) over deterministic raw responses
    val responses = reloaded.select(
      col("product_id"), col("category_refitd").as("category"),
      col("name").as("product_name"),
      coalesce(col("category"), lit("")).as("subcategory"),
      when(col("category_refitd") === "bottom",
        lit("""{"style_identity": [{"tag": "classic", "confidence": 0.9}],
               "fit": {"tag": "slim", "confidence": 0.9},
               "silhouette": {"tag": "straight", "confidence": 0.9},
               "formality": {"tag": "casual", "confidence": 0.9}}"""))
        .otherwise(lit("""{"style_identity": [{"tag": "classic", "confidence": 0.95}],
               "formality": {"tag": "smart-casual", "confidence": 0.9}}"""))
        .as("raw_response"))
    val tagged = TagStage.run(TagStage.fromDataFrame(responses))
    val byId = tagged.collect().map(t => t.product_id -> t).toMap
    assert(byId("j1").curation_status == "approved")
    assert(byId("j2").curation_status == "approved")
    assert(byId("s1").fit.contains("regular")) // defaulted for the sweater
    assert(byId("s1").top_layer_role.contains("mid")) // "sweaters" subcategory

    // CURATION (P8 three-sink fan-out)
    val curated = Curation.markCurated(
      tagged.toDF()
        .withColumn("tags_final",
          to_json(struct(col("category"), col("style_identity"), col("fit"),
            col("formality"))))
        .withColumn("original_ai_tags", lit("{}")),
      "e2e-curator", "2026-02-27 00:00:00")
    assert(curated.statusUpsert.count() == 3)
    assert(curated.productStamps.filter($"training_eligible").count() == 3)

    // README VIEWS over the warehouse (supabase_schema.sql:127-147):
    // product_stats — one row of corpus-wide aggregates
    val stats0 = reloaded
      .agg(count(lit(1)).as("total_products"),
        countDistinct(col("category_refitd")).as("total_categories"),
        min(col("price_current")).as("min_price"),
        max(col("price_current")).as("max_price"),
        (sum(col("price_current").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_price"),
        sum(size(col("image_urls"))).as("total_images"))
      .as[(Long, Long, Double, Double, Double, Long)].head()
    assert(stats0 == ((3L, 2L, 39.9, 89.9,
      (BigDecimal("39.9") + BigDecimal("54.9") + BigDecimal("89.9"))
        .toDouble / 3, 6L)))

    // category_summary — per-category rollup ordered by product_count desc
    val summary = reloaded.groupBy(col("category_refitd"))
      .agg(count(lit(1)).as("product_count"),
        (sum(col("price_current").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_price"))
      .orderBy(col("product_count").desc, col("category_refitd"))
      .as[(String, Long, Double)].collect()
    assert(summary.map(r => (r._1, r._2)).toSeq ==
      Seq(("bottom", 2L), ("top", 1L)))

    // EXPORT (P5) + VALIDATE (P6)
    val records = curated.historyAppend
      .join(reloaded.select(col("product_id"), col("name").as("product_name"),
        col("category"), col("description"), lit("zara").as("brand_name")),
        Seq("product_id"))
      .withColumnRenamed("corrected_tags", "corrected_tags")
    val jsonl = TrainingExport.toJsonl(records, "SYSTEM PROMPT")
    val validation = TrainingValidate.validate(jsonl)
      .selectExpr("size(errors) AS e").as[Int].collect()
    // apparel rows lack 'length' in tags_final → exactly one error each
    assert(validation.length == 3 && validation.forall(_ == 1))
    val stats = TrainingExport.exportStats(jsonl).as[(Long, Long, Double)].head()
    assert(stats._1 == 3 && stats._2 > 50)
  }
}
