package graft.export

import graft.SparkSpec
import org.json4s.jackson.JsonMethods

class TrainingExportSpec extends SparkSpec {
  import spark.implicits._

  private val correctedTags =
    """{"category": "bottom", "style_identity": ["workwear"], "fit": "slim",
       "formality": "casual", "length": "regular",
       "deleted_tags": {"style_identity": [{"value": "rugged", "reason": "not rugged", "curator": "t"}]},
       "added_tags": {"context": ["everyday"]},
       "modified_tags": {"fit": {"from": "regular", "to": "slim", "reason": "runs small"}}}"""

  test("curator feedback section (export_training_data.py:40-96)") {
    val tags = JsonMethods.parse(correctedTags).values.asInstanceOf[Map[String, Any]]
    val fb = TrainingExport.formatCuratorFeedback(tags)
    assert(fb ==
      """CURATOR FEEDBACK
        |- Removed 'rugged' from style_identity: not rugged
        |- Added 'everyday' to context
        |- Changed fit from 'regular' to 'slim': runs small""".stripMargin)
    assert(TrainingExport.formatCuratorFeedback(Map.empty) == "")
  }

  test("build_example: 3-message structure, feedback appended to system") {
    val line = TrainingExport.buildExampleJson("SYSTEM", correctedTags,
      Some("Cargo Pants"), Some("bottom"), Some("durable pants"), Some("Zara"))
    val parsed = JsonMethods.parse(line).values.asInstanceOf[Map[String, Any]]
    val msgs = parsed("messages").asInstanceOf[Seq[Map[String, Any]]]
    assert(msgs.map(_("role")) == Seq("system", "user", "assistant"))
    assert(msgs(0)("content").toString.startsWith("SYSTEM\n\nCURATOR FEEDBACK"))
    val user = JsonMethods.parse(msgs(1)("content").toString).values.asInstanceOf[Map[String, Any]]
    assert(user == Map("title" -> "Cargo Pants", "category" -> "bottom",
      "description" -> "durable pants", "brand" -> "Zara"))
    val asst = JsonMethods.parse(msgs(2)("content").toString).values.asInstanceOf[Map[String, Any]]
    assert(asst("fit") == "slim")
  }

  test("python-style JSON: 2-space indent, key order preserved") {
    assert(TrainingExport.pythonStyleJson(Seq("a" -> "x", "b" -> "y \"q\"")) ==
      "{\n  \"a\": \"x\",\n  \"b\": \"y \\\"q\\\"\"\n}")
  }

  test("export → validate round trip through Datasets") {
    val records = Seq(
      (correctedTags, "Cargo Pants", "bottom", "desc", "Zara"),
      ("""{"shoe_type": "boots", "profile": "chunky", "formality": "casual"}""",
        "Chelsea Boots", "shoes", "", "Zara"))
      .toDF("corrected_tags", "product_name", "category", "description", "brand_name")
    val lines = TrainingExport.toJsonl(records, "SYSTEM")
    assert(lines.count() == 2)
    val results = TrainingValidate.validate(lines)
      .selectExpr("line_num", "size(errors)", "size(warnings)")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    // apparel example: all required present → 0 errors; footwear too
    assert(results.forall(_._2 == 0), results.mkString(","))
    // both warn about missing context/pairing_tags
    assert(results.forall(_._3 == 2))
    val stats = TrainingExport.exportStats(lines)
      .as[(Long, Long, Double)].head()
    assert(stats._1 == 2 && stats._2 > 100)
  }

  test("per-category export stats: token math + unknown fallback (A13)") {
    val records = Seq(
      (correctedTags, "Cargo Pants", "bottom", "desc", "Zara"),
      (correctedTags, "Chinos", "bottom", "desc", "Zara"),
      ("""{"fit": "slim"}""", "Mystery Item", null, "", ""))
      .toDF("corrected_tags", "product_name", "category", "description", "brand_name")
    val stats = TrainingExport.exportStatsByCategory(records, "SYSTEM")
      .as[(String, Long, Long, Double)].collect()
    assert(stats.map(_._1).toSeq == Seq("bottom", "unknown"))
    val bottom = stats(0)
    assert(bottom._2 == 2)
    // tokens = Σ max(1, len/4) over the real JSONL lines
    val expected = Seq(("Cargo Pants", "bottom", "desc", "Zara", correctedTags),
      ("Chinos", "bottom", "desc", "Zara", correctedTags))
      .map { case (n, c, d, b, t) =>
        TrainingExport.estimateTokens(
          TrainingExport.buildExampleJson("SYSTEM", t, Some(n), Some(c), Some(d), Some(b)))
      }.sum
    assert(bottom._3 == expected)
    assert(bottom._4 == expected.toDouble / 1e6 * TrainingExport.CostPerMTokensGpt4o)
    assert(stats(1)._2 == 1)
  }

  test("validation failures (validate_training_data.py:40-126)") {
    def check(line: String): Seq[String] =
      TrainingValidate.validateExample(line, 1).errors
    assert(check("""{"nope": 1}""").exists(_.contains("Missing 'messages'")))
    assert(check("""{"messages": [{"role": "system", "content": "s"}]}""")
      .exists(_.contains("Expected 3 messages")))
    assert(check(
      """{"messages": [{"role": "user", "content": "a"},
          {"role": "system", "content": "b"}, {"role": "assistant", "content": "{}"}]}""")
      .exists(_.contains("Invalid roles")))
    val missingTags =
      """{"messages": [{"role": "system", "content": "s"},
          {"role": "user", "content": "{\"category\": \"bottom\"}"},
          {"role": "assistant", "content": "{\"style_identity\": []}"}]}"""
    val errs = check(missingTags)
    assert(errs.exists(_.contains("'style_identity' must be non-empty list")))
    assert(errs.exists(_.contains("Missing required tag 'fit'")))
    assert(errs.exists(_.contains("Missing required tag 'length'")))
    // footwear inferred from category keyword → different required set
    val footwear =
      """{"messages": [{"role": "system", "content": "s"},
          {"role": "user", "content": "{\"category\": \"Boots\"}"},
          {"role": "assistant", "content": "{\"shoe_type\": \"boots\", \"profile\": \"chunky\", \"formality\": \"casual\"}"}]}"""
    assert(check(footwear).isEmpty)
  }

  test("category mapping columns (X21/X22)") {
    import graft.ops.CategoryMapping
    import org.apache.spark.sql.functions.col
    val df = Seq("tshirts", "sweaters", "jeans", "boots", "mystery", "Shoes ")
      .toDF("cat")
      .select(col("cat"),
        CategoryMapping.categoryRefitd(col("cat")).as("refitd"),
        CategoryMapping.topLayerRole(col("cat")).as("role"),
        CategoryMapping.displayCategory(col("cat")).as("disp"))
    val rows = df.as[(String, String, String, String)].collect().toMap2
    assert(rows("tshirts") == ("top", "base", "Tops"))
    assert(rows("sweaters") == ("top", "mid", "Sweaters"))
    assert(rows("jeans") == ("bottom", null, "Jeans"))
    assert(rows("boots") == ("footwear", null, "Boots"))
    assert(rows("mystery") == ("top", "base", "Mystery")) // safe default
    assert(rows("Shoes ") == ("footwear", null, "Shoes ")) // trim+lower for slots
  }

  implicit class Tup4Ops(rows: Array[(String, String, String, String)]) {
    def toMap2: Map[String, (String, String, String)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }
}
