package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: latest version wins, new keys inserted, ties favor updates") {
    val base = Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1)).toDF("id", "v", "ver")
    val updates = Seq((2L, "B", 2), (4L, "d", 1)).toDF("id", "v", "ver")
    val merged = Pipeline.upsert(base, updates, "id", "ver")
      .orderBy("id").as[(Long, String, Int)].collect()
    assert(merged.toSeq == Seq((1L, "a", 1), (2L, "B", 2), (3L, "c", 1), (4L, "d", 1)))
    // same version on both sides → the update wins
    val tied = Pipeline.upsert(base, Seq((1L, "A", 1)).toDF("id", "v", "ver"), "id", "ver")
      .filter($"id" === 1).as[(Long, String, Int)].head()
    assert(tied._2 == "A")
  }

  test("upsertEvolving: extra update columns dropped, missing columns keep base values") {
    val base = Seq((1L, "a", "m1", 1), (2L, "b", "m2", 1))
      .toDF("id", "v", "meta", "ver")

    // drift 1: updates carry a column the base table doesn't have yet
    val extra = Seq((2L, "B", "new-col", 2)).toDF("id", "v", "img_all", "ver")
    val mergedExtra = Pipeline.upsertEvolving(base, extra, "id", "ver")
    assert(mergedExtra.columns.toSeq == base.columns.toSeq) // img_all dropped
    assert(mergedExtra.filter($"id" === 2).select("v").as[String].head() == "B")

    // drift 2: updates miss a base column → updated key keeps the base
    // value, brand-new key gets null
    val missing = Seq((2L, "B2", 3), (9L, "new", 1)).toDF("id", "v", "ver")
    val mergedMissing = Pipeline.upsertEvolving(base, missing, "id", "ver")
      .orderBy("id").select("id", "v", "meta")
      .as[(Long, String, Option[String])].collect()
    assert(mergedMissing.toSeq == Seq(
      (1L, "a", Some("m1")),
      (2L, "B2", Some("m2")), // meta carried from the replaced base row
      (9L, "new", None)))     // no prior row → null

    // shared columns still take the winner's value — including both drifts
    // at once, and latest-wins ordering is preserved
    val both = Seq((1L, "A9", "x", 9), (1L, "A5", "y", 5))
      .toDF("id", "v", "junk", "ver")
    val winner = Pipeline.upsertEvolving(base, both, "id", "ver")
      .filter($"id" === 1).select("v", "meta").as[(String, String)].head()
    assert(winner == (("A9", "m1")))
  }

  test("incrementalFilter: only unseen keys survive") {
    val batch = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "payload")
    val seen = Seq(Tuple1(2L)).toDF("id")
    val out = Pipeline.incrementalFilter(batch, seen, "id")
      .orderBy("id").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "x"), (3L, "z")))
  }

  test("deleteWhere removes predicate matches only") {
    val t = Seq((1L, "keep"), (2L, "drop")).toDF("id", "s")
    val out = Pipeline.deleteWhere(t, $"s" === "drop").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "keep")))
  }

  test("transformProducts: X1/X2/X3/E7 semantics") {
    val raw = Seq(
      ("  relaxed   fit  SHIRT ", "  nice   shirt ", 49.9, 69.9,
        Seq("White", "white", "Beige")),
      ("", null.asInstanceOf[String], 100.0, 80.0, Seq.empty[String]))
      .toDF("name", "description", "price_current", "price_original", "colors")
      .withColumn("materials", col("colors"))
    val out = Pipeline.transformProducts(raw).orderBy(asc("name"))
    val rows = out.select("name", "description", "discount_percentage", "colors").collect()
    assert(rows(0).getString(0) == "Relaxed Fit Shirt")
    assert(rows(0).getString(1) == "nice shirt")
    assert(rows(0).getDecimal(2).doubleValue() == 28.6) // round((1-49.9/69.9)*100, 1)
    assert(rows(0).getSeq[String](3) == Seq("White", "Beige"))
    assert(rows(1).getString(0) == "Unknown Product")
    assert(rows(1).getString(1) == null)
    assert(rows(1).get(2) == null) // price went up → no discount
  }

  test("variantRepresentatives: most images wins, ties by id") {
    val products = Seq(
      ("p1", null.asInstanceOf[String], Seq("a", "b")),
      ("p2", "p1", Seq("a", "b", "c")),
      ("p3", "p1", Seq("a", "b", "c")),
      ("q1", null.asInstanceOf[String], Seq.empty[String]))
      .toDF("id", "parent", "images")
    val reps = Pipeline.variantRepresentatives(products, "id", "parent", "images")
      .orderBy("group_key").as[(String, String)].collect()
    assert(reps.toSeq == Seq(("p1", "p2"), ("q1", "q1")))
  }

  test("broadcastGroupTags: every member gets the group's tags") {
    val products = Seq(("p1", null.asInstanceOf[String]), ("p2", "p1"), ("q1", null.asInstanceOf[String]))
      .toDF("id", "parent")
    val tags = Seq(("p1", "classic")).toDF("group_key", "style")
    val out = Pipeline.broadcastGroupTags(products, tags, "id", "parent")
      .orderBy("id").select("id", "style").as[(String, String)].collect()
    assert(out.toSeq == Seq(("p1", "classic"), ("p2", "classic"), ("q1", null)))
  }

  test("salted aggregation and argmax equal their unsalted forms on skewed data") {
    // skewed: key "hot" has 500 rows, others 1-3
    val rows = (1 to 500).map(i => ("hot", i.toLong, s"id$i")) ++
      Seq(("a", 7L, "x1"), ("a", 9L, "x2"), ("b", 5L, "y1"))
    val df = rows.toDF("key", "score", "id")

    val plainCounts = df.groupBy("key").count()
      .as[(String, Long)].collect().toMap
    val saltedCounts = Pipeline.saltedCount(df, "key", saltBuckets = 8)
      .as[(String, Long)].collect().toMap
    assert(saltedCounts == plainCounts)

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("score").desc, col("id"))
    val plainBest = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .as[(String, Long, String)].collect().toSet
    val saltedBest = Pipeline.saltedArgMax(df, "key", "score", "id", saltBuckets = 8)
      .as[(String, Long, String)].collect().toSet
    assert(saltedBest == plainBest)
  }

  test("TagStage: end-to-end parse→policy over a Dataset") {
    val input = Seq(
      RawTagResponse("1", "bottom", "Cargo Pants", "",
        """{"style_identity": [{"tag": "workwear", "confidence": 0.9}],
           "fit": {"tag": "slim", "confidence": 0.9},
           "silhouette": {"tag": "straight", "confidence": 0.9},
           "formality": {"tag": "casual", "confidence": 0.9}}"""),
      RawTagResponse("2", "top", "Knit Sweater", "", "no json here"))
      .toDS()
    val out = TagStage.run(input).collect().sortBy(_.product_id)
    assert(out(0).curation_status == "approved")
    assert(out(0).style_identity == Seq("workwear"))
    assert(out(0).fit.contains("slim"))
    assert(!out(0).parse_failed)
    assert(out(1).parse_failed)
    assert(out(1).curation_status == "needs_fix") // no style identity
    assert(out(1).fit.contains("regular")) // defaulted
    assert(out(1).top_layer_role.contains("mid")) // "Knit Sweater" → mid
  }
}
