package graft.ops

import graft.SparkSpec
import graft.functions.VocabularyOps
import org.apache.spark.sql.functions._

class ColumnOpsSpec extends SparkSpec {
  import spark.implicits._

  test("X4/X5: product id and name from URL") {
    val df = Seq(
      "https://z.com/us/relaxed-fit-shirt-p04231456.html",
      "https://z.com/us/plain-item.html").toDF("url")
      .select(
        ColumnOps.productIdFromUrl(col("url")).as("id"),
        ColumnOps.nameFromUrlSlug(col("url")).as("name"))
    val rows = df.as[(String, String)].collect()
    assert(rows(0) == ("04231456", "Relaxed Fit Shirt"))
    assert(rows(1)._1 == "plain-item") // fallback: last segment minus .html
  }

  test("X6/X7/X8: slugify, variant id, filename sanitize") {
    val r = Seq(("Off-White / Écru!", "p1"))
      .toDF("color", "id")
      .select(
        ColumnOps.slugify(col("color")).as("slug"),
        ColumnOps.variantId(col("id"), col("color")).as("vid"),
        ColumnOps.sanitizeFilename(lit("My File: draft(2).txt")).as("fn"))
      .as[(String, String, String)].head()
    assert(r._1 == "off_white_cru") // non-ascii stripped, runs collapsed, trimmed
    assert(r._2 == "p1_off_white_cru")
    assert(r._3 == "My_File_draft2txt") // '.' is non-word → stripped (file_loader.py:32-37)
  }

  test("X9/X14/X19: price parse, confidence clamp, token estimate") {
    val r = Seq(("desde 1.299,00 EUR", "2.5", "abcdefgh"))
      .toDF("p", "c", "t")
      .select(
        ColumnOps.parsePriceText(col("p")).as("price"),
        ColumnOps.confidenceClamp(col("c")).as("conf"),
        ColumnOps.tokenEstimate(col("t")).as("tok"))
      .as[(Double, Double, Long)].head()
    assert(r._1 == 1.29900) // ',' dropped: "1.299.00"→invalid? no: first [\d.,]+ = "1.299,00" → "1.299.00"
    assert(r._2 == 1.0)
    assert(r._3 == 2L)
  }

  test("E5: lay-flat image pick rules (pipeline.py:256-279)") {
    val urls = Seq((Seq("a", "b", "c", "d", "e", "f"), "x")).toDF("urls", "k")
    def pick(rule: String) =
      urls.select(ColumnOps.layFlatPick(col("urls"), lit(rule))).as[Seq[String]].head()
    assert(pick("first_2") == Seq("a", "b"))
    assert(pick("last_2") == Seq("e", "f"))
    assert(pick("neg_4_to_2") == Seq("c", "d")) // urls[-4:-2]
    assert(pick("neg_3_and_4") == Seq("d", "c")) // [urls[-3], urls[-4]]
    assert(pick("unknown") == Seq("a", "b")) // default
  }

  test("E5 totality: every rule is safe on arrays of any length (property)") {
    val rng = new scala.util.Random(11)
    val rules = Seq("first_2", "last_2", "neg_4_to_2", "neg_3_and_4", "junk")
    val cases = for (n <- 0 to 8; r <- rules) yield
      (Seq.fill(n)(s"u${rng.nextInt(100)}"), r)
    val df = cases.toDF("urls", "rule")
      .select(col("urls"), ColumnOps.layFlatPick(col("urls"), col("rule")).as("picked"))
    val rows = df.as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (urls, picked) =>
      assert(picked.size <= 2, s"$urls -> $picked")
      assert(picked.forall(urls.contains), s"$urls -> $picked")
    }
  }

  test("E6: stored indices are 0-based positions in the full list") {
    val r = Seq((Seq("c", "a"), Seq("a", "b", "c")))
      .toDF("kept", "all")
      .select(ColumnOps.storedIndices(col("kept"), col("all")))
      .as[Seq[Int]].head()
    assert(r == Seq(2, 0))
  }

  test("E7: case-insensitive order-preserving dedup keeps first casing") {
    val r = Seq(Tuple1(Seq("White", "white", "BEIGE", "Beige", "navy")))
      .toDF("colors")
      .select(ColumnOps.dedupCaseInsensitive(col("colors")))
      .as[Seq[String]].head()
    assert(r == Seq("White", "BEIGE", "navy"))
  }

  test("E9: composition flatten, shoes keep UPPER part only") {
    val comp =
      """{"parts": [
           {"name": "UPPER", "areas": [{"name": "MAIN", "components":
             [{"material": "leather", "percentage": "100%"}]}]},
           {"name": "LINING", "areas": [{"name": "MAIN", "components":
             [{"material": "textile", "percentage": "80%"},
              {"material": "synthetic", "percentage": "20%"}]}]}]}"""
    val schema = graft.sources.ProductSources.rawProductSchema("composition_structured").dataType
    val df = Seq(Tuple1(comp)).toDF("j")
      .select(from_json(col("j"), schema).as("c"))
    val all = df.select(ColumnOps.flattenComposition(col("c"), lit(false)))
      .as[Seq[String]].head()
    assert(all == Seq("100% leather", "80% textile", "20% synthetic"))
    val shoes = df.select(ColumnOps.flattenComposition(col("c"), lit(true)))
      .as[Seq[String]].head()
    assert(shoes == Seq("100% leather"))
  }

  test("X12: embedding text builder segments and truncation") {
    val r = Seq(("Linen Shirt", "shirts", "x" * 600, Seq("White"), Seq("minimal"), 30.0))
      .toDF("n", "c", "d", "col", "st", "p")
      .select(ColumnOps.embeddingText(col("n"), col("c"), col("d"),
        col("col"), col("st"), col("p"))).as[String].head()
    assert(r.startsWith("Linen Shirt | Category: shirts | xxx"))
    assert(r.contains(" | Colors: White | Style: minimal | budget-friendly affordable"))
    assert(!r.contains("x" * 501)) // description truncated at 500
  }

  test("X17: removed tags parsed back from summary") {
    val r = Seq("Added: a; Removed: style_identity:x, context:y; Modified: f: a → b")
      .toDF("s")
      .select(ColumnOps.parseRemovedFromSummary(col("s"))).as[Seq[String]].head()
    assert(r == Seq("style_identity:x", "context:y"))
    assert(Seq("Added: a").toDF("s")
      .select(ColumnOps.parseRemovedFromSummary(col("s"))).as[Seq[String]].head().isEmpty)
  }

  test("X13: storage URL builder; BPE-ish tokenizer splits on boundaries") {
    val url = Seq(("https://x.supabase.co", "products", "shirts/p1/0.jpg"))
      .toDF("b", "bk", "p")
      .select(ColumnOps.storageUrl(col("b"), col("bk"), col("p"))).as[String].head()
    assert(url == "https://x.supabase.co/storage/v1/object/public/products/shirts/p1/0.jpg")
    val toks = Seq("don't re-tag v2!").toDF("t")
      .select(graft.functions.TextAnalysis.bpeishTokens(col("t"))).as[Seq[String]].head()
    assert(toks == Seq("don", "'", "t", "re", "-", "tag", "v2", "!"))
  }

  test("E3: sizes to struct array") {
    val r = Seq(Tuple1(Seq("S", "M"))).toDF("sizes")
      .select(to_json(ColumnOps.sizesToStructArray(col("sizes")))).as[String].head()
    assert(r == """[{"size":"S","available":true},{"size":"M","available":true}]""")
  }

  test("T3: freshness scores are monotone and bounded") {
    val r = Seq((0, 30), (30, 30), (300, 30)).toDF("age", "tau")
      .select(graft.ops.ColumnOps.freshnessScore(col("age"), col("tau")))
      .as[Double].collect()
    assert(r(0) == 1.0 && r(1) == 0.5 && r(2) < 0.1)
  }

  test("P10/E8/X24: vocabulary merge, validation, fallback, augment") {
    val merged = VocabularyOps.mergeVocabularies(
      Map("style" -> Seq("minimal", "classic")),
      Map("style" -> Seq("classic", "custom-core"), "new" -> Seq("x")))
    assert(merged("style") == Seq("minimal", "classic", "custom-core"))
    assert(merged("new") == Seq("x"))

    val valid = Seq(Tuple1(Seq("minimal", "gizmo", "core", "junk")))
      .toDF("cands")
      .select(VocabularyOps.validateTags(col("cands"), Seq("minimal", "custom-core")))
      .as[Seq[String]].head()
    assert(valid == Seq("minimal", "core")) // "core" ⊂ "custom-core"

    val fb = Seq("Rugged Cargo Pant").toDF("n")
      .select(VocabularyOps.fallbackTagsFromName(col("n"),
        Seq("cargo" -> "utilitarian", "rugged" -> "rugged", "silk" -> "elegant")))
      .as[Seq[String]].head()
    assert(fb == Seq("utilitarian", "rugged"))

    val aug = Seq(Tuple1(Seq("a"))).toDF("t")
      .select(VocabularyOps.augmentToMin(col("t"), typedlit(Seq("a", "b", "c")), 2))
      .as[Seq[String]].head()
    assert(aug == Seq("a", "b"))
  }
}
