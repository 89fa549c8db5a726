package graft.policy

import org.scalatest.funsuite.AnyFunSuite

/** P2 — parse_ai_response semantics (refitd_tagger.py:1144-1281). */
class AiResponseParserSpec extends AnyFunSuite {

  private val validBottom =
    """Here are the tags you asked for:
      |```json
      |{
      |  "style_identity": [
      |    {"tag": "workwear", "confidence": 0.77, "reasoning": "heritage cues"},
      |    {"tag": "rugged", "confidence": 0.65},
      |    {"tag": "classic", "confidence": 0.99}
      |  ],
      |  "fit": {"tag": "slim", "confidence": 0.8},
      |  "silhouette": {"tag": "straight", "confidence": 0.86},
      |  "length": {"tag": "regular", "confidence": 0.75},
      |  "formality": {"tag": "casual", "confidence": 0.9},
      |  "context": [{"tag": "everyday", "confidence": 0.82}],
      |  "construction_details": [{"tag": "flat-front", "confidence": 0.74}],
      |  "pattern": {"tag": "solid", "confidence": 0.85},
      |  "pairing_tags": [
      |    {"tag": "neutral-base", "confidence": 0.72},
      |    {"tag": "bogus-tag", "confidence": 0.99},
      |    {"tag": "easy-dress-down", "confidence": 0.68},
      |    {"tag": "high-versatility", "confidence": 0.95}
      |  ]
      |}
      |```""".stripMargin

  test("full parse: JSON block extracted from prose, fields validated") {
    val out = AiResponseParser.parse(validBottom, "bottom").get
    // truncate-to-2 happens BEFORE vocab filter: classic (3rd) is dropped
    assert(out.styleIdentity.map(_.tag) == Seq("workwear", "rugged"))
    assert(out.styleIdentity.head.reasoning.contains("heritage cues"))
    assert(out.fit.map(_.tag).contains("slim"))
    assert(out.silhouette.map(_.tag).contains("straight"))
    assert(out.length.map(_.tag).contains("regular"))
    assert(out.formality.map(_.tag).contains("casual"))
    assert(out.context.map(_.tag) == Seq("everyday"))
    assert(out.constructionDetails.map(_.tag) == Seq("flat-front"))
    assert(out.pattern.map(_.tag).contains("solid"))
    // pairing: take(3) first → [neutral-base, bogus, easy-dress-down],
    // then vocab filter drops bogus; high-versatility never considered
    assert(out.pairingTags.map(_.tag) == Seq("neutral-base", "easy-dress-down"))
    assert(out.shoeType.isEmpty)
  }

  test("category steers field sets: bottom rejects upper-only fit") {
    val json = """{"fit": {"tag": "oversized", "confidence": 0.9},
                   "formality": {"tag": "casual", "confidence": 0.9}}"""
    val out = AiResponseParser.parse(json, "bottom").get
    assert(out.fit.isEmpty) // oversized not in FIT_TAGS_BOTTOM
    val outTop = AiResponseParser.parse(json, "top").get
    assert(outTop.fit.map(_.tag).contains("oversized"))
  }

  test("footwear path: shoe fields only, apparel fields ignored") {
    val json =
      """{"shoe_type": {"tag": "sneakers", "confidence": 0.9},
         "profile": {"tag": "chunky", "confidence": 0.8},
         "closure": {"tag": "lace-up", "confidence": 0.7},
         "fit": {"tag": "slim", "confidence": 0.9}}"""
    val out = AiResponseParser.parse(json, "footwear").get
    assert(out.shoeType.map(_.tag).contains("sneakers"))
    assert(out.profile.map(_.tag).contains("chunky"))
    assert(out.closure.map(_.tag).contains("lace-up"))
    assert(out.fit.isEmpty)
  }

  test("confidence clamping (refitd_tagger.py:1124-1130)") {
    assert(AiResponseParser.clampConfidence(1.5) == 1.0)
    assert(AiResponseParser.clampConfidence(-0.3) == 0.0)
    assert(AiResponseParser.clampConfidence("0.75") == 0.75)
    assert(AiResponseParser.clampConfidence("not-a-number") == 0.5)
    assert(AiResponseParser.clampConfidence(null) == 0.5)
    val out = AiResponseParser.parse(
      """{"formality": {"tag": "casual", "confidence": 7}}""", "top").get
    assert(out.formality.map(_.confidence).contains(1.0))
    val out2 = AiResponseParser.parse(
      """{"formality": {"tag": "casual"}}""", "top").get
    assert(out2.formality.map(_.confidence).contains(0.5)) // default
  }

  test("no JSON or nothing valid → None") {
    assert(AiResponseParser.parse("I could not tag this product.", "top").isEmpty)
    assert(AiResponseParser.parse("{}", "top").isEmpty)
    assert(AiResponseParser.parse(
      """{"style_identity": [{"tag": "not-real", "confidence": 0.9}]}""",
      "top").isEmpty)
    assert(AiResponseParser.parse("{broken json", "top").isEmpty)
  }

  test("blank reasoning is dropped") {
    val out = AiResponseParser.parse(
      """{"formality": {"tag": "casual", "confidence": 0.9, "reasoning": "  "}}""",
      "top").get
    assert(out.formality.get.reasoning.isEmpty)
  }
}
