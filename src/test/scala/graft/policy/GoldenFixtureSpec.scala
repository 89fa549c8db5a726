package graft.policy

import graft.model._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

/** Golden cross-validation of the P1/P2 ports against the ACTUAL reference
  * Python: `tools/gen_tag_policy_golden.py` runs randomized inputs (every
  * category branch, threshold boundaries at each PolicyThresholds field,
  * illegal/cross-category tags, confidence-shape quirks, JSON wrapping
  * quirks) through `/root/reference/src/ai/tag_policy.py` and
  * `refitd_tagger.py`, pinning outputs in src/test/resources/golden/.
  *
  * These specs replay all 2,800 cases through the Scala ports and assert
  * byte-level JSON equality (key-order/number-width normalized) — any
  * semantic drift from tag_policy.py:557-976 or refitd_tagger.py:1144-1281
  * fails here with the offending case.
  */
trait GoldenFixtures {

  def loadJsonl(resource: String): Seq[JValue] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"missing fixture $resource — run tools/gen_tag_policy_golden.py")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map(JsonMethods.parse(_)).toList
    finally src.close()
  }

  /** Order-insensitive object keys, uniform JDouble numbers. */
  def norm(j: JValue): JValue = j match {
    case JObject(fields) =>
      JObject(fields.filterNot(_._2 == JNothing)
        .map { case (k, v) => (k, norm(v)) }.sortBy(_._1))
    case JArray(items) => JArray(items.map(norm))
    case JInt(i) => JDouble(i.toDouble)
    case JLong(l) => JDouble(l.toDouble)
    case JDecimal(d) => JDouble(d.toDouble)
    case other => other
  }

  def optStr(j: JValue): Option[String] =
    j match { case JString(s) => Some(s); case _ => None }

  def numDouble(j: JValue): Double = j match {
    case JDouble(d) => d
    case JInt(i) => i.toDouble
    case JLong(l) => l.toDouble
    case JDecimal(d) => d.toDouble
    case other => sys.error(s"non-numeric confidence $other")
  }

  def twcFrom(j: JValue): TagWithConfidence = TagWithConfidence(
    tag = (j \ "tag").values.toString,
    confidence = numDouble(j \ "confidence"),
    reasoning = optStr(j \ "reasoning"))

  def twcList(j: JValue): Seq[TagWithConfidence] =
    j match { case JArray(items) => items.map(twcFrom); case _ => Nil }

  def twcOpt(j: JValue): Option[TagWithConfidence] =
    j match { case o: JObject => Some(twcFrom(o)); case _ => None }

  def aiTagOutputFrom(raw: JValue): AiTagOutput = AiTagOutput(
    category = optStr(raw \ "category"),
    styleIdentity = twcList(raw \ "style_identity"),
    fit = twcOpt(raw \ "fit"),
    silhouette = twcOpt(raw \ "silhouette"),
    length = twcOpt(raw \ "length"),
    formality = twcOpt(raw \ "formality"),
    context = twcList(raw \ "context"),
    constructionDetails = twcList(raw \ "construction_details"),
    pattern = twcOpt(raw \ "pattern"),
    pairingTags = twcList(raw \ "pairing_tags"),
    shoeType = twcOpt(raw \ "shoe_type"),
    profile = twcOpt(raw \ "profile"),
    closure = twcOpt(raw \ "closure"))

  def twcJ(t: TagWithConfidence): JValue = JObject(
    List("tag" -> JString(t.tag), "confidence" -> JDouble(t.confidence)) ++
      t.reasoning.map(r => "reasoning" -> JString(r)).toList: _*)

  /** CanonicalTags rendered per the reference to_dict
    * (tag_policy.py:398-435: truthy fields only). */
  def canonicalJ(c: CanonicalTags): JValue = {
    val b = List.newBuilder[(String, JValue)]
    b += "category" -> JString(c.category)
    if (c.styleIdentity.nonEmpty)
      b += "style_identity" -> JArray(c.styleIdentity.map(JString(_)).toList)
    c.fit.foreach(v => b += "fit" -> JString(v))
    c.silhouette.foreach(v => b += "silhouette" -> JString(v))
    c.length.foreach(v => b += "length" -> JString(v))
    if (c.context.nonEmpty)
      b += "context" -> JArray(c.context.map(JString(_)).toList)
    if (c.constructionDetails.nonEmpty)
      b += "construction_details" -> JArray(c.constructionDetails.map(JString(_)).toList)
    c.pattern.foreach(v => b += "pattern" -> JString(v))
    if (c.pairingTags.nonEmpty)
      b += "pairing_tags" -> JArray(c.pairingTags.map(JString(_)).toList)
    c.formality.foreach(v => b += "formality" -> JString(v))
    c.topLayerRole.foreach(v => b += "top_layer_role" -> JString(v))
    c.shoeType.foreach(v => b += "shoe_type" -> JString(v))
    c.profile.foreach(v => b += "profile" -> JString(v))
    c.closure.foreach(v => b += "closure" -> JString(v))
    JObject(b.result(): _*)
  }

  /** PolicyResult rendered per the reference to_dict (tag_policy.py:449+). */
  def policyResultJ(r: PolicyResult): JValue = JObject(
    "tags_final" -> canonicalJ(r.tagsFinal),
    "curation_status" -> JString(r.curationStatus),
    "curation_reasons" -> JArray(r.curationReasons.map(JString(_)).toList),
    "suppressed_tags" -> JArray(r.suppressedTags.map(s => JObject(
      "field" -> JString(s.field), "tag" -> JString(s.tag),
      "confidence" -> JDouble(s.confidence),
      "reason" -> JString(s.reason))).toList),
    "defaults_applied" -> JArray(r.defaultsApplied.map(d => JObject(
      "field" -> JString(d.field), "value" -> JString(d.value),
      "reason" -> JString(d.reason))).toList),
    "tag_policy_version" -> JString(r.tagPolicyVersion))

  /** Parsed AiTagOutput rendered per parse_ai_response's result dict
    * (refitd_tagger.py:1167-1270: keys present only when validated; no
    * category key). */
  def parsedJ(o: AiTagOutput): JValue = {
    val b = List.newBuilder[(String, JValue)]
    if (o.styleIdentity.nonEmpty)
      b += "style_identity" -> JArray(o.styleIdentity.map(twcJ).toList)
    o.shoeType.foreach(v => b += "shoe_type" -> twcJ(v))
    o.profile.foreach(v => b += "profile" -> twcJ(v))
    o.closure.foreach(v => b += "closure" -> twcJ(v))
    o.fit.foreach(v => b += "fit" -> twcJ(v))
    o.silhouette.foreach(v => b += "silhouette" -> twcJ(v))
    o.length.foreach(v => b += "length" -> twcJ(v))
    if (o.constructionDetails.nonEmpty)
      b += "construction_details" -> JArray(o.constructionDetails.map(twcJ).toList)
    o.formality.foreach(v => b += "formality" -> twcJ(v))
    if (o.context.nonEmpty)
      b += "context" -> JArray(o.context.map(twcJ).toList)
    o.pattern.foreach(v => b += "pattern" -> twcJ(v))
    if (o.pairingTags.nonEmpty)
      b += "pairing_tags" -> JArray(o.pairingTags.map(twcJ).toList)
    JObject(b.result(): _*)
  }
}

class TagPolicyGoldenSpec extends AnyFunSuite with GoldenFixtures {

  test("2000 randomized reference-Python cases match apply_tag_policy byte-for-byte") {
    val cases = loadJsonl("/golden/tag_policy_golden.jsonl")
    assert(cases.size == 2000)
    var failures = 0
    cases.zipWithIndex.foreach { case (c, i) =>
      val input = aiTagOutputFrom(c \ "tags_ai_raw")
      val result = TagPolicy(
        input,
        category = optStr(c \ "category"),
        productName = optStr(c \ "product_name"),
        subcategory = optStr(c \ "subcategory"))
      val got = norm(policyResultJ(result))
      val want = norm(c \ "expected")
      if (got != want) {
        failures += 1
        if (failures <= 3)
          info(s"case $i mismatch:\n  got  ${JsonMethods.compact(got)}\n  want ${JsonMethods.compact(want)}\n  in   ${JsonMethods.compact(c \ "tags_ai_raw")}")
      }
    }
    assert(failures == 0, s"$failures / ${cases.size} golden P1 cases diverge from the reference Python")
  }
}

class AiResponseParserGoldenSpec extends AnyFunSuite with GoldenFixtures {

  test("800 randomized reference-Python cases match parse_ai_response byte-for-byte") {
    val cases = loadJsonl("/golden/ai_parse_golden.jsonl")
    assert(cases.size == 800)
    var failures = 0
    cases.zipWithIndex.foreach { case (c, i) =>
      val response = (c \ "response").values.toString
      val category = (c \ "category").values.toString
      val got = AiResponseParser.parse(response, category) match {
        case Some(o) => norm(parsedJ(o))
        case None => JNull
      }
      val want = (c \ "expected") match {
        case JNull | JNothing => JNull
        case other => norm(other)
      }
      if (got != want) {
        failures += 1
        if (failures <= 3)
          info(s"case $i mismatch:\n  got  ${JsonMethods.compact(got)}\n  want ${JsonMethods.compact(want)}\n  resp $response")
      }
    }
    assert(failures == 0, s"$failures / ${cases.size} golden P2 cases diverge from the reference Python")
  }
}
