package graft.policy

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import graft.model.{AiTagOutput, TagWithConfidence}
import graft.vocab.{Vocabularies => V}

/** P2 — parse + validate a raw LLM tagging response
  * (refitd_tagger.py:1144-1281 `parse_ai_response`): JSON block extraction,
  * per-field vocabulary filtering, category-aware field sets (footwear vs
  * bottom vs upper), list truncation (style 2, context 2, details 2,
  * pairing 3 — truncation happens BEFORE vocab filtering, as in the
  * reference), confidence clamping with 0.5 parse-failure default, optional
  * reasoning passthrough. Pure; None when nothing validates.
  *
  * Internals run on the Jackson tree directly (one materialization — this
  * is the hot kernel of the P2∘P1 map stage; the earlier json4s AST +
  * `.values` round-trip double-materialized every response and dominated
  * q44's runtime). Semantics are pinned by the 800-case reference-Python
  * golden fixture.
  */
object AiResponseParser {

  /** Thread-safe for reads; FAIL_ON_TRAILING_TOKENS keeps the strictness
    * of the previous parser (trailing garbage after the object → None). */
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.enable(DeserializationFeature.FAIL_ON_TRAILING_TOKENS)
    m
  }

  /** X14 (refitd_tagger.py:1124-1130). */
  def clampConfidence(v: Any): Double = v match {
    case null => 0.5
    case b: Boolean => if (b) 1.0 else 0.0 // Python float(bool)
    case d: Double => math.max(0.0, math.min(1.0, d))
    case i: Int => math.max(0.0, math.min(1.0, i.toDouble))
    case l: Long => math.max(0.0, math.min(1.0, l.toDouble))
    case b: BigInt => math.max(0.0, math.min(1.0, b.toDouble))
    case b: BigDecimal => math.max(0.0, math.min(1.0, b.toDouble))
    case s: String =>
      try math.max(0.0, math.min(1.0, s.trim.toDouble))
      catch { case _: NumberFormatException => 0.5 }
    case _ => 0.5
  }

  private def clampNode(n: JsonNode): Double =
    if (n == null || n.isNull) 0.5
    else if (n.isBoolean) { if (n.asBoolean) 1.0 else 0.0 }
    else if (n.isNumber) math.max(0.0, math.min(1.0, n.asDouble))
    else if (n.isTextual)
      try math.max(0.0, math.min(1.0, n.asText.trim.toDouble))
      catch { case _: NumberFormatException => 0.5 }
    else 0.5

  /** The scala-value string rendering the previous AST-based parser used
    * (JString→raw text, numbers/booleans→literal form). */
  private def nodeText(n: JsonNode): String =
    if (n.isTextual) n.asText else n.toString

  /** refitd_tagger.py:1133-1141 `_tag_entry`. */
  private def tagEntry(item: JsonNode): TagWithConfidence = {
    val reasoning = item.get("reasoning") match {
      case r if r != null && !r.isNull && nodeText(r).trim.nonEmpty =>
        Some(nodeText(r).trim)
      case _ => None
    }
    TagWithConfidence(
      tag = nodeText(item.get("tag")),
      confidence = clampNode(item.get("confidence")),
      reasoning = reasoning)
  }

  /** Scalar field: keep iff dict-shaped and tag in vocab. */
  private def scalarField(data: JsonNode, key: String,
                          vocab: Set[String]): Option[TagWithConfidence] = {
    val n = data.get(key)
    if (n != null && n.isObject) {
      val t = n.get("tag")
      if (t != null && !t.isNull && vocab(nodeText(t))) Some(tagEntry(n)) else None
    } else None
  }

  /** List field: truncate to `max` FIRST, then vocab-filter (reference
    * order, refitd_tagger.py:1216-1218 etc.). */
  private def listField(data: JsonNode, key: String,
                        vocab: Set[String], max: Int): Seq[TagWithConfidence] = {
    val n = data.get(key)
    if (n == null || !n.isArray) Nil
    else {
      val out = Seq.newBuilder[TagWithConfidence]
      var i = 0
      val limit = math.min(max, n.size)
      while (i < limit) {
        val item = n.get(i)
        if (item.isObject) {
          val t = item.get("tag")
          if (t != null && !t.isNull && vocab(nodeText(t))) out += tagEntry(item)
        }
        i += 1
      }
      out.result()
    }
  }

  /** Parse a raw response. `category` steers field sets exactly as the
    * reference does ("footwear" vs "bottom" vs everything-else=upper). */
  def parse(response: String, category: String): Option[AiTagOutput] = {
    // X15: first {...} block — greedy first-'{' to last-'}', exactly what
    // the reference's regex matches (refitd_tagger.py:1155)
    val start = response.indexOf('{')
    val end = response.lastIndexOf('}')
    if (start < 0 || end < start) return None
    val data: JsonNode =
      try {
        val root = mapper.readTree(response.substring(start, end + 1))
        if (root == null || !root.isObject) return None
        root
      } catch { case _: Exception => return None }

    val style = listField(data, "style_identity", V.StyleIdentity, 2)

    var out = AiTagOutput(category = Some(category), styleIdentity = style)

    if (category == "footwear") {
      out = out.copy(
        shoeType = scalarField(data, "shoe_type", V.ShoeType),
        profile = scalarField(data, "profile", V.ShoeProfile),
        closure = scalarField(data, "closure", V.ShoeClosure))
    } else {
      val fits = if (category == "bottom") V.FitBottom else V.FitUpper
      val sils = if (category == "bottom") V.SilhouetteBottom else V.SilhouetteUpper
      val details = if (category == "bottom") V.DetailsBottom else V.DetailsUpper
      out = out.copy(
        fit = scalarField(data, "fit", fits),
        silhouette = scalarField(data, "silhouette", sils),
        length = scalarField(data, "length", V.Length),
        constructionDetails = listField(data, "construction_details", details, 2))
    }

    out = out.copy(
      formality = scalarField(data, "formality", V.Formality),
      context = listField(data, "context", V.Context, 2),
      pattern = scalarField(data, "pattern", V.Pattern),
      pairingTags = listField(data, "pairing_tags", V.Pairing, 3))

    if (out.isEmpty) None else Some(out)
  }
}
