package graft.policy

import graft.model.{AiTagOutput, TagWithConfidence}
import graft.vocab.{Vocabularies => V}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** P2 — parse + validate a raw LLM tagging response
  * (refitd_tagger.py:1144-1281 `parse_ai_response`): JSON block extraction,
  * per-field vocabulary filtering, category-aware field sets (footwear vs
  * bottom vs upper), list truncation (style 2, context 2, details 2,
  * pairing 3 — truncation happens BEFORE vocab filtering, as in the
  * reference), confidence clamping with 0.5 parse-failure default, optional
  * reasoning passthrough. Pure; None when nothing validates.
  */
object AiResponseParser {

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

  /** refitd_tagger.py:1133-1141 `_tag_entry`. */
  private def tagEntry(item: Map[String, Any]): TagWithConfidence = {
    val reasoning = item.get("reasoning") match {
      case Some(r) if r != null && r.toString.trim.nonEmpty => Some(r.toString.trim)
      case _ => None
    }
    TagWithConfidence(
      tag = item("tag").toString,
      confidence = clampConfidence(item.getOrElse("confidence", 0.5).asInstanceOf[Any]),
      reasoning = reasoning)
  }

  private def asMap(v: Any): Option[Map[String, Any]] = v match {
    case m: Map[_, _] => Some(m.asInstanceOf[Map[String, Any]])
    case _ => None
  }

  private def asList(v: Any): Seq[Any] = v match {
    case l: Seq[_] => l
    case _ => Nil
  }

  /** Scalar field: keep iff dict-shaped and tag in vocab. */
  private def scalarField(data: Map[String, Any], key: String,
                          vocab: Set[String]): Option[TagWithConfidence] =
    data.get(key).flatMap(asMap).filter(m =>
      m.get("tag").exists(t => t != null && vocab(t.toString))).map(tagEntry)

  /** List field: truncate to `max` FIRST, then vocab-filter (reference
    * order, refitd_tagger.py:1216-1218 etc.). */
  private def listField(data: Map[String, Any], key: String,
                        vocab: Set[String], max: Int): Seq[TagWithConfidence] =
    data.get(key).map(asList).getOrElse(Nil).take(max)
      .flatMap(asMap)
      .filter(m => m.get("tag").exists(t => t != null && vocab(t.toString)))
      .map(tagEntry)

  /** Parse a raw response. `category` steers field sets exactly as the
    * reference does ("footwear" vs "bottom" vs everything-else=upper). */
  def parse(response: String, category: String): Option[AiTagOutput] = {
    // X15: first {...} block (greedy, refitd_tagger.py:1155)
    val m = "\\{[\\s\\S]*\\}".r.findFirstIn(response)
    if (m.isEmpty) return None
    val data: Map[String, Any] =
      try JsonMethods.parse(m.get).values match {
        case mp: Map[_, _] => mp.asInstanceOf[Map[String, Any]]
        case _ => return None
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
