package graft.export

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** P5 — training-data export (export_training_data.py:99-140 build_example
  * + scripts main): curation records → OpenAI fine-tune JSONL, three
  * messages per line (system + CURATOR FEEDBACK, user product JSON,
  * assistant corrected-tags JSON), plus the A13 token/cost estimate.
  *
  * Implemented as a typed Dataset.map over pure string builders — the whole
  * export is one distributed projection followed by a text write (S9).
  */
object TrainingExport {

  val CharsPerTokenEstimate = 4
  val CostPerMTokensGpt4o = 25.0

  /** X19 (export_training_data.py:35-37). */
  def estimateTokens(text: String): Long = math.max(1L, text.length / CharsPerTokenEstimate)

  private def jStr(s: String): String = JsonMethods.compact(JString(s))

  /** Python json.dumps(obj, indent=2) lookalike for a flat string map —
    * byte-compatible for the 4-key user-content object
    * (export_training_data.py:103-121). */
  def pythonStyleJson(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"""  ${jStr(k)}: ${jStr(v)}""" }
      .mkString("{\n", ",\n", "\n}")

  /** X18 (export_training_data.py:40-96 `_format_curator_feedback`):
    * bulleted CURATOR FEEDBACK section from deleted/added/modified maps
    * inside corrected tags. Input is parsed JSON (tolerant shapes). */
  def formatCuratorFeedback(tagsFinal: Map[String, Any]): String = {
    val lines = scala.collection.mutable.ListBuffer.empty[String]

    def entries(v: Any): Seq[Any] = v match {
      case null | None => Nil
      case l: Seq[_] => l
      case other => Seq(other)
    }
    def mapOf(v: Any): Map[String, Any] = v match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty
    }
    def valueOf(m: Map[String, Any]): Option[String] =
      m.get("value").orElse(m.get("tag")).filter(_ != null).map(_.toString)
    def reasonOf(m: Map[String, Any]): String =
      m.get("reason").filter(_ != null).map(_.toString.trim).getOrElse("")

    mapOf(tagsFinal.getOrElse("deleted_tags", null)).foreach { case (field, v) =>
      entries(v).foreach {
        case m: Map[_, _] =>
          val mm = m.asInstanceOf[Map[String, Any]]
          valueOf(mm).foreach { value =>
            val r = reasonOf(mm)
            lines += (s"- Removed '$value' from $field" + (if (r.nonEmpty) s": $r" else ""))
          }
        case s: String => lines += s"- Removed '$s' from $field"
        case _ => ()
      }
    }
    mapOf(tagsFinal.getOrElse("added_tags", null)).foreach { case (field, v) =>
      entries(v).foreach {
        case m: Map[_, _] =>
          val mm = m.asInstanceOf[Map[String, Any]]
          valueOf(mm).foreach { value =>
            val r = reasonOf(mm)
            lines += (s"- Added '$value' to $field" + (if (r.nonEmpty) s": $r" else ""))
          }
        case s: String => lines += s"- Added '$s' to $field"
        case _ => ()
      }
    }
    mapOf(tagsFinal.getOrElse("modified_tags", null)).foreach { case (field, v) =>
      val mm = mapOf(v)
      (mm.get("from"), mm.get("to")) match {
        case (Some(f), Some(t)) if f != null && t != null =>
          val r = reasonOf(mm)
          lines += (s"- Changed $field from '$f' to '$t'" + (if (r.nonEmpty) s": $r" else ""))
        case _ => ()
      }
    }

    if (lines.isEmpty) "" else "CURATOR FEEDBACK\n" + lines.mkString("\n")
  }

  /** Build-user-content (export_training_data.py:103-121): title/category/
    * description/brand coalesce chain as indent-2 JSON. */
  def buildUserContent(productName: Option[String], category: Option[String],
                       description: Option[String], brand: Option[String]): String =
    pythonStyleJson(Seq(
      "title" -> productName.filter(_.nonEmpty).getOrElse("Unknown"),
      "category" -> category.filter(_.nonEmpty).getOrElse("Unknown"),
      "description" -> description.getOrElse(""),
      "brand" -> brand.filter(_.nonEmpty).getOrElse("Unknown")))

  /** One JSONL line (build_example, export_training_data.py:122-140). */
  def buildExampleJson(systemPrompt: String, correctedTagsJson: String,
                       productName: Option[String], category: Option[String],
                       description: Option[String], brand: Option[String]): String = {
    val corrected: Map[String, Any] =
      try JsonMethods.parse(correctedTagsJson).values match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ => Map.empty
      } catch { case _: Exception => Map.empty }
    val feedback = formatCuratorFeedback(corrected)
    val system = if (feedback.nonEmpty) systemPrompt + "\n\n" + feedback else systemPrompt
    val user = buildUserContent(productName, category, description, brand)
    val assistant = JsonMethods.pretty(JsonMethods.parse(
      if (corrected.isEmpty) "{}" else correctedTagsJson))
    JsonMethods.compact(JObject(
      "messages" -> JArray(List(
        JObject("role" -> JString("system"), "content" -> JString(system)),
        JObject("role" -> JString("user"), "content" -> JString(user)),
        JObject("role" -> JString("assistant"), "content" -> JString(assistant))))))
  }

  /** The export query (SURVEY §3.3): curation records (already joined with
    * products and filtered) → Dataset[String] of JSONL lines. Expects
    * columns: corrected_tags (JSON string), product_name, category,
    * description, brand_name. */
  def toJsonl(records: DataFrame, systemPrompt: String): Dataset[String] = {
    import records.sparkSession.implicits._
    records.select(
      col("corrected_tags").cast("string"),
      col("product_name").cast("string"),
      col("category").cast("string"),
      col("description").cast("string"),
      col("brand_name").cast("string"))
      .as[(String, String, String, String, String)]
      .map { case (tags, name, cat, desc, brand) =>
        buildExampleJson(systemPrompt, Option(tags).getOrElse("{}"),
          Option(name), Option(cat), Option(desc), Option(brand))
      }
  }

  /** A13 — token/cost estimate over exported lines. */
  def exportStats(lines: Dataset[String]): DataFrame = {
    import lines.sparkSession.implicits._
    lines.map(l => (1L, estimateTokens(l))).toDF("n", "tokens")
      .agg(sum("n").as("n_examples"), sum("tokens").as("est_tokens"))
      .withColumn("est_cost_usd",
        col("est_tokens").cast("double") / 1e6 * CostPerMTokensGpt4o)
  }

  /** A13 with the reference's per-category distribution
    * (export_training_data.py:206-232): token estimate over each record's
    * real JSONL line, rolled up per category with the GPT-4o cost
    * arithmetic; a missing/empty category falls back to "unknown" exactly
    * like the reference's `record.get("category") or "unknown"`. */
  def exportStatsByCategory(records: DataFrame, systemPrompt: String): DataFrame = {
    import records.sparkSession.implicits._
    records.select(
      col("corrected_tags").cast("string"),
      col("product_name").cast("string"),
      col("category").cast("string"),
      col("description").cast("string"),
      col("brand_name").cast("string"))
      .as[(String, String, String, String, String)]
      .map { case (tags, name, cat, desc, brand) =>
        val line = buildExampleJson(systemPrompt, Option(tags).getOrElse("{}"),
          Option(name), Option(cat), Option(desc), Option(brand))
        (Option(cat).filter(_.nonEmpty).getOrElse("unknown"), estimateTokens(line))
      }
      .toDF("category", "tokens")
      .groupBy("category")
      .agg(count(lit(1)).as("n_examples"), sum("tokens").as("est_tokens"))
      .withColumn("est_cost_usd",
        col("est_tokens").cast("double") / 1e6 * CostPerMTokensGpt4o)
      .orderBy(col("category"))
  }
}
