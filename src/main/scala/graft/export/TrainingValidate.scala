package graft.export

import org.apache.spark.sql.{DataFrame, Dataset}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** P6 — training-JSONL validation (validate_training_data.py:22-126):
  * structural checks (3 messages, role order, JSON-parseable user/assistant)
  * and required-tag checks (apparel {style_identity, fit, formality, length}
  * vs footwear {shoe_type, profile, formality}), with warnings for missing
  * recommended optionals. Pure per-line function + Dataset wrapper.
  */
object TrainingValidate {

  val FootwearKeywords: Set[String] = Set("shoe", "shoes", "boot", "boots", "footwear")
  val RequiredApparel: Seq[String] = Seq("style_identity", "fit", "formality", "length")
  val RequiredFootwear: Seq[String] = Seq("shoe_type", "profile", "formality")
  val RecommendedOptional: Seq[String] = Seq("context", "pairing_tags")

  final case class ValidationResult(line_num: Long, errors: Seq[String], warnings: Seq[String])

  def isFootwearCategory(category: String): Boolean = {
    val c = Option(category).getOrElse("").toLowerCase
    c.nonEmpty && FootwearKeywords.exists(c.contains)
  }

  /** validate_example (validate_training_data.py:40-126). */
  def validateExample(line: String, lineNum: Long): ValidationResult = {
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val warnings = scala.collection.mutable.ListBuffer.empty[String]
    def fail() = ValidationResult(lineNum, errors.toList, warnings.toList)

    val parsed: Map[String, Any] =
      try JsonMethods.parse(line).values match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ => errors += s"Line $lineNum: example must be a JSON object"; return fail()
      } catch {
        case e: Exception =>
          errors += s"Line $lineNum: invalid JSON: ${e.getMessage}"
          return fail()
      }

    val messages = parsed.get("messages") match {
      case None => errors += s"Line $lineNum: Missing 'messages' key"; return fail()
      case Some(l: Seq[_]) => l
      case Some(_) => errors += s"Line $lineNum: 'messages' must be an array"; return fail()
    }
    if (messages.size != 3) {
      errors += s"Line $lineNum: Expected 3 messages, got ${messages.size}"
      return fail()
    }
    val msgs = messages.map {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty[String, Any]
    }
    val roles = msgs.flatMap(_.get("role").map(_.toString))
    if (roles != Seq("system", "user", "assistant")) {
      errors += s"Line $lineNum: Invalid roles ${roles.mkString("[", ", ", "]")}; " +
        "expected [system, user, assistant]"
      return fail()
    }
    msgs.zipWithIndex.find { case (m, _) => !m.contains("content") } match {
      case Some((_, i)) =>
        errors += s"Line $lineNum: Message ${i + 1} missing 'content'"
        return fail()
      case None => ()
    }

    val userContent = msgs(1).getOrElse("content", "").toString
    val assistantContent = msgs(2).getOrElse("content", "").toString

    val userData: Map[String, Any] =
      try JsonMethods.parse(userContent).values match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ => Map.empty
      } catch {
        case e: Exception =>
          errors += s"Line $lineNum: User content is not valid JSON: ${e.getMessage}"
          Map.empty
      }

    val tags: Map[String, Any] =
      try JsonMethods.parse(assistantContent).values match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ =>
          errors += s"Line $lineNum: Tags must be a JSON object"
          return fail()
      } catch {
        case e: Exception =>
          errors += s"Line $lineNum: Assistant content is not valid tags JSON: ${e.getMessage}"
          return fail()
      }

    val category = userData.get("category").orElse(userData.get("title"))
      .map(_.toString).getOrElse("")
    val footwear = isFootwearCategory(category)
    val required = if (footwear) RequiredFootwear else RequiredApparel

    required.foreach { field =>
      tags.get(field) match {
        case None | Some(null) =>
          errors += s"Line $lineNum: Missing required tag '$field'"
        case Some(v) if field == "style_identity" && !footwear =>
          v match {
            case l: Seq[_] if l.nonEmpty => ()
            case _ => errors += s"Line $lineNum: 'style_identity' must be non-empty list"
          }
        case Some(v) if field == "formality" =>
          v match {
            case s: String if s.trim.nonEmpty => ()
            case _ => errors += s"Line $lineNum: 'formality' must be non-empty string"
          }
        case _ => ()
      }
    }
    RecommendedOptional.foreach { field =>
      if (!tags.contains(field))
        warnings += s"Line $lineNum: Missing optional '$field' (recommended)"
    }
    fail()
  }

  /** Validate pre-numbered (lineNum, line) pairs — the scale path: a pure
    * typed map, no global ordering derivation. Prefer this when the caller
    * already knows line numbers (the export pipeline does). */
  def validateNumbered(lines: Dataset[(Long, String)]): DataFrame = {
    import lines.sparkSession.implicits._
    lines.map { case (n, line) => validateExample(line, n) }.toDF()
  }

  /** Validate a Dataset of JSONL lines → per-line results, numbering lines
    * by input order.
    *
    * Global numbering is derived without leaving the DataFrame API and
    * without collapsing to one partition: per-partition positions
    * (row_number windowed on spark_partition_id, ordered by the
    * partition-monotonic id) plus an exclusive prefix sum of partition
    * counts (a #partitions-row aggregate, broadcast back). This is the
    * Tungsten-native equivalent of rdd.zipWithIndex — same extra pass over
    * the data, but codegen'd and without the RDD serialization hop. */
  def validate(lines: Dataset[String]): DataFrame = {
    import lines.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("pid")).orderBy(col("mid"))
    val wOff = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withPos = lines.toDF("line")
      .withColumn("pid", spark_partition_id())
      .withColumn("mid", monotonically_increasing_id())
      .withColumn("pos", row_number().over(w))
    val offsets = withPos.groupBy(col("pid")).agg(count(lit(1)).as("n"))
      .withColumn("offset", coalesce(sum(col("n")).over(wOff), lit(0L)))
      .select(col("pid"), col("offset"))
    withPos.join(broadcast(offsets), "pid")
      .select((col("offset") + col("pos")).as("line_num"), col("line"))
      .as[(Long, String)]
      .transform(validateNumbered)
  }
}
