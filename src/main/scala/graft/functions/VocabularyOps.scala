package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P10/E8/X24 — vocabulary merge + tag validation
  * (style_tagger.py:150-531).
  *
  * The merged vocabulary (built-in ∪ custom, per category) is a small
  * driver-side structure embedded as literal arrays — codegen'd
  * `array_contains`/`exists`, no join, no shuffle. The custom side comes
  * from a `custom_vocabulary`-shaped table collected once (it is a
  * user-curated dimension, O(100) rows).
  */
object VocabularyOps {

  /** E8 (style_tagger.py:186-222): merge built-in + custom vocabulary per
    * category, order-preserving dedup (built-ins first). */
  def mergeVocabularies(builtIn: Map[String, Seq[String]],
                        custom: Map[String, Seq[String]]): Map[String, Seq[String]] =
    (builtIn.keySet ++ custom.keySet).map { cat =>
      cat -> (builtIn.getOrElse(cat, Nil) ++ custom.getOrElse(cat, Nil)).distinct
    }.toMap

  /** Collect a custom_vocabulary table (category, tag) into the merge
    * input. Driver-side collect is intentional: the table is a tiny
    * curated dimension (supabase_schema.sql:350-358). */
  def customVocabFromTable(df: DataFrame): Map[String, Seq[String]] =
    df.select(col("category").cast("string"), col("tag").cast("string"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (cat, rows) => cat -> rows.map(_.getString(1)).toSeq }

  /** X24 (style_tagger.py:465-487): validate candidate tags against a
    * vocabulary — exact hit, else substring-containment match (candidate
    * contained in a vocab term or vice versa), order-preserving dedup of
    * the survivors. */
  def validateTags(candidates: Column, vocab: Seq[String]): Column = {
    val v = array(vocab.map(lit): _*)
    array_distinct(filter(candidates, c =>
      array_contains(v, c) ||
        exists(v, t => t.contains(c) || c.contains(t))))
  }

  /** P10 fallback (style_tagger.py:489-523): keyword-derived tags from the
    * product name when the model returned nothing usable. `keywordTags`
    * maps a lowercase keyword to the tag it implies. */
  def fallbackTagsFromName(name: Column, keywordTags: Seq[(String, String)]): Column = {
    val hits = keywordTags.map { case (kw, tag) =>
      when(lower(name).contains(kw), lit(tag))
    }
    array_distinct(filter(array(hits: _*), _.isNotNull))
  }

  /** P10 augment (style_tagger.py:525-531): top up `tags` from `extras`
    * until `minCount` tags are present (order-preserving, no dups). */
  def augmentToMin(tags: Column, extras: Column, minCount: Int): Column = {
    val combined = concat(tags, filter(extras, e => !array_contains(tags, e)))
    when(size(tags) >= minCount, tags)
      .otherwise(slice(combined, lit(1), greatest(lit(minCount), size(tags))))
  }
}
