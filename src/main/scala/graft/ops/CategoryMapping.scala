package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Category mapping operators (SURVEY §2.8 X21-X23).
  *
  * Small frozen lookup tables compile to literal map expressions (codegen'd
  * `element_at` on a map literal) — no join, no shuffle, broadcast-free.
  */
object CategoryMapping {

  /** X22 (refitd_category_mapping.py:13-43): retailer category →
    * (category_refitd, top_layer_role); default ("top", "base"). */
  val RetailerToRefitd: Map[String, (String, Option[String])] = Map(
    "tshirts" -> ("top", Some("base")),
    "shirts" -> ("top", Some("base")),
    "polo-shirts" -> ("top", Some("base")),
    "polos" -> ("top", Some("base")),
    "sweaters" -> ("top", Some("mid")),
    "hoodies" -> ("top", Some("mid")),
    "quarter-zip" -> ("top", Some("mid")),
    "knitwear" -> ("top", Some("mid")),
    "sweatshirts" -> ("top", Some("mid")),
    "sweatsuits" -> ("top", Some("mid")),
    "trousers" -> ("bottom", None),
    "jeans" -> ("bottom", None),
    "shorts" -> ("bottom", None),
    "swimwear" -> ("bottom", None),
    "jackets" -> ("outerwear", None),
    "outerwear" -> ("outerwear", None),
    "leather" -> ("outerwear", None),
    "blazers" -> ("outerwear", None),
    "overshirts" -> ("outerwear", None),
    "coats" -> ("outerwear", None),
    "suits" -> ("outerwear", None),
    "shoes" -> ("footwear", None),
    "boots" -> ("footwear", None),
    "footwear" -> ("footwear", None))

  private def mapLiteral(pairs: Seq[(String, String)]): Column =
    map(pairs.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  private val normalized: Column => Column = c => lower(trim(c))

  /** category_refitd column (default "top", refitd_category_mapping.py:56). */
  def categoryRefitd(retailerCategory: Column): Column =
    coalesce(
      element_at(mapLiteral(RetailerToRefitd.toSeq.map { case (k, v) => k -> v._1 }.sortBy(_._1)),
        normalized(retailerCategory)),
      lit("top"))

  /** top_layer_role column (default "base" only when unmapped; mapped
    * non-top categories yield null). */
  def topLayerRole(retailerCategory: Column): Column = {
    val known = RetailerToRefitd.toSeq.sortBy(_._1)
    val roleMap = mapLiteral(known.collect { case (k, (_, Some(r))) => k -> r })
    val isKnown = element_at(
      mapLiteral(known.map { case (k, v) => k -> v._1 }), normalized(retailerCategory)).isNotNull
    when(isKnown, element_at(roleMap, normalized(retailerCategory)))
      .otherwise(lit("base"))
  }

  /** X21 (product_transformer.py:88-92,104-106): display mapping — fixed
    * (category, subcategory) pairs, else (Title-Case, null). */
  def displayCategory(retailerCategory: Column): Column =
    coalesce(
      element_at(mapLiteral(Seq(
        "tshirts" -> "Tops", "pants" -> "Bottoms", "jackets" -> "Outerwear")),
        retailerCategory),
      initcap(retailerCategory))

  def displaySubcategory(retailerCategory: Column): Column =
    element_at(mapLiteral(Seq(
      "tshirts" -> "T-Shirts", "pants" -> "Pants", "jackets" -> "Jackets")),
      retailerCategory)
}
