package graft.policy

import graft.model._
import graft.vocab.{Vocabularies => V}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck property suites (SURVEY §5.2 item 3): P1/P3 invariants and
  * X14 clamp range over generated inputs.
  */
object PolicyProperties extends Properties("TagPolicy") {

  private val allTags: Seq[String] =
    (V.StyleIdentity ++ V.FitBottom ++ V.FitUpper ++ V.Length ++
      V.SilhouetteBottom ++ V.SilhouetteUpper ++ V.Formality ++ V.Context ++
      V.DetailsBottom ++ V.DetailsUpper ++ V.Pattern ++ V.Pairing ++
      V.ShoeType ++ V.ShoeProfile ++ V.ShoeClosure ++
      Set("zzz-bogus", "nope")).toSeq.sorted

  private val genTag: Gen[TagWithConfidence] = for {
    t <- Gen.oneOf(allTags)
    c <- Gen.chooseNum(-0.5, 1.5)
  } yield TagWithConfidence(t, c)

  private val genOpt = Gen.option(genTag)
  private val genSeq = Gen.listOfN(4, genTag).map(_.take(3))

  private val genOutput: Gen[AiTagOutput] = for {
    cat <- Gen.oneOf("bottom", "top", "top_mid", "outerwear", "footwear", "???")
    si <- genSeq; fit <- genOpt; sil <- genOpt; len <- genOpt; form <- genOpt
    ctx <- genSeq; det <- genSeq; pat <- genOpt; pair <- genSeq
    st <- genOpt; prof <- genOpt; clo <- genOpt
  } yield AiTagOutput(Some(cat), si, fit, sil, len, form, ctx, det, pat, pair, st, prof, clo)

  property("status is always one of the three states") = forAll(genOutput) { out =>
    Set("approved", "needs_review", "needs_fix")(TagPolicy(out).curationStatus)
  }

  property("required fields are always present after defaults") = forAll(genOutput) { out =>
    val r = TagPolicy(out)
    val tf = r.tagsFinal
    val apparelOk = tf.category == "footwear" ||
      (tf.fit.nonEmpty && tf.silhouette.nonEmpty)
    val shoesOk = tf.category != "footwear" ||
      (tf.shoeType.nonEmpty && tf.profile.nonEmpty)
    tf.formality.nonEmpty && apparelOk && shoesOk
  }

  property("all emitted tags are vocabulary-legal") = forAll(genOutput) { out =>
    val tf = TagPolicy(out).tagsFinal
    tf.styleIdentity.forall(V.StyleIdentity) &&
      tf.context.forall(V.Context) &&
      tf.pairingTags.forall(V.Pairing) &&
      tf.pattern.forall(V.Pattern) &&
      tf.formality.forall(V.Formality)
  }

  property("list caps: style<=2, context<=2, details<=2, pairing<=3") =
    forAll(genOutput) { out =>
      val tf = TagPolicy(out).tagsFinal
      tf.styleIdentity.size <= 2 && tf.context.size <= 2 &&
        tf.constructionDetails.size <= 2 && tf.pairingTags.size <= 3
    }
}

object DiffProperties extends Properties("TagDiff") {

  private val genTags: Gen[Map[String, Any]] = {
    val vals = Gen.oneOf("a", "b", "c", "d")
    val listField = Gen.listOfN(3, vals).map(_.distinct)
    for {
      si <- Gen.option(listField)
      ctx <- Gen.option(listField)
      fit <- Gen.option(vals)
      form <- Gen.option(vals)
      unknown <- Gen.option(vals)
    } yield Seq(
      si.map("style_identity" -> _), ctx.map("context" -> _),
      fit.map("fit" -> _), form.map("formality" -> _),
      unknown.map("custom" -> _)).flatten.toMap
  }

  property("self-diff has no changes") = forAll(genTags) { t =>
    val d = TagDiff.computeTagChanges(t, t)
    d.added.isEmpty && d.removed.isEmpty && d.modified.isEmpty
  }

  property("added and removed are disjoint and sorted") =
    forAll(genTags, genTags) { (o, c) =>
      val d = TagDiff.computeTagChanges(o, c)
      d.added.toSet.intersect(d.removed.toSet).isEmpty &&
        d.added == d.added.sorted && d.removed == d.removed.sorted
    }

  property("diff is antisymmetric: swap(orig, corr) swaps added/removed") =
    forAll(genTags, genTags) { (o, c) =>
      val d1 = TagDiff.computeTagChanges(o, c)
      val d2 = TagDiff.computeTagChanges(c, o)
      d1.added == d2.removed && d1.removed == d2.added &&
        d1.unchanged == d2.unchanged
    }

  property("clamp is always in [0,1] and numeric-stable") =
    forAll(Gen.oneOf[Any](Gen.chooseNum(-10.0, 10.0), Gen.alphaStr,
      Gen.const(null))) { v =>
      val c = AiResponseParser.clampConfidence(v)
      c >= 0.0 && c <= 1.0
    }
}
