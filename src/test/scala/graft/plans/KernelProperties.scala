package graft.plans

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the per-document kernels: each static
  * helper is checked against an independent JDK-regex reference over
  * generated strings spanning ascii, whitespace runs, and multi-byte
  * code points (the Spark-level pipeline pins live in the operator
  * specs; these hammer the byte-walk edge cases without a session). */
object KernelProperties extends Properties("TextKernels") {

  // valid (no lone surrogates) strings mixing ws runs, ascii, unicode
  private val genPiece: Gen[String] = Gen.oneOf(
    Gen.oneOf(" ", "  ", "\t", "\n", "\r\n", "", "\f"),
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("é", "ü", "ϕ", "雪", "𝄞", "né!", "a-b", "4,2", "_", ".", "!!"),
    Gen.const(""))
  private val genText: Gen[String] =
    Gen.listOf(genPiece).map(_.mkString).map(_.take(200))

  private val ws = "\\s+"

  property("md5 hex matches MessageDigest reference") =
    forAll(genText) { s =>
      val ref = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      GraftMd5.hexUtf8(UTF8String.fromString(s)).toString == ref
    }

  property("text metrics match the JDK regex reference") =
    forAll(genText) { s =>
      val m = GraftTextMetrics.metrics(UTF8String.fromString(s))
      val nTokens = java.util.regex.Pattern.compile(ws).split(s, -1).length.toLong
      val contentChars = {
        val stripped = s.replaceAll("\\s", "")
        stripped.codePointCount(0, stripped.length).toLong
      }
      val bpe = {
        val p = java.util.regex.Pattern
          .compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+").matcher(s)
        var c = 0L
        while (p.find()) c += 1
        c
      }
      val nChars = s.codePointCount(0, s.length).toLong
      (m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3)) ==
        ((nTokens, contentChars, bpe, nChars))
    }

  property("shingle count matches split+sliding+distinct reference") =
    forAll(genText, Gen.choose(1, 4)) { (s, n) =>
      val toks = java.util.regex.Pattern.compile(ws).split(s, -1)
      val ref =
        if (toks.length < n) 0L
        else toks.sliding(n).map(_.mkString(" ")).toSet.size.toLong
      GraftShingleCount.count(UTF8String.fromString(s), n) == ref
    }

  property("winnow minima are minima of the gram-hash windows") =
    forAll(genText, Gen.choose(2, 6), Gen.choose(2, 5)) { (s0, k, w) =>
      // reference on the normalized form the operator feeds the kernel
      val s = s0.toLowerCase.replaceAll("\\s+", " ").trim
      val grams = {
        val cps = s.codePoints().toArray
        if (cps.length < k) Array.empty[String]
        else (0 to cps.length - k).map(i =>
          new String(cps, i, k)).toArray
      }
      val hashes = grams.map { g =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      }
      // kernel emits the DISTINCT minima in first-occurrence order
      val ref =
        if (hashes.length < w) Seq.empty[String]
        else hashes.sliding(w).map(_.min).toSeq.distinct
      val got = {
        val a = GraftWinnow.minima(UTF8String.fromString(s), k, w)
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      }
      got == ref
    }
}
