package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextSignatureExpr
import graft.operators.TextHash

/** Property coverage for the codegen signature expression: the
  * hand-optimized loops in [[TextSignatureExpr.signatures]] are checked
  * against a NAIVE recompute of the TextHash formulas over arbitrary
  * texts — splitting edge cases (empty text, leading/trailing/multiple
  * spaces) are exactly where an off-by-one in the fused loop would hide.
  * Pure JVM (no SparkSession); the Spark-plan equivalence vs the HOF
  * expressions lives in FunctionsSpec.
  */
object TextSignatureProps extends Properties("textsig") {

  private val P = TextHash.P

  /** Naive reference: straight transliteration of the HOF formulas.
    * Folds CODE POINTS (what Spark's ascii/substring count), not UTF-16
    * units — astral characters are one fold step, like the engine. */
  private def cpFold(t: String, seed: Long): Long =
    t.codePoints.toArray.foldLeft(seed)((a, c) => (a * 31 + c) % P)

  private def reference(text: String)
      : (Seq[Long], Seq[String], Seq[Long], Long, Long) = {
    val tokens = text.split(" ", -1).toSeq // keeps empties, '' -> [""]
    val th = tokens.map { t =>
      if (t.isEmpty) 7L else cpFold(t, 7L)
    }
    val sh =
      if (th.length < 3) Seq.empty[Long]
      else (0 to th.length - 3).map(i =>
        ((th(i) * 37 + th(i + 1)) % P * 37 + th(i + 2)) % P)
    val mh = (0 until TextHash.K).map { j =>
      if (sh.isEmpty) P
      else sh.map(x => (TextHash.aCoef(j) * x + TextHash.bCoef(j)) % P).min
    }
    val r = TextHash.K / TextHash.Bands
    val bands = (0 until TextHash.Bands).map(b =>
      (0 until r).map(i => mh(b * r + i)).mkString("-"))
    val full =
      if (text.isEmpty) 7L
      else cpFold(text, 7L)
    val simhash = (0 until TextHash.SimBits).map { j =>
      val vote = th.map(t => if (((t >> j) & 1L) == 1L) 1 else -1).sum
      if (vote > 0) 1L << j else 0L
    }.sum
    (mh, bands, sh.distinct, full % 100, simhash)
  }

  private val genText: Gen[String] = Gen.frequency(
    1 -> Gen.const(""),
    1 -> Gen.const(" "),
    2 -> Gen.listOf(Gen.oneOf(Gen.identifier, Gen.const(""), Gen.const("the")))
      .map(_.mkString(" ")),
    4 -> Gen.listOf(Gen.oneOf(
      Gen.asciiPrintableStr.map(_.filterNot(_ == ' ').take(12)),
      Gen.const(""))).map(_.mkString(" ")),
    // non-ASCII incl. ASTRAL tokens: one code point = one fold step
    // (the round-15 code-point upgrade's domain; a charAt loop fails here)
    2 -> Gen.listOf(Gen.oneOf("héllo", "中文", "a𐍈b", "𐍈𐍈", "émoji🙂x"))
      .map(_.mkString(" ")))

  property("fused loop equals the naive TextHash recompute") =
    forAll(genText) { text =>
      val row = TextSignatureExpr.signatures(UTF8String.fromString(text))
      val (mh, bands, shset, bucket, simhash) = reference(text)
      row.getArray(0).toLongArray.toSeq == mh &&
        (0 until row.getArray(1).numElements()).map(
          row.getArray(1).getUTF8String(_).toString) == bands &&
        row.getArray(2).toLongArray.toSeq == shset &&
        row.getLong(3) == bucket &&
        row.getLong(4) == simhash
    }

  property("signature is a pure function of the text") =
    forAll(genText) { text =>
      val a = TextSignatureExpr.signatures(UTF8String.fromString(text))
      val b = TextSignatureExpr.signatures(UTF8String.fromString(text))
      a.getArray(0).toLongArray.sameElements(b.getArray(0).toLongArray) &&
        a.getLong(3) == b.getLong(3)
    }
}
