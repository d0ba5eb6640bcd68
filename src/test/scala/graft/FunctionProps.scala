package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.functions.{DotProductExpr, EqCountExpr}

/** Property coverage for the native kernel expressions, pure (no
  * SparkSession): the static entry points the generated code calls are
  * checked against plain Scala left-folds — the same semantics the
  * interpreted HOF formulas and the DuckDB oracle reduce with — across
  * the full double range (mixed magnitudes, signs, infinities, zeros;
  * NaN excluded — NaN payload bits are not preserved through boxing).
  */
object FunctionProps extends Properties("functions") {

  private val finiteD: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1e9, 1e9),
    Gen.oneOf(0.0, -0.0, 1e-300, -1e-300, 1e300,
      Double.PositiveInfinity, Double.NegativeInfinity))

  private val vecPair: Gen[(Array[Double], Array[Double])] = for {
    n <- Gen.chooseNum(0, 128)
    a <- Gen.listOfN(n, finiteD)
    b <- Gen.listOfN(n, finiteD)
  } yield (a.toArray, b.toArray)

  property("graft_dot == left-to-right fold, bit for bit") =
    forAll(vecPair) { case (a, b) =>
      val fast = DotProductExpr.dot(
        new GenericArrayData(a.map(Double.box)),
        new GenericArrayData(b.map(Double.box)))
      val ref = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      java.lang.Double.doubleToLongBits(fast) ==
        java.lang.Double.doubleToLongBits(ref)
    }

  private val longPair: Gen[(Array[Long], Array[Long])] = for {
    n <- Gen.chooseNum(0, 64)
    a <- Gen.listOfN(n, Gen.chooseNum(0L, 8L)) // small range forces collisions
    b <- Gen.listOfN(n, Gen.chooseNum(0L, 8L))
  } yield (a.toArray, b.toArray)

  property("graft_eq_count == positionwise equality count") =
    forAll(longPair) { case (a, b) =>
      val fast = EqCountExpr.eqCount(
        new GenericArrayData(a.map(Long.box)),
        new GenericArrayData(b.map(Long.box)))
      fast == a.zip(b).count { case (x, y) => x == y }
    }

  // --- graft_winnow vs a brute-force reference (the paper's definition
  // written naively: every full window's min key, distinct) — random
  // small-vocab token streams force repeated grams, equal hashes and
  // rightmost-tie decisions; random (n, w) cover sub-gram and
  // sub-window degenerate shapes
  private val tokenText: Gen[String] = for {
    len <- Gen.chooseNum(0, 40)
    toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "aa", "x1", "q"))
    seps <- Gen.listOfN(math.max(len - 1, 0), Gen.oneOf(" ", "  "))
  } yield toks.zipAll(seps, "", "").map { case (t, s) => t + s }.mkString

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bruteWinnow(text: String, n: Int, w: Int,
      seed: Long): (Long, Long, Seq[String]) = {
    val toks = text.split(' ').filter(_.nonEmpty)
    val grams = (0 to toks.length - n)
      .map(i => toks.slice(i, i + n).mkString(" "))
    if (grams.isEmpty) return (0L, 0L, Nil)
    val keys = grams.zipWithIndex.map { case (g, p) =>
      graft.functions.RollingHashExpr.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(g), seed) *
        (1L << 31) + ((1L << 31) - 1 - p)
    }
    if (grams.length < w) return (grams.length.toLong, 0L, Nil)
    val selKeys = (w - 1 until grams.length)
      .map(q => (q - w + 1 to q).map(keys).min).distinct
    val fps = selKeys
      .map(k => md5hex(grams(((1L << 31) - 1 - (k & ((1L << 31) - 1))).toInt)))
      .distinct
    (grams.length.toLong, selKeys.length.toLong, fps)
  }

  property("graft_winnow == the naive every-window-min definition") =
    forAll(tokenText, Gen.chooseNum(1, 4), Gen.chooseNum(1, 6),
      Gen.oneOf(7L, 13L, 17L)) { (text, n, w, seed) =>
      val row = graft.functions.WinnowExpr.winnow(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), n, w, seed)
      val got = (row.getLong(0), row.getLong(1),
        row.getArray(2).toSeq[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString))
      val ref = bruteWinnow(text, n, w, seed)
      got._1 == ref._1 && got._2 == ref._2 && got._3 == ref._3
    }

  // --- graft_char_entropy vs a plain Scala code-point census fold —
  // tiny alphabets force heavy multiplicity; mixed-plane glyphs (an
  // astral 𐍈 and a 2-byte é) exercise the code-point grain against
  // naive UTF-16-unit counting
  private val charText: Gen[String] = for {
    len <- Gen.chooseNum(0, 120)
    cs <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", " ", "é", "𐍈"))
  } yield cs.mkString

  property("graft_char_entropy == the naive code-point census") =
    forAll(charText) { text =>
      val row = graft.functions.CharEntropyExpr.signals(
        org.apache.spark.unsafe.types.UTF8String.fromString(text))
      val cps = text.codePoints().toArray.toSeq
      val census = cps.groupBy(identity).view.mapValues(_.size.toLong)
      val n = cps.size.toLong
      val entQ =
        if (n == 0) 0L
        else census.values.map(k =>
          math.floor(k.toDouble / n * math.log(n.toDouble / k)
            * 1000000.0).toLong).sum
      row.getLong(0) == n &&
        row.getLong(1) == census.size.toLong &&
        row.getLong(2) == (if (n == 0) 0L else census.values.max) &&
        row.getLong(3) == entQ
    }

  // --- graft_term_counts vs a plain Scala census — the tokenText
  // generator's tiny vocab forces heavy multiplicity and empty-segment
  // edges (double separators)
  property("graft_term_counts == the naive token census, " +
    "first-appearance order") =
    forAll(tokenText) { text =>
      val row = graft.functions.TermCountsExpr.census(
        org.apache.spark.unsafe.types.UTF8String.fromString(text))
      val toks = text.split(' ').filter(_.nonEmpty).toSeq
      val order = toks.distinct
      val census = toks.groupBy(identity).view.mapValues(_.size.toLong)
      val arr = row.getArray(1)
      val got = (0 until arr.numElements()).map { i =>
        val e = arr.getStruct(i, 2)
        (e.getUTF8String(0).toString, e.getLong(1))
      }
      row.getLong(0) == toks.size.toLong &&
        got.map(_._1) == order &&
        got.forall { case (t, n) => census(t) == n }
    }

  // --- graft_topk's insertion buffer vs the sort reference, under
  // arbitrary partial-aggregation splits — ties forced by a tiny score
  // range, merge() associativity by replaying random splits
  private val scored: Gen[List[(Double, Long)]] = for {
    n <- Gen.chooseNum(0, 60)
    xs <- Gen.listOfN(n, for {
      s <- Gen.chooseNum(0, 4)
      id <- Gen.chooseNum(0L, 30L)
    } yield (s.toDouble, id))
  } yield xs

  property("graft_topk buffer == sort-take reference under random " +
    "partial-merge splits") =
    forAll(scored, Gen.chooseNum(1, 6), Gen.chooseNum(1, 5)) {
      (xs, k, nSplits) =>
        val ref = xs.sortBy { case (s, id) => (-s, id) }.take(k)
        // split the stream into chunks, build per-chunk buffers, merge
        val chunks = xs.grouped(math.max(1, xs.size / nSplits + 1)).toList
        val bufs = chunks.map { ch =>
          val b = new graft.functions.TopKAgg.Buf(k)
          ch.foreach { case (s, id) => b.offer(s, id) }
          b
        }
        val merged = bufs.foldLeft(new graft.functions.TopKAgg.Buf(k)) {
          (acc, b) =>
            (0 until b.n).foreach(i => acc.offer(b.scores(i), b.ids(i)))
            acc
        }
        val got = (0 until merged.n).map(i =>
          (merged.scores(i), merged.ids(i))).toList
        got == ref
    }

  // NaN / signed-zero hardening (ADVICE r16): NaN scores (a zero-norm
  // vector's cos_sim upstream) must rank FIRST under desc — Spark's and
  // DuckDB's sort semantics — not lodge mid-buffer blocking better
  // candidates; -0.0 must tie with 0.0 so the id tie-break decides.
  private val scoredNaN: Gen[List[(Double, Long)]] = for {
    n <- Gen.chooseNum(0, 60)
    xs <- Gen.listOfN(n, for {
      s <- Gen.oneOf(Gen.chooseNum(0, 4).map(_.toDouble),
        Gen.const(Double.NaN), Gen.const(-0.0), Gen.const(0.0))
      id <- Gen.chooseNum(0L, 30L)
    } yield (s, id))
  } yield xs

  property("graft_topk ranks NaN first and ties -0.0 with 0.0, " +
    "matching the SQL sort reference") =
    forAll(scoredNaN, Gen.chooseNum(1, 6), Gen.chooseNum(1, 5)) {
      (xs, k, nSplits) =>
        def nz(s: Double) = if (s == 0.0d) 0.0d else s
        val ref = xs.map { case (s, id) => (nz(s), id) }
          .sortWith { case ((sa, ia), (sb, ib)) =>
            val c = java.lang.Double.compare(sa, sb)
            c > 0 || (c == 0 && ia < ib)
          }.take(k)
        val chunks = xs.grouped(math.max(1, xs.size / nSplits + 1)).toList
        val bufs = chunks.map { ch =>
          val b = new graft.functions.TopKAgg.Buf(k)
          ch.foreach { case (s, id) => b.offer(s, id) }
          b
        }
        val merged = bufs.foldLeft(new graft.functions.TopKAgg.Buf(k)) {
          (acc, b) =>
            (0 until b.n).foreach(i => acc.offer(b.scores(i), b.ids(i)))
            acc
        }
        val got = (0 until merged.n).map(i =>
          (merged.scores(i), merged.ids(i))).toList
        got.zip(ref).forall { case ((gs, gi), (rs, ri)) =>
          java.lang.Double.compare(gs, rs) == 0 && gi == ri
        } && got.size == ref.size
    }

  property("dimension mismatch is rejected loudly") =
    forAll(Gen.chooseNum(1, 32)) { n =>
      val a = new GenericArrayData(Array.fill(n)(Double.box(1.0)))
      val b = new GenericArrayData(Array.fill(n + 1)(Double.box(1.0)))
      scala.util.Try(DotProductExpr.dot(a, b)).isFailure &&
        scala.util.Try(EqCountExpr.eqCount(
          new GenericArrayData(Array.fill(n)(Long.box(1L))),
          new GenericArrayData(Array.fill(n + 1)(Long.box(1L))))).isFailure
    }
}
