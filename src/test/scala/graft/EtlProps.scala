package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.etl.{AccessLogParser, LogGen}

/** Property-based coverage (SURVEY §5.2): parser round-trip over the
  * generator's field space, tokenizer totality, bucket alignment math,
  * and generator determinism. Pure (no SparkSession) — the DataFrame
  * equivalents live in EtlSpec.
  */
object EtlProps extends Properties("etl") {

  private val genEntry: Gen[LogGen.Entry] = for {
    seed <- Gen.chooseNum(0L, 1000000L)
    extra <- Gen.oneOf(0.0, 1.0)
    e <- Gen.oneOf(LogGen.entries(4, seed = seed, extraFrac = extra))
  } yield e

  property("tokenize round-trips every generated entry") = forAll(genEntry) { e =>
    val f = AccessLogParser.tokenize(e.line)
    f.length == 26 + e.extraFields.length &&
      f(1) == e.bucket && f(5) == e.requestId && f(6) == e.operation &&
      f(16) == e.agent &&
      f.drop(26).toSeq == e.extraFields
  }

  property("tokenize is total and conserves non-space content on bare tokens") =
    forAll(Gen.listOf(Gen.identifier.suchThat(_.nonEmpty))) { toks =>
      val f = AccessLogParser.tokenize(toks.mkString(" "))
      f.toSeq == toks
    }

  property("tokenize handles arbitrary quoted payloads") =
    forAll(Gen.alphaNumStr, Gen.asciiPrintableStr.map(_.filterNot(c => c == '"'))) {
      (bare, quoted) =>
        val head = if (bare.isEmpty) "x" else bare
        val f = AccessLogParser.tokenize(head + " \"" + quoted + "\"")
        // a quoted field keeps inner spaces/brackets verbatim
        f.head == head && f.last == quoted
    }

  property("bucket alignment: left bound <= ts < left + N, offset-anchored") =
    forAll(
      Gen.chooseNum(0L, 4102444800L),                 // ts within 1970..2100
      Gen.oneOf(60L, 900L, 3600L, 86400L),            // window
      Gen.oneOf(-43200L, -28800L, 0L, 19800L, 28800L) // fixed tz offsets
    ) { (ts, n, tz) =>
      val left = math.floorDiv(ts + tz, n) * n - tz
      left <= ts && ts < left + n && math.floorMod(left + tz, n) == 0L
    }

  property("LogGen is seed-stable") = forAll(Gen.chooseNum(0L, 100000L)) { seed =>
    LogGen.lines(5, seed = seed) == LogGen.lines(5, seed = seed)
  }

  property("dup injection only appends already-present request ids") =
    forAll(Gen.chooseNum(0L, 10000L)) { seed =>
      val es = LogGen.entries(30, seed = seed, dupFrac = 0.3)
      val ids = es.map(_.requestId)
      val base = ids.distinct
      base.length == 30 && ids.forall(base.contains)
    }
}
