package graft

import org.apache.spark.sql.functions._

import graft.etl.{AccessLogParser, LogGen}

/** Native codegen expression coverage (graft_tokenize). */
class FunctionsSpec extends SparkSpec {

  test("graft_tokenize is registered and matches the scanner exactly") {
    import spark.implicits._
    assert(spark.catalog.functionExists("graft_tokenize"))
    val lines = LogGen.lines(100, seed = 31, extraFrac = 0.2)
    val viaExpr = lines.toDF("value")
      .select(call_function("graft_tokenize", $"value").as("f"))
      .collect().map(_.getSeq[String](0))
    lines.zip(viaExpr).foreach { case (line, got) =>
      assert(got == AccessLogParser.tokenize(line).toSeq)
    }
  }

  test("graft_tokenize null input yields null, participates in codegen") {
    import spark.implicits._
    // repartition: keeps ConvertToLocalRelation from eagerly folding the
    // tiny local input, so we see the real codegen'd plan
    val df = Seq[String](null, "a b").toDF("value").repartition(2)
      .select(call_function("graft_tokenize", $"value").as("f"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(1).getSeq[String](0) == Seq("a", "b"))
    // the expression must fuse into a WholeStageCodegen stage — AQE's
    // renderer prints codegen stages as `*(n) Project [...]`
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_tokenize.*"), plan)
    assert(!plan.contains("ScalaUDF"), plan)
  }

  test("parse() uses the native expression under a graft session") {
    import spark.implicits._
    val df = AccessLogParser.parse(
      LogGen.lines(10, seed = 32).toDF("value").repartition(2))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_tokenize"), plan)
    assert(df.count() == 10)
  }

  test("graft_rollhash is bit-equal to the HOF reference formula " +
    "(both seeds, astral chars in-domain) and fuses into codegen") {
    import spark.implicits._
    assert(spark.catalog.functionExists("graft_rollhash"))
    val P = graft.operators.TextHash.P
    // the interpreted-HOF reference formula hashBucketCol used through
    // r14 (and the form the DuckDB oracles mirror), with its explicit
    // ''-pin (sequence(1, 0) is the DESCENDING [1, 0])
    def hof(seed: Long) =
      s"""CASE WHEN length(text) = 0 THEN CAST($seed AS BIGINT)
          ELSE aggregate(transform(sequence(1, length(text)),
            i -> ascii(substring(text, i, 1))),
            CAST($seed AS BIGINT), (acc, c) -> (acc * 31 + c) % $P) END"""
    val edges = Seq("", " ", "a", "a b c", "é", "中文词元",
      "a𐍈b", "𐍈", "mixed é 𐍈 ascii", ("y " * 40).trim)
      .zipWithIndex.map { case (t, i) => (900000L + i, t) }
    val docs = Tables(spark, sfSmoke, "documents").select($"doc_id", $"text")
      .union(edges.toDF("doc_id", "text"))
    Seq(7L, 13L).foreach { seed => // d13's and d27's seeds
      docs.select($"doc_id", expr(hof(seed)).as("ref"),
        expr(s"graft_rollhash(text, ${seed}L)").as("native"))
        .collect().foreach { r =>
          assert(r.getLong(1) == r.getLong(2), s"seed $seed doc " +
            s"${r.getLong(0)}: HOF ${r.getLong(1)} vs ${r.getLong(2)}")
        }
    }
    val df = Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text")
      .repartition(2).select(expr("graft_rollhash(text, 7L)").as("h"))
    assert(df.collect().length == 2) // finalize the adaptive plan first
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_rollhash.*"),
      plan)
  }

  test("graft_rep_concentration is bit-equal to the HOF reference " +
    "formulas and fuses into codegen") {
    import spark.implicits._
    assert(spark.catalog.functionExists("graft_rep_concentration"))
    // the interpreted reference formulation d51 used through r15's
    // mid-round bench (and the shape the DuckDB oracle mirrors):
    // filtered token split, joined bigrams, maxAdjRun folds over
    // array_sort'ed copies for the frequency censuses and over the raw
    // stream for the run length
    def hofCols(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("grams", expr(
        """CASE WHEN size(toks) >= 2 THEN
             transform(sequence(1, size(toks) - 1),
               i -> array_join(slice(toks, i, 2), ' '))
           ELSE CAST(array() AS ARRAY<STRING>) END"""))
      .select($"doc_id",
        size($"toks").cast("long").as("r_n"),
        expr(queries.DocumentQueries.maxAdjRunSql("array_sort(toks)")).as("r_tok"),
        expr(queries.DocumentQueries.maxAdjRunSql("array_sort(grams)")).as("r_gram"),
        expr(queries.DocumentQueries.maxAdjRunSql("toks")).as("r_run"))
    // gate corpus + every documented edge: empty/whitespace-only text,
    // leading/trailing/double spaces (empty segments), single token,
    // runs, tab-inside-token (the ' '-only grain), astral code points,
    // bigram ties, and the repeated-bigram overlap case "a a a"
    val edges = Seq("", " ", "  ", "solo", "a a a", "a a a a b a a",
      "x\ty x\ty", " lead", "trail ", "a  b", "𐍈 𐍈 é é é",
      "spam spam spam ham eggs spam ham eggs", ("y " * 40).trim)
      .zipWithIndex.map { case (t, i) => (910000L + i, t) }
    val docs = Tables(spark, sfSmoke, "documents").select($"doc_id", $"text")
      .union(edges.toDF("doc_id", "text"))
    val both = hofCols(docs)
      .join(docs.select($"doc_id",
        expr("graft_rep_concentration(text)").as("sig")), "doc_id")
    both.collect().foreach { r =>
      val sig = r.getStruct(r.fieldIndex("sig"))
      Seq("r_n" -> 0, "r_tok" -> 1, "r_gram" -> 2, "r_run" -> 3).foreach {
        case (ref, fi) =>
          assert(r.getLong(r.fieldIndex(ref)) == sig.getLong(fi),
            s"doc ${r.getLong(0)} $ref: HOF ${r.getLong(r.fieldIndex(ref))} " +
              s"vs native ${sig.getLong(fi)}")
      }
    }
    // null text → null struct (the HOF chain's null semantics)
    val nulls = Seq((1L, null: String), (2L, "a b")).toDF("doc_id", "text")
      .repartition(2)
      .select(expr("graft_rep_concentration(text)").as("sig"))
    val rows = nulls.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    val plan = nulls.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_rep_concentration.*"),
      plan)
  }

  test("graft_ngram_fps / graft_ngrams match the HOF+DISTINCT reference " +
    "pipeline per doc and fuse into codegen") {
    import spark.implicits._
    assert(spark.catalog.functionExists("graft_ngram_fps"))
    assert(spark.catalog.functionExists("graft_ngrams"))
    // the interpreted reference formulation ngramFps used through r15
    // (and the shape duckNgramFps mirrors): HOF gram build + explode +
    // corpus-wide DISTINCT. Dedup there is post-hash and corpus-grain;
    // the native kernel dedups per doc in-row — same (doc_id, fp) sets.
    def hofFps(df: org.apache.spark.sql.DataFrame, n: Int) = df
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .filter(size(col("toks")) >= n)
      .select($"doc_id", explode(expr(
        s"""transform(sequence(1, size(toks) - ${n - 1}),
            i -> md5(array_join(slice(toks, i, $n), ' ')))""")).as("fp"))
      .distinct()
    val edges = Seq("", " ", "a", "a b", "a b c", "a a a a",
      "a b a b a b", "x\ty x\ty z", " lead mid trail ", "é 𐍈 é 𐍈",
      "w w w w w w w w w w").zipWithIndex
      .map { case (t, i) => (920000L + i, t) }
    val docs = Tables(spark, sfSmoke, "documents").select($"doc_id", $"text")
      .union(edges.toDF("doc_id", "text"))
    Seq(1, 2, 8).foreach { n =>
      val ref = hofFps(docs, n).groupBy($"doc_id")
        .agg(sort_array(collect_list($"fp")).as("fps"))
      val native = docs.select($"doc_id",
        expr(s"graft_ngram_fps(text, $n)").as("arr"))
        .select($"doc_id", sort_array($"arr").as("fps"))
        .filter(size($"fps") > 0)
      val joined = ref.as("r").join(native.as("v"), "doc_id",
        "full_outer").collect()
      joined.foreach { r =>
        assert(!r.isNullAt(1) && !r.isNullAt(2),
          s"n=$n doc ${r.getLong(0)}: one side missing")
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n doc ${r.getLong(0)} fps differ")
      }
      // gram text: fps of the text grams must equal the fp array —
      // same kernel, hash applied in-row vs post-hoc
      docs.select(
        sort_array(expr(s"graft_ngram_fps(text, $n)")).as("a"),
        sort_array(expr(s"transform(graft_ngrams(text, $n), g -> md5(g))"))
          .as("b"))
        .collect().foreach(r =>
          assert(r.getSeq[String](0) == r.getSeq[String](1)))
    }
    // under-n docs yield an EMPTY array (explode emits nothing), null
    // text yields null
    val tiny = Seq((1L, "a b"), (2L, null: String)).toDF("doc_id", "text")
      .repartition(2)
      .select(expr("graft_ngram_fps(text, 8)").as("a"))
    val rows = tiny.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    assert(rows.filter(!_.isNullAt(0)).forall(_.getSeq[String](0).isEmpty))
    val plan = tiny.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_ngram_fps.*"),
      plan)
  }

  test("graft_quality_stats matches the split+filter reference counts " +
    "(empty segments included) and fuses into codegen") {
    import spark.implicits._
    assert(spark.catalog.functionExists("graft_quality_stats"))
    // the d09 reference formulation (withQuality through r15): split
    // KEEPS empty segments — '' is one segment, 'a ' is two
    def refCols(df: org.apache.spark.sql.DataFrame) = {
      val toks = split(col("text"), " ")
      df.select($"doc_id",
        size(toks).cast("long").as("r_n"),
        size(filter(toks, t => t.isInCollection(Seq("the", "a"))))
          .cast("long").as("r_stop"))
    }
    val edges = Seq("", " ", "  ", "a", "the", "an a the", "a  the",
      " the", "the ", "thee ath a", "a𐍈 the é", "that a cat the")
      .zipWithIndex.map { case (t, i) => (940000L + i, t) }
    val docs = Tables(spark, sfSmoke, "documents").select($"doc_id", $"text")
      .union(edges.toDF("doc_id", "text"))
    refCols(docs)
      .join(docs.select($"doc_id",
        expr("graft_quality_stats(text)").as("sig")), "doc_id")
      .collect().foreach { r =>
        val sig = r.getStruct(r.fieldIndex("sig"))
        assert(r.getLong(r.fieldIndex("r_n")) == sig.getLong(0),
          s"doc ${r.getLong(0)} n_tok: HOF ${r.getLong(1)} vs ${sig.getLong(0)}")
        assert(r.getLong(r.fieldIndex("r_stop")) == sig.getLong(1),
          s"doc ${r.getLong(0)} stop_n: HOF ${r.getLong(2)} vs ${sig.getLong(1)}")
      }
    val nulls = Seq((1L, null: String), (2L, "a b")).toDF("doc_id", "text")
      .repartition(2)
      .select(expr("graft_quality_stats(text)").as("sig"))
    val rows = nulls.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    val plan = nulls.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_quality_stats.*"),
      plan)
  }

  test("graft_hashed_feats matches the explode+groupBy reference census " +
    "per doc (hexchars 2 and 3) and plans shuffle-free") {
    import spark.implicits._
    assert(spark.catalog.functionExists("graft_hashed_feats"))
    // the DataFrame reference formulation hashedFeats used through r15
    // (and the shape the d46 oracle mirrors): HOF unigram+bigram build,
    // explode, md5-nibble arithmetic, corpus-wide (doc_id, fb) count
    def refCensus(df: org.apache.spark.sql.DataFrame, hexChars: Int) = df
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .filter(size(col("toks")) >= 1)
      .select($"doc_id", explode(concat($"toks", expr(
        """zip_with(slice(toks, 1, size(toks) - 1),
                    slice(toks, 2, size(toks) - 1),
           (a, b) -> concat(a, ' ', b))"""))).as("feat"))
      .withColumn("fb", expr(
        queries.DocumentQueries.dsirFeatBucket("feat", hexChars)).cast("long"))
      .groupBy($"doc_id", $"fb").agg(count(lit(1)).as("c"))
    val edges = Seq("", " ", "a", "a a", "a b a b a", "é 𐍈 é",
      "x\ty x\ty", " lead trail ").zipWithIndex
      .map { case (t, i) => (930000L + i, t) }
    val docs = Tables(spark, sfSmoke, "documents").select($"doc_id", $"text")
      .union(edges.toDF("doc_id", "text"))
    Seq(2, 3).foreach { hexChars =>
      val ref = refCensus(docs, hexChars)
        .groupBy($"doc_id").agg(sort_array(
          collect_list(struct($"fb", $"c"))).as("feats"))
      val native = docs.select($"doc_id", expr(
        s"graft_hashed_feats(text, $hexChars)").as("arr"))
        .filter(size($"arr") > 0)
        .select($"doc_id", sort_array($"arr").as("feats"))
      ref.as("r").join(native.as("v"), Seq("doc_id"), "full_outer")
        .select($"doc_id", $"r.feats".as("rf"), $"v.feats".as("vf"))
        .collect().foreach { r =>
          assert(!r.isNullAt(1) && !r.isNullAt(2),
            s"hexchars $hexChars doc ${r.getLong(0)}: one side missing")
          assert(r.getSeq[Any](1) == r.getSeq[Any](2),
            s"hexchars $hexChars doc ${r.getLong(0)} census differs")
        }
    }
    // the d46/d48 grain plans NO shuffle at all now — the census is
    // finished before the explode
    val flat = queries.DocumentQueries.hashedFeats(
      Tables(spark, sfSmoke, "documents"))
    flat.collect()
    val exchanges = SparkSpec.shuffleCount(flat.queryExecution.executedPlan)
    assert(exchanges == 0, s"hashedFeats must be shuffle-free, got " +
      s"$exchanges:\n${flat.queryExecution.executedPlan}")
  }

  test("ngramFps plans NO distinct exchange: the explode feeds the fp " +
    "aggregate directly (d30/d32/d39/d47 grain)") {
    import spark.implicits._
    val docs = Tables(spark, sfSmoke, "documents")
    // d47's pass-1 shape: fp-grain df aggregate over the n-gram stream
    val df = queries.DocumentQueries.ngramFps(docs, 8)
      .groupBy($"fp").agg(count(lit(1)).as("df"))
    df.collect()
    // exactly the ONE hash exchange of the aggregate itself — the
    // corpus-wide (doc_id, fp) DISTINCT shuffle the in-row dedup
    // replaced must not reappear. The AQE wrapper is a leaf to
    // collect(), so unwrap to the finalized inner plan (shuffles
    // appear there as ShuffleQueryStageExec leaves post-execution).
    val exchanges = SparkSpec.shuffleCount(df.queryExecution.executedPlan)
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n" +
      df.queryExecution.executedPlan)
  }

  test("graft_text_signature is bit-equal to the HOF reference formulas") {
    import spark.implicits._
    import graft.operators.TextHash._
    assert(spark.catalog.functionExists("graft_text_signature"))
    // the gate corpus PLUS every documented edge: empty text, lone/multi/
    // trailing spaces (empty tokens), sub-3-token docs (sentinel), dups.
    // Non-ASCII INCLUDING astral chars: since the round-15 code-point
    // upgrade the fused loop folds code points like ascii()/substring
    // do, so parity must hold beyond the BMP too (a charAt loop folds
    // two surrogate units per astral char and fails these rows)
    val edges = Seq("", " ", "  ", "a", "a b", "a b c", "a  b  c ",
      ("x " * 50).trim, "the the the the",
      "héllo wörld ünïcode tökens here", "中文 文本 测试 四个 词元",
      "a𐍈b 𐍈𐍈 gothic🙂glyphs here too")
      .zipWithIndex.map { case (t, i) => (100000L + i, t) }
    val docs = Tables(spark, sfSmoke, "documents").select($"doc_id", $"text")
      .union(edges.toDF("doc_id", "text"))
    val hof = docs
      .withColumn("th", expr(sparkTokenHashes("text")))
      .withColumn("sh", expr(sparkShingles("th")))
      .withColumn("mh", expr(sparkMinhash("sh")))
      .withColumn("bands", expr(sparkBands("mh")))
      .select($"doc_id", $"mh", $"bands", array_distinct($"sh").as("shset"),
        expr(sparkSimhash("th")).as("simhash"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1), r.getSeq[String](2), r.getSeq[Long](3),
          r.getLong(4)))).toMap
    val buckets = graft.queries.DocumentQueries.splitAssign(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = docs
      .select($"doc_id", call_function("graft_text_signature", $"text").as("s"))
      .select($"doc_id", $"s.mh", $"s.bands", $"s.shset", $"s.split_bucket",
        $"s.simhash")
      .collect()
    assert(native.length == hof.size)
    native.foreach { r =>
      val id = r.getLong(0)
      val (mh, bands, shset, simhash) = hof(id)
      assert(r.getSeq[Long](1) == mh, s"doc $id minhash")
      assert(r.getSeq[String](2) == bands, s"doc $id bands")
      assert(r.getSeq[Long](3) == shset, s"doc $id shset")
      assert(r.getLong(4) == buckets(id), s"doc $id split bucket")
      assert(r.getLong(5) == simhash, s"doc $id simhash")
    }
  }

  test("graft_text_signature fuses into whole-stage codegen") {
    import spark.implicits._
    val df = Seq((1L, "a b c d"), (2L, "")).toDF("doc_id", "text").repartition(2)
      .select(call_function("graft_text_signature", $"text").as("s"))
    assert(df.collect().length == 2) // finalize the adaptive plan first
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_text_signature.*"), plan)
  }

  test("graft_eq_count matches the HOF zip_with∘filter count") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 50).map { i =>
      val a = Array.fill(16)(rnd.nextInt(4).toLong)
      // mix: some identical arrays, some independent
      val b = if (i % 5 == 0) a.clone else Array.fill(16)(rnd.nextInt(4).toLong)
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b").repartition(2)
      .withColumn("fast", expr("graft_eq_count(a, b)"))
      .withColumn("ref", expr(
        "CAST(size(filter(zip_with(a, b, (x, y) -> x = y), m -> m)) AS BIGINT)"))
    df.collect().foreach { r =>
      assert(r.getLong(3) == r.getLong(4), s"eq_count diverged on id ${r.getLong(0)}")
    }
    val err = intercept[org.apache.spark.SparkException] {
      Seq((Array(1L, 2L), Array(1L))).toDF("a", "b").repartition(2)
        .select(expr("graft_eq_count(a, b)")).collect()
    }
    assert(err.getMessage.contains("dimension mismatch") ||
      Option(err.getCause).exists(_.getMessage.contains("dimension mismatch")))
  }

  test("graft_dot is bit-equal to the HOF fold and rejects dim mismatch") {
    import spark.implicits._
    // adversarial doubles: mixed magnitudes + signs make float addition
    // order-sensitive, so bit-equality here proves the SAME left-to-right
    // fold as the aggregate(zip_with(...)) reference formula
    val rnd = new scala.util.Random(7)
    val vecs = (1 to 50).map { i =>
      (i.toLong,
        Array.fill(64)(rnd.nextDouble * math.pow(10, rnd.nextInt(7) - 3)
          * (if (rnd.nextBoolean()) 1 else -1)),
        Array.fill(64)(rnd.nextDouble * 2 - 1))
    }
    val df = vecs.toDF("id", "a", "b").repartition(2)
      .withColumn("fast", expr("graft_dot(a, b)"))
      .withColumn("ref", expr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(4)),
        s"graft_dot diverged from the HOF fold on id ${r.getLong(0)}")
    }
    // null input -> null (BinaryExpression null-safety)
    val n = Seq((null.asInstanceOf[Array[Double]], Array(1.0)))
      .toDF("a", "b").repartition(2)
      .select(expr("graft_dot(a, b)")).collect()
    assert(n(0).isNullAt(0))
    // a dimension bug must fail loudly, not null-pad like zip_with
    val err = intercept[org.apache.spark.SparkException] {
      Seq((Array(1.0, 2.0), Array(1.0))).toDF("a", "b").repartition(2)
        .select(expr("graft_dot(a, b)")).collect()
    }
    assert(err.getMessage.contains("dimension mismatch") ||
      Option(err.getCause).exists(_.getMessage.contains("dimension mismatch")))
  }

  test("null ARRAY ELEMENTS fail loudly in both kernels, never read as zero") {
    import spark.implicits._
    // built off a non-foldable column so the guard runs at execution, not
    // during constant folding; an UnsafeArrayData would silently read the
    // null element as 0.0/0 without the guard
    def run(sql: String): Throwable = intercept[Throwable] {
      Seq(Tuple1(1.0)).toDF("x").repartition(2).selectExpr(sql).collect()
    }
    def msg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage)
        ++ Iterator.single("")).mkString(" | ")
    val eDot = run("graft_dot(array(x, cast(null as double)), array(1.0d, 2.0d))")
    assert(msg(eDot).contains("null element"), msg(eDot))
    val eEq = run(
      "graft_eq_count(array(cast(x as bigint), cast(null as bigint)), array(1L, 0L))")
    assert(msg(eEq).contains("null element"), msg(eEq))
  }

  test("q22's HLL bound gate passes in-bound estimates and raises on violations") {
    import spark.implicits._
    import graft.queries.RelationalQueries2.hllWithinBound
    def msg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(c => Option(c.getMessage).getOrElse("")) ++ Iterator.single(""))
        .mkString(" | ")
    // 2% off with rsd=0.02: inside 3 sigma, flows through unchanged
    val ok = Seq((102L, 100L)).toDF("a", "e").repartition(2)
      .select(hllWithinBound(col("a"), col("e"), 0.02).as("v")).collect()
    assert(ok.head.getLong(0) == 102L)
    // 2x off: an engine bug, not sketch noise — the query itself throws
    val err = intercept[Throwable] {
      Seq((200L, 100L)).toDF("a", "e").repartition(2)
        .select(hllWithinBound(col("a"), col("e"), 0.02)).collect()
    }
    assert(msg(err).contains("HLL estimate outside"), msg(err))
  }

  test("graft_winnow matches the HOF window-min reference formula " +
    "(incl. repeated grams, astral code points) and fuses into codegen") {
    import spark.implicits._
    assert(spark.catalog.functionExists("graft_winnow"))
    // the d53 reference formulation (the one the DuckDB oracle mirrors
    // with SQL windows): positional grams, graft_rollhash keys with the
    // rightmost-min encoding h*2^31 + (2^31-1-pos), per-window
    // array_min, distinct
    def ref(df: org.apache.spark.sql.DataFrame, n: Int, w: Int, seed: Long) = df
      .withColumn("toks", expr("filter(split(text, ' '), t -> t <> '')"))
      .withColumn("gs", expr(
        s"""CASE WHEN size(toks) >= $n
              THEN transform(sequence(0, size(toks) - $n),
                     i -> array_join(slice(toks, i + 1, $n), ' '))
              ELSE slice(toks, 1, 0) END"""))
      .withColumn("keys", expr(
        s"""transform(gs, (g, i) ->
              graft_rollhash(g, ${seed}L) * 2147483648L + 2147483647L - i)"""))
      .withColumn("sel_keys", expr(
        s"""CASE WHEN size(gs) >= $w
              THEN array_distinct(transform(sequence(${w - 1}, size(gs) - 1),
                     q -> array_min(slice(keys, q - ${w - 2}, $w))))
              ELSE array_remove(array(0L), 0L) END"""))
      .withColumn("r_fps", array_distinct(expr(
        s"""transform(sel_keys, k -> md5(element_at(gs,
              CAST(2147483647L - pmod(k, 2147483648L) AS INT) + 1)))""")))
      .select($"doc_id", size($"gs").cast("long").as("r_n_grams"),
        size($"sel_keys").cast("long").as("r_n_sel"), $"r_fps")
    val edges = Seq(
      "", " ", "one", "a b c d e f g",                // 0..7 toks: sub-gram
      "a b c d e f g h",                              // exactly one 8-gram
      "a b c d e f g h i j k",                        // 4 grams = one window
      "w w w w w w w w w w w w w w w w",              // all grams identical
      "a𐍈 é b c d e f g h i j k l m n o p q",         // astral + accents
      (0 until 40).map(i => s"t${i % 6}").mkString(" ")) // heavy gram repeats
      .zipWithIndex.map { case (t, i) => (950000L + i, t) }
    val docs = Tables(spark, sfSmoke, "documents").select($"doc_id", $"text")
      .union(edges.toDF("doc_id", "text"))
    for ((n, w) <- Seq((8, 4), (2, 3), (1, 1), (3, 9))) {
      val joined = ref(docs, n, w, 17L)
        .join(docs.select($"doc_id",
          expr(s"graft_winnow(text, $n, $w, 17L)").as("wn")), "doc_id")
      joined.collect().foreach { r =>
        val wn = r.getStruct(r.fieldIndex("wn"))
        val id = r.getLong(r.fieldIndex("doc_id"))
        assert(r.getLong(r.fieldIndex("r_n_grams")) == wn.getLong(0),
          s"doc $id n_grams (n=$n w=$w)")
        assert(r.getLong(r.fieldIndex("r_n_sel")) == wn.getLong(1),
          s"doc $id n_sel (n=$n w=$w)")
        assert(r.getSeq[String](r.fieldIndex("r_fps")) == wn.getSeq[String](2),
          s"doc $id sel_fps order/content (n=$n w=$w)")
      }
    }
    // null text yields null; the expression fuses into codegen
    val nulls = Seq((1L, null: String), (2L, "a b c d e f g h i j k"))
      .toDF("doc_id", "text").repartition(2)
      .select(expr("graft_winnow(text, 8, 4, 17L)").as("wn"))
    val rows = nulls.collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    val plan = nulls.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[graft_winnow.*"), plan)
  }
}
