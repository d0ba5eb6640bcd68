package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{EmbeddingQueries, QueryConf}

/** Spec-pins the [[graft.queries.QueryConf]] surface AWAY from the gate
  * defaults: the driver's oracle gate replays only the defaults, so
  * without these the seed-table branch (cells > 64), the multi-round
  * Lloyd loop, and the non-default coreset/media knobs would be
  * unexercised code. Cross-engine (DuckDB) replay at the same operating
  * points runs through `graft.ConfReplay` + scripts/selfcheck.py —
  * results recorded in SCALE.md; these specs pin the Spark-side
  * invariants: path equivalence, determinism, and knob liveness.
  */
class QueryConfSpec extends SparkSpec {

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally kvs.foreach { case (k, _) => spark.conf.unset(k) }
  }

  private def emb(): DataFrame = {
    import spark.implicits._
    Tables(spark, sfSmoke, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
      .select($"vec_id", $"v", $"nrm")
  }

  private def centroidRows(c: DataFrame): Seq[(Long, Seq[Double], Double)] =
    c.select(col("cell").cast("long"), col("cv_sum"), col("cnorm"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1).toSeq

  test("malformed or out-of-range spark.graft.* values refuse loudly") {
    // a silently-defaulted typo would run the whole job at the wrong
    // scale — the accessor must throw, not fall back
    for (bad <- Seq("abc", "1e3", "", "0", "-3")) {
      withConf(QueryConf.IvfCellsKey -> bad) {
        val e = intercept[IllegalArgumentException](QueryConf.ivfCells(spark))
        assert(e.getMessage.contains(QueryConf.IvfCellsKey),
          s"refusal for '$bad' must name the offending key")
      }
    }
    // per-knob upper bounds hold too (cells caps at 65536, rounds at 100)
    withConf(QueryConf.IvfCellsKey -> "65537") {
      intercept[IllegalArgumentException](QueryConf.ivfCells(spark))
    }
    withConf(QueryConf.LloydRoundsKey -> "101") {
      intercept[IllegalArgumentException](QueryConf.lloydRounds(spark))
    }
    // tolerant of surrounding whitespace (a --conf value often carries it)
    withConf(QueryConf.IvfCellsKey -> " 24 ") {
      assert(QueryConf.ivfCells(spark) === 24)
    }
    // unset ⇒ the spec-pinned defaults
    assert(QueryConf.ivfCells(spark) === QueryConf.DefaultIvfCells)
    assert(QueryConf.lloydRounds(spark) === QueryConf.DefaultLloydRounds)
  }

  test("seed-table path assigns bit-identically to the literal seed path") {
    // trainCentroids switches representation at seedTableBar: the k×64
    // sign matrix as a PLAN LITERAL below it, a driver-tabulated
    // broadcast TABLE above. The scaladoc claims the two rank
    // identically (cnorm = √64 exactly, dividing every dot by the same
    // power of two is IEEE-exact) — this is the claim as a spec, via
    // the seedTableBar hook: same (cells, rounds), bar forced below
    // cells, learned centroids must be BIT-equal.
    val e = emb()
    val viaLiteral = EmbeddingQueries.trainCentroids(e, cells = 16,
      rounds = 1)
    val viaTable = EmbeddingQueries.trainCentroids(e, cells = 16,
      rounds = 1, seedTableBar = 4)
    assert(centroidRows(viaLiteral) === centroidRows(viaTable))
  }

  test("s04 at cells > 64 (seed-table branch) runs and is deterministic") {
    withConf(QueryConf.IvfCellsKey -> "80") {
      val run1 = SparkEntry.queries("s04_ann_ivf")(spark, sfSmoke).collect()
      val run2 = SparkEntry.queries("s04_ann_ivf")(spark, sfSmoke).collect()
      assert(run1.nonEmpty)
      assert(run1.toSeq === run2.toSeq)
    }
  }

  test("multi-round Lloyd (rounds=3) is deterministic and cell-bounded") {
    val e = emb()
    val a = EmbeddingQueries.trainCentroids(e, cells = 16, rounds = 3)
    val b = EmbeddingQueries.trainCentroids(e, cells = 16, rounds = 3)
    val ra = centroidRows(a)
    assert(ra === centroidRows(b))
    assert(ra.size <= 16)
    // and the query path reads the knob: s04 under rounds=3 returns the
    // same disposition on every run (cross-engine hash for this point:
    // ConfReplay rounds=3 + selfcheck, recorded in SCALE.md)
    withConf(QueryConf.LloydRoundsKey -> "3") {
      val r1 = SparkEntry.queries("s04_ann_ivf")(spark, sfSmoke).collect()
      assert(r1.nonEmpty)
      assert(r1.toSeq ===
        SparkEntry.queries("s04_ann_ivf")(spark, sfSmoke).collect().toSeq)
    }
  }

  test("s11 honors a non-default coreset.percell") {
    withConf(QueryConf.CoresetPerCellKey -> "5") {
      val out = SparkEntry.queries("s11_coreset_sample")(spark, sfSmoke)
      val perCell = out.groupBy(col("cell")).agg(
        count(lit(1)).as("n"),
        sum(when(col("decision") === "keep", 1L).otherwise(0L)).as("kept"),
        max(when(col("decision") === "keep", col("rank"))).as("max_keep_rank"))
        .collect()
      assert(perCell.nonEmpty)
      perCell.foreach { r =>
        val (n, kept) = (r.getLong(1), r.getLong(2))
        assert(kept === math.min(5L, n),
          s"cell ${r.get(0)}: kept $kept of $n at percell=5")
        assert(r.getLong(3) <= 5L)
      }
    }
  }

  test("m04 honors a non-default media.maxbucket") {
    def pairs(df: DataFrame): (Set[(Long, Long)], Set[(Long, Long)]) = {
      val rows = df.select(col("doc_a").cast("long"),
        col("doc_b").cast("long"), col("kind")).collect()
      (rows.filter(_.getString(2) == "exact")
         .map(r => (r.getLong(0), r.getLong(1))).toSet,
       rows.filter(_.getString(2) == "near")
         .map(r => (r.getLong(0), r.getLong(1))).toSet)
    }
    val (exactDflt, nearDflt) =
      pairs(SparkEntry.queries("m04_media_neardup")(spark, sfSmoke))
    val (exact1, near1) = withConf(QueryConf.MediaMaxBucketKey -> "1") {
      pairs(SparkEntry.queries("m04_media_neardup")(spark, sfSmoke))
    }
    // the cap only drops BAND BUCKETS: exact pairs are untouched, and a
    // tighter cap can only shrink the near set (monotone selectivity)
    assert(exact1 === exactDflt)
    assert(near1.subsetOf(nearDflt))
    assert(near1.size < nearDflt.size || nearDflt.isEmpty,
      "maxbucket=1 should drop at least one shared band bucket on a " +
        "corpus with planted near-dups")
  }

  test("the dedup band-bucket cap is a live session knob (dedup.maxbucket, " +
    "r16): malformed refuses, cap=1 kills every near-pair nomination, " +
    "the stored rep-index probe re-filters without an index rebuild") {
    for (bad <- Seq("abc", "0", "-3"))
      withConf(QueryConf.DedupMaxBucketKey -> bad) {
        val e = intercept[IllegalArgumentException] {
          SparkEntry.queries("d03_minhash_dedup_pairs")(spark, sfSmoke).count()
        }
        assert(e.getMessage.contains(QueryConf.DedupMaxBucketKey),
          e.getMessage)
      }
    // every near pair needs BOTH reps in one band bucket (occupancy >= 2),
    // so cap=1 deterministically nominates nothing — knob liveness on the
    // scope path without a fixture that guesses band collisions
    val dflt = SparkEntry.queries("d03_minhash_dedup_pairs")(spark, sfSmoke)
      .count()
    assert(dflt > 0, "gate corpus must carry near pairs for this test")
    withConf(QueryConf.DedupMaxBucketKey -> "1") {
      assert(SparkEntry.queries("d03_minhash_dedup_pairs")(spark, sfSmoke)
        .count() == 0,
        "cap=1 must drop every >=2-member band bucket")
    }
    // the stored artifact carries RAW occupancy: a cap change re-filters
    // the SAME index at probe time — no rebuild, the whole point of
    // storing counts instead of a pre-capped band list. (Unlike the
    // within-corpus scope above, an INDEXED near hit needs only
    // corpus-side occupancy >= 1 — the batch rep is not in the stored
    // count — so liveness is pinned on the plan literal, not row
    // counts.) The probe plan must carry the session value as a plain
    // pushable filter over the stored column.
    import graft.queries.DedupQueries
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val docs = Tables(spark, sfSmoke, "documents")
    val idx = graft.Materialize(DedupQueries.repIndex(
      DedupQueries.signatureTable(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 4))))
    val batchSigs = DedupQueries.signatureTable(
      docs.filter(pmod(col("doc_id"), lit(5)) === 4))
    val plan7 = withConf(QueryConf.DedupMaxBucketKey -> "7") {
      DedupQueries.indexedProbePlan(idx, batchSigs)
        .queryExecution.optimizedPlan.toString
    }
    assert(plan7.contains("<= 7)"),
      s"probe plan must filter the stored bucket_n at the session cap:\n$plan7")
    assert(!DedupQueries.indexedProbePlan(idx, batchSigs)
      .queryExecution.optimizedPlan.toString.contains("<= 7)"),
      "the default plan must not carry the non-default cap")
  }

  test("d46/d48 honor non-default dsir.hexchars and domain.cells") {
    // the last two knobs of the matrix: d46's hashed-feature space at
    // 4096 buckets (hexchars=3) and d48's cluster count at 4 — each
    // must run, stay deterministic, and show the knob actually moved
    // the plan (bucket/cell ids within the configured range)
    withConf(QueryConf.DsirHexCharsKey -> "3") {
      val r1 = SparkEntry.queries("d46_dsir_weights")(spark, sfSmoke).collect()
      assert(r1.nonEmpty)
      assert(r1.toSeq ===
        SparkEntry.queries("d46_dsir_weights")(spark, sfSmoke).collect().toSeq)
    }
    withConf(QueryConf.DomainCellsKey -> "4") {
      val out = SparkEntry.queries("d48_domain_clusters")(spark, sfSmoke)
      val cells = out.select(col("cluster").cast("long")).distinct()
        .collect().map(_.getLong(0))
      assert(cells.nonEmpty && cells.forall(c => c >= 0 && c < 4),
        s"domain.cells=4 but assigned cells ${cells.mkString(",")}")
    }
  }

  test("the gate oracles are the generators at the QueryConf defaults") {
    // ConfReplay replays NON-default points through the same generators
    // the gate entries are built from — this pin makes re-inlining the
    // gate SQL (and letting the two drift) a test failure
    assert(SparkEntry.oracleSql("s04_ann_ivf") ===
      EmbeddingQueries.s04OracleSqlAt(QueryConf.DefaultIvfCells,
        QueryConf.DefaultIvfProbes, QueryConf.DefaultLloydRounds))
    assert(SparkEntry.oracleSql("s11_coreset_sample") ===
      EmbeddingQueries.s11OracleSqlAt(QueryConf.DefaultIvfCells,
        QueryConf.DefaultLloydRounds, QueryConf.DefaultCoresetPerCell))
    assert(SparkEntry.oracleSql("s10_sem_decontam") ===
      EmbeddingQueries.s10OracleSqlAt(QueryConf.DefaultIvfCells,
        QueryConf.DefaultIvfProbes, QueryConf.DefaultLloydRounds))
    assert(SparkEntry.oracleSql("s08_ivfpq_rerank") ===
      EmbeddingQueries.s08OracleSqlAt(QueryConf.DefaultIvfCells,
        QueryConf.DefaultLloydRounds))
    assert(SparkEntry.oracleSql("s09_semdedup") ===
      EmbeddingQueries.s09OracleSqlAt(QueryConf.DefaultIvfCells,
        QueryConf.DefaultLloydRounds))
    assert(SparkEntry.oracleSql("d52_containment_pairs") ===
      graft.queries.DocumentQueries.d52OracleSqlAt(
        QueryConf.DefaultContainRareCap))
    assert(SparkEntry.oracleSql("d53_winnow_fps") ===
      graft.queries.DocumentQueries.d53OracleSqlAt(
        QueryConf.DefaultWinnowWindow))
    assert(SparkEntry.oracleSql("d54_winnow_matches") ===
      graft.queries.DocumentQueries.d54OracleSqlAt(
        QueryConf.DefaultWinnowWindow, QueryConf.DefaultWinnowMaxDf))
    assert(SparkEntry.oracleSql("s12_pq_encode_incremental") ===
      EmbeddingQueries.s12OracleSqlAt(QueryConf.DefaultIvfCells,
        QueryConf.DefaultLloydRounds))
    assert(SparkEntry.oracleSql("d56_bm25_topk") ===
      graft.queries.DocumentQueries.d56OracleSqlAt(
        QueryConf.DefaultBm25TopK))
    assert(SparkEntry.oracleSql("s14_knn_graph") ===
      EmbeddingQueries.s14OracleSqlAt(QueryConf.DefaultIvfCells,
        QueryConf.DefaultLloydRounds, QueryConf.DefaultKnnK))
  }

  test("the r15b knobs (containment.rarecap, winnow.window) refuse " +
    "malformed values like the rest of the surface") {
    for (bad <- Seq("abc", "0", "-1")) {
      withConf(QueryConf.ContainRareCapKey -> bad) {
        val e = intercept[IllegalArgumentException](
          QueryConf.containRareCap(spark))
        assert(e.getMessage.contains(QueryConf.ContainRareCapKey))
      }
      withConf(QueryConf.WinnowWindowKey -> bad) {
        val e = intercept[IllegalArgumentException](
          QueryConf.winnowWindow(spark))
        assert(e.getMessage.contains(QueryConf.WinnowWindowKey))
      }
      withConf(QueryConf.WinnowMaxDfKey -> bad) {
        val e = intercept[IllegalArgumentException](
          QueryConf.winnowMaxDf(spark))
        assert(e.getMessage.contains(QueryConf.WinnowMaxDfKey))
      }
      withConf(QueryConf.Bm25TopKKey -> bad) {
        val e = intercept[IllegalArgumentException](
          QueryConf.bm25TopK(spark))
        assert(e.getMessage.contains(QueryConf.Bm25TopKKey))
      }
      withConf(QueryConf.KnnKKey -> bad) {
        val e = intercept[IllegalArgumentException](QueryConf.knnK(spark))
        assert(e.getMessage.contains(QueryConf.KnnKKey))
      }
      withConf(QueryConf.KnnNprobeKey -> bad) {
        val e = intercept[IllegalArgumentException](QueryConf.knnNprobe(spark))
        assert(e.getMessage.contains(QueryConf.KnnNprobeKey))
      }
    }
    withConf(QueryConf.ContainRareCapKey -> " 12 ") {
      assert(QueryConf.containRareCap(spark) === 12)
    }
    assert(QueryConf.containRareCap(spark) ===
      QueryConf.DefaultContainRareCap)
    assert(QueryConf.winnowWindow(spark) === QueryConf.DefaultWinnowWindow)
  }

  test("materializeWithConf never touches the shared session conf and " +
    "leaves no temp view behind (ADVICE r17: the set/restore form leaked " +
    "the override to concurrently-planned queries on the same session)") {
    import spark.implicits._
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val before = spark.conf.getOption(key)
    val viewsBefore = spark.catalog.listTables().count()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "g")
      .groupBy($"g").agg(count(lit(1)).as("n"))
    val out = QueryConf.materializeWithConf(df, key, "12345")
    // the result is correct and lineage-truncated (consumable anywhere,
    // including joined back against parent-session frames)
    assert(out.collect().map(r => (r.getString(0), r.getLong(1))).sorted
      .toSeq == Seq(("a", 2L), ("b", 1L)))
    assert(out.join(Seq("a").toDF("g"), "g").count() == 1)
    // the RETURNED frame is re-bound to the parent session (self-review
    // r18): a clone-bound result would plan every chained query under
    // the override — the leak, one hop later
    assert(out.sparkSession eq spark,
      "materializeWithConf must return a parent-session-bound frame")
    assert(out.sparkSession.conf.getOption(key) == before)
    // the parent session's conf was NEVER set — not merely restored
    assert(spark.conf.getOption(key) == before)
    // nothing leaked into the parent's catalog
    assert(spark.catalog.listTables().count() == viewsBefore)
    // the failure path (materialization is eager, so the error fires
    // inside the scope) leaves the parent equally untouched
    intercept[Exception] {
      QueryConf.materializeWithConf(
        df.withColumn("boom", expr("raise_error('x')")), key, "12345")
    }
    assert(spark.catalog.listTables().count() == viewsBefore)
    assert(spark.conf.getOption(key) == before)
  }

  test("materializeWithConf under real concurrency: a thread planning " +
    "on the shared session NEVER observes the override, and concurrent " +
    "scopes do not interact (the ADVICE r17 leak, pinned)") {
    import spark.implicits._
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    // getOption surfaces the REGISTERED DEFAULT ("128") for SQL confs, so
    // "untouched" means "still reads the baseline", not "absent"
    val baseline = spark.conf.getOption(key)
    assert(!baseline.exists(_.startsWith("1000")),
      s"precondition: baseline must not collide with the sentinels: $baseline")
    val df = (1L to 200L).map(i => (i, (i % 7).toString)).toDF("id", "g")
      .groupBy($"g").agg(count(lit(1)).as("n"))
    val leaked = new java.util.concurrent.atomic.AtomicReference[String](null)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    // the observer: plan + run queries on the PARENT session in a loop,
    // recording any sighting of a non-baseline value (the r17 set/restore
    // form fails this within a few iterations)
    val observer = new Thread(() => {
      while (!stop.get()) {
        val v = spark.conf.getOption(key)
        if (v != baseline) leaked.compareAndSet(null, v.orNull)
        // planning reads SQLConf; run a real plan-build too
        df.queryExecution.optimizedPlan
        val v2 = spark.conf.getOption(key)
        if (v2 != baseline) leaked.compareAndSet(null, v2.orNull)
      }
    })
    observer.start()
    try {
      // several scoped materializations, two of them racing each other
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      val futs = (1 to 4).map { i =>
        Future(QueryConf.materializeWithConf(df, key, s"1000$i")
          .agg(sum($"n")).collect().head.getLong(0))
      }
      val sums = futs.map(f => Await.result(f, 120.seconds))
      pool.shutdown()
      assert(sums.forall(_ == 200L), sums)
    } finally {
      stop.set(true)
      observer.join(10000)
    }
    assert(leaked.get() == null,
      s"parent session observed the scoped override: ${leaked.get()}")
    assert(spark.conf.getOption(key) == baseline)
  }
}
