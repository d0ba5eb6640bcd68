package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.etl.{Compact, EtlConfig, LogGen, Transform}
import graft.operators.{MinHashAgg, TextHash}
import graft.streaming.Metrics

/** Lake-maintenance + UDAF + metrics coverage. */
class MaintenanceSpec extends SparkSpec {

  test("csv and json sinks round-trip the typed log table (S1-S4 superset)") {
    import spark.implicits._
    import graft.etl._
    val tmp = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val typed = AccessLogSchema.typedView(
      AccessLogParser.parse(LogGen.lines(120, seed = 41).toDF("value")))
      .drop("ExtraFields") // array col: csv is a flat format
      .withColumn("ts", col("ts").cast("string"))
    typed.write.option("header", "true").csv(s"$tmp/csv")
    typed.write.json(s"$tmp/json")
    val backCsv = spark.read.option("header", "true").csv(s"$tmp/csv")
    val backJson = spark.read.json(s"$tmp/json")
    assert(backCsv.count() == 120 && backJson.count() == 120)
    assert(backCsv.columns.toSet == typed.columns.toSet)
    // values survive: RequestIDs round-trip through both formats
    val ids = typed.select("RequestID").collect().map(_.getString(0)).toSet
    assert(backCsv.select("RequestID").collect().map(_.getString(0)).toSet == ids)
    assert(backJson.select("RequestID").collect().map(_.getString(0)).toSet == ids)
  }

  test("MinHashAgg (typed Aggregator) equals the HOF signature exactly") {
    import spark.implicits._
    val docs = Tables(spark, sfSmoke, "documents").limit(100)
      .withColumn("th", expr(TextHash.sparkTokenHashes("text")))
      .withColumn("sh", expr(TextHash.sparkShingles("th")))
    val viaHof = docs
      .select($"doc_id", expr(TextHash.sparkMinhash("sh")).as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // exploded shingles → partial-aggregating UDAF (map-side combine)
    val agg = org.apache.spark.sql.functions.udaf(MinHashAgg)
    val viaUdaf = docs
      .select($"doc_id", explode($"sh").as("sh1"))
      .groupBy($"doc_id").agg(agg($"sh1").as("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // UDAF path must cover every doc that HAS shingles (empty-shingle
    // docs produce the sentinel signature in the HOF path and no row at
    // all after explode — none exist in this corpus, but don't let a
    // row-dropping regression hide behind a subset check)
    val expected = viaHof.filter(_._2.exists(_ != TextHash.P)).keySet
    assert(viaUdaf.keySet == expected)
    viaUdaf.foreach { case (k, v) => assert(v == viaHof(k), s"doc $k") }
  }

  test("compaction merges small files, conserves data, commits per partition") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact").toString
    val in = s"$tmp/in"; val out = s"$tmp/out"
    LogGen.lines(2000, seed = 51).toDF("value").repartition(8).write.text(in)
    // force many tiny files per partition
    Transform.run(spark, Seq(in), out, EtlConfig(maxRecordsPerFile = 50))
    val idsBefore = spark.read.parquet(out)
      .select("RequestID").collect().map(_.getString(0)).sorted.toSeq
    val stats = Compact.run(spark, out, Seq("year", "month", "day", "hour"))
    assert(stats.rows == 2000)
    assert(stats.files1 < stats.files0,
      s"expected fewer files, got ${stats.files0} -> ${stats.files1}")
    // VALUES conserved, not just counts
    val idsAfter = spark.read.parquet(out)
      .select("RequestID").collect().map(_.getString(0)).sorted.toSeq
    assert(idsAfter == idsBefore)
    // object-store-safe commit: the live tree was never swapped through a
    // sibling rename — no retired copy, no staging leftovers, and the
    // lake path itself is the original directory
    val siblings = Option(new java.io.File(tmp).listFiles).toSeq.flatten.map(_.getName)
    assert(siblings.sorted == Seq("in", "out"),
      s"commit left top-level artifacts: $siblings")
    // partition dirs survived in place with compacted files inside
    val partDirs = Option(new java.io.File(out).listFiles).toSeq.flatten
      .filter(_.isDirectory).map(_.getName)
    assert(partDirs.nonEmpty && partDirs.forall(_.startsWith("year=")))
  }

  test("compaction of an UNPARTITIONED lake (the streaming signature-table sidecar)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-cmp-flat").toString
    // the shape writerWithSignatures produces: one small parquet append
    // per micro-batch, no partition columns
    (1 to 4).foreach { b =>
      (1 to 50).map(i => (b * 1000L + i, s"fp$b-$i"))
        .toDF("doc_id", "fp").repartition(3)
        .write.mode("append").parquet(s"$tmp/sigs")
    }
    val before = spark.read.parquet(s"$tmp/sigs")
    val rows = before.collect().toSet
    val st = Compact.run(spark, s"$tmp/sigs", Seq.empty)
    assert(st.rows == 200 && st.files1 < st.files0,
      s"no compaction happened: ${st.files0} -> ${st.files1}")
    assert(spark.read.parquet(s"$tmp/sigs").collect().toSet == rows)
  }

  test("bucketed tables co-locate the join: zero shuffle exchanges in the plan") {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("graft-bucket").toString
    val orders = Tables(spark, sfSmoke, "orders")
    val customer = Tables(spark, sfSmoke, "customer")
    // bucketBy the JOIN KEY with equal bucket counts on both sides: each
    // bucket pair joins in place — the pre-shuffled lake layout that
    // eliminates the exchange for every future join on that key (the
    // 100 TB answer to repeated fact-dim joins; requires saveAsTable,
    // bucket metadata lives in the catalog)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$tmp/b_orders").saveAsTable("b_orders")
    customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$tmp/b_customer").saveAsTable("b_customer")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // force the sort-merge path — a broadcast join would hide the
      // bucketing evidence (it never shuffles anyway)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).count()
      val rows = j.collect()
      assert(rows.map(_.getLong(1)).sum == orders.count())
      val plan = j.queryExecution.executedPlan.toString
      // the JOIN runs on bucket-aligned scans: the only exchange in the
      // whole plan is the one the aggregation needs
      val joinSection = plan.split("HashAggregate").last
      assert(joinSection.contains("SortMergeJoin"), plan)
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("streaming metrics listener records per-batch throughput (M1)") {
    import java.nio.file.Paths
    import org.apache.spark.sql.streaming.Trigger
    import graft.etl.StreamingTransform
    val tmp = Files.createTempDirectory("graft-mon").toString
    val landing = s"$tmp/landing"
    Files.createDirectories(Paths.get(landing))
    Files.writeString(Paths.get(landing, "b1.log"),
      LogGen.lines(500, seed = 52).mkString("", "\n", "\n"))
    val m = Metrics.attach(spark)
    try {
      val q = StreamingTransform.stream(spark, landing)
        .writeStream.format("noop")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      // listener events are delivered asynchronously
      val deadline = System.currentTimeMillis() + 30000
      while (m.snapshot.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(200)
      assert(m.snapshot.nonEmpty)
      assert(m.snapshot.map(_.inputRows).sum == 500)
    } finally spark.streams.removeListener(m)
  }

  test("queue counters surface receives, redeliveries, heartbeats and dead-letters") {
    import java.nio.file.Paths
    import org.apache.spark.sql.streaming.Trigger
    import graft.etl.StreamingTransform
    import graft.sources.{FileQueue, QueueRegistry}
    import graft.streaming.QueueMetrics
    def event(key: String) =
      s"""{"Records":[{"eventName":"ObjectCreated:Put","awsRegion":"us-east-1",""" +
        s""""s3":{"bucket":{"name":"logs-bucket"},"object":{"key":"$key","size":123}}}]}"""
    // --- drain path: receives + heartbeats -------------------------------
    // two messages at one message per trigger: trigger 2's latestOffset
    // runs while batch 1 is still uncommitted (the engine commits batch N
    // when batch N+1 starts), so its in-flight receipt is heartbeated —
    // deterministic lease_extensions >= 1
    var now = 5000000L
    val tmp = Files.createTempDirectory("graft-qmon").toString
    val objects = s"$tmp/objects"
    Files.createDirectories(Paths.get(objects))
    for (n <- Seq("a.log", "b.log")) {
      Files.writeString(Paths.get(objects, n),
        LogGen.lines(20, seed = 91).mkString("", "\n", "\n"))
    }
    val q = new FileQueue(s"$tmp/queue", visibilityTimeoutSeconds = 60,
      clock = () => now)
    QueueRegistry.register("mon-drain", q)
    q.enqueue(event("a.log")); q.enqueue(event("b.log"))
    StreamingTransform.queueNotificationPipeline(spark, "mon-drain",
        s"$tmp/out", s"$tmp/ckpt", (_, key) => s"$objects/$key",
        maxMessagesPerTrigger = 1)
      .trigger(Trigger.AvailableNow()).start().awaitTermination(120000)
    val drain = QueueMetrics.snapshot("mon-drain")
    assert(drain("received") == 2, drain)
    assert(drain("redelivered") == 0 && drain("max_receive_count") == 1, drain)
    assert(drain("lease_extensions") >= 1, drain)
    assert(drain("dead_lettered") == 0, drain)
    // --- poison path: redelivery counts + dead-letter --------------------
    val q2 = new FileQueue(s"$tmp/queue2", visibilityTimeoutSeconds = 60,
      clock = () => now)
    QueueRegistry.register("mon-poison", q2)
    q2.enqueue(event("ghost.log")) // the object never existed
    val run = () => {
      val query = StreamingTransform.queueNotificationPipeline(spark,
          "mon-poison", s"$tmp/out2", s"$tmp/ckpt2",
          (_, key) => s"$objects/$key", maxReceives = 1)
        .trigger(Trigger.AvailableNow()).start()
      try { query.awaitTermination(120000); true }
      catch {
        case _: org.apache.spark.sql.streaming.StreamingQueryException => false
      }
    }
    assert(!run()) // delivery 1 crashes the query; message stays queued
    now += 61000   // lease expires
    assert(run())  // delivery 2 > maxReceives: dead-lettered + acked
    val poison = QueueMetrics.snapshot("mon-poison")
    assert(poison("received") == 2, poison)
    assert(poison("redelivered") == 1 && poison("max_receive_count") == 2, poison)
    assert(poison("dead_lettered") == 1, poison)
  }

  test("sidecar compaction resumes an interrupted commit without double-counting") {
    import spark.implicits._
    import graft.queries.DocumentQueries
    import org.apache.hadoop.fs.Path
    val tmp = Files.createTempDirectory("graft-sidecar-crash").toString
    val dir = s"$tmp/spansigs"
    def paras(rows: (Long, Seq[String])*) = rows.toSeq
      .flatMap { case (id, ps) =>
        ps.zipWithIndex.map { case (p, i) => (id, i, p) } }
      .toDF("doc_id", "pos", "para")
    DocumentQueries.spanSignatures(paras(1L -> Seq("alpha", "LICENSE")))
      .write.parquet(s"$dir/batch=0")
    DocumentQueries.spanSignatures(paras(2L -> Seq("LICENSE", "beta")))
      .write.parquet(s"$dir/batch=1")
    val fold = DocumentQueries.foldSpanSignatures _
    def conserve(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val r = df.agg(coalesce(sum($"df"), lit(0L)),
        countDistinct($"para_fp")).head
      Seq(r.getLong(0), r.getLong(1))
    }
    // reconstruct the WORST crash point: the staged fold verified and
    // the commit marker published, but nothing deleted or moved yet —
    // the root still holds every original row AND the staged fold. A
    // naive re-run would take its conservation baseline from that
    // doubled root and bless it permanently.
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val cols = Seq("para_fp", "df", "canon_doc", "canon_pos")
    fold(spark.read.parquet(dir).select(cols.head, cols.tail: _*))
      .write.parquet(s"$dir.compact-staging")
    val origFiles = fs.listStatus(new Path(s"$dir/batch=1"))
      .filter(_.isFile).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
    val marker = ("batch=1" +: (origFiles.map("file:" + _).toSeq :+ "gen:batch=0"))
      .mkString("", "\n", "\n")
    val out = fs.create(new Path(s"$dir.compact-commit"), true)
    out.write(marker.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    val st = Compact.sidecar(spark, dir, fold, conserve)
    // resumed, not re-planned: one generation, and the folded table
    // carries exactly the clean sums (LICENSE df = 2, 3 distinct spans)
    assert(new java.io.File(dir).listFiles
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSeq ==
      Seq("batch=1"))
    assert(conserve(spark.read.parquet(dir)
      .select(cols.head, cols.tail: _*)) == Seq(4L, 3L))
    assert(st.rows == 3L, st)
    assert(!fs.exists(new Path(s"$dir.compact-commit")) &&
      !fs.exists(new Path(s"$dir.compact-staging")))
  }

  test("Materialize knob: reliable checkpoint under spark.graft.checkpoint.dir") {
    import spark.implicits._
    // The cluster-robustness knob (VERDICT r12 #1): with a checkpoint dir
    // configured, the iterative/disposition operators' eager
    // materializations must go through RELIABLE checkpoint() — files in
    // the dir, NO executor-resident locally-checkpointed RDDs left in the
    // persistence catalog — and produce the identical result.
    val dir = Files.createTempDirectory("graft-ckpt").toString
    val docs = Tables(spark, sfSmoke, "documents")
      .limit(200).select("doc_id", "text")
    // baseline: default backend (localCheckpoint) result + its footprint.
    // The returned frame's blocks stay registered (the documented
    // lifecycle) — capture the catalog before/after diff per run.
    val localResult = graft.queries.DedupQueries.dedupApply(docs)
      .orderBy("doc_id").collect().toSeq
    val before = spark.sparkContext.getPersistentRDDs.keySet
    spark.conf.set(graft.Materialize.DirKey, dir)
    try {
      val disp = graft.queries.DedupQueries.dedupApply(docs)
      val reliableResult = disp.orderBy("doc_id").collect().toSeq
      // identical disposition under either backend
      assert(reliableResult == localResult)
      // checkpoint files actually landed in the configured dir
      def walk(f: java.io.File): Iterator[java.io.File] =
        Iterator(f) ++ Option(f.listFiles).iterator.flatten.flatMap(walk)
      assert(walk(new java.io.File(dir)).exists(_.isFile),
        s"no checkpoint files under $dir")
      // no locally-checkpointed RDD survives the operator: reliable
      // checkpoints live as FILES, not as executor block-manager entries,
      // so executor loss/decommission cannot strand the result
      val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
      assert(leaked.isEmpty, s"leaked persistent RDDs: $leaked")
      // the component loop also runs reliably end-to-end (the deepest
      // iterative consumer: per-round label checkpoints)
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
      val clusters = graft.queries.DedupQueries.connectedComponents(pairs)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(clusters.toSeq ==
        Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
    } finally spark.conf.unset(graft.Materialize.DirKey)
  }

  test("sortedOnce under DirKey: identical rows, no checkpoint writes (r20)") {
    import spark.implicits._
    // ADVICE r19: the sortedOnce cut is a presentation-sort optimization,
    // not a lineage requirement — in reliable-checkpoint mode it must NOT
    // write every query's full result set to the checkpoint dir. DirKey
    // mode takes a plain orderBy instead (double kernel compute under the
    // sampler+sort, strictly cheaper than a result-set FS round-trip).
    val dir = Files.createTempDirectory("graft-ckpt-so").toString
    val df = Tables(spark, sfSmoke, "documents").limit(100)
      .select($"doc_id", length($"text").cast("long").as("n"))
    val expected = df.orderBy($"doc_id").collect().toSeq
    spark.conf.set(graft.Materialize.DirKey, dir)
    try {
      val got = graft.Materialize.sortedOnce(df, $"doc_id").collect().toSeq
      assert(got == expected)
      def walk(f: java.io.File): Iterator[java.io.File] =
        Iterator(f) ++ Option(f.listFiles).iterator.flatten.flatMap(walk)
      assert(!walk(new java.io.File(dir)).exists(_.isFile),
        "sortedOnce wrote a reliable checkpoint in DirKey mode")
    } finally spark.conf.unset(graft.Materialize.DirKey)
  }
}
