package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool (r19): the two measurements VERDICT r18 asked for on the
  * stored-artifact ANN path — both over a ScaleGen corpus at the 100k+
  * vector scale point, both through the SHIPPED contract
  * (`ivftrain` → `ivfindex` → [[graft.queries.EmbeddingQueries
  * .annRankTableIndexed]], parquet round-tripped like the CLI):
  *
  *  1. **Recall operating points for the rank-table contract**: recall@k
  *     of the artifact-path rank table vs the exact brute-force top-k
  *     (the s01 baseline), across a (cells × probes × k) grid — what
  *     `fuse` consumers actually get from the semantic half at
  *     deployment knobs. RecallSweep measures the INLINE s04 family;
  *     this measures the stored artifacts a deployment probes.
  *  2. **Cell-partition pruning A/B**: the same indexed probe against
  *     the Hive cell-partitioned index layout vs a FLAT (unpartitioned)
  *     rewrite of identical rows — interleaved same-JVM runs, min over
  *     3 — plus a plan check that the partitioned scan really carries
  *     `dynamicpruningexpression(cell IN ...)` (the claim three docs
  *     stated and nothing verified, VERDICT r18 "what's wrong" #3).
  *
  * Usage: `runMain graft.ScaleAnn <corpusDir> [cellsCsv] [probesCsv]
  * [kCsv] [rounds]` — defaults 16,64 × 4,8 × 5,10 × 1. One JSON line
  * per grid point; the A/B lines carry layout="cellpart"/"flat".
  */
object ScaleAnn {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    def csv(i: Int, dflt: Array[Int]): Array[Int] =
      if (args.length > i) args(i).split(",").map(_.trim.toInt) else dflt
    val cellsGrid = csv(1, Array(16, 64))
    val probesGrid = csv(2, Array(4, 8))
    val kGrid = csv(3, Array(5, 10))
    val rounds = if (args.length > 4) args(4).toInt else 1
    val kMax = kGrid.max
    val nQ = 100L
    val spark = GraftSession.local(appName = "graft-scale-ann")
    import spark.implicits._
    import graft.queries.{EmbeddingQueries, QueryConf}

    val work = java.nio.file.Files.createTempDirectory("graft-scale-ann")
      .toString

    // exact brute-force top-kMax (the s01 discipline: rounded sims,
    // doc-id ties) — ONE corpus-wide scan shared by every grid point
    val e = Materialize(Tables(spark, dir, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
      .select($"vec_id", $"v", $"nrm"))
    val rnkW = Window.partitionBy($"query_id").orderBy($"cos_sim".desc,
      $"doc_id")
    val exactAll = e.select($"vec_id".as("doc_id"), $"v".as("cv"),
        $"nrm".as("cn"))
      .join(broadcast(e.filter($"vec_id" < nQ).select($"vec_id".as("query_id"),
        $"v".as("qv"), $"nrm".as("qn"))), $"query_id" =!= $"doc_id")
      .withColumn("cos_sim",
        round(expr("graft_dot(qv, cv)") / ($"qn" * $"cn"), 4))
      .withColumn("rk", row_number().over(rnkW))
      .filter($"rk" <= kMax)
      .select($"query_id", $"rk", $"doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def exactAt(k: Int): Map[Long, Set[Long]] = exactAll
      .filter(_._2 <= k).groupBy(_._1)
      .map { case (qid, xs) => qid -> xs.map(_._3).toSet }
    System.err.println(s"[scale-ann] exact baseline: " +
      s"${exactAt(kMax).size} queries x top-$kMax over $dir")

    def recallOf(ranks: Array[(Long, Long)], k: Int): Double = {
      val ex = exactAt(k)
      val got = ranks.groupBy(_._1)
        .map { case (qid, xs) => qid -> xs.map(_._2).toSet }
      ex.map { case (qid, s) =>
        got.getOrElse(qid, Set.empty[Long]).intersect(s).size.toDouble /
          s.size }.sum / ex.size
    }
    def jnum(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

    val queries = Tables(spark, dir, "embeddings").filter($"vec_id" < nQ)

    for (cells <- cellsGrid) {
      spark.conf.set(QueryConf.IvfCellsKey, cells.toString)
      spark.conf.set(QueryConf.LloydRoundsKey, rounds.toString)
      val cDir = s"$work/cent_c$cells"
      val iDir = s"$work/idx_c$cells"
      val t0 = System.nanoTime()
      Main.run(spark, Seq("ivftrain", s"$dir/embeddings.parquet", cDir),
        Map.empty)
      Main.run(spark, Seq("ivfindex", s"$dir/embeddings.parquet", cDir,
        iDir), Map.empty)
      val buildSec = (System.nanoTime() - t0) / 1e9
      val cent = spark.read.parquet(cDir)
      for (probes <- probesGrid) {
        spark.conf.set(QueryConf.IvfProbesKey, probes.toString)
        val tq0 = System.nanoTime()
        val ranks = EmbeddingQueries.annRankTableIndexed(
            spark.read.parquet(iDir), queries, cent, k = kMax)
          .select($"query_id", $"rk", $"doc_id")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        val querySec = (System.nanoTime() - tq0) / 1e9
        for (k <- kGrid) {
          val rec = recallOf(ranks.filter(_._2 <= k).map(t => (t._1, t._3)),
            k)
          println(s"""{"mode":"recall","cells":$cells,"rounds":$rounds,""" +
            s""""probes":$probes,"k":$k,"recall":${jnum(rec)},""" +
            s""""build_sec":${jnum(buildSec)},"query_sec":${jnum(querySec)}}""")
        }
      }
      spark.conf.unset(QueryConf.IvfProbesKey)
    }

    // ---- pruning A/B at the deployment-ish point: max cells, min probes
    val abCells = cellsGrid.max
    val abProbes = probesGrid.min
    spark.conf.set(QueryConf.IvfCellsKey, abCells.toString)
    spark.conf.set(QueryConf.LloydRoundsKey, rounds.toString)
    spark.conf.set(QueryConf.IvfProbesKey, abProbes.toString)
    val cDir = s"$work/cent_c$abCells"
    val iPart = s"$work/idx_c$abCells"
    val iFlat = s"$work/idx_flat_c$abCells"
    // identical rows, no partition layout: what the index would be if
    // ivfindex didn't partitionBy(cell)
    spark.read.parquet(iPart).write.mode("overwrite").parquet(iFlat)
    val cent = spark.read.parquet(cDir)
    // the DEPLOYMENT probe shape: a small query batch (the d58 probe
    // convention), not the 100-query recall batch — 100 queries x 4
    // probes covers nearly every cell, leaving nothing to prune, which
    // is a property of the benchmark batch, not of the layout
    val nQab = 10L
    val queriesAb = Tables(spark, dir, "embeddings").filter($"vec_id" < nQab)
    def probeOnce(idxDir: String): Double = {
      val t0 = System.nanoTime()
      BenchExec.run(EmbeddingQueries.annRankTableIndexed(
        spark.read.parquet(idxDir), queriesAb, cent, k = kMax))
      (System.nanoTime() - t0) / 1e9
    }
    // the plan claim, checked on the partitioned layout
    val plan = EmbeddingQueries.annRankTableIndexed(
      spark.read.parquet(iPart), queriesAb, cent, k = kMax)
      .queryExecution.executedPlan.toString
    val dppLine = plan.linesIterator.find(l =>
      l.contains(iPart) && l.contains("PartitionFilters"))
    val dpp = dppLine.exists(_.contains("dynamicpruningexpression"))
    System.err.println(s"[scale-ann] partitioned index scan DPP=$dpp: " +
      dppLine.map(_.trim.take(240)).getOrElse("(scan line not found)"))
    // what pruning is worth in FILES/BYTES: the probed-cell dirs vs the
    // whole layout (the fraction a 1000-executor scan would not read)
    val probedCells = EmbeddingQueries.ivfIndexProbeCells(queriesAb, cent)
    def dirStats(d: java.io.File): (Int, Long) = {
      val fs = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      (fs.length, fs.map(_.length()).sum)
    }
    val cellDirs = new java.io.File(iPart).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    val (allN, allB) = cellDirs.map(dirStats).foldLeft((0, 0L)) {
      case ((n, b), (n2, b2)) => (n + n2, b + b2) }
    val probedDirs = cellDirs.filter(f =>
      probedCells.contains(f.getName.stripPrefix("cell=").toInt))
    val (prN, prB) = probedDirs.map(dirStats).foldLeft((0, 0L)) {
      case ((n, b), (n2, b2)) => (n + n2, b + b2) }
    probeOnce(iPart); probeOnce(iFlat) // untimed warmup, both layouts
    val (ps, fs) = (Array.newBuilder[Double], Array.newBuilder[Double])
    for (_ <- 1 to 3) { ps += probeOnce(iPart); fs += probeOnce(iFlat) }
    val (pMin, fMin) = (ps.result().min, fs.result().min)
    println(s"""{"mode":"prune_ab","cells":$abCells,"probes":$abProbes,""" +
      s""""k":$kMax,"queries":$nQab,"cellpart_sec":${jnum(pMin)},""" +
      s""""flat_sec":${jnum(fMin)},"dpp_fired":$dpp,""" +
      s""""probed_cells":${probedCells.size},""" +
      s""""files_scanned":$prN,"files_total":$allN,""" +
      s""""bytes_scanned":$prB,"bytes_total":$allB}""")
    spark.stop()
  }
}
