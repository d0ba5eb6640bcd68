package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool: the recall-vs-(cells, rounds) measurement behind SCALE.md's
  * IVF-operating-point row. The gate pins the s04-family quantizer at
  * its spec defaults (16 cells, 1 Lloyd round) for oracle stability;
  * [[graft.queries.QueryConf]] is how a deployment scales those — this
  * main measures WHAT the knobs buy: top-k recall of the IVF scan
  * against the exact brute-force baseline, and the training+query wall,
  * across a (cells × rounds) grid on a ScaleGen corpus (whose
  * embeddings carry real 32-cluster structure, so the trained quantizer
  * has something to learn).
  *
  * Usage: `runMain graft.RecallSweep <dir> [cellsCsv] [roundsCsv]
  * [probesCsv]` (defaults 16,256 × 1,3,10 × 8) — one JSON line per
  * grid point.
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cellsGrid =
      if (args.length > 1) args(1).split(",").map(_.trim.toInt)
      else Array(16, 256)
    val roundsGrid =
      if (args.length > 2) args(2).split(",").map(_.trim.toInt)
      else Array(1, 3, 10)
    val probesGrid =
      if (args.length > 3) args(3).split(",").map(_.trim.toInt)
      else Array(8)
    val k = 10
    val nQ = 100L
    val spark = GraftSession.local(appName = "graft-recall-sweep")
    import spark.implicits._

    def topk(pairs: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
      val rnkW = Window.partitionBy($"q_id").orderBy($"cos_sim".desc, $"c_id")
      pairs
        .withColumn("cos_sim",
          round(expr("graft_dot(qv, cv)") / ($"qn" * $"cn"), 4))
        .withColumn("rnk", row_number().over(rnkW))
        .filter($"rnk" <= k)
        .select($"q_id", $"c_id")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (qid, ps) => qid -> ps.map(_._2).toSet }
    }

    // one corpus scan for the whole grid (typed vectors + norms are the
    // shared input of the baseline and every grid point)
    val e = Materialize(Tables(spark, dir, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("nrm", expr("sqrt(graft_dot(v, v))"))
      .select($"vec_id", $"v", $"nrm"))
    val q = e.filter($"vec_id" < nQ)
      .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qn"))
    val exact = topk(
      e.select($"vec_id".as("c_id"), $"v".as("cv"), $"nrm".as("cn"))
        .join(broadcast(q), $"q_id" =!= $"c_id"))
    System.err.println(s"[recall-sweep] exact baseline: ${exact.size} " +
      s"queries x top-$k over $dir")

    import graft.queries.EmbeddingQueries.{assignTo, trainCentroids}
    for (cells <- cellsGrid; rounds <- roundsGrid) {
      val tTrain0 = System.nanoTime()
      // train once per (cells, rounds); every nprobe point re-reads the
      // same materialized quantizer — probes are a query-time knob. The
      // corpus-to-cell assignment is INDEX BUILD (its cells×n scan cost
      // belongs in train_sec, and it must run once per quantizer, not
      // once per nprobe point), so it materializes here inside the
      // train timing.
      val c = trainCentroids(e, cells, rounds)
      val corpus = Materialize(assignTo(e, c).filter($"rn" === 1)
        .select($"vec_id".as("c_id"), $"v".as("cv"), $"nrm".as("cn"),
          $"cell"))
      val trainSec = (System.nanoTime() - tTrain0) / 1e9
      for (nProbe <- probesGrid) {
        val t0 = System.nanoTime()
        val probes = assignTo(e.filter($"vec_id" < nQ), c)
          .filter($"rn" <= math.min(nProbe, cells))
          .select($"vec_id".as("q_id"), $"v".as("qv"), $"nrm".as("qn"),
            $"cell".as("q_cell"))
        val ann = topk(corpus.join(broadcast(probes),
          $"q_cell" === $"cell" && $"q_id" =!= $"c_id"))
        val querySec = (System.nanoTime() - t0) / 1e9
        val recall = exact.map { case (qid, ex) =>
          ann.getOrElse(qid, Set.empty[Long]).intersect(ex).size.toDouble /
            ex.size
        }.sum / exact.size
        // Locale.ROOT: a comma decimal separator is invalid JSON
        println(String.format(java.util.Locale.ROOT,
          """{"cells":%d,"rounds":%d,"nprobe":%d,"k":%d,"recall":%.4f,""" +
            """"train_sec":%.2f,"query_sec":%.2f}""",
          Int.box(cells), Int.box(rounds), Int.box(nProbe), Int.box(k),
          Double.box(recall), Double.box(trainSec), Double.box(querySec)))
      }
    }
    spark.stop()
  }
}
