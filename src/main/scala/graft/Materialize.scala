package graft

import org.apache.spark.sql.DataFrame

/** Checkpoint-backend selector for the engine's eager materializations.
  *
  * The iterative and disposition operators (the dedup scope's pair/verify
  * results, connectedComponents' per-round labels, bpeTrain's per-round
  * vocab, dedupApply/dedupBest, s04's k-means rounds, CLI `curate`) all
  * need an EAGER cut of lineage: either because a loop would otherwise
  * grow the logical plan exponentially, or because several consumers must
  * read one computed result. Two backends exist and the right one is a
  * deployment property, not an operator property:
  *
  *   - `localCheckpoint(eager = true)` — blocks live on executors,
  *     lineage truncated. Fast (no FS round-trip) and correct on a
  *     single-JVM local[) master, but on a real cluster an executor loss
  *     (or dynamic-allocation decommission) makes the truncated-lineage
  *     RDD UNRECOVERABLE: the job dies with "Checkpoint block not found".
  *   - reliable `checkpoint(eager = true)` — partitions written to the
  *     SparkContext's checkpoint dir (HDFS/S3A/local path); any executor
  *     can re-read them, so the operators survive executor churn. Costs
  *     one write+read round-trip per materialization.
  *
  * Selection: when the session conf [[Materialize.DirKey]] is set
  * (non-empty), every engine materialization goes through reliable
  * `checkpoint()` into that directory — the 100 TB deployment shape.
  * Unset (the default), `localCheckpoint` keeps the local-mode fast path.
  * The SparkContext checkpoint dir is set lazily on first use and never
  * overridden if the embedding application already set one (last-wins
  * would silently redirect the application's own checkpoints).
  *
  * Cleanup contract, documented: reliable checkpoint FILES are reclaimed
  * by the ContextCleaner only under
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (off by
  * default upstream); a production deployment either enables that or
  * points [[DirKey]] at a per-run directory it deletes afterwards. The
  * CLI surfaces the knob as `$GRAFT_CHECKPOINT_DIR` (see [[Main]]).
  */
object Materialize {

  /** Session conf key: a directory URI (local, HDFS, or s3a://) enabling
    * reliable checkpointing for every engine materialization. */
  val DirKey = "spark.graft.checkpoint.dir"

  /** Eagerly materialize `df` through the configured backend. The
    * returned frame has truncated lineage either way — the operators'
    * lifecycle contracts (scope close after materialize, per-round block
    * reclamation) are backend-independent. */
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirKey).map(_.trim).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // set-once: respect a checkpoint dir the embedding app configured
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None =>
        df.localCheckpoint(eager = true)
    }
  }

  /** Postfix form (`df.materialize()`) so operator pipelines read the
    * same as the `.localCheckpoint(true)` chains they replace. */
  implicit final class Ops(private val df: DataFrame) extends AnyVal {
    def materialize(): DataFrame = Materialize(df)
  }
}
