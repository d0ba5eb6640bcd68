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

  /** The last directory THIS object applied to the SparkContext —
    * distinguishes "the embedding application set its own checkpoint
    * dir" (never overridden) from "a previous Materialize call set it
    * from an earlier conf value" (re-applied when the conf changes, so
    * a long-lived session that switches [[DirKey]] between runs — the
    * README's per-run-directory cleanup pattern — does not keep
    * checkpointing into a deleted path). */
  @volatile private var appliedDir: Option[String] = None

  /** Eagerly materialize `df` through the configured backend. The
    * returned frame has truncated lineage either way — the operators'
    * lifecycle contracts (scope close after materialize, per-round block
    * reclamation) are backend-independent. */
  def apply(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirKey).map(_.trim).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // apply when unset, or when OUR previously-applied conf dir
        // changed; a dir the embedding app set itself (checkpoint dir
        // present, appliedDir empty) is never overridden
        if (appliedDir != Some(dir) &&
            (sc.getCheckpointDir.isEmpty || appliedDir.isDefined)) {
          sc.setCheckpointDir(dir)
          appliedDir = Some(dir)
        }
        // persist around the checkpoint: RDD.checkpoint's write job
        // re-executes the lineage AFTER the eager count unless the data
        // is cached (the documented RDD.checkpoint recomputation) — an
        // unpersisted reliable checkpoint would run every engine
        // materialization TWICE, doubling exactly the deployment mode
        // this knob exists for
        val cached = df.persist()
        try cached.checkpoint(eager = true)
        finally { cached.unpersist(blocking = false); () }
      case None =>
        df.localCheckpoint(eager = true)
    }
  }

  /** CONTRACT (first line on purpose — call-site reviews read this):
    * lazyCut is for frames whose FIRST consumer is ONE action that
    * computes every partition; frames fanned out to SEVERAL independent
    * AQE stages take eager [[apply]] instead. The r19 A/B that fixed
    * the boundary: lazy-cutting d48's multi-consumer feature table made
    * concurrent stages race block-by-block on uncomputed partitions and
    * measured 1.17 → 1.53 s (reverted; same revert on the
    * quality-quantile frames, the retrieval probe set, d41's fp table),
    * while single-first-action sites (connectedComponents rounds, BPE
    * rounds, sortedOnce kernels, d52's fp pass 1.33 → 1.08) all won or
    * tied. Do not flip a cut across this boundary without re-measuring
    * (same-JVM PerfAB + Probe job counts).
    *
    * Mechanics: a lineage cut whose MATERIALIZATION rides the caller's
    * own next action instead of a dedicated eager job (r19). The
    * logical plan is truncated immediately either way —
    * `Dataset.localCheckpoint` returns a LogicalRDD-backed frame even
    * when lazy, so iterative loops still cannot grow their plans — but
    * with the local backend the RDD computes (and its blocks cache)
    * under the FIRST action the caller runs over the returned frame,
    * halving the job count of checkpoint-then-aggregate loops
    * (connectedComponents' rounds: the convergence aggregate is that
    * action). Reliable-checkpoint mode stays eager: RDD.checkpoint's
    * write job re-executes lineage unless the data is already cached
    * (see [[apply]]), so laziness buys nothing there and the deployment
    * semantics stay identical. */
  def lazyCut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirKey).map(_.trim).filter(_.nonEmpty) match {
      case Some(_) => apply(df)
      case None => df.localCheckpoint(eager = false)
    }
  }

  /** Presentation sort over an eagerly materialized result — for queries
    * whose final global `orderBy` sits directly on a heavy projection
    * with NO exchange underneath (one-pass codegen kernels: the parse
    * round-trip, signature/quality passes, media decoders). Spark's
    * range-partitioned sort SAMPLES its child to pick partition bounds
    * and then executes it AGAIN for the real shuffle — with no
    * intermediate shuffle stage to resume from, the whole scan + compute
    * runs twice per action (measured on e01: two back-to-back ~1 s jobs
    * for one 100k-row parse). Materializing first runs the projection
    * once; the sampler and the sort then read the narrow materialized
    * blocks. The sort itself — the declared presentation order — is
    * unchanged, so results are byte-identical. */
  def sortedOnce(df: DataFrame,
      keys: org.apache.spark.sql.Column*): DataFrame =
    // lazyCut, not an eager cut (r19): the range sampler itself reads
    // every row of every partition (RangePartitioner.sketch), so it IS
    // the action that computes and caches the kernel's blocks — an
    // eager checkpoint here paid a third job for the same partitions.
    //
    // DirKey (reliable-checkpoint) mode: plain orderBy, NO cut (r20,
    // ADVICE r19). This cut is a presentation-sort optimization, not a
    // lineage or fault-tolerance requirement — routing it through the
    // reliable backend made ~12 gate queries each WRITE their full
    // result set to the checkpoint directory per run (an extra
    // write+read round-trip, and unbounded dir growth unless
    // spark.cleaner.referenceTracking.cleanCheckpoints is on). In that
    // deployment the kernel computes twice under the sampler+sort —
    // the pre-r19 behavior, strictly cheaper than a full result-set
    // FS round-trip, and executor-loss-safe either way.
    df.sparkSession.conf.getOption(DirKey).map(_.trim).filter(_.nonEmpty) match {
      case Some(_) => df.orderBy(keys: _*)
      case None => lazyCut(df).orderBy(keys: _*)
    }

  /** Postfix form (`df.materialize()`) so operator pipelines read the
    * same as the `.localCheckpoint(true)` chains they replace. */
  implicit final class Ops(private val df: DataFrame) extends AnyVal {
    def materialize(): DataFrame = Materialize(df)
    def sortedOnce(keys: org.apache.spark.sql.Column*): DataFrame =
      Materialize.sortedOnce(df, keys: _*)
  }
}
