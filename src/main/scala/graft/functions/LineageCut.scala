package graft.functions

import org.apache.spark.sql.DataFrame

/** Lineage cut for iterative algorithms (BFS / pagerank / k-core / label
  * propagation / connected components): each round's result must be
  * materialized so round k's plan doesn't embed rounds 1..k−1 (otherwise
  * the optimizer re-analyzes an exponentially growing tree and a failure
  * recomputes the entire walk).
  *
  * Two modes, one knob:
  *  - default (local mode, the test/bench contract): `localCheckpoint`
  *    — blocks live in executor memory/disk, zero external I/O. Correct
  *    and fastest on a single JVM, but on a real cluster an executor
  *    loss makes every dependent round unrecoverable mid-iteration
  *    (there is no lineage left to recompute from).
  *  - `spark.graft.checkpointDir=<path>` set: RELIABLE `checkpoint()`
  *    into that directory (HDFS/S3A/GCS at cluster scale) — blocks
  *    survive executor loss, which is the 100 TB-safe configuration for
  *    a multi-hour iterative job on preemptible machines.
  *
  * Both are eager (materialize now), both truncate the logical plan to a
  * scan of the materialized blocks, so per-round plan size stays O(1)
  * regardless of iteration count (pinned by LineageCutSpec).
  */
object LineageCut {

  val ConfKey = "spark.graft.checkpointDir"

  // The parent dir last passed to setCheckpointDir on this JVM's context.
  // setCheckpointDir appends a fresh UUID subdir on every call, so the
  // active dir never equals the configured parent; substring-matching the
  // active path against the parent (the old check) misfires when one
  // configured parent is a prefix of another (/tmp/ckpt vs /tmp/ckpt2).
  @volatile private var pointedAt: String = ""

  def cut(df: DataFrame): DataFrame = {
    val dir = df.sparkSession.conf.get(ConfKey, "")
    if (dir.isEmpty) df.localCheckpoint(eager = true)
    else {
      val sc = df.sparkSession.sparkContext
      // only (re)point the context when the configured parent changed —
      // or when someone else re-pointed the shared context underneath us.
      // setCheckpointDir(dir) activates `dir/<uuid>`, so "still ours" ==
      // the ACTIVE dir's parent is the configured parent; an active dir
      // under a foreign parent (third-party setCheckpointDir) must be
      // re-pointed or our blocks land in their directory.
      synchronized {
        val activeParent = sc.getCheckpointDir
          .map(p => new org.apache.hadoop.fs.Path(p).getParent.toUri.getPath)
        val want = new org.apache.hadoop.fs.Path(dir).toUri.getPath
        if (pointedAt != dir || !activeParent.contains(want)) {
          sc.setCheckpointDir(dir)
          pointedAt = dir
        }
      }
      df.checkpoint(eager = true)
    }
  }

  /** LAZY cut: truncate lineage at the NEXT action instead of running a
    * dedicated materialization job now. For iterative loops that already
    * run one action per round (the connected-components convergence
    * checksum), this folds checkpoint materialization into that action —
    * one job per round instead of two (r19 optimization; guide §1.2
    * "remove unnecessary passes").
    *
    * CONTRACT: the first action over the returned DataFrame must compute
    * ALL of its partitions — a full count/aggregate/scan, or a downstream
    * shuffle whose map stage reads every partition. A PARTIAL first
    * action (head/take/limit directly on the cut df) leaves unvisited
    * partitions un-checkpointed, and later jobs can fail with missing
    * local-checkpoint blocks. Every call site here follows a lazy cut
    * with a full-partition action (convergence checksums, per-round
    * counts, next-round shuffle stages); keep it that way.
    *
    * Local mode only: a non-eager RELIABLE checkpoint recomputes the
    * whole lineage in a second pass after the first action (the classic
    * `rdd.checkpoint()` gotcha), so when `spark.graft.checkpointDir` is
    * set this falls back to the eager cut — at cluster scale the extra
    * materialization job is the price of executor-loss durability. */
  def cutAtNextAction(df: DataFrame): DataFrame = {
    val dir = df.sparkSession.conf.get(ConfKey, "")
    if (dir.isEmpty) df.localCheckpoint(eager = false) else cut(df)
  }

  /** Postfix form: `df.lineageCut` — drop-in for `.localCheckpoint(true)`
    * at every iterative-round boundary. */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def lineageCut: DataFrame = cut(df)
    def lineageCutLazy: DataFrame = cutAtNextAction(df)
  }
}
