package graft

import org.apache.spark.sql.DataFrame

/** Lineage cuts for iterative/hot plans, durability-configurable.
  *
  * `localCheckpoint()` persists blocks on EXECUTOR-LOCAL storage:
  * right locally (no distributed FS round-trip), but on a
  * 1000-executor cluster one lost executor makes the blocks
  * unrecoverable and kills every downstream job. Production
  * iterative runs (dedup clustering sweeps, MMR) set
  * `graft.checkpoint.dir` to reliable storage (HDFS/object store)
  * and every cut becomes a fault-tolerant `checkpoint()` there; the
  * tradeoff is one write+read of the cut relation per iteration,
  * which at 100 TB is O(edges)-sized intermediates, not the corpus.
  */
object Checkpoints {

  val ConfKey = "graft.checkpoint.dir"

  /** The [[ConfKey]] value last applied via `setCheckpointDir` —
    * compared by EQUALITY so a reconfigured dir always takes effect
    * (a substring check against the uuid-suffixed applied path would
    * silently keep writing to a decommissioned location). */
  @volatile private var applied: Option[String] = None

  /** Cut `df`'s lineage eagerly: reliable `checkpoint()` under
    * [[ConfKey]] when configured, `localCheckpoint()` otherwise.
    *
    * Retention: superseded cuts are reclaimed by Spark's
    * ContextCleaner when their RDDs become unreachable (local
    * blocks); reliable checkpoint FILES additionally need
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (or an
    * external sweep of the dir) in a long-lived session — the
    * default leaves every iteration's files behind. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        if (!applied.contains(dir)) {
          spark.sparkContext.setCheckpointDir(dir)
          applied = Some(dir)
        }
        df.checkpoint()
      case _ => df.localCheckpoint()
    }
  }
}
