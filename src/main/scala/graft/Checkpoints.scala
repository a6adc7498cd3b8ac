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

  /** Cut `df`'s lineage eagerly: reliable `checkpoint()` under
    * [[ConfKey]] when configured, `localCheckpoint()` otherwise. */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        if (spark.sparkContext.getCheckpointDir.isEmpty ||
            !spark.sparkContext.getCheckpointDir.exists(_.contains(dir)))
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case _ => df.localCheckpoint()
    }
  }
}
