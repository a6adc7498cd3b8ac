package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities — the pre-shuffle co-location SURVEY §4
  * names for recurring large-×-large joins: both sides written
  * `bucketBy(n, key) sortBy(key)` hash-partition AND pre-sort their
  * files on the join key, so every later equi-join on that key plans
  * a SortMergeJoin with NO Exchange and NO Sort (proved in
  * ScaleToolsSpec). At 100 TB this turns the nightly fact⋈fact join
  * from the cluster's biggest shuffle into a zero-movement merge —
  * the batch analog of co-partitioned state.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, key: String, buckets: Int,
      table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Equi-join two co-bucketed tables on their bucket key — plans
    * shuffle-free when both were written with the same
    * (key, buckets). */
  def coLocatedJoin(s: SparkSession, t1: String, t2: String,
      key: String): DataFrame =
    s.table(t1).join(s.table(t2), Seq(key))
}
