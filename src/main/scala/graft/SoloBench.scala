package graft

import org.apache.spark.sql.SparkSession

/** Solo-query benchmark: `runMain graft.SoloBench <sfDir> <name>...`
  * times the named registry queries (min of 3 reps each) on the same
  * session config as [[Bench]], without the other 158 rows' noise —
  * the tool behind BASELINE.md's documented solo splices. Not part
  * of the driver contract. */
object SoloBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config(graft.streaming.Streaming.StatePartitionsKey, "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("documents", "embeddings")
      .foreach(t => Tables.table(spark, sfDir, t).count())
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val ts = Seq(once(), once(), once())
      println(f"SOLO $n min=${ts.min}%.3f " +
        s"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
