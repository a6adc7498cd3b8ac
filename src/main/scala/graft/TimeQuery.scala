package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time a single SparkEntry query.
  * Usage: runMain graft.TimeQuery <name> [sfDir] [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-time")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("GRAFT_SHUFFLE", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        (!sys.env.contains("GRAFT_NOAQE")).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries(name)
    if (sys.env.contains("GRAFT_EXPLAIN")) {
      println(q(spark, dir).queryExecution.executedPlan.toString)
    }
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = q(spark, dir).collect().length
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[timequery] $name rep$i: $dt%.3f s ($n rows)")
    }
    spark.stop()
  }
}
