package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev utility: itemize a registry row's Spark JOBS (count, wall per
  * job, stage/task counts) — the job-count-overhead measurement the
  * incremental-maintenance rows need (their cost is data-invariant,
  * so it lives in scheduling rounds, not data).
  *
  * Usage: runMain graft.JobProfile <sfDir> <name>...
  */
object JobProfile {
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
    case class J(id: Int, start: Long, var end: Long = -1,
      var stages: Int = 0, var tasks: Int = 0, site: String = "")
    val jobs = scala.collection.mutable.LinkedHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val site = Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("")
          jobs(e.jobId) = J(e.jobId, e.time, site = site)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          jobs.lastOption.foreach { case (_, j) =>
            j.stages += 1
            j.tasks += e.stageInfo.numTasks
          }
        }
    })
    for (n <- names) {
      SparkEntry.queries(n)(spark, sfDir).count() // warm
      jobs.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val snap = jobs.synchronized(jobs.values.toList)
      val jobTime = snap.map(j => (j.end - j.start).max(0)).sum
      println(f"JOBS $n wall=$wall%.2f jobs=${snap.size} " +
        f"jobTimeSum=${jobTime / 1e3}%.2f gaps=${
          wall - jobTime / 1e3}%.2f " +
        s"perJob=[${snap.map(j =>
          s"${(j.end - j.start).max(0)}ms/${j.stages}st/${j.tasks}tk/" +
            j.site).mkString(",")}]")
    }
    spark.stop()
  }
}
