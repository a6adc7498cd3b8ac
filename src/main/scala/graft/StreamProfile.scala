package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev utility: run streaming twins with a StreamingQueryListener and
  * itemize WHERE their wall-clock goes — trigger count, rows per
  * trigger, and the per-phase durationMs breakdown Spark publishes on
  * every progress event (addBatch = the data plan, plus the fixed
  * machinery: triggerExecution, queryPlanning, walCommit,
  * stateCommit...). This is the measurement the r11 verdict asked for
  * before believing any theory about the stream twins' data-scaled
  * marginal ("likely cause is trigger count scaling with input file
  * count — but nobody has measured it").
  *
  * Usage: runMain graft.StreamProfile <sfDir> <name>...
  */
object StreamProfile {
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
    val shm = new java.io.File("/dev/shm")
    if (shm.isDirectory && shm.canWrite)
      spark.conf.set(graft.streaming.Streaming.CheckpointRootKey,
        s"/dev/shm/graft_profile_${ProcessHandle.current().pid()}")
    case class Prog(batchId: Long, rows: Long,
      durations: Map[String, Long], state: Seq[String])
    val progs = scala.collection.mutable.ArrayBuffer[Prog]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
        import scala.jdk.CollectionConverters._
        progs.synchronized {
          progs += Prog(e.progress.batchId, e.progress.numInputRows,
            e.progress.durationMs.asScala.map {
              case (k, v) => k -> v.longValue()
            }.toMap,
            e.progress.stateOperators.toSeq.map(so =>
              s"${so.operatorName}{rows=${so.numRowsTotal}," +
                s"upd=${so.numRowsUpdated}/${so.allUpdatesTimeMs}ms," +
                s"rm=${so.numRowsRemoved}/${so.allRemovalsTimeMs}ms," +
                s"commit=${so.commitTimeMs}ms,mem=${so.memoryUsedBytes}}"))
        }
      }
      override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    for (n <- names) {
      // Warm pass, then the measured pass (mirrors Bench's min-of-2).
      SparkEntry.queries(n)(spark, sfDir).count()
      progs.synchronized(progs.clear())
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val snap = progs.synchronized(progs.toList)
      val byPhase = snap.flatMap(_.durations.toSeq)
        .groupMapReduce(_._1)(_._2)(_ + _)
      println(f"PROFILE $n wall=$wall%.2f triggers=${snap.size} " +
        s"rows=${snap.map(_.rows).sum} " +
        s"perTrigger=[${snap.map(p =>
          s"b${p.batchId}:${p.rows}r/${p.durations.getOrElse(
            "triggerExecution", -1L)}ms").mkString(",")}] " +
        s"phases={${byPhase.toSeq.sortBy(-_._2).map {
          case (k, v) => s"$k:${v}ms" }.mkString(",")}} " +
        s"state=[${snap.flatMap(_.state).mkString(";")}]")
    }
    spark.stop()
  }
}
