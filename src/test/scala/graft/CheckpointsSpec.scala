package graft

/** The durability switch for iterative lineage cuts: local blocks by
  * default (fast, single-machine), reliable storage under
  * `graft.checkpoint.dir` (survives executor loss on a real
  * cluster — the r5 verdict's production caveat on localCheckpoint).
  */
class CheckpointsSpec extends SparkSuite {

  test("cut writes a reliable checkpoint when graft.checkpoint.dir is set") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Checkpoints.ConfKey, dir)
    try {
      val df = Checkpoints.cut(Seq(1, 2, 3).toDF("x"))
      assert(df.count() === 3)
      assert(df.as[Int].collect().sorted.sameElements(Array(1, 2, 3)))
      def anyFile(f: java.io.File): Boolean =
        f.isFile || Option(f.listFiles).exists(_.exists(anyFile))
      assert(anyFile(new java.io.File(dir)),
        s"reliable checkpoint must materialize RDD blocks under $dir")
    } finally spark.conf.unset(Checkpoints.ConfKey)
  }

  test("cut falls back to localCheckpoint without the conf") {
    import spark.implicits._
    assert(spark.conf.getOption(Checkpoints.ConfKey).isEmpty)
    val df = Checkpoints.cut(Seq(7).toDF("x"))
    assert(df.count() === 1)
  }
}
