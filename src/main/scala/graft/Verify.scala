package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Output columns the driver's pandas comparator cannot hash/sort:
    * array/map/struct cells raise `unhashable type: numpy.ndarray` at
    * the driver gate even when the values are right (r7's
    * q_glossary_refs). Queries must emit scalars only — join arrays
    * to strings. Mirrors the r3 HUGEINT guard in tools/check.py. */
  private[graft] def complexCols(
      schema: org.apache.spark.sql.types.StructType): Seq[String] = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    schema.fields.collect {
      case f if (f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => true
        case _ => false
      }) => s"${f.name}: ${f.dataType.simpleString}"
    }.toSeq
  }

  def main(args: Array[String]): Unit = {
    // Optional 3rd arg: comma-separated query-name filter (local
    // iteration aid; the driver always passes exactly two args).
    val (sfDir, outDir, only) = args match {
      case Array(a, b) => (a, b, None)
      case Array(a, b, c) => (a, b, Some(c.split(',').toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val complex = complexCols(df.schema)
          if (complex.nonEmpty)
            // No parquet written → check.py records the row as
            // "oracle present but no spark output" = FAIL, so the
            // class cannot pass locally and die at the driver.
            System.err.println(s"[verify] $name REJECTED: non-scalar " +
              s"output column(s) ${complex.mkString(", ")} — the " +
              "driver comparator cannot sort them; emit array_join'd " +
              "strings instead")
          else df.coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
