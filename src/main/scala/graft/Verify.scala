package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
// (Driver-run entry point; see .claude/skills/verify/SKILL.md for the
// local recipe.)
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Run each query, writing its result under `outDir/<name>`. A thrown
    * query must still produce a KEYED output: round 8 showed that
    * queries failing at analysis time simply vanish from the driver's
    * correctness JSON (6 of 10 regressions were invisible). On failure,
    * write a one-row sentinel parquet (a schema no oracle can match,
    * carrying the error text) so the compare records a loud per-query
    * failure, and return every error for errors.json. */
  def runQueries(
      spark: SparkSession,
      queries: Map[String, (SparkSession, String) => DataFrame],
      sfDir: String, outDir: String): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors(name) = s"${e.getClass.getSimpleName}: ${e.getMessage}"
        try {
          import spark.implicits._
          Seq(errors(name)).toDF("__graft_query_error__")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case e2: Throwable =>
          System.err.println(
            s"[verify] $name sentinel write failed: ${e2.getMessage}")
        }
      }
    }
    errors.toMap
  }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL would otherwise make the
    * driver's json.load fail and silently zero the round's correctness. */
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def writeJson(path: String, kv: Iterable[(String, String)]): Unit =
    Files.writeString(Paths.get(path),
      kv.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))

  def main(args: Array[String]): Unit = {
    // Optional 3rd arg: comma-separated query names for a targeted
    // local pre-flight (the driver always passes exactly two args).
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val errors = runQueries(spark,
      SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) },
      sfDir, outDir)
    writeJson(s"$outDir/oracle_sql.json", SparkEntry.oracleSql)
    writeJson(s"$outDir/errors.json", errors)
    // Unload streaming state stores before the session goes down, or
    // a post-stop maintenance tick logs a spurious ERROR stack trace
    // (see Streaming.unloadStateStores).
    graft.streaming.Streaming.unloadStateStores()
    spark.stop()
  }
}
