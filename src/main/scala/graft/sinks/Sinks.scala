package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink operators — SURVEY.md §2.1.
  *
  * csv_overwrite mirrors the reference's silver/gold outputs
  * (`silver_service.py:132`, `gold_service.py:149`); the JDBC push
  * replaces the reference's driver-collecting `toPandas()+COPY`
  * (`gold_service.py:168-254`) with Spark's distributed JDBC writer —
  * the one deliberate architectural upgrade called out in SURVEY.md §7.4.
  */
object Sinks {

  /** sink_csv_overwrite — header CSV, overwrite mode. */
  def csvOverwrite(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Parquet overwrite (the engine's preferred layer interchange). */
  def parquetOverwrite(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Table-name sanitization: mirror of `gold_service.py:29-39` —
    * must match `^[A-Za-z_][A-Za-z0-9_.]*$`, truncated to 63 chars
    * (PostgreSQL identifier limit). */
  def sanitizeTableName(name: String): String = {
    val cleaned = name.trim.replaceAll("[^A-Za-z0-9_.]", "_")
    val prefixed =
      if (cleaned.isEmpty || !(cleaned.head.isLetter || cleaned.head == '_'))
        "t_" + cleaned
      else cleaned
    prefixed.take(63)
  }

  private def toSaveMode(ifExists: String): SaveMode = ifExists match {
    case "replace" => SaveMode.Overwrite
    case "append"  => SaveMode.Append
    case "fail"    => SaveMode.ErrorIfExists
    case other =>
      throw new IllegalArgumentException(
        s"if_exists must be replace/append/fail, got '$other'")
  }

  /** sink_jdbc — distributed JDBC write with replace/append/fail modes.
    * Spark synthesizes the DDL from the DataFrame schema (the reference
    * hand-maps pandas dtypes); `truncate` on replace keeps existing
    * grants/indexes. Untestable here (no database in the environment) —
    * exercised only for table-name sanitization in the specs. */
  def jdbc(
      df: DataFrame,
      url: String,
      table: String,
      ifExists: String = "replace",
      user: String = "",
      password: String = "",
      numPartitions: Int = 8): Unit = {
    df.repartition(numPartitions) // bound concurrent connections
      .write
      .format("jdbc")
      .mode(toSaveMode(ifExists))
      .option("url", url)
      .option("dbtable", sanitizeTableName(table))
      .option("user", user)
      .option("password", password)
      .option("truncate", (ifExists == "replace").toString)
      .save()
  }
}
