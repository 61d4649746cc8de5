package graft.util

import scala.util.Try
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.parquet.{ParquetFooterReader, ParquetToSparkSchemaConverter}
import org.apache.spark.sql.types.{DataType, StructType}

/** `spark.read.parquet(paths)` MINUS the schema-inference Spark job
  * (r22, guide §1.2 / §7.3 "driver does the planning"): every
  * schema-less parquet read launches a one-task job just to read a
  * footer and infer the schema — a fixed ~30-50 ms scheduling+probe
  * cost paid by EVERY table read, MoR read, commit validation and
  * stream schema probe, thousands of times per bench sweep and once
  * per read at 100 TB. The footer is a driver-side O(KB) read; this
  * helper reads it directly and replays Spark's own per-footer
  * inference (`ParquetFileFormat.readSchemaFromFooter`): prefer the
  * exact Spark schema JSON the writer embedded under the public
  * `org.apache.spark.sql.parquet.row.metadata` key (every
  * Spark/graft-written file carries it — exact type round-trip,
  * TimestampNTZ included), else convert the parquet MessageType with
  * Spark's own [[ParquetToSparkSchemaConverter]] under the session's
  * SQLConf (so legacy knobs like nanos-as-long behave identically).
  * `.asNullable` mirrors what DataSource forces on every inferred
  * file-source schema. Any surprise (unreadable footer, exotic
  * types) falls back to the plain inferring read — behavior, not
  * just results, identical.
  *
  * Like Spark's own non-merging inference, the schema comes from ONE
  * file; callers read file sets written under a single schema (graft
  * manifests declare one schema per table). */
object ParquetSchema {

  /** The public parquet key-value metadata key Spark writes its exact
    * schema JSON under (ParquetReadSupport.SPARK_METADATA_KEY). */
  val SparkMetadataKey = "org.apache.spark.sql.parquet.row.metadata"

  /** A parquet data file to read the footer from: `path` itself when
    * it is a file, else the first data file inside the directory —
    * like Spark's own non-merging inference, ONE file speaks for the
    * set. Local-FS only (every graft path is); anything else returns
    * None and the caller falls back to the inferring read. */
  private def firstParquet(path: String): Option[String] = {
    val f = new java.io.File(path)
    if (f.isFile) Some(path)
    else if (f.isDirectory)
      Option(f.listFiles()).flatMap(_
        .filter(x => x.isFile && x.getName.endsWith(".parquet") &&
          !x.getName.startsWith(".") && !x.getName.startsWith("_"))
        .sortBy(_.getName).headOption.map(_.getPath))
    else None
  }

  /** The schema Spark's inference would produce for `path` (a parquet
    * file or a directory of them), read driver-side with no job; None
    * when the footer refuses. */
  def footerSchema(
      spark: SparkSession, path0: String): Option[StructType] =
    try {
      val path = firstParquet(path0) match {
        case Some(p) => p
        case None => return None
      }
      val hconf = spark.sessionState.newHadoopConf()
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(path), hconf)
      val footer = ParquetFooterReader.readFooter(in,
        org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
      val fmd = footer.getFileMetaData
      Option(fmd.getKeyValueMetaData.get(SparkMetadataKey))
        .flatMap(j => Try(
          DataType.fromJson(j).asInstanceOf[StructType]).toOption)
        .orElse(Try(
          new ParquetToSparkSchemaConverter(spark.sessionState.conf)
            .convert(fmd.getSchema)).toOption)
        .map(st => asNullable(st).asInstanceOf[StructType])
    } catch { case NonFatal(_) => None }

  /** DataSource forces every inferred file-source schema nullable
    * (`StructType.asNullable`, private[spark]) — replicated here so
    * the explicit schema matches the inferred one field-for-field. */
  private def asNullable(dt: DataType): DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      f.copy(dataType = asNullable(f.dataType), nullable = true)))
    case at: org.apache.spark.sql.types.ArrayType =>
      at.copy(elementType = asNullable(at.elementType), containsNull = true)
    case mt: org.apache.spark.sql.types.MapType => mt.copy(
      keyType = asNullable(mt.keyType),
      valueType = asNullable(mt.valueType), valueContainsNull = true)
    case other => other
  }

  /** Read `paths` as parquet without the inference job when the first
    * footer yields a schema; the plain inferring read otherwise. */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame =
    paths.headOption.flatMap(footerSchema(spark, _)) match {
      case Some(st) => spark.read.schema(st).parquet(paths: _*)
      case None => spark.read.parquet(paths: _*)
    }
}
