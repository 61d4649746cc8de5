package graft.types

import org.apache.spark.sql.types._

/** Logical type system of the engine.
  *
  * Mirrors the reference's flat primitive type set — detection-side names
  * `string, integer, float, boolean, timestamp, date` plus the Spark-side
  * map that also admits long/double (reference:
  * `backend/app/services/ingestion/bronze_ingestion.py:28-37`,
  * `backend/app/services/schema_detection.py:186-196`). No nested types:
  * complex values are demoted to string, as in
  * `schema_detection.py:281-287`.
  */
sealed abstract class LogicalType(val name: String, val spark: DataType)

object LogicalType {
  case object TString    extends LogicalType("string", StringType)
  case object TInteger   extends LogicalType("integer", IntegerType)
  case object TLong      extends LogicalType("long", LongType)
  case object TFloat     extends LogicalType("float", FloatType)
  case object TDouble    extends LogicalType("double", DoubleType)
  case object TBoolean   extends LogicalType("boolean", BooleanType)
  case object TTimestamp extends LogicalType("timestamp", TimestampType)
  case object TDate      extends LogicalType("date", DateType)

  val all: Seq[LogicalType] =
    Seq(TString, TInteger, TLong, TFloat, TDouble, TBoolean, TTimestamp, TDate)

  private val byName: Map[String, LogicalType] = all.map(t => t.name -> t).toMap

  /** Spark-type lookup by logical name; unknown names degrade to string,
    * matching the reference's permissive `SPARK_TYPE_MAP.get(..., StringType)`.
    */
  def fromName(n: String): LogicalType =
    byName.getOrElse(n.trim.toLowerCase, TString)

  /** Reverse map used when presenting Spark-inferred schemas as logical
    * fields (the reference round-trips through inferSchema CSV reads, so we
    * must tolerate Spark-side long/double/decimal). */
  def fromSpark(dt: DataType): LogicalType = dt match {
    case StringType       => TString
    case IntegerType      => TInteger
    case ShortType        => TInteger
    case ByteType         => TInteger
    case LongType         => TLong
    case FloatType        => TFloat
    case DoubleType       => TDouble
    case _: DecimalType   => TDouble
    case BooleanType      => TBoolean
    case TimestampType    => TTimestamp
    case DateType         => TDate
    case _                => TString
  }
}

/** A detected/declared field: name, logical type, nullability, plus the
  * detection metadata the reference tracks per field
  * (`backend/app/schemas/schema.py:17-35`). */
final case class FieldSpec(
    name: String,
    tpe: LogicalType,
    nullable: Boolean = true,
    confidence: Double = 1.0,
    nullCount: Long = 0L,
    uniqueCount: Long = 0L,
    sampleValues: Seq[String] = Nil,
    min: Option[String] = None,
    max: Option[String] = None)

/** User override applied at confirm time: rename / re-type / nullable /
  * exclude (reference `backend/app/routers/schemas.py:299-318`). */
final case class FieldOverride(
    field: String,
    newName: Option[String] = None,
    newType: Option[LogicalType] = None,
    nullable: Option[Boolean] = None,
    exclude: Boolean = false)

/** Versioned schema as stored in the registry
  * (`backend/app/models/models.py:74-98`). */
final case class SchemaVersion(
    version: Int,
    fields: Seq[FieldSpec],
    confidence: Double)

object Schemas {
  /** fields → StructType, honoring overrides, exactly the shape of the
    * reference's `_build_spark_schema` (`bronze_ingestion.py:63-77`). */
  def toStructType(
      fields: Seq[FieldSpec],
      overrides: Seq[FieldOverride] = Nil): StructType = {
    val ovr = overrides.map(o => o.field -> o).toMap
    val kept = fields.filterNot(f => ovr.get(f.name).exists(_.exclude))
    StructType(kept.map { f =>
      val o = ovr.get(f.name)
      StructField(
        o.flatMap(_.newName).getOrElse(f.name),
        o.flatMap(_.newType).getOrElse(f.tpe).spark,
        o.flatMap(_.nullable).getOrElse(f.nullable))
    })
  }

  def fromStructType(st: StructType): Seq[FieldSpec] =
    st.fields.toSeq.map(f =>
      FieldSpec(f.name, LogicalType.fromSpark(f.dataType), f.nullable))
}
