package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Media (image/audio/video) travel as opaque `binary` columns with a
  * typed metadata struct alongside — the schema, partitioning and
  * batched per-partition processing are the real, load-bearing parts;
  * the codec step is a clearly-marked deterministic STUB because this
  * environment ships no image/audio libraries. Swapping `decodeStub`
  * for a real decoder (JNI/javacv/etc.) changes no schema or plumbing.
  *
  * Scale notes: bytes stay columnar in parquet (no base64 inflation);
  * decode runs in `mapPartitions` so per-partition setup (codec init,
  * model load) is paid once per task, not per row; feature vectors are
  * fixed-width arrays so downstream similarity operators apply directly.
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("declared_bytes", LongType))))))

  /** Build a deterministic media table from the documents corpus: the
    * UTF-8 text bytes stand in for encoded media payloads. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("media_type"),
        col("text").cast("binary").as("bytes"),
        struct(col("source").as("source"),
          col("n_chars").cast("long").as("declared_bytes")).as("meta"))

  final case class MediaFeatures(
      media_id: Long, media_type: String, n_bytes: Long,
      feature: Array[Float])

  /** STUB decoder — stands in for image decode / audio resample / video
    * frame-sample. Deterministic: "features" are a fixed-width vector
    * derived from byte statistics. A real implementation replaces ONLY
    * the body of `decodeOne`; the mapPartitions batching, schema and
    * callers stay as-is. */
  def decodeStub(media: DataFrame, featureDim: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val out = media
      .select(col("media_id"), col("media_type"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // Per-partition init happens HERE (codec contexts, model
        // weights); the stub has none.
        def decodeOne(bytes: Array[Byte]): Array[Float] = {
          // ??? real decode goes here; deterministic fake: byte
          // histogram moments folded into featureDim buckets.
          val f = new Array[Float](featureDim)
          var i = 0
          while (i < bytes.length) {
            f(i % featureDim) += (bytes(i) & 0xFF) / 255.0f
            i += 1
          }
          if (bytes.length > 0) {
            var j = 0
            while (j < featureDim) { f(j) /= bytes.length; j += 1 }
          }
          f
        }
        it.map { case (id, tpe, bytes) =>
          MediaFeatures(id, tpe, bytes.length.toLong, decodeOne(bytes))
        }
      }
    out.toDF()
  }

  /** multimodal_features driver query — media table → per-partition
    * decode → per-type aggregate. The byte-length path is verifiable in
    * SQL (features are stub-internal). */
  def featuresQuery(spark: SparkSession, dir: String): DataFrame =
    decodeStub(mediaTable(spark, dir))
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        min(size(col("feature"))).as("feature_dim"))
      .orderBy("media_type")

  final case class Frame(
      media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Frame sampling STUB — stands in for video keyframe extraction:
    * the payload is chunked into fixed-size pseudo-frames and every
    * `everyNth` chunk is kept. A real implementation replaces only the
    * chunking with codec-aware frame boundaries; the flatMap fan-out
    * (one row per sampled frame), schema and batching stay. Frame
    * counts are pure integer arithmetic over the payload length, so the
    * whole path is SQL-verifiable. */
  def frameSampleStub(
      media: DataFrame, frameBytes: Int = 256, everyNth: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("media_type") === "video")
      .select(col("media_id"), col("bytes"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, b) =>
          val nChunks = (b.length + frameBytes - 1) / frameBytes
          (0 until nChunks by everyNth).iterator.map { ci =>
            Frame(id, ci, java.util.Arrays.copyOfRange(
              b, ci * frameBytes, math.min((ci + 1) * frameBytes, b.length)))
          }
        }
      }.toDF()
  }

  /** Resize STUB — stands in for image downscaling: stride-sample the
    * payload down to at most `targetBytes` (stride = ⌈len/target⌉,
    * resized length = ⌈len/stride⌉ — pure integer arithmetic, so the
    * size contract is SQL-verifiable). A real implementation replaces
    * the stride loop with a scaler; schema and batching stay. */
  def resizeStub(media: DataFrame, targetBytes: Int = 1024): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, tpe, b) =>
          val stride = math.max(1, (b.length + targetBytes - 1) / targetBytes)
          val out = new Array[Byte]((b.length + stride - 1) / stride.max(1))
          var i = 0
          var j = 0
          while (i < b.length) { out(j) = b(i); j += 1; i += stride }
          (id, tpe, b.length.toLong, out)
        }
      }.toDF("media_id", "media_type", "orig_bytes", "resized")
  }

  /** multimodal_frame_sample driver query — per-video sampled-frame
    * counts and byte volumes (verifiable integer arithmetic). */
  def frameSampleQuery(spark: SparkSession, dir: String): DataFrame =
    frameSampleStub(mediaTable(spark, dir))
      .groupBy("media_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame_bytes")).cast("long")).as("sampled_bytes"))
      .orderBy("media_id")

  /** multimodal_resize driver query — per-type resized byte volumes;
    * every row must respect the target cap. */
  def resizeQuery(spark: SparkSession, dir: String): DataFrame =
    resizeStub(mediaTable(spark, dir))
      .select(col("media_id"), col("media_type"), col("orig_bytes"),
        length(col("resized")).cast("long").as("resized_bytes"))
      .groupBy("media_type")
      .agg(count(lit(1)).as("n_items"),
        sum(col("orig_bytes")).as("sum_orig"),
        sum(col("resized_bytes")).as("sum_resized"),
        max(col("resized_bytes")).as("max_resized"))
      .orderBy("media_type")

  /** multimodal_metadata driver query — metadata-only column pruning:
    * reading the meta struct must not deserialize the payload bytes. */
  def metadataQuery(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("media_id"), col("media_type"),
        col("meta.source").as("source"),
        col("meta.declared_bytes").as("declared_bytes"),
        length(col("bytes")).cast("long").as("actual_bytes"))
      .filter(col("declared_bytes") === col("actual_bytes"))
      .groupBy("media_type", "source")
      .agg(count(lit(1)).as("n_items"),
        sum(col("actual_bytes")).as("sum_bytes"))
      .orderBy("media_type", "source")
}
