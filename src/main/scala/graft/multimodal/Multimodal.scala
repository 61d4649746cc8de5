package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines.
  *
  * Media (image/audio/video) travel as opaque `binary` columns with a
  * typed metadata struct alongside — the schema, partitioning and
  * batched per-partition processing are the load-bearing parts.
  * IMAGES are decoded FOR REAL: `javax.imageio` ships in the JDK and
  * decodes PNG/JPEG with zero external dependencies (see the
  * png/decode/resize path below — encode, decode, nearest-neighbor
  * downscale, re-encode, all over genuine codec bytes). AUDIO is
  * decoded FOR REAL too: `javax.sound.sampled` ships a PCM WAV
  * reader/writer (see the wav path below — RIFF container encode,
  * decode, per-sample statistics). Video keyframing and COMPRESSED
  * audio (mp3/aac) remain clearly-marked deterministic STUBS — those
  * codecs genuinely don't ship with the JDK and this environment has
  * no external libraries; swapping a stub for a real decoder
  * (javacv/JNI) changes no schema or plumbing.
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

  /** STUB decoder — the codec-less fallback (mp3/aac have no JDK
    * decoder; real PNG/WAV/GIF decode lives below and feeds the
    * flagship feature/resize queries). Deterministic: "features" are a
    * fixed-width vector derived from byte statistics. A real
    * implementation replaces ONLY the body of `decodeOne`; the
    * mapPartitions batching, schema and callers stay as-is. */
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

  // ------------------------------------------------------------------
  // Real-codec media table + decode→feature / resize dispatch
  // ------------------------------------------------------------------
  // The flagship decode queries run on REAL payloads for every type the
  // JDK can encode: image → PNG (javax.imageio), audio → PCM WAV
  // (javax.sound.sampled), video → animated GIF (ImageIO sequences).
  // The byte-statistics stub survives in exactly ONE labeled branch —
  // `audio_mp3`, the compressed-audio leg the JDK genuinely cannot
  // decode — so the dispatch shape a production pipeline needs (decode
  // what decodes, a typed fallback for codec-less media) is the shape
  // under test. Payload laws are the ones the codec queries above pin,
  // so every feature value has a closed form the oracle replays.

  final case class RealMedia(
      media_id: Long, media_type: String, bytes: Array[Byte])

  /** media_id offset and count for the labeled stub rows. */
  private[graft] val StubOffset = 2000L
  private[graft] val StubIds = 12L

  /** One REAL encoded payload per doc_id < n (type by doc_id % 3), plus
    * `StubIds` text-byte payloads tagged `audio_mp3` — the codec-less
    * leg that must route through the labeled stub branch. */
  def realMediaTable(
      spark: SparkSession, dir: String, n: Long = 48L): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < n)
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val real = (id % 3) match {
            case 0 => RealMedia(id, "image", encodePng(id))
            case 1 => RealMedia(id, "audio", encodeWav(id))
            case _ => RealMedia(id, "video", encodeGif(id))
          }
          if (id < StubIds)
            Seq(real, RealMedia(id + StubOffset, "audio_mp3",
              text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
          else Seq(real)
        }
      }.toDF()
  }

  final case class MediaUnits(
      media_id: Long, media_type: String, n_units: Long, feature_sum: Long)

  /** multimodal_features driver query — decode dispatch by media_type
    * over REAL codec payloads: image → pixel count + pixel sum (PNG
    * decode), audio → sample count + absolute-amplitude sum (WAV
    * decode), video → frame count + all-frame pixel sum (GIF container
    * decode). The `audio_mp3` leg is the ONE labeled stub branch (no
    * JDK codec exists): its only externally-replayable feature is the
    * byte count; feature_sum carries the −1 sentinel marking the value
    * as stub-internal. Every non-sentinel number is a closed-form
    * integer function of media_id the oracle replays — the engine only
    * matches by running the actual decoders. */
  def featuresQuery(spark: SparkSession, dir: String): DataFrame = {
    val media = realMediaTable(spark, dir)
    val spark2 = media.sparkSession
    import spark2.implicits._
    media.select(col("media_id"), col("media_type"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, tpe, bytes) =>
          tpe match {
            case "image" =>
              val (w, h, sum) = decodeOnePng(bytes)
              MediaUnits(id, tpe, w.toLong * h, sum)
            case "audio" =>
              val r = decodeOneWav(bytes)
              MediaUnits(id, tpe, r.n.toLong, r.sumAbs)
            case "video" =>
              val frames = decodeGifFrames(bytes)
              MediaUnits(id, tpe, frames.length.toLong,
                frames.map(_._4).sum)
            case _ =>
              // The labeled STUB branch — compressed audio (mp3/aac) has
              // no JDK codec; byte count is the only replayable feature,
              // the sentinel marks feature_sum as stub-internal.
              MediaUnits(id, tpe, bytes.length.toLong, -1L)
          }
        }
      }.toDF().orderBy("media_id")
  }

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

  final case class MediaResize(
      media_id: Long, media_type: String, orig_units: Long,
      resized_units: Long, resized_sum: Long)

  /** multimodal_resize driver query — REAL downscale dispatch by
    * media_type: image → nearest-neighbor ÷2 through the PNG codec both
    * ways (decode → stride-sample → re-encode → decode again), audio →
    * decimate-by-2 through the WAV codec both ways, video → frame
    * stride 2 over the real GIF container. The `audio_mp3` leg keeps
    * the labeled stride-sampling stub (byte-level resize is all a
    * codec-less payload admits) with the −1 sentinel on resized_sum.
    * Units are pixels / samples / frames / bytes respectively; all
    * non-sentinel values follow from the payload laws in closed form. */
  def resizeQuery(spark: SparkSession, dir: String): DataFrame = {
    val media = realMediaTable(spark, dir)
    val spark2 = media.sparkSession
    import spark2.implicits._
    media.select(col("media_id"), col("media_type"), col("bytes"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, tpe, bytes) =>
          tpe match {
            case "image" =>
              val (w, h, _) = decodeOnePng(bytes)
              val (rw, rh, rsum) = decodeOnePng(resizeOnePng(bytes, 2))
              MediaResize(id, tpe, w.toLong * h, rw.toLong * rh, rsum)
            case "audio" =>
              val r = decodeOneWav(bytes)
              val rr = decodeOneWav(resampleOneWav(bytes, 2))
              MediaResize(id, tpe, r.n.toLong, rr.n.toLong, rr.sumAbs)
            case "video" =>
              val frames = decodeGifFrames(bytes)
              val kept = frames.filter(_._1 % 2 == 0)
              MediaResize(id, tpe, frames.length.toLong,
                kept.length.toLong, kept.map(_._4).sum)
            case _ =>
              // Labeled STUB branch: stride-sample the opaque payload
              // down to ≤1024 bytes — the integer size contract is the
              // replayable part, the content sentinel −1.
              val len = bytes.length
              val stride = math.max(1, (len + 1023) / 1024)
              MediaResize(id, tpe, len.toLong,
                ((len + stride - 1) / stride).toLong, -1L)
          }
        }
      }.toDF().orderBy("media_id")
  }

  // ------------------------------------------------------------------
  // Real image codec path (javax.imageio — JDK built-in, zero deps)
  // ------------------------------------------------------------------
  // The payloads here are REAL PNGs: encoded with the JDK's ImageIO on
  // the executors, decoded back pixel-by-pixel, downscaled with an
  // explicit nearest-neighbor stride (deterministic — no
  // interpolation-rounding ambiguity), re-encoded, and decoded AGAIN.
  // The pixel function gray(x, y) = base + 3x + 5y with
  // base = doc_id % 128, w = 8 + doc_id % 9, h = 8 + doc_id % 7 never
  // exceeds 127 + 45 + 65 = 237 < 256, so per-image pixel sums have a
  // CLOSED FORM the DuckDB oracle replays with integer arithmetic:
  // the only way the engine matches is by running the actual codec
  // round trip. (The gradient keeps PNG's filters + DEFLATE honestly
  // exercised — a solid color would compress to a trivial stream.)

  final case class PngImage(media_id: Long, png: Array[Byte])
  final case class PngStats(
      media_id: Long, width: Int, height: Int, pixel_sum: Long)

  /** Deterministic gradient dimensions/pixel law shared by the encoder
    * and the spec's direct expectations. */
  private[graft] def pngDims(id: Long): (Int, Int, Int) =
    ((8 + id % 9).toInt, (8 + id % 7).toInt, (id % 128).toInt)

  /** The gradient bitmap shared by the PNG and JPEG encoders. */
  private def gradientImage(id: Long): java.awt.image.BufferedImage = {
    val (w, h, base) = pngDims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = base + 3 * x + 5 * y
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode one gradient image as a real PNG (JDK ImageIO). */
  private[graft] def encodePng(id: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gradientImage(id), "png", bos)
    bos.toByteArray
  }

  /** Encode one gradient image as a real JPEG at an EXPLICIT quality —
    * the default-param path leaves quality writer-defined, which is the
    * kind of silent nondeterminism a data pipeline can't carry. */
  private[graft] def encodeJpeg(id: Long, quality: Float): Array[Byte] = {
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null,
        new javax.imageio.IIOImage(gradientImage(id), null, null), param)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Decode one PNG/JPEG payload: (width, height, sum of the blue
    * channel over every pixel). Fails loudly on undecodable bytes —
    * a corrupt-media row must never pass silently as zeros. */
  private[graft] def decodeOnePng(bytes: Array[Byte]): (Int, Int, Long) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += img.getRGB(x, y) & 0xFF; x += 1 }
      y += 1
    }
    (w, h, sum)
  }

  /** Bounded table of REAL PNG payloads, generated distributed (the
    * encoder runs on executors in the same mapPartitions shape as the
    * decoders — per-partition codec setup cost, not per-row). */
  def pngTable(spark: SparkSession, dir: String, n: Long = 48L): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") < n)
      .as[Long]
      .mapPartitions(it => it.map(id => PngImage(id, encodePng(id))))
      .toDF()
  }

  /** Real per-partition image decode over a (media_id, png) frame. */
  def decodePng(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("media_id"), col("png"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (w, h, sum) = decodeOnePng(bytes)
          PngStats(id, w, h, sum)
        }
      }.toDF()
  }

  /** Real image downscale: decode, keep every `factor`-th pixel in
    * each axis (nearest-neighbor at exact source coordinates —
    * deterministic on any JVM, unlike interpolated scalers), re-encode
    * as PNG. Output dims are ⌈w/factor⌉ × ⌈h/factor⌉. */
  /** One-payload kernel of [[resizePng]]: decode, keep every
    * `factor`-th pixel in each axis, re-encode as PNG. */
  private[graft] def resizeOnePng(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val src = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(src != null, "payload is not a decodable image")
    val rw = (src.getWidth + factor - 1) / factor
    val rh = (src.getHeight + factor - 1) / factor
    val out = new java.awt.image.BufferedImage(
      rw, rh, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < rh) {
      var x = 0
      while (x < rw) {
        out.setRGB(x, y, src.getRGB(x * factor, y * factor))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }

  def resizePng(images: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("media_id"), col("png"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) => PngImage(id, resizeOnePng(bytes, factor)) }
      }.toDF()
  }

  /** multimodal_image_decode driver query — the full real-codec round
    * trip as one hash-checked relation: encode gradient PNGs, decode
    * them (width/height/pixel sum), nearest-neighbor downscale by 2,
    * re-encode, decode AGAIN. The resized sums follow from the pixel
    * law (resized pixel (x, y) = gray(2x, 2y) = base + 6x + 10y), so
    * the oracle pins every value with closed-form integer arithmetic
    * while the engine must produce them through javax.imageio both
    * ways. */
  def imageDecodeQuery(spark: SparkSession, dir: String): DataFrame = {
    val imgs = pngTable(spark, dir)
    val full = decodePng(imgs)
    val resized = decodePng(resizePng(imgs, 2))
      .select(col("media_id"), col("width").as("r_width"),
        col("height").as("r_height"), col("pixel_sum").as("r_pixel_sum"))
    full.join(resized, Seq("media_id")).orderBy("media_id")
  }

  final case class JpegStats(
      media_id: Long, width: Int, height: Int, is_jpeg: Boolean,
      max_abs_err: Int)

  /** Per-image JPEG encode→decode roundtrip stats, computed on the
    * executors in one mapPartitions pass: dimensions as decoded, a
    * JFIF/SOI container check on the raw bytes, and the maximum
    * per-pixel absolute error of the decoded blue channel against the
    * closed-form gradient law gray(x, y) = base + 3x + 5y. */
  def jpegRoundtrip(
      spark: SparkSession, dir: String,
      n: Long = 48L, quality: Float = 0.85f): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") < n)
      .as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val bytes = encodeJpeg(id, quality)
          val isJpeg = bytes.length > 2 &&
            (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"jpeg payload for id=$id not decodable")
          val (_, _, base) = pngDims(id)
          var maxErr = 0
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val got = img.getRGB(x, y) & 0xFF
              val want = base + 3 * x + 5 * y
              val e = math.abs(got - want)
              if (e > maxErr) maxErr = e
              x += 1
            }
            y += 1
          }
          JpegStats(id, img.getWidth, img.getHeight, isJpeg, maxErr)
        }
      }.toDF()
  }

  /** multimodal_jpeg_roundtrip driver query — the LOSSY leg of the real
    * codec path (the PNG query is lossless, so it can pin exact pixel
    * sums; JPEG can't). The oracle checks what lossy decode leaves
    * checkable: decoded dimensions equal the closed-form generator
    * dims (only true if a real decode ran), the payload is an actual
    * JPEG container (SOI marker), and the decoded gradient stays
    * within a deterministic pixel-error bound — the measured max error
    * at quality 0.85 on the smooth ramp is 2 (and ≥ 1 on every image:
    * the path is genuinely lossy); 16 leaves margin for a different
    * JDK's libjpeg tables while still refuting any not-actually-
    * decoding implementation (a zeroed bitmap is ≥ 100 off). */
  def jpegRoundtripQuery(
      spark: SparkSession, dir: String, errBound: Int = 16): DataFrame =
    jpegRoundtrip(spark, dir)
      .select(col("media_id"), col("width"), col("height"),
        col("is_jpeg"),
        (col("max_abs_err") <= errBound).as("err_le_bound"))
      .orderBy("media_id")

  // ------------------------------------------------------------------
  // Real audio codec path (javax.sound.sampled — JDK built-in)
  // ------------------------------------------------------------------
  // The payloads here are REAL RIFF/WAVE files: PCM16 mono clips
  // encoded through AudioSystem on the executors and decoded back
  // sample-by-sample. The waveform is an integer law
  // s_i = ((base + 7i) mod 2003) − 1001 with base = id % 1999 and
  // n = 4000 + id % 997 samples at 8 kHz — every per-clip statistic
  // (sample sum, absolute sum, duration) has a CLOSED FORM the DuckDB
  // oracle replays with integer arithmetic over a generated series, so
  // the engine only matches by running the actual container encode →
  // decode round trip (the header comment above is now precise: the
  // JDK ships no COMPRESSED audio/video codec — PCM WAV it does).

  final case class WavClip(media_id: Long, wav: Array[Byte])
  final case class WavStats(
      media_id: Long, sample_rate: Int, n_samples: Int,
      duration_ms: Int, sum_samples: Long, sum_abs: Long)

  /** Deterministic clip law shared by the encoder, the decoder spec,
    * and the oracle. */
  private[graft] def wavLaw(id: Long): (Int, Int) =
    ((4000 + id % 997).toInt, (id % 1999).toInt)

  private[graft] def sampleAt(base: Int, i: Int): Int =
    ((base + 7 * i) % 2003) - 1001

  /** Encode one clip as a real WAV (PCM16 LE mono, 8 kHz) through
    * `AudioSystem.write` — genuine RIFF container bytes. */
  private[graft] def encodeWav(id: Long): Array[Byte] = {
    val (n, base) = wavLaw(id)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = sampleAt(base, i)
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode one WAV payload: format checks + per-sample statistics.
    * Fails loudly on undecodable bytes or an unexpected format. */
  private[graft] def decodeOneWav(bytes: Array[Byte]): WavStatsRaw = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    require(fmt.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian,
      s"unexpected wav format: $fmt")
    val data = ais.readAllBytes()
    val n = data.length / 2
    var sum = 0L
    var sumAbs = 0L
    var i = 0
    while (i < n) {
      val s = ((data(2 * i + 1).toInt) << 8) | (data(2 * i) & 0xFF)
      sum += s
      sumAbs += math.abs(s)
      i += 1
    }
    WavStatsRaw(fmt.getSampleRate.toInt, n, sum, sumAbs)
  }

  final case class WavStatsRaw(
      sampleRate: Int, n: Int, sum: Long, sumAbs: Long)

  /** Bounded table of REAL WAV payloads, generated distributed (same
    * per-partition codec shape as [[pngTable]]). */
  def wavTable(spark: SparkSession, dir: String, n: Long = 48L): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") < n)
      .as[Long]
      .mapPartitions(it => it.map(id => WavClip(id, encodeWav(id))))
      .toDF()
  }

  /** Real per-partition WAV decode over a (media_id, wav) frame. */
  def decodeWav(clips: DataFrame): DataFrame = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.select(col("media_id"), col("wav"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val r = decodeOneWav(bytes)
          WavStats(id, r.sampleRate, r.n, r.n / 8, r.sum, r.sumAbs)
        }
      }.toDF()
  }

  /** multimodal_audio_decode driver query — the WAV round trip as one
    * hash-checked relation: every column is a closed-form integer
    * function of media_id that the engine must reach through the real
    * codec both ways. */
  def audioDecodeQuery(spark: SparkSession, dir: String): DataFrame =
    decodeWav(wavTable(spark, dir)).orderBy("media_id")

  /** Real audio resample: decode, keep every `factor`-th sample
    * (decimation at exact source indices — deterministic, no
    * interpolation ambiguity, the audio twin of [[resizePng]]'s
    * nearest-neighbor law), re-encode as WAV at rate/factor. */
  /** One-payload kernel of [[resampleWav]]: decode, keep every
    * `factor`-th sample, re-encode as WAV at rate/factor. */
  private[graft] def resampleOneWav(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = ais.getFormat
    val data = ais.readAllBytes()
    val n = data.length / 2
    val rn = (n + factor - 1) / factor
    val out = new Array[Byte](rn * 2)
    var j = 0
    while (j < rn) {
      out(2 * j) = data(2 * j * factor)
      out(2 * j + 1) = data(2 * j * factor + 1)
      j += 1
    }
    val rFmt = new javax.sound.sampled.AudioFormat(
      fmt.getSampleRate / factor, 16, 1, true, false)
    val rAis = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(out), rFmt, rn.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(rAis,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  def resampleWav(clips: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, s"resample factor must be >= 1, got $factor")
    val spark = clips.sparkSession
    import spark.implicits._
    clips.select(col("media_id"), col("wav"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) => WavClip(id, resampleOneWav(bytes, factor)) }
      }.toDF()
  }

  /** multimodal_audio_resample driver query — decode → decimate-by-2 →
    * re-encode → decode AGAIN; the resampled statistics follow from
    * the waveform law at even indices, so the oracle pins every value
    * while the engine runs the codec twice each way. */
  def audioResampleQuery(spark: SparkSession, dir: String): DataFrame =
    decodeWav(resampleWav(wavTable(spark, dir), 2))
      .select(col("media_id"), col("sample_rate"), col("n_samples"),
        col("sum_samples"), col("sum_abs"))
      .orderBy("media_id")

  /** Quarantine decode: the production shape for corrupt media rows —
    * decode what decodes, route the rest to a tagged side channel,
    * lose nothing. Catches ONLY the codec's typed failure
    * (`UnsupportedAudioFileException` — a stable, meaningful reason
    * tag), never a blanket Throwable: an OOM or a bug must still fail
    * the job, not land in quarantine. */
  def decodeWavQuarantine(clips: DataFrame): DataFrame = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.select(col("media_id"), col("wav"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try {
            val r = decodeOneWav(bytes)
            (id, true, r.n, r.sum, "")
          } catch {
            case e: javax.sound.sampled.UnsupportedAudioFileException =>
              (id, false, -1, -1L, e.getClass.getSimpleName)
          }
        }
      }.toDF("media_id", "decoded", "n_samples", "sum_samples", "reason")
  }

  /** multimodal_decode_quarantine driver query — a feed where every
    * 7th payload (media_id % 7 == 3) is deterministically corrupted
    * (RIFF header stripped): good rows must decode to their closed
    * forms, corrupt rows must land in quarantine with the codec's
    * typed reason, and no row may vanish. */
  def decodeQuarantineQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val clips = wavTable(spark, dir)
      .as[(Long, Array[Byte])]
      .map { case (id, wav) =>
        WavClip(id, if (id % 7 == 3) wav.drop(8) else wav)
      }.toDF()
    decodeWavQuarantine(clips).orderBy("media_id")
  }

  // ------------------------------------------------------------------
  // Image near-duplicate detection (perceptual hash over real decode)
  // ------------------------------------------------------------------
  // The image leg of the dedup family: a 63-bit average-hash (aHash —
  // the classic perceptual fingerprint: sample a fixed 9×7 grid,
  // threshold each sample against the grid mean) computed from REAL
  // decoded PNG pixels, then the minhash-LSH pattern applied to
  // Hamming space: band the hash into 4 × 16-bit keys (pigeonhole —
  // any pair within Hamming ≤ 3 shares at least one untouched band),
  // equi-join on band keys, and verify candidates exactly with
  // bit_count(xor). At corpus scale the banding join is the whole
  // story: candidates ∝ collisions, never n². The fixture is 48
  // originals + 48 noise-perturbed copies of a varied modular pixel
  // law — integer arithmetic end to end, so the oracle recomputes
  // every hash FROM THE LAW and replays the pair set, while the
  // engine must reach the same hashes through the codec.

  final case class PhashImage(media_id: Long, png: Array[Byte])
  final case class PhashRow(media_id: Long, phash: Long)

  private[graft] def phashPixel(id: Long, noisy: Boolean, x: Int, y: Int): Int = {
    val a = (3 + id % 29).toInt
    val b = (5 + id % 23).toInt
    val c = (1 + id % 19).toInt
    val d = (id % 128).toInt
    val base = (d + a * x + b * y + c * x * y) % 251
    base + (if (noisy && (x + 5 * y) % 11 == 0) 2 else 0)
  }

  private[graft] def encodePhashPng(id: Long, noisy: Boolean): Array[Byte] = {
    val (w, h, _) = pngDims(id)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = phashPixel(id, noisy, x, y)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 63-bit aHash of a decoded image: 9×7 sample grid at integer
    * stride coordinates, mean-thresholded. 63 bits (not 64) keeps the
    * hash — and the oracle's sum-of-powers reconstruction — inside a
    * signed 64-bit integer. */
  private[graft] def aHash63(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val vals = new Array[Int](63)
    var j = 0
    while (j < 7) {
      var k = 0
      while (k < 9) {
        vals(j * 9 + k) = img.getRGB(k * w / 9, j * h / 7) & 0xFF
        k += 1
      }
      j += 1
    }
    val mean = vals.sum / 63
    var hash = 0L
    var idx = 0
    while (idx < 63) {
      if (vals(idx) > mean) hash |= (1L << idx)
      idx += 1
    }
    hash
  }

  /** 96 real PNG payloads: originals (media_id = doc_id) and
    * noise-perturbed copies (media_id = doc_id + 1000). */
  def phashTable(spark: SparkSession, dir: String, n: Long = 48L): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") < n)
      .as[Long]
      .mapPartitions(it => it.flatMap(id => Seq(
        PhashImage(id, encodePhashPng(id, noisy = false)),
        PhashImage(id + 1000, encodePhashPng(id, noisy = true)))))
      .toDF()
  }

  /** dedup_image_phash — decode, hash, band, join, verify. Returns the
    * (id_a, id_b, hamming) pairs within Hamming ≤ 3. */
  def imagePhashDedupQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val maxHam = 3
    val hashes = phashTable(spark, dir)
      .select(col("media_id"), col("png"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(bytes))
          require(img != null, "payload is not a decodable image")
          PhashRow(id, aHash63(img))
        }
      }.toDF()
    // 4 bands × 16 bits: Hamming ≤ 3 ⇒ ≥ 1 band is identical.
    val banded = hashes.select(col("media_id"), col("phash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("phash"), 16 * b).bitwiseAND(lit(0xFFFFL))
            .as("key"))): _*)).as("bk"))
      .select(col("media_id"), col("phash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val pairs = banded.as("x").join(banded.as("y"), Seq("band", "key"))
      .filter(col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
        bit_count(col("x.phash").bitwiseXOR(col("y.phash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHam)
    pairs.orderBy("id_a", "id_b")
  }

  // ------------------------------------------------------------------
  // Audio near-duplicate detection (energy fingerprint over real decode)
  // ------------------------------------------------------------------
  // The audio leg of the dedup family, completing modality coverage
  // (text: minhash/simhash; embeddings: cosine; images: aHash): a
  // 63-bit energy fingerprint — per-window absolute-amplitude sums,
  // mean-thresholded — computed from REAL decoded WAV samples, then
  // the same banded Hamming join as [[imagePhashDedupQuery]]. Clips
  // are amplitude-modulated per window so fingerprints separate;
  // noisy twins (+1 on every 13th sample) leave every window's energy
  // rank untouched, so twin pairs sit at Hamming 0. Integer law end
  // to end: the oracle recomputes every fingerprint from the waveform
  // law over a generated series and replays the pair set.

  private[graft] def fpSample(n: Int, base: Int, i: Int, noisy: Boolean): Int = {
    val w = (i.toLong * 63 / n).toInt
    val m = 1 + ((w + base) * (1 + base % 7)) % 5
    val v = (((base + 7 * i) % 2003) - 1001) * m
    v + (if (noisy && i % 13 == 0) 1 else 0)
  }

  private[graft] def encodeFpWav(id: Long, noisy: Boolean): Array[Byte] = {
    val (n, base) = wavLaw(id)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = fpSample(n, base, i, noisy)
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 63-bit energy fingerprint of decoded PCM16: 63 contiguous
    * windows (sample i → window ⌊i·63/n⌋), absolute-amplitude sums,
    * mean-thresholded. */
  private[graft] def audioFp63(bytes: Array[Byte]): Long = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val data = ais.readAllBytes()
    val n = data.length / 2
    val sums = new Array[Long](63)
    var i = 0
    while (i < n) {
      val s = ((data(2 * i + 1).toInt) << 8) | (data(2 * i) & 0xFF)
      sums((i.toLong * 63 / n).toInt) += math.abs(s)
      i += 1
    }
    val mean = sums.sum / 63
    var hash = 0L
    var idx = 0
    while (idx < 63) {
      if (sums(idx) > mean) hash |= (1L << idx)
      idx += 1
    }
    hash
  }

  /** dedup_audio_fingerprint — decode, fingerprint, band, join,
    * verify; 48 originals + 48 noisy twins (media_id = doc_id + 1000). */
  def audioFingerprintDedupQuery(
      spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val maxHam = 3
    val fps = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") < 48)
      .as[Long]
      .mapPartitions(it => it.flatMap { id =>
        Seq(
          PhashRow(id, audioFp63(encodeFpWav(id, noisy = false))),
          PhashRow(id + 1000, audioFp63(encodeFpWav(id, noisy = true))))
      }).toDF()
    val banded = fps.select(col("media_id"), col("phash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("phash"), 16 * b).bitwiseAND(lit(0xFFFFL))
            .as("key"))): _*)).as("bk"))
      .select(col("media_id"), col("phash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("x").join(banded.as("y"), Seq("band", "key"))
      .filter(col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("id_a"), col("y.media_id").as("id_b"),
        bit_count(col("x.phash").bitwiseXOR(col("y.phash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHam)
      .orderBy("id_a", "id_b")
  }

  /** pipeline_media_release — the media-curation chain end to end:
    * a feed of 96 real WAV payloads (48 originals + 48 noisy twins)
    * with every 7th media_id's payload corrupted, pushed through
    * quarantine decode → fingerprint → exact-fingerprint collapse
    * (min media_id wins; noisy twins land at IDENTICAL fingerprints
    * by construction, so the collapse is the dedup) → one release
    * manifest row. Every number is a closed-form function of the
    * waveform law, so the oracle replays the whole funnel; the engine
    * must reach it through real codec decode with the corrupt rows
    * surviving as quarantine counts, never as crashes or silent
    * drops. */
  def mediaReleaseQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val clips = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") < 48)
      .as[Long]
      .mapPartitions(it => it.flatMap { id =>
        Seq((id, encodeFpWav(id, noisy = false)),
          (id + 1000, encodeFpWav(id, noisy = true)))
      }).map { case (mid, wav) =>
        WavClip(mid, if (mid % 7 == 3) wav.drop(8) else wav)
      }.toDF()
    val routed = clips.select(col("media_id"), col("wav"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          try (id, true, audioFp63(bytes))
          catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException =>
              (id, false, 0L)
          }
        }
      }.toDF("media_id", "decoded", "fp")
    val decoded = routed.filter(col("decoded"))
    val kept = decoded.groupBy("fp")
      .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    routed.agg(
      count(lit(1)).as("n_input"),
      sum(when(col("decoded"), 0L).otherwise(1L)).as("n_quarantined"),
      sum(when(col("decoded"), 1L).otherwise(0L)).as("n_decoded"))
      .crossJoin(kept.agg(
        count(lit(1)).as("n_kept"),
        sum(col("n_copies")).as("n_collapsed_from"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L))
          .as("n_dup_groups")))
  }

  // ------------------------------------------------------------------
  // Real multi-frame container path (animated GIF via javax.imageio)
  // ------------------------------------------------------------------
  // Video keyframe sampling over a REAL container: animated GIF is the
  // one multi-frame format the JDK can both write (writeToSequence)
  // and read (getNumImages/read(i)). Frames are TYPE_BYTE_INDEXED over
  // an explicit 256-gray palette, so the frame law
  // g(f, x, y) = (base + 11f + 3x + 5y) mod 256 survives the palette
  // roundtrip EXACTLY — per-frame pixel sums have closed forms the
  // oracle replays, and the engine only matches by decoding the actual
  // container. Frame count F = 3 + id % 4; dims reuse [[pngDims]].

  final case class GifClip(media_id: Long, gif: Array[Byte])
  final case class GifFrameStats(
      media_id: Long, frame: Int, width: Int, height: Int, pixel_sum: Long)

  private[graft] def gifFrames(id: Long): Int = (3 + id % 4).toInt

  private[graft] def gifPixel(base: Int, f: Int, x: Int, y: Int): Int =
    (base + 11 * f + 3 * x + 5 * y) % 256

  private def grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Encode one animated GIF (all frames full-size, indexed gray). */
  private[graft] def encodeGif(id: Long): Array[Byte] = {
    val (w, h, base) = pngDims(id)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    require(writer.canWriteSequence, "JDK gif writer must support sequences")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until gifFrames(id)).foreach { f =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, gifPixel(base, f, x, y))
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Decode every frame of a GIF payload: per-frame (w, h, gray sum).
    * Sums read the palette-resolved RGB blue channel, so a lossy
    * palette would be caught, not masked. */
  private[graft] def decodeGifFrames(
      bytes: Array[Byte]): Seq[(Int, Int, Int, Long)] = {
    val reader =
      javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      (0 until n).map { f =>
        val img = reader.read(f)
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            sum += img.getRGB(x, y) & 0xFF
            x += 1
          }
          y += 1
        }
        (f, img.getWidth, img.getHeight, sum)
      }
    } finally { reader.dispose(); iis.close() }
  }

  /** Bounded table of REAL animated-GIF payloads. */
  def gifTable(spark: SparkSession, dir: String, n: Long = 48L): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).filter(col("doc_id") < n)
      .as[Long]
      .mapPartitions(it => it.map(id => GifClip(id, encodeGif(id))))
      .toDF()
  }

  /** multimodal_video_frames driver query — keyframe sampling over the
    * real container: decode EVERY other frame (stride 2 — the
    * keyframe-sample law) of each clip; one output row per kept frame
    * with its closed-form pixel sum. */
  def videoFramesQuery(
      spark: SparkSession, dir: String, stride: Int = 2): DataFrame = {
    val clips = gifTable(spark, dir)
    val sparkS = clips.sparkSession
    import sparkS.implicits._
    clips.select(col("media_id"), col("gif"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          decodeGifFrames(bytes).collect {
            case (f, w, h, sum) if f % stride == 0 =>
              GifFrameStats(id, f, w, h, sum)
          }
        }
      }.toDF().orderBy("media_id", "frame")
  }

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
