package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types._

import graft.operators.TxnLog

/** WRITER-SIDE commit stats (r22, guide §1.2 "remove passes" / §5):
  * every lakehouse commit used to RE-READ the files it had just
  * written to compute their per-file stats — r21 fused the three
  * stats jobs into one ([[TxnLog.commitStatsFor]]), but one full scan
  * of the staged bytes per commit remained. The information exists in
  * the write tasks themselves (they see every row as they write it),
  * which is where Delta (`AddFile.stats`) and Iceberg
  * (`DataFile` value bounds/null counts) collect it. This extends
  * [[StagedWrite]]'s row-count discipline to the full stats families:
  * the write task folds key [min,max], declared column bounds and
  * per-column (nullCount, KMV sketch) as it writes, and ships them
  * back in its task result / commit message — ZERO post-write stats
  * jobs, which at a 100 TB commit means the staged bytes cross the
  * storage layer once instead of twice.
  *
  * Every convention is [[TxnLog.commitStatsFor]]'s, applied verbatim
  * so manifests stay byte-identical (CommitStatsSpec pins writer-side
  * == read-back): the EmptyRange entry for an all-NULL column, no
  * entry for zero-row files (empty partitions write no file), the
  * integral-type refusal for declared bound columns, the auto-NDV
  * expansion over string/integral schema columns, sign-flipped
  * xxhash64 bottom-k sketches (via Spark's own [[XxHash64Function]],
  * seed 42 — the `xxhash64()` SQL function's exact hash). The
  * read-back pass survives as the FALLBACK for commits whose
  * declaration sets changed under them (a rebase onto a tip that
  * declared new columns mid-flight) and for bootstrap paths that
  * compute stats over pre-existing files. */
object WriterStats {

  /** The per-column stats plan, resolved and VALIDATED on the driver
    * against the written schema before any task runs — serializable,
    * shipped inside the write closure / writer factory.
    *
    * `ndvCols0` (the declared set) is kept alongside the expanded
    * `ndvCols` because [[TxnLog.commitStatsFor]]'s zero-file arm
    * shapes its result by the DECLARED set; [[assemble]] mirrors
    * that. */
  final case class Spec(
      schema: StructType,
      statsKey: Option[String],
      colStatCols: Seq[String],
      ndvCols0: Seq[String],
      ndvCols: Seq[String]) {
    /** Nothing to collect: mirrors commitStatsFor's no-scan arm. */
    def isEmpty: Boolean =
      statsKey.isEmpty && colStatCols.isEmpty && ndvCols.isEmpty
  }

  /** Build the spec — the driver-side half of commitStatsFor: the
    * same existence checks, the same integral contract for declared
    * bound columns (a non-integral declaration must refuse HERE,
    * before it can reach a manifest), the same auto-NDV expansion
    * (declared ++ every string/integral schema column, distinct,
    * sorted) gated on the same conf. */
  def spec(
      spark: SparkSession, schema: StructType,
      statsKey: Option[String],
      colStatCols: Seq[String],
      ndvCols0: Seq[String], ndvAutoMode: Boolean = true): Spec = {
    colStatCols.foreach { c =>
      val field = schema.fields.find(_.name == c).getOrElse(
        sys.error(s"colStats column `$c` does not exist in the " +
          s"table schema ${schema.fieldNames.mkString("[", ", ", "]")}"))
      field.dataType match {
        case ByteType | ShortType | IntegerType | LongType => ()
        case other => sys.error(
          s"colStats column `$c` has non-integral type " +
            s"${other.simpleString}: manifest bounds compare as BIGINT, " +
            "so only byte/short/int/long columns may be declared")
      }
    }
    ndvCols0.foreach { c =>
      require(schema.fieldNames.contains(c),
        s"ndv column `$c` does not exist in the table schema " +
          schema.fieldNames.mkString("[", ", ", "]"))
    }
    statsKey.foreach { k =>
      require(schema.fieldNames.contains(k),
        s"stats key `$k` does not exist in the table schema " +
          schema.fieldNames.mkString("[", ", ", "]"))
    }
    val ndvCols =
      if (!ndvAutoMode || !TxnLog.ndvAuto(spark)) ndvCols0
      else (ndvCols0 ++ schema.fields.collect {
        case f if TxnLog.ndvAutoEligible(f.dataType) => f.name
      }).distinct.sorted
    Spec(schema, statsKey, colStatCols, ndvCols0, ndvCols)
  }

  /** One written file's folded stats. `key`/`colBounds` use the
    * manifest's [[TxnLog.EmptyRange]] for an all-NULL column; sketch
    * arrays are the ≤k smallest distinct sign-flipped hashes, sorted
    * ascending (TreeSet order) — exactly [[graft.functions
    * .BottomKLongs]]'s eval order. Plain arrays/tuples so the value
    * rides a task result or DSv2 commit message unmodified. */
  final case class FileStats(
      key: Option[(Long, Long)],
      colBounds: Array[(Long, Long)],
      ndvNulls: Array[Long],
      ndvSketches: Array[Array[Long]])

  /** Per-task, per-file stats folder. NOT thread-safe (one per write
    * task, the task updates it inline with each row it writes). */
  final class Collector(spec: Spec) {
    private val k = TxnLog.NdvSketchK

    /** Integral accessor widened to Long — the value semantics of
      * `cast(col, "bigint")` for byte/short/int/long (exact,
      * order-preserving). */
    private def longReader(ord: Int, dt: DataType): InternalRow => Long =
      dt match {
        case ByteType => r => r.getByte(ord).toLong
        case ShortType => r => r.getShort(ord).toLong
        case IntegerType => r => r.getInt(ord).toLong
        case LongType => r => r.getLong(ord)
        case other => sys.error(
          s"stats bounds need an integral column, got ${other.simpleString}")
      }

    private val keyField = spec.statsKey.map { n =>
      val ord = spec.schema.fieldIndex(n)
      (ord, longReader(ord, spec.schema(ord).dataType))
    }
    private val colFields = spec.colStatCols.map { n =>
      val ord = spec.schema.fieldIndex(n)
      (ord, longReader(ord, spec.schema(ord).dataType))
    }.toArray
    private val ndvFields = spec.ndvCols.map { n =>
      val ord = spec.schema.fieldIndex(n)
      (ord, spec.schema(ord).dataType)
    }.toArray

    // Bounds start AT EmptyRange (MaxValue, MinValue): any observed
    // value tightens both ends, and a column that stays all-NULL
    // yields exactly the explicit EmptyRange entry the manifest
    // convention wants (mn <= mx for any real observation, so the
    // sentinel is unreachable by data).
    private var keyMn = Long.MaxValue
    private var keyMx = Long.MinValue
    private val colMn = Array.fill(colFields.length)(Long.MaxValue)
    private val colMx = Array.fill(colFields.length)(Long.MinValue)
    private val nulls = new Array[Long](ndvFields.length)
    private val sketches =
      Array.fill(ndvFields.length)(mutable.TreeSet.empty[Long])

    def update(row: InternalRow): Unit = {
      keyField.foreach { case (ord, read) =>
        if (!row.isNullAt(ord)) {
          val v = read(row)
          if (v < keyMn) keyMn = v
          if (v > keyMx) keyMx = v
        }
      }
      var i = 0
      while (i < colFields.length) {
        val (ord, read) = colFields(i)
        if (!row.isNullAt(ord)) {
          val v = read(row)
          if (v < colMn(i)) colMn(i) = v
          if (v > colMx(i)) colMx(i) = v
        }
        i += 1
      }
      i = 0
      while (i < ndvFields.length) {
        val (ord, dt) = ndvFields(i)
        if (row.isNullAt(ord)) nulls(i) += 1
        else {
          // Spark's own xxhash64 (seed 42) over the INTERNAL value —
          // bit-identical to `xxhash64(col)` in the read-back scan —
          // sign-flipped so signed order equals unsigned hash order.
          val h = XxHash64Function.hash(row.get(ord, dt), dt, 42L) ^
            Long.MinValue
          val s = sketches(i)
          // Bottom-k distinct insert (BottomKLongs.add semantics; the
          // size-k early reject skips values provably not in the
          // bottom k — identical result, no churn).
          if (s.size < k) s += h
          else if (h < s.last) {
            s += h
            if (s.size > k) s -= s.last
          }
        }
        i += 1
      }
    }

    def result(): FileStats = FileStats(
      spec.statsKey.map(_ => (keyMn, keyMx)),
      colMn.indices.map(i => (colMn(i), colMx(i))).toArray,
      nulls.clone(),
      sketches.map(_.toArray))
  }

  /** Assemble per-file writer results into the [[TxnLog.CommitStats]]
    * commitStatsFor would have produced over the same files — same
    * zero-file shapes (declared-set-keyed empty maps), same map
    * keying (expanded NDV set), no entry for files absent from
    * `perFile` (zero-row outputs write no file). */
  def assemble(
      spec: Spec,
      perFile: Seq[(String, FileStats)]): TxnLog.CommitStats = {
    if (perFile.isEmpty)
      return TxnLog.CommitStats(Map.empty,
        spec.colStatCols.map(_ -> Map.empty[String, (Long, Long)]).toMap,
        spec.ndvCols0.map(_ -> Map.empty[String, Seq[Long]]).toMap)
    if (spec.isEmpty) return TxnLog.CommitStats.empty
    val key = spec.statsKey.fold(Map.empty[String, (Long, Long)]) { _ =>
      perFile.map { case (rel, fs) => rel -> fs.key.get }.toMap
    }
    val colStats = spec.colStatCols.zipWithIndex.map { case (c, i) =>
      c -> perFile.map { case (rel, fs) => rel -> fs.colBounds(i) }.toMap
    }.toMap
    val ndv = spec.ndvCols.zipWithIndex.map { case (c, i) =>
      c -> perFile.map { case (rel, fs) =>
        rel -> (fs.ndvNulls(i) +: fs.ndvSketches(i).toSeq)
      }.toMap
    }.toMap
    TxnLog.CommitStats(key, colStats, ndv)
  }
}
