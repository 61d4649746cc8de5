package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, StructType}

/** Merge-on-read plumbing for EQUALITY DELETES inside the DSv2 scan —
  * the Iceberg v2 design (spec §"Equality delete files"; readers load
  * the applicable delete set and drop matching rows during the scan,
  * `DeleteFilter` in the reference implementations). Putting the
  * filter INSIDE the scan is what makes every consumer correct with no
  * plan rewrite: SQL, time travel, catalog reads and DataFrame reads
  * all pass through here.
  *
  * Shape: the snapshot's data files group by WHICH deletes apply to
  * them (per-file sequence strictly below the delete's — later appends
  * escape, so deleted keys can be re-inserted). Each group gets its own
  * inner parquet scan, with the delete-key columns force-included; a
  * wrapping reader drops rows whose key sits in the group's (sorted,
  * binary-searched) deleted-key array and projects any force-included
  * column back out. Rows, not columnar batches: the same trade Iceberg
  * makes — MoR reads pay a row-filter tax until compaction repays it.
  *
  * Scale: the delete arrays are O(pending deleted keys) driver/task
  * memory — bounded by compaction cadence exactly as in Iceberg, and
  * the reason [[graft.operators.TxnLog.materializeDeletes]] exists.
  */
private[sources] object GraftMor {

  /** One group of data files sharing the same applicable deletes.
    * `keyFilters`: (ordinal in the inner scan's output row, field
    * type, sorted deleted keys). `project`: ordinals of the caller's
    * required columns within the inner row, when force-included key
    * columns must be projected back out (None = inner row is already
    * the required shape). */
  final case class Group(
      scan: Scan,
      keyFilters: Seq[(Int, DataType, Array[Long])],
      project: Option[Seq[(Int, DataType)]])

  /** A fully-planned MoR read: the groups, the scan's reported
    * (logical-name) schema, and the manifest-sizes byte estimate that
    * keeps broadcast decisions working. */
  final case class Plan(
      groups: Seq[Group], logicalSchema: StructType, sizeBytes: Long)

  final case class MorInputPartition(group: Int, inner: InputPartition)
    extends InputPartition

  final class MorBatch(groups: Seq[Group]) extends Batch {
    override def planInputPartitions(): Array[InputPartition] =
      groups.zipWithIndex.flatMap { case (g, i) =>
        g.scan.toBatch.planInputPartitions()
          .map(p => MorInputPartition(i, p): InputPartition)
      }.toArray

    override def createReaderFactory(): PartitionReaderFactory =
      new MorReaderFactory(groups.map(g =>
        (g.scan.toBatch.createReaderFactory(), g.keyFilters, g.project)))
  }

  final class MorReaderFactory(
      groups: Seq[(PartitionReaderFactory,
        Seq[(Int, DataType, Array[Long])],
        Option[Seq[(Int, DataType)]])])
    extends PartitionReaderFactory {

    // Row-based on purpose: filtering inside columnar batches would
    // mean rebuilding vectors per batch; the row reader is the
    // documented MoR cost and only pending-delete snapshots pay it.
    override def supportColumnarReads(p: InputPartition): Boolean = false

    override def createReader(
        p: InputPartition): PartitionReader[InternalRow] = {
      val mp = p.asInstanceOf[MorInputPartition]
      val (factory, keyFilters, project) = groups(mp.group)
      val inner = factory.createReader(mp.inner)
      new PartitionReader[InternalRow] {
        private val proj = project.map(ords => UnsafeProjection.create(
          ords.map { case (i, dt) =>
            BoundReference(i, dt, nullable = true)
          }))
        private var current: InternalRow = _

        // NULL keys never match an equality delete (SQL equality
        // semantics; Iceberg behaves the same) — kept.
        private def deleted(r: InternalRow): Boolean =
          keyFilters.exists { case (ord, dt, keys) =>
            !r.isNullAt(ord) && {
              val v = dt match {
                case LongType => r.getLong(ord)
                case IntegerType => r.getInt(ord).toLong
                case ShortType => r.getShort(ord).toLong
                case ByteType => r.getByte(ord).toLong
                case other => throw new IllegalStateException(
                  s"non-integral equality-delete key type $other")
              }
              java.util.Arrays.binarySearch(keys, v) >= 0
            }
          }

        override def next(): Boolean = {
          while (inner.next()) {
            val r = inner.get()
            if (!deleted(r)) { current = r; return true }
          }
          false
        }

        override def get(): InternalRow =
          proj.map(_.apply(current)).getOrElse(current)

        override def close(): Unit = inner.close()
      }
    }
  }

  /** The required columns of `requested` in DATA-SCHEMA order with
    * physical names — the row shape a graft inner parquet scan reports
    * (`FileScanBuilder` prunes in dataSchema order, not request
    * order). */
  def physRequired(snap: GraftSnapshot, requested: StructType): StructType = {
    val wanted = requested.fieldNames.map(snap.physicalOf).toSet
    StructType(snap.physicalSchema.fields.filter(f => wanted(f.name)))
  }

  /** Plan the full MoR read over `kept` files: collect the deleted
    * keys ONCE on the driver (O(pending deleted keys), the Iceberg
    * eq-delete bound), group files by applicable deletes, and build
    * each group's inner parquet scan with its delete-key columns
    * force-included. `filters` are pushed to the inner scans when
    * given — the copy-on-write row-level scan passes none (its
    * contract forbids data filters), the plain read path passes its
    * residual filters. */
  def plan(spark: org.apache.spark.sql.SparkSession, snap: GraftSnapshot,
      kept: Seq[String], requested: StructType,
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap): Plan = {
    import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
    val m = snap.manifest
    val keysByFile: Map[String, Array[Long]] = m.deletes.map { d =>
      d.path -> spark.read.parquet(snap.root.resolve(d.path).toString)
        .select(org.apache.spark.sql.functions.col(d.key).cast("long"))
        .na.drop().distinct()
        .collect().map(_.getLong(0)).sorted
    }.toMap
    val outPhys = physRequired(snap, requested)
    def scanOver(files: Seq[String], extra: Seq[String]): Scan = {
      val index = new ManifestFileIndex(spark, snap.root, files,
        m.sizes, snap.physicalSchema)
      val b = ParquetScanBuilder(spark, index, snap.physicalSchema,
        snap.physicalSchema, options)
      if (filters.nonEmpty) b.pushFilters(filters)
      b.pruneColumns(StructType(outPhys.fields ++
        extra.filterNot(outPhys.fieldNames.contains)
          .map(snap.physicalSchema(_))))
      b.build()
    }
    val groups = kept.groupBy(f =>
        m.deletes.filter(d => m.seqs.getOrElse(f, -1L) < d.seq))
      .toSeq.sortBy(_._2.head)
      .map { case (dels, fs) =>
        val extra =
          dels.map(_.key).distinct.filterNot(outPhys.fieldNames.contains)
        val inner = scanOver(fs, extra)
        val innerSchema = inner.readSchema()
        val keyFilters = dels.groupBy(_.key).toSeq.sortBy(_._1).map {
          case (k, ds) =>
            val keys = ds.flatMap(d => keysByFile(d.path))
              .distinct.sorted.toArray
            (innerSchema.fieldIndex(k), innerSchema(k).dataType, keys)
        }
        val project =
          if (extra.isEmpty) None
          else Some(outPhys.fields.toSeq.map(f =>
            (innerSchema.fieldIndex(f.name), f.dataType)))
        Group(inner, keyFilters, project)
      }
    val outSchema = StructType(outPhys.fields.map(f =>
      f.copy(name = snap.logicalOf(f.name))))
    Plan(groups, outSchema, math.max(kept.flatMap(m.sizes.get).sum, 1L))
  }
}
