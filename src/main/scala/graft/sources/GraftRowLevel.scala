package graft.sources

import java.nio.file.Files

import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetUtils}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.operators.TxnLog

/** SQL `UPDATE`, `MERGE INTO`, and non-translatable `DELETE` over the
  * log — the v2 GROUP-BASED row-level operation contract (the
  * copy-on-write mode Iceberg pioneered). Spark's rewrite rules
  * (`RewriteUpdateTable` / `RewriteMergeIntoTable` /
  * `RewriteDeleteFromTable`) read the table through
  * [[GraftRowLevelOperation.newScanBuilder]], apply the
  * assignments/actions as plan projections, and hand the resulting
  * row set to [[GraftReplaceDataWrite]], which stages parquet on the
  * executors (Spark's own parquet output writers — vectorizable
  * files, identical bytes to any other write) and publishes ONE
  * commit.
  *
  * THE COPY-ON-WRITE CONTRACT, and why the scan is special
  * (`GroupBasedRowLevelOperationScanPlanning` pushes the command's
  * condition into this scan expecting exactly Iceberg's semantics):
  *
  *  - Pushed filters select which GROUPS (files — our group
  *    granularity) participate in the rewrite, via manifest-stats
  *    pruning. A file whose committed [min, max] cannot match the
  *    condition keeps its bytes and its manifest entry untouched.
  *  - The scan returns EVERY ROW of the files it plans — the pushed
  *    condition is NOT applied to rows (no parquet data filters, no
  *    row-group skipping on the condition): unmatched rows of an
  *    affected file must flow through the rewrite unchanged, or they
  *    are silently lost. The condition itself lives in the rewritten
  *    plan's projections (residual semantics), so correctness never
  *    depends on what the scan drops.
  *  - The write commits `(snapshot − scannedFiles) ∪ writtenFiles`:
  *    exactly the files the scan planned are replaced — the file set
  *    the scan records on the shared operation instance
  *    ([[GraftRowLevelOperation.scannedFiles]], the Iceberg
  *    configured-scan idiom). An UPDATE touching 10% of the key
  *    range rewrites ~10% of files at 100 TB, not the table.
  *
  * The commit targets the snapshot the statement read; on a lost
  * race it REBASES automatically iff every intervening commit is
  * DISJOINT from the rewrite's groups (appends, rewrites of
  * unscanned files — Delta's WriteSerializable allowance), and
  * refuses loudly only on TRUE overlap: a commit that rewrote a
  * scanned file does not commute with this statement, so blind retry
  * would silently clobber it (Delta's
  * ConcurrentModificationException discipline). */
final class GraftRowLevelOperation(
    snap: GraftSnapshot, cmd: RowLevelOperation.Command)
  extends RowLevelOperation {

  /** Files the configured scan planned — the groups the write
    * replaces. Defaults to the full snapshot (a scan that pushes no
    * condition rewrites everything, e.g. a MERGE with no
    * target-side predicate). */
  @volatile private[sources] var scannedFiles: Seq[String] =
    snap.manifest.files

  override def command(): RowLevelOperation.Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftCowScanBuilder(SparkSession.active, this, snap, options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new GraftReplaceDataWrite(snap, GraftRowLevelOperation.this)
        override def description(): String = s"GraftReplaceData($cmd)"
      }
    }

  override def description(): String = s"GraftRowLevel($cmd)"
}

final case class GraftRowLevelBuilder(
    snap: GraftSnapshot, info: RowLevelOperationInfo)
  extends RowLevelOperationBuilder {
  /** `spark.graft.rowlevel.mode = mor` routes UPDATE/MERGE/row-level
    * DELETE through the DELTA (merge-on-read) operation
    * ([[GraftDeltaOperation]]: appended rows + position deletes,
    * O(changed rows)); the default stays group-based copy-on-write
    * (O(affected files), zero read-time debt). Semantics are
    * identical either way — the mode is a cost model choice. */
  override def build(): RowLevelOperation =
    if (SparkSession.active.conf.getOption("spark.graft.rowlevel.mode")
        .exists(_.equalsIgnoreCase("mor")))
      new GraftDeltaOperation(snap, info.command)
    else
      new GraftRowLevelOperation(snap, info.command)
}

/** The copy-on-write scan builder: pushed filters prune FILES from
  * manifest metadata and are recorded on the operation so the write
  * replaces exactly those — they are never pushed to the parquet
  * reader as data filters (see [[GraftRowLevelOperation]]'s contract
  * note: a CoW scan must return every row of every file it plans). */
final class GraftCowScanBuilder(
    spark: SparkSession, op: GraftRowLevelOperation,
    snap: GraftSnapshot, options: CaseInsensitiveStringMap)
  extends ScanBuilder with SupportsPushDownCatalystFilters
  with SupportsPushDownRequiredColumns {

  private var requiredSchema: StructType = snap.schema
  private var pushedExprs: Seq[Expression] = Seq.empty

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    pushedExprs = filters
    filters // all residual: the condition stays in the rewritten plan
  }

  override def pushedFilters: Array[Predicate] = Array.empty

  override def pruneColumns(required: StructType): Unit =
    requiredSchema = required

  private def physFilters: Seq[Expression] =
    if (!snap.isMapped) pushedExprs
    else pushedExprs.map(_.transform {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        a.withName(snap.physicalOf(a.name))
    })

  override def build(): Scan = {
    val kept = GraftPruning.prune(snap.manifest, physFilters)
    op.scannedFiles = kept
    // With equality deletes pending, the CoW scan must return every
    // SURVIVING row of the planned files — and only surviving rows: a
    // rewrite that read raw files would bake deleted rows into
    // fresh-seq files (silent resurrection). The shared MoR planner
    // applies them inside the scan; the command's condition is still
    // NOT pushed (the CoW contract below).
    if (snap.manifest.deletes.nonEmpty && kept.nonEmpty) {
      val p = GraftMor.plan(spark, snap, kept, requiredSchema,
        Seq.empty, options)
      return new GraftScan(p.groups.head.scan, snap, Seq.empty, options,
        _ => sys.error("a row-level operation scan cannot stream"),
        mor = Some(p), kept = kept)
    }
    val index = new ManifestFileIndex(spark, snap.root, kept,
      snap.manifest.sizes, snap.physicalSchema)
    val inner = ParquetScanBuilder(spark, index, snap.physicalSchema,
      snap.physicalSchema, options)
    // Deliberately NO inner.pushFilters: row/row-group filtering on
    // the condition would drop the unmatched rows the rewrite must
    // carry forward.
    val physRequired = StructType(requiredSchema.fields.map(f =>
      f.copy(name = snap.physicalOf(f.name))))
    inner.pruneColumns(physRequired)
    new GraftScan(inner.build(), snap, Seq.empty, options,
      _ => sys.error("a row-level operation scan cannot stream"),
      kept = kept, statsExact = true)
  }
}

/** One written file: its table-relative path, row count, and the
  * writer-side commit stats the task folded while writing (r22) —
  * rides the commit message so the driver can drop empty outputs and
  * commit without re-reading ANYTHING. */
final case class GraftWrittenFile(relPath: String, rows: Long,
    stats: Option[WriterStats.FileStats] = None)
  extends WriterCommitMessage

final class GraftReplaceDataWrite(
    snap: GraftSnapshot, op: GraftRowLevelOperation) extends BatchWrite {

  private val spark = SparkSession.active
  private val staging = s"rl${System.currentTimeMillis()}-" +
    java.util.UUID.randomUUID().toString.take(8)

  // Writer-side stats under the SNAPSHOT's declared column sets
  // (r22): the write tasks fold key/column bounds + NDV sketches as
  // they write, so the common (no-rebase) commit runs zero post-write
  // stats jobs; a rebase onto a tip whose sets changed falls back to
  // the fused read-back scan.
  private val writerSpec = WriterStats.spec(spark, snap.physicalSchema,
    snap.manifest.statsKey, snap.manifest.colStats.keys.toSeq.sorted,
    snap.manifest.ndv.keys.toSeq.sorted)

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(snap.root.resolve(staging))
    // Spark's own parquet write setup (codec, write support, schema
    // conf) — the staged files are byte-identical to any df.write.
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val owf = ParquetUtils.prepareWrite(spark.sessionState.conf, job,
      snap.physicalSchema,
      new ParquetOptions(Map.empty[String, String], spark.sessionState.conf))
    GraftWriterFactory(owf, snap.root.toUri.toString, staging,
      snap.physicalSchema,
      new SerializableConfiguration(job.getConfiguration),
      Some(writerSpec))
  }

  // CHECK constraints guard every data-adding write (Delta enforces
  // invariants on UPDATE/MERGE outputs, not just inserts): validate
  // the staged files — physical columns renamed to logical, the names
  // constraint predicates bind — before publishing. Rows the rewrite
  // carried verbatim re-validate too; they were valid when written
  // and stay valid, so the pass costs one scan of O(written bytes).
  private def validateConstraints(
      constraints: Map[String, String], newFiles: Seq[String]): Unit = {
    if (constraints.isEmpty || newFiles.isEmpty) return
    import org.apache.spark.sql.functions.col
    val staged = graft.util.ParquetSchema.read(spark,
      newFiles.map(f => snap.root.resolve(f).toString))
    TxnLog.checkConstraints(
      staged.select(staged.columns.toSeq.map(c =>
        col(c).as(snap.logicalOf(c))): _*),
      constraints)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val written = messages.map(_.asInstanceOf[GraftWrittenFile])
    val newFiles = written.filter(_.rows > 0).map(_.relPath).toSeq.sorted
    // Replace EXACTLY the files the configured scan planned (the
    // groups that participated in the rewrite); everything the
    // condition's stats pruned survives untouched, with its stats,
    // partition values, and sizes carried forward.
    val scanned = op.scannedFiles.toSet
    // Stats are computed under the key set of the manifest we COMMIT
    // against, not the snapshot we read: a lost race can rebase onto
    // a tip whose statsKey / colStats column set changed, and bounds
    // recorded under the wrong column would silently mis-prune later
    // scans. Memoized per key set — recomputed only when a rebase
    // actually changed it (the append path's statsCache discipline).
    val statsCache = scala.collection.mutable.Map
      .empty[(Option[String], Seq[String], Seq[String]),
        TxnLog.CommitStats]
    // Pre-seed with the WRITER-SIDE stats the tasks folded while
    // writing (r22) under the snapshot's declared sets — the common
    // path commits with zero post-write stats jobs; only a rebase
    // onto changed sets re-scans.
    statsCache.put(
      (snap.manifest.statsKey, snap.manifest.colStats.keys.toSeq.sorted,
        snap.manifest.ndv.keys.toSeq.sorted),
      WriterStats.assemble(writerSpec,
        written.filter(_.rows > 0).toSeq
          .flatMap(w => w.stats.map(w.relPath -> _))))
    // Row counts came from the write tasks themselves (the
    // StagedWrite discipline — zero footer reads); without them a
    // copy-on-write UPDATE/MERGE/DELETE would commit files with no
    // `rows` entries and the connector's exact rowCount (which needs
    // FULL coverage of kept files) would go dark until a compaction
    // rewrote them.
    val newRows = written.filter(_.rows > 0)
      .map(w => w.relPath -> w.rows).toMap
    // Conflict discipline (the Delta/Iceberg WriteSerializable
    // check): a lost commit race REBASES onto the new tip iff every
    // intervening commit is DISJOINT from the rewrite's groups —
    // append-only commits and rewrites of unscanned files commute
    // with this operation (their files survive the rebased commit
    // untouched; rows a concurrent append landed were never seen by
    // this statement, exactly WriteSerializable's insert semantics).
    // A commit that removed/rewrote any SCANNED file does NOT
    // commute — rebasing would clobber it — so the statement refuses
    // loudly and the user retries against fresh data.
    var base = snap.manifest
    var attempts = 0
    // Validate against the snapshot's constraint set; a rebase onto a
    // tip whose set CHANGED (concurrent ADD CONSTRAINT) re-validates
    // under the new set before committing under it.
    var checkedUnder: Map[String, String] = null
    while (attempts < 10) {
      if (base.constraints != checkedUnder) {
        validateConstraints(base.constraints, newFiles)
        checkedUnder = base.constraints
      }
      // Key bounds + column bounds + NDV sketches for the staged
      // files in ONE fused scan (TxnLog.commitStatsFor, r21) — a
      // rebase onto a tip whose declaration sets changed recomputes
      // under the new sets; same-set retries hit the cache. Without
      // the NDV leg, every SQL UPDATE/MERGE/DELETE would break the
      // full-coverage requirement and blind the CBO's string-key NDV
      // until the next compaction.
      val cs = statsCache.getOrElseUpdate(
        (base.statsKey, base.colStats.keys.toSeq.sorted,
          base.ndv.keys.toSeq.sorted),
        TxnLog.commitStatsFor(spark, snap.root, newFiles, base.statsKey,
          base.colStats.keys.toSeq.sorted, base.ndv.keys.toSeq.sorted))
      val newStats = cs.key
      val newColStats = cs.colStats
      val newNdv = cs.ndv
      val keptFiles = base.files.filterNot(scanned) ++ newFiles
      TxnLog.tryCommitManifest(snap.root, TxnLog.Manifest(
        base.version + 1, base.version, "replace", keptFiles,
        (base.stats -- scanned) ++ newStats,
        base.statsKey,
        partitions = base.partitions -- scanned,
        columns = base.columns,
        sizes = TxnLog.fileSizes(snap.root, keptFiles, base.sizes),
        colStats = base.colStats.map { case (c, perFile) =>
          c -> ((perFile -- scanned) ++ newColStats.getOrElse(c, Map.empty))
        },
        // The scan APPLIED the snapshot's pending equality deletes to
        // the files it replaces (fresh seq, coverage baked in); the
        // list rides along for the untouched files it still scopes.
        deletes = base.deletes,
        rows = newRows, ndv = newNdv), parentHint = Some(base)) match {
        case Some(_) => return
        case None =>
          attempts += 1
          val tipM = TxnLog.tip(snap.root)
          // Walk the intervening chain; each step's REMOVED set is
          // what that commit rewrote/deleted.
          val vs = TxnLog.versions(snap.root)
            .filter(v => v > base.version && v <= tipM.version).sorted
          var prevFiles = base.files.toSet
          vs.foreach { v =>
            val mv = TxnLog.readManifest(snap.root, v)
            val removed = prevFiles -- mv.files.toSet
            if (removed.exists(scanned)) sys.error(
              s"concurrent commit $v on ${snap.root} rewrote files " +
                "this row-level operation planned: the group rewrite " +
                "does not commute — retry the statement")
            // A concurrent NEW equality delete does not commute
            // either: this statement's output files carry a fresh seq
            // and would ESCAPE it, resurrecting rows the delete must
            // remove. (A delete that vanished means a materialize ran
            // — caught above via the files it rewrote.)
            val known = snap.manifest.deletes.toSet
            if (mv.deletes.exists(d => !known(d))) sys.error(
              s"concurrent merge-on-read delete at commit $v on " +
                s"${snap.root} does not commute with this row-level " +
                "operation — retry the statement")
            prevFiles = mv.files.toSet
          }
          base = tipM
      }
    }
    sys.error(s"row-level commit lost 10 races on ${snap.root}")
  }

  // Staged files of an aborted write are reclaimed by the age-guarded
  // vacuum, like any other lost attempt.
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

final case class GraftWriterFactory(
    owf: OutputWriterFactory, rootUri: String, staging: String,
    schema: StructType, conf: SerializableConfiguration,
    spec: Option[WriterStats.Spec] = None)
  extends DataWriterFactory {

  override def createWriter(
      partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val ctx = new TaskAttemptContextImpl(conf.value,
      new TaskAttemptID("graft", 0, TaskType.MAP, partitionId, 0))
    val rel =
      s"$staging/part-$partitionId-$taskId${owf.getFileExtension(ctx)}"
    val out = owf.newInstance(s"$rootUri/$rel", schema, ctx)
    // Writer-side stats folded over the rows AS WRITTEN (r22) — after
    // any marker projection, so the stats describe the file's bytes.
    val collector = spec.filterNot(_.isEmpty)
      .map(new WriterStats.Collector(_))
    new DataWriter[InternalRow] {
      private var rows = 0L
      // Group-based ReplaceData with NO declared metadata attributes
      // leaves the rewrite's leading __row_operation marker in the
      // task rows (Spark applies ReplaceDataProjections only on the
      // metadata-bearing task; Iceberg never hits this corner because
      // it always requires a _file column). Detect the one-extra-
      // leading-column shape on the first record and project it off;
      // rows already matching the schema pass through untouched.
      private var proj: org.apache.spark.sql.catalyst.ProjectingInternalRow = _
      override def write(record: InternalRow): Unit = {
        if (rows == 0 && record.numFields == schema.length + 1)
          proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
            schema, 1 to schema.length)
        if (proj == null) {
          out.write(record)
          collector.foreach(_.update(record))
        } else {
          proj.project(record)
          out.write(proj)
          collector.foreach(_.update(proj))
        }
        rows += 1
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        GraftWrittenFile(rel, rows, collector.map(_.result()))
      }
      override def abort(): Unit = out.close()
      override def close(): Unit = ()
    }
  }
}
