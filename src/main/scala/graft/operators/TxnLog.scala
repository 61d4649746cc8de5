package graft.operators

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A versioned transaction log for a parquet table directory — the
  * commit protocol the lakehouse ops ([[SourceSinkQueries.mergeCow]]
  * COW, snapshot reads, vacuum) previously improvised from directory
  * listings, made explicit the way every table format builds it
  * (Delta's `_delta_log`, Iceberg's metadata chain — the PUBLIC
  * design; this is an original implementation of the protocol shape,
  * cf. /root/reference/ `schemas.py:342-343`'s versioned bronze paths
  * which imply exactly this read-side contract):
  *
  * ```
  * table/
  *   <data files, never mutated after publish>
  *   _log/00000000.json   {"version":0,"parent":-1,"action":"create",
  *   _log/00000001.json    "files":["part-...parquet", ...]}
  * ```
  *
  * - **Manifests are the table.** A version's manifest names the exact
  *   data files (paths relative to the table root) that make up that
  *   snapshot. Data files are immutable and additive; versions share
  *   unchanged files.
  * - **Commit = put-if-absent of `_log/<version>.json`.** The manifest
  *   body is written to a temp file first, then PUBLISHED with an
  *   atomic hard link (`Files.createLink`), which fails with
  *   `FileAlreadyExistsException` iff that version already exists —
  *   never replaces, unlike POSIX rename. Content is complete before
  *   the link, so a manifest is visible iff it is whole; the link is
  *   the single atomic commit point. This is the same
  *   rename-if-absent contract Delta requires of its log store.
  * - **Optimistic concurrency.** A writer reads the latest version V,
  *   computes its new file set against V's manifest, and tries to
  *   commit V+1. A concurrent committer winning V+1 surfaces as the
  *   put-if-absent failure; the loser re-reads, REBASES its file set
  *   on the new tip, and retries ([[commitRetry]]).
  * - **Readers pin a version.** [[readVersion]] resolves one manifest
  *   and reads exactly its files — later commits are invisible
  *   (snapshot isolation), and a pinned read never sees a torn table
  *   because manifests only ever reference fully-written files.
  * - **Vacuum liveness derives from the log.** A file is live iff some
  *   RETAINED manifest references it ([[liveFiles]]); everything else
  *   older than the retention horizon is garbage. Expiring old
  *   versions = deleting their manifests, after which vacuum reclaims
  *   the files only they referenced.
  *
  * At 100 TB the log is O(versions) driver-side metadata; manifests
  * are O(nFiles) lines each and could themselves page to parquet at
  * extreme file counts (the [[SourceSinkQueries.sourceFileBloomIndex]]
  * discipline) — the protocol is unchanged by where manifests live.
  */
object TxnLog {

  /** One committed snapshot: the exact file list, plus (when the
    * writer supplied them) per-file [min, max] stats of the table's
    * key column — the footer-stats idea lifted into the manifest, so
    * a key-scoped MERGE plans its affected-file set from METADATA
    * instead of scanning the tip (what Delta's add-file stats and
    * Iceberg's manifest column bounds do). Stats are carried forward
    * for surviving files on every commit, so one stats-bearing commit
    * heals the whole chain. */
  final case class Manifest(
      version: Long, parent: Long, action: String, files: Seq[String],
      stats: Map[String, (Long, Long)] = Map.empty)

  final case class Committed(version: Long, conflicts: Int)

  def logDir(table: Path): Path = table.resolve("_log")

  private def manifestPath(table: Path, version: Long): Path =
    logDir(table).resolve(f"$version%08d.json")

  /** All committed versions, ascending. */
  def versions(table: Path): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val d = logDir(table)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val s = Files.list(d)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.endsWith(".json") && !n.startsWith("."))
        .map(_.stripSuffix(".json").toLong).toSeq.sorted
      finally s.close()
    }
  }

  def latest(table: Path): Option[Long] = versions(table).lastOption

  def readManifest(table: Path, version: Long): Manifest = {
    val txt = new String(Files.readAllBytes(manifestPath(table, version)),
      java.nio.charset.StandardCharsets.UTF_8)
    parse(txt)
  }

  def render(m: Manifest): String = {
    val fs = m.files.map(f => "\"" + f + "\"").mkString(",")
    val stats =
      if (m.stats.isEmpty) ""
      else m.stats.toSeq.sortBy(_._1).map { case (f, (lo, hi)) =>
        "\"" + f + "\":[" + lo + "," + hi + "]"
      }.mkString(""","stats":{""", ",", "}")
    s"""{"version":${m.version},"parent":${m.parent},""" +
      s""""action":"${m.action}","files":[$fs]$stats}"""
  }

  def parse(txt: String): Manifest = {
    def long(k: String): Long =
      s""""$k":(-?\\d+)""".r.findFirstMatchIn(txt).get.group(1).toLong
    val action =
      """"action":"([^"]*)"""".r.findFirstMatchIn(txt).get.group(1)
    val filesBody =
      """"files":\[([^\]]*)\]""".r.findFirstMatchIn(txt).get.group(1)
    val files =
      if (filesBody.isEmpty) Seq.empty
      else filesBody.split(",").toSeq.map(_.trim.stripPrefix("\"")
        .stripSuffix("\""))
    val stats = """"stats":\{(.*)\}""".r.findFirstMatchIn(txt)
      .map(_.group(1)).map { body =>
        """"([^"]+)":\[(-?\d+),(-?\d+)\]""".r.findAllMatchIn(body)
          .map(g => g.group(1) -> (g.group(2).toLong, g.group(3).toLong))
          .toMap
      }.getOrElse(Map.empty[String, (Long, Long)])
    Manifest(long("version"), long("parent"), action, files, stats)
  }

  /** One optimistic commit attempt of `parent + 1`. Returns the new
    * version, or None iff another committer won that version (the
    * put-if-absent failure) — any other I/O failure propagates. */
  def tryCommit(
      table: Path, parent: Long, action: String,
      files: Seq[String],
      stats: Map[String, (Long, Long)] = Map.empty): Option[Long] = {
    val version = parent + 1
    val dir = logDir(table)
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, ".tmp-", ".json")
    try {
      Files.write(tmp,
        render(Manifest(version, parent, action, files, stats))
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      try {
        Files.createLink(manifestPath(table, version), tmp)
        Some(version)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => None
      }
    } finally Files.deleteIfExists(tmp)
  }

  /** Commit with rebase-and-retry: `filesFor` receives the CURRENT
    * tip's manifest (file list empty at version -1) and returns the
    * full file set of the new version — called again after every lost
    * race so the writer rebases on what actually committed. Returns
    * the committed version and how many conflicts were detected. */
  def commitRetry(
      table: Path, action: String,
      filesFor: Manifest => Seq[String],
      maxAttempts: Int = 10,
      statsFor: Manifest => Map[String, (Long, Long)] =
        _ => Map.empty): Committed = {
    var conflicts = 0
    while (conflicts < maxAttempts) {
      val tip = latest(table)
        .map(readManifest(table, _))
        .getOrElse(Manifest(-1L, -2L, "none", Seq.empty))
      tryCommit(table, tip.version, action, filesFor(tip),
        statsFor(tip)) match {
        case Some(v) => return Committed(v, conflicts)
        case None => conflicts += 1
      }
    }
    sys.error(s"commit lost $maxAttempts races on $table")
  }

  /** Per-file [min, max] of `key` for the given (relative) files — the
    * stats a commit carries so later MERGEs plan from metadata. One
    * key-column scan of exactly those files. */
  def keyStats(
      spark: SparkSession, table: Path, files: Seq[String],
      key: String): Map[String, (Long, Long)] = {
    import org.apache.spark.sql.functions._
    if (files.isEmpty) Map.empty
    else spark.read.parquet(files.map(f => table.resolve(f).toString): _*)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(key)).as("kmin"), max(col(key)).as("kmax"))
      .collect()
      .map { r =>
        val base = r.getString(0).split('/').last
        val rel = files.find(_.split('/').last == base).getOrElse(base)
        rel -> (r.getLong(1), r.getLong(2))
      }.toMap
  }

  /** Files referenced by ANY of the retained versions — the liveness
    * set vacuum must never touch. */
  def liveFiles(table: Path, retained: Seq[Long]): Set[String] =
    retained.flatMap(readManifest(table, _).files).toSet

  /** Pin one version and read exactly its files. */
  def readVersion(
      spark: SparkSession, table: Path, version: Long): DataFrame = {
    val m = readManifest(table, version)
    require(m.files.nonEmpty, s"version $version is an empty table")
    spark.read.parquet(
      m.files.map(f => table.resolve(f).toString): _*)
  }

  /** Key-scoped copy-on-write MERGE as a log commit: `batch` carries
    * the table's columns plus an `op` column (`upsert` / `delete`).
    * Per-file [min, max] stats of `key` (one key-column scan of the
    * tip today; carried in the manifest at real scale, where this
    * becomes a metadata-only read) pick the files the batch's key
    * range can live in; ONLY those full-outer-merge with the batch —
    * matched upserts take the source row (provenance, not coalesce:
    * NULL restatement works, the [[SourceSinkQueries.mergeCow]]
    * lesson), tombstones drop, inserts land — and the commit is
    * (tip − affected) ∪ rewritten. A batch whose keys sit beyond
    * every file's range (pure insert) appends without reading
    * anything. Old files survive for time travel until expiry. */
  def mergeCowByKey(
      spark: SparkSession, table: Path, batch: DataFrame,
      key: String, subdir: String, maxAttempts: Int = 10): Committed = {
    import org.apache.spark.sql.functions._
    val bounds = batch.agg(min(col(key)), max(col(key))).head()
    val (bmn, bmx) = (bounds.getLong(0), bounds.getLong(1))
    val valueCols = batch.columns.filterNot(c => c == key || c == "op")
    var attempt = 0
    var conflicts = 0
    while (attempt < maxAttempts) {
      val tipVersion = latest(table).getOrElse(
        sys.error(s"mergeCowByKey needs an existing table at $table"))
      val tip = readManifest(table, tipVersion)
      // Affected-file planning is METADATA-ONLY when the tip's
      // manifest carries stats for every file (any stats-bearing
      // commit heals the chain — see below); the key-column scan is
      // only the bootstrap path for a log created before stats
      // existed.
      val ranges: Map[String, (Long, Long)] =
        if (tip.files.forall(tip.stats.contains)) tip.stats
        else keyStats(spark, table, tip.files, key)
      val affected = tip.files.filter { f =>
        val (kmin, kmax) = ranges(f)
        kmin <= bmx && kmax >= bmn
      }.toSet
      val merged =
        if (affected.isEmpty)
          batch.filter(col("op") =!= "delete").drop("op")
        else
          spark.read
            .parquet(affected.toSeq.map(f => table.resolve(f).toString): _*)
            .as("t")
            .join(batch.as("s"), Seq(key), "full_outer")
            .filter(col("s.op").isNull || col("s.op") =!= "delete")
            .select(col(key) +: valueCols.toSeq.map(c =>
              when(col("s.op").isNotNull, col(s"s.$c"))
                .otherwise(col(s"t.$c")).as(c)): _*)
      val attemptDir = if (attempt == 0) subdir else s"$subdir-r$attempt"
      merged.coalesce(1).write.parquet(table.resolve(attemptDir).toString)
      // New files' stats cost one O(batch) scan; survivors' stats
      // carry forward, so every merge commit leaves a fully
      // stats-bearing tip.
      val newFiles = parquetsUnder(table, attemptDir)
      val newStats = keyStats(spark, table, newFiles, key)
      // A COW rewrite does NOT commute the way an append does: losing
      // the race means the files this attempt read (and replaced) may
      // no longer be the tip's — blindly unioning file sets would
      // double-apply any overlapping rewrite. So the commit targets
      // EXACTLY the observed tip version; a conflict abandons this
      // attempt's files (left for vacuum, like any aborted write) and
      // REPLANS the whole merge against the new tip — the
      // serializable-writer discipline, not just retry-the-rename.
      tryCommit(table, tipVersion, "merge",
        tip.files.filterNot(affected) ++ newFiles,
        (ranges -- affected) ++ newStats) match {
        case Some(v) => return Committed(v, conflicts)
        case None => conflicts += 1; attempt += 1
      }
    }
    sys.error(s"merge lost $maxAttempts races on $table")
  }

  /** Compaction as a pure manifest swap: the tip's contents coalesced
    * into `nFiles`, committed as the next version. Readers of any
    * pinned version never notice. */
  def compact(
      spark: SparkSession, table: Path, subdir: String,
      nFiles: Int = 1, statsKey: Option[String] = None): Committed = {
    val tipVersion = latest(table).get
    readVersion(spark, table, tipVersion).coalesce(nFiles)
      .write.parquet(table.resolve(subdir).toString)
    val newFiles = parquetsUnder(table, subdir)
    val stats = statsKey
      .map(k => keyStats(spark, table, newFiles, k))
      .getOrElse(Map.empty[String, (Long, Long)])
    commitRetry(table, "compact", _ => newFiles, statsFor = _ => stats)
  }

  /** Expire all but the last `retainLast` versions: their manifests
    * are deleted, which is what makes their exclusively-referenced
    * files vacuum-eligible. Returns the expired versions. */
  def expire(table: Path, retainLast: Int): Seq[Long] = {
    val drop = versions(table).dropRight(retainLast)
    drop.foreach(v => Files.delete(
      logDir(table).resolve(f"$v%08d.json")))
    drop
  }

  /** Every parquet data file under the table root (any depth),
    * relative paths, `_log` excluded. */
  def dataFiles(table: Path): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val s = Files.walk(table)
    try s.iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(p => table.relativize(p).toString)
      .filterNot(_.startsWith("_log"))
      .toSeq.sorted
    finally s.close()
  }

  final case class Vacuumed(deleted: Seq[String], keptUnreferenced: Seq[String])

  /** Log-derived vacuum: delete every data file that (a) no RETAINED
    * manifest references and (b) is older than the retention horizon.
    * The age guard is what protects an in-flight writer's
    * not-yet-committed files — exactly the
    * [[SourceSinkQueries.sinkVacuumRetention]] discipline, with
    * liveness from the log instead of a listing. */
  def vacuum(table: Path, horizonMs: Long): Vacuumed = {
    val live = liveFiles(table, versions(table))
    val cutoff = System.currentTimeMillis() - horizonMs
    val (doomed, keptUnref) = dataFiles(table)
      .filterNot(live)
      .partition(f => table.resolve(f).toFile.lastModified() < cutoff)
    doomed.foreach(f => Files.delete(table.resolve(f)))
    Vacuumed(doomed, keptUnref)
  }

  /** Relative paths (to the table root) of the parquet files a Spark
    * write just produced under `subdir` — the file-set a commit
    * references. */
  def parquetsUnder(table: Path, subdir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val d = table.resolve(subdir)
    val s = Files.list(d)
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".parquet"))
      .map(n => if (subdir.isEmpty) n else s"$subdir/$n")
      .toSeq.sorted
    finally s.close()
  }
}
