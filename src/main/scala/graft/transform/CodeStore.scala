package graft.transform

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import scala.jdk.CollectionConverters._

/** File-persisted audit trail of every transform artifact the engine
  * touches — the durable twin of the in-memory [[TransformRegistry]].
  * Mirrors the reference's generated-code saver
  * (`code_saver.py:86-403`): one directory per project slug, one
  * subdirectory per layer, files named
  * `<timestamp>__<name-slug>__<kind>[_vN].sql` with a comment header
  * carrying kind/project/extra metadata. Our transform surface is
  * validated SQL-over-`__input__` steps (SURVEY §7.4), so artifacts are
  * `.sql` with `--` comment headers rather than `.py`.
  *
  * The clock is injectable so tests and the correctness driver get
  * deterministic filenames; production use defaults to UTC wall-clock
  * like the reference (`code_saver.py:47-48`).
  */
final class CodeStore(root: Path, clock: () => Instant = () => Instant.now()) {

  /** Safe filename slug — same normalization as the reference
    * (`code_saver.py:37-40`): lowercase, non-alphanumerics collapsed to
    * `_`, trimmed, bounded length. */
  def slugify(text: String, maxLen: Int = 60): String = {
    val slug = "[^a-z0-9]+".r.replaceAllIn(text.toLowerCase, "_")
      .stripPrefix("_").stripSuffix("_")
    slug.take(maxLen)
  }

  private val TsFmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd_HH-mm-ss").withZone(ZoneOffset.UTC)

  private def timestamp(): String = TsFmt.format(clock())

  private def header(kind: String, project: String,
      extra: Seq[(String, String)]): String = {
    val lines =
      Seq("-- == Generated Transform Code ==",
        s"-- Kind:       $kind",
        s"-- Project:    $project",
        s"-- Saved at:   ${clock().toString}") ++
      extra.map { case (k, v) => s"-- $k: $v" } :+
      ("-- " + "-" * 60) :+ ""
    lines.mkString("\n")
  }

  private def write(rel: Path, content: String): Path = {
    val p = root.resolve(rel)
    Files.createDirectories(p.getParent)
    Files.write(p, content.getBytes(StandardCharsets.UTF_8))
    p
  }

  /** AI-drafted step, named by the user's natural-language query
    * (`code_saver.py:86-103`). */
  def saveAiGenerated(project: String, layer: String, transformName: String,
      userQuery: String, code: String): Path =
    write(
      Paths.get(slugify(project), layer,
        s"${timestamp()}__${slugify(userQuery, 80)}__ai_generated.sql"),
      header(s"${layer.capitalize} Transformation (AI Generated)", project,
        Seq("Transform" -> transformName,
          "User Query" -> userQuery.take(200))) + code)

  /** User-approved step at an explicit version
    * (`code_saver.py:106-123`). */
  def saveConfirmed(project: String, layer: String, name: String,
      code: String, version: Int = 1): Path =
    write(
      Paths.get(slugify(project), layer,
        s"${timestamp()}__${slugify(name)}__confirmed_v$version.sql"),
      header(s"${layer.capitalize} Transformation (Confirmed)", project,
        Seq("Transform" -> name, "Version" -> version.toString)) + code)

  /** Code executed in a sandbox dry-run (`code_saver.py:126-142`). */
  def saveDryRun(project: String, layer: String, name: String,
      code: String): Path =
    write(
      Paths.get(slugify(project), layer,
        s"${timestamp()}__${slugify(name)}__dry_run.sql"),
      header(s"${layer.capitalize} Transformation (Dry Run)", project,
        Seq("Transform" -> name)) + code)

  /** Manually edited step (`code_saver.py:268-284`). */
  def saveManualEdit(project: String, layer: String, name: String,
      code: String): Path =
    write(
      Paths.get(slugify(project), layer,
        s"${timestamp()}__${slugify(name)}__manual_edit.sql"),
      header(s"${layer.capitalize} Transformation (Manual Edit)", project,
        Seq("Transform" -> name)) + code)

  /** Combined chain dump for one layer execution — every step in run
    * order in a single replayable file (`code_saver.py:145-181`). */
  def savePipeline(project: String, layer: String,
      transforms: Seq[(String, Int, String)],
      inPath: String, outPath: String): Path = {
    val body = transforms.zipWithIndex.flatMap {
      case ((name, version, code), i) =>
        Seq("-- " + "=" * 60,
          s"-- Transform ${i + 1}: $name (v$version)",
          "-- " + "=" * 60, code, "", "")
    }
    write(
      Paths.get(slugify(project), layer,
        s"${timestamp()}__upload_to_${layer}__pipeline.sql"),
      header(s"${layer.capitalize} Upload Pipeline", project,
        Seq("Input Path" -> inPath, "Output Path" -> outPath,
          "Transforms" -> transforms.size.toString)) +
        body.mkString("\n"))
  }

  /** Everything saved so far: (project_slug, layer, file_name), sorted.
    * Filenames are self-describing (timestamp, name slug, kind,
    * version), so this listing IS the audit trail. */
  def list(): Seq[(String, String, String)] =
    if (!Files.isDirectory(root)) Seq.empty
    else {
      val walk = Files.walk(root)
      // Materialize fully before closing: Files.walk holds directory
      // handles until the stream is closed.
      try walk.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(root.relativize)
        .filter(_.getNameCount == 3)
        .map(p => (p.getName(0).toString, p.getName(1).toString,
          p.getName(2).toString))
        .toVector.sorted
      finally walk.close()
    }

  /** Read an artifact back (header included). */
  def read(project: String, layer: String, fileName: String): String =
    new String(Files.readAllBytes(
      root.resolve(Paths.get(slugify(project), layer, fileName))),
      StandardCharsets.UTF_8)
}
