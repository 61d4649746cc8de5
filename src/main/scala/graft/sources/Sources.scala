package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** File / API scan operators — SURVEY.md §2.1.
  *
  * CSV/JSON/Parquet scans mirror the reference's reader options
  * (`backend/app/services/ingestion/bronze_ingestion.py:139-151`); the
  * glob scan mirrors `schema_detection.py:474-496` (case-insensitive
  * extensions, one-level recursion, dedupe + sort).
  *
  * Scale note: all file reads are plain `spark.read` scans — Catalyst
  * handles partition discovery, predicate pushdown and column pruning;
  * nothing here forces a driver-side materialization except the REST
  * fetch, which is inherently a driver-side HTTP loop at reference scale.
  */
object Sources {

  /** scan_csv — header/delimiter/encoding options, schema inferred or
    * supplied (supplied schema = the user-confirmed registry schema). */
  def scanCsv(
      spark: SparkSession,
      path: String,
      header: Boolean = true,
      sep: String = ",",
      encoding: String = "utf-8",
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
      .option("header", header.toString)
      .option("sep", sep)
      .option("encoding", encoding)
    schema match {
      case Some(s) => r.schema(s).csv(path)
      case None    => r.option("inferSchema", "true").csv(path)
    }
  }

  /** scan_json — JSON-lines files; explicit schema avoids the re-inference
    * type drift the reference suffers between layers (SURVEY.md §1.3). */
  def scanJson(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None): DataFrame =
    schema match {
      case Some(s) => spark.read.schema(s).json(path)
      case None    => spark.read.json(path)
    }

  /** scan_parquet. */
  def scanParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  private val DataExts = Set("csv", "json", "jsonl", "parquet", "pq")

  /** source_file_scan_glob — list data files under a directory
    * (case-insensitive extension match, one-level recursion), dedupe,
    * sort. Returns paths; callers feed them to the scan_* readers. */
  def globScan(spark: SparkSession, dir: String): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def listDir(p: org.apache.hadoop.fs.Path, depth: Int): Seq[String] = {
      if (!fs.exists(p)) return Nil
      fs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory && depth < 1) listDir(st.getPath, depth + 1)
        else if (st.isFile) {
          val name = st.getPath.getName
          val ext = name.split('.').lastOption.map(_.toLowerCase).getOrElse("")
          if (DataExts.contains(ext) && !name.startsWith("_")
            && !name.startsWith(".")) Seq(st.getPath.toString)
          else Nil
        } else Nil
      }
    }
    listDir(new org.apache.hadoop.fs.Path(dir), 0).distinct.sorted
  }

  /** scan_db — JDBC source. The reference declares this source type but
    * never implemented it (`models/models.py:63-66`, rejected at
    * `routers/schemas.py:54-55`); Spark makes it trivial. Partitioned
    * reads (`partitionColumn` + bounds) parallelize the extract; no
    * database exists in this environment, so this is exercised only for
    * wiring. */
  def scanJdbc(
      spark: SparkSession,
      url: String,
      table: String,
      user: String = "",
      password: String = "",
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
    partitionColumn match {
      case Some((c, lo, hi, n)) =>
        base.option("partitionColumn", c)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", n).load()
      case None => base.load()
    }
  }

  // --------------------------------------------------------------------
  // scan_rest_api — paginated HTTP fetch (reference
  // `dag_generator.py:203-287`, data-key resolver
  // `schema_detection.py:611-652`). The HTTP call is pluggable so the
  // zero-egress environment (and tests) can inject a deterministic
  // fetcher; production would pass a java.net.http-based function.
  // --------------------------------------------------------------------

  final case class ApiConfig(
      url: String,
      dataKey: Option[String] = None,
      nextKey: Option[String] = None,
      maxPages: Int = 10,
      pageParam: String = "page")

  private val mapper = new ObjectMapper()

  /** Resolve a dot/bracket path like `query.recentchanges` or
    * `data[0].items` into a JSON node; if no key given, auto-try the
    * conventional wrappers (results/data/items/records/rows), else treat
    * the root as the record array. */
  private[graft] def resolveDataNode(
      root: JsonNode, dataKey: Option[String]): JsonNode = {
    def walk(node: JsonNode, path: String): Option[JsonNode] = {
      val parts = path.split('.').toSeq.flatMap { seg =>
        // split bracket indices: items[0] -> items, 0
        val m = "([^\\[\\]]+)|\\[(\\d+)\\]".r.findAllMatchIn(seg).toSeq
        m.map(g => Option(g.group(1)).getOrElse(g.group(2)))
      }
      parts.foldLeft(Option(node)) {
        case (Some(n), p) if p.forall(_.isDigit) && n.isArray =>
          Option(n.get(p.toInt))
        case (Some(n), p) if n.has(p) => Option(n.get(p))
        case _ => None
      }
    }
    dataKey match {
      case Some(k) => walk(root, k).getOrElse(root)
      case None if root.isArray => root
      case None =>
        Seq("results", "data", "items", "records", "rows")
          .flatMap(k => Option(root.get(k)))
          .find(_.isArray)
          .getOrElse(root)
    }
  }

  /** Fetch all pages with `fetch` (url → response body), following the
    * `nextKey` pagination cursor up to `maxPages`; returns the extracted
    * record objects as JSON strings. */
  def fetchApiRecords(
      fetch: String => String, cfg: ApiConfig): Seq[String] = {
    val out = Seq.newBuilder[String]
    var url: Option[String] = Some(cfg.url)
    var page = 0
    while (url.isDefined && page < cfg.maxPages) {
      val root = mapper.readTree(fetch(url.get))
      val data = resolveDataNode(root, cfg.dataKey)
      if (data.isArray) data.elements().asScala.foreach(n => out += n.toString)
      else out += data.toString
      url = cfg.nextKey.flatMap(k =>
        Option(root.get(k)).filter(n => !n.isNull).map(_.asText))
      page += 1
    }
    out.result()
  }

  /** scan_rest_api — paginated fetch → DataFrame. Driver-side loop then a
    * distributed JSON parse over the collected strings (reference scale:
    * thousands of records; a 100 TB pipeline would land raw pages to
    * object storage and scan those files instead). */
  def scanRestApi(
      spark: SparkSession,
      fetch: String => String,
      cfg: ApiConfig,
      schema: Option[StructType] = None): DataFrame = {
    import spark.implicits._
    val ds: Dataset[String] = spark.createDataset(fetchApiRecords(fetch, cfg))
    schema match {
      case Some(s) => spark.read.schema(s).json(ds)
      case None    => spark.read.json(ds)
    }
  }
}
