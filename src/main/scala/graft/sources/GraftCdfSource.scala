package graft.sources

import java.nio.file.{Path, Paths}

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.operators.TxnLog

/** The CHANGE DATA FEED as a streaming source —
  * `spark.readStream.format("graft").option("readChangeFeed", "true")`:
  * offsets are log versions (same as the append stream), and each
  * micro-batch is the row-level change feed [[TxnLog.changes]] computes
  * over that version window — inserts, deletes (including merge-on-read
  * equality-delete commits, surfaced at their own version), and
  * update pre/post-images from copy-on-write rewrites. This is what an
  * incremental consumer of an UPDATE/DELETE-bearing table needs; the
  * plain stream ([[GraftMicroBatchStream]]) reads append diffs only and
  * refuses rewrite commits.
  *
  * Built on the V1 `Source` API deliberately: a CDF batch is a
  * DataFrame-level computation (per-commit joins classify rewrites),
  * not a file scan, and `getBatch` returning an arbitrary plan is
  * exactly the contract — the same API Delta's own streaming source
  * runs on. The DSv2 table simply drops MICRO_BATCH_READ when the
  * option is set, so Spark's resolution falls back here; checkpoint
  * resume works because offsets are durable log versions either way.
  *
  * Batch shape: the table's columns + `_change_type` +
  * `_commit_version`. The FIRST batch of a fresh checkpoint is the
  * current snapshot as `insert` rows stamped with its version (the
  * Delta CDF-stream convention), unless `startingVersion` skips
  * history and the feed begins at that commit's changes instead.
  * The rewrite classifier joins on `changeFeedKey` (defaults to the
  * table's declared statsKey — the same unique-key convention every
  * CoW merge here already relies on).
  *
  * Scale: per batch, work is O(files the window's commits touched) —
  * the [[TxnLog.changes]] bound — never a table scan after batch one.
  * A RENAME mid-stream changes the logical column names the feed
  * emits; the batch fails against the fixed source schema and the
  * stream must be restarted from a fresh checkpoint (documented
  * limitation, same as any schema change under a running stream). */
final class GraftCdfSource(
    sqlContext: SQLContext, root: Path, key: String,
    startingVersion: Option[Long]) extends Source
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.ReadLimit

  private val spark = sqlContext.sparkSession

  // The data schema is pinned at source creation from the tip
  // manifest — the stream's contract for its whole life.
  private val dataSchema: StructType =
    GraftTables.resolve(Map("path" -> root.toString)).schema

  override val schema: StructType = GraftCdfSource.feedSchema(dataSchema)

  private def version(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => sys.error(s"unexpected offset type $other")
  }

  override def getOffset: Option[Offset] =
    TxnLog.latest(root).map(LongOffset.apply)

  // Trigger.AvailableNow, the KafkaSource shape: pin the tip once at
  // stream start and drain up to it, so the run terminates even while
  // writers keep committing (without this Spark falls back to a
  // single-batch Trigger.Once execution with a warning).
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = TxnLog.latest(root)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset =
    availableNowTarget.orElse(TxnLog.latest(root))
      .map(LongOffset.apply).orNull

  override def reportLatestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset =
    TxnLog.latest(root).map(LongOffset.apply).orNull

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = version(end)
    val feed = start.map(version) match {
      case None =>
        startingVersion match {
          case Some(s) =>
            require(s >= 1L,
              s"startingVersion must be >= 1 (v0 is the create; " +
                s"the initial snapshot covers it), got $s")
            TxnLog.changes(spark, root, s - 1L, endV, key,
              emptyAs = Some(schema))
          case None =>
            // Fresh checkpoint: the current snapshot as inserts at
            // its own version — batch one is the only full read.
            GraftTables.read(spark, root, Some(endV))
              .withColumn("_change_type", lit("insert"))
              .withColumn("_commit_version", lit(endV))
        }
      case Some(s) =>
        TxnLog.changes(spark, root, s, endV, key, emptyAs = Some(schema))
    }
    // Pin the declared column order (changes() emits data columns in
    // file order, the snapshot read in schema order), then stamp the
    // plan streaming — the V1 contract getBatch frames must satisfy.
    org.apache.spark.sql.graft.GraftShims.asStreaming(sqlContext,
      feed.select(schema.fieldNames.map(col).toSeq: _*), schema)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftCdfSource[$root]"
}

object GraftCdfSource {

  /** table columns + the two CDF metadata columns (declared nullable:
    * the values never are, but the wrapper schema must not promise
    * the optimizer more than every batch plan's own output does). */
  def feedSchema(dataSchema: StructType): StructType =
    StructType(dataSchema.fields ++ Seq(
      StructField("_change_type", StringType),
      StructField("_commit_version", LongType)))

  def isCdf(options: Map[String, String]): Boolean =
    options.exists { case (k, v) =>
      k.equalsIgnoreCase("readChangeFeed") && v.equalsIgnoreCase("true")
    }

  /** Build the source from `readStream` parameters (case-insensitive
    * per the DSv2 option contract the rest of the connector honors). */
  def fromParameters(
      sqlContext: SQLContext, parameters: Map[String, String])
      : GraftCdfSource = {
    val opts = parameters.map { case (k, v) =>
      k.toLowerCase(java.util.Locale.ROOT) -> v
    }
    val root = Paths.get(opts.getOrElse("path",
      sys.error("graft CDF source requires a path")))
    val tip = TxnLog.tip(root)
    val key = opts.get("changefeedkey")
      .orElse(tip.statsKey.map { phys =>
        // statsKey is the PHYSICAL name; changes() classifies over
        // logical frames, so map it through the tip's column mapping.
        tip.columns.flatMap(_.find(_.physical == phys).map(_.name))
          .getOrElse(phys)
      })
      .getOrElse(sys.error(
        s"readChangeFeed on $root needs a unique row key to classify " +
          "rewrites: declare a statsKey on the table or pass " +
          ".option(\"changeFeedKey\", <column>)"))
    new GraftCdfSource(sqlContext, root, key,
      opts.get("startingversion").map(_.toLong))
  }
}
