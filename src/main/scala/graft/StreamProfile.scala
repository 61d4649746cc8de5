package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** r21 measurement tool (guide §1): attribute the streaming class's
  * per-query fixed cost. Runs the same 2-row AvailableNow stateful-agg
  * machinery as [[graft.operators.SourceSinkQueries.microBatchStartupProbe]]
  * with wall-clock splits around each lifecycle phase and the per-batch
  * `durationMs` breakdown from StreamingQueryProgress, several times in
  * one session, so warm/cold costs separate. Prints one line per phase. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def ms(t0: Long): Long = (System.nanoTime() - t0) / 1000000L

    def once(tag: String, parts: Option[Int] = None): Unit = {
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      parts.foreach(n =>
        spark.conf.set("spark.sql.shuffle.partitions", n.toString))
      try onceInner(tag)
      finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }

    def onceInner(tag: String): Unit = {
      val base = graft.util.Scratch.dir("stream_profile")
      val srcDir = base.resolve("in")
      var t = System.nanoTime()
      Seq(("a", 1.0), ("b", 2.0)).toDF("event_type", "value")
        .coalesce(1).write.parquet(srcDir.toString)
      println(s"[$tag] fixture_write_ms=${ms(t)}")
      t = System.nanoTime()
      val agg = spark.readStream
        .schema(spark.read.parquet(srcDir.toString).schema)
        .parquet(srcDir.toString)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"))
      println(s"[$tag] plan_build_ms=${ms(t)}")
      t = System.nanoTime()
      val table = "sp_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory").queryName(table)
        .option("checkpointLocation", base.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      println(s"[$tag] start_ms=${ms(t)}")
      t = System.nanoTime()
      q.awaitTermination()
      println(s"[$tag] await_ms=${ms(t)}")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"[$tag] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=$d stateOps=${p.stateOperators.length}")
      }
      t = System.nanoTime()
      try spark.table(table).localCheckpoint(true)
      finally spark.catalog.dropTempView(table)
      println(s"[$tag] localCheckpoint_ms=${ms(t)}")
    }

    once("run1-cold")
    once("run2-warm")
    once("run3-warm")
    once("run4-p1", Some(1))
    once("run5-p1", Some(1))
    once("run6-p4", Some(4))
    once("run7-p4", Some(4))
    once("run8-p32", Some(32))
    once("run9-p8", Some(8))
    once("run10-p8", Some(8))
    graft.streaming.Streaming.unloadStateStores()
    spark.stop()
  }
}
