package graft

import org.apache.spark.sql.SparkSession

/** One-off measurement main for the IVF recall/probe-cost frontier:
  * sweeps nProbe (and optionally nCells) on a given sf dir and prints
  * recall@10 plus wall time per probe configuration, so the default in
  * `Similarity.ivfTopK` is a measured knee rather than a guess. Run:
  *   sbt "runMain graft.RecallSweep /root/testdata/sf0.1"
  */
object RecallSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val bf = operators.Similarity.bruteForceTopK(spark, sfDir)
      .select("query_id", "neighbor_id").localCheckpoint(true)
    val nTotal = bf.count()
    for (nCells <- Seq(16); nProbe <- Seq(8, 10, 12, 13, 14, 15, 16)) {
      // warm once so codegen/centroid training is off the clock, then
      // time the steady-state probe leg best-of-2.
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        val hits = operators.Similarity
          .ivfTopK(spark, sfDir, nCells = nCells, nProbe = nProbe)
          .select("query_id", "neighbor_id")
          .join(bf, Seq("query_id", "neighbor_id")).count()
        ((System.nanoTime() - t0) / 1e9, hits)
      }
      once()
      val (tA, hits) = once()
      val (tB, _) = once()
      val t = math.min(tA, tB)
      println(f"SWEEP sf=$sfDir cells=$nCells probe=$nProbe " +
        f"hits=$hits/$nTotal recall=${hits.toDouble / nTotal}%.3f sec=$t%.3f")
    }
    spark.stop()
  }
}
