package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.ZOrder
import graft.operators.{Relational, SourceSinkQueries}

class ZOrderSpec extends AnyFunSuite with SparkTestBase {

  private def deinterleave(z: Long): (Int, Int) = {
    def collapse(v: Long): Int = {
      var x = v & 0x55555555L
      x = (x | (x >> 1)) & 0x33333333L
      x = (x | (x >> 2)) & 0x0F0F0F0FL
      x = (x | (x >> 4)) & 0x00FF00FFL
      x = (x | (x >> 8)) & 0x0000FFFFL
      x.toInt
    }
    (collapse(z), collapse(z >> 1))
  }

  test("morton kernel: axis placement, known values, exact roundtrip") {
    assert(ZOrder.morton(1, 0) == 1L)
    assert(ZOrder.morton(0, 1) == 2L)
    assert(ZOrder.morton(3, 3) == 15L)
    assert(ZOrder.morton(0xFFFF, 0xFFFF) == 0xFFFFFFFFL)
    val rnd = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val x = rnd.nextInt(0x10000)
      val y = rnd.nextInt(0x10000)
      assert(deinterleave(ZOrder.morton(x, y)) == ((x, y)))
    }
    // Out-of-range bits mask, never throw.
    assert(ZOrder.morton(0x12345, 0) == ZOrder.morton(0x2345, 0))
  }

  test("zorder_value expression matches the kernel in-plan") {
    import spark.implicits._
    val df = (0 until 256).map(i => (i % 16, i / 16)).toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      ZOrder.zorderCol(col("x"), col("y")).as("z")).collect()
    got.foreach { r =>
      assert(r.getLong(2) == ZOrder.morton(r.getInt(0), r.getInt(1)))
    }
  }

  test("z-sorted files bound BOTH dims; linear sort only its own") {
    // 32x32 grid in z order, cut into 16 contiguous runs (files): every
    // run's bounding box must span far less than the full grid in both
    // dimensions — the property that makes multi-dim pruning work.
    val pts = for (x <- 0 until 32; y <- 0 until 32) yield (x, y)
    val files = pts.sortBy { case (x, y) => ZOrder.morton(x, y) }
      .grouped(64).toSeq
    assert(files.length == 16)
    files.foreach { f =>
      val xs = f.map(_._1); val ys = f.map(_._2)
      assert(xs.max - xs.min <= 8, "x extent bounded")
      assert(ys.max - ys.min <= 8, "y extent bounded")
    }
  }

  test("file stats index: pruned read equals full filter, files skipped") {
    val row = SourceSinkQueries.sourceFileStatsIndex(spark, sfDir).collect()(0)
    assert(row.getLong(0) > 0, "window must be non-empty")
    assert(row.getBoolean(2), "pruned read must equal the full filter")
    assert(row.getBoolean(3), "stats must skip files on a date-sorted layout")
    assert(row.getBoolean(4), "stats index must cover every file")
  }

  test("sink_zorder_layout: conserved and pruning-positive at this SF") {
    val row = SourceSinkQueries.sinkZorderLayout(spark, sfDir).collect()(0)
    val want = Relational.table(spark, sfDir, "orders").count()
    assert(row.getLong(0) == want, "rows conserved")
    assert(row.getBoolean(2), "both layouts produced all files")
    assert(row.getBoolean(3), "zorder must prune the date slice")
    assert(row.getBoolean(4), "zorder must beat the custkey-linear layout")
  }
}
