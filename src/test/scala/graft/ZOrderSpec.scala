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
    assert(row.getBoolean(2), "both layouts must materialize")
    assert(row.getBoolean(3), "zorder must prune the date slice")
    assert(row.getBoolean(4), "zorder must beat the custkey-linear layout")
  }

  test("N-ary morton: bit interleave round-trips for N in {2,3,4}") {
    val rnd = new scala.util.Random(13)
    for (n <- 2 to 4) {
      val bits = ZOrder.bitsPerDim(n)
      assert(bits * n <= 63, s"key must stay non-negative at N=$n")
      (0 until 300).foreach { _ =>
        val vals = Array.fill(n)(rnd.nextInt(1 << bits))
        val z = ZOrder.mortonN(vals)
        assert(z >= 0, s"N=$n key went negative")
        (0 until n).foreach { i =>
          assert(ZOrder.collapseN(z, n, i) == vals(i),
            s"round-trip failed at N=$n dim $i")
        }
      }
      // Max values round-trip too (the sign-bit edge).
      val maxVals = Array.fill(n)((1 << bits) - 1)
      val zMax = ZOrder.mortonN(maxVals)
      assert(zMax >= 0)
      (0 until n).foreach(i =>
        assert(ZOrder.collapseN(zMax, n, i) == maxVals(i)))
    }
    // The static 3-/4-ary entry points equal the generic kernel.
    assert(ZOrder.morton3(5, 9, 1023) == ZOrder.mortonN(Array(5, 9, 1023)))
    assert(ZOrder.morton4(5, 9, 1023, 77) ==
      ZOrder.mortonN(Array(5, 9, 1023, 77)))
    // 2-D magic-mask path and generic loop agree.
    assert(ZOrder.morton(123, 456) == ZOrder.mortonN(Array(123, 456)))
  }

  test("zorder_value3/4 expressions match the kernels in-plan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (0 until 128).map(i => (i % 8, (i / 8) % 4, i / 32, i % 5))
      .toDF("a", "b", "c", "d")
    val got = df.select(col("a"), col("b"), col("c"), col("d"),
      ZOrder.zorderColN(Seq(col("a"), col("b"), col("c"))).as("z3"),
      ZOrder.zorderColN(Seq(col("a"), col("b"), col("c"), col("d"))).as("z4"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(4) == ZOrder.morton3(r.getInt(0), r.getInt(1), r.getInt(2)))
      assert(r.getLong(5) == ZOrder.morton4(
        r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    }
  }

  test("3-D z-sorted files bound all three dims; 2-D leaves the third full-range") {
    // 16x16x16 grid cut into 64 contiguous z-runs: 3-ary runs bound
    // every axis; the same grid sorted by the 2-ary key leaves axis 3
    // spanning the full domain in every run — the physical reason the
    // price predicate can only prune the 3-D layout.
    val pts = for (x <- 0 until 16; y <- 0 until 16; z <- 0 until 16)
      yield (x, y, z)
    val runs3 = pts.sortBy { case (x, y, z) => ZOrder.morton3(x, y, z) }
      .grouped(64).toSeq
    runs3.foreach { f =>
      assert(f.map(_._1).max - f.map(_._1).min <= 8)
      assert(f.map(_._2).max - f.map(_._2).min <= 8)
      assert(f.map(_._3).max - f.map(_._3).min <= 8)
    }
    val runs2 = pts.sortBy { case (x, y, _) => ZOrder.morton(x, y) }
      .grouped(64).toSeq
    assert(runs2.forall(f => f.map(_._3).max - f.map(_._3).min == 15),
      "2-D runs must span the full third axis")
  }

  test("BucketIndex equals the indicator-sum when-chain it replaced " +
      "(ties, NULLs, NaN, unsorted/duplicate cuts)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val cuts = (Array.fill(63)(rnd.nextDouble() * 100) ++
      Array(25.0, 25.0, 50.0)) // duplicates + a tie target
    val vals: Seq[java.lang.Double] =
      Seq.fill(500)(java.lang.Double.valueOf(rnd.nextDouble() * 120)) ++
        Seq(java.lang.Double.valueOf(25.0), // exact tie with a cut
          java.lang.Double.valueOf(0.0),
          java.lang.Double.valueOf(Double.NaN),
          null)
    val df = vals.toDF("v")
    val chain = cuts.distinct.foldLeft(lit(0)) { (acc, cut) =>
      acc + when(col("v") > cut, 1).otherwise(0)
    }
    val got = df.select(
      graft.functions.ZOrder.bucketIndexCol(col("v"), cuts).as("b"),
      chain.as("c")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"bucket_index ${r.getInt(0)} != chain ${r.getInt(1)}"))
    // And the scalar helper agrees on a direct probe.
    val sorted = cuts.distinct.sorted
    assert(graft.functions.ZOrder.bucketOf(25.0, sorted) ==
      sorted.count(25.0 > _))
  }

  test("sink_zorder_3d: conserved, prunes, and beats the 2-D layout") {
    val row = SourceSinkQueries.sinkZorder3d(spark, sfDir).collect()(0)
    val want = Relational.table(spark, sfDir, "orders").count()
    assert(row.getLong(0) == want, "rows conserved")
    assert(row.getBoolean(2), "both layouts must materialize")
    assert(row.getBoolean(3), "3-D zorder must prune the 2-predicate slice")
    assert(row.getBoolean(4), "3-D must beat 2-D on the price-carrying slice")
  }
}
