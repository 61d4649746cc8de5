package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{CentroidAssign, VectorSumAgg}
import graft.operators.{Relational, Similarity}

class KMeansDistributedSpec extends AnyFunSuite with SparkTestBase {

  private def normRef(v: Seq[Float]): Array[Double] = {
    val d = v.map(_.toDouble).toArray
    val n = math.sqrt(d.map(x => x * x).sum)
    if (n == 0.0) d else d.map(_ / n)
  }

  private def sqDistRef(c: Array[Double], v: Array[Double]): Double = {
    val n = math.min(c.length, v.length)
    var d = 0.0
    var i = 0
    while (i < n) { val t = v(i) - c(i); d += t * t; i += 1 }
    d
  }

  test("assignStats matches the driver loop: cell, distance, normalized vec") {
    val e = Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).filter(col("vec_id") < 64)
    val cs = Similarity.trainCentroids(e, nCells = 8, seed = 7L)
    val got = e.select(col("vec_id"),
        CentroidAssign.assignStatsCol(cs, col("embedding")).as("s"))
      .select(col("vec_id"), col("s.cell"), col("s.dist"), col("s.vn"))
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getDouble(2),
        r.getSeq[Double](3).toArray))).toMap
    val raw = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(raw.nonEmpty)
    raw.foreach { case (id, v) =>
      val vn = normRef(v)
      val wantCell = Similarity.nearestCellsForTest(cs, v, 1)(0)
      val (cell, dist, gotVn) = got(id)
      assert(cell == wantCell, s"cell mismatch for vec $id")
      assert(dist == sqDistRef(cs(wantCell), vn), s"dist mismatch for vec $id")
      assert(gotVn.toSeq == vn.toSeq, s"vn mismatch for vec $id")
    }
  }

  test("VectorSumAgg: elementwise sum survives partial agg across partitions") {
    import spark.implicits._
    val rows = (1 to 100).map(i =>
      Array(i.toDouble, -i.toDouble, i * 0.5))
    val df = rows.toDF("v").repartition(7)
    val got = df.agg(VectorSumAgg.asColumn(col("v"), 3).as("s"))
      .collect()(0).getSeq[Double](0)
    val want = Seq(5050.0, -5050.0, 2525.0)
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-9, s"sum mismatch: $got vs $want")
    }
    // Shorter rows fold their prefix; longer rows their first dim.
    val ragged = Seq(Array(1.0), Array(1.0, 2.0, 3.0, 4.0)).toDF("v")
    val g2 = ragged.agg(VectorSumAgg.asColumn(col("v"), 2).as("s"))
      .collect()(0).getSeq[Double](0)
    assert(g2 == Seq(2.0, 2.0))
  }

  test("distributed Lloyd replays a sequential reference from the same init") {
    val nCells = 8
    val iters = 3
    val seed = 42L
    val e = Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).filter(col("vec_id") < 512)
    val dim = e.agg(max(size(col("embedding")))).collect()(0).getInt(0)
    val (cs, inertia) =
      Similarity.kmeansDistributed(e, nCells, iters, seed, dim)

    // Reference: the same seeded init (replayed via the same plan) and
    // a sequential Lloyd loop over the collected subset.
    var ref = e.orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id"))
      .limit(nCells).select(col("embedding")).collect()
      .map(r => normRef(r.getSeq[Float](0)))
    val mat = e.select(col("embedding")).collect()
      .map(r => normRef(r.getSeq[Float](0)))
    val refInertia = new Array[Double](iters)
    (0 until iters).foreach { it =>
      val assign = mat.map { v =>
        var best = 0
        var bestD = Double.MaxValue
        ref.indices.foreach { c =>
          val d = sqDistRef(ref(c), v)
          if (d < bestD) { bestD = d; best = c }
        }
        (best, bestD)
      }
      refInertia(it) = assign.map(_._2).sum
      val next = ref.map(_.clone())
      (0 until nCells).foreach { c =>
        val members = mat.zip(assign).collect { case (v, (a, _)) if a == c => v }
        if (members.nonEmpty)
          next(c) = (0 until dim).map(j =>
            members.map(_(j)).sum / members.length).toArray
      }
      ref = next
    }

    assert(inertia.length == iters)
    inertia.zip(refInertia).foreach { case (g, w) =>
      assert(math.abs(g - w) / w < 1e-9, s"inertia ${inertia.toSeq} vs ${refInertia.toSeq}")
    }
    cs.zip(ref).foreach { case (g, w) =>
      g.zip(w).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, "centroid component drift > 1e-9")
      }
    }
    // Lloyd's invariant on the real corpus run.
    inertia.toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a * (1 + 1e-9) + 1e-9, s"inertia not monotone: ${inertia.toSeq}")
      case _ =>
    }
  }

  test("pqAssignStats matches encodeResidual's argmin and the residual slices") {
    import graft.functions.PqOps
    val e = Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).filter(col("vec_id") < 48)
    val cs = Similarity.trainCentroids(e, nCells = 8, seed = 7L)
    val cbs = Similarity.trainPqCodebooks(e, cs, m = 8, ksub = 16, seed = 7L)
    val got = e.select(col("vec_id"),
        explode(PqOps.pqAssignStatsCol(cbs, cs, col("embedding"))).as("st"))
      .select(col("vec_id"), col("st.sub"), col("st.code"), col("st.sv"))
      .collect()
      .groupBy(_.getLong(0))
    val raw = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    raw.foreach { case (id, v) =>
      val vn = normRef(v)
      val cell = Similarity.nearestCellsForTest(cs, v, 1)(0)
      val r = PqOps.residual(cs(cell), vn)
      val wantCodes = PqOps.encodeResidual(cbs, r)
      val rows = got(id).sortBy(_.getInt(1))
      assert(rows.length == 8)
      rows.foreach { row =>
        val s = row.getInt(1)
        assert(row.getInt(2) == (wantCodes(s).toInt & 0xFF),
          s"code mismatch vec $id sub $s")
        val subDim = cbs(s)(0).length
        val wantSv = (0 until subDim).map(i =>
          if (s * subDim + i < r.length) r(s * subDim + i) else 0.0)
        assert(row.getSeq[Double](3) == wantSv, s"sv mismatch vec $id sub $s")
      }
    }
  }

  test("distributed PQ training replays a sequential reference from the same init") {
    import graft.functions.PqOps
    val m = 4
    val ksub = 8
    val iters = 3
    val seed = 42L
    val e = Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).filter(col("vec_id") < 256)
    val cs = Similarity.trainCentroids(e, nCells = 8, seed = seed)
    val dim = e.agg(max(size(col("embedding")))).collect()(0).getInt(0)
    val subDim = dim / m
    val (cbs, inertia) =
      Similarity.trainPqCodebooksDistributed(e, cs, m, ksub, iters, seed)

    // Sequential reference: same init (replayed via the same plan),
    // same residuals, per-subspace Lloyd.
    val initRows = e.orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id"))
      .limit(ksub).select(col("embedding")).collect()
      .map { r =>
        val vn = normRef(r.getSeq[Float](0))
        PqOps.residual(cs(Similarity.nearestCellsForTest(
          cs, r.getSeq[Float](0), 1)(0)), vn)
      }
    val residuals = e.select(col("embedding")).collect().map { r =>
      val v = r.getSeq[Float](0)
      PqOps.residual(cs(Similarity.nearestCellsForTest(cs, v, 1)(0)),
        normRef(v))
    }
    var ref: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
      initRows.map(v =>
        java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
    }
    val refInertia = new Array[Double](iters)
    (0 until iters).foreach { it =>
      var total = 0.0
      val next = ref.map(_.map(_.clone()))
      (0 until m).foreach { s =>
        val slices = residuals.map(r =>
          java.util.Arrays.copyOfRange(r, s * subDim, (s + 1) * subDim))
        val assign = slices.map { sv =>
          var best = 0
          var bestD = Double.MaxValue
          ref(s).indices.foreach { j =>
            val d = sqDistRef(ref(s)(j), sv)
            if (d < bestD) { bestD = d; best = j }
          }
          (best, bestD)
        }
        total += assign.map(_._2).sum
        (0 until ksub).foreach { j =>
          val members = slices.zip(assign).collect {
            case (sv, (a, _)) if a == j => sv
          }
          if (members.nonEmpty)
            next(s)(j) = (0 until subDim).map(i =>
              members.map(_(i)).sum / members.length).toArray
        }
      }
      refInertia(it) = total
      ref = next
    }

    inertia.zip(refInertia).foreach { case (g, w) =>
      assert(math.abs(g - w) / w < 1e-9,
        s"inertia ${inertia.toSeq} vs ${refInertia.toSeq}")
    }
    cbs.zip(ref).foreach { case (gs, ws) =>
      gs.zip(ws).foreach { case (g, w) =>
        g.zip(w).foreach { case (a, b) =>
          assert(math.abs(a - b) < 1e-9, "codeword component drift > 1e-9")
        }
      }
    }
  }

  test("pq_train_distributed query: all witnesses hold") {
    val row = Similarity.pqTrainDistributedQuery(spark, sfDir).collect()(0)
    assert(row.getLong(0) > 0, "n_vectors")
    assert(row.getInt(1) == 8, "m")
    assert(row.getBoolean(2), "assigned_eq_n")
    assert(row.getBoolean(3), "inertia_monotone")
    assert(row.getBoolean(4), "inertia_improved")
  }

  test("ivf_train_distributed query: all witnesses hold") {
    val row = Similarity.ivfTrainDistributedQuery(spark, sfDir).collect()(0)
    assert(row.getLong(0) > 0, "n_vectors")
    assert(row.getInt(1) > 0, "dim")
    assert(row.getBoolean(2), "assigned_eq_n")
    assert(row.getBoolean(3), "cells_nonempty")
    assert(row.getBoolean(4), "inertia_monotone")
    assert(row.getBoolean(5), "inertia_improved")
  }
}
