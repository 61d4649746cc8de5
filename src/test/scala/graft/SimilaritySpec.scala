package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import graft.operators.{Dedup, Relational, Similarity}

class SimilaritySpec extends AnyFunSuite with SparkTestBase {

  test("quantized IVF index: recall holds, bytes shrink, scan prunes") {
    val row = Similarity.ivfQuantizedQuery(spark, sfDir).collect()(0)
    assert(row.getLong(0) == 2L) // nQueries=2
    assert(row.getBoolean(1), "n_results must equal sum of least(k, collisions)")
    assert(row.getBoolean(2), "quantized top-k must overlap float top-k >= 0.8")
    assert(row.getBoolean(3), "int8 index must be <= 0.7x float index bytes")
    assert(row.getBoolean(4), "probe must prune to the probed cells")
  }

  test("int8 quantization: exact codes, code range, round-trip cosine") {
    import org.apache.spark.sql.functions.col
    val got = Similarity.quantizeInt8Query(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(got.nonEmpty)
    assert(got.forall(_._3), "every vector must round-trip at cos >= 0.98")
    // Recompute sequentially with the same IEEE arithmetic.
    val raw = Relational.table(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 100)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .toMap
    got.foreach { case (id, codesStr, _) =>
      val ed = raw(id)
      val ma = ed.map(math.abs).max
      val want = ed.map { x =>
        if (ma == 0) 0L
        else BigDecimal(x * 127.0 / ma)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      }
      val codes = codesStr.split(",").map(_.toLong).toSeq
      assert(codes == want, s"codes mismatch for vec $id")
      assert(codes.forall(c => c >= -127 && c <= 127))
    }
  }
  import spark.implicits._

  /** The round-3 bar: no similarity plan may be fed from driver-side
    * materialized data — every source must be the parquet relation.
    * A collect()+parallelize implementation shows up as a LogicalRDD
    * leaf; assert there is none. */
  private def assertNoDriverMaterialization(df: DataFrame): Unit = {
    val rddLeaves = df.queryExecution.optimizedPlan.collect {
      case r: LogicalRDD => r
    }
    assert(rddLeaves.isEmpty,
      s"plan contains driver-materialized RDD leaves: $rddLeaves")
  }

  test("brute-force top-k: correct k, no self, rank 1 maximizes cosine") {
    val df = Similarity.bruteForceTopK(spark, sfDir, nQueries = 3, k = 5)
    assertNoDriverMaterialization(df)
    val got = df.as[(Long, Int, Long)].collect()
    val byQuery = got.groupBy(_._1)
    assert(byQuery.keySet == Set(0L, 1L, 2L))
    assert(byQuery.values.forall(_.length == 5))
    assert(got.forall { case (q, _, n) => q != n })
    // recompute cosine on the driver for query 0 (test-only collect)
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    def cos(i: Int, j: Int): Double = {
      val (a, b) = (vecs(i)._2.map(_.toDouble), vecs(j)._2.map(_.toDouble))
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val q0 = vecs.indexWhere(_._1 == 0L)
    val best = vecs.indices.filter(_ != q0).maxBy(cos(q0, _))
    val rank1 = got.filter(t => t._1 == 0L && t._2 == 1).head._3
    assert(vecs(best)._1 == rank1)
  }

  test("block pairs: every unordered pair exactly once") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding").filter($"vec_id" < 50)
    val pairs = Similarity.blockPairs(e, blocks = 7)
      .select($"id_l", $"id_r").as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
    assert(pairs.length == 50 * 49 / 2)
    assert(pairs.toSet.size == pairs.length)
  }

  test("lsh ann reaches usable recall vs brute force, no driver collect") {
    val lshDf = Similarity.lshTopK(spark, sfDir, nQueries = 5, k = 10)
    assertNoDriverMaterialization(lshDf)
    val bf = Similarity.bruteForceTopK(spark, sfDir, nQueries = 5, k = 10)
      .as[(Long, Int, Long)].collect().map(t => (t._1, t._3)).toSet
    val lsh = lshDf.as[(Long, Int, Long)].collect().map(t => (t._1, t._3)).toSet
    val recall = (bf & lsh).size.toDouble / bf.size
    info(s"lsh recall@10 = $recall")
    assert(recall >= 0.70, s"recall=$recall")
  }

  test("lsh is deterministic across runs") {
    val a = Similarity.lshTopK(spark, sfDir, nQueries = 2).collect().toSeq
    val b = Similarity.lshTopK(spark, sfDir, nQueries = 2).collect().toSeq
    assert(a == b)
  }

  test("in-plan cell assignment is codegen'd and matches the driver loop") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    val e = Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cs = Similarity.trainCentroids(e, nCells = 16, seed = 42L)
    val nProbe = 4
    val assigned = e.select(col("vec_id"),
      Similarity.cellCol(cs, col("embedding")).as("cell"),
      Similarity.probeCellsCol(cs, col("embedding"), nProbe).as("probes"))
    // (a) The index-build scan carries NO ScalaUDF (round-7 lesson) and
    // NO higher-order array function (round-8 lesson: transform/
    // zip_with/aggregate evaluate interpreted — boxed per-element
    // lambda dispatch — and cost 10–23× on this corpus-sized scan).
    // The assignment must be the native CentroidAssign expressions.
    import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
    val slow = assigned.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case u: ScalaUDF => u
        case h: HigherOrderFunction => h
      })
    }.flatten
    assert(slow.isEmpty,
      s"interpreted evaluation in the cell-assignment plan: $slow")
    val planStr = assigned.queryExecution.optimizedPlan.toString
    assert(planStr.contains("nearest_centroid_cell")
      && planStr.contains("probe_cells"), planStr.take(1000))
    // (b) Bit-identical to the driver-side loop on every fixture
    // vector — argmin, tie-break, and nProbe ordering all agree, so
    // the static partition filter from probedCellsOf can never select
    // different cells than the in-plan assignment writes.
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assigned.collect().foreach { r =>
      val v = vecs(r.getLong(0))
      val want = Similarity.nearestCellsForTest(cs, v, nProbe)
      assert(r.getInt(1) == want.head,
        s"cell mismatch for vec ${r.getLong(0)}")
      assert(r.getSeq[Int](2) == want.toSeq,
        s"probe list mismatch for vec ${r.getLong(0)}")
    }
  }

  test("in-plan lsh keys are codegen'd and match the driver loop") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    val e = Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val dim = Similarity.embeddingDim(e)
    val hp = Similarity.hyperplanes(tables = 6, planes = 4, dim, seed = 7L)
    val keyed = e.select(col("vec_id"),
      Similarity.hyperplaneKeysCol(hp, col("embedding")).as("keys"))
    import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
    val slow = keyed.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case u: ScalaUDF => u
        case h: HigherOrderFunction => h
      })
    }.flatten
    assert(slow.isEmpty, s"interpreted evaluation in the lsh key plan: $slow")
    assert(keyed.queryExecution.optimizedPlan.toString
      .contains("hyperplane_keys"))
    val vecs = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    keyed.collect().foreach { r =>
      val want = Similarity.hyperplaneKeysForTest(hp, vecs(r.getLong(0)))
      assert(r.getSeq[Int](1) == want.toSeq,
        s"key mismatch for vec ${r.getLong(0)}")
    }
  }

  test("length-mismatched vectors score over the shared prefix, like the driver loop") {
    // Round-8 advice: the HOF form zip_with-null-padded a short vector,
    // nulling the dot product and collapsing every key to 0 while the
    // driver loop scored min(dim, len). The native expressions truncate
    // to the shared prefix on BOTH dot and distance, so parity holds
    // for non-uniform corpora too.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val hp = Similarity.hyperplanes(tables = 3, planes = 4, dim = 8, seed = 11L)
    val cs = Array(Array.fill(8)(0.5), Array.fill(8)(-0.5))
    val vecs: Seq[(Long, Seq[Float])] = Seq(
      1L -> Seq(1f, -2f, 3f),              // shorter than dim
      2L -> Seq.tabulate(12)(i => i - 5f), // longer than dim
      3L -> Seq.fill(8)(0.25f))            // exact dim
    val df = vecs.toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
        Similarity.hyperplaneKeysCol(hp, col("embedding")).as("keys"),
        Similarity.cellCol(cs, col("embedding")).as("cell"))
      .collect().map(r => r.getLong(0) -> (r.getSeq[Int](1), r.getInt(2))).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id)._1 == Similarity.hyperplaneKeysForTest(hp, v).toSeq,
        s"keys mismatch for vec $id")
      assert(got(id)._2 == Similarity.nearestCellsForTest(cs, v, 1).head,
        s"cell mismatch for vec $id")
      assert(got(id)._1.exists(_ != 0) || v.forall(_ == 0f),
        s"vec $id keys all collapsed to 0")
    }
  }

  test("NaN components: cell assignment matches the driver sort, never crashes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cs = Array(Array(0.5, 0.5), Array(-0.5, -0.5), Array(0.5, -0.5))
    val vecs: Seq[(Long, Seq[Float])] = Seq(
      1L -> Seq(Float.NaN, 1f),   // NaN poisons every distance
      2L -> Seq(1f, Float.NaN),
      3L -> Seq(1f, 1f))          // control: finite
    val df = vecs.toDF("vec_id", "embedding")
    val got = df.select(col("vec_id"),
        Similarity.cellCol(cs, col("embedding")).as("cell"),
        Similarity.probeCellsCol(cs, col("embedding"), 2).as("probes"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2))).toMap
    vecs.foreach { case (id, v) =>
      val want = Similarity.nearestCellsForTest(cs, v, 2)
      assert(got(id)._1 == want.head, s"vec $id cell")
      assert(got(id)._2 == want.toSeq, s"vec $id probes")
    }
    // All-NaN distances: deterministic index order, not a crash.
    assert(got(1L)._2 == Seq(0, 1))
  }

  test("pq residual-encode matches a naive driver loop; adc sums the right table cells") {
    import org.apache.spark.sql.functions._
    import graft.functions.PqOps
    val e = Relational.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).limit(64)
    val cs = Similarity.trainCentroids(e, nCells = 16, seed = 42L)
    val cbs = Similarity.trainPqCodebooks(e, cs, m = 8, ksub = 16, seed = 42L)
    def naiveNormalize(v: Seq[Float]): Array[Double] = {
      val d = v.map(_.toDouble).toArray
      val n = math.sqrt(d.map(x => x * x).sum)
      if (n == 0.0) d else d.map(_ / n)
    }
    // Fully independent residual reference: naive normalize, naive
    // nearest-centroid argmin, naive subtraction — none of the engine's
    // kernels — so a drift in ANY stage of the in-plan encoder shows.
    def naiveResidual(v: Seq[Float]): Array[Double] = {
      val vn = naiveNormalize(v)
      val cell = cs.indices.minBy { c =>
        cs(c).indices.take(vn.length)
          .map(i => (vn(i) - cs(c)(i)) * (vn(i) - cs(c)(i))).sum
      }
      vn.indices.map(i =>
        vn(i) - (if (i < cs(cell).length) cs(cell)(i) else 0.0)).toArray
    }
    def naiveEncode(v: Seq[Float]): Seq[Byte] = {
      val r = naiveResidual(v)
      cbs.indices.map { s =>
        val sub = cbs(s)(0).length
        val off = s * sub
        cbs(s).zipWithIndex.map { case (cw, j) =>
          val d = cw.indices.map { i =>
            val x = if (off + i < r.length) r(off + i) else 0.0
            (x - cw(i)) * (x - cw(i))
          }.sum
          (d, j)
        }.min._2.toByte
      }
    }
    val rows = e.select(col("vec_id"),
        PqOps.pqEncodeCol(cbs, cs, col("embedding")).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    vecs.foreach { case (id, v) =>
      assert(rows(id) == naiveEncode(v), s"codes mismatch for vec $id")
    }
    // ADC: the expression must sum exactly the LUT cells the codes
    // name; the LUT for a candidate's own cell is built from the query
    // residual to that same cell.
    val (id0, v0) = vecs.head
    val lut = PqOps.lutFor(cbs, naiveResidual(v0))
    val ksub = cbs(0).length
    val expected = rows(id0).zipWithIndex
      .map { case (c, s) => lut(s * ksub + (c.toInt & 0xFF)) }.sum
    import spark.implicits._
    val got = Seq((lut.toSeq, rows(id0)))
      .toDF("lut", "codes")
      .select(PqOps.pqAdcCol(ksub, col("lut"), col("codes"))).head().getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("pq witness query holds at the test scale factor") {
    val row = Similarity.pqQuery(spark, sfDir).head()
    assert(row.getLong(0) == 2L) // nQueries=2
    assert(row.getBoolean(1), "n_results must equal sum of least(k, candidates)")
    assert(row.getBoolean(2), "pq recall below bound")
    assert(row.getBoolean(3), "pq index not smaller than int8 index")
    assert(row.getBoolean(4), "pq probe scan not pruned")
  }

  test("quantized LSH index: recall holds, bytes shrink, scan prunes") {
    val row = Similarity.lshQuantizedQuery(spark, sfDir).collect()(0)
    assert(row.getLong(0) == 2L) // nQueries=2
    assert(row.getBoolean(1), "n_results must equal sum of least(k, collisions)")
    assert(row.getBoolean(2), "quantized top-k must overlap float top-k >= 0.8")
    assert(row.getBoolean(3), "int8 index must be <= 0.7x float index bytes")
    assert(row.getBoolean(4), "probe must prune to the probed buckets")
  }

  test("ivf ann reaches usable recall and is deterministic") {
    val ivfDf = Similarity.ivfTopK(spark, sfDir, nQueries = 5, k = 10)
    assertNoDriverMaterialization(ivfDf)
    val bf = Similarity.bruteForceTopK(spark, sfDir, nQueries = 5, k = 10)
      .as[(Long, Int, Long)].collect().map(t => (t._1, t._3)).toSet
    val ivf = ivfDf.as[(Long, Int, Long)].collect().map(t => (t._1, t._3)).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    info(s"ivf recall@10 = $recall")
    // nProbe=14 default (r11 sweep knee) — measured 1.00/1.00/0.98 at
    // sf0.001/0.01/0.1.
    assert(recall >= 0.95, s"recall=$recall")
    val again = Similarity.ivfTopK(spark, sfDir, nQueries = 5, k = 10)
      .as[(Long, Int, Long)].collect().map(t => (t._1, t._3)).toSet
    assert(ivf == again)
  }

  test("ann recall queries emit the driver-checkable row") {
    val lsh = Similarity.annRecallQuery(spark, sfDir, "lsh", bound = 0.70)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(lsh.length == 1)
    val (nq, hits, total, ok) = lsh(0)
    assert(nq == 5L && total == 50L && ok && hits >= 35L && hits <= 50L)
    val ivf = Similarity.annRecallQuery(spark, sfDir, "ivf", bound = 0.95)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(ivf.length == 1)
    val (nq2, hits2, total2, ok2) = ivf(0)
    assert(nq2 == 5L && total2 == 50L && ok2 &&
      hits2 >= 48L && hits2 <= 50L)
  }

  test("ivf incremental append: parity, untouched files, pruned scan") {
    val r = Similarity.ivfIncrementalQuery(spark, sfDir).head()
    assert(r.getAs[Long]("n_results") > 0)
    assert(r.getAs[Boolean]("matches_full_index"),
      "incremental index diverged from the single-plan rebuild")
    assert(r.getAs[Boolean]("corpus_files_untouched"),
      "append rewrote pre-existing corpus index files")
    assert(r.getAs[Boolean]("scan_pruned"),
      "probe scan read more than the probed cell directories")
  }

  test("ivf partitioned layout: probing prunes parquet partitions") {
    val idx = graft.util.Scratch.dir("ivf_index").toString
    val df = Similarity.ivfPartitionedTopK(spark, sfDir, idx,
      nQueries = 2, k = 5, nCells = 16, nProbe = 4)
    val rows = df.collect()
    assert(rows.length == 10)
    // the cell equi-join against 2 queries × 4 probes touches ≤ 8 of
    // the 16 cell directories; the layout physically exists
    val cellDirs = new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length > 1, "corpus should split across cell dirs")
    // and the SCAN physically selected only the probed directories:
    // the static cell predicate prunes partitions before listing files
    val read = Similarity.cellsRead(df, idx)
    assert(read <= 8 && read < cellDirs.length,
      s"scan read $read of ${cellDirs.length} cell dirs — not pruned")
    // equivalence with the in-plan ivf path
    val plain = Similarity.ivfTopK(spark, sfDir,
      nQueries = 2, k = 5, nCells = 16, nProbe = 4).collect()
    assert(rows.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }

  test("block all-pairs is an equi-join, never a nested-loop product") {
    val df = Dedup.embeddingCosinePairs(spark, sfDir)
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2000))
  }

  test("native cosine_sim expression: known values via SQL") {
    graft.functions.CosineSimilarity.register(spark)
    val got = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
                           array(CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE)))""")
      .head().getDouble(0)
    assert(math.abs(got - 1.0 / math.sqrt(2.0)) < 1e-12)
    val nullOut = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(CAST(1.0 AS DOUBLE)))")
      .head()
    assert(nullOut.isNullAt(0))
  }

  test("native cosine expression query equals the block-join dedup") {
    val exprDf = graft.functions.CosineSimilarity.pairsQuery(spark, sfDir)
    val scanDf = Dedup.embeddingCosinePairs(spark, sfDir)
    assertNoDriverMaterialization(exprDf)
    assertNoDriverMaterialization(scanDf)
    val viaExpr = exprDf.as[(Long, Long)].collect().toSet
    val viaScan = scanDf.as[(Long, Long)].collect().toSet
    assert(viaExpr == viaScan)
  }

  test("semantic dedup equals the sequential drop-if-earlier scan per cell") {
    val df = Similarity.semanticDedup(spark, sfDir, threshold = 0.4)
    assertNoDriverMaterialization(df)
    val got = df.as[(Int, Long, Long, Long)].collect()
    // Reference: per cell, walk ids ascending, drop a vector iff ANY
    // earlier vector (kept or not) of the cell is a near-neighbor —
    // the drop-if-any-earlier-neighbor rule as specified (more
    // aggressive than greedy keep-first), computable naively.
    val vecs = graft.operators.Relational
      .table(spark, sfDir, "embeddings")
      .select("label", "vec_id", "embedding")
      .as[(Int, Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vecs.groupBy(_._1).map { case (label, vs) =>
      val sorted = vs.sortBy(_._2)
      val dropped = sorted.count { case (_, id, e) =>
        sorted.exists { case (_, id2, e2) =>
          id2 < id && cos(e2, e) >= 0.4 }
      }
      (label, vs.length.toLong, (vs.length - dropped).toLong,
        dropped.toLong)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == expected)
    assert(got.map(_._4).sum > 0, "fixture must exercise drops")
  }

  test("unigram logprob: OOV floor, in-vocab docs score higher") {
    val rows = graft.operators.TextOps.unigramLogprob(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    val total = graft.operators.Relational
      .table(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")))
      .count()
    val floorQ = math.floor(math.log(1.0 / total) * 1000).toLong
    rows.foreach { case (_, nTok, nOov, qSum) =>
      assert(nOov <= nTok)
      // Every token's quantized logprob is >= the OOV floor, so the
      // sum is bounded by the all-OOV extreme on one side and the
      // impossible all-probability-1 extreme (0) on the other.
      assert(qSum >= floorQ * nTok && qSum < 0)
    }
    // The corpus shares a vocabulary, so OOV should be the exception:
    // the aggregate in-vocab rate must clear 50% by a wide margin.
    val inVocab =
      1.0 - rows.map(_._3).sum.toDouble / rows.map(_._2).sum
    assert(inVocab > 0.5, s"in-vocab rate $inVocab")
  }
}
