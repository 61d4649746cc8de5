package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with the normalized corpus
  * broadcast to every task (exact; linear scan per query). Scale path:
  * random-hyperplane LSH — queries only compare against same-bucket
  * vectors, trading recall for a ~B·2⁻ᵖ fraction of the comparisons.
  */
object Similarity {

  private[graft] def normalized(
      spark: SparkSession, dir: String): (Array[Long], Array[Array[Double]]) = {
    import spark.implicits._
    val vecs = Relational.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val ids = vecs.map(_._1)
    val mat = vecs.map { case (_, v) =>
      val d = v.map(_.toDouble)
      val n = math.sqrt(d.map(x => x * x).sum)
      d.map(_ / n)
    }
    (ids, mat)
  }

  /** similarity_topk_cosine — exact brute-force top-k neighbors for the
    * query vectors; deterministic tie-break (sim desc, id asc). */
  def bruteForceTopK(
      spark: SparkSession, dir: String,
      queryPred: Long => Boolean = _ < 5, k: Int = 10): DataFrame = {
    import spark.implicits._
    val (ids, mat) = normalized(spark, dir)
    val bIds = spark.sparkContext.broadcast(ids)
    val bMat = spark.sparkContext.broadcast(mat)
    val queryIdx = ids.indices.filter(i => queryPred(ids(i)))
    spark.sparkContext.parallelize(queryIdx, math.min(32, queryIdx.size max 1))
      .flatMap { qi =>
        val m = bMat.value; val id = bIds.value
        val q = m(qi)
        val sims = m.indices.collect { case j if j != qi =>
          var s = 0.0; var t = 0; val vj = m(j)
          while (t < q.length) { s += q(t) * vj(t); t += 1 }
          (s, id(j))
        }
        sims.sortBy { case (s, nid) => (-s, nid) }.take(k).zipWithIndex
          .map { case ((_, nid), r) => (id(qi), r + 1, nid) }
      }
      .toDF("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** Deterministic Lloyd k-means over the normalized corpus (seeded
    * init, fixed iterations, index tie-breaks). Returns (centroids,
    * assignment). Driver-side: the quantizer is tiny; at full scale the
    * same loop runs on a sample and only assignment distributes. */
  private[graft] def kmeans(
      mat: Array[Array[Double]], nCells: Int, iters: Int,
      seed: Long): (Array[Array[Double]], Array[Int]) = {
    val n = mat.length
    val dim = if (n == 0) 0 else mat(0).length
    val rnd = new scala.util.Random(seed)
    val init = rnd.shuffle((0 until n).toList).take(nCells)
    var centroids = init.map(i => mat(i).clone()).toArray
    val assign = new Array[Int](n)
    def nearest(v: Array[Double], cs: Array[Array[Double]]): Int = {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var d = 0.0
        var i = 0
        while (i < dim) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    (0 until iters).foreach { _ =>
      var i = 0
      while (i < n) { assign(i) = nearest(mat(i), centroids); i += 1 }
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Int](centroids.length)
      i = 0
      while (i < n) {
        val a = assign(i); counts(a) += 1
        var j = 0
        while (j < dim) { sums(a)(j) += mat(i)(j); j += 1 }
        i += 1
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    var i = 0
    while (i < n) { assign(i) = nearest(mat(i), centroids); i += 1 }
    (centroids, assign)
  }

  /** similarity_ann_ivf — inverted-file ANN: k-means coarse quantizer,
    * queries scan only the `nProbe` nearest cells, exact cosine re-ranks
    * the candidates. The IVF list is the structure that scales: at
    * 100 TB the assignment is a partition column and probing is
    * partition pruning. Deterministic (fixed seed/iterations). */
  def ivfTopK(
      spark: SparkSession, dir: String,
      queryPred: Long => Boolean = _ < 5, k: Int = 10,
      nCells: Int = 16, nProbe: Int = 8, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val (ids, mat) = normalized(spark, dir)
    val (centroids, assign) = kmeans(mat, nCells, iters = 10, seed = seed)
    val bIds = spark.sparkContext.broadcast(ids)
    val bMat = spark.sparkContext.broadcast(mat)
    val bAssign = spark.sparkContext.broadcast(assign)
    val bCentroids = spark.sparkContext.broadcast(centroids)
    val queryIdx = ids.indices.filter(i => queryPred(ids(i)))
    spark.sparkContext.parallelize(queryIdx, math.min(32, queryIdx.size max 1))
      .flatMap { qi =>
        val m = bMat.value; val id = bIds.value
        val asg = bAssign.value; val cs = bCentroids.value
        val q = m(qi)
        val cellDist = cs.indices.map { c =>
          var d = 0.0
          var i = 0
          while (i < q.length) { val t = q(i) - cs(c)(i); d += t * t; i += 1 }
          (d, c)
        }.sorted.take(nProbe).map(_._2).toSet
        val cands = m.indices.filter(j => j != qi && cellDist(asg(j)))
        val sims = cands.map { j =>
          var s = 0.0
          var t = 0
          val vj = m(j)
          while (t < q.length) { s += q(t) * vj(t); t += 1 }
          (s, id(j))
        }
        sims.sortBy { case (s, nid) => (-s, nid) }.take(k).zipWithIndex
          .map { case ((_, nid), r) => (id(qi), r + 1, nid) }
      }
      .toDF("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** similarity_ann_lsh — random-hyperplane LSH: `tables` independent
    * p-bit sign buckets; a query compares only against vectors sharing a
    * bucket in ANY table, then exact cosine re-ranks the candidates.
    * Deterministic (fixed seed). Returns (query_id, rank, neighbor_id)
    * like the brute-force baseline so recall is directly measurable.
    *
    * Defaults (16 tables × 4 planes) give ~0.84 recall@10 on the
    * UNIFORMLY RANDOM testdata embeddings — the worst case for LSH,
    * where top neighbors sit at ~66° and candidate pruning necessarily
    * trades recall. On clustered real-world embeddings the same
    * parameters prune far harder at higher recall; tune `tables` up for
    * recall, `planes` up for pruning. */
  def lshTopK(
      spark: SparkSession, dir: String,
      queryPred: Long => Boolean = _ < 5, k: Int = 10,
      tables: Int = 16, planes: Int = 4, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val (ids, mat) = normalized(spark, dir)
    val dim = if (mat.isEmpty) 0 else mat(0).length
    val rnd = new scala.util.Random(seed)
    // tables × planes random hyperplanes
    val hp = Array.fill(tables, planes)(Array.fill(dim)(rnd.nextGaussian()))
    def bucket(v: Array[Double], t: Int): Int = {
      var b = 0
      var p = 0
      while (p < planes) {
        var s = 0.0; var i = 0; val h = hp(t)(p)
        while (i < dim) { s += h(i) * v(i); i += 1 }
        if (s > 0) b |= (1 << p)
        p += 1
      }
      b
    }
    val buckets: Array[Array[Int]] = mat.map(v =>
      Array.tabulate(tables)(t => bucket(v, t)))
    val bIds = spark.sparkContext.broadcast(ids)
    val bMat = spark.sparkContext.broadcast(mat)
    val bBuckets = spark.sparkContext.broadcast(buckets)
    val queryIdx = ids.indices.filter(i => queryPred(ids(i)))
    spark.sparkContext.parallelize(queryIdx, math.min(32, queryIdx.size max 1))
      .flatMap { qi =>
        val m = bMat.value; val id = bIds.value; val bk = bBuckets.value
        val q = m(qi); val qb = bk(qi)
        val cands = m.indices.filter { j =>
          j != qi && {
            var t = 0; var hit = false
            while (t < qb.length && !hit) {
              hit = bk(j)(t) == qb(t); t += 1 }
            hit
          }
        }
        val sims = cands.map { j =>
          var s = 0.0; var t = 0; val vj = m(j)
          while (t < q.length) { s += q(t) * vj(t); t += 1 }
          (s, id(j))
        }
        sims.sortBy { case (s, nid) => (-s, nid) }.take(k).zipWithIndex
          .map { case ((_, nid), r) => (id(qi), r + 1, nid) }
      }
      .toDF("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }
}
