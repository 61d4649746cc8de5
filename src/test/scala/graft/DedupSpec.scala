package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta epsilon zeta"),           // exact dup of 1
    (3L, "alpha beta gamma delta epsilon ETA"),            // near dup of 1
    (4L, "one two three four five six seven eight nine"))  // unrelated
    .toDF("doc_id", "text")

  test("exact dedup keeps lowest id and counts copies") {
    val out = Dedup.exactDedup(corpus, "doc_id", "text")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("jaccard: identical docs score 1.0, unrelated docs drop out") {
    val pairs = Dedup.jaccardPairs(Dedup.shingleRel(corpus), 0.5)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L)) || pairs((1L, 2L)) == 1.0)
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("shingles of short docs are empty, not an error") {
    val short = Seq((9L, "two words")).toDF("doc_id", "text")
    assert(Dedup.shingleRel(short).count() == 0)
  }

  test("minhash signatures are deterministic and equal for equal docs") {
    val s1 = Dedup.minHashSignatures(corpus)
      .as[(Long, Seq[Long])].collect().toMap
    val s2 = Dedup.minHashSignatures(corpus)
      .as[(Long, Seq[Long])].collect().toMap
    assert(s1 == s2)
    assert(s1(1L) == s1(2L))
    assert(s1(1L) != s1(4L))
  }

  test("simhash: equal docs collide, near dups are close, others far") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val sh = Dedup.simHash(corpus).as[(Long, Long)].collect().toMap
    assert(sh(1L) == sh(2L))
    assert(ham(sh(1L), sh(3L)) < ham(sh(1L), sh(4L)))
  }

  test("chooseBands meets the 1e-6 miss bound at the queried threshold") {
    for (t <- Seq(0.5, 0.6, 0.8, 0.9); k <- Seq(64, 128)) {
      val (b, r) = Dedup.chooseBands(t, k)
      assert(b * r <= k)
      assert(math.pow(1 - math.pow(t, r), b) <= 1e-6,
        s"t=$t k=$k -> b=$b r=$r misses too often")
    }
    // the documented default: t=0.8, k=128 -> 32 bands of 4 rows
    assert(Dedup.chooseBands(0.8, 128) == (32, 4))
    // no silent fallback: a threshold too low for the permutation count
    // must fail loudly, not quietly degrade recall
    intercept[IllegalArgumentException](Dedup.chooseBands(0.05, 16))
  }

  test("connected components: min-label propagation over a chain and an island") {
    import spark.implicits._
    // chain 1-2-3 (via two pairs) and island 7-8; 5 appears in no pair
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("star-contraction components equal min-label propagation on random graphs") {
    import spark.implicits._
    // long chains (worst case for label propagation, the case the
    // O(log n) star variant exists for), cliques, and random sparse
    // graphs — star and min-label must produce identical label maps
    val rnd = new scala.util.Random(7)
    val graphs: Seq[Seq[(Long, Long)]] = Seq(
      (1L to 40L).sliding(2).map(s => (s(0), s(1))).toSeq, // 40-chain
      (for (a <- 1 to 6; b <- a + 1 to 6) yield (a.toLong, b.toLong)),
      Seq((5L, 5L), (9L, 2L)), // self-loop + single edge
      Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong)),
      Seq.fill(40)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong)))
    graphs.foreach { edges =>
      val pairs = edges.toDF("doc_a", "doc_b")
      val ref = Dedup.connectedComponents(pairs, maxIters = 50)
        .as[(Long, Long)].collect().toMap
      val star = Dedup.connectedComponentsStar(pairs)
        .as[(Long, Long)].collect().toMap
      assert(star == ref, s"edges=$edges")
    }
  }

  test("exploded jaccard verify: hot-shingle fallback equals the join path") {
    import spark.implicits._
    // every doc shares a hot 3-shingle run (df = n on three shingles),
    // the shape that makes the intersection self-join quadratic
    val docs = (1L to 30L)
      .map(i => (i, s"common alpha beta gamma delta token$i"))
      .toDF("doc_id", "text")
    val shg = Dedup.shingleArrays(docs)
    val cands = Dedup.prefixCandidates(shg, 0.3)
    def run(budget: Double) =
      Dedup.jaccardVerifyExploded(shg, cands, 0.3, maxJoinRows = budget)
        .as[(Long, Long, Double)].collect().toSet
    val viaJoin = run(2e8)
    val viaFallback = run(1.0) // force the array merge-scan path
    val viaArrays = Dedup.jaccardVerifyShingled(shg, cands, 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaJoin.nonEmpty, "fixture should produce verified pairs")
    assert(viaFallback == viaJoin && viaJoin == viaArrays)
  }

  test("min-label CC falls back to star contraction beyond its round budget") {
    import spark.implicits._
    // a 30-chain needs ~29 min-label rounds; with maxIters=3 the loop
    // cannot converge and must finish via star contraction — same labels
    val chain = (1L to 30L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(chain, maxIters = 3)
      .as[(Long, Long)].collect().toMap
    assert(labels == (1L to 30L).map(_ -> 1L).toMap)
  }

  test("cluster collapse sizes sum to the docs covered by pairs") {
    import spark.implicits._
    val pairs = Dedup.minHashLsh(spark, sfDir, 0.8).select("doc_a", "doc_b")
    val docsInPairs = pairs.select("doc_a").union(pairs.select("doc_b"))
      .distinct().count()
    val clusters = Dedup.clusterCollapse(spark, sfDir)
      .as[(Long, Long)].collect()
    assert(clusters.map(_._2).sum == docsInPairs)
    assert(clusters.forall(_._2 >= 2), "every emitted cluster has >= 2 members")
  }

  test("sorted_intersect_size equals size(array_intersect) on sorted input") {
    import org.apache.spark.sql.functions._
    val df = spark.range(200).select(
      array_sort(array_distinct(transform(
        sequence(lit(0), pmod(col("id") * 7 + 3, lit(20))),
        i => concat(lit("s"), pmod(i * col("id") + i, lit(37)))))).as("a"),
      array_sort(array_distinct(transform(
        sequence(lit(0), pmod(col("id") * 5 + 2, lit(25))),
        i => concat(lit("s"), pmod(i * 3 + col("id"), lit(37)))))).as("b"))
    val got = df.select(
      graft.functions.SortedIntersectSize(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .collect()
    assert(got.forall(r => r.getInt(0) == r.getInt(1)))
  }

  test("lsh pairs equal the exact all-pairs result at sf0.001") {
    val pairs = Dedup.minHashLsh(spark, sfDir, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.jaccardPairs(
      Dedup.shingleRel(graft.operators.Relational.table(spark, sfDir, "documents")), 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == exact)
  }

  test("prefix-filtered jaccard equals the all-pairs join (exactness)") {
    for (t <- Seq(0.5, 0.8)) {
      val viaPrefix = Dedup.prefixJaccardPairs(
        graft.operators.Relational.table(spark, sfDir, "documents"), t)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val allPairs = Dedup.jaccardPairs(
        Dedup.shingleRel(graft.operators.Relational.table(spark, sfDir, "documents")), t)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(viaPrefix == allPairs, s"prefix filter diverged at t=$t")
    }
  }

  test("simhash dedup equals the exact all-pairs result at sf0.001") {
    val pairs = Dedup.simHashDedup(spark, sfDir)
      .as[(Long, Long)].collect().toSet
    val exact = Dedup.jaccardPairs(
      Dedup.shingleRel(graft.operators.Relational.table(spark, sfDir, "documents")), 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == exact)
  }

  test("embedding cosine pairs are ordered and above threshold") {
    val pairs = Dedup.embeddingCosinePairs(spark, sfDir, 0.46)
      .as[(Long, Long)].collect()
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("incremental LSH index probe recovers every injected exact copy") {
    val pairs = Dedup.minhashIndexIncrementalQuery(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    // Every re-keyed copy (even id < 100 → id + ReKeyOffset) pairs with
    // its original at jaccard 1.0 — an exact duplicate cannot be
    // missed by threshold-tuned banding.
    val nDocs = graft.operators.Relational.table(spark, sfDir, "documents")
      .count()
    val copies = (0L until math.min(100L, nDocs) by 2).toSeq
    copies.foreach { c =>
      assert(pairs.exists { case (a, b, j) =>
        a == c && b == c + Dedup.ReKeyOffset && j == 1.0 },
        s"missing exact-copy pair ($c, ${c + Dedup.ReKeyOffset})")
    }
    pairs.foreach { case (a, b, j) =>
      assert(a % 2 == 0 && (b % 2 == 1 || b >= Dedup.ReKeyOffset),
        "pairs must cross corpus → batch")
      assert(j >= 0.8)
    }
  }

  test("quantized LSH index: identical pairs, superset candidates, smaller bytes") {
    val row = Dedup.minhashIndexQuantizedQuery(spark, sfDir).head()
    assert(row.getLong(0) > 0, "no verified pairs at sf0.001")
    assert(row.getBoolean(1), "quantized-index pairs must equal full-index pairs")
    assert(row.getBoolean(2), "32-bit truncation must never lose a candidate")
    assert(row.getBoolean(3), "quantized index must be <= 0.7x full-index bytes")
  }

  test("span dedup: one kept occurrence per distinct span, first wins") {
    val k = 10
    val rows = Dedup.spanDedup(spark, sfDir, k)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nSpans, nKept, nDup) =>
      assert(nKept + nDup == nSpans)
      assert(nKept >= 0 && nDup >= 0)
    }
    // Global invariant: total kept spans == number of DISTINCT spans
    // in the corpus (each distinct span keeps exactly one occurrence).
    val docs = graft.operators.Relational.table(spark, sfDir, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val allSpans = docs.flatMap { case (_, text) =>
      val ws = text.split(" ", -1)
      (0 until ws.length / k).map(i =>
        ws.slice(i * k, i * k + k).mkString(" "))
    }
    assert(rows.map(_._3).sum == allSpans.distinct.length)
    assert(rows.map(_._2).sum == allSpans.length)
    // The corpus has exact-duplicate documents at sf0.001? Not
    // guaranteed — but repeated vocabulary makes some span collide; if
    // none did, the dedup would be vacuous and the test too weak.
    assert(rows.map(_._4).sum == allSpans.length - allSpans.distinct.length)
  }

  test("hot-bucket cap excludes a synthetic degenerate bucket with accounting") {
    import org.apache.spark.sql.functions._
    // 60 IDENTICAL documents (every band bucket holds all 60 — the
    // boilerplate-key degeneracy) plus one genuine near-dup pair and
    // two unrelated docs. An uncapped join pays 60²-scale candidate
    // rows; the capped join must drop the hot buckets entirely while
    // keeping the small-bucket near-dup pair.
    val hot = (0 until 60).map(i =>
      (100L + i, "the same boilerplate sentence repeated everywhere always"))
    val near = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota NU"))
    val other = Seq(
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "red orange yellow green blue indigo violet white black gray"))
    val docsDf = (hot ++ near ++ other).toDF("doc_id", "text")
    val sh = docsDf.select(col("doc_id"),
      array_sort(graft.operators.TextOps.shinglesOfTokens(
        graft.operators.TextOps.tokens(col("text")), 3)).as("shg"))
    val (bands, rows) = Dedup.chooseBands(0.8, 128)
    val banded = Dedup.lshBands(
      Dedup.minHashSignaturesOfShingles(sh, 128), bands, rows)
      .localCheckpoint(true)
    val cap = 32
    val sizes = banded.groupBy("band", "key").agg(count(lit(1)).as("bsz"))
    val mx = sizes.agg(max("bsz")).head().getLong(0)
    assert(mx >= 60, "the synthetic hot bucket must exist")
    val excluded = sizes.filter(col("bsz") > cap)
      .agg(count(lit(1)), sum("bsz")).head()
    assert(excluded.getLong(0) >= bands.toLong,
      "every band's hot bucket must be over the cap")
    val capped = Dedup.lshCandidates(banded, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.lshCandidates(banded, Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // The hot-bucket pairs (100..159 × 100..159) are in the uncapped
    // set and MUST be gone from the capped one; the near-dup pair
    // (bucket size 2) survives both.
    assert(full.exists { case (a, b) => a >= 100 && b >= 100 })
    assert(!capped.exists { case (a, b) => a >= 100 && b >= 100 },
      "capped join must exclude the degenerate bucket's pairs")
    assert(capped.contains((1L, 2L)), "small-bucket near-dups must survive")
    assert(full.contains((1L, 2L)))
    assert(capped.size < full.size)
  }

  test("edit-distance hot-block cap excludes the degenerate block with accounting") {
    import org.apache.spark.sql.functions._
    // First-token blocking is Zipfian on real names: every "acme"
    // record lands in one block and the self-join goes quadratic in
    // it. 50 "acme ..." rows over a cap of 32 must be dropped WHOLE
    // (not truncated) and accounted; the small "zeta" block's near-dup
    // pair must survive unharmed.
    val hot = (0 until 50).map(i => (100L + i, s"acme widget number $i"))
    val small = Seq(
      (1L, "zeta spring coil"), (2L, "zeta spring coio"),
      (3L, "omega brass fitting"))
    val named = (hot ++ small).toDF("id", "name")
    val r = Dedup.editDistanceDedupOf(named, maxDist = 3, blockCap = 32)
      .head()
    assert(r.getAs[Long]("n_blocks") == 3L)          // acme, zeta, omega
    assert(r.getAs[Long]("max_block_size") == 50L)
    assert(r.getAs[Long]("n_blocks_capped") == 1L)
    assert(r.getAs[Long]("n_rows_excluded") == 50L)
    // Only the zeta pair remains a candidate (omega is a singleton
    // block); it is a near pair at distance 1.
    assert(r.getAs[Long]("n_candidate_pairs") == 1L)
    assert(r.getAs[Long]("n_near_name_pairs") == 1L)
    assert(r.getAs[Long]("n_exact_name_pairs") == 0L)
    // With the cap above the hot block, nothing is excluded and the
    // acme candidates reappear — the no-op witness the driver corpus
    // relies on.
    val un = Dedup.editDistanceDedupOf(named, maxDist = 3, blockCap = 4096)
      .head()
    assert(un.getAs[Long]("n_blocks_capped") == 0L)
    assert(un.getAs[Long]("n_rows_excluded") == 0L)
    assert(un.getAs[Long]("n_candidate_pairs") > 1L)
  }

  test("deep-chain composite: a diameter-999 near-dup chain collapses " +
      "exactly via star contraction in O(log n) rounds (r19 task 7)") {
    // The duplication composites make WIDE clusters (10-way exact
    // copies — depth 1, trivial for min-label). This is the opposite
    // adversary: 1000 docs in a pure CHAIN (doc i near-dup of i+1
    // ONLY), path length 999 — min-label propagation needs diameter
    // rounds, so the round-budgeted fast path MUST fall back to
    // large-star/small-star contraction, whose O(log n) bound had
    // never been measured on a deep graph.
    //
    // Construction: sliding 60-token windows, stride 5, over one
    // all-distinct token stream. Word-3-gram shingle Jaccard:
    // adjacent docs 53/63 ≈ 0.841 (≥ 0.8, with margin over the LSH
    // miss bound); skip-one docs 48/68 ≈ 0.706 (< 0.8) — so the pair
    // graph is EXACTLY the 999-edge path.
    val n = 1000
    val L = 60
    val stride = 5
    val chain = (0 until n).map { i =>
      (i.toLong,
        (i * stride until i * stride + L).map(t => s"t$t").mkString(" "))
    }.toDF("doc_id", "text")
    val dir = graft.util.Scratch.dir("dedup-chain").toString
    chain.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // dedup_minhash_lsh finds exactly the path edges.
    val pairs = Dedup.minHashLsh(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == (0L until (n - 1).toLong).map(i => (i, i + 1)).toSet,
      s"expected the 999-edge path, got ${pairs.size} pairs")
    // dedup_cluster_collapse: ONE cluster, canonical 0, all 1000 docs
    // — and the witnesses prove it took the fallback and converged in
    // O(log n): the min-label budget (20) is far under the diameter,
    // star rounds are bounded by 2·log2(n) (measured ~8-12; each
    // round is a large-star + small-star pass).
    val collapsed = Dedup.clusterCollapse(spark, dir)
      .as[(Long, Long)].collect().toSeq
    assert(collapsed == Seq((0L, n.toLong)), collapsed.take(5))
    assert(Dedup.lastCcFellBack,
      "a diameter-999 chain must exhaust the min-label round budget")
    val rounds = Dedup.lastStarRounds
    val bound = 2 * (math.log(n.toDouble) / math.log(2)).ceil.toInt
    info(s"star contraction: $rounds rounds on the diameter-999 chain " +
      s"(bound $bound)")
    assert(rounds >= 1 && rounds <= bound,
      s"star contraction took $rounds rounds; O(log n) bound is $bound")
    // split_group_aware on the same chain: the whole component rides
    // ONE split — zero leaking pairs across any boundary.
    val splits = graft.operators.Sampling.splitGroupAware(spark, dir)
      .select("split", "n_docs", "n_leaking_pairs")
      .as[(String, Long, Long)].collect()
    assert(splits.map(_._2).sum == n.toLong)
    assert(splits.forall(_._3 == 0L), splits.mkString(", "))
    assert(splits.count(_._2 >= n.toLong) == 1,
      s"the chain cluster must land whole in one split: " +
        splits.mkString(", "))
  }
}
