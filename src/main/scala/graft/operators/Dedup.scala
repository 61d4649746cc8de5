package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design: every method reduces the quadratic pair space BEFORE
  * any pairwise work — exact dedup groups on a 256-bit content hash
  * (shuffles hashes, not documents); MinHash/SimHash bucket by band so
  * only same-bucket docs are ever joined; the exact-Jaccard verification
  * join runs on the candidate subset only. The all-pairs variants exist
  * as correctness oracles and for small reference sets.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Relational.table(spark, dir, "documents")

  /** Spec observability (the `lastBloomSplit` precedent): rounds the
    * last [[connectedComponentsStar]] run took to its CONFIRMED
    * fixpoint, and whether the last [[connectedComponents]] call
    * exhausted its min-label round budget and fell back to star
    * contraction — the witnesses the deep-chain composite pins the
    * O(log n) convergence claim with (r19 verdict task 7). Written
    * only by those functions; reads are for specs. */
  @volatile private[graft] var lastStarRounds: Int = -1
  @volatile private[graft] var lastCcFellBack: Boolean = false

  /** Fixture re-key offset shared by the incremental-ingest demo
    * queries here and in [[Curation]]: "new batch" rows are synthesized
    * by copying existing docs to `doc_id + ReKeyOffset`. Those queries
    * are only faithful if no GENUINE doc_id reaches the offset — a
    * collision would silently merge two documents' shingle sets (here)
    * or alias audit ids (there). */
  private[graft] val ReKeyOffset = 100000000000L

  /** Pins the `doc_id < ReKeyOffset` fixture assumption declaratively:
    * identity on every valid id, `raise_error` on violation. A pure
    * codegen'd conditional — zero cost while the assumption holds, a
    * loud failure instead of corrupt output if a future fixture breaks
    * it (the oracle SQL keeps the plain `doc_id + 100000000000` literal,
    * hashes are unchanged). */
  private[graft] def pinnedDocId(c: Column): Column =
    when(c >= 0 && c < ReKeyOffset, c).otherwise(raise_error(concat(
      lit(s"fixture doc_id outside [0, $ReKeyOffset): "),
      coalesce(c.cast("string"), lit("NULL")))))

  /** dedup_exact — keep the lowest doc_id per identical text. Grouping
    * key is sha2(text): the shuffle carries (hash, id), never the
    * document body. Collision probability at 2^-256 is ignorable. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = df.select(col(idCol), sha2(col(textCol).cast("binary"), 256).as("_fp"))
    val keep = fp.groupBy("_fp")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("_fp")
    df.join(keep, Seq(idCol), "inner")
  }

  /** dedup_exact driver query — the corpus unioned with a re-keyed copy
    * of itself; dedup must keep exactly the original ids with
    * n_copies=2. */
  def exactDedupQuery(spark: SparkSession, dir: String): DataFrame = {
    val base = docs(spark, dir).select(col("doc_id"), col("text"))
    val copy = base.withColumn("doc_id", col("doc_id") + ReKeyOffset)
    exactDedup(base.union(copy), "doc_id", "text")
      .select("doc_id", "n_copies")
      .orderBy("doc_id")
  }

  /** Distinct-shingle relation (doc_id, shingle). */
  def shingleRel(df: DataFrame, k: Int = 3): DataFrame =
    df.select(col("doc_id"),
        explode(TextOps.shingles(col("text"), k)).as("shingle"))
      .distinct()

  /** Per-doc distinct SORTED shingle arrays (doc_id, shg) — the shared
    * input of signature generation, candidate banding, and
    * exact-Jaccard verification. Computing it once (and persisting it
    * across the legs of a query) avoids re-shingling the corpus per
    * consumer; sorting once here lets verification count intersections
    * with a merge scan (`SortedIntersectSize`) instead of per-pair hash
    * sets. Set semantics are order-independent, so every consumer
    * (MinHash, SimHash, Jaccard) is unaffected by the sort. */
  private[graft] def shingleArrays(docsDf: DataFrame, k: Int = 3): DataFrame =
    docsDf.select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
      .select(col("doc_id"),
        array_sort(TextOps.shinglesOfTokens(col("ws"), k)).as("shg"))

  /** Exact pairwise Jaccard over a shingle relation, restricted to an
    * optional candidate-pair set; emits (doc_a, doc_b, jaccard ≥ t).
    *
    * EAGER: the (small-by-design) result is materialized via
    * localCheckpoint before returning so every cached intermediate can
    * be released in `finally` — a long-lived session running many
    * queries must not accumulate persisted blocks.
    *
    * OWNERSHIP: `candidates` is consumed — this function persists it
    * for its own multi-use and unpersists it before returning, so a
    * caller must not rely on its own persist of the same DataFrame
    * surviving the call. */
  def jaccardPairs(
      shingles: DataFrame,
      threshold: Double,
      candidates: Option[DataFrame] = None): DataFrame = {
    // The candidate set is consumed twice (docs-in-play semi-join and
    // the pair filter); persist it so its upstream (signature UDF +
    // band self-join) runs once.
    val cands = candidates.map(_.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val shUncached = cands match {
      case Some(c) =>
        val docsInPlay = c.select(col("doc_a").as("doc_id"))
          .union(c.select(col("doc_b").as("doc_id"))).distinct()
        shingles.join(broadcast(docsInPlay), Seq("doc_id"), "left_semi")
      case None => shingles
    }
    // The shingle relation feeds three consumers (sizes + both sides of
    // the intersection join); without persisting, the explode+distinct
    // shuffle re-runs for each.
    val sh = shUncached.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("c"))
      val a = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      val b = sh.select(col("doc_id").as("doc_b"), col("shingle"))
      val inter = a.join(b, Seq("shingle"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
      val withCand = cands match {
        case Some(c) => inter.join(broadcast(c), Seq("doc_a", "doc_b"), "left_semi")
        case None => inter
      }
      withCand
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("c", "ca"), Seq("doc_a"))
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("c", "cb"), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          (col("i").cast("double") / (col("ca") + col("cb") - col("i")))
            .as("jaccard"))
        .filter(col("jaccard") >= threshold)
        .localCheckpoint(true)
    } finally {
      sh.unpersist(false)
      cands.foreach(_.unpersist(false))
    }
  }

  // ------------------------------------------------------------------
  // MinHash + LSH banding
  // ------------------------------------------------------------------

  /** Fixed-seed universal-hash parameters (a·x + b mod p). The modulus
    * is the 31-bit Mersenne prime so a·h ≤ 2⁶² never overflows a Long —
    * Spark 4 runs ANSI arithmetic by default and would raise on
    * overflow. */
  private val MersennePrime = graft.functions.TextSketch.MersennePrime
  private[graft] def perms(n: Int, seed: Long): Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)((math.abs(rnd.nextLong()) % (MersennePrime - 1) + 1,
      math.abs(rnd.nextLong()) % MersennePrime))
  }

  /** 64-bit string hash from two 32-bit murmur passes (deterministic,
    * seed-fixed; used for signatures only — never oracle-compared).
    * Shared with the native sketch expressions. */
  private def hash64(s: String): Long =
    graft.functions.TextSketch.hash64(s)

  /** Choose an LSH banding (bands, rowsPerBand) for a queried Jaccard
    * threshold: the most selective banding (largest r, fewest random
    * candidates) whose miss probability (1 - t^r)^b at j = t stays
    * ≤ 1e-6. Smaller thresholds force smaller r — more background
    * candidates is the inherent LSH price of recall at low similarity.
    * For the default t=0.8, k=128 this picks b=32, r=4
    * (miss(0.8) = (1-0.8⁴)³² ≈ 4.8·10⁻⁸, and super-exponentially less
    * above the threshold). */
  def chooseBands(threshold: Double, k: Int): (Int, Int) = {
    require(threshold > 0 && threshold < 1, s"threshold $threshold")
    val r = (1 to 16)
      .filter(r => k / r >= 1 &&
        math.pow(1 - math.pow(threshold, r), k / r) <= 1e-6)
      .maxOption
      // No silent fallback: if even r=1 misses the bound (very low
      // thresholds with small k), the advertised recall guarantee
      // cannot be met — fail loudly instead of quietly degrading.
      .getOrElse(throw new IllegalArgumentException(
        s"no ($k-permutation) banding meets the 1e-6 miss bound at " +
          s"threshold=$threshold; raise the threshold or k"))
    (k / r, r)
  }

  /** MinHash signatures: k permutations over the document's shingle set,
    * computed in ONE pass per row inside a native expression
    * ([[graft.functions.TextSketch.MinHashSignature]]) — no explode, no
    * shuffle: signatures stream out of the scan at full parallelism.
    * (A k-column conditional-min hash aggregate over exploded shingles
    * computes the same thing but pays an explode + shuffle + a janino
    * codegen blowup; and the ScalaUDF this replaced paid a per-row
    * Seq[String] materialization through the catalyst→Scala converter
    * before its loop even ran. Arithmetic is unchanged — spec-pinned
    * against the former UDF's formula.) */
  def minHashSignatures(
      docsDf: DataFrame, k: Int = 128, seed: Long = 42L): DataFrame =
    minHashSignaturesOfShingles(shingleArrays(docsDf), k, seed)

  /** Signatures from a precomputed (doc_id, shg) shingle relation, so a
    * multi-leg query shingles the corpus once. */
  def minHashSignaturesOfShingles(
      sh: DataFrame, k: Int = 128, seed: Long = 42L): DataFrame = {
    val ps = perms(k, seed)
    sh.select(col("doc_id"),
      graft.functions.TextSketch
        .minHashCol(ps.map(_._1), ps.map(_._2), col("shg")).as("mh"))
  }

  /** LSH band keys from the signature array: b bands of r rows; same
    * (band, key) ⇒ candidate.
    *
    * SHAPE MATTERS: the band index is exploded FIRST and the key is a
    * `slice` of the signature ATTRIBUTE after the Generate. Building an
    * array of per-band structs that each reference the signature column
    * instead lets CollapseProject inline the signature UDF into every
    * element_at reference — b·r re-evaluations of the full MinHash per
    * row (measured 10× slowdown of the whole query at sf0.1). */
  def lshBands(sig: DataFrame, bands: Int, rows: Int): DataFrame =
    sig.select(col("doc_id"), col("mh"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("doc_id"), col("band"),
        xxhash64(col("band"),
          slice(col("mh"), col("band") * rows + 1, lit(rows))).as("key"))

  /** Default per-(band, key) bucket cap for LSH candidate joins. At web
    * scale a degenerate band key (a boilerplate shingle pattern shared
    * by millions of documents) makes the bucket self-join QUADRATIC in
    * that bucket's size; production MinHash dedup (the SlimPajama /
    * RefinedWeb discipline) caps or drops oversized buckets. A bucket
    * at the cap still admits cap² ≈ 16M candidate rows — far above any
    * genuine near-dup cluster this engine has measured (duplicate
    * groups are tens of documents), so on non-adversarial corpora the
    * cap excludes nothing; on adversarial ones it bounds the join. */
  private[graft] val DefaultLshBucketCap = 4096

  /** Candidate pairs from shared LSH buckets, with buckets larger than
    * `bucketCap` EXCLUDED from the self-join (dropped, not truncated —
    * a truncated bucket would make the candidate set depend on row
    * order).
    *
    * The cap is a WINDOW count over the self-join's own (band, key)
    * partitioning, not a groupBy + semi-join: the r11 groupBy form put
    * a map-side partial aggregate UNDER its exchange, so the aggregate
    * exchange and the join exchange no longer canonicalized to the
    * same subtree, exchange reuse broke, and the whole upstream
    * minhash/banding lineage re-ran per consumer (the
    * dedup_minhash_lsh 1.9× bench regression). One lineage → the
    * window's exchange is computed once, its (band, key) partitioning
    * already satisfies the join, and the two join sides reuse it. */
  def lshCandidates(
      banded: DataFrame, bucketCap: Int = DefaultLshBucketCap): DataFrame = {
    val keep =
      if (bucketCap == Int.MaxValue) banded
      else {
        val byBucket = org.apache.spark.sql.expressions.Window
          .partitionBy("band", "key")
        banded
          .withColumn("__bsz", count(lit(1)).over(byBucket))
          .filter(col("__bsz") <= bucketCap)
          .drop("__bsz")
      }
    val l = keep.select(col("band"), col("key"), col("doc_id").as("doc_a"))
    val r = keep.select(col("band"), col("key"), col("doc_id").as("doc_b"))
    l.join(r, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** Exact Jaccard for an (assumed small) candidate-pair set, computed
    * with per-doc shingle ARRAYS and array_intersect instead of the
    * exploded shingle join: no explode, no distinct shuffle — just two
    * hash joins of the candidate list against (doc_id, shingles).
    * Set semantics identical to the join formulation (arrays are
    * distinct'd). */
  def jaccardVerifyPairs(
      docsDf: DataFrame, candidates: DataFrame,
      threshold: Double): DataFrame =
    jaccardVerifyShingled(shingleArrays(docsDf), candidates, threshold)

  /** As `jaccardVerifyPairs`, but over a precomputed (doc_id, shg)
    * shingle relation (typically persisted by the caller and shared
    * with candidate generation). */
  def jaccardVerifyShingled(
      shingled: DataFrame, candidates: DataFrame,
      threshold: Double): DataFrame = {
    val cands = candidates.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Shingle arrays only for docs that appear in a candidate pair —
      // and persisted, since both join sides consume them. Without the
      // semi-filter the full corpus would flow into both joins.
      val docsInPlay = cands.select(col("doc_a").as("doc_id"))
        .union(cands.select(col("doc_b").as("doc_id"))).distinct()
      val arr = shingled
        .join(broadcast(docsInPlay), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("shg").as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        cands
          .join(arr.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
            Seq("doc_a"))
          .join(arr.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
            Seq("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            // merge-scan intersection over the pre-sorted arrays: the
            // hash-set-per-row of array_intersect dominated this stage
            // on large candidate sets
            graft.functions.SortedIntersectSize(
              col("sh_a"), col("sh_b")).as("i"),
            size(col("sh_a")).as("ca"), size(col("sh_b")).as("cb"))
          .select(col("doc_a"), col("doc_b"),
            (col("i").cast("double") / (col("ca") + col("cb") - col("i")))
              .as("jaccard"))
          .filter(col("jaccard") >= threshold)
          // Eager: materialize the verified pair set (small by design)
          // so the caches below can be dropped before returning.
          .localCheckpoint(true)
      } finally arr.unpersist(false)
    } finally cands.unpersist(false)
  }

  /** MinHash-LSH candidate pairs for a Jaccard threshold, with banding
    * derived from the threshold by `chooseBands` so the probability of
    * missing a pair at j ≥ t is bounded (≤ 1e-6 at j = t exactly). */
  def minHashCandidates(
      docsDf: DataFrame, threshold: Double, k: Int = 128): DataFrame =
    minHashCandidatesOfShingles(shingleArrays(docsDf), threshold, k)

  /** Candidates from a precomputed shingle relation. */
  def minHashCandidatesOfShingles(
      sh: DataFrame, threshold: Double, k: Int = 128): DataFrame = {
    val (bands, rows) = chooseBands(threshold, k)
    lshCandidates(lshBands(minHashSignaturesOfShingles(sh, k), bands, rows))
  }

  /** dedup_minhash_lsh — shingle → minhash → band → bucket-join →
    * exact-Jaccard verify. Banding is tuned to the QUERIED threshold
    * (see `chooseBands`): every pair at j ≥ t is a candidate with
    * probability ≥ 1 - 1e-6, and the exact verification step removes
    * every false candidate — so the output matches the exact all-pairs
    * result up to that bounded miss probability, at ~0.1% of its
    * comparisons. The shingle relation is computed once and persisted
    * across candidate generation and verification. */
  def minHashLsh(
      spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    val sh = shingleArrays(docs(spark, dir)).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      jaccardVerifyShingled(sh,
          minHashCandidatesOfShingles(sh, threshold), threshold)
        .orderBy("doc_a", "doc_b")
    } finally sh.unpersist(false)
  }

  /** dedup_lsh_hotbucket — the bucket-cap discipline witnessed in-query:
    * the minhash banding is built once, its bucket-size distribution is
    * measured, and the SAME banded relation is joined twice — capped at
    * `cap` and uncapped — with both candidate sets exact-verified. On
    * this corpus the cap sits above the max bucket (dup groups are tens
    * of documents), so the witness proves the cap machinery is a no-op
    * exactly when it should be: zero buckets capped, zero rows
    * excluded, and the verified pair sets IDENTICAL (two symmetric
    * anti-join counts — nothing corpus-sized lands on the driver). The
    * adversarial leg (a synthetic hot bucket that MUST be excluded,
    * with accounting) is spec-covered in DedupSpec, where the fixture
    * can be made degenerate on purpose. */
  def lshHotBucketQuery(
      spark: SparkSession, dir: String,
      threshold: Double = 0.8, cap: Int = 1024): DataFrame = {
    import spark.implicits._
    val sh = shingleArrays(docs(spark, dir)).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (bands, rows) = chooseBands(threshold, 128)
      val banded =
        lshBands(minHashSignaturesOfShingles(sh, 128), bands, rows)
          .localCheckpoint(true)
      val acct = banded.groupBy("band", "key")
        .agg(count(lit(1)).as("bsz"))
        .agg(max(col("bsz")).as("mx"),
          sum(when(col("bsz") > cap, 1L).otherwise(0L)).as("capped"),
          sum(when(col("bsz") > cap, col("bsz")).otherwise(0L)).as("excl"))
        .head()
      val pairsCapped = jaccardVerifyShingled(
        sh, lshCandidates(banded, cap), threshold)
        .select("doc_a", "doc_b").localCheckpoint(true)
      val pairsFull = jaccardVerifyShingled(
        sh, lshCandidates(banded, Int.MaxValue), threshold)
        .select("doc_a", "doc_b").localCheckpoint(true)
      val onlyFull =
        pairsFull.join(pairsCapped, Seq("doc_a", "doc_b"), "left_anti").count()
      val onlyCapped =
        pairsCapped.join(pairsFull, Seq("doc_a", "doc_b"), "left_anti").count()
      Seq((pairsCapped.count(),
        onlyFull == 0L && onlyCapped == 0L,
        acct.getAs[Long]("mx") <= cap,
        acct.getAs[Long]("capped"),
        acct.getAs[Long]("excl")))
        .toDF("n_pairs", "matches_uncapped", "max_bucket_le_cap",
          "n_buckets_capped", "rows_excluded")
    } finally sh.unpersist(false)
  }

  /** Exact threshold-Jaccard similarity join via prefix filtering (the
    * PPJoin family: Chaudhuri et al. 2006, Xiao et al. 2008 — public
    * algorithms). Shingles are globally ordered by ascending document
    * frequency; a pair with jaccard ≥ t MUST share one of each side's
    * first (sz - ⌈t·sz⌉ + 1) rarest shingles (if the first common
    * shingle in the global order were outside a doc's prefix, the
    * overlap could be at most ⌈t·sz⌉ - 1 < t·sz ≤ overlap — a
    * contradiction). Joining only the prefixes — plus the length-ratio
    * bound t·|a| ≤ |b| ≤ |a|/t — yields a candidate set that provably
    * contains every qualifying pair, at a fraction of the all-pairs
    * join: the quadratic blowup of frequent shingles is excluded by
    * construction, because frequent shingles land in suffixes. */
  /** Prefix-filtered candidate pairs from a (doc_id, shg) relation.
    * Pruning bounds use a tiny slack (Eps) so thresholds that are not
    * exactly representable in binary (0.6, 0.8, ...) can never round a
    * boundary pair OUT of the candidate set: completeness is the part
    * verification cannot recover, while the extra candidates the slack
    * admits are removed by the exact verify step. */
  /** The per-doc rarest-prefix relation (doc_id, shingle, sz, rk) the
    * candidate self-join runs over. Split out so callers can persist it
    * once across both sides of that self-join — without the persist the
    * explode → df-join → window chain runs twice. */
  private[graft] def prefixRelation(
      shg: DataFrame, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val Eps = 1e-9
    // Shingles are distinct per doc already; carrying the set size
    // through the explode avoids a second window over the relation.
    val sh = shg.select(col("doc_id"), size(col("shg")).as("sz"),
      explode(col("shg")).as("shingle"))
    val freq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    val byRarity = Window.partitionBy("doc_id")
      .orderBy(col("df").asc, col("shingle").asc)
    val ranked = sh.join(freq, Seq("shingle"))
      .select(col("doc_id"), col("shingle"), col("sz"),
        row_number().over(byRarity).as("rk"))
    ranked
      .filter(col("rk") <=
        col("sz") - ceil(col("sz") * threshold - Eps) + 1)
      .select("doc_id", "shingle", "sz", "rk")
  }

  /** Candidate pairs from a prefix relation. May emit a pair once per
    * shared prefix shingle (a small bounded factor) — callers that need
    * set semantics apply `.distinct()`; the exploded/left-semi verify
    * steps tolerate duplicates, so the hot path skips that shuffle. */
  private[graft] def prefixCandidatesOf(
      pref: DataFrame, threshold: Double): DataFrame = {
    val Eps = 1e-9
    // jaccard ≥ t needs overlap ≥ t·(sz_a+sz_b)/(1+t); a match at
    // rank rk leaves at most sz - rk shingles after it (positional
    // filter, PPJoin: Xiao et al. 2008) — pairs whose only shared
    // prefix shingles sit too late cannot reach the bound.
    val minOverlap =
      ceil((col("sz_a") + col("sz_b")) * (threshold / (1 + threshold)) - Eps)
    pref
      .select(col("doc_id").as("doc_a"), col("shingle"),
        col("sz").as("sz_a"), col("rk").as("rk_a"))
      .join(pref.select(col("doc_id").as("doc_b"), col("shingle"),
        col("sz").as("sz_b"), col("rk").as("rk_b")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b") &&
        col("sz_a") * threshold <= col("sz_b") + Eps &&
        col("sz_b") * threshold <= col("sz_a") + Eps &&
        least(col("sz_a") - col("rk_a"), col("sz_b") - col("rk_b")) + 1
          >= minOverlap)
      .select("doc_a", "doc_b")
  }

  private[graft] def prefixCandidates(
      shg: DataFrame, threshold: Double): DataFrame =
    prefixCandidatesOf(prefixRelation(shg, threshold), threshold).distinct()

  /** Exact Jaccard for a LARGE candidate-pair set: intersection counts
    * come from the exploded shingle relation (narrow rows through the
    * shuffle) instead of attaching both documents' shingle ARRAYS to
    * every pair — at 125k candidates the array movement dominates the
    * array-based verify (~5s vs ~1s at sf0.1). Safe whenever no shingle
    * is pathologically hot (the self-join emits Σ df² rows); the
    * array-based `jaccardVerifyShingled` remains the choice for small
    * candidate sets and hot-key-prone inputs. Pairs sharing zero
    * shingles emit no row, which is correct for any threshold > 0. */
  def jaccardVerifyExploded(
      shingled: DataFrame, candidates: DataFrame,
      threshold: Double, maxJoinRows: Double = 2e8): DataFrame = {
    val cands = candidates.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val docsInPlay = cands.select(col("doc_a").as("doc_id"))
        .union(cands.select(col("doc_b").as("doc_id"))).distinct()
      val arr = shingled
        .join(broadcast(docsInPlay), Seq("doc_id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val sizes = arr.select(col("doc_id"), size(col("shg")).as("c"))
        val ex = arr.select(col("doc_id"), explode(col("shg")).as("shingle"))
        // HOT-SHINGLE GUARD: the intersection self-join emits Σ df²
        // rows — one pathologically hot shingle makes that quadratic
        // in its document frequency. The Σ df² estimate costs one
        // aggregate over rows the join would read anyway (and `arr` is
        // persisted, so nothing recomputes); above the budget, verify
        // with the array merge-scan path instead — identical output
        // (property-tested), no quadratic shuffle. Summed as double:
        // the estimate must not itself overflow where the join would.
        val joinRows = Option(
          ex.groupBy("shingle").agg(count(lit(1)).cast("double").as("df"))
            .agg(sum(col("df") * col("df"))).head().getAs[java.lang.Double](0))
          .fold(0.0)(_.doubleValue())
        // Candidates may arrive NON-DISTINCT (prefixCandidatesOf emits a
        // pair once per shared prefix shingle — the hot-key corpora that
        // trip this guard are exactly the ones with many shared prefixes).
        // The main path dedups via left_semi + groupBy; the array path's
        // plain joins preserve multiplicity, so dedup here or the output
        // carries duplicate pairs.
        if (joinRows > maxJoinRows)
          return jaccardVerifyShingled(arr, cands.distinct(), threshold)
        val inter = ex.select(col("doc_id").as("doc_a"), col("shingle"))
          .join(ex.select(col("doc_id").as("doc_b"), col("shingle")),
            Seq("shingle"))
          .filter(col("doc_a") < col("doc_b"))
          .join(cands, Seq("doc_a", "doc_b"), "left_semi")
          .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
        inter
          .join(sizes.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("c", "ca"), Seq("doc_a"))
          .join(sizes.withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("c", "cb"), Seq("doc_b"))
          .select(col("doc_a"), col("doc_b"),
            (col("i").cast("double") / (col("ca") + col("cb") - col("i")))
              .as("jaccard"))
          .filter(col("jaccard") >= threshold)
          .localCheckpoint(true)
      } finally arr.unpersist(false)
    } finally cands.unpersist(false)
  }

  def prefixJaccardPairs(docsDf: DataFrame, threshold: Double): DataFrame = {
    val shg = shingleArrays(docsDf).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val pref = prefixRelation(shg, threshold).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // Duplicate candidates (one per shared prefix shingle) are fine:
      // the exploded verify's left-semi pair filter and the distinct'd
      // docs-in-play set both tolerate them, so the former global
      // `.distinct()` shuffle over the candidate set is skipped.
      try jaccardVerifyExploded(shg,
        prefixCandidatesOf(pref, threshold), threshold)
      finally pref.unpersist(false)
    } finally shg.unpersist(false)
  }

  /** dedup_ngram_jaccard — EXACT n-gram Jaccard threshold join. Same
    * result as the quadratic all-pairs join (`jaccardPairs`, kept as
    * the reference oracle path), computed with prefix filtering. */
  def ngramJaccard(
      spark: SparkSession, dir: String, threshold: Double = 0.6): DataFrame =
    prefixJaccardPairs(docs(spark, dir), threshold)
      .orderBy("doc_a", "doc_b")

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 64-bit SimHash over word k-shingles: bit i is the sign of
    * Σ_shingles (±1 by bit i of hash64(shingle)). One pass per row in a
    * native expression ([[graft.functions.TextSketch.SimHash64]]) — no
    * explode, no shuffle, no per-row UDF converter (same rationale as
    * minHashSignatures). Shingles, not single tokens: documents drawn
    * from a shared vocabulary have near-identical token DISTRIBUTIONS,
    * which collapses token-level simhashes together; 3-gram features
    * keep unrelated documents ~32 bits apart while true near-dups stay
    * within a few bits. */
  def simHash(df: DataFrame): DataFrame =
    simHashOfShingles(shingleArrays(df))

  /** SimHash from a precomputed (doc_id, shg) shingle relation. */
  def simHashOfShingles(shingled: DataFrame): DataFrame =
    shingled.select(col("doc_id"),
      graft.functions.TextSketch.simHashCol(col("shg")).as("simhash"))

  /** SimHash band candidates: 8×8-bit keys over the 64-bit fingerprint.
    * By pigeonhole, any pair within hamming distance 7 shares ≥1 band —
    * that is the COMPLETE part of the guarantee. Pairs beyond hamming 7
    * may or may not collide in a band; `maxHamming` prunes the random
    * collisions (random fingerprints sit at hamming ≈ 32) before the
    * expensive verification. */
  def simHashCandidates(
      docsDf: DataFrame, maxHamming: Int = 16): DataFrame =
    simHashCandidatesOfShingles(shingleArrays(docsDf), maxHamming)

  /** SimHash band candidates from a precomputed shingle relation. */
  def simHashCandidatesOfShingles(
      shingled: DataFrame, maxHamming: Int = 16): DataFrame = {
    val sig = simHashOfShingles(shingled).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bandCols = (0 until 8).map { bi =>
        struct(lit(bi).as("band"),
          shiftright(col("simhash"), bi * 8).bitwiseAND(0xFFL).as("key"))
      }
      val banded = sig
        .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
      lshCandidates(banded)
        .join(sig.select(col("doc_id").as("doc_a"),
          col("simhash").as("sh_a")), Seq("doc_a"))
        .join(sig.select(col("doc_id").as("doc_b"),
          col("simhash").as("sh_b")), Seq("doc_b"))
        .filter(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= maxHamming)
        .select("doc_a", "doc_b")
        .localCheckpoint(true) // eager, so sig can be released
    } finally sig.unpersist(false)
  }

  /** dedup_simhash — simhash-banded candidates, UNIONED with the
    * minhash-LSH candidate set, then exact-Jaccard verified.
    *
    * Why the union: simhash banding alone guarantees candidacy only for
    * pairs within hamming 7, but measured 3-gram near-dups at
    * j ∈ [0.8, 0.95] reach hamming 10–14 — real near-dup pairs would be
    * dropped with probability ~0.1 each, silently, on reseeded data. No
    * 64-bit simhash banding can close that gap (bands fine enough to
    * catch hamming 14 admit a large fraction of the random-pair space).
    * The minhash leg (threshold-tuned banding, miss ≤ 1e-6 at j = t)
    * restores a provable recall bound at the queried Jaccard threshold,
    * while the simhash leg remains the demonstrably cheap
    * hamming-near-dup detector. */
  def simHashDedup(
      spark: SparkSession, dir: String, threshold: Double = 0.8,
      maxHamming: Int = 16): DataFrame = {
    // One shingle pass serves both candidate legs AND the verify step —
    // without the shared persist, the union re-shingled and re-signed
    // the corpus per leg (the round-2 2.5× regression of this query).
    val sh = shingleArrays(docs(spark, dir)).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // FUSED candidate generation: both legs' (band, key) rows are
      // unioned BEFORE a single bucket self-join, replacing the former
      // per-leg self-join + pair-set union + distinct (three shuffles
      // and an eager checkpoint barrier) with one join + one groupBy.
      // Simhash bands are offset to 1000+ so the two legs' key spaces
      // can never alias. The hamming prune applies only to pairs whose
      // sole provenance is a simhash band (`from_min` tracks whether
      // any minhash bucket produced the pair) — minhash candidates keep
      // their threshold-tuned recall bound untouched, and the exact
      // verify removes every false candidate either way.
      val sig = simHashOfShingles(sh).persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val simBandCols = (0 until 8).map { bi =>
          struct(lit(1000 + bi).as("band"),
            shiftright(col("simhash"), bi * 8).bitwiseAND(0xFFL).as("key"))
        }
        val simBanded = sig
          .select(col("doc_id"), explode(array(simBandCols: _*)).as("bk"))
          .select(col("doc_id"),
            col("bk.band").as("band"), col("bk.key").as("key"))
        val (bands, rows) = chooseBands(threshold, 128)
        val minBanded =
          lshBands(minHashSignaturesOfShingles(sh, 128), bands, rows)
        val banded = minBanded.unionByName(simBanded)
        val l = banded.select(col("band"), col("key"), col("doc_id").as("doc_a"))
        val r = banded.select(col("band"), col("key"), col("doc_id").as("doc_b"))
        val cands = l.join(r, Seq("band", "key"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy("doc_a", "doc_b")
          .agg(max(when(col("band") < 1000, 1).otherwise(0)).as("from_min"))
          .join(sig.select(col("doc_id").as("doc_a"),
            col("simhash").as("sh_a")), Seq("doc_a"))
          .join(sig.select(col("doc_id").as("doc_b"),
            col("simhash").as("sh_b")), Seq("doc_b"))
          .filter(col("from_min") === 1 ||
            bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= maxHamming)
          .select("doc_a", "doc_b")
        // jaccardVerifyShingled materializes eagerly, so sig/sh can be
        // released as soon as it returns.
        jaccardVerifyShingled(sh, cands, threshold)
          .select("doc_a", "doc_b")
          .orderBy("doc_a", "doc_b")
      } finally sig.unpersist(false)
    } finally sh.unpersist(false)
  }

  // ------------------------------------------------------------------
  // Cluster collapse (pairs → connected components → canonical doc)
  // ------------------------------------------------------------------

  /** Connected components of an undirected pair graph by iterative
    * min-label propagation: every vertex starts as its own label and
    * repeatedly takes the minimum label among itself and its direct
    * neighbors until a fixpoint. Each iteration is one join + one
    * aggregation (both on the PAIR set, which is tiny relative to the
    * corpus after near-dup candidate generation), and the intermediate
    * is checkpointed so lineage stays flat. Converges in ≤ diameter
    * iterations — near-dup clusters are quasi-cliques, so 2–3 rounds in
    * practice; `maxIters` bounds pathological chains (a 100 TB run
    * would switch to the alternating large-star/small-star variant for
    * an O(log n) bound, same join shape). */
  /** Explicitly release the executor blocks behind an EAGER
    * localCheckpoint DataFrame that nothing will read again. Distributed
    * storage must not wait for driver GC: superseded loop intermediates
    * would otherwise pin executor memory until the JVM happens to
    * collect their RDD handles. NEVER call this on a live result —
    * local checkpoints cannot recompute lost blocks. */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(false)
      case _ => ()
    }

  /** `releaseInput = true` hands ownership of a locally-checkpointed
    * `pairs` to this function: its executor blocks are freed once the
    * labels are materialized, and THE CALLER MUST NOT READ `pairs`
    * AGAIN (a released local checkpoint cannot recompute). Default is
    * non-destructive. */
  private[graft] def connectedComponents(
      pairs: DataFrame, maxIters: Int = 20,
      releaseInput: Boolean = false): DataFrame = {
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var labels = edges.select(col("src").as("doc_id")).distinct()
        .select(col("doc_id"), col("doc_id").as("label"))
        .localCheckpoint(true)
      // Convergence witness: per-doc labels are monotonically
      // NON-INCREASING (each step takes a min over a set containing the
      // current label), so the label SUM strictly decreases on any
      // change — comparing sums detects the fixpoint with one cheap
      // aggregate per iteration instead of a join + count.
      def labelSum(df: DataFrame): Option[Long] =
        Option(df.agg(sum("label")).head().getAs[java.lang.Long](0))
          .map(_.longValue())
      lastCcFellBack = false
      var prevSum = labelSum(labels)
      var converged = false
      var iter = 0
      while (!converged && iter < maxIters) {
        val viaNeighbor = edges
          .join(labels, edges("dst") === labels("doc_id"))
          .select(edges("src").as("doc_id"), col("label"))
        val updated = labels.union(viaNeighbor)
          .groupBy("doc_id").agg(min("label").as("label"))
          .localCheckpoint(true)
        val curSum = labelSum(updated)
        // `updated` is materialized; the previous labels checkpoint is
        // superseded — release its executor blocks now, not at GC time.
        releaseCheckpoint(labels)
        labels = updated
        converged = curSum == prevSum
        prevSum = curSum
        iter += 1
      }
      // Never hand back silently-wrong clusters: a non-converged exit
      // means some component's diameter exceeded maxIters and its
      // labels are still mid-propagation. Instead of failing, finish
      // with the O(log n) star-contraction variant — correct labels in
      // bounded rounds regardless of diameter (loud in logs so the
      // round-budget miss stays observable).
      if (!converged) {
        System.err.println(
          s"[graft] connectedComponents: no fixpoint in $maxIters " +
            "min-label rounds; switching to star contraction")
        // The abandoned loop's last labels checkpoint would otherwise
        // pin executor storage for the whole star-contraction phase.
        releaseCheckpoint(labels)
        lastCcFellBack = true
        return connectedComponentsStar(pairs, releaseInput = releaseInput)
      }
      if (releaseInput) releaseCheckpoint(pairs)
      labels
    } finally edges.unpersist(false)
  }

  /** Connected components by ALTERNATING LARGE-STAR / SMALL-STAR
    * rounds (Kiveris et al. 2014, "Connected Components in MapReduce
    * and Beyond" — public algorithm): each round rewires every node
    * toward the minimum of its neighborhood, which provably converges
    * in O(log n) rounds on ANY graph — the variant to run when
    * component diameters are unbounded (min-label propagation above
    * needs diameter rounds). Each round is two join+aggregate passes
    * over the current edge set, checkpointed to keep lineage flat.
    *
    * large-star: for every edge (u,v), v > u, connect v to
    * m(u) = min(Γ(u) ∪ {u}); small-star: orient edges toward the
    * larger endpoint and connect each hub and its smaller neighbors to
    * their minimum. At the fixpoint the edge set is a forest of stars
    * rooted at component minima, and one more pass of either step
    * reproduces it unchanged — screened by an order-independent
    * (count, hash-sum) witness each round, then CONFIRMED exactly
    * (empty anti-difference) before the fixpoint is trusted.
    *
    * Returns (doc_id, label) for every vertex incident to a pair,
    * label = component minimum — same contract as
    * `connectedComponents` (equivalence property-tested on random
    * graphs in DedupSpec). */
  private[graft] def connectedComponentsStar(
      pairs: DataFrame, maxIters: Int = 25,
      releaseInput: Boolean = false): DataFrame = {
    def sym(e: DataFrame): DataFrame =
      e.union(e.select(col("v").as("u"), col("u").as("v")))
    def largeStar(e: DataFrame): DataFrame = {
      val nb = sym(e)
      val m = nb.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      nb.join(m, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val or = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val m = or.groupBy("u").agg(min(col("v")).as("m"))
      or.join(m, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    // Order-independent change witness: row count + a 31-bit hash sum
    // (31-bit so the Long sum cannot overflow under ANSI arithmetic).
    def witness(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        sum(pmod(xxhash64(col("u"), col("v")), lit((1L << 31) - 1)))).head()
      (r.getLong(0), Option(r.getAs[java.lang.Long](1)).fold(0L)(_.longValue()))
    }
    // Every vertex incident to a pair gets a label — including ones
    // whose only pair is a degenerate self-pair, which the star rounds
    // drop as edges (same contract as `connectedComponents`).
    val verts = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id")))
      .distinct()
      .localCheckpoint(true)
    var edges = pairs
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    if (releaseInput) releaseCheckpoint(pairs)
    var prev = witness(edges)
    var converged = edges.isEmpty
    var iter = 0
    while (!converged && iter < maxIters) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      val cur = witness(next)
      // The (count, hash-sum) witness is NECESSARY but not sufficient —
      // a 31-bit sum can collide (~2^-31/round), and a false fixpoint
      // here would mean silently wrong cluster labels. Confirm claimed
      // fixpoints EXACTLY before trusting them: counts already match,
      // so one empty anti-difference proves set equality. Runs once at
      // the true fixpoint (plus on the vanishingly rare collision),
      // never per ordinary round.
      val isFixpoint = cur == prev &&
        next.exceptAll(edges).isEmpty
      // superseded edge set: free its executor blocks deterministically
      releaseCheckpoint(edges)
      edges = next
      converged = isFixpoint
      prev = cur
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge in $maxIters rounds " +
        "(expected O(log n)); the input edge set may be adversarial")
    lastStarRounds = iter
    // Fixpoint edges are (node, componentMin) stars; roots map to
    // themselves, and vertices with no surviving edge are their own
    // singleton component.
    val fromStars = edges
      .select(col("u").as("doc_id"), col("v").as("label"))
      .union(edges.select(col("v").as("doc_id"), col("v").as("label")))
      .distinct()
    verts.join(fromStars, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("label"))
  }

  /** dedup_cluster_collapse — the step that makes pair-wise dedup
    * actionable at corpus scale: near-dup PAIRS (minhash-LSH, exact
    * verified) are collapsed into duplicate clusters and each cluster
    * reports its canonical (minimum) doc_id and size — the "keep one
    * per cluster" retention rule. Docs in no pair are implicitly their
    * own singleton cluster and are not emitted. Components run the
    * min-label fast path (2-3 rounds on quasi-clique near-dup graphs)
    * with the O(log n) star-contraction variant as the automatic
    * fallback for diameters beyond the round budget. */
  def clusterCollapse(
      spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame =
    connectedComponents(
        minHashLsh(spark, dir, threshold).select("doc_a", "doc_b"),
        releaseInput = true)
      .groupBy(col("label").as("canonical_id"))
      .agg(count(lit(1)).as("cluster_size"))
      .orderBy("canonical_id")

  // ------------------------------------------------------------------
  // Embedding cosine near-dup
  // ------------------------------------------------------------------

  /** dedup_embedding_cosine — pairs with cosine ≥ t, as a distributed
    * DataFrame plan: `Similarity.blockPairs` generates every unordered
    * pair exactly once via a balanced block equi-join (O(B·n) shuffle
    * rows, (n/B)² compare work per group — exactness scales by adding
    * executors), and the codegen'd `cosine_sim` expression scores
    * inside the join filter. Nothing is collected or broadcast: exact
    * threshold similarity on isotropic embeddings is inherently
    * all-pairs, and this is the plan that distributes it. For a
    * sub-quadratic approximate path, use the LSH/IVF bucket joins in
    * `Similarity`. */
  def embeddingCosinePairs(
      spark: SparkSession, dir: String, threshold: Double = 0.46): DataFrame =
    Similarity.cosineThresholdPairs(spark, dir, threshold)

  // ------------------------------------------------------------------
  // Persisted LSH index + incremental probe
  // ------------------------------------------------------------------

  /** dedup_minhash_incremental — the RECURRING-INGEST shape of MinHash
    * LSH: the corpus's banded signature keys are written ONCE to disk
    * as a persisted index table, and each incoming batch computes only
    * its OWN keys and equi-joins the index — the corpus is never
    * re-shingled, re-signed, or re-banded. At 100 TB this is the
    * difference between an O(batch) nightly job and an O(corpus) one;
    * after the probe, appending the batch's keys to the index table
    * (same schema, same write) keeps it current for the next batch.
    * Candidates verify exactly against the candidate documents' shingle
    * sets only (semi-filtered), so the verify cost also tracks the
    * candidate count, not the corpus. Banding is threshold-tuned
    * (`chooseBands`: miss probability ≤ 1e-6 at j = t), same guarantee
    * as the one-shot `minHashLsh`. Emits every (corpus doc, batch doc)
    * pair at jaccard ≥ t. */
  def minhashIndexIncrementalQuery(
      spark: SparkSession, dir: String,
      threshold: Double = 0.8, k: Int = 128): DataFrame = {
    val base = graft.util.Scratch.dir("graft_lshidx")
    // pinnedDocId: a genuine id at/above the re-key offset would merge
    // two documents' shingle sets in the unioned verify relation below.
    val d = docs(spark, dir)
      .select(pinnedDocId(col("doc_id")).as("doc_id"), col("text"))
    val corpus = d.filter(col("doc_id") % 2 === 0)
    val batch = d.filter(col("doc_id") % 2 === 1)
      .union(d.filter(col("doc_id") % 2 === 0 && col("doc_id") < 100)
        .withColumn("doc_id", col("doc_id") + ReKeyOffset))
    val (bands, rows) = chooseBands(threshold, k)
    lshBands(minHashSignaturesOfShingles(shingleArrays(corpus), k),
        bands, rows)
      .write.mode("overwrite").parquet(base.resolve("index").toString)
    val idx = spark.read.parquet(base.resolve("index").toString)
    val probes = lshBands(
      minHashSignaturesOfShingles(shingleArrays(batch), k), bands, rows)
    val cands = idx
      .select(col("band"), col("key"), col("doc_id").as("doc_a"))
      .join(probes.select(col("band"), col("key"),
        col("doc_id").as("doc_b")), Seq("band", "key"))
      .select("doc_a", "doc_b").distinct()
    val sh = shingleArrays(corpus.unionByName(batch))
    jaccardVerifyShingled(sh, cands, threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** dedup_minhash_quantized — the int8-era storage trick applied to
    * the persisted DEDUP index (the sibling of the similarity side's
    * quantized IVF/LSH indexes): band keys in the on-disk index carry
    * NO information beyond equality, so the 64-bit xxhash key column —
    * the only high-entropy (incompressible) column in the index — can
    * be stored as its upper 32 bits. Truncation can only MERGE buckets,
    * never split them, so the candidate set from the quantized index is
    * a provable superset of the full-key candidates, and the exact
    * Jaccard verify removes every extra — the final pair set is
    * IDENTICAL, while the index's dominant column halves. At 100 TB
    * the banded index is `bands`× the corpus's doc count in rows;
    * halving its hot column is the same lever as int8 codes on the
    * vector side, and the extra verify work is bounded by the (tiny)
    * 2^-32-per-bucket collision rate.
    *
    * Emits one row: `n_pairs` (the verified count — hash-checked
    * against the oracle replaying exact Jaccard over the same fixture),
    * `matches_full_index` (quantized-index pairs == full-index pairs),
    * `candidates_superset` (no full-key candidate lost), and
    * `index_bytes_shrunk` (quantized index ≤ 0.7× full bytes). */
  def minhashIndexQuantizedQuery(
      spark: SparkSession, dir: String,
      threshold: Double = 0.8, k: Int = 128): DataFrame = {
    import spark.implicits._
    val base = graft.util.Scratch.dir("graft_lshidx_q")
    val idxF = base.resolve("full").toString
    val idxQ = base.resolve("q32").toString
    val d = docs(spark, dir)
      .select(pinnedDocId(col("doc_id")).as("doc_id"), col("text"))
    val corpus = d.filter(col("doc_id") % 2 === 0)
    val batch = d.filter(col("doc_id") % 2 === 1)
      .union(d.filter(col("doc_id") % 2 === 0 && col("doc_id") < 100)
        .withColumn("doc_id", col("doc_id") + ReKeyOffset))
    val (bands, rows) = chooseBands(threshold, k)
    // Upper 32 bits of the band key — shiftright keeps the value in
    // int range, so the cast is ANSI-safe; equal 64-bit keys always
    // truncate equal, which is what makes the superset claim a
    // theorem rather than a measurement.
    def quantizedKeys(keys: DataFrame): DataFrame =
      keys.select(col("doc_id"), col("band").cast("smallint").as("band"),
        shiftright(col("key"), 32).cast("int").as("key"))
    lshBands(minHashSignaturesOfShingles(shingleArrays(corpus), k),
        bands, rows)
      .write.mode("overwrite").parquet(idxF)
    // Derive the quantized index from the written full index — one
    // signature pass, the quantization is a column projection.
    quantizedKeys(spark.read.parquet(idxF))
      .write.mode("overwrite").parquet(idxQ)
    val probes = lshBands(
        minHashSignaturesOfShingles(shingleArrays(batch), k), bands, rows)
      .localCheckpoint(true)
    def candsOf(idx: DataFrame, pr: DataFrame): DataFrame = idx
      .select(col("band"), col("key"), col("doc_id").as("doc_a"))
      .join(pr.select(col("band"), col("key"), col("doc_id").as("doc_b")),
        Seq("band", "key"))
      .select("doc_a", "doc_b").distinct()
    val candsF = candsOf(spark.read.parquet(idxF), probes)
      .localCheckpoint(true)
    val candsQ = candsOf(spark.read.parquet(idxQ), quantizedKeys(probes))
      .localCheckpoint(true)
    val sh = shingleArrays(corpus.unionByName(batch)).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Pair-set equality witnessed DISTRIBUTED: two symmetric anti-join
      // counts (the lostCandidates pattern) instead of collecting both
      // verified pair sets to the driver — the dup-pair count grows with
      // the corpus, so at 100 TB only these counts may land driver-side.
      def pairsOf(cands: DataFrame): DataFrame =
        jaccardVerifyShingled(sh, cands, threshold)
          .select(col("doc_a"), col("doc_b")).distinct()
          .localCheckpoint(true)
      val pairsF = pairsOf(candsF)
      val pairsQ = pairsOf(candsQ)
      val onlyInFull =
        pairsF.join(pairsQ, Seq("doc_a", "doc_b"), "left_anti").count()
      val onlyInQuant =
        pairsQ.join(pairsF, Seq("doc_a", "doc_b"), "left_anti").count()
      val lostCandidates =
        candsF.join(candsQ, Seq("doc_a", "doc_b"), "left_anti").count()
      val ratio = dirBytes(idxQ).toDouble / dirBytes(idxF)
      Seq((pairsQ.count(),
        onlyInFull == 0L && onlyInQuant == 0L,
        lostCandidates == 0L,
        ratio <= 0.7))
        .toDF("n_pairs", "matches_full_index", "candidates_superset",
          "index_bytes_shrunk")
    } finally sh.unpersist(false)
  }

  /** dedup_index_compact — COMPACTION applied to the persisted LSH
    * index itself: the incremental-ingest pattern
    * ([[minhashIndexIncrementalQuery]]) appends O(batch) band-key files
    * per arrival forever, so the index accumulates the same small-file
    * residue `sink_compact_small_files` fixes for tables — at 100 TB an
    * index touched nightly for a year is thousands of files, and every
    * probe pays the open/footer cost of all of them. The query builds
    * the index as EIGHT small appends (the residue), probes it, then
    * rewrites the whole index to a bounded file count and probes AGAIN
    * with the same batch: candidate sets must be identical (two
    * symmetric anti-join counts — pair-set invariance across
    * compaction is the property that lets an operator compact a live
    * index without a correctness sign-off), rows conserved, and the
    * file count strictly shrunk. The verified pair count is the
    * oracle-replayable number; file counts depend on the writer's
    * parallelism, so they surface as booleans. */
  def lshIndexCompactQuery(
      spark: SparkSession, dir: String,
      threshold: Double = 0.8, k: Int = 128): DataFrame = {
    import spark.implicits._
    val base = graft.util.Scratch.dir("graft_lshidx_compact")
    val idx = base.resolve("index").toString
    val idxC = base.resolve("compacted").toString
    val d = docs(spark, dir)
      .select(pinnedDocId(col("doc_id")).as("doc_id"), col("text"))
    val corpus = d.filter(col("doc_id") % 2 === 0)
    val batch = d.filter(col("doc_id") % 2 === 1)
      .union(d.filter(col("doc_id") % 2 === 0 && col("doc_id") < 100)
        .withColumn("doc_id", col("doc_id") + ReKeyOffset))
    val (bands, rows) = chooseBands(threshold, k)
    // Shingle each relation ONCE and slice/reuse from the checkpointed
    // form: the 8 appends, the probe build, and the final verify all
    // consume the same shingle relations instead of re-tokenizing the
    // corpus per write (was the dominant cost of this query).
    val shCorpus = shingleArrays(corpus).localCheckpoint(true)
    val shBatch = shingleArrays(batch).localCheckpoint(true)
    // Eight small appends — each a separate write, the micro-batch
    // residue a nightly ingest leaves behind.
    (0 until 8).foreach { s =>
      val slice = shCorpus.filter((col("doc_id") / 2) % 8 === s)
      lshBands(minHashSignaturesOfShingles(slice, k), bands, rows)
        .write.mode("append").parquet(idx)
    }
    def parquetFiles(p: String): Long =
      graft.util.FsWalk.parquetFileCount(p)
    val filesBefore = parquetFiles(idx)
    val rowsBefore = spark.read.parquet(idx).count()
    val probes = lshBands(
        minHashSignaturesOfShingles(shBatch, k), bands, rows)
      .localCheckpoint(true)
    def candsOf(p: String): DataFrame = spark.read.parquet(p)
      .select(col("band"), col("key"), col("doc_id").as("doc_a"))
      .join(probes.select(col("band"), col("key"),
        col("doc_id").as("doc_b")), Seq("band", "key"))
      .select("doc_a", "doc_b").distinct()
      .localCheckpoint(true)
    val candsBefore = candsOf(idx)
    // THE COMPACTION: one rewrite of the index to a bounded file
    // count. (A size-thresholded variant would rewrite only oversized
    // bucket groups; the whole-index rewrite is the general case and
    // the invariance witness is identical.)
    spark.read.parquet(idx).repartition(4).write.parquet(idxC)
    val filesAfter = parquetFiles(idxC)
    val rowsAfter = spark.read.parquet(idxC).count()
    val candsAfter = candsOf(idxC)
    val lost =
      candsBefore.join(candsAfter, Seq("doc_a", "doc_b"), "left_anti").count()
    val gained =
      candsAfter.join(candsBefore, Seq("doc_a", "doc_b"), "left_anti").count()
    val sh = shCorpus.unionByName(shBatch)
    val nPairs = jaccardVerifyShingled(sh, candsAfter, threshold).count()
    Seq((nPairs,
      lost == 0L && gained == 0L,
      rowsAfter == rowsBefore,
      filesAfter < filesBefore))
      .toDF("n_pairs", "probe_invariant", "rows_conserved", "files_shrunk")
  }

  /** Total bytes of parquet data files under `p` (recursive). */
  private def dirBytes(p: String): Long = graft.util.FsWalk.parquetBytes(p)

  // ------------------------------------------------------------------
  // Sub-document span dedup
  // ------------------------------------------------------------------

  /** dedup_span_exact — cross-document DUPLICATED-SPAN removal (the
    * C4/RefinedWeb-style step that strips boilerplate repeated across
    * pages, at span rather than whole-document granularity): the corpus
    * is cut into consecutive k-token spans, and every span keeps only
    * its FIRST occurrence in (doc_id, span_index) order — later copies
    * anywhere in the corpus are marked duplicate. Deterministic by
    * construction (lexicographic min over the occurrence set), so an
    * external engine replays it exactly.
    *
    * Scale shape: spans shuffle by a 128-BIT SPAN FINGERPRINT (two
    * independent xxhash64 legs computed map-side; the text never
    * shuffles) once for the first-occurrence aggregate (map-side
    * partial min), then once more joined back — 2 shuffles of
    * (16-byte hash, ids) rows, never of documents or span strings;
    * the span relation is ~n_tokens/k rows regardless of document
    * sizes. Simultaneous collision of both legs (~2^-128 per pair) is
    * ignorable at any corpus size; the text-grouped form survives as
    * the property-test oracle ([[spanKeepMarksByText]]). Trailing
    * partial spans (< k tokens) are not candidates — they stay with
    * their document. Emits the per-document audit (spans, kept,
    * duplicated) for documents with at least one full span. */
  def spanDedup(
      spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    spanDedupOf(docs(spark, dir), k)

  /** The (doc_id, ci, span) chunk relation both keep-mark forms share:
    * consecutive k-token spans, trailing partials excluded. */
  private def spanChunks(docsDf: DataFrame, k: Int): DataFrame = {
    val withTokens = docsDf
      .select(col("doc_id"), TextOps.tokens(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"), size(col("ws")).as("n"))
      .filter(col("n") >= k)
    withTokens
      .select(col("doc_id"),
        explode(sequence(lit(0), (col("n") / k).cast("int") - 1)).as("ci"),
        col("ws"))
      .select(col("doc_id"), col("ci"),
        concat_ws(" ", slice(col("ws"), col("ci") * k + 1, lit(k)))
          .as("span"))
  }

  /** The span-dedup core over any (doc_id, text) frame — per-chunk keep
    * marks, exposed for property tests; [[spanDedup]] aggregates it to
    * the per-document audit. Spans are grouped by a 128-bit fingerprint
    * (two differently-seeded xxhash64 legs — the second prepends a
    * literal, so the legs are distinct but not provably independent;
    * a simultaneous collision of both is negligible in practice, and
    * the text-grouped property-test oracle pins the behavior),
    * computed in the map-side projection so the shuffle rows carry 16
    * bytes of hash instead of the span text. */
  private[graft] def spanKeepMarks(docsDf: DataFrame, k: Int): DataFrame = {
    val hashed = spanChunks(docsDf, k)
      .select(col("doc_id"), col("ci"),
        struct(xxhash64(col("span")).as("h1"),
          xxhash64(lit(1), col("span")).as("h2")).as("_sh"))
    val first = hashed.groupBy("_sh")
      .agg(min(struct(col("doc_id"), col("ci"))).as("first"))
    hashed.join(first, Seq("_sh"))
      .withColumn("keep", col("doc_id") === col("first.doc_id") &&
        col("ci") === col("first.ci"))
      .drop("_sh")
  }

  /** Text-grouped reference form of [[spanKeepMarks]] — identical marks
    * absent a simultaneous collision of both hash legs; kept as the
    * property-test oracle for the fingerprint narrowing. */
  private[graft] def spanKeepMarksByText(docsDf: DataFrame, k: Int): DataFrame = {
    val chunks = spanChunks(docsDf, k)
    val first = chunks.groupBy("span")
      .agg(min(struct(col("doc_id"), col("ci"))).as("first"))
    chunks.join(first, Seq("span"))
      .withColumn("keep", col("doc_id") === col("first.doc_id") &&
        col("ci") === col("first.ci"))
  }

  def spanDedupOf(docsDf: DataFrame, k: Int): DataFrame =
    spanKeepMarks(docsDf, k)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept_spans"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dup_spans"))
      .orderBy("doc_id")

  // ------------------------------------------------------------------
  // Blocked edit-distance dedup (entity resolution)
  // ------------------------------------------------------------------

  /** dedup_edit_distance — near-duplicate NAMES by Levenshtein
    * distance, the entity-resolution flavor of dedup that token-set
    * methods (Jaccard, MinHash) cannot express: "smal widget" vs
    * "small widget" share almost no shingles but sit at distance 1.
    * The quadratic trap is handled by classic BLOCKING: candidates
    * must share a block key (first token) and differ in length by at
    * most the distance threshold (a hard lower bound on edit
    * distance, applied as a cheap codegen'd filter BEFORE the O(n·m)
    * distance). At 100 TB the pair space is Σ block² instead of n² —
    * the standard record-linkage discipline — and the distance runs
    * as Spark's codegen'd THRESHOLDED `levenshtein(a, b, k)` (3.5+'s
    * banded O(k·min(n,m)) DP with early exit; −1 beyond the
    * threshold, which the band predicates respect), so a far-apart
    * candidate pair costs k band cells, not n·m. No UDF. Emits the
    * block / candidate / exact / near counts the oracle replays —
    * the oracle's full-DP distance agrees with the banded form on
    * every value ≤ k, which is all the bands read. */
  def editDistanceDedup(
      spark: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    val p = Relational.table(spark, dir, "part")
      .select(col("p_partkey").as("id"), col("p_name").as("name"))
    editDistanceDedupOf(p, maxDist)
  }

  /** Default per-block cap for the edit-distance self-join. Blocking
    * keys are Zipfian on real-world names (and degenerate on this
    * corpus: 8 first tokens cover every part name — max block 2572
    * rows at sf0.1, ~25K at sf1); one hot block makes the self-join
    * quadratic in that block alone. The same oversized-bucket
    * discipline as [[DefaultLshBucketCap]]: blocks over the cap are
    * EXCLUDED (dropped whole, not truncated) and ACCOUNTED, so the
    * output names what it skipped instead of silently degrading. The
    * cap sits above every block this corpus produces at the tested
    * SFs, so the witness proves the machinery is a no-op exactly when
    * it should be; the adversarial leg (a synthetic hot block that
    * MUST be excluded) is spec-covered where the fixture can be
    * degenerate on purpose. */
  private[graft] val DefaultEditBlockCap = 4096

  /** Blocked edit-distance dedup over an (id, name) relation: block =
    * first token, length-difference prune, thresholded levenshtein,
    * per-block size cap with accounting. One lineage: the block-size
    * window's (blk) exchange is computed once, its partitioning
    * satisfies the self-join, and both join sides reuse it (the same
    * single-lineage discipline as [[lshCandidates]]). */
  private[graft] def editDistanceDedupOf(
      named: DataFrame, maxDist: Int = 3,
      blockCap: Int = DefaultEditBlockCap): DataFrame = {
    val byBlk = org.apache.spark.sql.expressions.Window.partitionBy("blk")
    val p = named
      .select(col("id"), col("name"),
        split(col("name"), " ").getItem(0).as("blk"),
        length(col("name")).as("ln"))
      .withColumn("bsz", count(lit(1)).over(byBlk))
    val acct = p.agg(
      countDistinct(col("blk")).as("n_blocks"),
      max(col("bsz")).as("max_block_size"),
      countDistinct(when(col("bsz") > blockCap, col("blk")))
        .as("n_blocks_capped"),
      sum(when(col("bsz") > blockCap, 1L).otherwise(0L))
        .as("n_rows_excluded"))
    val keep = p.filter(col("bsz") <= blockCap)
    val pairs = keep.as("a").join(keep.as("b"),
        col("a.blk") === col("b.blk") &&
          col("a.id") < col("b.id") &&
          abs(col("a.ln") - col("b.ln")) <= maxDist)
      .select(levenshtein(col("a.name"), col("b.name"), maxDist).as("d"))
    pairs.agg(
      count(lit(1)).as("n_candidate_pairs"),
      sum(when(col("d") === 0, 1L).otherwise(0L)).as("n_exact_name_pairs"),
      sum(when(col("d") >= 1 && col("d") <= maxDist, 1L).otherwise(0L))
        .as("n_near_name_pairs"))
      .crossJoin(acct)
      .select(col("n_blocks"), col("n_candidate_pairs"),
        col("n_exact_name_pairs"), col("n_near_name_pairs"),
        col("max_block_size"), col("n_blocks_capped"),
        col("n_rows_excluded"))
  }

  // ------------------------------------------------------------------
  // Content-defined chunking (CDC)
  // ------------------------------------------------------------------

  /** dedup_cdc_chunks — span dedup over CONTENT-DEFINED chunk
    * boundaries, the storage-dedup discipline (Muthitacharoen et al.
    * 2001, LBFS) applied to training text. [[spanDedup]] above cuts
    * every k tokens, so inserting ONE token early in a document shifts
    * every later boundary and no downstream span matches its twin in
    * the unedited copy. CDC instead cuts AFTER any token whose hash
    * falls in a fixed residue class (here: first md5 nibble = 0, an
    * expected chunk length of 16 tokens), so boundaries are a pure
    * function of local content — an edit perturbs only the chunk it
    * touches and its immediate neighbor, and every other chunk in the
    * edited copy still fingerprint-matches the original. (Production
    * CDC adds min/max chunk bounds; those reintroduce sequential state
    * across the token stream, so this operator keeps the pure
    * hash-residue rule the oracle can replay.)
    *
    * Plan shape at scale: one scan explodes tokens with position; the
    * boundary flag is a codegen'd md5 conditional; chunk ids come from
    * a running sum over the per-document window (state bounded by the
    * longest document, the same bound tokenization itself needs); the
    * chunk rebuild groups on (doc_id, chunk_id), which REUSES the
    * window's doc_id hash partitioning (no second shuffle — Spark's
    * ClusteredDistribution accepts the subset key); and cross-corpus
    * matching groups on the 128-bit chunk fingerprint, so the only
    * corpus-wide shuffle carries md5s + ids, never text. Emits one row
    * per document: chunk count and how many of its chunks are
    * duplicates of an earlier (doc_id, chunk_id) anywhere in the
    * corpus. */
  def cdcChunkDedup(spark: SparkSession, dir: String): DataFrame =
    cdcChunkDedupOf(docs(spark, dir))

  def cdcChunkDedupOf(docsDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docsDf.filter(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("doc_id"), (col("pos") + 1).as("i"), col("tok"),
        when(substring(md5(col("tok")), 1, 1) === "0", 1L)
          .otherwise(0L).as("cut"))
    // chunk_id = number of cut tokens strictly BEFORE this one: the
    // cut token closes its own chunk, the next token opens a new one.
    val wCum = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, -1)
    val asg = tok.withColumn("chunk_id",
      coalesce(sum(col("cut")).over(wCum), lit(0L)))
    // Rebuild each chunk's text in token order without an ordered
    // aggregate: collect (i, tok) structs and sort — i is unique per
    // group, so the struct sort is total and deterministic.
    val chunks = asg.groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_tokens"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("i"), col("tok")))),
            x => x.getField("tok")), " ")).as("chunk_md5"))
    val wOwn = Window.partitionBy("chunk_md5")
      .orderBy(col("doc_id"), col("chunk_id"))
    chunks.withColumn("rn", row_number().over(wOwn))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .orderBy("doc_id")
  }
}
