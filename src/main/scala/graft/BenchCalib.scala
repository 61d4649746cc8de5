package graft

/** Pure calibration / contention-self-defense logic for [[Bench]],
  * extracted so a spec can exercise it with synthetic timings.
  *
  * The bench interleaves a fixed calibration probe (q1_agg — a plain
  * scan+aggregate whose code rarely changes) through the sweep. Until
  * round 10 the probes were normalized against a FROZEN idle-host
  * constant (0.40s, measured rounds 6-8), which meant a faster host
  * could never flag late-run contention: its absolute ratio sat below
  * 1 even while the run's own probes disagreed with each other 2×.
  * The reference is now derived from the run itself — the run's own
  * best probe is what "idle" means on this host today — and the frozen
  * number survives only as (a) an absolute sanity floor against
  * measurement flukes and (b) an informational cross-round ratio. */
object BenchCalib {

  /** Absolute floor for the run-derived reference: a probe below this
    * is a measurement fluke (cached fragment, clock step), not a real
    * q1_agg execution, and dividing by it would turn ordinary jitter
    * into phantom "contention". */
  val SanityFloorSec = 0.05

  /** Historical idle-host best for q1_agg at sf0.1 / local[32]
    * (best-of-idle across rounds 6-10). Informational only — emitted
    * as `calib_abs_ratio` so rounds on the same host class stay
    * comparable — never used to DECIDE contention. */
  val HistoricalIdleRef = 0.40

  /** The run's own best-of-idle probe, floored. */
  def calibRef(probes: Seq[Double]): Double =
    math.max(probes.min, SanityFloorSec)

  /** Intra-run spread: worst probe vs the run's own best, direction-
    * blind. Informational only since round 12 — the committed r11 run
    * showed why it cannot DECIDE contention: probes (0.301, 0.307,
    * 0.212) spread 1.45× purely because the END of the run was the
    * fastest part, i.e. residual JVM warm-up on a steady host, one
    * tick below the old 1.5 contended threshold. */
  def driftRatio(probes: Seq[Double]): Double =
    probes.max / calibRef(probes)

  /** Directional drift: the worst slowdown of a LATER probe over any
    * EARLIER one (floored at 1). This is the shape that actually
    * invalidates per-query timings — the host got slower while the
    * sweep ran. The warm-up shape (later probes faster) scores ≈1:
    * earlier measurements were if anything inflated, and best-of-two
    * passes already absorbs that. */
  def riseRatio(probes: Seq[Double]): Double = {
    val rises = for {
      i <- probes.indices; j <- (i + 1) until probes.size
    } yield probes(j) / math.max(probes(i), SanityFloorSec)
    (1.0 +: rises).max
  }

  /** Median probe vs the historical constant — the old cross-round
    * absolute view, kept for the JSON but decision-free. */
  def absRatio(probes: Seq[Double]): Double = {
    val sorted = probes.sorted
    sorted(sorted.size / 2) / HistoricalIdleRef
  }

  /** A run whose probes got 1.5× SLOWER over its course is not
    * producing trustworthy per-query timings, whatever its absolute
    * speed. Decided on the directional ratio: pure warm-up (fast
    * finish) is not contention. */
  def contended(probes: Seq[Double]): Boolean = riseRatio(probes) > 1.5

  /** Re-time threshold vs the persisted previous-run reference:
    * tighter when this run's own probes already show drift, so a
    * mildly-contended run re-checks more of its outliers. */
  def suspectFactor(drift: Double): Double = if (drift > 1.25) 1.5 else 2.5

  /** Queries slower than `suspectFactor × previous run × hostRatio` —
    * the ones the sweep re-times once more at the end, past any
    * transient. `hostRatio` (default 1) is the host-class shuffle
    * normalization from [[hostShuffleRatio]]: when the persisted
    * reference was measured on a shuffle-faster host class, every
    * shuffle-heavy query reads uniformly slower here with no code
    * change (the r17 attribution: scans AT reference, shuffle class
    * ~1.5×), and an unnormalized gate would mislabel the whole class
    * as contention victims and waste a rerun on each. */
  def suspects(
      twoPass: Seq[(String, Double)],
      refTimes: Map[String, Double],
      drift: Double,
      maxSuspects: Int = 12,
      hostRatio: Double = 1.0): Seq[(String, Double)] = {
    val factor = suspectFactor(drift) * hostRatio
    twoPass.filter { case (name, t) =>
      refTimes.get(name).exists(prev => t > factor * prev)
    }.sortBy(-_._2).take(maxSuspects)
  }

  /** Best (min) stamped `__calib_shuffle__` probe of a persisted
    * reference, None when unstamped or at another scale factor — the
    * reference host's shuffle-class signature, which is what this
    * run's own shuffle probes are compared against. */
  def parseShuffleRef(txt: String, sfDir: String): Option[Double] = {
    val stamp = """"__sf__":"([^"]*)"""".r.findFirstMatchIn(txt)
      .map(_.group(1))
    if (!stamp.contains(sfDir)) None
    else """"__calib_shuffle__":\[([0-9.eE+,-]+)\]""".r
      .findFirstMatchIn(txt)
      .map(_.group(1).split(',').map(_.toDouble).min)
      .filter(_ > 0.0)
  }

  /** Host-class shuffle ratio for the suspect gate (r18, the formal
    * re-baseline the r17 attribution called for): this host's best
    * shuffle probe over the reference host's stamped best, clamped to
    * [1, 3]. Floored at 1 — a shuffle-FASTER host must not tighten
    * thresholds below the reference (best-of-2 noise would flood the
    * suspect list); capped at 3 so a grossly contended run still
    * flags its victims (genuine contention also inflates the probe,
    * but it inflates the calib probes too, which decide `contended`
    * independently of this gate). With no usable reference the ratio
    * is 1 and the gate behaves exactly as before. */
  def hostShuffleRatio(thisBest: Double, refBest: Option[Double]): Double =
    refBest.fold(1.0) { r =>
      math.min(math.max(thisBest / math.max(r, SanityFloorSec), 1.0), 3.0)
    }

  /** Parse a persisted BENCH_LOCAL_LAST body into per-query reference
    * times. Empty when the `__sf__` stamp is absent or names another
    * scale factor — cross-scale references are never comparable (an
    * sf0.01 reference would flag every sf0.1 query as a suspect). */
  def parseReference(txt: String, sfDir: String): Map[String, Double] = {
    val stamp = """"__sf__":"([^"]*)"""".r.findFirstMatchIn(txt).map(_.group(1))
    if (!stamp.contains(sfDir)) Map.empty
    else """"([^"]+)":([0-9.]+)""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble)
      // "__"-prefixed keys are run metadata (calib stamps), never
      // query references.
      .filterNot(_._1.startsWith("__")).toMap
  }
}
