package graft

import org.scalatest.funsuite.AnyFunSuite

/** Synthetic-timing coverage for the bench's contention self-defense
  * (BenchCalib) — the logic is pure so the spec needs no SparkSession. */
class BenchCalibSpec extends AnyFunSuite {

  test("steady host is not contended regardless of absolute speed") {
    // A host 2× faster than the historical 0.40s reference, probes in
    // agreement: under the frozen-reference scheme this run could never
    // flag anything; under the run-derived scheme it is simply idle.
    val fastIdle = Seq(0.20, 0.21, 0.22, 0.20)
    assert(BenchCalib.driftRatio(fastIdle) < 1.25)
    assert(!BenchCalib.contended(fastIdle))
    assert(BenchCalib.suspectFactor(BenchCalib.driftRatio(fastIdle)) == 2.5)
  }

  test("fast host with late-run contention is flagged (r10 blind spot)") {
    // Same fast host, but the tail probes ran 3× slow — the exact case
    // the frozen 0.40 denominator hid (median/0.40 = 0.55/0.40 ≈ 1.4
    // would have needed 1.5; worse, [0.20,0.21,0.55] gave 0.21/0.40 =
    // 0.525 under the old median rule — invisible).
    val lateContended = Seq(0.20, 0.21, 0.55, 0.60)
    assert(BenchCalib.driftRatio(lateContended) > 1.5)
    assert(BenchCalib.riseRatio(lateContended) > 1.5)
    assert(BenchCalib.contended(lateContended))
  }

  test("warm-up shape (fast finish) is spread, not contention (r11 false alarm)") {
    // The committed r11 run's own probes: B=0.301, C=0.307, D=0.212 —
    // max/min spread 1.45, one tick under the old threshold, on a host
    // that merely finished warming up. No later probe is slower than
    // any earlier one beyond noise, so the directional ratio stays ≈1
    // and the run is not contended; the spread remains visible.
    val r11 = Seq(0.301, 0.307, 0.212)
    assert(BenchCalib.driftRatio(r11) > 1.4)        // spread: informational
    assert(BenchCalib.riseRatio(r11) < 1.1)         // decision: healthy
    assert(!BenchCalib.contended(r11))
    // A mirror-image run (slow finish, same spread) IS contended.
    assert(BenchCalib.contended(r11.reverse :+ 0.32))
  }

  test("riseRatio floors at 1 and ignores fluke denominators") {
    assert(BenchCalib.riseRatio(Seq(0.5, 0.4, 0.3)) == 1.0)
    // A fluke 1ms early probe must not turn an ordinary later probe
    // into a phantom 300× rise: the denominator is floored.
    assert(BenchCalib.riseRatio(Seq(0.001, 0.30)) ==
      0.30 / BenchCalib.SanityFloorSec)
  }

  test("mild drift tightens the suspect factor") {
    val mild = Seq(0.30, 0.30, 0.42) // 1.4× drift: not contended, but wary
    val drift = BenchCalib.driftRatio(mild)
    assert(!BenchCalib.contended(mild))
    assert(BenchCalib.suspectFactor(drift) == 1.5)
  }

  test("suspects compare against the previous run under the drift-scaled factor") {
    val prev = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    val now = Seq("a" -> 1.6, "b" -> 2.8, "c" -> 1.1, "new_query" -> 9.9)
    // Idle run (factor 2.5): only the 2.8× query is suspect; queries
    // with no reference (new this round) are never suspects.
    assert(BenchCalib.suspects(now, prev, drift = 1.0).map(_._1) == Seq("b"))
    // Drifting run (factor 1.5): the 1.6× query joins, ordered slowest
    // first.
    assert(BenchCalib.suspects(now, prev, drift = 1.3).map(_._1) == Seq("b", "a"))
  }

  test("suspect list is capped") {
    val prev = (1 to 40).map(i => s"q$i" -> 1.0).toMap
    val now = (1 to 40).map(i => s"q$i" -> 3.0)
    assert(BenchCalib.suspects(now, prev, drift = 1.0).size == 12)
  }

  test("calibRef floors measurement flukes") {
    assert(BenchCalib.calibRef(Seq(0.001, 0.30, 0.31)) == BenchCalib.SanityFloorSec)
    // ...so a fluke min cannot manufacture phantom contention on its
    // own, but genuinely ragged probes above the floor still can.
    assert(BenchCalib.calibRef(Seq(0.30, 0.31, 0.33)) == 0.30)
  }

  test("reference parsing honors the __sf__ stamp") {
    val body = """{"__sf__":"/root/testdata/sf0.1","q1_agg":0.412,"dedup_exact":1.250}"""
    val same = BenchCalib.parseReference(body, "/root/testdata/sf0.1")
    assert(same("q1_agg") == 0.412 && same("dedup_exact") == 1.25)
    // Another scale factor, or a legacy unstamped file, yields no
    // reference at all rather than a cross-scale comparison.
    assert(BenchCalib.parseReference(body, "/root/testdata/sf0.01").isEmpty)
    assert(BenchCalib.parseReference("""{"q1_agg":0.412}""", "/root/testdata/sf0.1").isEmpty)
  }

  test("host shuffle ratio scales the suspect gate (r18 host-class " +
      "re-baseline) and never tightens it") {
    // Reference measured on a shuffle-faster host: its stamped best
    // probe 0.5s, this host probes 1.0s -> ratio 2. A query uniformly
    // 2x slower from the host class alone is NOT a suspect; a genuine
    // outlier beyond factor*ratio still is.
    val body = """{"__sf__":"/root/testdata/sf0.1",""" +
      """"__calib_shuffle__":[1.885,0.500,0.546],"q1_agg":0.412}"""
    val refBest = BenchCalib.parseShuffleRef(body, "/root/testdata/sf0.1")
    assert(refBest.contains(0.5))
    // Stamp scoped to the scale factor, like query references.
    assert(BenchCalib.parseShuffleRef(body, "/x").isEmpty)
    assert(BenchCalib.hostShuffleRatio(1.0, refBest) == 2.0)
    // Floor: a shuffle-FASTER host keeps the gate at the reference.
    assert(BenchCalib.hostShuffleRatio(0.25, refBest) == 1.0)
    // Cap: a grossly inflated probe cannot blind the gate entirely.
    assert(BenchCalib.hostShuffleRatio(5.0, refBest) == 3.0)
    // No reference -> ratio 1, gate unchanged.
    assert(BenchCalib.hostShuffleRatio(1.0, None) == 1.0)
    val prev = Map("shufq" -> 1.0, "outlier" -> 1.0)
    val now = Seq("shufq" -> 2.8, "outlier" -> 5.5)
    assert(BenchCalib.suspects(now, prev, drift = 1.0,
      hostRatio = 2.0).map(_._1) == Seq("outlier"))
    // Unnormalized, the host-class query would have been mislabeled.
    assert(BenchCalib.suspects(now, prev, drift = 1.0)
      .map(_._1).toSet == Set("shufq", "outlier"))
  }

  test("class-scoped gate: a 2x CPU-class regression flags on a " +
      "hostRatio-3 host while the shuffle class stays unflagged (r19)") {
    // The r18 masking hazard: hostShuffleRatio (here 3) multiplied
    // EVERY query's threshold, so a CPU-class code regression of up
    // to 3 x 2.5 went unflagged on a shuffle-slow host. Class-scoped,
    // the CPU query compares under the CPU ratio (1.0 here — the CPU
    // probes measured AT reference, exactly the r17/r18 attribution
    // shape) and its genuine 2.6x regression flags, while the
    // host-class 2.8x shuffle query stays exonerated.
    assert(BenchCalib.isCpuClass("q1_agg"))
    assert(BenchCalib.isCpuClass("multimodal_jpeg_roundtrip"))
    assert(BenchCalib.isCpuClass("text_repetition"))
    assert(!BenchCalib.isCpuClass("text_inverted_index")) // writes an index
    assert(!BenchCalib.isCpuClass("sessionize"))
    assert(!BenchCalib.isCpuClass("stream_late_drop"))
    val prev = Map("type_cast" -> 1.0, "sessionize" -> 1.0)
    val now = Seq("type_cast" -> 2.6, "sessionize" -> 2.8)
    assert(BenchCalib.suspects(now, prev, drift = 1.0,
      hostRatio = 3.0, cpuRatio = 1.0).map(_._1) == Seq("type_cast"))
    // A CPU ratio at its 1.5 cap still flags a gross CPU regression
    // (2.5 x 1.5 = 3.75) without granting the shuffle class's 3x room.
    assert(BenchCalib.suspects(Seq("type_cast" -> 4.0), prev,
      drift = 1.0, hostRatio = 3.0, cpuRatio = 1.5).map(_._1) ==
      Seq("type_cast"))
    assert(BenchCalib.hostCpuRatio(3.0, Some(1.0)) == 1.5) // capped
    assert(BenchCalib.hostCpuRatio(0.5, Some(1.0)) == 1.0) // floored
  }

  test("probe references compare like positions: the fully-warm " +
      "end-of-run probe is excluded from both sides (ADVICE r18)") {
    // The committed r18 file's shuffle probes were [2.020,1.063,0.584]
    // (cold, mid, fully-warm end). This run's pre-gate minimum is
    // min(cold, mid) — comparing it against the reference's min over
    // ALL THREE (0.584) read ~1.8 on the identical host and loosened
    // the gate spuriously. Like positions: min(2.020, 1.063) = 1.063.
    val body = """{"__sf__":"/root/testdata/sf0.1",""" +
      """"__calib__":[0.434,0.316,0.316,0.199],""" +
      """"__calib_shuffle__":[2.020,1.063,0.584],"q1_agg":0.412}"""
    assert(BenchCalib.parseShuffleRef(body, "/root/testdata/sf0.1")
      .contains(1.063))
    // CPU reference: warm mid-run probes B,C (positions 1,2) — not
    // the warm-up A, not the end-of-run D.
    assert(BenchCalib.parseCpuRef(body, "/root/testdata/sf0.1")
      .contains(0.316))
    // On the identical host the like-position ratio reads ~1.
    assert(BenchCalib.hostShuffleRatio(1.05,
      BenchCalib.parseShuffleRef(body, "/root/testdata/sf0.1")) < 1.05)
  }

  test("corrupted probe stamps are skipped per token, never thrown " +
      "on (ADVICE r18)") {
    // '1.2.3' and '+' match the permissive regex but fail toDouble —
    // the parser must skip them, not crash the bench run.
    val corrupt = """{"__sf__":"/root/testdata/sf0.1",""" +
      """"__calib_shuffle__":[1.2.3,0.700,+],"q1_agg":0.412}"""
    assert(BenchCalib.parseShuffleRef(corrupt, "/root/testdata/sf0.1")
      .contains(0.7))
    // All tokens corrupt -> no reference, gate ratio 1.
    val allBad = """{"__sf__":"/root/testdata/sf0.1",""" +
      """"__calib_shuffle__":[+,-],"q1_agg":0.412}"""
    assert(BenchCalib.parseShuffleRef(allBad, "/root/testdata/sf0.1").isEmpty)
  }

  test("SPARK_GRAFT_CONF tokens must be k=v; malformed tokens fail " +
      "loudly (ADVICE r18)") {
    assert(BenchCalib.parseConfTokens(
      "spark.io.compression.codec=zstd; spark.a.b=1m ") ==
      Seq("spark.io.compression.codec" -> "zstd", "spark.a.b" -> "1m"))
    // Empty value is expressible; missing '=' or empty key is not.
    assert(BenchCalib.parseConfTokens("k=") == Seq("k" -> ""))
    intercept[IllegalArgumentException] {
      BenchCalib.parseConfTokens("spark.typo.noequals")
    }
    intercept[IllegalArgumentException] {
      BenchCalib.parseConfTokens("=v")
    }
  }

  test("reference parsing skips __-prefixed calib stamps (r17: the " +
      "truncation-proof calib copy rides the same file)") {
    val body = """{"__sf__":"/root/testdata/sf0.1",""" +
      """"__calib__":[0.300,0.210,0.220,0.215],""" +
      """"__calib_ratio__":1.048,"__calib_abs_ratio__":0.537,""" +
      """"__contended__":false,"q1_agg":0.412}"""
    val ref = BenchCalib.parseReference(body, "/root/testdata/sf0.1")
    assert(ref == Map("q1_agg" -> 0.412),
      s"calib stamps must not become query references: $ref")
  }
}
