package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates the cold_inflated self-report channel (the r10 finding: the
  * driver's cold pass read 927.9 s vs a clean same-code 426.1 s and
  * nothing in the artifact marked it). The rule replays the actual r10
  * divergence rows against the clean run's numbers and must flag exactly
  * the interference-hit ones.
  */
class BenchColdInflatedSpec extends AnyFunSuite {

  test("parseQueriesCold pulls the cold vector out of a bench line") {
    val line = """{"metric":"total","value":1.0,"unit":"sec","cold_total":2.0,""" +
      """"queries":{"qa":0.1},"queries_cold":{"qa":0.5,"qb":3.25,"qc":-1.0},""" +
      """"noisy":[],"sf":"x"}"""
    val m = Bench.parseQueriesCold(line)
    assert(m === Map("qa" -> 0.5, "qb" -> 3.25, "qc" -> -1.0))
    assert(Bench.parseQueriesCold("not json at all") === Map.empty)
    assert(Bench.parseQueriesCold("""{"queries_cold":{}}""") === Map.empty)
    // json.dumps-style spacing (the reference file may be rewritten by a
    // JSON library, not only by Bench itself)
    assert(Bench.parseQueriesCold(
      """{"queries_cold": {"qa": 0.5, "qb": 3.25}}""") ===
      Map("qa" -> 0.5, "qb" -> 3.25))
    // scientific notation with negative exponents (Double.toString of a
    // sub-millisecond time) parses, and one bad value skips that entry
    // instead of zeroing the whole map
    assert(Bench.parseQueriesCold(
      """{"queries_cold":{"qa":5.0E-4,"qb":1e-05,"qc":2.0}}""") ===
      Map("qa" -> 5.0e-4, "qb" -> 1e-5, "qc" -> 2.0))
  }

  test("replaying the r10 driver cold numbers against the clean run flags " +
      "exactly the interference rows") {
    // clean-run reference (builder's same-code run, SCALING.md r10 row)
    val ref = Map(
      "q127_kmv_overlap" -> 3.2,
      "q04_summary_metrics" -> 3.9,
      "q117_dynamic_sessions" -> 1.4,
      "q98_incremental_rollup" -> 0.25,
      "q01_clean_tokens" -> 0.6)
    // driver artifact's cold rows: three interference-hit, two honest
    val driverCold = Seq(
      "q127_kmv_overlap" -> 111.9, // 35x - the starkest r10 row
      "q04_summary_metrics" -> 61.7, // 16x
      "q117_dynamic_sessions" -> 51.4, // 37x
      "q98_incremental_rollup" -> 0.29, // inflated ratio but under floor
      "q01_clean_tokens" -> 0.7) // 1.2x - honest
    assert(Bench.coldInflatedOf(driverCold, ref) ===
      Seq("q127_kmv_overlap", "q04_summary_metrics", "q117_dynamic_sessions"))
  }

  test("new queries without a reference row are never flagged") {
    assert(Bench.coldInflatedOf(Seq("q999_new" -> 100.0), Map.empty) === Nil)
    // a failed reference row (-1) never flags either
    assert(Bench.coldInflatedOf(
      Seq("qa" -> 100.0), Map("qa" -> -1.0)) === Nil)
  }

  test("parseQueriesWarm pulls the warm vector, not the cold one") {
    val line = """{"metric":"total","queries":{"qa":0.4,"qb":1.5},""" +
      """"queries_cold":{"qa":9.9,"qb":9.9}}"""
    assert(Bench.parseQueriesWarm(line) === Map("qa" -> 0.4, "qb" -> 1.5))
  }

  test("warm_vs_ref flags the r12 uniformly-loaded window and nothing else") {
    // 20 reference rows spread over realistic magnitudes
    val ref = (1 to 20).map(i => s"q$i" -> (0.2 + 0.1 * i)).toMap
    def inflate(f: Double, jitter: Double = 0.0) =
      ref.toSeq.map { case (k, v) =>
        k -> v * (f + jitter * (k.hashCode % 7 - 3) / 100.0) }
    // the r12 s1 window: everything ~1.28x with small scatter -> flagged
    val Some(w) = Bench.warmVsRef(inflate(1.28, jitter = 1.0), ref)
    assert(w.loadedHost && w.n == 20 && w.median > 1.2 && w.dispersion < 0.35,
      s"uniform 1.28x window not flagged: $w")
    // a clean run sits near 1.0 -> not flagged either way
    val Some(wClean) = Bench.warmVsRef(inflate(1.0, jitter = 1.0), ref)
    assert(!wClean.loadedHost && !wClean.mixedWindow && wClean.median < 1.1)
    // ONE real 5x regression on a clean run: median stays ~1 -> the
    // channel stays quiet (that row belongs to per-query ratio review,
    // not a host claim)
    val spiked = inflate(1.0).map { case (k, v) =>
      if (k == "q7") k -> v * 5 else k -> v }
    val Some(wSpike) = Bench.warmVsRef(spiked, ref)
    assert(!wSpike.loadedHost)
    // high median WITH high dispersion (half the queries 2x, half 1x) is
    // NOT a uniform-load claim
    val bimodal = ref.toSeq.zipWithIndex.map { case ((k, v), i) =>
      k -> (if (i % 2 == 0) v * 2.2 else v) }
    Bench.warmVsRef(bimodal, ref).foreach { w2 =>
      assert(!w2.loadedHost,
        s"bimodal run misread as loaded host (disp=${w2.dispersion})")
    }
    // tiny reference rows (< 0.1 s) are excluded from the basis
    val tinyRef = Map("qa" -> 0.01)
    assert(Bench.warmVsRef(Seq("qa" -> 0.2), tinyRef).isEmpty)
    // fewer than 10 common rows (filtered run / no ref) -> no claim
    assert(Bench.warmVsRef(Seq("qa" -> 1.0), Map("qa" -> 1.0)).isEmpty)
    assert(Bench.warmVsRef(inflate(1.28), Map.empty).isEmpty)
  }

  test("warm_vs_ref marks the r13 moderate-load profile as mixed_window " +
      "and publishes quartiles") {
    // the r13 judge/driver runs: median ~1.05-1.07, dispersion ~0.45-0.47,
    // a contiguous block of rows at 3-4x — passed as clean under
    // loaded_host alone. Reconstruct that shape: most rows near 1.0,
    // the top quarter spread 1.4-4x.
    val ref = (1 to 20).map(i => s"q$i" -> 1.0).toMap
    val mixedRun = (1 to 20).map { i =>
      val r =
        if (i <= 10) 0.95 + 0.01 * i   // lower half ~0.96-1.05
        else if (i <= 15) 1.05 + 0.03 * (i - 10) // mid 1.08-1.2
        else 1.4 + 0.6 * (i - 15)      // top quarter 2.0-4.4 (the window)
      s"q$i" -> r
    }
    val Some(w) = Bench.warmVsRef(mixedRun, ref)
    assert(w.median <= 1.2 && !w.loadedHost)
    assert(w.mixedWindow,
      s"moderate-load window passed as clean: $w")
    assert(w.q3 > 1.3 && w.q1 < 1.1, s"quartiles off: $w")
    // a genuinely clean run with mild scatter does NOT flag
    val clean = (1 to 20).map(i => s"q$i" -> (0.9 + 0.015 * i))
    val Some(wc) = Bench.warmVsRef(clean, ref)
    assert(!wc.mixedWindow && !wc.loadedHost, s"clean run flagged: $wc")
    // a window WORSE than r13's — median above 1.2 but with high
    // dispersion (60% of rows 1.2-3x) — must not fall between the two
    // flags: not uniform enough for loaded_host, so mixed_window owns it
    val worse = (1 to 20).map { i =>
      s"q$i" -> (if (i <= 8) 1.0 else 1.2 + 0.15 * (i - 8))
    }
    val Some(ww) = Bench.warmVsRef(worse, ref)
    assert(!ww.loadedHost && ww.median > 1.2 && ww.mixedWindow,
      s"high-median high-dispersion window unflagged: $ww")
  }

  test("warmInflatedOf flags warm mins above 3x their own cold control " +
      "and the retry rule clears a transient row") {
    val cold = Map("qa" -> 1.0, "qb" -> 1.0, "qc" -> 0.2, "qd" -> 1.0)
    // qa transiently inflated, qb honest, qc under the 0.3 s cold floor,
    // qd failed (-1) never flags
    val mins = Seq("qa" -> 3.5, "qb" -> 1.2, "qc" -> 2.0, "qd" -> -1.0)
    assert(Bench.warmInflatedOf(mins, cold) === Seq("qa"))
    // the in-run retry contract: min-of-three; a clearing retry drops the
    // row from the post-retry list, a reproducing one keeps it
    val cleared = mins.map { case ("qa", _) => "qa" -> math.min(3.5, 0.9)
                             case kv => kv }
    assert(Bench.warmInflatedOf(cleared, cold) === Nil)
    val persistent = mins.map { case ("qa", _) => "qa" -> math.min(3.5, 3.4)
                                case kv => kv }
    assert(Bench.warmInflatedOf(persistent, cold) === Seq("qa"))
  }
}
