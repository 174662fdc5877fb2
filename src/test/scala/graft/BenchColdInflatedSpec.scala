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
}
