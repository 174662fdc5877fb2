package graft.queries

import graft.SparkSpec

/** q153's dashboard laws: the oracle proves the counts; these pin the
  * ordering facts the recall specs established — multi-probe dominates
  * single-probe LSH by construction (it probes a superset of buckets),
  * and every rung's hits are bounded by the brute-force possible set.
  */
class AnnRecallSpec extends SparkSpec {

  test("multiprobe dominates lsh; hits bounded; one shared possible") {
    val out = SimilarityQueries.q153AnnRecall(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet === Set("jl", "lsh", "multiprobe"))
    val possibles = out.values.map(_._2).toSet
    assert(possibles.size === 1, "one brute-force denominator")
    out.foreach { case (rung, (hits, possible, pm)) =>
      assert(hits >= 0 && hits <= possible, rung)
      assert(pm === 1000L * hits / possible, rung)
    }
    assert(out("multiprobe")._1 >= out("lsh")._1,
      "multi-probe probes a superset of single-probe's buckets")
  }
}
