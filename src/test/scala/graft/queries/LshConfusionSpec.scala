package graft.queries

import graft.SparkSpec
import graft.ops.DedupOps
import org.apache.spark.sql.functions._

/** q144's blocking-confusion audit: set-algebra invariants on the fixture
  * (the oracle proves the values; these prove the containments), plus the
  * one analytic certainty worth pinning — IDENTICAL documents have
  * identical MinHash signatures, so banding can never miss an exact
  * duplicate pair regardless of seed or banding layout.
  */
class LshConfusionSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("tiers nest: thresholded ⊆ banding, tp ≤ min(candidates, truth)") {
    val out = DedupQueries.q144LshConfusion(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet === Set("banding", "thresholded"))
    val (bc, btr, btp) = out("banding")
    val (tc, ttr, ttp) = out("thresholded")
    assert(btr === ttr, "one truth relation")
    assert(tc <= bc, "thresholding only removes candidates")
    assert(ttp <= btp, "and only removes true positives")
    assert(btp <= math.min(bc, btr) && ttp <= math.min(tc, ttr))
  }

  test("identical docs always collide: banding recall is total on exact duplicates") {
    import sqlImplicits._
    val body = (1 to 40).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"tok$i").mkString(" ")
    val toks = Seq((0L, body), (1L, body), (2L, other))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.ops.TextOps.tokenize(col("text")).as("toks"))
    val sh = DedupOps.shingles(toks, DedupQueries.ShingleN)
    val cand = DedupOps.minhashPairs(
      DedupOps.minhashSignatures(sh), rowsPerBand = 4, minEstMicro = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cand.exists { case (a, b, est) =>
      a == 0L && b == 1L && est == 1000000L
    }, "the identical pair collides with full signature agreement")
    assert(!cand.exists { case (a, b, _) => b == 2L || a == 2L },
      "the disjoint doc shares no band key")
  }
}
