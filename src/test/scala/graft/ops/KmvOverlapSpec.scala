package graft.ops

import graft.SparkSpec

/** Gate for DedupOps.sourceOverlapKmv (q127): exact-regime agreement with
  * an in-memory set computation, the estimator regime under a small k
  * (sketch strictly smaller than the sets), and KMV's union/intersection
  * composition invariants.
  */
class KmvOverlapSpec extends SparkSpec {
  import sqlImplicits._

  // three sources with engineered overlap: A and B share half their
  // shingles, C is disjoint
  private def corpus = {
    def doc(id: Long, src: String, words: Seq[String]) =
      (id, src, words.mkString(" "))
    val shared = (0 until 40).map(i => s"shared$i")
    val aOnly = (0 until 40).map(i => s"aa$i")
    val bOnly = (0 until 40).map(i => s"bb$i")
    val cOnly = (0 until 40).map(i => s"cc$i")
    Seq(
      doc(1L, "A", shared ++ aOnly),
      doc(2L, "B", shared ++ bOnly),
      doc(3L, "C", cOnly)).toDF("doc_id", "source", "text")
  }

  private def goldenSets(n: Int): Map[String, Set[String]] =
    corpus.collect().map { r =>
      val toks = r.getString(2).split("\\s+").filter(_.nonEmpty)
      r.getString(1) -> toks.sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSet
    }.toMap

  test("exact regime (k >= unions): counts equal the true set algebra") {
    val out = DedupOps.sourceOverlapKmv(corpus, n = 3, k = 4096)
      .orderBy("src_a", "src_b").collect()
    val g = goldenSets(3)
    assert(out.length == 3) // AB, AC, BC
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (sa, sb) = (g(a), g(b))
      assert(r.getLong(2) == sa.size, s"$a n_a")
      assert(r.getLong(3) == sb.size, s"$b n_b")
      assert(r.getLong(4) == (sa ++ sb).size, s"$a-$b k_used")
      assert(r.getLong(5) == (sa & sb).size, s"$a-$b n_inter")
      assert(r.getLong(6) ==
        1000000L * (sa & sb).size / (sa ++ sb).size, s"$a-$b jaccard")
    }
  }

  test("estimator regime (small k): k_used capped at k, estimates bounded") {
    val k = 16
    val out = DedupOps.sourceOverlapKmv(corpus, n = 3, k = k)
      .orderBy("src_a", "src_b").collect()
    out.foreach { r =>
      assert(r.getLong(2) <= k && r.getLong(3) <= k)
      assert(r.getLong(4) <= k)
      assert(r.getLong(5) <= r.getLong(4))
      assert(r.getLong(6) >= 0L && r.getLong(6) <= 1000000L)
    }
    // disjoint pair stays an exact zero at ANY k: no shared hash can
    // enter the union sketch
    val ac = out.find(r => r.getString(0) == "A" && r.getString(1) == "C").get
    assert(ac.getLong(5) == 0L && ac.getLong(6) == 0L)
  }

  test("overlapping pair estimates a substantially nonzero Jaccard at small k") {
    val ab = DedupOps.sourceOverlapKmv(corpus, n = 3, k = 32)
      .where("src_a = 'A' AND src_b = 'B'").collect().head
    val g = goldenSets(3)
    val trueJ = 1e6 * (g("A") & g("B")).size / (g("A") ++ g("B")).size
    // KMV error at k=32 is ~1/sqrt(32) ≈ 18%; assert within 3 sigma
    assert(math.abs(ab.getLong(6) - trueJ) < 3 * trueJ / math.sqrt(32),
      s"est ${ab.getLong(6)} vs true $trueJ")
  }
}
