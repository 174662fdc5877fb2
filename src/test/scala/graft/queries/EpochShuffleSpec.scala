package graft.queries

import graft.SparkSpec

/** q137 contract: each epoch is a true permutation, epochs genuinely
  * differ, and the whole schedule is deterministic (resume = recompute).
  */
class EpochShuffleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows =
    CurationQueries.q137EpochShuffle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  private def posByDoc(epoch: Long): Map[Long, Long] =
    rows.filter(_._1 == epoch).map(t => t._2 -> t._3).toMap

  test("each epoch is a true permutation of 0..n-1 over the full corpus") {
    val n = graft.Tables.documents(spark, dir).count()
    (0L until CurationQueries.ShuffleEpochs).foreach { e =>
      val ps = rows.filter(_._1 == e).map(_._3)
      assert(ps.length === n)
      assert(ps.sorted.toSeq === (0L until n), s"epoch $e positions")
    }
  }

  test("epochs produce substantially different orders") {
    val (p0, p1) = (posByDoc(0), posByDoc(1))
    val same = p0.count { case (d, p) => p1(d) == p }
    // a keyed hash gives ~1/n fixed points in expectation; 10% is a loose
    // ceiling that still catches an epoch key that fails to enter the hash
    assert(same <= p0.size / 10,
      s"$same of ${p0.size} docs kept their position across epochs")
  }

  test("the schedule is deterministic across recomputation") {
    val again = CurationQueries.q137EpochShuffle(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq === rows.toSeq)
  }
}
