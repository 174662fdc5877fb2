package graft.ops

import graft.SparkSpec

/** Quantitative gate for the JL projection rung (q29e): recall@5 against
  * the exact q29 baseline on the fixture, and the overfetch dial's
  * monotone recall improvement. The fixture's uniform-random embeddings
  * are JL's worst case (pairwise cosines concentrate near 0), so these
  * floors are conservative for real clustered embeddings.
  */
class JlRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def topSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("recall@5 vs brute force meets the registry overfetch's floor, " +
      "and grows monotonically with overfetch") {
    val e = graft.Tables.embeddings(spark, dir)
    val brute = topSet(SimilarityOps.bruteForceTopK(e, 50, 5))
    def recall(of: Int): Double =
      (brute & topSet(SimilarityOps.jlTopK(e, 50, 5, of))).size.toDouble / brute.size
    val r20 = recall(graft.queries.SimilarityQueries.JlOverfetch)
    assert(r20 >= 0.5, s"registry-overfetch recall $r20 below floor")
    val r5 = recall(5)
    val r40 = recall(40)
    assert(r5 < r20 && r20 < r40,
      s"overfetch dial not monotone: $r5 / $r20 / $r40")
    assert(r40 >= 0.8, s"overfetch-40 recall $r40 below floor")
  }

  test("projection is the fixed Rademacher matrix: 16x64, ±1 only, seeded") {
    val m = SimilarityOps.JlMatrix
    assert(m.length == SimilarityOps.JlOutDims)
    assert(m.forall(_.length == 64))
    assert(m.flatten.forall(s => s == 1 || s == -1))
    // regenerating from the documented seed reproduces it bit-for-bit
    val r = new scala.util.Random(42)
    val again = IndexedSeq.fill(SimilarityOps.JlOutDims, 64)(
      if (r.nextBoolean()) 1 else -1)
    assert(m == again)
  }
}
