package graft.ops

import graft.SparkSpec

/** Gate for SimilarityOps.labelDispersion (q93b): the linear-plan
  * (‖Σu‖²−Σ‖u‖²)/2 identity checked against an independent in-memory
  * O(n²) pairwise evaluation, plus the degenerate shapes (identical
  * vectors, antipodal pairs, singleton groups) where the answer is known
  * in closed form.
  */
class DispersionSpec extends SparkSpec {
  import sqlImplicits._

  private def quantize(v: Seq[Float]): Seq[Long] = {
    val nrm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble))
    v.map(x => math.floor(1e6 * (x.toDouble / nrm)).toLong)
  }

  private def goldenPairDot(vs: Seq[Seq[Float]]): BigInt = {
    val us = vs.map(quantize)
    (for {
      i <- us.indices; j <- us.indices if i < j
    } yield us(i).zip(us(j)).map { case (a, b) => BigInt(a) * b }
      .foldLeft(BigInt(0))(_ + _)).foldLeft(BigInt(0))(_ + _)
  }

  private def df(rows: Seq[(Long, Seq[Float], Int)]) =
    rows.toDF("vec_id", "embedding", "label")

  test("identity matches the O(n²) pairwise golden on mixed vectors") {
    val rnd = new scala.util.Random(7)
    val vs = Seq.fill(40)(Seq.fill(8)(rnd.nextFloat() * 2f - 1f))
    val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v, i % 3) }
    val out = SimilarityOps.labelDispersion(df(rows))
      .orderBy("label").collect()
    assert(out.length == 3)
    out.foreach { r =>
      val lbl = r.getLong(0)
      val members = rows.filter(_._3 == lbl).map(_._2)
      assert(r.getLong(1) == members.size)
      assert(r.getLong(2) == members.size.toLong * (members.size - 1) / 2)
      assert(BigInt(r.getLong(3)) == goldenPairDot(members),
        s"label $lbl pair_dot mismatch")
    }
  }

  test("identical vectors: every pair dot equals the self dot") {
    val v = Seq(3f, -4f, 0f, 12f)
    val u = quantize(v)
    val selfDot = u.map(x => BigInt(x) * x).foldLeft(BigInt(0))(_ + _)
    val rows = (0 until 5).map(i => (i.toLong, v, 0))
    val out = SimilarityOps.labelDispersion(df(rows)).collect().head
    assert(out.getLong(2) == 10L)
    assert(BigInt(out.getLong(3)) == selfDot * 10)
  }

  test("antipodal pair sums to the negative self dot; singleton group is zero") {
    val v = Seq(1f, 2f, -3f)
    val rows = Seq((0L, v, 0), (1L, v.map(-_), 0), (2L, v, 1))
    val out = SimilarityOps.labelDispersion(df(rows))
      .orderBy("label").collect()
    val u = quantize(v)
    val w = quantize(v.map(-_))
    val cross = u.zip(w).map { case (a, b) => BigInt(a) * b }
      .foldLeft(BigInt(0))(_ + _)
    assert(out(0).getLong(2) == 1L && BigInt(out(0).getLong(3)) == cross)
    assert(cross < 0)
    assert(out(1).getLong(2) == 0L && out(1).getLong(3) == 0L)
  }
}
