package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Units for the q133 family: integer second moments, the Jacobi
  * eigensolver, and ZCA whitening's identity-covariance contract.
  */
class WhiteningSpec extends SparkSpec {

  private val D = 4
  private val N = 200

  /** Deterministic correlated sample: x2 leans on x1, x3 anti-leans on
    * x1 — so the raw covariance has strong off-diagonal mass for the
    * whitener to remove.
    */
  private lazy val raw: Seq[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(N) {
      val x1 = rnd.nextGaussian() * 0.5
      val x2 = 0.6 * x1 + rnd.nextGaussian() * 0.2
      val x3 = -0.4 * x1 + rnd.nextGaussian() * 0.3
      val x4 = rnd.nextGaussian() * 0.1 + 0.2
      Array(x1, x2, x3, x4)
    }
  }

  private lazy val df = {
    import sqlImplicits._
    raw.zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toFloat).toSeq) }
      .toDF("vec_id", "embedding")
  }

  test("secondMoments equals the locally computed integer statistics") {
    // quantize exactly as the op does: floor(double(float) * 1000)
    val q = raw.map(_.map(x => math.floor(x.toFloat.toDouble * 1000).toLong))
    val got = SimilarityOps.secondMoments(df)
      .orderBy("dim_i", "dim_j").collect()
    assert(got.length === D * (D + 1) / 2)
    got.foreach { r =>
      val (i, j) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1)
      assert(r.getLong(2) === N.toLong)
      assert(r.getLong(3) === q.map(_(i)).sum, s"s_i at ($i,$j)")
      assert(r.getLong(4) === q.map(_(j)).sum, s"s_j at ($i,$j)")
      assert(r.getLong(5) === q.map(v => v(i) * v(j)).sum, s"dot at ($i,$j)")
    }
  }

  test("jacobi reproduces A v = lambda v and reconstructs A") {
    val a = Array(
      Array(4.0, 1.0, 0.5, 0.0),
      Array(1.0, 3.0, 0.0, -0.2),
      Array(0.5, 0.0, 2.0, 0.3),
      Array(0.0, -0.2, 0.3, 1.0))
    val (values, vectors) = Eigen.jacobi(a)
    for (k <- 0 until 4; i <- 0 until 4) {
      val av = (0 until 4).map(j => a(i)(j) * vectors(j)(k)).sum
      assert(math.abs(av - values(k) * vectors(i)(k)) < 1e-9,
        s"A v = lambda v broken at k=$k i=$i")
    }
    for (i <- 0 until 4; j <- 0 until 4) {
      val rec = (0 until 4).map(k => vectors(i)(k) * values(k) * vectors(j)(k)).sum
      assert(math.abs(rec - a(i)(j)) < 1e-9, s"V L Vt != A at ($i,$j)")
    }
  }

  test("whitened corpus has identity covariance") {
    val white = SimilarityOps.whiten(df).orderBy("vec_id").collect()
      .map(_.getSeq[Double](1).toArray)
    assert(white.length === N)
    val mean = Array.tabulate(D)(i => white.map(_(i)).sum / N)
    for (i <- 0 until D; j <- i until D) {
      val c = white.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / N
      val want = if (i == j) 1.0 else 0.0
      // tolerance covers the QuantScale=1000 estimation error: W comes
      // from quantized stats but is applied to the unquantized floats
      assert(math.abs(c - want) < 0.05, s"cov($i,$j) = $c")
    }
  }

  test("rank-deficient input (duplicated dim) whitens without NaN") {
    import sqlImplicits._
    // dim 2 == dim 1 exactly: covariance is singular, one eigenvalue ~0
    // (possibly a few ulps negative out of Jacobi) — the λ clamp keeps
    // the scale finite
    val dup = raw.zipWithIndex.map { case (v, i) =>
      (i.toLong, Seq(v(0).toFloat, v(1).toFloat, v(1).toFloat, v(3).toFloat))
    }.toDF("vec_id", "embedding")
    val white = SimilarityOps.whiten(dup).collect()
      .flatMap(_.getSeq[Double](1))
    assert(white.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("whitening preserves row identity and dimensionality") {
    val white = SimilarityOps.whiten(df)
    assert(white.count() === N.toLong)
    assert(white.select(size(col("white"))).distinct().collect()
      .map(_.getInt(0)).toSeq === Seq(D))
  }
}
