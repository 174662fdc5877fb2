package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gate for the interpolated Kneser-Ney model (q90c): the normalization
  * guarantee Σ_{w2 ∈ vocab} p_KN(w2|w1) = 1 checked in exact BigInt
  * rationals per context, floor-exactness of the engine's integer
  * `p_micro` against those rationals, and the doc-profile contract.
  */
class KnModelSpec extends SparkSpec {
  import sqlImplicits._

  private val texts = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ate the fish"),
    (3L, "a dog sat on a log"),
    (4L, "the dog ate"),
    (5L, "solo"), // 1 token → zero bigrams
    (6L, ""))

  private def docs = texts.toDF("doc_id", "text")

  /** Independent in-memory bigram counts (plain Scala split, no engine
    * code) → (bt, cw1, n1p, ncont, T).
    */
  private def goldenCounts: (Map[(String, String), Long], Map[String, Long],
      Map[String, Long], Map[String, Long], Long) = {
    val bigrams = texts.flatMap { case (_, t) =>
      val w = t.split("\\s+").filter(_.nonEmpty)
      w.zip(w.drop(1))
    }
    val bt = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cw1 = bt.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val n1p = bt.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size.toLong }
    val ncont = bt.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size.toLong }
    (bt, cw1, n1p, ncont, bt.size.toLong)
  }

  test("interpolated KN sums to exactly 1 over the full vocabulary per context") {
    val (bt, cw1, n1p, ncont, t) = goldenCounts
    val vocab = (bt.keys.map(_._1) ++ bt.keys.map(_._2)).toSet
    // p = num/den with num = (4c-3)·T + 3·n1p·ncont for seen bigrams and
    // num = 3·n1p·ncont for unseen (c=0 ⇒ max(c-D,0)=0), den = 4·cw1·T.
    // Sum as exact BigInt rationals over the WHOLE vocab.
    for (w1 <- cw1.keys) {
      val den = BigInt(4) * cw1(w1) * t
      val num = vocab.toSeq.map { w2 =>
        val c = bt.getOrElse((w1, w2), 0L)
        val seen = if (c > 0) (BigInt(4) * c - 3) * t else BigInt(0)
        seen + BigInt(3) * n1p(w1) * BigInt(ncont.getOrElse(w2, 0L))
      }.foldLeft(BigInt(0))(_ + _)
      // Σ ncont over the vocab = T makes the interpolation mass close:
      assert(num == den, s"context '$w1': sum ${num}/${den} != 1")
    }
  }

  test("engine p_micro is the floor of the exact rational for every seen bigram") {
    val (bt, cw1, n1p, ncont, t) = goldenCounts
    val model = TextAnalysisOps.knBigramModel(docs)
      .select("w1", "w2", "btf", "p_micro").collect()
    assert(model.length == bt.size)
    model.foreach { r =>
      val (w1, w2) = (r.getString(0), r.getString(1))
      val c = bt((w1, w2))
      assert(r.getLong(2) == c)
      val num = BigInt(1000000) * ((BigInt(4) * c - 3) * t +
        BigInt(3) * n1p(w1) * ncont(w2))
      val den = BigInt(4) * cw1(w1) * t
      assert(BigInt(r.getLong(3)) == num / den,
        s"($w1,$w2): ${r.getLong(3)} != floor($num/$den)")
    }
  }

  test("doc profile: bigram totals, zero rows for short docs, min over transitions") {
    val prof = TextAnalysisOps.knSurprisal(docs)
      .orderBy("doc_id").collect()
    assert(prof.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    val byId = prof.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byId(5L) == ((0L, 0L, 0L))) // single token: no bigrams
    assert(byId(6L) == ((0L, 0L, 0L))) // empty text
    assert(byId(1L)._1 == 5L) // "the cat sat on the mat" → 5 bigrams
    // every profile's sum is ≥ n_bigrams × its min (consistency)
    prof.filter(_.getLong(1) > 0).foreach { r =>
      assert(r.getLong(2) >= r.getLong(1) * r.getLong(3))
      assert(r.getLong(3) > 0L) // seen bigrams always carry positive mass
    }
  }
}
