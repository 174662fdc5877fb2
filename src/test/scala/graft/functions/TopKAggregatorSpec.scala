package graft.functions

import graft.SparkSpec
import graft.ops.SimilarityOps

/** The typed bounded-heap top-k aggregator must agree exactly with the
  * window row_number formulation (same tie rules).
  */
class TopKAggregatorSpec extends SparkSpec {
  import sqlImplicits._

  test("heap semantics: keeps k best, ties keep the smaller id") {
    import TopKAggregator._
    val agg = new TopK(3)
    val all = Seq(Scored(5, 10), Scored(1, 50), Scored(9, 50),
      Scored(2, 30), Scored(7, 10), Scored(3, 30))
    val buf = all.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) == Seq(Scored(1, 50), Scored(9, 50), Scored(2, 30)))
    // merge path: split input across two buffers
    val (l, r) = all.splitAt(3)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged) == Seq(Scored(1, 50), Scored(9, 50), Scored(2, 30)))
  }

  test("aggregator kNN equals window kNN on the fixture") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val win = SimilarityOps.bruteForceTopK(emb, 50, 5)
      .orderBy("query_id", "rk").collect().map(_.toSeq).toSeq
    val agg = SimilarityOps.bruteForceTopKAgg(emb, 50, 5)
      .orderBy("query_id", "rk").collect().map(_.toSeq).toSeq
    assert(agg == win)
  }
}
