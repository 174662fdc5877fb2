package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariant tests for the MLlib topic stack (no DuckDB oracle by design —
  * SURVEY.md §5.2: seeded determinism + structural invariants instead).
  */
class TopicPipelineSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val corpus = Seq(
    (0L, "spark query engine runs distributed query plans on clusters"),
    (1L, "query optimizer rewrites logical plans into physical plans"),
    (2L, "cats and dogs play in the garden with a ball"),
    (3L, "the garden has flowers trees and a small pond"),
    (4L, "distributed clusters shuffle data between executor nodes"),
    (5L, "dogs chase the ball across the garden grass"))
    .toDF("doc_id", "text")

  private lazy val fitted = TopicPipeline.fit(corpus,
    TopicPipeline.Config(k = 3, termsPerTopic = 4, nTags = 5))

  test("topic distributions are k-dim probability vectors") {
    val dists = TopicPipeline.topicDistributions(fitted).collect()
    assert(dists.length == 6)
    dists.foreach { r =>
      val d = r.getSeq[Double](1)
      assert(d.size == 3)
      assert(math.abs(d.sum - 1.0) < 1e-6)
      assert(d.forall(p => p >= 0.0 && p <= 1.0))
    }
  }

  test("describeTopics yields termsPerTopic ranked terms per topic from the vocabulary") {
    val tt = TopicPipeline.topicTerms(fitted).collect()
    assert(tt.length == 3 * 4)
    val vocab = fitted.cv.vocabulary.toSet
    tt.foreach { r =>
      assert(vocab.contains(r.getAs[String]("term")))
      assert(r.getAs[Long]("term_rank") >= 1 && r.getAs[Long]("term_rank") <= 4)
    }
    // weights weakly decrease within each topic
    tt.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val ws = rows.sortBy(_.getAs[Long]("term_rank")).map(_.getAs[Double]("weight"))
      assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
    }
  }

  test("tags: every doc gets 1..nTags distinct tags") {
    val tags = TopicPipeline.tags(fitted).collect()
    assert(tags.length == 6)
    tags.foreach { r =>
      val t = r.getSeq[String](1)
      assert(t.nonEmpty && t.size <= 5)
      assert(t.distinct.size == t.size)
    }
  }

  test("seeded LDA refit on the same features is deterministic") {
    // Note: determinism is tested against a FIXED featurization —
    // CountVectorizer breaks equal-count vocabulary ties arbitrarily, so
    // two end-to-end fits can relabel term indices (fine: rows-only checks
    // cover the end-to-end path).
    import org.apache.spark.ml.clustering.LDA
    val lda2 = new LDA().setK(3).setMaxIter(10).setSeed(42L)
      .setOptimizer("online").setFeaturesCol("features")
      .fit(fitted.tokenized)
    assert(lda2.topicsMatrix.toArray.toSeq ==
      fitted.lda.topicsMatrix.toArray.toSeq)
  }

  test("vocabulary honors the cap and maxDF") {
    assert(fitted.cv.vocabulary.length <= 100)
    // 'garden' appears in 3/6 docs (maxDF .8 keeps it); stop words are gone
    assert(!fitted.cv.vocabulary.contains("the"))
  }

  test("NlpPipeline facade produces the full per-doc result relation") {
    val out = graft.NlpPipeline.run(corpus)
    val cols = out.columns.toSet
    assert(Set("doc_id", "cleaned_text", "processed_text", "summary", "tags",
      "compression_ratio", "word_overlap").subsetOf(cols))
    assert(out.count() == 6)
  }
}
