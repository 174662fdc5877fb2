package graft.typed

import graft.SparkSpec

/** The typed facade must agree with the untyped operators it wraps. */
class TypedPipelineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("typed load/clean/summarize/metrics round-trips the fixture") {
    val docs = TypedPipeline.load(spark, dir)
    assert(docs.head().n_chars == docs.head().text.length)

    val cleaned = TypedPipeline.clean(docs)
    val c = cleaned.head()
    assert(c.tokens.nonEmpty)
    assert(c.tokens.forall(t => t.length > 2))

    val summaries = TypedPipeline.summarize(docs)
    assert(summaries.count() == docs.count())

    val m = TypedPipeline.metrics(docs, summaries)
    val row = m.head()
    assert(row.compression_ratio > 0.0 && row.compression_ratio <= 1.0)
  }
}
