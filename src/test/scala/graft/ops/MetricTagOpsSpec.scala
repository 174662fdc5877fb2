package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetricTagOpsSpec extends SparkSpec {
  import sqlImplicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).collect()(0).get(0)

  test("compression ratio with zero-division guard (py:247)") {
    assert(one(MetricOps.compressionRatio(lit("abcd"), lit("ab"))) == 0.5)
    assert(one(MetricOps.compressionRatio(lit(""), lit("ab"))) == 0.0)
  }

  test("word overlap over distinct lowercased tokens (py:250-253)") {
    // orig {a,b,c}, summary {B,c,d} -> |{b,c}|/3
    assert(one(MetricOps.wordOverlap(lit("a b c a"), lit("B c d"))) == 2.0 / 3)
    assert(one(MetricOps.wordOverlap(lit(""), lit("x"))) == 0.0)
  }

  test("avg sentence length counts empty split pieces (py:256-259)") {
    // 'a b. c d.' -> pieces ['a b',' c d',''] = 3 sentences, 4 words
    assert(one(MetricOps.avgSentenceLength(lit("a b. c d."))) == 4.0 / 3)
  }

  test("unigrams+bigrams ngram_range=(1,2) semantics") {
    assert(one(TagOps.unigramsAndBigrams(lit(Array("x", "y", "z")))) ==
      Seq("x", "y", "z", "x y", "y z"))
    assert(one(TagOps.unigramsAndBigrams(lit(Array("x")))) == Seq("x"))
    assert(one(TagOps.unigramsAndBigrams(array().cast("array<string>"))) == Seq())
  }

  test("fallbackTags: tf top-k with (count desc, term asc) ties") {
    val docs = Seq((1L, "zzz zzz aaa aaa bbb")).toDF("doc_id", "text")
    val got = TagOps.fallbackTags(docs, 3)
      .orderBy("tag_rank").select("tag").as[String].collect().toSeq
    // aaa and zzz both tf=2 -> alphabetical; then first bigram by count/term
    assert(got == Seq("aaa", "zzz", "aaa aaa"))
  }

  test("tagFrequency top-N deterministic ordering") {
    val tags = Seq("x", "y", "x", "z", "y", "x").toDF("tag")
    val got = TagOps.tagFrequency(tags, 2).as[(String, Long)].collect().toSeq
    assert(got == Seq(("x", 3L), ("y", 2L)))
  }

  test("diversity = distinct/total (py:271-277)") {
    val tags = Seq("a", "b", "a", "c").toDF("tag")
    val got = TagOps.diversity(tags).as[(Long, Long, Double)].collect()(0)
    assert(got == ((3L, 4L, 0.75)))
  }
}
