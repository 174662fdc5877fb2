package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SummarizeOpsSpec extends SparkSpec {
  import sqlImplicits._

  test("sentence split keeps trimmed >10-char sentences, indexed after filter") {
    val docs = Seq((1L, "Hi. A long enough sentence here! x? Another quite long sentence.")).toDF("doc_id", "text")
    val got = SummarizeOps.sentences(docs).orderBy("sentence_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, "A long enough sentence here"),
      (1L, 1L, "Another quite long sentence")))
  }

  test("sentence split: empty and null docs produce no rows") {
    val docs = Seq((1L, ""), (2L, null), (3L, "tiny. bits")).toDF("doc_id", "text")
    assert(SummarizeOps.sentences(docs).count() == 0)
  }

  test("chunks slices tokens in original order") {
    val docs = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val got = SummarizeOps.chunks(docs, 3).orderBy("sentence_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 0L, "a b c"), (1L, 1L, "d e f"), (1L, 2L, "g")))
  }

  test("extractive summary: identity when n_sentences <= k (py:91-92)") {
    val docs = Seq((1L, "one two three four five six")).toDF("doc_id", "text")
    val sents = SummarizeOps.chunks(docs, 3) // 2 chunks <= k=2
    val got = SummarizeOps.extractiveSummary(docs, sents, 2, " ", "")
      .select("summary").as[String].collect()(0)
    assert(got == "one two three four five six")
  }

  test("extractive summary: select by score, emit by position (T1)") {
    // 3 sentences; s2 scores highest (3 scored terms), s0 second (2 scored,
    // one stop word), s1 lowest (all stop words). Verify the two selected
    // sentences are emitted in document order (s0 before s2) even though s2
    // outranks s0.
    val docs = Seq((1L,
      "alpha beta the " +         // s0: 2 scored terms
      "the of an " +              // s1: score 0
      "zeta unique2 unique3"      // s2: 3 scored terms
      )).toDF("doc_id", "text")
    val sents = SummarizeOps.chunks(docs, 3)
    val got = SummarizeOps.extractiveSummary(docs, sents, 2, " ", "")
      .select("summary").as[String].collect()(0)
    assert(got == "alpha beta the zeta unique2 unique3")
  }

  test("scoreSentences: score 0 for sentences with only stop/short tokens") {
    val sents = Seq((1L, 0L, "the of a an in is"), (1L, 1L, "meaningful words here"))
      .toDF("doc_id", "sentence_id", "sentence")
    val scores = SummarizeOps.scoreSentences(sents)
      .orderBy("sentence_id").as[(Long, Long, String, Long)].collect()
    assert(scores(0)._4 == 0L)
    assert(scores(1)._4 > 0L)
  }
}
