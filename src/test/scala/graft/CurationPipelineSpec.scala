package graft

import org.apache.spark.sql.functions._

/** Behavioral tests for the composite curation flow on synthetic corpora
  * (exercises cases the clean fixture can't: PII, junk, exact and
  * near duplicates).
  */
class CurationPipelineSpec extends SparkSpec {
  import sqlImplicits._

  test("curate: redacts PII, drops junk, removes exact and near duplicates") {
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val docs = Seq(
      (1L, base),                                  // survives
      (2L, base),                                  // exact dup of 1 -> dropped
      (3L, base + " kilo"),                        // near-dup of 1 (J > .5) -> dropped
      (4L, "zz xx"),                               // too few tokens -> dropped
      (5L, "one two three four five six seven"),   // survives
      (6L, "mail me at a.user@example.com please somebody somewhere today"))
      .toDF("doc_id", "text")
    val out = CurationPipeline.curate(docs).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 5L, 6L))
    val redacted = out.find(_.getLong(0) == 6L).get.getString(1)
    assert(redacted.contains("<EMAIL>") && !redacted.contains("example.com"))
  }

  test("curate keeps near-duplicate-free corpora intact") {
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg"),
      (2L, "hh ii jj kk ll mm nn"),
      (3L, "oo pp qq rr ss tt uu"))
      .toDF("doc_id", "text")
    assert(CurationPipeline.curate(docs).count() == 3)
  }

  test("near-dup drop is deterministic: larger id of each pair goes") {
    val t = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = Seq((10L, t), (7L, t + " w9")).toDF("doc_id", "text")
    val kept = CurationPipeline.curate(docs).collect().map(_.getLong(0)).toSet
    assert(kept == Set(7L)) // 10 near-dups the smaller id 7 -> dropped
  }
}
