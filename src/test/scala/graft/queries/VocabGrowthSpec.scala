package graft.queries

import graft.SparkSpec
import graft.ops.DedupOps
import org.apache.spark.sql.functions._

/** q140's Heaps-law vocabulary growth: conservation laws on the real
  * fixture (the oracle proves value exactness; these prove the laws a
  * hash can't articulate), plus the first-occurrence attribution by hand
  * on a corpus with DESIGNED saturation — the sf fixtures' shingles are
  * nearly all unique, so repeated-shingle credit would otherwise ride
  * untested.
  */
class VocabGrowthSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("growth curve conserves docs and vocabulary on the fixture") {
    val out = DedupQueries.q140VocabGrowth(spark, dir).collect()
    assert(out.nonEmpty && out.length <= DedupQueries.GrowthBuckets)
    val buckets = out.map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < DedupQueries.GrowthBuckets))
    assert(buckets.sameElements(buckets.sorted), "ordered by bucket")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(out.map(_.getLong(1)).sum === docs.count(), "docs partition the corpus")
    // cum_vocab is the running sum of new_shingles and ends at the
    // corpus-wide distinct shingle count — no shingle double-credited
    val runs = out.scanLeft(0L)((acc, r) => acc + r.getLong(2)).drop(1)
    assert(out.map(_.getLong(3)).sameElements(runs))
    val distinctShingles = DedupOps.shingles(
      docs.select(col("doc_id"),
        graft.ops.TextOps.tokenize(col("text")).as("toks")),
      DedupQueries.ShingleN)
      .select("shingle").distinct().count()
    assert(out.last.getLong(3) === distinctShingles)
  }

  test("per-source uniqueness conserves the vocabulary partition") {
    val out = DedupQueries.q140bSourceVocab(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (vocab, unique, pm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(unique >= 0 && unique <= vocab)
      assert(pm === 1000L * unique / vocab)
    }
    // source-unique shingles across all sources == shingles with exactly
    // one source — counted independently from the raw relation
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val singletons = DedupOps.shingles(
      docs.select(col("doc_id"),
        graft.ops.TextOps.tokenize(col("text")).as("toks")),
      DedupQueries.ShingleN)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), col("shingle")).distinct()
      .groupBy("shingle").count().where(col("count") === 1).count()
    assert(out.map(_.getLong(2)).sum === singletons)
  }

  test("first-occurrence credit: a re-seen shingle adds nothing") {
    import sqlImplicits._
    // docs 0/1 share the identical 5-token window; doc 2 introduces a
    // fresh one. first-seen = min(doc_id), so the shared shingle credits
    // doc 0 only.
    val toks = Seq(
      (0L, Seq("a", "b", "c", "d", "e")),
      (1L, Seq("a", "b", "c", "d", "e")),
      (2L, Seq("f", "g", "h", "i", "j"))
    ).toDF("doc_id", "toks")
    val firstSeen = DedupOps.shingles(toks, DedupQueries.ShingleN)
      .groupBy("shingle").agg(min(col("doc_id")).as("first_doc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(firstSeen === Map("a b c d e" -> 0L, "f g h i j" -> 2L))
  }
}
