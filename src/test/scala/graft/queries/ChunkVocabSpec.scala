package graft.queries

import graft.SparkSpec
import graft.ops.{DedupOps, TextOps}
import org.apache.spark.sql.functions._

/** q151 chunk-cluster and q152 incremental-vocabulary laws. The oracles
  * prove value exactness; these prove the structures: cluster canonicals
  * are self-labeled minima, a paragraph syndicated across documents
  * lands in ONE cluster, and the incremental vocabulary algebra agrees
  * with a from-scratch Spark computation (the third leg beside the
  * DuckDB from-scratch oracle).
  */
class ChunkVocabSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q151: canonicals are self-labeled minima; labels idempotent under decomposition") {
    val out = DedupQueries.q151ChunkClusters(spark, dir).collect()
    assert(out.nonEmpty)
    val cidOf = (d: Long, c: Long) => d * DedupQueries.ChunkKeyBase + c
    val labels = out.map(r => cidOf(r.getLong(0), r.getLong(1)) ->
      cidOf(r.getLong(2), r.getLong(3))).toMap
    out.foreach { r =>
      val cid = cidOf(r.getLong(0), r.getLong(1))
      val lab = cidOf(r.getLong(2), r.getLong(3))
      assert(lab <= cid, "canonical is the component minimum")
      assert(r.getBoolean(4) === (cid != lab))
      assert(labels(lab) === lab, "the canonical labels itself")
    }
  }

  test("q151: a syndicated paragraph clusters across documents") {
    import sqlImplicits._
    // docs 0 and 1 carry the IDENTICAL 64-token paragraph (identical
    // chunks -> identical signatures -> collision is CERTAIN, not
    // probabilistic — a sub-identity Jaccard pair collides only with
    // banding probability and would make this unit flaky); doc 2 is
    // disjoint. The near-dup (non-identical) regime is covered by the
    // q151 oracle at fixture scale.
    val para = (1 to 64).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (0L, "s", para),
      (1L, "s", para),
      (2L, "s", (1 to 64).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "source", "text")
    import CurationQueries.{ChunkSize, ChunkStride}
    val chunks = graft.ops.TextAnalysisOps.contextChunks(
      docs, ChunkSize, ChunkStride)
      .select((col("doc_id") * DedupQueries.ChunkKeyBase + col("chunk_id"))
        .as("cid"), col("chunk").as("toks"))
    val pairs = DedupOps.minhashPairs(
      DedupOps.minhashSignatures(
        DedupOps.shingles(chunks, DedupQueries.ShingleN, idCol = "cid"),
        idCol = "cid"),
      rowsPerBand = 4, DedupQueries.MinhashMinMicro, idCol = "cid")
    val labels = DedupOps.duplicateClusters(
      chunks.select(col("cid")), pairs, idCol = "cid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val crossDoc = labels.exists { case (cid, lab) =>
      cid / DedupQueries.ChunkKeyBase != lab / DedupQueries.ChunkKeyBase
    }
    assert(crossDoc, s"the shared paragraph must cluster across docs: $labels")
    val doc2 = labels.filter(_._1 / DedupQueries.ChunkKeyBase == 2L)
    assert(doc2.forall { case (cid, lab) =>
      lab / DedupQueries.ChunkKeyBase == 2L
    }, "the disjoint doc stays in its own clusters")
  }

  test("q154: the savings report conserves q151's label relation") {
    val report = DedupQueries.q154ChunkSavings(spark, dir).collect().head
    val labels = DedupQueries.q151ChunkClusters(spark, dir).collect()
    assert(report.getLong(0) === labels.length.toLong, "chunks_total")
    assert(report.getLong(1) === labels.count(_.getBoolean(4)).toLong,
      "chunks_removed == duplicate-labeled chunks")
    assert(report.getLong(3) <= report.getLong(2))
    assert(report.getLong(4) ===
      1000L * report.getLong(3) / report.getLong(2))
  }

  test("q152: incremental algebra agrees with a from-scratch Spark computation") {
    import CurationQueries.Snapshots
    val incremental = DedupQueries.q152IncrementalVocab(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val b = spark.read.parquet(s"$dir/documents.parquet")
      .where(Snapshots.inB)
      .select(col("doc_id"), col("source"), Snapshots.textB.as("text"))
    val ss = DedupOps.shingles(
      b.select(col("doc_id"), TextOps.tokenize(col("text")).as("toks")),
      DedupQueries.ShingleN)
      .join(b.select("doc_id", "source"), "doc_id")
      .select("source", "shingle").distinct()
    val spread = ss.groupBy("shingle").agg(count(lit(1)).as("n_sources"))
    val scratch = ss.join(spread, "shingle").groupBy("source")
      .agg(count(lit(1)).as("vocab"),
        sum(when(col("n_sources") === 1, 1L).otherwise(0L)).as("unique_vocab"))
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        1000L * r.getLong(2) / r.getLong(1)))
    assert(incremental.sameElements(scratch),
      "delta-applied state must land exactly on the from-scratch stats")
    // the delta is genuinely non-trivial on this fixture: B drops docs,
    // adds docs, and rewrites every doc_id % 4 == 0 text
    val a = spark.read.parquet(s"$dir/documents.parquet").where(Snapshots.inA)
    assert(a.join(b, Seq("doc_id"), "left_anti").count() > 0, "removals exist")
    assert(b.join(a, Seq("doc_id"), "left_anti").count() > 0, "additions exist")
  }
}
