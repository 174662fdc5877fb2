package graft.ops

import graft.SparkSpec
import graft.queries.{CurationQueries, DedupQueries}
import org.apache.spark.sql.functions._

/** Micro-fixtures and fixture-level invariants for the round-5 additions:
  * unigram rarity (q70), context chunking (q69), canonical-form dedup
  * (q24b), snapshot delta (q71).
  */
class RarityAndRefreshSpec extends SparkSpec {
  import sqlImplicits._

  private val dir = "/root/testdata/sf0.001"

  test("unigramRarity computes exact integer rarity signals") {
    // corpus counts: a=3, b=1, c=1, d=1
    val docs = Seq((1L, "a a b c"), (2L, "a d"), (3L, "")).toDF("doc_id", "text")
    val r = TextAnalysisOps.unigramRarity(docs).orderBy("doc_id").collect()
    // doc 1: 4 tokens, 3 distinct; hapax instances b,c; all ctf<=3;
    // sum_log2 = 2 instances of a (msb(3)=1) + 0 + 0 = 2
    assert(r(0).getAs[Long]("n_tokens") == 4)
    assert(r(0).getAs[Long]("n_distinct") == 3)
    assert(r(0).getAs[Long]("n_hapax") == 2)
    assert(r(0).getAs[Long]("n_rare") == 4)
    assert(r(0).getAs[Long]("min_ctf") == 1)
    assert(r(0).getAs[Long]("sum_log2_ctf") == 2)
    // doc 2: hapax d only; sum_log2 = msb(3) + msb(1) = 1
    assert(r(1).getAs[Long]("n_tokens") == 2)
    assert(r(1).getAs[Long]("n_hapax") == 1)
    assert(r(1).getAs[Long]("sum_log2_ctf") == 1)
    // doc 3: empty -> all-zero row survives the left join
    assert(r(2).getAs[Long]("n_tokens") == 0)
    assert(r(2).getAs[Long]("min_ctf") == 0)
  }

  test("context chunks cover every token exactly once per window step") {
    val chunks = CurationQueries.q69ContextChunks(spark, dir)
    val toks = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(TextOps.tokenize(col("text"))).cast("long").as("n"))
    val byDoc = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"),
      max(col("chunk_id")).as("max_id"),
      min(col("chunk_id")).as("min_id"),
      max(col("start_token") + col("n_tokens")).as("covered"),
      max(when(col("chunk_id") =!= col("start_token") / CurationQueries.ChunkStride,
        1).otherwise(0)).as("bad_id"))
    val joined = byDoc.join(toks, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { row =>
      // chunk ids are 0..n_chunks-1, start = id*stride, and the furthest
      // window end reaches exactly the last token
      assert(row.getAs[Long]("min_id") == 0L)
      assert(row.getAs[Long]("max_id") == row.getAs[Long]("n_chunks") - 1)
      assert(row.getAs[Int]("bad_id") == 0)
      assert(row.getAs[Long]("covered") == row.getAs[Long]("n"))
    }
    // every window holds exactly min(ChunkSize, n - start) tokens: full
    // until the doc runs out, partial only at the tail
    val badLen = chunks.join(toks, "doc_id")
      .where(col("n_tokens") =!=
        least(lit(CurationQueries.ChunkSize.toLong), col("n") - col("start_token")))
      .count()
    assert(badLen == 0)
  }

  test("canonical-form dedup groups case/punct/spacing variants") {
    val docs = Seq(
      (1L, "Hello,   World!"),
      (2L, "hello world"),
      (3L, "HELLO WORLD."), // period survives preprocess -> distinct group
      (4L, "something else")).toDF("doc_id", "text")
    val out = DedupOps.exactDuplicates(
      docs.select(col("doc_id"), TextOps.preprocess(col("text")).as("canon")),
      textCol = "canon").orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("canonical_id") == 1L)
    assert(out(0).getAs[Long]("group_size") == 2L)
    assert(out(1).getAs[Long]("canonical_id") == 1L)
    assert(out(1).getAs[Boolean]("is_duplicate"))
    assert(out(2).getAs[Long]("group_size") == 1L)
    assert(!out(2).getAs[Boolean]("is_duplicate"))
  }

  test("centroidOutliers ranks by exact integer distance to the label centroid") {
    val vecs = Seq(
      (1L, Seq(0.0f, 0.0f), 0),
      (2L, Seq(0.001f, 0.001f), 0),
      (3L, Seq(1.0f, 1.0f), 0),
      (9L, Seq(0.5f, -0.5f), 1)) // singleton label: its own centroid, dist 0
      .toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.centroidOutliers(vecs, k = 2)
      .orderBy("label", "rank").collect()
    // label 0 quantizes to [0,0],[1,1],[1000,1000]; centroid floor(1001/3)=333
    assert(out(0).getAs[Long]("vec_id") == 3L)
    assert(out(0).getAs[Long]("dist2") == 2L * 667 * 667)
    assert(out(1).getAs[Long]("vec_id") == 1L)
    assert(out(1).getAs[Long]("dist2") == 2L * 333 * 333)
    assert(out(2).getAs[Long]("vec_id") == 9L)
    assert(out(2).getAs[Long]("dist2") == 0L)
  }

  test("snapshot delta classifies against independently derived classes") {
    val ids = graft.Tables.documents(spark, dir)
      .select("doc_id").as[Long].collect().toSet
    def expected(id: Long): Option[String] = {
      val inA = id % 10 < 8
      val inB = id % 10 >= 2
      (inA, inB) match {
        case (false, true)  => Some("added")
        case (true, false)  => Some("deleted")
        case (true, true)   => Some(if (id % 4 == 0) "updated" else "unchanged")
        case (false, false) => None
      }
    }
    val want = ids.toSeq.flatMap(id => expected(id).map(id -> _)).toMap
    val got = CurationQueries.q71SnapshotDelta(spark, dir)
      .select("doc_id", "change", "kept").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("change"), r.getAs[Boolean]("kept"))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (change, kept)) =>
      assert(change == want(id), s"doc $id")
      assert(kept == (change != "deleted"), s"doc $id kept flag")
    }
  }

  private def stageDocs(rows: (Long, String, String)*): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-docs").toString
    rows.toSeq.map { case (id, src, text) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("q83 drift is zero for identical snapshots, exact for shift and rewrite") {
    // q71's snapshot carving: A = id%10<8 (original), B = id%10>=2 (docs
    // with id%4==0 rewritten with ' [rev2]').
    // X: ids 2,3 live in BOTH snapshots unrewritten -> identical
    //    distributions, drift 0.
    // Y: id 1 is A-only ("a a"), id 9 B-only ("b b") -> full shift:
    //    drift = |2*2-0| + |0-2*2| = 8.
    // Z: id 4 is in both but REWRITTEN in B ("x y" -> "x y [rev2]"):
    //    tot_a=2, tot_b=3; per term x: |1·3-1·2|=1, y: 1, [rev2]:
    //    |0-1·2|=2 -> drift 4 — the rewritten token shows up as B-side
    //    drift.
    val dir = stageDocs(
      (2L, "X", "a b"), (3L, "X", "a b"),
      (1L, "Y", "a a"), (9L, "Y", "b b"),
      (4L, "Z", "x y"))
    val got = graft.queries.AnalysisQueries.q83DistributionDrift(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("X") == (4L, 4L, 2L, 0L))
    assert(got("Y") == (2L, 2L, 2L, 8L))
    assert(got("Z") == (2L, 3L, 3L, 4L))
  }

  test("bigramFamiliarity profiles word-order rarity over bigram instances") {
    // bigram instances: doc1 {a b, b a, a b}, doc2 {a b, b c}, doc3 none;
    // corpus ctf: "a b"=3, "b a"=1, "b c"=1
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x"))
      .toDF("doc_id", "text")
    val r = TextAnalysisOps.bigramFamiliarity(docs).orderBy("doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6)))
    assert(r(0) == ((1L, 3L, 2L, 1L, 3L, 1L, 2L))) // 2·msb(3) + msb(1)
    assert(r(1) == ((2L, 2L, 2L, 1L, 2L, 1L, 1L)))
    assert(r(2) == ((3L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("q84 keeps the highest-quality doc of a near-dup cluster") {
    // docs 1-2 share 3 of 6 5-gram shingles (Jaccard 0.5 >= 0.3) -> one
    // cluster; doc 2 has MORE distinct tokens, so quality retention keeps
    // it while min-id retention (q55/q50b) would keep doc 1. doc 3 is its
    // own cluster and always kept.
    val dir = stageDocs(
      (1L, "S", "a b c d e f g x"),
      (2L, "S", "a b c d e f g h i"),
      (3L, "S", "p q r s t"))
    val got = DedupQueries.q84ClusterBest(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got(1L) == (1L, 8L, false))
    assert(got(2L) == (1L, 9L, true))
    assert(got(3L) == (3L, 5L, true))
  }

  test("q82 affected bins account for exactly the flagged delete set") {
    // flags are content-hash-derived; recompute them independently and
    // check the affected-bin roll-up totals them without loss
    val dir = "/root/testdata/sf0.001"
    val flagged = graft.Tables.documents(spark, dir)
      .where(HashOps.charHash(col("text")) %
        CurationQueries.DeleteHashMod === 0L)
      .count()
    val out = CurationQueries.q82DeletionImpact(spark, dir).collect()
    assert(out.map(_.getAs[Long]("n_deleted")).sum == flagged && flagged > 0)
    assert(out.forall(_.getAs[Long]("n_deleted") > 0))
    assert(out.forall(r =>
      r.getAs[Long]("deleted_tokens") <= r.getAs[Long]("bin_tokens")))
  }
}
