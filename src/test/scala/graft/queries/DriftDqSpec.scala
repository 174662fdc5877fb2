package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q155 drift and q156 DQ non-vacuity: the fixture is clean (every q156
  * violation count is zero) and its drift is whatever the carve yields —
  * these units plant KNOWN degradation and KNOWN violations so each rule
  * is proven to fire.
  */
class DriftDqSpec extends SparkSpec {

  test("q155: fixture drift rows are arithmetic-consistent and cover shared sources") {
    val out = AnalysisQueries.q155QualityDrift(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(2) <= 1000)
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 1000)
      assert(r.getLong(5) === r.getLong(4) - r.getLong(2), "drift_pm identity")
    }
  }

  test("q155/q170: the stored-reference path equals the from-scratch recompute") {
    // merge ≡ recompute, the q172b/StoredPairsSpec pattern: the registry
    // paths read snapshot A's stored artifacts (battery rates / label
    // counts) and compute only the B side live; the scratch twins
    // re-derive both sides with nothing stored
    val dir = "/root/testdata/sf0.001"
    val q155Stored = AnalysisQueries.q155QualityDrift(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val q155Scratch = AnalysisQueries.qualityDriftScratch(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(q155Stored === q155Scratch)
    val q170Stored = AnalysisQueries.q170LangMixDrift(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    val q170Scratch = AnalysisQueries.langMixScratch(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(q170Stored === q170Scratch)
  }

  test("q156: every constraint fires on a dirty hand table, zero on a clean one") {
    import sqlImplicits._
    val good = (1 to 64).map(_.toFloat)
    val dirty = Seq(
      (1L, good, 0),                                   // clean row
      (1L, good, 1),                                   // duplicate pk
      (2L, (1 to 63).map(_.toFloat), 0),               // wrong dims
      (3L, null.asInstanceOf[Seq[Float]], 0),          // null embedding
      (4L, Seq.fill(64)(Float.NaN), 0),                // NaN elements
      (6L, Seq.fill(64)(0.0f), 0),                     // zero norm
      (7L, good, -5)                                   // label domain
    ).toDF("vec_id", "embedding", "label")
      // a null ELEMENT can't ride through a Scala Seq[Float]; splice it in
      .union(Seq((5L, good, 0)).toDF("vec_id", "embedding", "label")
        .select(col("vec_id"),
          concat(slice(col("embedding"), 1, 63),
            array(lit(null).cast("float"))).as("embedding"),
          col("label")))
    val counts = SimilarityQueries.embeddingDqBattery(dirty)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map(
      "embedding_not_null" -> 1L,
      "dims_64" -> 1L,
      "label_domain" -> 1L,
      "no_nan_elements" -> 1L,
      "no_null_elements" -> 1L,
      "no_zero_norm" -> 1L,
      "vec_pk_unique" -> 1L), s"got $counts")
    val clean = SimilarityQueries
      .q156EmbeddingDq(spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(1))
    assert(clean.forall(_ === 0L), "the fixture is certified clean")
  }

  test("qualityRateStream: streamed running totals match the batch battery") {
    import sqlImplicits._
    implicit val sqlCtx = spark.sqlContext
    val good = "the quick brown fox jumps over a lazy dog again and again"
    val batch1 = Seq(("s1", good), ("s1", "ha ha"), ("s2", good))
    val batch2 = Seq(("s1", good), ("s2", "zz"))
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val q = graft.streaming.StreamingOps
      .qualityRateStream(mem.toDF.toDF("source", "text"))
      .writeStream.format("memory").queryName("quality_rate_test")
      .outputMode("complete").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("quality_rate_test")
        .orderBy("source").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val batch = graft.streaming.StreamingOps.qualityRateStream(
        (batch1 ++ batch2).toDF("source", "text"))
        .orderBy("source").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(streamed.sameElements(batch),
        s"streamed ${streamed.toSeq} != batch ${batch.toSeq}")
      assert(batch.exists(_._3 > 0) && batch.exists(r => r._3 < r._2),
        "the hand corpus exercises both pass and fail")
    } finally q.stop()
  }

  test("lshDriftStream: standing decision after streamed batches is " +
      "bit-identical to the batch q158 decision, and the store is " +
      "replay-keyed") {
    import sqlImplicits._
    implicit val sqlCtx = spark.sqlContext
    val ops = graft.ops.SimilarityOps
    val (bits, tables) = (SimilarityQueries.LshDriftBits,
      SimilarityQueries.LshDriftTables)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val base = emb.where(col("vec_id") % 10 =!= 9)
    val deltaRows = emb.where(col("vec_id") % 10 === 9)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    assert(deltaRows.length >= 2)
    val (b1, b2) = deltaRows.splitAt(deltaRows.length / 2)
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val summary = java.nio.file.Files
      .createTempDirectory("graft-lshdrift-sums").toString
    val checkpoint = java.nio.file.Files
      .createTempDirectory("graft-lshdrift-ckpt").toString
    @volatile var last: org.apache.spark.sql.Row = null
    val q = graft.streaming.StreamingOps.lshDriftStream(
      mem.toDF.toDF("vec_id", "embedding"),
      ops.lshOccupancy(base, bits, tables, "n_base"),
      summary, checkpoint, bits, tables,
      SimilarityQueries.DriftRatioThresholdMicro,
      SimilarityQueries.DriftedPermille,
      SimilarityQueries.DriftHardCapMicro)(r => last = r)
    try {
      mem.addData(b1.toSeq: _*); q.processAllAvailable()
      mem.addData(b2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    // occupancy is linear, so the standing decision over the summed
    // per-batch histograms must equal the batch path over the whole delta
    val batchDecision = ops.rebuildDecision(
      ops.lshOccupancyDrift(base, emb.where(col("vec_id") % 10 === 9),
        bits, tables),
      "lsh", SimilarityQueries.DriftRatioThresholdMicro,
      SimilarityQueries.DriftedPermille,
      SimilarityQueries.DriftHardCapMicro).head()
    assert(last == batchDecision,
      s"streamed $last != batch $batchDecision")
    // replay safety: one lsh_batch partition per processed batch —
    // a replayed batch rewrites its own partition, never double-merges
    val storedBatches = spark.read.parquet(summary)
      .select("lsh_batch").distinct().count()
    assert(storedBatches == 2, s"expected 2 stored batches, got $storedBatches")
  }

  test("q155: sources present in only one snapshot stay IN the report " +
      "(the asymmetric-source rule)") {
    import sqlImplicits._
    // carve: inA = doc_id%10 < 8, inB = doc_id%10 >= 2 — so ids {10,11}
    // are A-only and {18,19} B-only; 'both' spans the intersection
    val passing = "the quick brown fox jumps over seven lazy dogs daily"
    val tmp = java.nio.file.Files.createTempDirectory("graft-q155-asym")
    Seq(
      (2L, "both", passing), (3L, "both", passing), (4L, "both", passing),
      (10L, "onlyA", passing), (11L, "onlyA", passing),
      (18L, "onlyB", passing), (19L, "onlyB", passing))
      .toDF("doc_id", "source", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = AnalysisQueries.q155QualityDrift(spark, tmp.toString)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(rows.keySet === Set("both", "onlyA", "onlyB"),
      s"asymmetric sources missing from the report: ${rows.keySet}")
    val (da, pa, db, pb, drift) = rows("onlyB")
    assert(da == 0L && pa == 0L && db == 2L && drift == pb,
      s"new-in-B source row wrong: ${rows("onlyB")}")
    val (da2, pa2, db2, pb2, drift2) = rows("onlyA")
    assert(db2 == 0L && pb2 == 0L && da2 == 2L && drift2 == -pa2,
      s"vanished-in-B source row wrong: ${rows("onlyA")}")
  }

  test("q155: a degraded snapshot-B source shows negative drift") {
    import sqlImplicits._
    // source 'sA': A-side text passes the battery; its B rewrite (doc_id
    // % 4 == 0 gets the [rev2] suffix — irrelevant here) stays passing,
    // but we synthesize degradation by checking the battery DIRECTLY:
    // q21's gate needs >= 5 tokens; 'bad' is a 2-token doc.
    val goodText = "the quick brown fox jumps over a lazy dog again and again"
    val battery = graft.ops.TextAnalysisOps
    val docs = Seq((0L, goodText), (1L, "ha ha")).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"),
        graft.ops.TextOps.tokenize(col("text")).as("toks"))
    val q = docs.select((Seq(col("doc_id")) ++
      battery.qualityColumns(col("text"), col("toks"))): _*)
      .withColumn("p", battery.qualityPass)
      .collect().map(r => r.getLong(0) -> r.getBoolean(r.length - 1)).toMap
    assert(q(0L), "the good doc passes")
    assert(!q(1L), "the degraded doc fails - drift would go negative")
  }
}
