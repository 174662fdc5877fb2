package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Deletion-vector maintenance invariants (q143's filesystem semantics —
  * not SQL-expressible, so unit-gated here; the oracle verifies the
  * density math and visible content): soft delete never touches base
  * files, the DV merge de-duplicates and drops unknown keys, compaction
  * rewrites exactly the dense buckets and clears exactly their DV rows,
  * and a crashed DV swap heals on the next touch.
  */
class DeletionVectorSpec extends SparkSpec {

  import sqlImplicits._

  private def freshTable(name: String): (String, String) = {
    val tmp = graft.Scratch.dir(name)
    val fs = new Path(tmp).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(tmp), true)
    (s"$tmp/base", s"$tmp/dv")
  }

  private def seed(basePath: String): Unit =
    (0 until 20).map(i => (i.toLong, s"text$i", i % 2))
      .toDF("doc_id", "text", "bucket")
      .write.mode("overwrite").partitionBy("bucket").parquet(basePath)

  private def baseFileState(basePath: String): Map[String, (Long, Long)] = {
    val fs = new Path(basePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(basePath)).filter(_.isDirectory).flatMap(d =>
      fs.listStatus(d.getPath).filter(_.isFile).map(f =>
        f.getPath.toString -> (f.getLen, f.getModificationTime))).toMap
  }

  test("soft delete records keys without touching base files; unknown keys dropped") {
    val (base, dv) = freshTable("dvspec_soft")
    seed(base)
    val before = baseFileState(base)
    DocumentSources.softDelete(spark, base, dv,
      Seq((0, 0L), (0, 2L), (1, 999L)).toDF("bucket", "doc_id"))
    assert(baseFileState(base) === before, "base files byte-identical")
    val dvRows = spark.read.parquet(dv).select("bucket", "doc_id")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(dvRows === Set((0, 0L), (0, 2L)), "unknown key 999 not recorded")
    val vis = DocumentSources.readVisible(spark, base, dv)
    assert(vis.count() === 18)
    assert(vis.where(col("doc_id").isin(0L, 2L)).count() === 0)
  }

  test("overlapping second batch de-duplicates in the DV") {
    val (base, dv) = freshTable("dvspec_merge")
    seed(base)
    DocumentSources.softDelete(spark, base, dv,
      Seq((0, 0L), (0, 2L)).toDF("bucket", "doc_id"))
    DocumentSources.softDelete(spark, base, dv,
      Seq((0, 2L), (0, 4L)).toDF("bucket", "doc_id"))
    assert(spark.read.parquet(dv).count() === 3)
    assert(DocumentSources.readVisible(spark, base, dv).count() === 17)
  }

  test("compaction rewrites dense buckets only, clears their DVs, and is idempotent") {
    val (base, dv) = freshTable("dvspec_compact")
    seed(base)
    // bucket 0: 6/10 deleted (600 permille, dense); bucket 1: 1/10 (sparse)
    DocumentSources.softDelete(spark, base, dv,
      (Seq(0L, 2L, 4L, 6L, 8L, 10L).map(i => (0, i)) :+ ((1, 1L)))
        .toDF("bucket", "doc_id"))
    val sparseBefore = baseFileState(base).filter(_._1.contains("bucket=1"))
    val manifest = DocumentSources
      .applyDeletionVectors(spark, base, dv, minPermille = 300L)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(manifest(0) === ((10L, 6L, true)))
    assert(manifest(1) === ((10L, 1L, false)))
    assert(baseFileState(base).filter(_._1.contains("bucket=1"))
      === sparseBefore, "sparse bucket files untouched")
    val disk = spark.read.parquet(base)
    assert(disk.where(col("bucket") === 0).count() === 4,
      "dense bucket holds only visible rows")
    assert(disk.where(col("bucket") === 1).count() === 10,
      "sparse bucket still carries its deleted row on disk")
    val dvLeft = spark.read.parquet(dv).select("bucket", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(dvLeft === Set((1, 1L)), "compacted bucket's DV rows dropped")
    assert(DocumentSources.readVisible(spark, base, dv).count() === 13)
    // idempotence: nothing dense remains, second run changes nothing
    val state = baseFileState(base)
    val again = DocumentSources
      .applyDeletionVectors(spark, base, dv, minPermille = 300L)
      .collect().map(r => r.getBoolean(3))
    assert(again.forall(!_))
    assert(baseFileState(base) === state)
  }

  test("a 100%-deleted bucket compacts away but keeps its manifest row") {
    // the q143-report shape: the decision manifest is the one relation
    // that still has a row for a bucket whose every row was deleted —
    // the rewrite legitimately leaves no bucket=b dir on disk
    val (base, dv) = freshTable("dvspec_alldel")
    seed(base)
    DocumentSources.softDelete(spark, base, dv,
      (0 until 20 by 2).map(i => (0, i.toLong)).toDF("bucket", "doc_id"))
    val manifest = DocumentSources
      .applyDeletionVectors(spark, base, dv, minPermille = 300L)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(manifest(0) === ((10L, 10L, true)), "all-deleted bucket decided")
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(s"$base/bucket=0")),
      "fully-applied bucket dir removed from disk")
    assert(DocumentSources.readVisible(spark, base, dv)
      .where(col("bucket") === 0).count() === 0)
  }

  test("the compaction rewrite's base scan prunes to the dense bucket dirs") {
    val (base, dv) = freshTable("dvspec_prune")
    seed(base)
    DocumentSources.softDelete(spark, base, dv,
      Seq((0, 0L)).toDF("bucket", "doc_id"))
    val plan = DocumentSources.readVisible(spark, base, dv)
      .where(col("bucket").isin(0))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"dense-bucket rewrite must prune the base scan by partition:\n$plan")
  }

  test("softDeleteStream: deletes visible at micro-batch latency; the " +
      "density gate compacts only once crossed") {
    val (base, dv) = freshTable("dvspec_stream")
    seed(base)
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Int, Long)]
    val ck = java.nio.file.Files.createTempDirectory("dv-stream-ck").toString
    val q = graft.streaming.StreamingOps.softDeleteStream(
      mem.toDF.toDF("bucket", "doc_id"), base, dv, ck,
      compactPermille = Some(300L))
    try {
      mem.addData((0, 0L), (0, 2L)); q.processAllAvailable()
      // 2/10 = 200 permille: soft-deleted but NOT compacted
      assert(DocumentSources.readVisible(spark, base, dv).count() === 18)
      assert(spark.read.parquet(base).where(col("bucket") === 0)
        .count() === 10, "below the gate: base files untouched")
      mem.addData((0, 4L), (0, 6L)); q.processAllAvailable()
      // 4/10 = 400 permille: the sweep compacts bucket 0, clears its DV
      assert(DocumentSources.readVisible(spark, base, dv).count() === 16)
      assert(spark.read.parquet(base).where(col("bucket") === 0)
        .count() === 6, "gate crossed: bucket rewritten to visible rows")
      // fully-applied DV tree is EMPTY parquet (no data files) — the
      // schema-pinned read is the contract (readDv); raw inference throws
      assert(spark.read.schema("doc_id LONG, bucket INT").parquet(dv)
        .count() === 0)
    } finally q.stop()
  }

  test("a crashed BASE bucket swap (parked, no live twin) heals on the next touch") {
    // the round-10 review gap: applyDeletionVectors parks live base
    // buckets into $base-old during its per-bucket swap, and a crash
    // between park and rename-in used to leave the bucket ONLY in the
    // parked tree — every later read silently lost it. Simulate exactly
    // that state and assert any DV entry point restores it.
    val (base, dv) = freshTable("dvspec_basecrash")
    seed(base)
    DocumentSources.softDelete(spark, base, dv,
      Seq((0, 0L)).toDF("bucket", "doc_id"))
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash simulation: bucket 0 parked, no live twin, stale staging left
    assert(fs.mkdirs(new Path(s"$base-old")))
    assert(fs.rename(new Path(s"$base/bucket=0"),
      new Path(s"$base-old/bucket=0")))
    assert(fs.mkdirs(new Path(s"$base-staging/bucket=0")))
    val vis = DocumentSources.readVisible(spark, base, dv)
    assert(vis.count() === 19, "recovery restored the parked base bucket")
    assert(vis.where(col("bucket") === 0).count() === 9,
      "restored bucket minus its still-live DV row")
    assert(fs.exists(new Path(s"$base/bucket=0")))
    assert(!fs.exists(new Path(s"$base-old")), "parked root swept")
    // r12: READ entry points restore parked buckets (correctness) but
    // never sweep a staging tree — under a concurrent writer mid-swap,
    // deleting $base-staging would destroy that writer's in-flight work
    assert(fs.exists(new Path(s"$base-staging")),
      "reader must leave the staging tree for its (possibly live) writer")
    // the next WRITER entry point owns the table and sweeps it
    DocumentSources.softDelete(spark, base, dv,
      Seq((0, 1L)).toDF("bucket", "doc_id"))
    assert(!fs.exists(new Path(s"$base-staging")),
      "writer entry sweeps the stale staging")
    // a completed swap's leftover (parked WITH a live twin) is dropped,
    // and the live content wins
    assert(fs.mkdirs(new Path(s"$base-old")))
    assert(fs.rename(new Path(s"$base/bucket=1"),
      new Path(s"$base-old/bucket=1")))
    assert(fs.mkdirs(new Path(s"$base/bucket=1"))) // empty live twin
    DocumentSources.softDelete(spark, base, dv,
      Seq((0, 2L)).toDF("bucket", "doc_id"))
    assert(!fs.exists(new Path(s"$base-old")))
    assert(spark.read.parquet(base).where(col("bucket") === 1).count() === 0,
      "live twin (even empty) wins over the parked leftover")
  }

  test("a crashed DV swap (parked, no live root) heals on the next touch") {
    val (base, dv) = freshTable("dvspec_crash")
    seed(base)
    DocumentSources.softDelete(spark, base, dv,
      Seq((0, 0L)).toDF("bucket", "doc_id"))
    val fs = new Path(dv).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash between park and rename-in
    assert(fs.rename(new Path(dv), new Path(s"$dv-old")))
    val vis = DocumentSources.readVisible(spark, base, dv)
    assert(vis.count() === 19, "recovery restored the parked DV")
    assert(fs.exists(new Path(dv)) && !fs.exists(new Path(s"$dv-old")))
  }
}
