package graft.queries

import graft.SparkSpec
import graft.ops.ReconcileOps
import org.apache.spark.sql.functions._

/** q130's operational claim, quantified: the bucket-checksum summary is
  * a SOUND pruning signal for the row-level diff — every changed doc
  * lives in a bucket the summary marks dirty, so restricting the
  * expensive row diff to dirty buckets loses nothing, and clean buckets
  * are certified untouched without reading a row. That identity is what
  * lets a 100 TB reconciliation read only the dirty partitions'
  * directories. The sparse synthetic case shows the PRUNING (2 of 16
  * buckets touched); the fixture case checks soundness on the real
  * carve, where the A→B transition deliberately touches every bucket.
  */
class ReconcileSpec extends SparkSpec {
  import sqlImplicits._

  private val dir = "/root/testdata/sf0.001"

  test("sparse delta: exactly the touched buckets go dirty, pruned diff == full diff") {
    val base = (0L until 200L).map(i => (i, s"content of doc $i")).toDF("doc_id", "text")
    // delta: one update (doc 5 -> bucket 5), one delete (doc 37 -> bucket 5),
    // one insert (doc 201 -> bucket 9)
    val changed = base
      .where(col("doc_id") =!= 37L)
      .withColumn("text",
        when(col("doc_id") === 5L, lit("edited")).otherwise(col("text")))
      .unionByName(Seq((201L, "new doc")).toDF("doc_id", "text"))
    val sums = ReconcileOps.bucketChecksums(base, changed, 16L).collect()
    val dirty = sums.filter(_.getAs[Boolean]("dirty"))
      .map(_.getAs[Long]("bucket")).toSet
    assert(dirty == Set(5L, 201L % 16L),
      s"expected exactly the touched buckets, got $dirty")
    // clean buckets verified byte-identical without any row read: the
    // summary says so, and the row diff confirms nothing lives there
    val full = base.select(col("doc_id"), col("text").as("ta"))
      .join(changed.select(col("doc_id"), col("text").as("tb")),
        Seq("doc_id"), "full_outer")
      .where(!(col("ta") <=> col("tb")))
    val fullIds = full.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fullIds == Set(5L, 37L, 201L))
    assert(fullIds.map(_ % 16L).subsetOf(dirty))
    val pruned = full.where((col("doc_id") % 16L).isin(dirty.toSeq: _*))
    assert(pruned.count() == full.count())
  }

  test("applyDelta lands exactly on a from-scratch summary of the target") {
    val base = (0L until 200L).map(i => (i, s"content of doc $i")).toDF("doc_id", "text")
    val changed = base
      .where(col("doc_id") =!= 37L)
      .withColumn("text",
        when(col("doc_id") === 5L, lit("edited")).otherwise(col("text")))
      .unionByName(Seq((201L, "new doc")).toDF("doc_id", "text"))
    val removed = base.where(col("doc_id").isin(5L, 37L))
    val added = changed.where(col("doc_id").isin(5L, 201L))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("bucket").collect().map(_.toString).toSeq
    val incr = rows(ReconcileOps.applyDelta(
      ReconcileOps.sideChecksums(base, 16L), removed, added, 16L))
    val direct = rows(ReconcileOps.sideChecksums(changed, 16L))
    assert(incr == direct)
  }

  test("fixture carve: no changed doc hides in a clean bucket") {
    val sums = CurationQueries.q130BucketChecksums(spark, dir).collect()
    assert(sums.length == CurationQueries.ReconBuckets)
    val dirty = sums.filter(_.getAs[Boolean]("dirty"))
      .map(_.getAs[Long]("bucket")).toSet
    val diff = CurationQueries.q71SnapshotDelta(spark, dir)
      .where(col("change") =!= "unchanged").collect()
    assert(diff.nonEmpty)
    val changedBuckets = diff
      .map(_.getAs[Long]("doc_id") % CurationQueries.ReconBuckets).toSet
    assert(changedBuckets.subsetOf(dirty),
      s"changed docs in clean buckets: ${changedBuckets -- dirty}")
    graft.CacheScope.releaseAll()
  }
}
