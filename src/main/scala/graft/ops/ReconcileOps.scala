package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Anti-entropy snapshot comparison (the Merkle-tree / Dynamo
  * read-repair pattern, flattened to one level): summarize each side to
  * per-bucket (count, order-independent XOR of a per-row content hash)
  * and only row-diff the buckets whose summaries differ. One linear
  * pass per side, O(buckets) output, and the row diff that follows is
  * restricted by the same bucket predicate the storage layout
  * partitions on (q111's tree prunes that read to dirty directories).
  * XOR is the standard order-independent, overflow-free fold; its known
  * weakness (identical corruptions in pairs cancel) is the documented
  * 2^-64-class trade every checksum-reconciliation scheme makes.
  * Soundness of the pruning (changed row ⇒ dirty bucket, absent a hash
  * collision) is unit-gated in ReconcileSpec on both a sparse synthetic
  * delta and the fixture carve.
  */
object ReconcileOps {

  /** Per-row reconciliation hash: the engine-portable charHash of
    * "id:content", so both engines fold identical strings.
    */
  def rowHash(id: Column, content: Column): Column =
    HashOps.charHash(concat(id.cast("string"), lit(":"), content))

  /** Compare two `(doc_id, text)`-shaped sides bucket-wise. Output:
    * `(bucket, n_a, n_b, xor_a, xor_b, dirty)`, one row per bucket
    * present on either side, totally ordered by bucket.
    *
    * Plan: both sides union into ONE bucket-keyed aggregate (side-
    * conditional count and xor — aggregates skip the other side's NULLs,
    * so `bit_xor(when(side, h))` IS the per-side fold), instead of two
    * aggregates merged by a full-outer join: full outer cannot
    * broadcast, so the join form pays a third exchange plus a
    * sort-merge for what one shuffle of tagged rows expresses. A bucket
    * absent on one side yields count 0 and NULL xor, exactly the
    * full-outer semantics.
    */
  def bucketChecksums(a: DataFrame, b: DataFrame, nBuckets: Long,
                      idCol: String = "doc_id",
                      contentCol: String = "text"): DataFrame = {
    def side(df: DataFrame, isA: Boolean): DataFrame =
      df.select((col(idCol) % nBuckets).as("bucket"),
        rowHash(col(idCol), col(contentCol)).as("h"),
        lit(isA).as("is_a"))
    side(a, isA = true).unionByName(side(b, isA = false))
      .groupBy("bucket")
      .agg(count(when(col("is_a"), 1)).as("n_a"),
        count(when(!col("is_a"), 1)).as("n_b"),
        expr("bit_xor(CASE WHEN is_a THEN h END)").as("xor_a"),
        expr("bit_xor(CASE WHEN NOT is_a THEN h END)").as("xor_b"))
      .select(col("bucket"), col("n_a"), col("n_b"),
        col("xor_a"), col("xor_b"),
        (col("n_a") =!= col("n_b") ||
          !(col("xor_a") <=> col("xor_b"))).as("dirty"))
      .orderBy("bucket")
  }

  /** One side's per-bucket summary alone: `(bucket, n, xor)`. */
  def sideChecksums(df: DataFrame, nBuckets: Long,
                    idCol: String = "doc_id",
                    contentCol: String = "text"): DataFrame =
    df.select((col(idCol) % nBuckets).as("bucket"),
        rowHash(col(idCol), col(contentCol)).as("h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("xor"))

  /** INCREMENTAL checksum maintenance — the reason the reconciliation
    * hash is an XOR and not an order-sensitive fold: XOR is its own
    * inverse, so the stored checksum table refreshes from the DELTA
    * alone, never a rescan of the 100 TB snapshot:
    *
    *   n'   = n − |removed| + |added|
    *   xor' = xor ⊕ xor(removed) ⊕ xor(added)
    *
    * (`removed` carries the OLD rows leaving the snapshot — deletes and
    * the pre-images of updates; `added` the NEW rows — inserts and the
    * post-images.) A bucket emptied by the delta reports NULL xor,
    * matching a direct recompute's empty-group NULL; a bucket absent
    * everywhere is dropped. The q98 merge-algebra contract: q130b's
    * ORACLE recomputes the target snapshot's summary from scratch, so
    * every count and every 64-bit fold of the incremental path must
    * agree hash-exactly.
    */
  def applyDelta(prev: DataFrame, removed: DataFrame, added: DataFrame,
                 nBuckets: Long,
                 idCol: String = "doc_id",
                 contentCol: String = "text"): DataFrame = {
    val rem = sideChecksums(removed, nBuckets, idCol, contentCol)
      .toDF("bucket", "n_rem", "xor_rem")
    val add = sideChecksums(added, nBuckets, idCol, contentCol)
      .toDF("bucket", "n_add", "xor_add")
    prev.toDF("bucket", "n_prev", "xor_prev")
      .join(rem, Seq("bucket"), "full_outer")
      .join(add, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        (coalesce(col("n_prev"), lit(0L)) - coalesce(col("n_rem"), lit(0L)) +
          coalesce(col("n_add"), lit(0L))).as("n"),
        expr("""coalesce(xor_prev, 0) ^ coalesce(xor_rem, 0)
                ^ coalesce(xor_add, 0)""").as("x"))
      .where(col("n") > 0)
      .select(col("bucket"), col("n"), col("x").as("xor"))
  }
}
