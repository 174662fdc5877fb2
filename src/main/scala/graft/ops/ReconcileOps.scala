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
    */
  def bucketChecksums(a: DataFrame, b: DataFrame, nBuckets: Long,
                      idCol: String = "doc_id",
                      contentCol: String = "text"): DataFrame = {
    def side(df: DataFrame, suffix: String): DataFrame =
      df.select((col(idCol) % nBuckets).as("bucket"),
          rowHash(col(idCol), col(contentCol)).as("h"))
        .groupBy("bucket")
        .agg(count(lit(1)).as(s"n_$suffix"),
          expr("bit_xor(h)").as(s"xor_$suffix"))
    side(a, "a").join(side(b, "b"), Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        col("xor_a"), col("xor_b"),
        (coalesce(col("n_a"), lit(0L)) =!= coalesce(col("n_b"), lit(0L)) ||
          !(col("xor_a") <=> col("xor_b"))).as("dirty"))
      .orderBy("bucket")
  }
}
