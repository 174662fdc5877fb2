package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental IVF maintenance (`SimilarityOps.ivfAppend`): the merged
  * index must behave exactly like a from-scratch assignment of the union
  * against the same frozen centroids — merge == recompute, the property
  * that makes delta-append a safe substitute for a rebuild.
  */
class IvfAppendSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val all = graft.Tables.embeddings(spark, dir)
  private val isDelta = graft.queries.SimilarityQueries.isIngestDelta(col("vec_id"))

  private lazy val base =
    SimilarityOps.buildIvfIndex(all.where(!isDelta), nCells = 8)
  private lazy val merged = SimilarityOps.ivfAppend(base, all.where(isDelta))

  test("assignToCells reproduces MLlib's own assignment on the base corpus") {
    // KMeans.transform assigns by min squared Euclidean, ties to the
    // lowest cluster index; the engine reimplementation must agree on
    // real fixture vectors or the merge-equals-recompute story is void
    val ours = SimilarityOps.assignToCells(
      all.where(!isDelta), base.centroids)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val mllib = base.assigned.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(ours == mllib)
  }

  test("merged assignment is row-identical to assigning the union from scratch") {
    val mergedRows = merged.assigned.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val recompute = SimilarityOps.assignToCells(all, base.centroids)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(mergedRows == recompute && mergedRows.nonEmpty)
    // every vector of the union is present exactly once
    assert(mergedRows.map(_._1).distinct.size == mergedRows.size)
    assert(mergedRows.size == all.count())
  }

  test("probing the merged index equals probing the recomputed index") {
    val recomputed = SimilarityOps.IvfIndex(
      SimilarityOps.assignToCells(all, base.centroids), base.centroids)
    def probe(ix: SimilarityOps.IvfIndex) =
      SimilarityOps.ivfTopK(ix, everyNth = 25, k = 3, nProbe = 3)
        .collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("cand_id"),
          r.getAs[Long]("cos_micro"), r.getAs[Int]("rk")))
        .sorted.toSeq
    val a = probe(merged)
    val b = probe(recomputed)
    assert(a == b && a.nonEmpty)
  }

  test("delta vectors land in existing cells only, each exactly once") {
    val cells = base.centroids.select("cell").collect().map(_.getLong(0)).toSet
    val delta = SimilarityOps.assignToCells(all.where(isDelta), base.centroids)
      .select("vec_id", "cell").collect()
    assert(delta.nonEmpty)
    assert(delta.forall(r => cells.contains(r.getLong(1))))
    assert(delta.map(_.getLong(0)).distinct.length == delta.length)
  }
}
