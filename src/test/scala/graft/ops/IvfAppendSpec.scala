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

  test("assignToCells agrees with MLlib transform's assignment on fixture vectors") {
    // buildIvfIndex deliberately does NOT use KMeans.transform for the
    // base assignment any more (one exact Σ(x−y)² rule for base and
    // delta makes merge == recompute structural), so MLlib's own
    // assignment is re-derived here: same data, k, and seed yield the
    // same fitted model. Agreement is an OBSERVATION on real fixture
    // vectors — transform's norm-based fastSquaredDistance could in
    // principle pick differently on near-equidistant inputs, which is
    // exactly why the production path no longer mixes the two rules.
    import org.apache.spark.ml.functions.array_to_vector
    val p = all.where(!isDelta)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .withColumn("fvec", array_to_vector(col("emb")))
    val km = new org.apache.spark.ml.clustering.KMeans().setK(8).setSeed(42L)
      .setFeaturesCol("fvec").setPredictionCol("cell").fit(p)
    val mllib = km.transform(p)
      .select(col("vec_id"), col("cell").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val ours = base.assigned.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(ours == mllib)
  }

  test("assignToCells breaks exact distance ties to the lowest cell id") {
    import sqlImplicits._
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(-1.0, 0.0)))
      .toDF("cell", "centroid")
    // (0, 1) is exactly equidistant from (1, 0) and (-1, 0)
    val v = Seq((7L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = SimilarityOps.assignToCells(v, cents)
      .select("cell").head().getLong(0)
    assert(got == 0L, "tie must go to the lowest cell id (KMeans' own rule)")
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

  test("drift stats: a delta drawn from the base itself reads ratio exactly 1e6") {
    // same rows on both sides ⇒ identical per-cell distance distribution
    // ⇒ integral mean ratio is exactly 1,000,000 wherever base_mean > 0
    val baseRows = all.where(!isDelta)
    val stats = SimilarityOps.ivfDriftStats(base, baseRows).collect()
    assert(stats.nonEmpty)
    val withSignal = stats.filter(r =>
      r.getAs[Long]("n_delta") > 0 && r.getAs[Long]("base_mean_d2") > 0)
    assert(withSignal.nonEmpty, "degenerate fixture: no cell with signal")
    withSignal.foreach { r =>
      assert(r.getAs[Long]("drift_mean_ratio_micro") == 1000000L,
        s"cell ${r.getAs[Long]("cell")}: self-delta must read ratio 1e6")
      assert(r.getAs[Long]("base_p95_d2") == r.getAs[Long]("delta_p95_d2"))
    }
  }

  test("drift stats: a shifted delta reads ratios strictly above 1e6") {
    // push every delta vector far from ALL frozen centroids: distances
    // inflate in whichever cell it lands, so every cell with delta rows
    // must report mean drift strictly above the self-delta's 1e6
    val shifted = all.where(isDelta)
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"), x => x + lit(100.0))
          .as("embedding"))
    val stats = SimilarityOps.ivfDriftStats(base, shifted).collect()
    val withDelta = stats.filter(_.getAs[Long]("n_delta") > 0)
    assert(withDelta.nonEmpty)
    withDelta.foreach { r =>
      assert(r.getAs[Long]("drift_mean_ratio_micro") > 1000000L,
        s"cell ${r.getAs[Long]("cell")}: shifted delta must drift") }
    // and the un-shifted delta does NOT read as drifted anywhere near that
    val honest = SimilarityOps.ivfDriftStats(base, all.where(isDelta))
      .collect().filter(_.getAs[Long]("n_delta") > 0)
    val worstHonest = honest.map(_.getAs[Long]("drift_mean_ratio_micro")).max
    val bestShifted = withDelta.map(_.getAs[Long]("drift_mean_ratio_micro")).min
    assert(bestShifted > worstHonest,
      s"shifted drift ($bestShifted) must exceed in-distribution drift ($worstHonest)")
  }

  test("drift stats rows cover every cell and are deterministic") {
    val run1 = SimilarityOps.ivfDriftStats(base, all.where(isDelta))
      .orderBy("cell").collect().map(_.toString).toSeq
    val run2 = SimilarityOps.ivfDriftStats(base, all.where(isDelta))
      .orderBy("cell").collect().map(_.toString).toSeq
    assert(run1 == run2)
    assert(run1.size == base.centroids.count())
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
