package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Drift→rebuild decision gates (q158/q158b). The decision RULE is
  * hash-verified through q158's portable LSH instantiation; these units
  * gate the DIRECTION on every index family — a self-identical delta
  * must decide keep, a genuinely shifted delta must decide rebuild —
  * plus the integer gate boundaries synthetic drift rows can pin
  * exactly.
  */
class RebuildDecisionSpec extends SparkSpec {
  import sqlImplicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private val Thr = graft.queries.SimilarityQueries.DriftRatioThresholdMicro
  private val Permille = graft.queries.SimilarityQueries.DriftedPermille
  private val Cap = graft.queries.SimilarityQueries.DriftHardCapMicro

  private def decide(drift: org.apache.spark.sql.DataFrame, name: String) =
    SimilarityOps.rebuildDecision(drift, name, Thr, Permille, Cap)
      .collect().head

  test("LSH occupancy: a self-identical delta reads ratio exactly 1e6 " +
      "everywhere scored, and decides keep") {
    val drift = SimilarityOps.lshOccupancyDrift(emb, emb, bits = 5, tables = 4)
    val ratios = drift.where(col("drift_ratio_micro").isNotNull)
      .select("drift_ratio_micro").collect().map(_.getLong(0))
    assert(ratios.nonEmpty && ratios.forall(_ == 1000000L),
      s"self-delta must normalize to exactly 1e6, got ${ratios.distinct.toSeq}")
    val d = decide(drift, "lsh")
    assert(!d.getAs[Boolean]("rebuild"))
    assert(d.getAs[Long]("n_drifted") === 0L)
  }

  test("LSH occupancy: a collapsed delta (every vector hashing positive) " +
      "trips the hard-cap trigger even though few buckets are hit") {
    // all-positive components ⇒ every delta vector lands in the all-ones
    // bucket of each table: catastrophic concentration that the breadth
    // (permille) gate alone would miss — exactly why the cap exists
    val collapsed = emb.select(col("vec_id"),
      transform(col("embedding"), x => abs(x)).as("embedding"))
    val drift = SimilarityOps.lshOccupancyDrift(emb, collapsed,
      bits = 5, tables = 4)
    val d = decide(drift, "lsh")
    assert(d.getAs[Long]("max_ratio_micro") >= Cap,
      s"collapse must exceed the cap, got ${d.getAs[Long]("max_ratio_micro")}")
    assert(d.getAs[Boolean]("rebuild"))
  }

  test("LSH occupancy: novel buckets (base never populated) score as " +
      "drift, not unscorable") {
    // base: two all-positive vectors (bucket 31 in every 5-bit table);
    // delta: one all-negative vector (bucket 0 everywhere — novel).
    // The virgin-bucket rule floors the denominator at one occupant:
    // ratio = (1 * 2 * 1e6) / 1 = 2e6 per table, never NULL.
    val base = Seq(
      (1L, Array.fill(20)(0.5f), 0), (2L, Array.fill(20)(0.25f), 0))
      .toDF("vec_id", "embedding", "label")
    val delta = Seq((3L, Array.fill(20)(-0.5f), 0))
      .toDF("vec_id", "embedding", "label")
    val drift = SimilarityOps.lshOccupancyDrift(base, delta,
      bits = 5, tables = 4).collect()
    val novel = drift.filter(_.getAs[Long]("n_base") == 0L)
    assert(novel.length == 4, s"one novel bucket per table: ${novel.toSeq}")
    novel.foreach { r =>
      assert(r.getAs[Long]("drift_ratio_micro") == 2000000L, r.toString) }
    // and the abandoned base buckets read 0, scored (one-sided rule)
    drift.filter(_.getAs[Long]("n_delta") == 0L).foreach { r =>
      assert(r.getAs[Long]("drift_ratio_micro") == 0L, r.toString) }
  }

  test("decision gate boundaries are exact integer math") {
    def frame(ratios: Seq[Option[Long]]) =
      ratios.zipWithIndex
        .map { case (r, i) => (i.toLong, r) }
        .toDF("g", "drift_ratio_micro")
    // 10 scored groups, 2 flagged = exactly the 200-permille gate ⇒ rebuild
    val atGate = frame((1 to 8).map(_ => Some(1000000L)) ++
      Seq(Some(Thr + 1), Some(Thr + 1)))
    assert(decide(atGate, "x").getAs[Boolean]("rebuild"))
    // 1 of 10 flagged = 100 permille, under the gate and under the cap
    val under = frame((1 to 9).map(_ => Some(1000000L)) :+ Some(Thr + 1))
    assert(!decide(under, "x").getAs[Boolean]("rebuild"))
    // a ratio exactly AT the threshold does not count as drifted (strict >)
    val boundary = frame(Seq(Some(Thr), Some(Thr), Some(1000000L)))
    assert(decide(boundary, "x").getAs[Long]("n_drifted") === 0L)
    // NULL ratios are unscored, never drifted; all-null ⇒ keep
    val allNull = frame(Seq(None, None))
    val d = decide(allNull, "x")
    assert(d.getAs[Long]("n_scored") === 0L && !d.getAs[Boolean]("rebuild"))
  }

  test("IVF family routed through the same decision: self-delta keeps, " +
      "a shifted delta rebuilds") {
    val index = SimilarityOps.buildIvfIndex(emb, nCells = 16)
    def route(delta: org.apache.spark.sql.DataFrame) =
      decide(SimilarityOps.ivfDriftStats(index, delta)
        .withColumnRenamed("drift_mean_ratio_micro", "drift_ratio_micro"),
        "ivf")
    val self = route(emb)
    assert(!self.getAs[Boolean]("rebuild"),
      s"self-delta must keep: $self")
    // shift every component far outside the data's range: assignment
    // distances explode in every cell ⇒ breadth gate trips
    val shifted = emb.select(col("vec_id"),
      transform(col("embedding"), x => x + lit(10.0f)).as("embedding"))
    assert(route(shifted).getAs[Boolean]("rebuild"))
    graft.CacheScope.releaseAll()
  }

  test("PQ family routed through the same decision: self-delta keeps, " +
      "a shifted delta rebuilds") {
    val cb = SimilarityOps.trainPq(emb, m = 8, kSub = 16)
    def route(delta: org.apache.spark.sql.DataFrame) =
      decide(SimilarityOps.pqDriftStats(cb, emb, delta)
        .withColumnRenamed("drift_mean_ratio_micro", "drift_ratio_micro"),
        "pq")
    assert(!route(emb).getAs[Boolean]("rebuild"))
    val shifted = emb.select(col("vec_id"),
      transform(col("embedding"), x => x + lit(10.0f)).as("embedding"))
    assert(route(shifted).getAs[Boolean]("rebuild"))
    graft.CacheScope.releaseAll()
  }
}
