package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract tests for SimilarityOps.hardNegatives (q134's engine).
  *
  * Hand-computed 6-vector fixture: cosines are exact products of the
  * chosen components, so every expected rank is verifiable on paper.
  *
  *   0: (1, 0, 0, 0)        4: (0, 0, 0.8, 0.6)
  *   1: (0.8, 0.6, 0, 0)    5: (0, 1, 0, 0)
  *   2: (0.6, 0.8, 0, 0)
  *   3: (0, 0, 1, 0)
  *
  * cos(1,2) = 0.96 — the known-positive pair; cos(0,1) = 0.8,
  * cos(0,2) = 0.6, cos(1,5) = 0.6, cos(2,5) = 0.8, cos(3,4) = 0.8.
  */
class HardNegativesSpec extends SparkSpec {

  private def fixture = {
    import sqlImplicits._
    Seq(
      (0L, Seq(1.0f, 0f, 0f, 0f)),
      (1L, Seq(0.8f, 0.6f, 0f, 0f)),
      (2L, Seq(0.6f, 0.8f, 0f, 0f)),
      (3L, Seq(0f, 0f, 1.0f, 0f)),
      (4L, Seq(0f, 0f, 0.8f, 0.6f)),
      (5L, Seq(0f, 1.0f, 0f, 0f))
    ).toDF("vec_id", "embedding")
  }

  private def exclusions = {
    import sqlImplicits._
    // symmetric known-positive pair (1, 2)
    Seq((1L, 2L), (2L, 1L)).toDF("id_a", "id_b")
  }

  private lazy val result =
    SimilarityOps.hardNegatives(fixture, everyNth = 4, k = 2, exclusions)
      .orderBy("query_id", "rk")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("anchors are the sample union exclusion participants, nothing else") {
    // sample (vec_id % 4 == 0) = {0, 4}; exclusion id_a side = {1, 2}
    assert(result.map(_._1).distinct.sorted === Seq(0L, 1L, 2L, 4L))
  }

  test("a known positive is excluded even when it tops the raw ranking") {
    // anchor 1's raw best is 2 (cos .96) — excluded; negatives = 0 then 5
    val a1 = result.filter(_._1 == 1L)
    assert(a1.map(t => (t._2, t._4)).toSeq === Seq((0L, 1L), (5L, 2L)))
    // and symmetrically anchor 2 must not see 1 (raw cos .96)
    val a2 = result.filter(_._1 == 2L)
    assert(a2.map(t => (t._2, t._4)).toSeq === Seq((5L, 1L), (0L, 2L)))
  }

  test("ranking happens after exclusion: every anchor still gets k rows") {
    result.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted === Seq(1L, 2L))
    }
  }

  test("anchors without positives rank the plain cosine order") {
    val a0 = result.filter(_._1 == 0L)
    assert(a0.map(t => (t._2, t._4)).toSeq === Seq((1L, 1L), (2L, 2L)))
    // cos(0,1) = 0.8 up to float32 representation (0.8f and 0.6f are not
    // exact binary fractions), so the micro floor lands one ulp under
    assert(a0.head._3 === 799999L)
  }
}
