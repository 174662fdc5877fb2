package graft.queries

import graft.SparkSpec

/** q145's damage/detection agreement: the oracle proves the counts; this
  * proves the detector FINDS the damage classes the synthesis plants and
  * stays silent on clean docs — the ground-truth link a count hash can't
  * articulate.
  */
class MojibakeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("detector flags exactly the planted damage classes") {
    val out = AnalysisQueries.q145Mojibake(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      val (nl, np, nr) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val flagged = r.getBoolean(4)
      assert(flagged === (nl + np + nr > 0))
      id % 7 match {
        case 5 =>
          assert(np === 2 && nr === 0,
            s"doc $id: appended smart-quote pair must be counted exactly")
          assert(flagged)
        case 6 =>
          assert(nr === 1 && np === 0, s"doc $id: one replacement char")
          assert(flagged)
        case 3 =>
          // latin1 damage replaces 'e'; a doc without 'e' legitimately
          // stays clean, so assert agreement with the text itself
          val hasE = spark.read.parquet(s"$dir/documents.parquet")
            .where(org.apache.spark.sql.functions.col("doc_id") === id)
            .collect().head.getAs[String]("text").contains("e")
          assert((nl > 0) === hasE, s"doc $id")
          assert(np === 0 && nr === 0)
        case _ =>
          assert(!flagged, s"doc $id: clean doc must not be flagged")
      }
    }
    assert(out.exists(r => r.getLong(0) % 7 == 3 && r.getLong(1) > 0),
      "at least one latin1-damaged doc detected")
  }
}
