package graft.ops

import graft.SparkSpec
import graft.queries.CurationQueries

/** Gate for q52c (systematic PPS sampling): agreement with an
  * independent in-memory implementation over the real fixture, the
  * Σmultiplicity = k telescoping invariant, and the certainty rule
  * (weight ≥ W/k ⇒ always drawn).
  */
class PpsSampleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def golden(k: Long): Map[Long, Long] = {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = rows.map(_._2).sum
    def ceilDiv(a: BigInt, b: BigInt): BigInt = (a + b - 1) / b
    var cum = 0L
    rows.flatMap { case (id, w) =>
      val m = ceilDiv(BigInt(cum + w) * k, total) - ceilDiv(BigInt(cum) * k, total)
      cum += w
      if (m > 0) Some(id -> m.toLong) else None
    }.toMap
  }

  test("engine draw matches the in-memory golden and sums to exactly k") {
    val out = CurationQueries.q52cPpsSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val g = golden(CurationQueries.PpsSampleK)
    assert(out.map(_._1).toSet == g.keySet)
    out.foreach { case (id, _, m) => assert(m == g(id), s"doc $id") }
    assert(out.map(_._3).sum == CurationQueries.PpsSampleK)
  }

  test("certainty rule: any doc with weight >= W/k is drawn") {
    val rows = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = rows.map(_._2).sum
    val k = CurationQueries.PpsSampleK
    val certain = rows.filter(_._2 * k >= total).map(_._1).toSet
    val drawn = CurationQueries.q52cPpsSample(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(certain.subsetOf(drawn))
  }
}
