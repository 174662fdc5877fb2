package graft.queries

import graft.SparkSpec

/** q17f recursion gate (r9 advisor finding): the single-level histogram
  * handed pass 2 `limit(kIn.toInt)` — on a degenerate near-constant
  * column one bucket holds ~all n rows, kIn ≈ n/2 silently overflows Int
  * past 2^31, and the "pass 2 sorts ≈ n/buckets rows" bound collapses to
  * a driver-bound TakeOrdered of half the data. The fix recurses into
  * the heavy bucket with a fresh histogram; forcing `pass2Limit = 1`
  * makes EVERY level recurse until buckets reach width 1 (where the
  * value IS the answer, no sort), so this exercises the full narrowing
  * path and pins it bit-identical to the normal two-pass result.
  */
class MedianNarrowingSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("forced full narrowing matches the two-pass median exactly") {
    val normal = RelationalQueries.q17fMedian2Pass(spark, dir).collect()
    val forced = RelationalQueries.q17fMedian2Pass(spark, dir, pass2Limit = 1L)
      .collect()
    graft.CacheScope.releaseAll()
    assert(normal.length == 1 && forced.length == 1)
    assert(normal.head == forced.head,
      s"narrowed ${forced.head} != two-pass ${normal.head}")
  }

  test("q162b approx quantiles land within the GK rank-error window of " +
      "the exact q162 rank selection (every source, every percentile)") {
    // the covering unit for q162b's rows-only tier: for each source the
    // sketch's value must occupy a rank within n/accuracy (+1 discrete
    // slack) of the exact target rank in that source's sorted lengths
    val dir01 = "/root/testdata/sf0.01"
    val exactBySource = graft.Tables.documents(spark, dir01)
      .select(org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.size(
          graft.ops.TextOps.tokenize(
            org.apache.spark.sql.functions.col("text"))).cast("long")
          .as("n"))
      .collect().groupBy(_.getString(0))
      .map { case (s, rows) => s -> rows.map(_.getLong(1)).sorted }
    val approx = AnalysisQueries.q162bLengthQuantilesApprox(spark, dir01)
      .collect()
    graft.CacheScope.releaseAll()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val sorted = exactBySource(r.getString(0))
      val n = sorted.length
      val slack = n / CurationQueries.PctAccuracy + 1
      for ((p, got) <- Seq(10 -> r.getLong(2), 50 -> r.getLong(3),
          90 -> r.getLong(4))) {
        val target = (n - 1) * p / 100 // 0-based exact rank
        val lo = sorted.indexOf(got)
        val hi = sorted.lastIndexOf(got)
        assert(lo >= 0, s"source ${r.getString(0)} p$p value $got not in data")
        assert(target >= lo - slack && target <= hi + slack,
          s"source ${r.getString(0)} p$p: value $got holds ranks [$lo,$hi], " +
            s"target $target, slack $slack")
      }
    }
  }
}
