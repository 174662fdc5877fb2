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
}
