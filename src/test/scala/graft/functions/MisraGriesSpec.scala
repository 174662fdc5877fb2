package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Unit coverage for the Misra-Gries sketch and the sketch-then-verify
  * [[graft.ops.TextAnalysisOps.heavyHitters]] built on it (ADVICE r7):
  * the superset guarantee under partitioned + merged input, the merge
  * rule itself, and end-to-end equality with a brute-force threshold
  * groupBy.
  */
class MisraGriesSpec extends SparkSpec {
  import sqlImplicits._

  /** Zipf-ish deterministic stream: token i appears ~N/i times. */
  private def zipfStream: Seq[String] =
    (1 to 60).flatMap(i => Seq.fill(600 / i)(s"t$i"))

  private def exactAbove(stream: Seq[String], den: Long): Set[String] = {
    val n = stream.size.toLong
    stream.groupBy(identity).collect {
      case (t, occ) if occ.size.toLong * den > n => t
    }.toSet
  }

  test("single-buffer reduce keeps every item above n/(k+1)") {
    val stream = zipfStream
    val k = 19
    val sk = new MisraGries.Sketch(k)
    val buf = stream.foldLeft(sk.zero)(sk.reduce)
    val cands = sk.finish(buf).toSet
    val mustKeep = exactAbove(stream, (k + 1).toLong)
    assert(mustKeep.subsetOf(cands),
      s"missing ${mustKeep -- cands} from MG candidates")
    assert(cands.size <= k)
  }

  test("merged partitioned buffers keep the superset guarantee " +
      "(capacity >= den-1) for every partitioning and merge order") {
    val stream = zipfStream
    val den = 12L
    val k = 16 // >= den - 1
    val sk = new MisraGries.Sketch(k)
    val mustKeep = exactAbove(stream, den)
    // several partition counts, including skewed uneven splits
    for (parts <- Seq(2, 3, 7, 16)) {
      val bufs = stream.grouped(math.max(1, stream.size / parts)).toSeq
        .map(chunk => chunk.foldLeft(sk.zero)(sk.reduce))
      val mergedLtr = bufs.reduce(sk.merge)
      assert(mustKeep.subsetOf(sk.finish(mergedLtr).toSet),
        s"parts=$parts ltr merge lost a true heavy hitter")
    }
    // reversed merge order over fresh buffers (merge mutates its args)
    val bufsR = stream.grouped(97).toSeq
      .map(chunk => chunk.foldLeft(sk.zero)(sk.reduce))
    val mergedRtl = bufsR.reverse.reduce(sk.merge)
    assert(mustKeep.subsetOf(sk.finish(mergedRtl).toSet))
  }

  test("merge rule subtracts the (k+1)-th largest and drops non-positive") {
    val sk = new MisraGries.Sketch(2)
    val b1 = mutable.HashMap("a" -> 10L, "b" -> 4L)
    val b2 = mutable.HashMap("c" -> 3L, "b" -> 1L)
    // merged pointwise: a=10, b=5, c=3; 3 > k=2 → subtract 3rd largest (3)
    val m = sk.merge(b1, b2)
    assert(m == mutable.HashMap("a" -> 7L, "b" -> 2L))
  }

  test("reduce at capacity decrements all instead of inserting") {
    val sk = new MisraGries.Sketch(2)
    var b = sk.zero
    b = sk.reduce(b, "a"); b = sk.reduce(b, "a"); b = sk.reduce(b, "b")
    b = sk.reduce(b, "c") // full: a,b decremented, c discarded
    assert(b == mutable.HashMap("a" -> 1L))
  }

  test("heavyHitters end-to-end equals the brute-force threshold query, " +
      "ordered (cnt desc, token)") {
    val den = 10L
    val terms = zipfStream.toDF("tok").repartition(5)
    val got = graft.ops.TextAnalysisOps.heavyHitters(terms, capacity = 32, den = den)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val n = zipfStream.size.toLong
    val want = zipfStream.groupBy(identity).toSeq
      .map { case (t, occ) => (t, occ.size.toLong) }
      .filter { case (_, c) => c * den > n }
      .sortBy { case (t, c) => (-c, t) }
    assert(got == want)
    graft.CacheScope.releaseAll()
  }

  test("degenerate den is rejected") {
    intercept[IllegalArgumentException] {
      graft.ops.TextAnalysisOps.heavyHitters(Seq("a").toDF("tok"), 4, 0L)
    }
  }

  test("heavyHittersBy equals the per-group brute-force threshold query, " +
      "groups independent") {
    // two groups with DIFFERENT sizes and distributions: the per-group MG
    // guarantee must hold for each independently (a group's threshold is
    // its OWN n/den), and one group's candidates must never leak into
    // another's output
    val den = 10L
    val a = zipfStream.map(("srcA", _))
    val b = (1 to 20).flatMap(i => Seq.fill(100 / i)(s"u$i")).map(("srcB", _))
    val terms = (a ++ b).toDF("source", "tok").repartition(5)
    val got = graft.ops.TextAnalysisOps
      .heavyHittersBy(terms, "source", capacity = 32, den = den)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val want = Seq("srcA" -> a.map(_._2), "srcB" -> b.map(_._2))
      .flatMap { case (src, stream) =>
        val n = stream.size.toLong
        stream.groupBy(identity).toSeq
          .map { case (t, occ) => (src, t, occ.size.toLong) }
          .filter { case (_, _, c) => c * den > n }
      }
      .sortBy { case (s, t, c) => (s, -c, t) }
    assert(got == want)
    graft.CacheScope.releaseAll()
  }
}
