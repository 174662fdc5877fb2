package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Misra-Gries frequent-items sketch as a typed, PARTIAL-AGGREGABLE
  * Aggregator (Misra & Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012).
  *
  * Guarantee: a capacity-k summary over a stream of n items retains every
  * item whose true frequency exceeds n/(k+1); retained counts
  * underestimate true counts by at most n/(k+1). The summary is therefore
  * a sound CANDIDATE set for any heavy-hitter threshold >= n/(k+1) — it
  * can over-report, never miss.
  *
  * Why it matters at scale: the exact "tokens above n/D" query is a
  * groupBy over the FULL vocabulary — at corpus scale that shuffle
  * carries hundreds of millions of distinct keys to answer a question
  * about a handful. The sketch pass reduces each map task to <= k
  * counters before the exchange (Aggregator partial-agg), the merged
  * candidate set (<= k rows, a few KB) broadcasts back, and the exact
  * verification groupBy aggregates ONLY candidate rows — its shuffle
  * carries <= k keys per task. Two corpus scans instead of one, but the
  * wide all-vocabulary exchange disappears; the final output is EXACT
  * (sketch candidates are re-counted precisely and filtered), so sketch
  * internals never leak into the result.
  *
  * Determinism note: the candidate SET depends on partition merge order
  * (any superset of the true heavy hitters is sound), which is why
  * callers must exact-verify before emitting — see
  * [[graft.ops.TextAnalysisOps.heavyHitters]].
  */
object MisraGries {

  /** The MG update/merge core, shared by both aggregator flavors. Methods
    * mutate and return their first argument (Aggregator contract).
    */
  trait Core {
    def k: Int

    final def zeroBuf: mutable.HashMap[String, Long] = mutable.HashMap.empty

    final def reduceBuf(b: mutable.HashMap[String, Long],
                        a: String): mutable.HashMap[String, Long] = {
      b.get(a) match {
        case Some(c) => b.update(a, c + 1)
        case None if b.size < k => b.update(a, 1L)
        case None => decrementAll(b, 1L)
      }
      b
    }

    /** Mergeable-summaries rule: pointwise-sum the counters, then if more
      * than k survive, subtract the (k+1)-th largest count from all and
      * drop the non-positive — the merged summary keeps the MG error
      * bound additive in the inputs' stream lengths.
      */
    final def mergeBuf(b1: mutable.HashMap[String, Long],
                       b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      b2.foreach { case (t, c) => b1.update(t, b1.getOrElse(t, 0L) + c) }
      if (b1.size > k) {
        val counts = b1.values.toArray
        java.util.Arrays.sort(counts)
        decrementAll(b1, counts(counts.length - 1 - k))
      }
      b1
    }

    private def decrementAll(b: mutable.HashMap[String, Long], by: Long): Unit =
      b.filterInPlace { case (_, c) => c > by }
        .mapValuesInPlace { case (_, c) => c - by }
  }

  /** Capacity-`k` Misra-Gries summary of a String stream; finish() emits
    * the surviving candidate items (counts are deliberately withheld —
    * they are lower bounds, and the verified pass recomputes them
    * exactly).
    */
  class Sketch(val k: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Seq[String]]
      with Core {
    require(k > 0, s"capacity must be positive, got $k")

    override def zero: mutable.HashMap[String, Long] = zeroBuf
    override def reduce(b: mutable.HashMap[String, Long], a: String) =
      reduceBuf(b, a)
    override def merge(b1: mutable.HashMap[String, Long],
                       b2: mutable.HashMap[String, Long]) = mergeBuf(b1, b2)

    override def finish(b: mutable.HashMap[String, Long]): Seq[String] =
      b.keys.toSeq.sorted

    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]

    override def outputEncoder: Encoder[Seq[String]] =
      ExpressionEncoder[Seq[String]]()
  }

  /** Same sketch, but finish() keeps the counters — the cross-batch
    * flavor: a caller holding long-lived state (a streaming query's
    * driver, a multi-pass job) merges successive finished summaries with
    * [[Core.mergeBuf]] and retains the MG guarantee additively, which a
    * candidates-only finish would destroy. Counts remain LOWER BOUNDS;
    * exact use still requires a verify pass.
    */
  class SketchCounters(val k: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]]
      with Core {
    require(k > 0, s"capacity must be positive, got $k")

    override def zero: mutable.HashMap[String, Long] = zeroBuf
    override def reduce(b: mutable.HashMap[String, Long], a: String) =
      reduceBuf(b, a)
    override def merge(b1: mutable.HashMap[String, Long],
                       b2: mutable.HashMap[String, Long]) = mergeBuf(b1, b2)

    override def finish(b: mutable.HashMap[String, Long]): Map[String, Long] =
      b.toMap

    override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]

    override def outputEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder[Map[String, Long]]()
  }
}
