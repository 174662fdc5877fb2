package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Typed top-k aggregator (SURVEY.md §4.3): keeps the k best (score,
  * payload) pairs in a bounded min-heap.
  *
  * Why it matters at scale: a window `row_number <= k` must sort every
  * group's candidates (WindowGroupLimit prunes per partition but still
  * shuffles all surviving rows and sorts per group). An Aggregator is
  * PARTIAL-AGGREGABLE — each map task reduces its slice to k rows before
  * the shuffle, so the exchange carries `tasks × k` rows instead of all
  * candidates; the reduce side merges heaps. For brute-force kNN over N
  * candidates per query that's the difference between shuffling N rows
  * and shuffling k.
  *
  * Determinism: ordering is (score desc, id asc) — equal-score ties keep
  * the smaller id, matching the window formulation used by the oracle.
  */
object TopKAggregator {

  /** One scored candidate. */
  case class Scored(id: Long, score: Long)

  /** Heap ordering: dequeue() removes the ordering's MAX, so the worst
    * element (lowest score; among equal scores, the larger id) must rank
    * highest — achieved by ordering on (-score, id).
    */
  private val worstFirst: Ordering[Scored] =
    Ordering.by[Scored, (Long, Long)](s => (-s.score, s.id))

  class TopK(k: Int) extends Aggregator[Scored, mutable.PriorityQueue[Scored], Seq[Scored]] {
    override def zero: mutable.PriorityQueue[Scored] =
      mutable.PriorityQueue.empty(worstFirst)

    override def reduce(b: mutable.PriorityQueue[Scored], a: Scored): mutable.PriorityQueue[Scored] = {
      b.enqueue(a)
      if (b.size > k) b.dequeue()
      b
    }

    override def merge(b1: mutable.PriorityQueue[Scored], b2: mutable.PriorityQueue[Scored]): mutable.PriorityQueue[Scored] = {
      b2.foreach { s => b1.enqueue(s); if (b1.size > k) b1.dequeue() }
      b1
    }

    /** Best first: (score desc, id asc). */
    override def finish(b: mutable.PriorityQueue[Scored]): Seq[Scored] =
      b.toSeq.sortBy(s => (-s.score, s.id))

    override def bufferEncoder: Encoder[mutable.PriorityQueue[Scored]] =
      Encoders.kryo[mutable.PriorityQueue[Scored]]

    override def outputEncoder: Encoder[Seq[Scored]] =
      ExpressionEncoder[Seq[Scored]]()
  }
}
