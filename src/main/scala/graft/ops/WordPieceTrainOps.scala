package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WordPiece vocabulary TRAINING (Schuster & Nakajima 2012; the
  * `tokenizers` WordPieceTrainer is the public reference implementation):
  * identical mechanics to BPE training — repeatedly merge an adjacent
  * symbol pair across a weighted word vocabulary — but the argmax is the
  * LIKELIHOOD score
  *
  *   score(l, r) = count(l, r) / (count(l) · count(r))
  *
  * (the pair that most exceeds what its parts' independent frequencies
  * predict), not the raw pair count. Word-internal symbols carry the
  * `##` continuation prefix from the initial split, so merges stay
  * class-correct (`a + ##b → ab`, `##a + ##b → ##ab`) and the trained
  * pieces drop straight into [[graft.functions.WordPieceEncode]]'s
  * greedy longest-match.
  *
  * Same hybrid shape as [[BpeTrainOps]] — ONE corpus-sized vocabulary
  * aggregation, a scalar-bound collect, driver-local merge rounds — with
  * one deliberate difference: each round's argmax SCANS the live pair
  * map instead of using a lazy heap. A score's denominator changes
  * whenever either symbol's global count moves, which invalidates heap
  * entries wholesale (the reference trainer rescans too); the round cost
  * is O(live pairs), bounded by the vocabulary cap, independent of
  * corpus size. Scores compare EXACTLY by cross-multiplication in BigInt
  * — no float ordering anywhere, so merge decisions are deterministic
  * and golden-testable.
  */
object WordPieceTrainOps {

  import graft.functions.WordPiece.Cont

  /** Marked code-point split: first symbol plain, the rest `##`-prefixed. */
  private[graft] def markedSplit(w: String): Vector[String] = {
    val syms = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val s = new String(Character.toChars(cp))
      syms += (if (i == 0) s else Cont + s)
      i += Character.charCount(cp)
    }
    syms.toVector
  }

  /** Merged piece of two adjacent marked symbols: the right part's `##`
    * marker dissolves into the join.
    */
  private[graft] def join(l: String, r: String): String =
    l + (if (r.startsWith(Cont)) r.substring(Cont.length) else r)

  /** Driver-local merge rounds over an in-memory `(word, count)`
    * vocabulary. Returns `(rank, left, right, merged, pair_count,
    * left_count, right_count)` — counts AT DECISION TIME, so each round's
    * winning score is reconstructible exactly.
    */
  def trainLocal(vocab: Seq[(String, Long)], numMerges: Int,
                 minPairCount: Long): Seq[(Int, String, String, String, Long, Long, Long)] = {
    import scala.collection.mutable
    val words = vocab.map { case (w, _) => mutable.ArrayBuffer(markedSplit(w): _*) }.toArray
    val counts = vocab.map(_._2).toArray
    val pairCount = mutable.HashMap[(String, String), Long]()
    val pairWords = mutable.HashMap[(String, String), mutable.BitSet]()
    val symCount = mutable.HashMap[String, Long]()
    words.indices.foreach { wi =>
      val syms = words(wi)
      val c = counts(wi)
      syms.foreach(s => symCount.update(s, symCount.getOrElse(s, 0L) + c))
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        pairCount.update(p, pairCount.getOrElse(p, 0L) + c)
        pairWords.getOrElseUpdate(p, mutable.BitSet()) += wi
        j += 1
      }
    }
    val out = mutable.ArrayBuffer.empty[(Int, String, String, String, Long, Long, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // exact rational argmax: n1/(l1·r1) vs n2/(l2·r2) by cross-multiply;
      // ties broken lexicographically on (left, right) ascending
      var best: ((String, String), Long) = null
      pairCount.foreach { case (p, n) =>
        if (n >= minPairCount) {
          if (best == null) best = (p, n)
          else {
            val (bp, bn) = best
            val lhs = BigInt(n) * symCount(bp._1) * symCount(bp._2)
            val rhs = BigInt(bn) * symCount(p._1) * symCount(p._2)
            val c = lhs.compare(rhs)
            if (c > 0 || (c == 0 &&
                (p._1 < bp._1 || (p._1 == bp._1 && p._2 < bp._2))))
              best = (p, n)
          }
        }
      }
      if (best == null) done = true
      else {
        val ((l, r), n) = best
        out += ((rank, l, r, join(l, r), n, symCount(l), symCount(r)))
        val merged = join(l, r)
        val affected = pairWords.remove((l, r)).getOrElse(mutable.BitSet())
        pairCount.remove((l, r))
        affected.foreach { wi =>
          val syms = words(wi)
          var j = 0
          var has = false
          while (!has && j < syms.length - 1) {
            has = syms(j) == l && syms(j + 1) == r
            j += 1
          }
          if (has) { // pairWords is a superset index; skip stale members
            val c = counts(wi)
            var k = 0
            while (k < syms.length - 1) {
              val p = (syms(k), syms(k + 1))
              if (p != ((l, r))) {
                val nv = pairCount.getOrElse(p, 0L) - c
                if (nv <= 0L) pairCount.remove(p) else pairCount.update(p, nv)
              }
              k += 1
            }
            syms.foreach { s =>
              val nv = symCount.getOrElse(s, 0L) - c
              if (nv <= 0L) symCount.remove(s) else symCount.update(s, nv)
            }
            val rewritten = mutable.ArrayBuffer.empty[String]
            var m = 0
            while (m < syms.length) {
              if (m < syms.length - 1 && syms(m) == l && syms(m + 1) == r) {
                rewritten += merged
                m += 2
              } else {
                rewritten += syms(m)
                m += 1
              }
            }
            words(wi) = rewritten
            rewritten.foreach(s =>
              symCount.update(s, symCount.getOrElse(s, 0L) + c))
            var t = 0
            while (t < rewritten.length - 1) {
              val p = (rewritten(t), rewritten(t + 1))
              if (p != ((l, r))) {
                pairCount.update(p, pairCount.getOrElse(p, 0L) + c)
                pairWords.getOrElseUpdate(p, mutable.BitSet()) += wi
              }
              t += 1
            }
          }
        }
        rank += 1
      }
    }
    out.toSeq
  }

  /** Encoder vocabulary implied by a training run: every single-char
    * marked symbol of the training words (so trained-corpus words always
    * segment) plus every merged piece.
    */
  def encoderVocab(vocab: Seq[(String, Long)],
                   merges: Seq[(Int, String, String, String, Long, Long, Long)]): Seq[String] = {
    val singles = vocab.iterator.flatMap { case (w, _) => markedSplit(w) }
      .toSeq.distinct
    (singles ++ merges.map(_._4)).distinct
  }

  /** Train on `docs.text`: [[BpeTrainOps.wordVocab]]'s one distributed
    * aggregation, a scalar-bound collect, then [[trainLocal]].
    */
  def train(spark: SparkSession, docs: DataFrame, numMerges: Int,
            minPairCount: Long = 2L, maxVocab: Int = 1 << 16): DataFrame = {
    val vocab = BpeTrainOps.wordVocab(docs, maxVocab).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val rules = trainLocal(vocab, numMerges, minPairCount)
      .map { case (k, l, r, m, n, lc, rc) => Row(k, l, r, m, n, lc, rc) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rules, 1), MergeSchema)
  }

  /** Schema of [[train]]'s output. */
  val MergeSchema: StructType = StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("left", StringType, nullable = false),
    StructField("right", StringType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("pair_count", LongType, nullable = false),
    StructField("left_count", LongType, nullable = false),
    StructField("right_count", LongType, nullable = false)))
}
