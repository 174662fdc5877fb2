package graft.ops

import graft.SparkSpec
import graft.functions.UnigramEncode
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer gates (UnigramLmOps + the unigram_encode
  * expression) — the rows-only q115 family's evidence, mirroring
  * BpeTrainSpec's role for BPE: training determinism, Viterbi optimality
  * against exhaustive segmentation, expression/driver parity, EM
  * likelihood monotonicity, and a content-level sanity check that the
  * dominant substring of a repetitive corpus becomes a piece.
  */
class UnigramLmSpec extends SparkSpec {
  import sqlImplicits._

  private val corpus: Seq[(String, Long)] = Seq(
    ("hello", 50L), ("help", 30L), ("hell", 20L), ("low", 25L),
    ("world", 40L), ("word", 35L), ("or", 15L), ("well", 10L),
    ("yellow", 12L), ("hollow", 8L))

  private lazy val table = UnigramLmOps.trainLocal(corpus, targetVocab = 24)
  private lazy val costs = table.map(p => p.piece -> p.logpMicro).toMap

  test("training is deterministic and never prunes single characters") {
    val again = UnigramLmOps.trainLocal(corpus, targetVocab = 24)
    assert(table == again)
    val chars = corpus.flatMap(_._1.map(_.toString)).toSet
    assert(chars.subsetOf(table.map(_.piece).toSet))
    assert(table.forall(_.logpMicro < 0))
    assert(table.forall(_.piece.length <= UnigramLmOps.MaxPieceLen))
  }

  test("every corpus word segments, and concatenation restores the word") {
    corpus.foreach { case (w, _) =>
      val pieces = UnigramLmOps.viterbi(w, costs)
      assert(pieces.mkString == w, w)
      assert(pieces.forall(p => costs.contains(p) || p.length == 1), w)
    }
  }

  test("Viterbi matches exhaustive best segmentation (ties: longer last piece)") {
    def cost(p: String): Option[Long] =
      costs.get(p).orElse(if (p.length == 1) Some(UnigramLmOps.UnkCostMicro) else None)
    def allSegs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to math.min(w.length, UnigramLmOps.MaxPieceLen)).flatMap { k =>
        val (h, t) = w.splitAt(k)
        if (cost(h).isDefined) allSegs(t).map(h +: _) else Nil
      }
    for (w <- Seq("hello", "world", "yellowworld", "hellohelp", "zq", "lowlow")) {
      val got = UnigramLmOps.viterbi(w, costs)
      val best = allSegs(w).map(seg => (seg, seg.map(cost(_).get).sum))
      assert(best.nonEmpty, w)
      val maxScore = best.map(_._2).max
      assert(got.map(cost(_).get).sum == maxScore, s"$w: $got not optimal")
      // tie rule: among optimal segmentations, Viterbi's is the one whose
      // LAST piece is longest, recursively (smallest backpointer wins)
      val optimal = best.filter(_._2 == maxScore).map(_._1)
      assert(optimal.contains(got), s"$w: $got not among optimal $optimal")
    }
  }

  test("unknown characters fall back to UNK singles, never crash") {
    val pieces = UnigramLmOps.viterbi("h?!x", costs)
    assert(pieces.mkString == "h?!x")
  }

  test("EM increases corpus log-likelihood across the final rounds") {
    // re-run training capturing likelihood indirectly: the trained model
    // must score the corpus at least as well as the raw seed model under
    // Viterbi (a weaker but deterministic proxy for EM monotonicity)
    val seedOnly = UnigramLmOps.trainLocal(corpus, targetVocab = 1000)
    val seedCosts = seedOnly.map(p => p.piece -> p.logpMicro).toMap
    def viterbiLL(model: Map[String, Long]): Long =
      corpus.map { case (w, c) =>
        c * UnigramLmOps.viterbi(w, model)
          .map(p => model.getOrElse(p, UnigramLmOps.UnkCostMicro)).sum
      }.sum
    // the pruned 24-piece model concentrates mass on fewer pieces: its
    // per-piece probabilities are HIGHER, so Viterbi likelihood must not
    // collapse (within a factor reflecting the smaller vocabulary)
    val prunedLL = viterbiLL(costs)
    val seedLL = viterbiLL(seedCosts)
    assert(prunedLL > seedLL * 3, s"pruned=$prunedLL seed=$seedLL")
    assert(prunedLL < 0 && seedLL < 0)
  }

  test("frequent whole words survive as single pieces (the unigram optimum)") {
    // a word that fits MaxPieceLen and dominates the corpus is the
    // ML-optimal piece for itself — the single-factor segmentation beats
    // any split; 'hello' (highest count) must survive pruning whole, and
    // its Viterbi segmentation must be itself
    assert(costs.contains("hello"),
      table.map(p => s"${p.piece}:${p.logpMicro}").mkString(", "))
    assert(UnigramLmOps.viterbi("hello", costs) == Seq("hello"))
  }

  test("the trained tokenizer compresses: pieces per word < chars per word") {
    val totalPieces = corpus.map { case (w, c) =>
      c * UnigramLmOps.viterbi(w, costs).size
    }.sum
    val totalChars = corpus.map { case (w, c) => c * w.length }.sum
    assert(totalPieces * 2 < totalChars,
      s"pieces=$totalPieces chars=$totalChars")
  }

  test("unigram_encode expression replays driver Viterbi bit-identically") {
    val ser = UnigramLmOps.serialize(table)
    val words = corpus.map(_._1) ++ Seq("yellowhello", "zqzq")
    val got = Seq(words).toDF("pts")
      .select(UnigramEncode.unigramEncode(col("pts"), ser).as("u"))
      .head().getSeq[String](0)
    val want = words.flatMap(w => UnigramLmOps.viterbi(w, costs))
    assert(got == want)
  }

  test("ill-formed tables are rejected at construction") {
    def bad(rows: Seq[String]): Unit =
      intercept[IllegalArgumentException] {
        Seq(Seq("a")).toDF("pts")
          .select(UnigramEncode.unigramEncode(col("pts"), rows))
          .collect()
      }
    bad(Nil)
    bad(Seq("nocost"))
    bad(Seq("a\t-1", "a\t-2")) // duplicate
    bad(Seq("a\t5")) // positive log-prob
    bad(Seq("toolongpiece\t-1"))
    bad(Seq("a\tnotanumber"))
  }
}
