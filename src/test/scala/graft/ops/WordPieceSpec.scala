package graft.ops

import graft.SparkSpec
import graft.functions.WordPiece

/** Gate for the WordPiece family (q22c fixed-vocab encode, q87d trainer,
  * q87e trained encode): encode semantics against hand-computed cases,
  * trainer golden parity against an independent recount-every-round
  * reference, and the segmentation invariants the rows-only registry
  * entries rely on.
  */
class WordPieceSpec extends SparkSpec {
  import sqlImplicits._
  import org.apache.spark.sql.functions.col

  // --- encode semantics ----------------------------------------------------

  private val vocab =
    Seq("a", "b", "c", "##a", "##b", "##c", "ab", "##bc", "abc")
  private val vSet = vocab.toSet
  private val maxLen = 3

  test("greedy longest-match-first, continuation classes respected") {
    // "abc" matches the full-word piece outright
    assert(WordPiece.encodeWord("abc", vSet, maxLen).toSeq == Seq("abc"))
    // "abca": longest start piece "abc", then continuation "##a"
    assert(WordPiece.encodeWord("abca", vSet, maxLen).toSeq ==
      Seq("abc", "##a"))
    // "ba": no "ba" piece, so "b" then "##a"
    assert(WordPiece.encodeWord("ba", vSet, maxLen).toSeq == Seq("b", "##a"))
    // greedy, not optimal: "abbc" → "ab" + "##b"?? no — "ab" then "##bc"
    assert(WordPiece.encodeWord("abbc", vSet, maxLen).toSeq ==
      Seq("ab", "##bc"))
  }

  test("whole-word UNK on any unmatchable position (the BERT contract)") {
    assert(WordPiece.encodeWord("abx", vSet, maxLen).toSeq ==
      Seq(WordPiece.Unk))
    assert(WordPiece.encodeWord("x", vSet, maxLen).toSeq == Seq(WordPiece.Unk))
  }

  test("expression output matches driver encode over a DataFrame") {
    val df = Seq((1L, Seq("abc", "ba", "abx")), (2L, Seq("abca")))
      .toDF("id", "pts")
    val out = df.select(col("id"),
      WordPiece.wordpieceEncode(col("pts"), vocab).as("toks"))
      .orderBy("id").collect()
    assert(out(0).getSeq[String](1) ==
      Seq("abc", "b", "##a", WordPiece.Unk))
    assert(out(1).getSeq[String](1) == Seq("abc", "##a"))
  }

  // --- trainer golden parity ----------------------------------------------

  // Independent reference inlined below: recount pairs AND symbol counts
  // from scratch every round, argmax by exact rational score with (l, r)
  // tie-break — no incremental state shared with the production trainer.
  test("trainer matches a recount-every-round reference on a small corpus") {
    val corpus = Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L),
      ("lowest", 4L), ("newer", 5L), ("wider", 2L))
    val trained = WordPieceTrainOps.trainLocal(corpus, 10, 1L)
    // independent recount reference, straightforward and quadratic
    var words = corpus.map { case (w, c) => (WordPieceTrainOps.markedSplit(w), c) }
    val expect = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    var continue = true
    while (rounds < 10 && continue) {
      val sym = scala.collection.mutable.Map.empty[String, Long]
      val pair = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.foreach(s => sym(s) = sym.getOrElse(s, 0L) + c)
        syms.zip(syms.drop(1)).foreach(p => pair(p) = pair.getOrElse(p, 0L) + c)
      }
      if (pair.isEmpty) continue = false
      else {
        var best: ((String, String), Long) = null
        pair.foreach { case (p, n) =>
          if (best == null) best = (p, n)
          else {
            val (bp, bn) = best
            val lhs = BigInt(n) * sym(bp._1) * sym(bp._2)
            val rhs = BigInt(bn) * sym(p._1) * sym(p._2)
            val c = lhs.compare(rhs)
            if (c > 0 || (c == 0 &&
                (p._1 < bp._1 || (p._1 == bp._1 && p._2 < bp._2)))) best = (p, n)
          }
        }
        val ((l, r), _) = best
        expect += ((l, r))
        words = words.map { case (syms, c) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var m = 0
          while (m < syms.length) {
            if (m < syms.length - 1 && syms(m) == l && syms(m + 1) == r) {
              merged += WordPieceTrainOps.join(l, r); m += 2
            } else { merged += syms(m); m += 1 }
          }
          (merged.toVector, c)
        }
        rounds += 1
      }
    }
    assert(trained.map(t => (t._2, t._3)) == expect.toSeq,
      s"merge decisions diverge:\n${trained.map(t => (t._2, t._3))}\nvs\n$expect")
  }

  test("trained encoder round-trips the training corpus with zero UNK") {
    val corpus = Seq(("low", 5L), ("lowest", 4L), ("newer", 5L), ("wide", 2L))
    val merges = WordPieceTrainOps.trainLocal(corpus, 6, 1L)
    val pieces = WordPieceTrainOps.encoderVocab(corpus, merges)
    val maxLen = pieces.map(p =>
      if (p.startsWith("##")) p.length - 2 else p.length).max
    corpus.foreach { case (w, _) =>
      val toks = WordPiece.encodeWord(w, pieces.toSet, maxLen)
      assert(!toks.contains(WordPiece.Unk), s"UNK on training word $w")
      val rebuilt = toks.map(t => t.stripPrefix("##")).mkString
      assert(rebuilt == w, s"round-trip $w -> ${toks.mkString(" ")}")
    }
  }

  test("merged pieces preserve continuation class") {
    val corpus = Seq(("aaa", 9L), ("aab", 3L))
    val merges = WordPieceTrainOps.trainLocal(corpus, 4, 1L)
    merges.foreach { case (_, l, r, m, _, _, _) =>
      assert(r.startsWith("##"), s"right part of a word-internal merge: $r")
      assert(m.startsWith("##") == l.startsWith("##"),
        s"merged $m changes class vs left $l")
    }
  }
}
