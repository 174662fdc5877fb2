package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Unigram language-model tokenizer TRAINING (Kudo 2018, "Subword
  * Regularization" — the public SentencePiece unigram algorithm): the
  * OTHER production tokenizer family beside BPE ([[BpeTrainOps]]). Where
  * BPE grows a vocabulary bottom-up by merging, unigram LM starts from a
  * large seed of candidate pieces and PRUNES: EM re-estimates piece
  * probabilities under the one-gram segmentation model, then the
  * lowest-mass pieces are dropped until the target size is reached.
  * Segmentation is Viterbi — the max-probability split of each word.
  *
  * Same hybrid shape as [[BpeTrainOps.train]] (the 100 TB design):
  *   1. ONE corpus-sized aggregation builds the capped word-frequency
  *      vocabulary ([[BpeTrainOps.wordVocab]] — the only job whose cost
  *      scales with the corpus);
  *   2. the capped relation is collected once (scalar-bound);
  *   3. seeding, EM, and pruning run as pure driver CPU over it —
  *      O(1) Spark jobs regardless of EM rounds.
  *
  * Documented simplifications vs SentencePiece (each the standard
  * bounded-tier trade, like SuffixArrayOps' sampling): the seed is all
  * frequency-capped substrings up to [[MaxPieceLen]] (SP uses a suffix
  * array to the same effect); pruning drops the lowest EXPECTED-COUNT
  * pieces by [[ShrinkFactor]] (SP ranks by likelihood loss — expected
  * count is its dominant term); EM uses exact per-word forward-backward,
  * identical to SP. Single characters are never pruned, so every word
  * always segments.
  *
  * Determinism: every map is iterated in sorted order, every tie breaks
  * on the piece string, and the arithmetic is sequential driver doubles
  * — the same (vocab, target) input always yields the byte-identical
  * table (unit-gated). The OUTPUT quantizes log-probs to integer
  * micro-units, so downstream Viterbi encoding ([[viterbi]], the
  * `unigram_encode` expression) is pure integer DP — engine-portable
  * and replayable.
  */
object UnigramLmOps {

  /** Longest candidate piece seeded. */
  val MaxPieceLen = 8

  /** Seed cap = SeedFactor × targetVocab (SP trains with a large seed and
    * prunes down; 4× keeps the driver working set tiny).
    */
  val SeedFactor = 4

  /** Fraction of prunable pieces KEPT per prune round (SP's default
    * shrinking_factor=0.75).
    */
  val ShrinkFactor = 0.75

  /** EM iterations between prune rounds (SP default 2). */
  val EmRounds = 2

  /** Cost of an unknown single character (no trained piece covers it) in
    * micro log-prob units — well below any trained piece, so it is used
    * only when unavoidable.
    */
  val UnkCostMicro: Long = -20000000L

  /** A trained table row: piece and its quantized log-probability. */
  final case class Piece(piece: String, logpMicro: Long)

  /** Driver-side training over the capped `(word, count)` vocabulary.
    * Returns pieces sorted (piece asc) with `floor(1e6 * ln p)` costs.
    */
  def trainLocal(vocab: Seq[(String, Long)], targetVocab: Int): Seq[Piece] = {
    require(targetVocab >= 1, s"targetVocab must be positive: $targetVocab")
    require(vocab.nonEmpty, "empty training vocabulary")
    val words = vocab.sortBy { case (w, c) => (-c, w) }
    // mandatory single-character pieces (never pruned)
    val chars: Set[String] =
      words.iterator.flatMap(_._1.map(_.toString)).toSet
    // seed: substrings 2..MaxPieceLen weighted by word count, capped
    val sub = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var j = i + 2
        while (j <= math.min(w.length, i + MaxPieceLen)) {
          val s = w.substring(i, j)
          sub.update(s, sub.getOrElse(s, 0L) + c)
          j += 1
        }
        i += 1
      }
    }
    val seedCap = math.max(targetVocab * SeedFactor - chars.size, 0)
    // SP's seed score is freq × len (a long frequent substring saves more
    // factors per use than a short one of equal frequency); ties on the
    // piece string keep the cap deterministic
    val seeded: Seq[String] = sub.toSeq
      .sortBy { case (s, c) => (-c * s.length, s) }
      .take(seedCap).map(_._1)
    // initial probs proportional to seed frequency (chars get their
    // corpus char frequency)
    val charFreq = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, c) =>
      w.foreach { ch =>
        val s = ch.toString
        charFreq.update(s, charFreq.getOrElse(s, 0L) + c)
      }
    }
    var pieces: Map[String, Double] = {
      val raw = (chars.toSeq.map(s => s -> charFreq(s).toDouble) ++
        seeded.map(s => s -> sub(s).toDouble)).toMap
      val tot = raw.toSeq.sortBy(_._1).map(_._2).sum
      raw.map { case (s, f) => s -> math.log(f / tot) }
    }

    def emStep(current: Map[String, Double]): Map[String, Double] = {
      val expected = scala.collection.mutable.HashMap.empty[String, Double]
      words.foreach { case (w, c) =>
        accumulateExpected(w, c, current, expected)
      }
      val kept = expected.toSeq.filter(_._2 > 0).sortBy(_._1)
      val tot = kept.map(_._2).sum
      // chars must survive even at zero mass: floor them at one
      // occurrence's worth so the model stays total
      val floorMass = 1.0 / math.max(tot, 1.0)
      (chars.map { s =>
        val m = expected.getOrElse(s, 0.0)
        s -> math.log(math.max(m / tot, floorMass * 1e-6))
      } ++ kept.collect {
        case (s, m) if !chars.contains(s) => s -> math.log(m / tot)
      }).toMap
    }

    var size = pieces.size
    while (size > targetVocab) {
      var r = 0
      while (r < EmRounds) { pieces = emStep(pieces); r += 1 }
      // prune: drop the lowest-probability NON-CHAR pieces
      val prunable = pieces.toSeq
        .filter { case (s, _) => !chars.contains(s) }
        .sortBy { case (s, lp) => (lp, s) } // lowest mass first
      val targetPrunable = math.max(targetVocab - chars.size, 0)
      val keep = math.max((prunable.size * ShrinkFactor).toInt, targetPrunable)
      val dropped = prunable.take(prunable.size - math.min(keep, prunable.size))
        .map(_._1).toSet
      pieces = pieces.filter { case (s, _) => !dropped.contains(s) }
      if (pieces.size == size) { // cannot shrink further (all chars)
        size = targetVocab
      } else size = pieces.size
    }
    var r = 0
    while (r < EmRounds) { pieces = emStep(pieces); r += 1 }
    pieces.toSeq.sortBy(_._1).map { case (s, lp) =>
      Piece(s, math.floor(lp * 1e6).toLong)
    }
  }

  /** Exact forward-backward over one word: adds each piece's expected
    * occurrence count (times the word count) into `out`.
    */
  private def accumulateExpected(w: String, count: Long,
                                 model: Map[String, Double],
                                 out: scala.collection.mutable.HashMap[String, Double]): Unit = {
    val n = w.length
    val NegInf = Double.NegativeInfinity
    def logAdd(a: Double, b: Double): Double =
      if (a == NegInf) b
      else if (b == NegInf) a
      else if (a > b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))
    val alpha = Array.fill(n + 1)(NegInf)
    val beta = Array.fill(n + 1)(NegInf)
    alpha(0) = 0.0
    var i = 0
    while (i < n) {
      if (alpha(i) != NegInf) {
        var j = i + 1
        while (j <= math.min(n, i + MaxPieceLen)) {
          model.get(w.substring(i, j)).foreach { lp =>
            alpha(j) = logAdd(alpha(j), alpha(i) + lp)
          }
          j += 1
        }
      }
      i += 1
    }
    beta(n) = 0.0
    i = n - 1
    while (i >= 0) {
      var j = i + 1
      while (j <= math.min(n, i + MaxPieceLen)) {
        if (beta(j) != NegInf) {
          model.get(w.substring(i, j)).foreach { lp =>
            beta(i) = logAdd(beta(i), lp + beta(j))
          }
        }
        j += 1
      }
      i -= 1
    }
    val z = alpha(n)
    if (z == NegInf) return // word not coverable under current model
    i = 0
    while (i < n) {
      if (alpha(i) != NegInf) {
        var j = i + 1
        while (j <= math.min(n, i + MaxPieceLen)) {
          if (beta(j) != NegInf) {
            val s = w.substring(i, j)
            model.get(s).foreach { lp =>
              val post = math.exp(alpha(i) + lp + beta(j) - z)
              out.update(s, out.getOrElse(s, 0.0) + post * count)
            }
          }
          j += 1
        }
      }
      i += 1
    }
  }

  /** Integer Viterbi segmentation of one word under a quantized table:
    * maximize the summed micro log-prob; unknown characters fall back to
    * [[UnkCostMicro]] singles. Ties prefer the LONGER last piece (the
    * lower split index), which makes the DP deterministic without a
    * second pass. Pure Long arithmetic — the expression twin replays it
    * bit-identically inside codegen.
    */
  def viterbi(w: String, table: Map[String, Long]): Seq[String] = {
    val n = w.length
    if (n == 0) return Nil
    val MinCost = Long.MinValue / 4
    val best = Array.fill(n + 1)(MinCost)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0L
    var i = 0
    while (i < n) {
      if (best(i) > MinCost) {
        var j = i + 1
        while (j <= math.min(n, i + MaxPieceLen)) {
          val c = table.get(w.substring(i, j)) match {
            case Some(lp) => lp
            case None => if (j == i + 1) UnkCostMicro else MinCost
          }
          if (c > MinCost) {
            val cand = best(i) + c
            // strict > with ascending i: on ties the SMALLEST i (longest
            // piece ending at j) wins because it was written first
            if (cand > best(j)) { best(j) = cand; back(j) = i }
          }
          j += 1
        }
      }
      i += 1
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var p = n
    while (p > 0) {
      val s = back(p)
      out.prepend(w.substring(s, p))
      p = s
    }
    out.toSeq
  }

  /** Serialized table rows `piece<TAB>logpMicro` — the runtime-table
    * format the `unigram_encode` expression ships with its plan.
    */
  def serialize(pieces: Seq[Piece]): Seq[String] =
    pieces.map(p => s"${p.piece}\t${p.logpMicro}")

  /** End-to-end training: one corpus aggregation, one bounded collect,
    * driver EM. Returns the trained table as a DataFrame
    * `(piece, logp_micro)` for registry/output use.
    */
  def train(spark: SparkSession, docs: DataFrame, targetVocab: Int,
            maxVocab: Int = 1 << 16): DataFrame = {
    import spark.implicits._
    val vocab = BpeTrainOps.wordVocab(docs, maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val table = trainLocal(vocab, targetVocab)
    spark.createDataset(table.map(p => (p.piece, p.logpMicro)))
      .toDF("piece", "logp_micro")
  }
}
