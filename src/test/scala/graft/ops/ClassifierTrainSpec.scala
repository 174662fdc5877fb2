package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the in-engine quality-classifier trainers (q177 NB /
  * q178 perceptron):
  *
  *   - the NB weights equal hand-computed floor-log2 odds on a designed
  *     corpus (the SQL oracle carries the fixture-scale proof; this is
  *     the semantics unit),
  *   - the perceptron equals an independent step-by-step replay
  *     (separate update code path, shared constants only — the
  *     BpeTrainSpec golden pattern) and is bit-deterministic,
  *   - training BEATS the fixed surrogate on a designed separable
  *     problem — the property that makes q178b's promotion row
  *     meaningful rather than decorative.
  */
class ClassifierTrainSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    import sqlImplicits._
    rows.toDF("doc_id", "text")
  }

  // a battery-passing sentence: >=5 tokens, high TTR, low stopword/punct
  private val goodText = "quick brown foxes jump over seven lazy dogs daily"
  // battery-failing: too few tokens
  private val badText = "spam spam"

  test("NB weights match hand-computed floor-log2 odds on a designed corpus") {
    // 2 good docs, 1 bad doc; token 'alpha' only in good, 'zzz' only in bad
    val docs = docsDf(Seq(
      (1L, goodText + " alpha alpha"),
      (2L, goodText + " alpha beta"),
      (3L, badText)))
    val labeled = TextAnalysisOps.batteryLabeled(docs)
      .select("doc_id", "good").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(labeled == Map(1L -> true, 2L -> true, 3L -> false))
    val w = TextAnalysisOps.nbTrainedWeights(
      TextAnalysisOps.batteryLabeled(docs)).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // hand-compute: good instances = 11 + 11 = 22 tokens, bad = 2
    def l2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val d = TextAnalysisOps.TrainedBuckets
    val (tg, tb) = (22L, 2L)
    val shift = -l2(tg + d) + l2(tb + d)
    def expected(g: Long, b: Long): Long = l2(g + 1) - l2(b + 1) + shift
    val alphaBucket = docs.sparkSession.range(1)
      .select((HashOps.charHash(lit("alpha")) % d).as("b"))
      .head().getLong(0)
    val spamBucket = docs.sparkSession.range(1)
      .select((HashOps.charHash(lit("spam")) % d).as("b"))
      .head().getLong(0)
    // 'alpha': 3 good instances, 0 bad; 'spam': 0 good, 2 bad
    assert(w(alphaBucket) == ((3L, 0L, expected(3L, 0L))))
    assert(w(spamBucket) == ((0L, 2L, expected(0L, 2L))))
    // every weight row restates its own counts through the same formula
    w.foreach { case (_, (g, b, wt)) => assert(wt == expected(g, b)) }
  }

  /** Independent replay of the averaged-perceptron contract: predict on
    * running weights, update on margin violation, publish the lazy
    * average u. Plain Map arithmetic — no shared code with the op's
    * Array loop.
    */
  private def replay(examples: Seq[(Long, Boolean, Seq[Long])],
                     epochs: Int): Map[Long, Long] = {
    var w = Map.empty[Long, Long].withDefaultValue(0L)
    var u = Map.empty[Long, Long].withDefaultValue(0L)
    val total = examples.size.toLong * epochs
    var step = 0L
    (1 to epochs).foreach { _ =>
      examples.foreach { case (_, good, feats) =>
        val y = if (good) 1L else -1L
        val s = feats.map(w).sum
        if (y * s <= 0L) {
          feats.foreach { b =>
            w = w.updated(b, w(b) + y)
            u = u.updated(b, u(b) + y * (total - step))
          }
        }
        step += 1L
      }
    }
    u.filter(_._2 != 0L)
  }

  test("perceptron equals an independent replay and is bit-deterministic") {
    val examples = Seq(
      (1L, true, Seq(7L, 7L, 12L)),
      (2L, false, Seq(12L, 99L)),
      (3L, true, Seq(7L, 3L)),
      (4L, false, Seq(99L, 99L, 3L)))
    val trained = ClassifierTrainOps.trainLocal(examples, epochs = 3, buckets = 128)
    assert(trained.toMap == replay(examples, 3))
    assert(trained == ClassifierTrainOps.trainLocal(examples, epochs = 3, buckets = 128))
  }

  test("perceptron learns a separable problem the fixed surrogate cannot") {
    // 24 docs: good ones share goodText's vocabulary, bad ones are spammy
    // few-token docs; the battery labels them, the perceptron must FIT
    // them (train accuracy), and the arbitrary fixed surrogate must not
    // be competitive
    val docs = docsDf((0 until 24).map { i =>
      if (i % 2 == 0)
        (i.toLong, s"$goodText variant$i brings number$i extra words")
      else (i.toLong, s"junk$i junk$i")
    })
    val trainedW = ClassifierTrainOps.train(spark,
      TextAnalysisOps.batteryLabeled(docs))
    val labels = TextAnalysisOps.batteryLabeled(docs).select("doc_id", "good")
    def accuracy(weights: org.apache.spark.sql.DataFrame,
                 buckets: Long): Long = {
      val scored = TextAnalysisOps.qualityClassify(docs, weights,
        buckets = buckets)
        .select(col("doc_id"), col("quality_label"))
      labels.join(scored, "doc_id")
        .agg(sum(when(col("quality_label") === col("good"), 1L).otherwise(0L)))
        .head().getLong(0)
    }
    val accTrained = accuracy(trainedW, TextAnalysisOps.TrainedBuckets)
    val accFixed = accuracy(TextAnalysisOps.classifierWeights(spark),
      TextAnalysisOps.ClassifierBuckets)
    assert(accTrained == 24L,
      s"perceptron failed to fit a separable training set: $accTrained/24")
    assert(accTrained > accFixed,
      s"trained ($accTrained) must beat the surrogate ($accFixed)")
  }

  test("fixture in-domain supervision is two-class and both trainers beat the surrogate") {
    // The CEILING here is low by MEASURED fixture construction: the five
    // languages draw from one shared 31-word vocabulary, so a
    // full-vocabulary float NB fit-capacity probe reaches only 0.594 on
    // the lang label (and no better on source/length labels). The
    // registry rows therefore demonstrate the exact-verified train→score
    // plumbing at near-base-rate accuracy; LEARNING is proven by the
    // designed-corpus tests above where signal exists. Floors assert the
    // mechanical contract: two-class supervision, no collapse below the
    // majority-class floor, and both trainers above the arbitrary
    // surrogate.
    val dir = "/root/testdata/sf0.001"
    val nb = graft.queries.AnalysisQueries.q177cNbEval(spark, dir).head()
    val pc = graft.queries.AnalysisQueries.q178bPerceptronEval(spark, dir).head()
    val (nDocs, nGood) = (nb.getLong(0), nb.getLong(1))
    assert(nGood > 0 && nGood < nDocs,
      s"in-domain label is one-class on the fixture: $nGood/$nDocs")
    val accNb = nb.getLong(2)
    val accPc = pc.getLong(2)
    val accFixed = nb.getLong(3)
    assert(accNb > accFixed && accPc > accFixed,
      s"trained (nb=$accNb, perceptron=$accPc) must beat the surrogate ($accFixed)")
    val majority = math.max(nGood, nDocs - nGood) * 1000L / nDocs
    assert(accNb >= majority - 20 && accPc >= majority - 20,
      s"trained classifiers collapsed below the majority floor $majority " +
        s"(nb=$accNb, perceptron=$accPc permille)")
  }

  test("fixture-trained weights match the committed golden checksum (rows-tier drift gate)") {
    // the q178 rows tier has no oracle; this pins the trained table's
    // CONTENT (not just determinism-within-a-run) so an unintentional
    // semantic change to the example builder, hashing, or update rule
    // fails loudly. The fold is order-sensitive (rows sorted by bucket).
    def checksum(rows: Seq[(Long, Long)]): Long =
      rows.sortBy(_._1).foldLeft(1125899906842597L) { case (h, (b, w)) =>
        h * 31 + b * 131 + w
      }
    val dir = "/root/testdata/sf0.001"
    val pc = graft.queries.AnalysisQueries.q178PerceptronTrain(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nb = graft.queries.AnalysisQueries.q177NbTrain(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(pc.nonEmpty && nb.nonEmpty)
    assert(checksum(pc) === 8577068903420713019L,
      s"perceptron golden drifted: ${checksum(pc)}")
    assert(checksum(nb) === -4646080506815126240L,
      s"nb golden drifted: ${checksum(nb)}")
  }

  test("training examples are bounded and deterministically ordered") {
    val docs = docsDf((0 until 10).map(i => (i.toLong, goodText + s" t$i")))
    val ex = ClassifierTrainOps.trainingExamples(
      TextAnalysisOps.batteryLabeled(docs), maxDocs = 4, maxToks = 3)
      .collect()
    assert(ex.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(ex.forall(_.getSeq[Long](2).size <= 3))
  }

  // --- nbHeldoutReport (q182/q183's dataflow): the generalization gap
  // appears on a memorization corpus and vanishes on a separable one ----

  private def labeledCarved(rows: Seq[(Long, Seq[String], Boolean, Boolean)]) = {
    import sqlImplicits._
    rows.toDF("doc_id", "toks", "good", "is_train")
  }

  private def reportOf(df: org.apache.spark.sql.DataFrame)
      : (Long, Long, Long, Long, Long) = {
    val r = TextAnalysisOps.nbHeldoutReport(df).head()
    (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5), r.getLong(6))
  }

  test("held-out report: a separable shared-vocabulary corpus generalizes " +
      "(held-out ~ train, both far above base rate)") {
    // class vocabularies are SHARED across docs, so what the train carve
    // learns transfers to the unseen half
    val rows = (0L until 40L).map { id =>
      val good = id % 2 == 0
      val sig = if (good) Seq("apple", "banana", "cherry")
                else Seq("xray", "yankee", "zulu")
      (id, sig ++ Seq(s"s${id % 5}"), good, id % 4 < 2)
    }
    val (nTrain, nHeld, accTrain, accHeld, gap) = reportOf(labeledCarved(rows))
    assert(nTrain == 20L && nHeld == 20L)
    assert(accTrain == 1000L, s"train acc $accTrain")
    assert(accHeld == 1000L, s"held-out acc $accHeld")
    assert(gap == 0L)
  }

  test("held-out report: a memorization corpus (unique tokens per doc) " +
      "shows the large train-vs-held-out gap in-sample eval hides") {
    // every token occurs in exactly one doc: the model can only memorize
    // the train carve; held-out docs score 0 -> the all-good default
    val rows = (0L until 40L).map { id =>
      (id, Seq(s"u${id}a", s"u${id}b", s"u${id}c"), id % 2 == 0, id % 4 < 2)
    }
    val (nTrain, nHeld, accTrain, accHeld, gap) = reportOf(labeledCarved(rows))
    assert(nTrain == 20L && nHeld == 20L)
    assert(accTrain == 1000L, s"train acc $accTrain")
    assert(accHeld == 500L, s"held-out acc $accHeld (the base rate)")
    assert(gap == 500L)
  }

  test("threshold calibration beats the raw score>=0 cut on an imbalanced " +
      "corpus where every doc scores positive") {
    // 3:1 good:bad, 5 shared tokens per doc (positive weight: more good
    // mass) + 1 class token — BOTH classes score positive, so the
    // uncalibrated cut predicts all-good (750 permille); the calibrated
    // cut separates the two score levels and generalizes (the score
    // vocabulary is shared across carves)
    val rows = (0L until 40L).map { id =>
      val bad = id % 8 == 0 || id % 8 == 1 // 5 bad in each carve
      val common = (0 until 5).map(i => s"c$i")
      (id, common :+ (if (bad) "badtok" else "goodtok"), !bad, id % 2 == 0)
    }
    val r = TextAnalysisOps.nbThresholdCalibration(labeledCarved(rows)).head()
    val (t, accTrainT, accHeldT, accHeld0, gain) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(accHeld0 == 750L, s"uncalibrated held-out acc $accHeld0")
    assert(accTrainT == 1000L && accHeldT == 1000L,
      s"calibrated acc train=$accTrainT held=$accHeldT")
    assert(gain == 250L && t > 0L, s"gain=$gain t=$t")
  }

  test("calibration can express the all-bad rule: a one-class-bad corpus " +
      "picks the max-score-plus-one cut") {
    // every doc is bad and shares the same tokens, so every doc lands on
    // one (negative) score s: predicting good at ANY observed cut t <= s
    // is 0% correct, and the only correct rule — keep nothing — lives at
    // the max+1 candidate. Without it the sweep publishes 0 permille as
    // "calibrated".
    val rows = (0L until 40L).map { id =>
      (id, Seq("c0", "c1", "c2"), false, id % 2 == 0)
    }
    val r = TextAnalysisOps.nbThresholdCalibration(labeledCarved(rows)).head()
    assert(r.getLong(1) == 1000L,
      s"train acc at calibrated cut ${r.getLong(1)} (all-bad candidate missing?)")
    assert(r.getLong(2) == 1000L)
  }

  test("per-source calibration: a skewed-prior source provably gets a " +
      "different cut than the pooled sweep, and the deployed delta shows it") {
    import sqlImplicits._
    // Source A is separable: good docs carry 'hi', bad docs 'lo' (the
    // bad ids are all odd, so 'lo' never reaches the train carve and
    // scores 0 held-out — below the positive 'hi' weight either way).
    // Source B is ALL bad but scores exactly like A's good ('hi'): the
    // pooled cut must keep the hi level (A's train good outnumber B's
    // train bad), so it keeps every B doc; B's own sweep picks the
    // all-bad max+1 cut and keeps nothing.
    val rows = (0L until 32L).map { id =>
      val src = if (id < 24) "A" else "B"
      val bad = (src == "B") || (id % 4 == 3)
      val tok = if (src == "A" && bad) "lo" else "hi"
      (id, Seq(tok), !bad, id % 2 == 0, src)
    }
    val labeled = rows.map(r => (r._1, r._2, r._3, r._4))
      .toDF("doc_id", "toks", "good", "is_train")
    val sources = rows.map(r => (r._1, r._5)).toDF("doc_id", "source")
    val scores = TextAnalysisOps.nbCarveScores(labeled)
    val pooled = TextAnalysisOps.nbBestThreshold(scores)
      .head().getLong(0)
    val rep = TextAnalysisOps.nbPerSourceCalibration(labeled, sources)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rep.keySet == Set("A", "B"))
    val a = rep("A"); val b = rep("B")
    // A's operating point IS the pooled one; B's provably is not
    assert(a.getLong(1) == pooled && a.getLong(2) == pooled)
    assert(b.getLong(1) > pooled,
      s"skewed source B kept the pooled cut ${b.getLong(1)} vs $pooled")
    // deployed effect: the pooled cut keeps all 4 held-out B docs (all
    // bad), B's own cut keeps none — the delta the report exists to show
    assert(b.getLong(5) == 4L && b.getLong(4) == 0L)
    assert(b.getLong(8) == -1000L,
      s"B delta_keep_permille ${b.getLong(8)}")
    // and B's own cut is the ACCURATE one held-out
    assert(b.getLong(9) == 1000L && b.getLong(10) == 0L)
    // A is untouched by per-source calibration (same cut, zero delta)
    assert(a.getLong(8) == 0L && a.getLong(9) == a.getLong(10))
  }

  test("q183 learning proof: held-out accuracy on the synthesized separable " +
      "corpus meets the committed >= 900 permille floor") {
    val r = graft.queries.AnalysisQueries
      .q183NbLearningProof(spark, "/root/testdata/sf0.001").head()
    val (nHeld, nGoodHeld, accHeld) =
      (r.getLong(1), r.getLong(3), r.getLong(5))
    // base rate sanity: the eval carve is ~class-balanced by construction
    assert(math.abs(2 * nGoodHeld - nHeld) <= 1,
      s"eval carve unbalanced: $nGoodHeld good of $nHeld")
    assert(accHeld >= 900L, s"held-out acc $accHeld below the 900 floor")
  }
}
