package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** In-engine training of the q65-shaped linear quality classifier by the
  * averaged perceptron (Freund & Schapire 1999, public) — the ITERATIVE
  * sibling of [[TextAnalysisOps.nbTrainedWeights]]'s one-pass counting
  * trainer, for the fastText-class discriminative setting the published
  * curation pipelines describe (train on known-good vs known-bad labels,
  * deploy the cheap linear scorer).
  *
  * Architecture is the proven tokenizer-trainer template
  * (ops/BpeTrainOps.scala `train`): ONE distributed pass builds a
  * BOUNDED labeled example relation, a scalar-bound collect ships it to
  * the driver, and the driver CPU runs the inherently-sequential update
  * loop (each step's prediction depends on all previous updates — the
  * same reason BPE's merge argmax and the LDA sweep are rows-only, no
  * SQL twin can replay it). The bound is explicit and
  * corpus-size-INDEPENDENT: at most [[MaxTrainDocs]] examples of at most
  * [[MaxToksPerDoc]] hashed features each — the standard practice for
  * quality classifiers, which are trained on a fixed labeled set
  * (~100k docs in the published recipes) however big the corpus they
  * then score. Everything is integer arithmetic in a fixed iteration
  * order (examples sorted by id, fixed epoch count), so training is
  * bit-deterministic across JVMs and sessions — the property the
  * registry's rows tier plus ClassifierTrainSpec's golden replay gate.
  *
  * Supervision is any `(id, toks, good)` labeled relation — the
  * registry uses [[TextAnalysisOps.langLabeled]]'s reference-corpus
  * membership (the WebText/CCNet discriminator shape; the battery label
  * is one-class on this fixture), and a curated labeled set drops in
  * unchanged.
  */
object ClassifierTrainOps {

  /** Training-set bounds: the collect is ≤ MaxTrainDocs × MaxToksPerDoc
    * longs (4096 × 256 = 1M ≈ 8 MB) whatever the corpus size.
    */
  val MaxTrainDocs: Int = 4096
  val MaxToksPerDoc: Int = 256

  /** Fixed epoch count — part of the deterministic training contract. */
  val Epochs: Int = 3

  /** The bounded labeled example relation `(ex_id, good, buckets)`:
    * deterministic head sample (smallest `maxDocs` ids — a fixed,
    * replayable carve like every other fixture split), each example's
    * features the hashed buckets of its first `maxToks` tokens
    * (multiplicity kept — multinomial features, [[TextAnalysisOps.qualityClassify]]'s
    * scoring semantics). The `orderBy.limit` pins the global
    * TakeOrderedAndProject bound; everything before it is narrow.
    */
  def trainingExamples(labeled: DataFrame,
                       maxDocs: Int = MaxTrainDocs,
                       maxToks: Int = MaxToksPerDoc,
                       idCol: String = "doc_id",
                       buckets: Long = TextAnalysisOps.TrainedBuckets): DataFrame =
    labeled
      .select(col(idCol).as("ex_id"), col("good"),
        transform(slice(col("toks"), 1, maxToks),
          t => HashOps.charHash(t) % buckets)
          .as("buckets"))
      .orderBy("ex_id").limit(maxDocs)

  /** The driver-side averaged-perceptron loop over collected examples, in
    * example order, `epochs` times: predict `sign(Σ_b w(b))` over the
    * example's feature instances, and on a margin violation
    * (`y·s <= 0`) add `y` to every feature's weight. The published
    * weights are the UNNORMALIZED average `u(b) = Σ_t w_t(b)` via the
    * standard lazy trick (each update contributes `y · remaining_steps`)
    * — dividing by the step count would leave integer land and changes
    * no sign, so the scale factor is deliberately kept (the same
    * argument as the engine's micro-scaled cosines). Pure integer ops in
    * a fixed order: bit-deterministic.
    */
  def trainLocal(examples: Seq[(Long, Boolean, Seq[Long])],
                 epochs: Int = Epochs,
                 buckets: Int = TextAnalysisOps.TrainedBuckets.toInt): Seq[(Long, Long)] = {
    val w = new Array[Long](buckets)
    val u = new Array[Long](buckets)
    val total = examples.size.toLong * epochs
    var step = 0L
    var e = 0
    while (e < epochs) {
      examples.foreach { case (_, good, feats) =>
        val y = if (good) 1L else -1L
        var s = 0L
        feats.foreach(b => s += w(b.toInt))
        if (y * s <= 0L) {
          val remaining = total - step
          feats.foreach { b =>
            w(b.toInt) += y
            u(b.toInt) += y * remaining
          }
        }
        step += 1L
      }
      e += 1
    }
    (0 until buckets).collect {
      case b if u(b) != 0L => (b.toLong, u(b))
    }
  }

  /** Schema of the trained weight relation — [[TextAnalysisOps.qualityClassify]]'s
    * weight-table shape (model-as-data).
    */
  val WeightSchema: StructType = StructType(Seq(
    StructField("bucket", LongType, nullable = false),
    StructField("weight", LongType, nullable = false)))

  /** Train on a `(id, toks, good)` labeled relation
    * ([[TextAnalysisOps.batteryLabeled]]/[[TextAnalysisOps.langLabeled]]
    * or a curated set): bounded example build → scalar-bound collect →
    * [[trainLocal]]. Returns the nonzero `(bucket, weight)` rows.
    */
  def train(spark: SparkSession, labeled: DataFrame,
            epochs: Int = Epochs,
            maxDocs: Int = MaxTrainDocs,
            maxToks: Int = MaxToksPerDoc): DataFrame = {
    val examples = trainingExamples(labeled, maxDocs, maxToks)
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1),
        r.getSeq[Long](2).toSeq)).toSeq
    // the head-of-id-order carve can go ONE-CLASS when label correlates
    // with id order (e.g. good docs appended last in a curated corpus) —
    // the perceptron would then silently degenerate to a constant
    // predictor. Fail loudly instead: the caller should widen maxDocs or
    // supply a hash-ordered carve.
    require(examples.map(_._2).distinct.size == 2,
      s"perceptron training carve is one-class over ${examples.size} " +
        "examples (label correlates with id order?) — widen maxDocs or " +
        "pre-shuffle the labeled relation by a hash key")
    val rows = trainLocal(examples, epochs)
      .map { case (b, wt) => Row(b, wt) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), WeightSchema)
  }
}
