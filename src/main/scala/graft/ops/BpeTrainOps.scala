package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Distributed BPE vocabulary TRAINING (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units" — the public
  * `learn_bpe` algorithm): learn the merge table that
  * [[graft.functions.BpeMerges]] applies, from the corpus itself, instead
  * of shipping a hand-authored one. The reference pipeline tokenizes with
  * a fixed external tokenizer (`nlp_data_tagging.py` relies on
  * whitespace/regex splits); training the subword vocabulary ON the corpus
  * is what an LLM-data pipeline does before any token-denominated
  * accounting (budgets, packing, chunking) is meaningful.
  *
  * Algorithm (exactly the published one, re-expressed as Spark
  * aggregations):
  *   1. ONE corpus-wide pass builds the word-frequency vocabulary
  *      (pre-token -> count; map-side combined groupBy).
  *   2. Each merge round counts adjacent symbol pairs weighted by word
  *      count, picks the globally most frequent pair (ties broken
  *      lexicographically on (left, right) for determinism), and rewrites
  *      every word's symbol sequence by merging the chosen pair's
  *      non-overlapping occurrences leftmost-first — the same replacement
  *      order as the reference implementation's regex substitution.
  *
  * Scale shape: the corpus is touched ONCE (step 1). Every merge round
  * runs over the aggregated vocabulary, whose size is bounded by
  * `maxVocab` (top-V words by count): under Zipf's law the top 64k words
  * carry the overwhelming majority of the frequency mass, so capping the
  * trainer's working set is the standard scale move (SentencePiece prunes
  * the same way) and makes per-round cost INDEPENDENT of corpus size — at
  * 100 TB the only corpus-sized job is the first groupBy. Rounds shuffle
  * only (pair, count) rows (≤ total symbols in the capped vocab). The
  * per-round argmax is a 1-row `TakeOrderedAndProject` collect — a scalar
  * bound, the same driver shape as the existing 1-row scalar broadcasts.
  * `localCheckpoint` truncates lineage each round, exactly like
  * [[DedupOps.duplicateClusters]]; without it the iterated `aggregate`
  * lambda nests `numMerges` deep and the optimizer becomes the
  * bottleneck.
  *
  * The incremental-delta refinement (recount only words containing the
  * merged pair, patch the pair-count relation with +/- deltas) is a
  * deliberate non-goal: it turns one idempotent aggregation per round
  * into stateful bookkeeping, and with `maxVocab` bounding the round cost
  * the full recount is already corpus-size-independent.
  *
  * Only `[a-zA-Z]+` pre-tokens can reach length >= 2 under
  * [[TextAnalysisOps.BpeTokenRegex]] (the other alternatives match a
  * single character), so trained merges are pure-ASCII and the DuckDB
  * oracle's `substr`/`length` (code-point) semantics agree with Spark's
  * by construction.
  */
object BpeTrainOps {

  /** Word-frequency vocabulary: pre-token -> corpus count, keeping only
    * mergeable words (>= 2 code points) and capping at the `maxVocab`
    * most frequent (ties on count broken by word, ascending — total
    * order, so the cap is deterministic).
    */
  def wordVocab(docs: DataFrame, maxVocab: Int): DataFrame =
    docs
      .select(explode(TextAnalysisOps.bpePreTokens(col("text"))).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("w")).limit(maxVocab)

  /** Code-point symbol split of a word column (`(?s).` matches any single
    * code point; on the ASCII-only mergeable words this is a per-letter
    * split).
    */
  def symbolSplit(w: Column): Column =
    regexp_extract_all(w, lit("(?s)."), lit(0))

  /** Weighted adjacent-pair counts over a `(syms, cnt)` vocabulary —
    * every adjacent position counts (overlaps included), matching the
    * published `get_stats`. One map-side-combined shuffle of (pair, cnt)
    * rows.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab
      .select(col("syms"), col("cnt"), size(col("syms")).as("n"))
      .where(col("n") >= 2)
      .select(col("cnt"), explode(transform(sequence(lit(1), col("n") - 1),
        i => struct(element_at(col("syms"), i).as("l"),
          element_at(col("syms"), i + 1).as("r")))).as("p"))
      .groupBy(col("p").getField("l").as("l"), col("p").getField("r").as("r"))
      .agg(sum(col("cnt")).as("pair_count"))

  /** Merge every non-overlapping adjacent `(l, r)` occurrence in `syms`,
    * leftmost-first, in one left fold: the accumulator's last element is
    * replaced by `l+r` when the incoming element completes the pair.
    * `try_element_at` (not `element_at`) keeps the empty-accumulator probe
    * null-safe under ANSI mode. Matches the reference implementation's
    * single-pass regex replacement semantics on "aaa"-style overlaps
    * (first+second merge, third survives).
    */
  def mergeAdjacent(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(try_element_at(acc, lit(-1)) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Train `numMerges` BPE merges on `docs.text`; stops early when the
    * best remaining pair's weighted count drops below `minPairCount`.
    * Returns `(rank, left, right, merged, pair_count)` — the same
    * "left right" rule shape [[graft.functions.BpeMerges.Table]] encodes,
    * well-formed by construction (each part is a single code point or an
    * earlier merge's output, unit-gated via `validateTable`).
    */
  def train(spark: SparkSession, docs: DataFrame, numMerges: Int,
            minPairCount: Long = 2L, maxVocab: Int = 1 << 16,
            checkpointInterval: Int = 4): DataFrame = {
    def releaseCheckpoint(ds: DataFrame): Unit =
      Bridge.checkpointRdd(ds).foreach(_.unpersist(blocking = false))
    // No repartition: `maxVocab` already bounds the working set, so the
    // TakeOrdered output's partitioning is fine at any corpus size — the
    // per-round jobs are scheduling-overhead-bound, and extra tasks only
    // add to that. (A cluster deployment that raises the cap into the
    // millions would repartition here; the knob is the cap, not this line.)
    val base = wordVocab(docs, maxVocab)
      .select(symbolSplit(col("w")).as("syms"), col("cnt"))
      .localCheckpoint(true)
    // Checkpoint every `checkpointInterval` rounds, not every round: the
    // un-checkpointed tail (<= interval nested mergeAdjacent folds) is
    // recomputed by at most interval-1 argmax actions, but the loop runs
    // ~40% fewer jobs — the round cost here is scheduling overhead, not
    // data volume, at any vocab size the cap admits.
    var checkpointed = base
    var vocab = base
    var sinceCheckpoint = 0
    val merges = scala.collection.mutable.ArrayBuffer[Row]()
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val best = pairCounts(vocab)
        .orderBy(desc("pair_count"), asc("l"), asc("r")).limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minPairCount) done = true
      else {
        val l = best(0).getString(0)
        val r = best(0).getString(1)
        merges += Row(rank, l, r, l + r, best(0).getLong(2))
        vocab = vocab
          .select(mergeAdjacent(col("syms"), l, r).as("syms"), col("cnt"))
        sinceCheckpoint += 1
        if (sinceCheckpoint >= checkpointInterval) {
          val next = vocab.localCheckpoint(true)
          releaseCheckpoint(checkpointed)
          checkpointed = next
          vocab = next
          sinceCheckpoint = 0
        }
        rank += 1
      }
    }
    releaseCheckpoint(checkpointed)
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1), MergeSchema)
  }

  /** Schema of [[train]]'s output — shared with callers that re-hydrate a
    * memoized merge table into a DataFrame.
    */
  val MergeSchema: StructType = StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("left", StringType, nullable = false),
    StructField("right", StringType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("pair_count", LongType, nullable = false)))
}
