package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extractive TF-IDF summarization (SURVEY.md §2.4-2.5: P9, A1, A2, T1, T6).
  *
  * Reference behavior (nlp_data_tagging.py:86-116): split a document into
  * sentences, score each sentence by the sum of its TF-IDF term weights,
  * select the k highest-scoring sentences, then emit them in their original
  * document order ("select by score, emit by position"). Documents with <= k
  * sentences pass through unchanged.
  *
  * Engine-defined exact semantics (SURVEY.md §7.3 — we do not chase sklearn
  * bit-parity): a term's IDF is the integer `floor(1e6 * n_sentences / df)`
  * where df counts the sentences of the SAME document containing the term;
  * a sentence's score is the Long sum of `tf * idf` over its post-stopword
  * tokens. Integer scoring makes results bit-identical across engines
  * (no float summation-order sensitivity), so the DuckDB oracle can verify
  * it exactly.
  *
  * Scale notes: the whole chain is explode → two hash aggregations keyed by
  * (doc, term) / (doc, sentence) → one window per doc. All shuffles are on
  * doc-prefixed keys, so data stays well distributed for any number of
  * documents; no per-document collect, no driver loops. The per-doc window
  * (top-k) benefits from Spark 4's WindowGroupLimit pushdown.
  */
object SummarizeOps {

  /** P9: punctuation-based sentence split, reference-exact
    * (`re.split(r'[.!?]+', text)`, keep trimmed sentences with length > 10;
    * nlp_data_tagging.py:81-84). Output: one row per kept sentence with
    * `sentence_id` = 0-based rank within the kept list (the reference indexes
    * into the filtered list).
    */
  def sentences(docs: DataFrame, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val raw = docs.select(
        col(idCol),
        posexplode(split(coalesce(col(textCol), lit("")), "[.!?]+")).as(Seq("pos", "s")))
      .select(col(idCol), col("pos"), trim(col("s")).as("sentence"))
      .where(length(col("sentence")) > 10)
    val w = Window.partitionBy(idCol).orderBy("pos")
    raw.select(col(idCol), (row_number().over(w) - 1).cast("long").as("sentence_id"),
      col("sentence"))
  }

  /** Fixture-friendly sentence source: chunk a document's whitespace tokens
    * into consecutive `chunkWords`-word pseudo-sentences. The driver corpus
    * has no punctuation (FIXTURES.md documents.text), so punctuation splits
    * would degenerate to one sentence per doc; chunking exercises the same
    * downstream scoring/top-k machinery on real data.
    */
  /** Implemented by slicing the token array directly — narrow (no shuffle),
    * order-safe (no reliance on collect_list intra-group ordering). One
    * output row per chunk.
    */
  def chunks(docs: DataFrame, chunkWords: Int, textCol: String = "text",
             idCol: String = "doc_id"): DataFrame = {
    val toks = TextOps.tokenize(col(textCol))
    // empty docs yield an empty chunk array (posexplode drops them) rather
    // than a Filter on the computed column — a pushed-down filter would
    // re-evaluate the tokenize tree inside the Filter (alias substitution)
    docs.select(col(idCol), toks.as("toks"))
      .select(col(idCol),
        posexplode(when(size(col("toks")) > 0, transform(
          sequence(lit(0), floor((size(col("toks")) - 1) / lit(chunkWords)).cast("int")),
          i => array_join(slice(col("toks"), i * chunkWords + 1, lit(chunkWords)), " ")))
          .otherwise(array().cast("array<string>")))
          .as(Seq("sentence_id", "sentence")))
      .select(col(idCol), col("sentence_id").cast("long"), col("sentence"))
  }

  /** A1+A2: integer-exact TF-IDF sentence scores over a sentence relation
    * `(doc_id, sentence_id, sentence)`. Terms are the post-stopword tokens
    * (TextOps.cleanTokens); sentences contributing no scored terms get
    * score 0.
    */
  def scoreSentences(sents0: DataFrame, idCol: String = "doc_id"): DataFrame = {
    // the sentence relation feeds the term explode AND the zero-score
    // join-back here, plus the caller's n_sent branch (extractiveSummary)
    // — without a persist the upstream tokenize/chunk chain re-runs per
    // branch. CacheManager matches canonicalized plans, so every consumer
    // of the same sentence plan (including other queries in the session
    // over the same fixture) shares this one cache entry.
    val sents = graft.CacheScope.persist(sents0)
    val terms = sents.select(col(idCol), col("sentence_id"),
        explode(TextOps.cleanTokens(col("sentence"))).as("term"))
    // tf per (doc, sentence, term)
    val tf = terms.groupBy(col(idCol), col("sentence_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df per (doc, term): number of sentences of the doc containing the term
    val df = tf.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("df"))
    val nSent = sents.groupBy(col(idCol)).agg(count(lit(1)).as("n_sent"))
    val scored = tf
      .join(df, Seq(idCol, "term"))
      .join(nSent, Seq(idCol))
      .withColumn("w", col("tf") *
        floor(lit(1000000.0) * col("n_sent") / col("df")).cast("long"))
      .groupBy(col(idCol), col("sentence_id"))
      .agg(sum(col("w")).as("score"))
    // left join back so zero-term sentences keep score 0
    sents.join(scored, Seq(idCol, "sentence_id"), "left")
      .select(col(idCol), col("sentence_id"), col("sentence"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** A1 (sklearn-parity variant): TfidfVectorizer-default semantics for
    * users who want the reference's literal numbers
    * (nlp_data_tagging.py:95-99) rather than the engine's integer-exact
    * scheme: idf = ln((1+n)/(1+df)) + 1 (smooth_idf), raw-count tf, and
    * per-sentence L2 normalization; a sentence's score is the sum of its
    * normalized row (`tfidf_matrix.sum(axis=1)`). Same shuffle structure
    * as scoreSentences. Float aggregation is order-sensitive, so this
    * variant is unit-tested against hand-computed sklearn values and
    * driver-checked rows-only — it cannot be hash-exact across engines,
    * which is exactly why the oracle-verified default uses integers
    * (SURVEY.md §7.3).
    */
  def scoreSentencesSklearn(sents0: DataFrame,
                            idCol: String = "doc_id"): DataFrame = {
    // same multi-consumer persist as scoreSentences
    val sents = graft.CacheScope.persist(sents0)
    val terms = sents.select(col(idCol), col("sentence_id"),
      explode(TextOps.cleanTokens(col("sentence"))).as("term"))
    val tf = terms.groupBy(col(idCol), col("sentence_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("df"))
    val nSent = sents.groupBy(col(idCol)).agg(count(lit(1)).as("n_sent"))
    val w = col("tf") *
      (log((col("n_sent") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0))
    val scored = tf
      .join(df, Seq(idCol, "term"))
      .join(nSent, Seq(idCol))
      .withColumn("w", w)
      .groupBy(col(idCol), col("sentence_id"))
      .agg((sum(col("w")) / sqrt(sum(col("w") * col("w")))).as("score"))
    sents.join(scored, Seq(idCol, "sentence_id"), "left")
      .select(col(idCol), col("sentence_id"), col("sentence"),
        coalesce(col("score"), lit(0.0)).as("score"))
  }

  /** Declared domain of [[scoreSentencesSklearnFixed]]: documents with up
    * to this many sentences. [[LnTable]] holds ln(1)..ln(LnTableMax+1) so
    * both idf operands (n_sent+1 and df+1, df <= n_sent) stay in range.
    */
  val LnTableMax: Int = 1024

  /** ln(m) for m = 1..LnTableMax+1, computed ONCE here (JVM Math.log) and
    * shared verbatim by the engine plan (a literal array) and the
    * generated oracle SQL ([[LnTableSql]]). Neither engine evaluates ln()
    * at query time, which is what makes the q03d hash compare independent
    * of libm rounding.
    */
  val LnTable: Array[Double] =
    Array.tabulate(LnTableMax + 1)(i => math.log(i + 1.0))

  /** The same table as a DuckDB list literal. Each entry is serialized
    * with `java.lang.Double.toString` (shortest round-trip decimal) and
    * emitted as a STRING cast to DOUBLE: DuckDB's varchar→double cast is
    * a correctly-rounded parse, so the oracle's doubles are bit-identical
    * to the JVM's. (A bare decimal literal would type as DECIMAL and take
    * a different, multiply-rounded path to DOUBLE.)
    */
  val LnTableSql: String =
    LnTable.map(d => "'" + java.lang.Double.toString(d) + "'")
      .mkString("[", ",", "]::DOUBLE[]")

  /** A1 (sklearn-parity, FIXED-POINT): same smooth-idf + L2 semantics as
    * [[scoreSentencesSklearn]], but each term's idf is quantized ONCE to
    * exact integer micro-units (floor(1e6·idf)) before any aggregation, so
    * both sums of the score `Σw / sqrt(Σw²)` are exact integers
    * (DECIMAL(38,0) accumulation) and the only floats are the final
    * division and sqrt — single IEEE operations, identical in any engine
    * and independent of fold order. Scores differ from the float variant
    * by < 1e-6 relative (the idf quantization, which cancels in the
    * L2 ratio up to that precision) — and in exchange the result is
    * hash-verifiable cross-engine, which the order-sensitive float fold
    * can never be.
    *
    * ENGINE-INDEPENDENCE: the quantization
    * `floor(1e6·(ln(1+n) − ln(1+df) + 1))` reads both ln values from the
    * shared precomputed [[LnTable]] — the engine via a literal-array
    * lookup, the oracle via the [[LnTableSql]] list generated from the
    * SAME Scala constant — and every remaining operation (−, +, ×, floor)
    * is a single correctly-rounded IEEE op. No libm call is made by
    * either engine at query time, so the hash compare cannot flake on ln
    * rounding for ANY corpus inside the declared domain
    * (n_sent <= [[LnTableMax]]); beyond it the engine fails loudly
    * (raise_error) instead of silently degrading — larger documents
    * belong to [[scoreSentences]] (integer-exact, unbounded) or
    * [[scoreSentencesSklearn]] (float, rows-only).
    */
  def scoreSentencesSklearnFixed(sents0: DataFrame,
                                 idCol: String = "doc_id"): DataFrame = {
    val sents = graft.CacheScope.persist(sents0)
    val terms = sents.select(col(idCol), col("sentence_id"),
      explode(TextOps.cleanTokens(col("sentence"))).as("term"))
    val tf = terms.groupBy(col(idCol), col("sentence_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("df"))
    val nSent = sents.groupBy(col(idCol)).agg(count(lit(1)).as("n_sent"))
    // ln(m) via the shared table; 1-based element_at so index m → ln(m).
    // df == n_sent (the commonest case) reads the same entry twice →
    // exactly 0 → 1000000 on both engines.
    val lnTab = typedLit(LnTable.toSeq)
    def lnOf(m: Column): Column =
      when(m <= lit(LnTable.length), element_at(lnTab, m.cast("int")))
        .otherwise(raise_error(concat(
          lit(s"scoreSentencesSklearnFixed: n_sent exceeds declared domain LnTableMax=$LnTableMax (got m="),
          m.cast("string"), lit(")"))).cast("double"))
    val iq = floor(lit(1000000.0) *
      (lnOf(col("n_sent") + lit(1)) - lnOf(col("df") + lit(1)) + lit(1.0)))
      .cast("long")
    val w = (col("tf") * iq).cast("decimal(38,0)")
    val scored = tf
      .join(df, Seq(idCol, "term"))
      .join(nSent, Seq(idCol))
      .withColumn("w", w)
      .groupBy(col(idCol), col("sentence_id"))
      .agg((sum(col("w")).cast("double")
        / sqrt(sum(col("w") * col("w")).cast("double"))).as("score"))
    sents.join(scored, Seq(idCol, "sentence_id"), "left")
      .select(col(idCol), col("sentence_id"), col("sentence"),
        coalesce(col("score"), lit(0.0)).as("score"))
  }

  /** T1 (+ identity case): pick the k top-scoring sentences per doc
    * (ties → earlier sentence wins, deterministic), emit them joined in
    * original order. Docs with <= k sentences return the original text
    * unchanged (nlp_data_tagging.py:91-92).
    *
    * @param joiner separator used when stitching selected sentences —
    *               ". " with trailing "." for punctuation sentences
    *               (reference :106), " " for word-chunk sentences.
    */
  def extractiveSummary(docs: DataFrame, sents: DataFrame, k: Int,
                        joiner: String, terminal: String,
                        textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val byScore = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("sentence_id").asc)
    val picked = scoreSentences(sents, idCol)
      .withColumn("rk", row_number().over(byScore))
      .where(col("rk") <= k)
    val summaries = picked
      .groupBy(col(idCol))
      .agg(
        concat(array_join(array_sort(collect_list(struct(col("sentence_id"), col("sentence"))))
          .getField("sentence"), joiner), lit(terminal)).as("picked_summary"),
        count(lit(1)).as("n_picked"))
    val nSent = sents.groupBy(col(idCol)).agg(count(lit(1)).as("n_sentences"))
    docs.join(nSent, Seq(idCol), "left")
      .join(summaries, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_sentences"), lit(0L)).as("n_sentences"),
        when(coalesce(col("n_sentences"), lit(0L)) <= k, col(textCol))
          .otherwise(col("picked_summary")).as("summary"))
  }

  /** The reference `summarize_text` length policy (nlp_data_tagging.py:118-130):
    * target sentence count = max(1, maxLength / 20), then truncate the summary
    * at a word boundary if it still exceeds maxLength.
    */
  def targetSentences(maxLength: Int): Int = math.max(1, maxLength / 20)

  /** T6: the reference's error-path summary (nlp_data_tagging.py:108-116) —
    * first, middle, last sentence (deduped when they coincide), joined in
    * document order. Expressed as explicit conditional dataflow, not
    * exception control flow: a count window + position filter.
    */
  def fallbackSummary(sents: DataFrame, joiner: String = ". ",
                      terminal: String = ".",
                      idCol: String = "doc_id"): DataFrame = {
    val n = Window.partitionBy(idCol)
    val picked = sents
      .withColumn("n_sent", count(lit(1)).over(n))
      .where(col("sentence_id") === 0 ||
        col("sentence_id") === floor(col("n_sent") / 2) ||
        col("sentence_id") === col("n_sent") - 1)
    picked.groupBy(col(idCol))
      .agg(concat(array_join(transform(
        array_sort(collect_list(struct(col("sentence_id"), col("sentence")))),
        s => s.getField("sentence")), joiner), lit(terminal)).as("summary"))
  }
}
