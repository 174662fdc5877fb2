package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tag generation + tag statistics (SURVEY.md §2.4-2.5: A7, A8, J2, J4, T4,
  * T5, T7).
  *
  * The reference's fallback tagger (nlp_data_tagging.py:217-237) fits a
  * TF-IDF vectorizer on a SINGLE document with unigram+bigram features and
  * takes the top-k scoring terms; on a one-document corpus IDF is constant,
  * so the semantics reduce to term-frequency top-k over unigrams+bigrams.
  * Ties in the reference are numpy argsort order (unspecified); we define
  * them deterministically as (count desc, term asc).
  *
  * Scale: explode → hash aggregate on (doc_id, term) → per-doc window top-k.
  * Keys carry doc_id so cardinality grows with the corpus and partitions
  * stay balanced; Spark 4 pushes the rank filter into WindowGroupLimitExec.
  */
object TagOps {

  /** Unigrams ∪ adjacent bigrams over the post-stopword token array —
    * `ngram_range=(1, 2)` semantics (nlp_data_tagging.py:221-224). Narrow.
    */
  def unigramsAndBigrams(tokens: Column): Column =
    concat(tokens,
      when(size(tokens) >= 2,
        transform(sequence(lit(0), size(tokens) - 2),
          i => concat_ws(" ", element_at(tokens, i + 1), element_at(tokens, i + 2))))
        .otherwise(array().cast("array<string>")))

  /** A7/T4: term-frequency top-k tags per document over cleaned
    * unigram+bigram terms. Output rows `(doc_id, tag_rank, tag, tag_count)`
    * — one row per tag, rank 1-based.
    */
  def fallbackTags(docs: DataFrame, k: Int, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    // Materialize the token array first: element_at inside the bigram
    // lambda must reference a cheap attribute, not re-evaluate the whole
    // tokenize/filter tree per element (observed 40x slowdown otherwise —
    // CollapseProject does not inline non-cheap aliases, keeping this safe).
    val terms = docs.select(col(idCol), TextOps.cleanTokens(col(textCol)).as("toks"))
      .select(col(idCol), explode(unigramsAndBigrams(col("toks"))).as("tag"))
      .groupBy(col(idCol), col("tag"))
      .agg(count(lit(1)).as("tag_count"))
    val byScore = Window.partitionBy(idCol)
      .orderBy(col("tag_count").desc, col("tag").asc)
    terms.withColumn("tag_rank", row_number().over(byScore))
      .where(col("tag_rank") <= k)
      .select(col(idCol), col("tag_rank").cast("long"), col("tag"), col("tag_count"))
  }

  /** A8/T5: global tag frequency, top N (reference `value_counts().head(10)`,
    * nlp_data_tagging.py:320-322). Input: a relation with one tag per row.
    * orderBy+limit plans as TakeOrderedAndProject — no full sort at scale.
    */
  def tagFrequency(tags: DataFrame, n: Int, tagCol: String = "tag"): DataFrame =
    tags.groupBy(col(tagCol))
      .agg(count(lit(1)).as("tag_count"))
      .orderBy(col("tag_count").desc, col(tagCol).asc)
      .limit(n)

  /** J2: topic/tag diversity — distinct / total over a one-tag-per-row
    * relation (nlp_data_tagging.py:271-277). Exact single division.
    */
  def diversity(tags: DataFrame, tagCol: String = "tag"): DataFrame =
    tags.agg(
      countDistinct(col(tagCol)).as("unique_tags"),
      count(lit(1)).as("total_tags"),
      (countDistinct(col(tagCol)).cast("double") / count(lit(1))).as("diversity"))
}
