package graft

import graft.ml.TopicPipeline
import graft.ops.{MetricOps, SummarizeOps, TagOps, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The 6-stage reference pipeline as one facade (nlp_data_tagging.py:545-563):
  * text extraction & cleaning → tokenization → extractive summarization →
  * topic modeling → tag generation → quality metrics. Each stage is also
  * available à la carte through the ops objects; this object wires the
  * end-to-end flow a user of the reference app would run.
  *
  * Everything stays a lazy DataFrame until the caller acts; the only eager
  * step is LDA's iterative fit (as in any ML pipeline).
  */
object NlpPipeline {

  case class Config(
      summarySentences: Int = 3,
      summaryMaxLength: Int = 150,
      nTags: Int = 5,
      topics: TopicPipeline.Config = TopicPipeline.Config(),
      useTopicTags: Boolean = true)

  /** Run the full pipeline over a `(doc_id, text, ...)` corpus. Returns the
    * reference's per-document result relation: cleaned/processed text,
    * summary (+truncation), tags, lengths, compression ratio
    * (nlp_data_tagging.py:410-418 + 427-428).
    */
  def run(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    // stages 1-2: clean + tokenize
    val cleaned = docs
      .withColumn("cleaned_text", TextOps.preprocess(col("text")))
      .withColumn("processed_text", TextOps.cleanTokensText(col("cleaned_text")))
    // stage 3: extractive summary (sentence split on punctuation; corpora
    // without punctuation degenerate to identity, reference :91-92)
    val sents = SummarizeOps.sentences(cleaned)
    val k = SummarizeOps.targetSentences(cfg.summaryMaxLength)
    val summarized = SummarizeOps.extractiveSummary(cleaned, sents, k, ". ", ".")
      .withColumn("summary",
        TextOps.truncateAtWordBoundary(col("summary"), cfg.summaryMaxLength))
    // stages 4-5: topic tags with per-doc TF fallback (reference :205-215)
    val tags =
      if (cfg.useTopicTags) TopicPipeline.tags(TopicPipeline.fit(docs, cfg.topics))
      else TagOps.fallbackTags(docs, cfg.nTags)
        .groupBy("doc_id")
        .agg(transform(array_sort(collect_list(struct(col("tag_rank"), col("tag")))),
          t => t.getField("tag")).as("tags"))
    // stage 6: metrics + assembly
    val joined = cleaned
      .join(summarized.select("doc_id", "summary"), Seq("doc_id"))
      .join(tags, Seq("doc_id"), "left")
    MetricOps.summaryMetrics(joined, "text", "summary")
      .join(joined.select(col("doc_id"), col("cleaned_text"),
        col("processed_text"), col("summary"), col("tags")), Seq("doc_id"))
  }
}
