package graft.typed

import graft.Tables
import graft.ops.{MetricOps, SummarizeOps, TextOps}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed-API surface (SURVEY.md §1.3): case classes model the document
  * relation where compile-time field checks help, while every transform
  * still runs through the column-expression operators — `.as[T]` at the
  * API boundary keeps Catalyst optimization (no opaque closures in the
  * hot path).
  */
case class Document(doc_id: Long, text: String, lang: String,
                    source: String, n_chars: Long)

case class CleanedDocument(doc_id: Long, text: String, cleaned_text: String,
                           tokens: Seq[String])

case class DocumentSummary(doc_id: Long, n_sentences: Long, summary: String)

case class SummaryMetrics(doc_id: Long, text_length: Long, summary_length: Long,
                          compression_ratio: Double, word_overlap: Double,
                          avg_sentence_length: Double)

object TypedPipeline {

  def load(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    Tables.documents(spark, dir).as[Document]
  }

  def clean(docs: Dataset[Document]): Dataset[CleanedDocument] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.withColumn("cleaned_text", TextOps.preprocess(col("text")))
      .withColumn("tokens", TextOps.cleanTokens(col("cleaned_text")))
      .select("doc_id", "text", "cleaned_text", "tokens")
      .as[CleanedDocument]
  }

  def summarize(docs: Dataset[Document], chunkWords: Int = 8,
                k: Int = 2): Dataset[DocumentSummary] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val df = docs.toDF()
    SummarizeOps.extractiveSummary(df, SummarizeOps.chunks(df, chunkWords),
      k, " ", "")
      .as[DocumentSummary]
  }

  def metrics(docs: Dataset[Document],
              summaries: Dataset[DocumentSummary]): Dataset[SummaryMetrics] = {
    val spark = docs.sparkSession
    import spark.implicits._
    MetricOps.summaryMetrics(
      docs.toDF().join(summaries.toDF().select("doc_id", "summary"), "doc_id"),
      "text", "summary")
      .as[SummaryMetrics]
  }
}
