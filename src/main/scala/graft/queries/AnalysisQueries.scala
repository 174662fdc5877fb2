package graft.queries

import graft.Tables
import graft.ops.{HashOps, TextAnalysisOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis query surface (builder-prompt extension): language ID,
  * quality scoring, token counting, document fingerprinting. All narrow
  * per-row pipelines over `documents` — the shapes a pretraining-corpus
  * filter pass runs at 100 TB (zero shuffles except final aggregates).
  */
object AnalysisQueries {

  import SqlDefs._

  // --- q20: language-ID scores + argmax prediction -----------------------
  def q20LangId(spark: SparkSession, dir: String): DataFrame = {
    val toked = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), TextOps.tokenize(col("text")).as("toks"))
    val scores = TextAnalysisOps.langScores(col("toks"))
    val scored = toked.select(
      (Seq(col("doc_id"), col("lang")) ++
        scores.map { case (l, c) => c.as(s"score_$l") }): _*)
    scored
      .withColumn("pred_lang", TextAnalysisOps.predLang(
        TextAnalysisOps.LangProfiles.map { case (l, _) => l -> col(s"score_$l") }))
      .orderBy("doc_id")
  }

  val q20Sql: String = {
    val scoreExprs = TextAnalysisOps.LangProfiles.map { case (lang, words) =>
      val lst = words.mkString("['", "', '", "']")
      s"len(list_filter(toks, t -> list_contains($lst, t))) AS score_$lang"
    }.mkString(",\n      ")
    val langs = TextAnalysisOps.LangProfiles.map(_._1)
    val m = langs.map(l => s"score_$l").mkString("greatest(", ", ", ")")
    val pred = langs.map(l => s"WHEN score_$l = $m THEN '$l'")
      .mkString("CASE ", " ", " END")
    s"""WITH t AS (SELECT doc_id, lang, ${toksSql("text")} AS toks FROM documents),
    s AS (SELECT doc_id, lang,
      $scoreExprs
      FROM t)
    SELECT doc_id, lang, ${langs.map(l => s"score_$l").mkString(", ")},
      $pred AS pred_lang
    FROM s ORDER BY doc_id"""
  }

  // --- q21: quality-signal scoring ---------------------------------------
  def q21Quality(spark: SparkSession, dir: String): DataFrame = {
    val toked = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), TextOps.tokenize(col("text")).as("toks"))
    val q = toked.select(
      (col("doc_id") +: TextAnalysisOps.qualityColumns(col("text"), col("toks"))) :+
        TextAnalysisOps.repetitionRatio(col("toks"), 2).as("bigram_repetition"): _*)
    q.withColumn("quality_pass", TextAnalysisOps.qualityPass).orderBy("doc_id")
  }

  val q21Sql: String =
    raw"""WITH t AS (SELECT doc_id, text, ${toksSql("text")} AS toks FROM documents),
    q AS (SELECT doc_id,
      CAST(length(text) AS BIGINT) AS n_chars,
      CAST(len(toks) AS BIGINT) AS n_tokens,
      CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
      CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END AS type_token_ratio,
      CASE WHEN len(toks) > 0 THEN CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(toks, x -> CAST(length(x) AS BIGINT))), (a, b) -> a + b) AS DOUBLE) / len(toks) ELSE 0.0 END AS mean_token_len,
      CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, t -> list_contains($stopSql, lower(t)))) AS DOUBLE) / len(toks) ELSE 0.0 END AS stopword_ratio,
      CASE WHEN length(text) > 0 THEN CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END AS non_alnum_ratio,
      CASE WHEN len(toks) >= 2 AND len(toks) - 1 > 0
           THEN 1.0 - CAST(len(list_distinct(list_transform(range(0, len(toks) - 1), i -> toks[CAST(i AS INT) + 1] || ' ' || toks[CAST(i AS INT) + 2]))) AS DOUBLE) / (len(toks) - 1)
           ELSE 0.0 END AS bigram_repetition
      FROM t)
    SELECT *,
      (n_tokens >= 5 AND type_token_ratio >= 0.2 AND non_alnum_ratio <= 0.2
        AND stopword_ratio <= 0.9) AS quality_pass
    FROM q ORDER BY doc_id"""

  // --- q22: token counting rolled up by source ---------------------------
  def q22TokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        TextAnalysisOps.wsTokenCount(col("text")).as("ws"),
        TextAnalysisOps.bpeTokenCount(col("text")).as("bpe"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws")).as("total_ws_tokens"),
        sum(col("bpe")).as("total_bpe_tokens"),
        (sum(col("ws")).cast("double") / count(lit(1))).as("avg_ws_tokens"))
      .orderBy("source")

  val q22Sql: String = {
    val bpe = TextAnalysisOps.BpeTokenRegex.replace("\\", "\\\\")
    raw"""WITH t AS (SELECT source,
      len(${toksSql("text")}) AS ws,
      len(regexp_extract_all(text, '$bpe')) AS bpe
      FROM documents)
    SELECT source, count(*) AS n_docs,
      CAST(sum(ws) AS BIGINT) AS total_ws_tokens,
      CAST(sum(bpe) AS BIGINT) AS total_bpe_tokens,
      CAST(sum(ws) AS DOUBLE) / count(*) AS avg_ws_tokens
    FROM t GROUP BY source ORDER BY source"""
  }

  // --- q23: document fingerprints (rolling hash) -------------------------
  def q23Fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), TextOps.tokenize(col("text")).as("toks"))
      .select(col("doc_id"),
        HashOps.charHash(col("text")).as("char_fp"),
        HashOps.rollingFingerprint(col("toks")).as("token_fp"))
      .orderBy("doc_id")

  val q23Sql: String =
    s"""WITH t AS (SELECT doc_id, text, ${toksSql("text")} AS toks FROM documents)
    SELECT doc_id, ${HashOps.charHashSql("text")} AS char_fp,
      ${HashOps.rollingFingerprintSql("toks")} AS token_fp
    FROM t ORDER BY doc_id"""

  // --- q23b: PII redaction over the corpus -------------------------------
  // The synthetic fixture contains no PII, so redaction is the identity on
  // it — the oracle still verifies both engines apply the exact same
  // transform; the behavioral coverage is in TextAnalysisSpec.
  def q23bRedact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextAnalysisOps.redactPii(col("text")).as("redacted"))
      .select(col("doc_id"), length(col("redacted")).cast("long").as("n_chars"))
      .orderBy("doc_id")

  val q23bSql: String = {
    val redacted = TextAnalysisOps.PiiPatterns.foldLeft("text") {
      case (c, (pat, repl)) =>
        val p = pat.replace("\\", "\\\\").replace("'", "''")
        s"regexp_replace($c, '$p', '$repl', 'g')"
    }
    s"""SELECT doc_id, CAST(length($redacted) AS BIGINT) AS n_chars
    FROM documents ORDER BY doc_id"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_lang_id" -> (q20LangId _),
    "q21_quality" -> (q21Quality _),
    "q22_token_counts" -> (q22TokenCounts _),
    "q23_fingerprints" -> (q23Fingerprints _),
    "q23b_redact" -> (q23bRedact _))

  val oracleSql: Map[String, String] = Map(
    "q20_lang_id" -> q20Sql,
    "q21_quality" -> q21Sql,
    "q22_token_counts" -> q22Sql,
    "q23_fingerprints" -> q23Sql,
    "q23b_redact" -> q23bSql)
}
