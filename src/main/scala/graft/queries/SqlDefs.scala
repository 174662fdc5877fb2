package graft.queries

import graft.ops.TextOps

/** Shared DuckDB-SQL fragments mirroring the engine's column expressions —
  * the single source for oracle snippets reused across query registries
  * (tokenization, stop-word filtering). Hash twins live in HashOps.
  */
object SqlDefs {

  val stopSql: String =
    TextOps.StopWords.mkString("['", "', '", "']")

  /** Whitespace tokens of a string expression (drops empties, mirroring
    * TextOps.tokenize).
    */
  def toksSql(c: String): String =
    raw"list_filter(string_split_regex($c, '\s+'), t -> t <> '')"

  /** Reference simple_tokenize (stop-word + length>2 filter) over an
    * already-tokenized list expression.
    */
  def cleanFilterSql(toks: String): String =
    raw"list_filter($toks, t -> length(t) > 2 AND NOT list_contains($stopSql, lower(t)))"

  /** Reference preprocess_text (P1-P5): collapse whitespace, strip
    * punctuation keeping periods, lowercase, renormalize spaces — the
    * DuckDB twin of TextOps.preprocess.
    */
  def preprocessSql(c: String): String =
    raw"array_to_string(${toksSql(raw"lower(regexp_replace(regexp_replace(coalesce($c, ''), '\s+', ' ', 'g'), '[^\w\s.]', ' ', 'g'))")}, ' ')"

  /** Reference simple_tokenize token list (P6-P7) over an
    * already-preprocessed string expression.
    */
  def cleanToksSql(c: String): String = cleanFilterSql(toksSql(c))

  /** The BPE pre-token regex as a DuckDB string literal body. */
  val bpeRegexSql: String =
    graft.ops.TextAnalysisOps.BpeTokenRegex.replace("\\", "\\\\")

  /** Rewrites every CTE definition `name AS (` in a DuckDB oracle to
    * `name AS MATERIALIZED (` — an execution HINT, not a semantic change
    * (verified bit-identical on every rewritten oracle).
    *
    * Why it exists: DuckDB 1.0 INLINES each CTE reference by default, so
    * an unrolled-iteration oracle whose round r references round r-1
    * several times (NN-Descent's forward/reverse/incumbent uses, a beam
    * hop's frontier) re-expands the ENTIRE prefix at every reference —
    * multiplicative blowup that turned q138's 9 KB oracle into a ~15 min
    * single statement (420 s even at 16 DuckDB threads; 1.9 s
    * materialized, same rows). Applied per-oracle to the iterative
    * shapes, NOT globally: a `WINDOW w AS (...)` named-window clause
    * (used by q13b/q103/q117 and others) matches the same text pattern
    * but cannot take MATERIALIZED, hence the lookbehind guard.
    */
  def materializeCtes(sql: String): String = {
    // literal-aware: the SQL is split at single-quote boundaries (with
    // the '' escape) and both the guard and the rewrite see only the
    // text OUTSIDE string literals — so an oracle whose regex/data
    // literal happens to contain "x AS (" or "WINDOW " is neither
    // corrupted nor spuriously rejected.
    //
    // The lookbehind only protects the FIRST window name after a literal
    // "WINDOW " — a multi-window clause's second name follows ", " and
    // would be rewritten into invalid SQL. None of the wrapped oracles
    // uses a WINDOW clause; fail LOUDLY at construction time if one ever
    // does, instead of corrupting the oracle silently.
    val parts = splitOnLiterals(sql)
    require(!parts.exists { case (t, inLit) =>
      !inLit && t.toUpperCase.matches("(?s).*\\bWINDOW\\s.*") },
      "materializeCtes cannot safely rewrite SQL containing a WINDOW " +
        "clause — restructure the oracle or extend the guard")
    parts.map {
      case (t, true) => t
      case (t, false) =>
        t.replaceAll("(?<!WINDOW\\s)\\b(\\w+) AS \\(", "$1 AS MATERIALIZED (")
    }.mkString
  }

  /** Alternating (segment, isStringLiteral) split of a SQL text; a
    * literal segment includes its surrounding quotes and keeps the ''
    * escape intact, so `parts.mkString == sql`. A `name AS (` header can
    * never straddle a boundary (it contains no quote), so per-segment
    * rewriting is safe.
    */
  private def splitOnLiterals(sql: String): Vector[(String, Boolean)] = {
    val out = Vector.newBuilder[(String, Boolean)]
    val sb = new StringBuilder
    var inStr = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inStr) {
        if (c == '\'') {
          if (sb.nonEmpty) { out += ((sb.toString, false)); sb.clear() }
          sb.append(c); inStr = true
        } else sb.append(c)
      } else {
        sb.append(c)
        if (c == '\'') {
          if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
            sb.append('\''); i += 1
          } else { out += ((sb.toString, true)); sb.clear(); inStr = false }
        }
      }
      i += 1
    }
    if (sb.nonEmpty) out += ((sb.toString, inStr))
    out.result()
  }

  /** Recursive-CTE replay of the engine's merge-table BPE
    * ([[graft.functions.BpeMerges]]) over the DISTINCT pre-token
    * vocabulary of `documents.text` — each recursion step merges the
    * leftmost occurrence of the lowest-ranked adjacent pair, the exact
    * step contract BpeEncode implements. Running it per distinct word
    * (then joining back) keeps the oracle O(vocab · word_len) instead of
    * O(corpus · word_len). `list_position` returns 0 for a missing pair,
    * hence the `r > 0` filter; a row terminates (done) when no pair of its
    * current tokens is in the table. Defines `bpe_vocab(w, toks)`; must
    * be spliced under a `WITH RECURSIVE` header.
    */
  val bpeVocabCtes: String = {
    val merges = graft.functions.BpeMerges.mergesSqlList
    s"""bpe_words AS (
      SELECT DISTINCT unnest(regexp_extract_all(text, '$bpeRegexSql')) AS w
      FROM documents),
    bpe_steps AS (
      SELECT w, list_transform(range(1, len(w) + 1), i -> w[i]) AS toks,
        false AS done
      FROM bpe_words
      UNION ALL
      SELECT w,
        CASE WHEN pos IS NULL THEN toks
             ELSE list_concat(list_concat(toks[1:pos-1],
                    [toks[pos] || toks[pos+1]]), toks[pos+2:]) END,
        pos IS NULL
      FROM (
        SELECT w, toks,
          list_position(ranks,
            list_aggregate(list_filter(ranks, r -> r > 0), 'min')) AS pos
        FROM (
          SELECT w, toks,
            list_transform(range(1, len(toks)), i ->
              list_position($merges, toks[i] || ' ' || toks[i+1])) AS ranks
          FROM bpe_steps WHERE NOT done))),
    bpe_vocab AS (SELECT w, toks FROM bpe_steps WHERE done)"""
  }

  /** [[bpeVocabCtes]] plus the per-document roll-up: defines
    * `t(doc_id, source, n_tokens)` with n_tokens = real BPE token count —
    * the drop-in CTE prefix for token-budget/packing oracles. Also must
    * sit under `WITH RECURSIVE`.
    */
  val bpeCountCtes: String =
    s"""$bpeVocabCtes,
    bpe_doc AS (SELECT doc_id, source,
      regexp_extract_all(text, '$bpeRegexSql') AS pts FROM documents),
    bpe_ex AS (SELECT doc_id, unnest(pts) AS w FROM bpe_doc),
    bpe_cnt AS (SELECT e.doc_id,
        CAST(sum(len(v.toks)) AS BIGINT) AS n_tokens
      FROM bpe_ex e JOIN bpe_vocab v USING (w) GROUP BY e.doc_id),
    t AS (SELECT d.doc_id, d.source,
        CAST(coalesce(c.n_tokens, 0) AS BIGINT) AS n_tokens
      FROM bpe_doc d LEFT JOIN bpe_cnt c USING (doc_id))"""
}
