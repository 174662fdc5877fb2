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
}
