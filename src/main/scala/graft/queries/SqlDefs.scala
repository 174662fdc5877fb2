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
}
