package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** materializeCtes is a text rewrite over oracle SQL — these gates pin
  * the literal-awareness the r11 advice asked for: CTE headers outside
  * string literals are materialized, text INSIDE literals is untouched,
  * and the WINDOW-clause guard neither fires on literals nor misses a
  * real clause.
  */
class SqlDefsSpec extends AnyFunSuite {

  test("rewrites CTE headers and leaves string literals alone") {
    val sql = "WITH a AS (SELECT 1), b AS (SELECT 'x AS (' AS s FROM a) " +
      "SELECT * FROM b"
    val out = SqlDefs.materializeCtes(sql)
    assert(out.contains("a AS MATERIALIZED (SELECT 1)"))
    assert(out.contains("b AS MATERIALIZED (SELECT 'x AS (' AS s"))
    assert(out.contains("'x AS ('"), "literal body was rewritten")
  }

  test("escaped quotes stay inside the literal") {
    val sql = "WITH a AS (SELECT 'it''s c AS (' AS s) SELECT * FROM a"
    val out = SqlDefs.materializeCtes(sql)
    assert(out.contains("a AS MATERIALIZED ("))
    assert(out.contains("'it''s c AS ('"), "escape-split corrupted the literal")
  }

  test("WINDOW inside a literal does not trip the guard") {
    val sql = "WITH a AS (SELECT 'WINDOW x' AS s) SELECT * FROM a"
    val out = SqlDefs.materializeCtes(sql)
    assert(out.contains("a AS MATERIALIZED ("))
  }

  test("a real WINDOW clause still fails loudly") {
    val sql = "WITH a AS (SELECT 1 AS x) SELECT sum(x) OVER w FROM a " +
      "WINDOW w AS (ORDER BY x)"
    intercept[IllegalArgumentException] {
      SqlDefs.materializeCtes(sql)
    }
  }

  test("round-trips: segments reassemble to the input when nothing matches") {
    val sql = "SELECT 'a', 'b''c', x FROM t WHERE y = 'z'"
    assert(SqlDefs.materializeCtes(sql) == sql)
  }
}
