package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates the oracle-tier census (ORACLES.md / [[Census]]): every
  * registry query either carries a DuckDB oracle or a census entry
  * naming its deterministic covering unit — a new rows-only query
  * without either fails here, so the declared-no-oracle set stays
  * auditable and can never silently grow. Pure registry math; no
  * Spark session.
  */
class OracleCensusSpec extends AnyFunSuite {

  test("census covering-unit map is exactly the rows-only set") {
    // renderTable() requires totality in both directions and no stray
    // oracle entries; a violation throws
    val md = Census.renderTable()
    assert(md.contains("| `q29d_knn_ivf` |"))
    assert(!md.contains("| `q01_clean_tokens` |"),
      "oracled queries do not get census rows")
  }

  test("committed ORACLES.md is current against the registry") {
    val f = java.nio.file.Paths.get("ORACLES.md")
    assert(java.nio.file.Files.exists(f),
      "ORACLES.md missing — run `sbt \"runMain graft.Census\"`")
    assert(java.nio.file.Files.readString(f) == Census.renderTable(),
      "ORACLES.md stale — re-run `sbt \"runMain graft.Census\"`")
  }
}
