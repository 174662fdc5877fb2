package graft.queries

import graft.SparkSpec

/** q119b stage-cardinality gate (r9 advisor finding): the composite's
  * driver-compare once verified hash-equality of two EMPTY relations —
  * the strict Gopher gate kept zero fixture docs, so clustering,
  * canonicalization and contamination all ran over nothing and a bug
  * emptying both sides for different reasons would have passed. This
  * spec pins every intermediate stage NON-TRIVIAL on the fixture AND
  * pins that each stage actually drops rows, so the oracle row can
  * never silently go vacuous again.
  */
class EvalSafeCorpusSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q119b: every stage is non-trivial and every stage drops rows") {
    val st = CurationQueries.q119bStages(spark, dir)
    val nDocs = graft.Tables.documents(spark, dir).count()
    val kept = st.kept.count()
    val canonical = st.canonical.count()
    val canonicalTrain = st.canonicalTrain.count()
    val survivors = st.result.count()
    graft.CacheScope.releaseAll()
    // non-trivial: each stage has real members
    assert(kept > 0, "Gopher soft gate kept nothing")
    assert(canonical > 0, "cluster canonicalization produced nothing")
    assert(canonicalTrain > 0, "bench carve removed every canonical doc")
    assert(survivors > 0, "decontamination removed every survivor")
    // each stage genuinely filters: the gate drops docs, canonicalization
    // can only shrink the kept set, the bench carve drops canonical bench
    // docs, and the final projection is bounded by canonical-train
    assert(kept < nDocs, "quality gate dropped nothing — gate is vacuous")
    assert(canonical <= kept && canonicalTrain < canonical,
      "bench carve dropped nothing — carve is vacuous")
    assert(survivors <= canonicalTrain)
  }
}
