package graft

/** Generates ORACLES.md — the oracle-tier census: how many registry
  * queries hash-verify against the DuckDB oracle, and for each query
  * that is DECLARED rows-only (no SQL-expressible oracle), the unit
  * suite that carries its deterministic contract instead. The census
  * exists so the declared-no-oracle set is auditable at a glance
  * without reading `SparkEntry.oracleSql` (round-10 verdict, item 7).
  *
  * The covering-unit map is REQUIRED to be total over the rows-only
  * set: registering a new query without an oracle and without a census
  * entry fails this main (and OracleCensusSpec), so the census can
  * never silently drift from the registry.
  *
  * Run: `sbt "runMain graft.Census"` (writes ORACLES.md; no Spark
  * session — the registry maps are plain values).
  */
object Census {

  /** One line per rows-only query: WHY it has no SQL oracle and WHICH
    * unit(s) carry its deterministic contract. Spec names are real
    * ScalaTest suites under src/test/scala. */
  val coveringUnits: Map[String, (String, String)] = Map(
    "q17b_approx_distinct" -> ("HLL sketch estimate (approximate by construction)",
      "PropertySpec: relative-error bound vs exact distinct across seeds"),
    "q29d_knn_ivf" -> ("IVF probe is recall-traded retrieval (cell subset)",
      "DedupSimilaritySpec: all-cells-probed ≡ brute force bit-exactly; stored cell-partitioned index scores byte-identically to the in-memory path with a scan pruned to exactly the probed cells; ≥60% recall floor"),
    "q187d_filtered_topk_ivf" -> ("label-filtered IVF probe (KMeans cells, recall-traded)",
      "DedupSimilaritySpec: all-cells-probed float tier ≡ the hash-verified filtered brute truth (q187) bit-exactly; stored label-keyed layout scores byte-identically to the in-memory path with partition pruning to probed cells AND the label in the ADC join key plan-asserted; deterministic re-run"),
    "q187e_filtered_ivf_recall" -> ("recall row composes the KMeans rung (q187d)",
      "DedupSimilaritySpec: ≥800‰ floor vs the hash-verified q187 brute truth (measured 880‰ at nProbe 12)"),
    "q40_topic_terms" -> ("LDA fit (MLlib EM, seeded)",
      "TopicPipelineSpec + LdaGoldenSpec: seeded determinism + golden top-terms content"),
    "q41_doc_tags" -> ("LDA inference over the q40 model",
      "TopicPipelineSpec: dominant-topic invariants + seeded determinism"),
    "q61c_exact_substr" -> ("suffix-array CPU kernel (mapPartitions tier)",
      "SuffixArraySpec: brute-force agreement on longest repeated runs; runs never cross doc boundaries"),
    "q68b_adaptive_length_approx" -> ("sampled length profile (approximate by construction)",
      "CurationPipelineSpec: error bound vs the exact q68 profile"),
    "q79d_knn_ivf_sq8" -> ("IVF-SQ8 probe (recall-traded, quantized)",
      "DedupSimilaritySpec: SQ8 code bounds, ≥80% recall floor, rerank dominance"),
    "q79e_stored_ivf" -> ("stored-index read-back of q79d",
      "DedupSimilaritySpec: byte-identity q79e ≡ q79d; partition pruning to probed cells plan-asserted"),
    "q79f_ivf_append" -> ("incremental append to the stored IVF index",
      "IvfAppendSpec + StreamingParitySpec: append ≡ rebuild row-compare; streaming twin parity"),
    "q79g_ivf_drift" -> ("drift stats over KMeans-assigned cells",
      "RebuildDecisionSpec + DriftDqSpec: self-delta keeps (ratio exactly 1e6), shifted delta rebuilds"),
    "q87_bpe_train" -> ("BPE merge-table training (iterative argmax)",
      "BpeTrainSpec: merge-table golden + encode round-trip; q87c's token relation oracled downstream"),
    "q87c_trained_tokens" -> ("encode under the q87 trained merges",
      "BpeTrainSpec: encode ≡ reference replay on fixture docs"),
    "q87d_wordpiece_train" -> ("WordPiece vocabulary training",
      "WordPieceSpec: vocabulary golden + longest-match-first encode units"),
    "q87e_wordpiece_tokens" -> ("encode under the q87d trained vocabulary",
      "WordPieceSpec: encode golden incl. UNK and continuation pieces"),
    "q104_pq_adc" -> ("PQ codebooks are seeded-KMeans-derived",
      "PqSpec: ADC vs exact distance correlation floor; code bounds"),
    "q104b_ivf_pq" -> ("IVF-PQ composition over seeded codebooks",
      "PqSpec: composed recall floor vs brute force"),
    "q104c_stored_pq" -> ("stored PQ index read-back",
      "PqSpec: stored ≡ in-memory byte-identity; partition pruning plan-asserted"),
    "q104d_pq_drift" -> ("drift stats over PQ sub-space assignments",
      "RebuildDecisionSpec: self-delta keeps, shifted delta rebuilds (shared rule hash-verified via q158)"),
    "q115_unigram_train" -> ("UnigramLM EM training (iterative pruning)",
      "UnigramLmSpec: deterministic training, EM log-likelihood ascent, single-char pieces never pruned"),
    "q115b_unigram_tokens" -> ("Viterbi encode under the q115 model",
      "UnigramLmSpec: Viterbi ≡ exhaustive best segmentation; round-trip restores every corpus word"),
    "q158b_ann_rebuild" -> ("decision over KMeans-backed drift inputs",
      "RebuildDecisionSpec: directional gates both families; the decision RULE itself is hash-verified through q158's LSH instantiation"),
    "q162b_length_quantiles_approx" -> ("Greenwald-Khanna sketch (approximate by construction)",
      "MedianNarrowingSpec: every source/percentile within the published n/accuracy rank-error window of the exact q162 selection"),
    "q167_index_rebuild" -> ("rebuild execution over KMeans-retrained trees",
      "IndexRebuildSpec: rebuilt tree ≡ from-scratch build on base ∪ delta; probe over the swapped store ≡ fresh in-memory probe; keep leaves the store byte-identical; crash-planted staging/park states recover"),
    "q178_perceptron_train" -> ("averaged-perceptron training (sequential updates — each step's prediction depends on all prior updates, the q87 argument)",
      "ClassifierTrainSpec: independent step-by-step replay equality; bit-determinism across runs; learns a designed separable problem the surrogate cannot"),
    "q178b_perceptron_eval" -> ("promotion row under the q178 runtime-trained table",
      "ClassifierTrainSpec: trained accuracy beats the fixed surrogate on the fixture; row restates oracled battery labels (q21 family)"))

  def renderTable(): String = {
    val all = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    val rowsOnly = all -- oracled
    val stray = oracled -- all
    require(stray.isEmpty, s"oracleSql without a query: $stray")
    val unmapped = rowsOnly -- coveringUnits.keySet
    require(unmapped.isEmpty,
      s"rows-only queries missing a census covering-unit entry: $unmapped")
    val stale = coveringUnits.keySet -- rowsOnly
    require(stale.isEmpty,
      s"census entries for queries no longer rows-only: $stale")
    val rows = rowsOnly.toSeq.sorted.map { q =>
      val (why, unit) = coveringUnits(q)
      s"| `$q` | $why | $unit |"
    }.mkString("\n")
    // NOT stripMargin: the markdown table rows legitimately start with
    // '|', which stripMargin would eat
    Seq(
      "# Oracle-tier census",
      "",
      "<!-- GENERATED by `sbt \"runMain graft.Census\"` — do not edit. -->",
      "",
      s"Registry: **${all.size}** queries. **${oracled.size}** carry a DuckDB",
      "oracle in `SparkEntry.oracleSql` and hash-verify exactly through the",
      "driver gate (`graft.Verify` → `tools/check.py`). The remaining",
      s"**${rowsOnly.size}** are declared rows-only — each because its",
      "semantics are not SQL-expressible deterministically (seeded ML fits,",
      "recall-traded retrieval, sketches) — and each carries the",
      "deterministic contract below instead. `OracleCensusSpec` fails the",
      "build if a rows-only query lacks a census entry, so this table",
      "cannot drift from the registry.",
      "",
      "| query | why no SQL oracle | deterministic covering unit |",
      "|---|---|---|",
      rows,
      "").mkString("\n")
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "ORACLES.md"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), renderTable())
    println(s"[census] wrote $out")
  }
}
