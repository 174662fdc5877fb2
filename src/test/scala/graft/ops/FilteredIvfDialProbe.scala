package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ignored-by-default measurement harness for q187d's nProbe dial —
  * regenerates the filtered-IVF recall-vs-nProbe numbers cited in
  * SimilarityQueries' q187d comment. Filtered probes are cheaper per
  * cell (only in-label members are dotted), so the filtered rung can
  * afford a higher nProbe than unfiltered q79d at the same candidate
  * budget. Run explicitly: `testOnly graft.ops.FilteredIvfDialProbe`
  * with the ignore flipped.
  */
class FilteredIvfDialProbe extends SparkSpec {
  ignore("measure filtered-IVF recall at nProbe 8/10/12") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val index = SimilarityOps.buildIvfIndex(emb, nCells = 16)
    val coded = SimilarityOps.ivfSq8Coded(index, emb)
    val codedLabeled = SimilarityOps.ivfSq8CodedLabeled(index, emb)
    val labels = emb.select(col("vec_id"), col("label"))
    val brute = SimilarityOps.labelFilteredTopK(emb, 50, 5)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Seq(8, 10, 12).foreach { np =>
      val qCells = SimilarityOps.labelFilteredIvfProbeCells(
        index, coded, labels, 50, np)
      val got = SimilarityOps.labelFilteredIvfSq8Score(
          index, codedLabeled, qCells, 5, 4)
        .select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      info(f"nProbe $np%2d recall ${(brute & got).size.toDouble / brute.size}%.3f")
    }
  }
}
