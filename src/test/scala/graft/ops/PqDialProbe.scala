package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ignored-by-default measurement harness for the PqOverfetch dial —
  * regenerates the recall-vs-overfetch numbers cited in
  * SimilarityQueries.PqOverfetch's scaladoc after a codebook change.
  * Run explicitly: `testOnly graft.ops.PqDialProbe -- -n probe`.
  */
class PqDialProbe extends SparkSpec {
  ignore("measure recall at overfetch 4/8/16") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cb = SimilarityOps.trainPq(emb, m = 8, kSub = 16)
    val coded = SimilarityOps.pqEncode(emb, cb)
    def keys(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = keys(SimilarityOps.bruteForceTopK(emb, 50, 5))
    Seq(4, 8, 16).foreach { of =>
      val pq = keys(SimilarityOps.pqAdcTopK(emb, cb, coded, 50, 5, of))
      info(f"overfetch $of%2d recall ${(brute & pq).size.toDouble / brute.size}%.3f")
    }
  }
}
