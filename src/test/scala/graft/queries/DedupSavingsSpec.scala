package graft.queries

import graft.SparkSpec
import graft.ops.DedupOps
import org.apache.spark.sql.functions._

/** q139's exact-tier arithmetic on a corpus that actually HAS exact
  * duplicates — the sf fixtures have none (exact tier reads 0 removed
  * there), so without this the exact flag's polarity and token
  * attribution would ride solely on the near tier's shared code path.
  */
class DedupSavingsSpec extends SparkSpec {

  test("exact-tier savings match hand counts on a corpus with duplicates") {
    import sqlImplicits._
    // doc 1 duplicates doc 0 (canonical = min id survives); doc 3
    // duplicates doc 2; doc 4 unique. Token counts differ per text so a
    // flag/token mix-up changes the sums.
    val docs = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta gamma"),
      (2L, "delta epsilon"),
      (3L, "delta epsilon"),
      (4L, "zeta")
    ).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      graft.ops.TextAnalysisOps.bpePreTokens(col("text")).as("pts"))
      .select(col("doc_id"),
        size(graft.functions.BpeMerges.bpeEncode(col("pts")))
          .cast("long").as("n_tokens"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flags = DedupOps.exactDuplicates(docs)
      .select(col("doc_id"), col("is_duplicate"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags === Map(0L -> false, 1L -> true, 2L -> false,
      3L -> true, 4L -> false))
    // replicate q139's exact-tier aggregation by hand
    val docsRemoved = flags.count(_._2)
    val tokensRemoved = flags.filter(_._2).keys.map(toks).sum
    val tokensTotal = toks.values.sum
    assert(docsRemoved === 2)
    assert(tokensRemoved === toks(1L) + toks(3L))
    assert(tokensRemoved > 0L)
    assert(1000L * tokensRemoved / tokensTotal > 0L,
      "permille must be non-zero on this fixture")
  }
}
