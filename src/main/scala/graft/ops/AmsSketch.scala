package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared AMS (tug-of-war) F2 sketch arithmetic — one definition for the
  * batch query (q17e, which builds counters from the per-key count
  * relation) and the streaming twin ([[graft.streaming.StreamingOps
  * .amsF2Stream]], which builds them straight from raw rows).
  *
  * The sketch is LINEAR: z(rep, b) = Σ_rows sign(key)·1 over rows whose
  * key hashes to bucket b, so Σ_u ±c(u) (the count-relation form) and
  * Σ_rows ±1 (the row form) are the same number, and per-batch counter
  * relations merge by plain addition — order-free, idempotence-free,
  * which is what makes the streaming twin exactly equal to the batch
  * sketch of the concatenated stream (AmsSpec gates both identities).
  * Hash/sign/bucket derivation is [[HashOps.charHash]] over
  * `"r<rep>:<key>"` — engine-portable, so q17e's oracle replays it.
  */
object AmsSketch {

  /** Independent repetitions (median taken across). */
  val Reps = 5

  /** Buckets per repetition (the Thorup-Zhang/Count-Sketch variance
    * reduction; estimate per rep = Σ_b z_b²).
    */
  val Buckets = 16

  /** Per-(rep, bucket) signed counters from a COUNT relation: each key
    * contributes sign(key)·count to its bucket, once per repetition —
    * the single hash/bucket/sign definition both the batch query (q17e,
    * count-weighted) and [[rowCounters]] (count = 1 per row) run
    * through. Output `(rep, b, z)`, ≤ Reps×Buckets rows — the whole
    * sketch state.
    */
  def countCounters(counts: DataFrame, keyCol: String,
                    cntCol: String): DataFrame =
    counts
      .select(col(keyCol).cast("string").as("k"), col(cntCol).as("c"),
        explode(array((0 until Reps).map(r => lit(r.toLong)): _*)).as("rep"))
      .withColumn("h", HashOps.charHash(
        concat(lit("r"), col("rep").cast("string"), lit(":"), col("k"))))
      .withColumn("b", pmod(col("h"), lit(Buckets.toLong)))
      .withColumn("s",
        lit(1L) - lit(2L) * pmod(expr(s"h div $Buckets"), lit(2L)))
      .groupBy("rep", "b").agg(sum(col("s") * col("c")).as("z"))

  /** [[countCounters]] with count 1 per raw row — the streaming-twin
    * entry point (no per-key state needed; linearity makes the two
    * forms the same number, AmsSpec's identity gate).
    */
  def rowCounters(rows: DataFrame, keyCol: String): DataFrame =
    countCounters(rows.select(col(keyCol).as("__k"))
      .withColumn("__c", lit(1L)), "__k", "__c")

  /** Median-of-reps F2 estimate from a counter relation `(rep, b, z)` —
    * counters are summed per (rep, b) first, so the input may be the
    * union of any number of per-batch counter relations (linearity).
    * Empty input estimates 0 (the F2 of an empty stream).
    */
  def estimate(counters: DataFrame): Long = {
    val ests = counters.groupBy("rep", "b").agg(sum(col("z")).as("z"))
      .groupBy("rep").agg(sum(col("z") * col("z")).as("est"))
      .collect().map(_.getLong(1)).sorted
    if (ests.isEmpty) 0L else ests((ests.length - 1) / 2)
  }
}
