package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (builder-prompt extension
  * surface; seeded by the reference's dead cosine_similarity import,
  * nlp_data_tagging.py:10).
  *
  * Cosine arithmetic is a left fold over the zipped arrays (`aggregate` ∘
  * `zip_with`) — the same fold DuckDB's `list_reduce` performs, so double
  * results are bit-identical and the 1e6-scaled integer score is exactly
  * verifiable. Element access is 1-based in both engines.
  *
  * Scale design: brute-force top-k is the correctness baseline — it
  * broadcasts the (small) query set against the full candidate table, a
  * map-side cross product with a per-query top-k window (WindowGroupLimit
  * prunes before the shuffle). The sign-LSH bucketed variant is the scale
  * path: candidates are met only inside the query's hyperplane-sign bucket,
  * dropping compared pairs by ~2^bits while keeping recall high for
  * near-duplicate-grade similarity. At 100 TB the bucket id becomes the
  * shuffle/bucketing key, so probes touch one partition.
  */
object SimilarityOps {

  /** Dot product of two double-array attribute refs (left fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2 norm (left fold + correctly-rounded sqrt — portable). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity scaled to an exact integer (micro-units). */
  def cosineMicro(a: Column, b: Column, na: Column, nb: Column): Column =
    floor(lit(1000000.0) * dot(a, b) / (na * nb)).cast("long")

  /** Hyperplane-sign LSH bucket: bit d set iff component d+1 is positive.
    * Axis-aligned planes (deterministic, engine-portable); random rotations
    * would need a seeded projection matrix — same plumbing, different
    * constants.
    */
  def signBucket(a: Column, bits: Int): Column =
    (0 until bits)
      .map(d => when(element_at(a, d + 1) > 0.0, lit(1L << d)).otherwise(0L))
      .reduce(_ + _)

  /** `(vec_id, emb ARRAY<DOUBLE>, nrm)` staged projection of an embeddings
    * table — downstream lambdas must see attribute refs, not nested
    * expressions (expression-tree duplication otherwise re-evaluates the
    * cast per element).
    */
  def prepared(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .select(col("vec_id"), col("emb"), norm(col("emb")).as("nrm"))

  /** Brute-force cosine top-k: for each query vector (`vec_id % everyNth ==
    * 0`), the k nearest other vectors by scaled cosine, ties broken by
    * candidate id. The query side is broadcast — candidates stream through
    * map-side, no shuffle of the big table.
    */
  def bruteForceTopK(embeddings: DataFrame, everyNth: Int, k: Int): DataFrame = {
    val p = prepared(embeddings)
    val q = p.where(col("vec_id") % everyNth === 0)
      .toDF("query_id", "q_emb", "q_nrm")
    val scored = p.toDF("cand_id", "c_emb", "c_nrm")
      .join(broadcast(q), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        cosineMicro(col("q_emb"), col("c_emb"), col("q_nrm"), col("c_nrm"))
          .as("cos_micro"))
    topKPerQuery(scored, k)
  }

  /** Sign bucket over a dimension slice `[offset+1, offset+bits]` — one
    * hash table of a multi-table LSH index.
    */
  def signBucketAt(a: Column, offset: Int, bits: Int): Column =
    (0 until bits)
      .map(d => when(element_at(a, offset + d + 1) > 0.0, lit(1L << d)).otherwise(0L))
      .reduce(_ + _)

  /** Multi-table sign-LSH top-k: identical contract to bruteForceTopK but
    * candidates are the union of same-bucket vectors across `tables` hash
    * tables (table t buckets on dims [t*bits, (t+1)*bits)), then exact
    * rerank. A single sign table has recall ~p^bits per true neighbor
    * (p = 1 - θ/π per hyperplane); T tables lift it to 1-(1-p^bits)^T —
    * the standard LSH recall/cost dial. Recall vs brute force is
    * property-tested (DedupSimilaritySpec); the oracle verifies the
    * bucketed semantics exactly.
    */
  def bucketedTopK(embeddings: DataFrame, everyNth: Int, k: Int,
                   bits: Int, tables: Int): DataFrame = {
    val p = prepared(embeddings)
    val withBuckets = p.select(col("vec_id"), col("emb"), col("nrm"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          signBucketAt(col("emb"), t * bits, bits).as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("emb"), col("nrm"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val q = withBuckets.where(col("vec_id") % everyNth === 0)
      .select(col("vec_id").as("query_id"), col("tbl"), col("bucket"))
    val cand = withBuckets
      .select(col("vec_id").as("cand_id"), col("tbl"), col("bucket"))
      .join(broadcast(q), Seq("tbl", "bucket"))
      .where(col("cand_id") =!= col("query_id"))
      .select("query_id", "cand_id").distinct()
    val scored = cand
      .join(p.toDF("query_id", "q_emb", "q_nrm"), "query_id")
      .join(p.toDF("cand_id", "c_emb", "c_nrm"), "cand_id")
      .select(col("query_id"), col("cand_id"),
        cosineMicro(col("q_emb"), col("c_emb"), col("q_nrm"), col("c_nrm"))
          .as("cos_micro"))
    topKPerQuery(scored, k)
  }

  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_micro").desc, col("cand_id").asc)
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= k)
  }

  /** Embedding-cosine near-duplicate pairs, sign-LSH blocked: pairs sharing
    * a bucket with scaled cosine >= minMicro. The embedding-space analogue
    * of DedupOps.simhashPairs.
    */
  def cosineNearDupPairs(embeddings: DataFrame, bits: Int,
                         minMicro: Long): DataFrame = {
    val p = prepared(embeddings)
      .select(col("vec_id"), col("emb"), col("nrm"),
        signBucket(col("emb"), bits).as("bucket"))
    p.toDF("id_a", "a_emb", "a_nrm", "bucket")
      .join(p.toDF("id_b", "b_emb", "b_nrm", "bucket"), "bucket")
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineMicro(col("a_emb"), col("b_emb"), col("a_nrm"), col("b_nrm"))
          .as("cos_micro"))
      .where(col("cos_micro") >= minMicro)
  }
}
