package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** True suffix-array ExactSubstr (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better", public) on a bounded
  * sample — the published algorithm [[DedupOps.spanCovers]]'s relational
  * formulation approximates.
  *
  * The relational cover is the SCALE path: one fixed-n shingle pass, two
  * keyed shuffles, runs on the whole corpus. But a merged cover can chain
  * DIFFERENT duplicated shingles (span A duplicated against doc X
  * overlapping span B duplicated against doc Y), so its maximal regions
  * over-approximate the longest truly-duplicated substring. This operator
  * computes the exact statistic — per doc, the length of the longest
  * token run that occurs at least twice in the sample (across docs or
  * within one; overlapping occurrences count, as in the paper) — with a
  * real suffix array + LCP pass, the way the paper does, over a
  * hash-sampled subset small enough to hold per partition:
  *
  *   1. deterministic hash sample (`xxhash64(id) % sampleMod == 0`) —
  *      the boundedness knob; ExactSubstr-style QA runs on samples, full
  *      dedup stays with the relational cover;
  *   2. hash-partition the sample into `parts` groups; each task
  *      concatenates its docs' token-id arrays with per-doc unique
  *      separators (so no run crosses a doc boundary), builds the suffix
  *      array (prefix-doubling, O(L log² L)) and the LCP array (Kasai,
  *      O(L)), and reads each position's longest duplicated prefix off
  *      its rank neighbors — duplicates are found WITHIN a partition
  *      group, the declared approximation of the bounded pass.
  *
  * This is the third justified per-partition imperative escape (with the
  * media codecs and the Avro container IO): a suffix array is a
  * pointer-chasing index build Catalyst cannot express, and it never
  * sits on an oracle-verified relational path. The agreement contract
  * with the relational cover is unit-gated (SuffixArraySpec): on the same
  * doc set, `cover_max >= sa_max` whenever `sa_max >= n`, `cover_max == 0`
  * iff `sa_max < n`, equality on chain-free fixtures, and the SA statistic
  * itself is golden-gated against a brute-force longest-repeated-run on
  * random corpora.
  *
  * Output: `(idCol, n_tokens, max_dup_run)` for the sampled docs,
  * `max_dup_run` in tokens.
  */
object SuffixArrayOps {

  /** Prefix-doubling suffix array over an int sequence. */
  private[ops] def suffixArray(a: Array[Int]): Array[Int] = {
    val n = a.length
    if (n == 0) return Array.empty
    var rank = new Array[Int](n)
    var sa = Array.range(0, n).sortBy(a)
    // compress initial symbol ranks
    rank(sa(0)) = 0
    var i = 1
    while (i < n) {
      rank(sa(i)) = rank(sa(i - 1)) + (if (a(sa(i)) != a(sa(i - 1))) 1 else 0)
      i += 1
    }
    var k = 1
    while (k < n && rank(sa(n - 1)) != n - 1) {
      def key(p: Int): (Int, Int) =
        (rank(p), if (p + k < n) rank(p + k) else -1)
      sa = sa.sortBy(key)
      val next = new Array[Int](n)
      next(sa(0)) = 0
      var j = 1
      while (j < n) {
        next(sa(j)) = next(sa(j - 1)) + (if (key(sa(j)) != key(sa(j - 1))) 1 else 0)
        j += 1
      }
      rank = next
      k *= 2
    }
    sa
  }

  /** Kasai LCP: `lcp(r)` = longest common prefix of suffixes ranked
    * `r-1` and `r` (lcp(0) = 0).
    */
  private[ops] def lcpArray(a: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = a.length
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val lcp = new Array[Int](n)
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && a(i + h) == a(j + h)) h += 1
        lcp(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    lcp
  }

  /** Per-position longest duplicated prefix: a run starting at position
    * `p` occurs elsewhere iff `p`'s suffix shares that prefix with a rank
    * neighbor. Separators never match (unique ids), so runs stop at doc
    * boundaries by construction.
    */
  private[ops] def dupRunPerPosition(a: Array[Int]): Array[Int] = {
    val sa = suffixArray(a)
    val lcp = lcpArray(a, sa)
    val n = a.length
    val dup = new Array[Int](n)
    var r = 0
    while (r < n) {
      val d = math.max(lcp(r), if (r + 1 < n) lcp(r + 1) else 0)
      dup(sa(r)) = d
      r += 1
    }
    dup
  }

  /** Longest duplicated token run per doc across a token corpus held in
    * memory — the per-partition kernel, exposed for the golden units.
    */
  private[ops] def maxDupRuns(docs: Seq[(Long, Seq[String])]): Seq[(Long, Int, Int)] = {
    val dict = scala.collection.mutable.HashMap[String, Int]()
    val flat = scala.collection.mutable.ArrayBuffer[Int]()
    val docOf = scala.collection.mutable.ArrayBuffer[Int]()
    var sep = -1 // separators: unique negative ids, one per boundary
    docs.zipWithIndex.foreach { case ((_, toks), di) =>
      toks.foreach { t =>
        flat += dict.getOrElseUpdate(t, dict.size + 1)
        docOf += di
      }
      flat += sep
      docOf += -1
      sep -= 1
    }
    val dup = dupRunPerPosition(flat.toArray)
    val best = new Array[Int](docs.size)
    var i = 0
    while (i < dup.length) {
      val d = docOf(i)
      if (d >= 0 && dup(i) > best(d)) best(d) = dup(i)
      i += 1
    }
    docs.zipWithIndex.map { case ((id, toks), di) => (id, toks.size, best(di)) }
  }

  private val OutSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("max_dup_run", LongType, nullable = false)))

  def exactSubstrProfile(docs: DataFrame, sampleMod: Int, parts: Int,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    require(sampleMod > 0 && parts > 0)
    val spark = docs.sparkSession
    val sampled = docs
      .where(pmod(xxhash64(col(idCol)), lit(sampleMod)) === 0)
      .select(col(idCol), TextOps.tokenize(col(textCol)).as("toks"))
      .repartition(parts, col(idCol))
    val rows = sampled.rdd.mapPartitions { it =>
      val group = it.map(r =>
        (r.getLong(0), r.getSeq[String](1))).toVector.sortBy(_._1)
      maxDupRuns(group).iterator.map { case (id, nt, run) =>
        Row(id, nt.toLong, run.toLong)
      }
    }
    spark.createDataFrame(rows, OutSchema)
  }
}
