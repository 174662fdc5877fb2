package graft.queries

import graft.SparkSpec
import graft.ops.{DedupOps, TextAnalysisOps, TextOps}
import org.apache.spark.sql.functions._

/** q141 source-overlap and q142 Zipf-slope invariants. The DuckDB oracle
  * proves value exactness; these prove the laws a hash can't articulate
  * (set algebra on the overlap matrix, the least-squares arithmetic on a
  * DESIGNED frequency ladder) — the fixture's 31-token vocabulary makes
  * every source pair overlap, so a hand corpus exercises the edges.
  */
class SourceSignalsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q141: pair matrix is canonical, bounded, and consistent with per-source sizes") {
    val out = DedupQueries.q141SourceOverlap(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (szA, szB, inter, jm) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(a < b, "canonical pair order")
      assert(inter >= 1 && inter <= math.min(szA, szB))
      assert(jm === 1000000L * inter / (szA + szB - inter))
      assert(jm >= 0 && jm <= 1000000L)
    }
    // sizes agree with an independent per-source distinct-shingle count
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sizes = DedupOps.shingles(
      docs.select(col("doc_id"), TextOps.tokenize(col("text")).as("toks")),
      DedupQueries.ShingleN)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), col("shingle")).distinct()
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      assert(r.getLong(2) === sizes(r.getString(0)))
      assert(r.getLong(3) === sizes(r.getString(1)))
    }
  }

  test("q142: designed frequency ladder yields the hand-computed exact slope") {
    import sqlImplicits._
    // freqs 8/4/2/1 -> ranks 1..4 -> x = floor_log2(rank) = 0,1,1,2;
    // y = floor_log2(freq) = 3,2,1,0. n=4, sx=4, sy=6, sxy=3, sxx=6:
    // num = 4*3 - 4*6 = -12, den = 4*6 - 16 = 8, slope = -1.5.
    val text = (Seq.fill(8)("alpha") ++ Seq.fill(4)("beta") ++
      Seq.fill(2)("gamma") ++ Seq("delta")).mkString(" ")
    val docs = Seq((0L, "s1", text)).toDF("doc_id", "source", "text")
    val out = TextAnalysisOps.zipfSlope(docs).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 4L, "n_terms")
    assert(r.getLong(2) === -12L, "slope_num")
    assert(r.getLong(3) === 8L, "slope_den")
    assert(r.getLong(4) === -1500000L, "slope_micro truncates toward zero on the negated-positive")
  }

  test("q142: fixture slopes are negative, rational-consistent, and cover every source") {
    val out = AnalysisQueries.q142ZipfSlope(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(out.length === docs.select("source").distinct().count())
    out.foreach { r =>
      val (num, den) = (r.getLong(2), r.getLong(3))
      assert(den > 0, "distinct ranks exist for every fixture source")
      val expected =
        if (num >= 0) 1000000L * num / den else -(1000000L * -num / den)
      assert(r.getLong(4) === expected)
      assert(num <= 0, "rank-frequency curves never ascend")
    }
    assert(out.exists(_.getLong(2) < 0),
      "at least one source has a strictly descending curve")
  }

  test("q146: mixture weights are a floored probability vector tied to its factors") {
    val out = AnalysisQueries.q146MixtureWeights(spark, dir).collect()
    assert(out.nonEmpty)
    val weights = out.map(_.getLong(4))
    out.foreach { r =>
      val (pp, up, w) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(pp >= 0 && pp <= 1000 && up >= 0 && up <= 1000)
      assert(w >= 0 && w <= 1000)
      if (pp * up == 0) assert(w === 0, "a zero factor kills the weight")
    }
    val total = weights.sum
    assert(total <= 1000 && total > 1000 - out.length,
      s"floored normalization: sum $total within one floor per source")
  }

  test("q148: the source matrix conserves the pair relation and stays canonical") {
    val out = DedupQueries.q148CrossSourcePairs(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getString(0) <= r.getString(1)))
    val totalPairs = DedupQueries.q25NgramJaccard(spark, dir).count()
    assert(out.map(_.getLong(2)).sum === totalPairs,
      "every verified pair lands in exactly one matrix cell")
  }

  test("q149: realization fills exactly each source's floored quota, in " +
      "deterministic permutation order") {
    val picks = AnalysisQueries.q149MixtureRealization(spark, dir).collect()
    val quotas = AnalysisQueries.q146MixtureWeights(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(4) * AnalysisQueries.MixTargetDocs / 1000)).toMap
    val bySource = picks.groupBy(_.getString(0))
    quotas.foreach { case (s, q) =>
      val got = bySource.get(s).map(_.length.toLong).getOrElse(0L)
      assert(got === math.min(q,
        spark.read.parquet(s"$dir/documents.parquet")
          .where(col("source") === s).count()), s"source $s quota")
    }
    bySource.values.foreach { rows =>
      val rks = rows.map(_.getLong(2)).sorted
      assert(rks.sameElements(1L to rks.length), "ranks are a 1..quota prefix")
    }
    val total = picks.length.toLong
    assert(total <= AnalysisQueries.MixTargetDocs,
      "floored quotas never overshoot the budget")
    val expectedTotal = quotas.map { case (s, q) =>
      math.min(q, spark.read.parquet(s"$dir/documents.parquet")
        .where(col("source") === s).count())
    }.sum
    assert(total === expectedTotal, "total is exactly the sum of capped quotas")
  }

  test("q157: recommendations obey the weight rule and drop a member of the pair") {
    val out = AnalysisQueries.q157PruneCandidates(spark, dir).collect()
    assert(out.nonEmpty, "the fixture yields pruning candidates")
    out.foreach { r =>
      val (a, b, drop) = (r.getString(0), r.getString(1), r.getString(6))
      val (wa, wb) = (r.getLong(4), r.getLong(5))
      assert(drop === a || drop === b)
      if (wa < wb) assert(drop === a)
      else if (wb < wa) assert(drop === b)
      else assert(drop === (if (a > b) a else b), "tie: lexicographic")
      assert(r.getLong(2) >= AnalysisQueries.PruneOverlapMicro)
      assert(r.getLong(3) >= 1, "realized doc-pair evidence required")
    }
  }

  test("q142: single-term source degenerates to a null slope, not a crash") {
    import sqlImplicits._
    val docs = Seq((0L, "mono", "same same same")).toDF("doc_id", "source", "text")
    val r = TextAnalysisOps.zipfSlope(docs).collect().head
    assert(r.getLong(1) === 1L)
    assert(r.getLong(3) === 0L, "one point: zero denominator")
    assert(r.isNullAt(4), "slope undefined")
  }
}
