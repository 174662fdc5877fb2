package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden + agreement gates for the suffix-array ExactSubstr pass
  * (semantics in SuffixArrayOps scaladoc).
  */
class SuffixArraySpec extends SparkSpec {
  import sqlImplicits._

  /** Brute-force longest repeated token run per doc over the SAME
    * concatenated-corpus semantics (overlapping occurrences count, runs
    * never cross doc boundaries) — an independent O(L²) re-derivation the
    * suffix array must match exactly.
    */
  private def bruteRuns(docs: Seq[(Long, Seq[String])]): Map[Long, Int] = {
    val flat = scala.collection.mutable.ArrayBuffer[String]()
    val docOf = scala.collection.mutable.ArrayBuffer[Int]()
    var sep = 0
    docs.zipWithIndex.foreach { case ((_, toks), di) =>
      toks.foreach { t => flat += ("t:" + t); docOf += di }
      flat += s"sep:$sep"; docOf += -1; sep += 1
    }
    val n = flat.length
    def common(i: Int, j: Int): Int = {
      var h = 0
      while (i + h < n && j + h < n && flat(i + h) == flat(j + h)) h += 1
      h
    }
    val best = scala.collection.mutable.Map[Long, Int]().withDefaultValue(0)
    for (i <- 0 until n; j <- (i + 1) until n if docOf(i) >= 0) {
      val c = common(i, j)
      val id = docs(docOf(i))._1
      if (c > best(id)) best(id) = c
      if (docOf(j) >= 0) {
        val jd = docs(docOf(j))._1
        if (c > best(jd)) best(jd) = c
      }
    }
    docs.map { case (id, _) => id -> best(id) }.toMap
  }

  test("suffix-array runs equal the brute-force longest repeated run on " +
      "seeded random corpora") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 8) {
      val docs = (1L to 6L).map { id =>
        val len = 3 + rnd.nextInt(25)
        id -> Seq.fill(len)("w" + rnd.nextInt(4))
      }
      val got = SuffixArrayOps.maxDupRuns(docs).map(t => t._1 -> t._3).toMap
      assert(got == bruteRuns(docs), s"trial $trial docs $docs")
    }
  }

  test("within-doc repetition and overlapping occurrences") {
    // XX with X = t1..t10 non-periodic: X occurs at 0 and 10, and no
    // longer substring fits twice inside the 20 tokens -> run 10
    val x = (1 to 10).map("t" + _)
    assert(SuffixArrayOps.maxDupRuns(Seq(1L -> (x ++ x))) == Seq((1L, 20, 10)))
    // a^5: "a a a a" occurs at 0 and 1 — OVERLAPPING occurrences count,
    // as in the paper -> run 4
    assert(SuffixArrayOps.maxDupRuns(Seq(2L -> Seq.fill(5)("a"))) ==
      Seq((2L, 5, 4)))
  }

  test("runs never cross doc boundaries") {
    // "a b" at the END of doc 1 and START of doc 2 never fuses with its
    // neighbors into a longer phantom run
    val got = SuffixArrayOps.maxDupRuns(Seq(
      1L -> Seq("x", "a", "b"), 2L -> Seq("a", "b", "y")))
    assert(got == Seq((1L, 3, 2), (2L, 3, 2)))
  }

  test("agreement with the relational cover on a chain-free fixture: " +
      "shared passage length is exact on both sides") {
    val passage = (1 to 15).map("p" + _).mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 u3 $passage u4 u5"),
      (2L, s"v1 $passage v2 v3 v4"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12")).toDF("doc_id", "text")
    val sa = SuffixArrayOps.exactSubstrProfile(docs, sampleMod = 1, parts = 1)
      .orderBy("doc_id").collect()
    assert(sa.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 15L), (2L, 15L), (3L, 0L)))
    val cover = DedupOps.variableSpanProfile(docs, 10, Seq(10), 10)
      .orderBy("doc_id").collect()
    graft.CacheScope.releaseAll()
    // chain-free: the one shared passage is the one maximal region
    assert(cover.map(r => (r.getLong(0), r.getLong(3))).toSeq ==
      Seq((1L, 15L), (2L, 15L), (3L, 0L)))
  }

  test("agreement contract on the fixture: cover over-approximates, " +
      "emptiness coincides below the shingle width") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val n = graft.queries.DedupQueries.SpanN
    val sa = SuffixArrayOps.exactSubstrProfile(docs, sampleMod = 1, parts = 1)
      .select(col("doc_id"), col("max_dup_run")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cover = DedupOps.variableSpanProfile(docs, n, Seq(n), n)
      .select(col("doc_id"), col("max_span_len")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.CacheScope.releaseAll()
    assert(sa.keySet == cover.keySet)
    sa.foreach { case (id, run) =>
      val span = cover(id)
      if (run >= n) {
        // the true longest duplicated run is always inside some maximal
        // merged cover region (chains can only extend it)
        assert(span >= run, s"doc $id: cover $span < sa run $run")
      } else {
        // no duplicated run of >= n tokens <=> no duplicated n-shingle
        assert(span == 0, s"doc $id: sa run $run < $n but cover $span")
      }
    }
  }

  test("hash sampling and partition grouping are deterministic and bounded") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = SuffixArrayOps.exactSubstrProfile(docs, sampleMod = 2, parts = 4)
      .orderBy("doc_id").collect().toSeq
    val b = SuffixArrayOps.exactSubstrProfile(docs, sampleMod = 2, parts = 4)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.size < docs.count())
  }
}
