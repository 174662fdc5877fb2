package graft.queries

import graft.SparkSpec
import graft.ops.SimilarityOps
import org.apache.spark.sql.functions._

/** q172 perplexity buckets, q173 semantic leakage, q174 domain reweight.
  * The DuckDB oracles prove value exactness; these prove the policy laws
  * a row hash can't articulate — tercile mass bounds under value cuts,
  * the nearest-neighbor contract against an independent brute scan, and
  * the multiplicative-weights trajectory (probability-vector flooring,
  * directional movement toward the high-excess domain).
  */
class CorpusPolicySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q172: tiers partition each source and value cuts bound the tercile mass") {
    val out = AnalysisQueries.q172PerplexityBuckets(spark, dir).collect()
    assert(out.nonEmpty)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val perSource = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySource = out.groupBy(_.getString(0))
    assert(bySource.keySet === perSource.keySet, "every source is bucketed")
    bySource.foreach { case (src, rows) =>
      val n = perSource(src)
      val byBucket = rows.map(r => r.getLong(1) -> r).toMap
      rows.foreach { r =>
        val (b, tier) = (r.getLong(1), r.getString(2))
        assert(Set(1L, 2L, 3L).contains(b))
        assert(tier === (b match {
          case 1 => "head"; case 2 => "middle"; case _ => "tail" }))
      }
      assert(rows.map(_.getLong(3)).sum === n,
        s"buckets partition source $src")
      // cut1 is the min value whose cumulative count reaches ceil(n/3):
      // the head can only OVERSHOOT a third (ties share a bucket)
      val head = byBucket.get(1L).map(_.getLong(3)).getOrElse(0L)
      assert(3 * head >= n, "head holds at least a third")
      val headMid = head + byBucket.get(2L).map(_.getLong(3)).getOrElse(0L)
      assert(3 * headMid >= 2 * n, "head+middle hold at least two thirds")
      val shares = rows.map(_.getLong(5))
      assert(shares.forall(s => s >= 0 && s <= 1000))
      assert(shares.sum <= 1000 && shares.sum > 1000 - rows.length,
        "floored shares sum within one floor per bucket")
    }
  }

  test("q173: one row per eval vector, and the reported neighbor IS the brute max") {
    val out = SimilarityQueries.q173SemanticLeakage(spark, dir).collect()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nEval = emb.where(col("vec_id") % SimilarityQueries.LeakEveryNth === 0)
      .count()
    assert(out.length.toLong === nEval)
    out.foreach { r =>
      assert(r.getLong(0) % SimilarityQueries.LeakEveryNth === 0)
      assert(r.getLong(1) % SimilarityQueries.LeakEveryNth !== 0,
        "the neighbor comes from the training side")
      assert(r.getBoolean(3) ===
        (r.getLong(2) >= SimilarityQueries.NearDupMinMicro))
    }
    // independent brute check for one eval vector: max cosine and the
    // min-id tie rule against a direct scan
    val probe = out.head
    val scored = SimilarityOps.prepared(emb)
      .where(col("vec_id") % SimilarityQueries.LeakEveryNth =!= 0)
      .crossJoin(
        SimilarityOps.prepared(emb)
          .where(col("vec_id") === probe.getLong(0))
          .select(col("emb").as("q_emb")))
      .select(col("vec_id"),
        SimilarityOps.cosineMicro(col("q_emb"), col("emb")).as("cm"))
      .collect()
    val best = scored.map(r => (r.getLong(1), r.getLong(0)))
      .maxBy { case (cm, id) => (cm, -id) }
    assert(probe.getLong(2) === best._1)
    assert(probe.getLong(1) === best._2)
  }

  test("q174: floored probability trajectory moves toward the high-excess domain") {
    val out = CurationQueries.q174DomainReweight(spark, dir).collect()
    val iters = out.map(_.getLong(0)).distinct.sorted
    assert(iters.sameElements(0L to CurationQueries.MwIters))
    val sources = out.map(_.getString(1)).distinct.sorted
    assert(out.length === iters.length * sources.length)
    val byIter = out.groupBy(_.getLong(0))
    byIter.foreach { case (_, rows) =>
      val ws = rows.map(_.getLong(3))
      assert(ws.forall(w => w >= 0 && w <= 1000))
      assert(ws.sum <= 1000 && ws.sum > 1000 - rows.length,
        "floored normalization within one floor per source")
    }
    val exn = out.map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(exn.values.forall(e => e >= 0 && e <= 1000))
    assert(exn.values.min === 0, "the easiest domain anchors excess at 0")
    if (exn.values.max > 0) {
      assert(exn.values.max === 1000, "normalized excess tops at 1000")
      def wAt(it: Long, src: String): Long =
        out.find(r => r.getLong(0) == it && r.getString(1) == src)
          .get.getLong(3)
      val hardest = exn.maxBy(_._2)._1
      val easiest = exn.minBy(_._2)._1
      assert(wAt(CurationQueries.MwIters, hardest) >= wAt(0, hardest),
        "the hardest domain never loses weight net of the trajectory")
      assert(wAt(CurationQueries.MwIters, easiest) <= wAt(0, easiest),
        "the easiest domain never gains weight net of the trajectory")
    }
  }

  test("q173b: banded verdicts are one-sided vs the exact tier, and recall is real") {
    val exact = SimilarityQueries.q173SemanticLeakage(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val banded = SimilarityQueries.q173bLeakageLsh(spark, dir).collect()
    assert(banded.length === exact.size, "same eval universe, empty buckets included")
    banded.foreach { r =>
      val ex = exact(r.getLong(0))
      if (!r.isNullAt(2)) {
        assert(r.getLong(2) <= ex.getLong(2),
          "banded top-1 cosine is a lower bound on the true max")
        if (r.getBoolean(4)) assert(ex.getBoolean(3),
          "a banded leak verdict implies the exact verdict")
      } else {
        assert(r.getLong(3) === 0L, "NULL neighbor only on an empty candidate set")
        assert(!r.getBoolean(4))
      }
    }
    // fixture recall is REPORTED, not asserted: the fixture's true leaks
    // sit at cos 0.40-0.43, where sign-LSH recall is structurally low
    // (p = 1 - θ/π per hyperplane). The recall LAW lives in the designed
    // duplicate test below — the q144 measured-recall stance.
    val trueLeaks = exact.values.count(_.getBoolean(3))
    val caught = banded.count(_.getBoolean(4))
    info(s"banded leak recall on the fixture: $caught of $trueLeaks")
    assert(banded.map(_.getLong(3)).sum > 0,
      "the banded index produced no candidates at all")
  }

  test("q173b: an exact duplicate across the split collides in every band") {
    import sqlImplicits._
    val v = Seq.fill(64)(0.5f)
    val w = Seq.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val emb = Seq(
      (0L, v, 0), // eval (0 % 20 == 0) — exact duplicate of train vec 1
      (1L, v, 0),
      (21L, w, 1),
      (41L, w.map(-_), 1)).toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.splitLeakTop1Lsh(emb, 20,
      SimilarityQueries.LeakBits, SimilarityQueries.LeakBands)
      .withColumn("leaked",
        coalesce(col("cos_micro") >= SimilarityQueries.NearDupMinMicro,
          lit(false)))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 1L, "the duplicate is the neighbor")
    assert(r.getLong(2) >= 999000L, "cosine of an exact duplicate ~ 1e6")
    assert(r.getBoolean(4), "an exact cross-split duplicate MUST be flagged")
  }

  test("q172b: stored cuts carve snapshot A into terciles and the decision follows the drift") {
    val out = AnalysisQueries.q172bBucketDrift(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(out.map(_.getString(0)).toSet ===
      docs.select("source").distinct().collect().map(_.getString(0)).toSet,
      "EVERY source appears — including ones only one snapshot carries")
    import graft.queries.CurationQueries.Snapshots
    val aSources = docs.where(Snapshots.inA)
      .select("source").distinct().collect().map(_.getString(0)).toSet
    out.foreach { r =>
      val (src, ha, ta, hb, tb) = (r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      Seq(ha, ta, hb, tb).foreach(s => assert(s >= 0 && s <= 1000))
      if (aSources(src))
        // A is bucketed by its OWN cuts: the head must hold at least a
        // third (value cuts can only overshoot)
        assert(3 * ha >= 1000 - 3, s"head_a $ha under a third for $src")
      else {
        // B-only source: no stored cuts — whole mass tails, recut fires
        assert(ha === 0 && ta === 0 && hb === 0 && tb === 1000,
          s"B-only source $src must tail wholesale")
        assert(r.getBoolean(6), s"B-only source $src must demand a recut")
      }
      assert(r.getLong(5) === math.abs(hb - ha) + math.abs(tb - ta))
      assert(r.getBoolean(6) ===
        (r.getLong(5) >= AnalysisQueries.RecutDriftPermille))
    }
    // the fixture's B rewrites 1/4 of docs with an unseen suffix token —
    // the monitor must SEE a share shift somewhere, else it gates nothing
    assert(out.exists(_.getLong(5) > 0), "no drift measured anywhere")
  }

  test("q172b: the stored-artifact path equals the fused from-scratch recompute") {
    // merge ≡ recompute, the StoredPairsSpec pattern: the live path reads
    // the stored model/cuts/A-shares and scores ONLY snapshot B; the
    // scratch twin re-derives everything in one fused-key ladder pass
    val stored = AnalysisQueries.q172bBucketDrift(spark, dir).collect()
      .map(_.toString).sorted.toSeq
    val scratch = AnalysisQueries.bucketDriftScratch(spark, dir).collect()
      .map(_.toString).sorted.toSeq
    assert(stored === scratch)
  }

  test("q175: the datasheet is one row per source and restates its verified parts") {
    val out = CurationQueries.q175ReleaseAudit(spark, dir).collect()
    val weights = AnalysisQueries.q146MixtureWeights(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(out.map(_.getString(0)).toSet === weights.keySet)
    val mwFinal = CurationQueries.q174DomainReweight(spark, dir)
      .where(col("iter") === CurationQueries.MwIters).collect()
      .map(r => r.getString(1) -> r.getLong(3)).toMap
    val driftRows = AnalysisQueries.q172bBucketDrift(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(5), r.getBoolean(6))).toMap
    out.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(1) === weights(src)._1, "docs restates q146")
      assert(r.getLong(4) === weights(src)._2, "static weight restates q146")
      assert(r.getLong(8) === mwFinal(src), "MW weight restates q174's last iter")
      assert((r.getLong(9), r.getBoolean(10)) === driftRows(src),
        "drift verdict restates q172b")
      val (head, tail) = (r.getLong(5), r.getLong(6))
      assert(head >= 0 && tail >= 0 && head + tail <= 1000,
        "tercile shares leave room for the middle")
    }
  }

  test("q176: the HOF fold matches an independent driver-side greedy replay") {
    val got = CurationQueries.q176SentenceChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    // independent replay: the q02 sentence relation + plain Scala greedy
    val sents = graft.ops.SummarizeOps.sentences(
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          regexp_replace(col("text"), "\\bthe\\b", ".").as("text")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
    val want = sents.toSeq.flatMap { case (docId, rows) =>
      val ordered = rows.sortBy(_._2).map(_._3)
      val chunks = scala.collection.mutable.Buffer[(String, Long, Long)]()
      ordered.foreach { s =>
        val c = s.split("\\s+").length.toLong
        chunks.lastOption match {
          case Some((txt, tk, ns)) if tk + c <= CurationQueries.SentChunkTokens =>
            chunks(chunks.length - 1) = (txt + " " + s, tk + c, ns + 1)
          case _ => chunks += ((s, c, 1L))
        }
      }
      chunks.zipWithIndex.map { case ((txt, tk, ns), i) =>
        (docId, i.toLong, ns, tk, txt) }
    }.sortBy(t => (t._1, t._2))
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
    assert(got.exists(_._3 > 1), "some chunk packs multiple sentences")
    got.foreach { case (_, _, ns, tk, _) =>
      assert(tk <= CurationQueries.SentChunkTokens || ns === 1L,
        "only a single oversized sentence may exceed the budget")
    }
  }

  test("q174: excess ladder on a designed corpus upweights the surprising domain") {
    import sqlImplicits._
    // surprisal is RELATIVE within a context (s = bitlen(ctf1)-bitlen(btf)),
    // so the designed corpus shares ONE high-mass context 'the': the easy
    // domain always continues it the same way (btf = ctf1's easy half),
    // the hard domain continues it 64 different ways (btf = 1 each) —
    // hand arithmetic: ctf1(the) = 128, easy s = bitlen(128)-bitlen(64)
    // = 1 on 64 of 127 bigrams; hard s = 8-1 = 7 on its 64.
    val easy = Seq.fill(64)("the cat").mkString(" ")
    val hard = (0 until 64).map(i => s"the w$i").mkString(" ")
    val docs = Seq((0L, "easy", easy), (1L, "hard", hard))
      .toDF("doc_id", "source", "text")
    val per = graft.ops.TextAnalysisOps.bigramSurprisal(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(per(0L)._1 === 127L && per(1L)._1 === 127L, "n_bigrams")
    assert(per(0L)._2 === 64L, "easy: 64 bigrams at s=1")
    assert(per(1L)._2 === 448L, "hard: 64 bigrams at s=7")
    val meanEasy = 1000000L * per(0L)._2 / per(0L)._1
    val meanHard = 1000000L * per(1L)._2 / per(1L)._1
    assert(meanHard > meanEasy, "spread continuations surprise more")
  }
}
