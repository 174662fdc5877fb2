package graft.ml

import graft.SparkSpec

/** Content-level (not just structural) check on the LDA topic stack —
  * VERDICT r7 "What's missing" #2: the invariants in TopicPipelineSpec
  * prove shape and determinism but would not notice a silent MLlib config
  * drift (different optimizer, docConcentration default change, vocabulary
  * ordering change) that degrades the topics themselves.
  *
  * A 48-doc corpus (two disjoint themes — distributed query engine vs
  * garden/nature — replicated 3x) must be recovered as two topics whose
  * top terms
  * (a) separate the themes bijectively and (b) overlap a COMMITTED golden
  * set mined from this exact seeded config. The golden floor is 6-of-8
  * rather than exact equality so a patch-level MLlib jitter in tail terms
  * doesn't flake the suite, while a real config drift — which reshuffles
  * most of the ranking — still fails.
  */
class LdaGoldenSpec extends SparkSpec {
  import sqlImplicits._

  private val engineDocs = Seq(
    "spark cluster executes distributed query plans across executor nodes",
    "the query optimizer rewrites logical plans into efficient physical plans",
    "distributed shuffle moves query data between cluster executor nodes",
    "executor memory holds shuffle partitions for the distributed query",
    "cluster scheduler assigns query stages to executor nodes",
    "physical plans pipeline operators inside one executor stage",
    "the optimizer prunes columns before the distributed shuffle",
    "query stages exchange shuffle data across the cluster")

  private val gardenDocs = Seq(
    "the garden has flowers trees and a small quiet pond",
    "dogs chase the ball across the sunny garden grass",
    "cats sleep under flowering trees beside the pond",
    "birds sing in the garden trees every spring morning",
    "the gardener waters flowers near the old stone pond",
    "puppies dig holes in the soft garden grass",
    "bees visit spring flowers around the garden pond",
    "children play ball on the grass under the trees")

  // mined from TopicPipeline.fit(k=2, termsPerTopic=8, vocabSize=100,
  // maxIter=60, seed=42 [Config default]) on the 3x-replicated corpus
  // below — verified identical across independent JVM runs (the
  // deterministic vocabulary in TopicPipeline.fit is what makes this
  // committable; MLlib's own tie ordering varied per run). Regenerate
  // with the same call if the config is deliberately changed.
  private val goldenGarden = Set("garden", "trees", "pond", "grass",
    "flowers", "ball", "garden grass", "spring")
  private val goldenEngine = Set("query", "distributed", "shuffle",
    "executor", "cluster", "nodes", "executor nodes", "distributed shuffle")

  private val themeGarden = Set("garden", "trees", "grass", "pond",
    "flowers", "spring", "dogs", "cats", "birds", "ball", "bees")
  private val themeEngine = Set("query", "shuffle", "plans", "executor",
    "cluster", "distributed", "optimizer", "stages", "physical", "memory")

  private lazy val topTerms: Map[Long, Set[String]] = {
    // 3x verbatim replication sharpens the posterior: the single-copy
    // corpus sat near a saddle where the seeded fit sometimes merged the
    // themes; with 48 docs the separation is robust to the seed
    val docs = (1 to 3).flatMap(_ => engineDocs) ++
      (1 to 3).flatMap(_ => gardenDocs)
    val corpus = docs.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val fitted = TopicPipeline.fit(corpus,
      TopicPipeline.Config(k = 2, termsPerTopic = 8, vocabSize = 100, maxIter = 60))
    TopicPipeline.topicTerms(fitted).collect()
      .groupBy(_.getLong(0))
      .map { case (topic, rows) =>
        topic -> rows.map(_.getAs[String]("term")).toSet
      }
  }

  /** Unigram vocabulary hit count — bigram terms credit their theme if
    * either word belongs to it ("query stages", "birds sing").
    */
  private def hits(terms: Set[String], theme: Set[String]): Int =
    terms.count(_.split(' ').exists(theme.contains))

  test("seeded LDA recovers the two planted themes bijectively") {
    assert(topTerms.size == 2)
    val Seq(t0, t1) = topTerms.keys.toSeq.sorted.map(topTerms)
    val assignments = Seq(
      hits(t0, themeGarden) + hits(t1, themeEngine),
      hits(t0, themeEngine) + hits(t1, themeGarden))
    // the better assignment must explain at least 6 of 8 terms per topic
    val best = assignments.max
    assert(best >= 12, s"topics do not separate the themes: $topTerms")
    // and the two topics must NOT both map to the same theme
    assert(math.abs(hits(t0, themeGarden) - hits(t1, themeGarden)) >= 4,
      s"both topics absorbed the same theme: $topTerms")
  }

  test("top terms overlap the committed golden sets (drift guard)") {
    val Seq(t0, t1) = topTerms.keys.toSeq.sorted.map(topTerms)
    // match each topic to its better golden set, require a bijection
    val direct = (t0 & goldenGarden).size + (t1 & goldenEngine).size
    val crossed = (t0 & goldenEngine).size + (t1 & goldenGarden).size
    val (gA, gB, total) =
      if (direct >= crossed) (goldenGarden, goldenEngine, direct)
      else (goldenEngine, goldenGarden, crossed)
    assert((t0 & gA).size >= 6, s"topic0 drifted from golden $gA: $t0")
    assert((t1 & gB).size >= 6, s"topic1 drifted from golden $gB: $t1")
    assert(total >= 12)
  }
}
