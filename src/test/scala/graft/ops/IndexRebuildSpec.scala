package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gates for the rebuild EXECUTION operator (q167): the decision
  * direction is RebuildDecisionSpec's job; these units prove what
  * happens AFTER the decision — a rebuild produces exactly the tree a
  * from-scratch build would, probes read identically through the
  * swapped store, a keep never touches the store, and crash-planted
  * swap states heal on the next maintenance touch.
  */
class IndexRebuildSpec extends SparkSpec {
  import sqlImplicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))
  private def base = emb.where(!(col("vec_id") % 10 === 9))
  private def deltaShift = emb.where(col("vec_id") % 10 === 9)
    .select(col("vec_id"),
      transform(col("embedding"), x => x + lit(10.0f)).as("embedding"))

  private def decision(rebuild: Boolean): DataFrame =
    Seq(rebuild).toDF("rebuild")

  private def freshStore(tag: String): String = {
    // Scratch.dir only names the path; the nanoTime suffix keeps runs
    // from inheriting a previous test's tree
    graft.Scratch.dir(s"rebuildspec_${tag}_${System.nanoTime}")
  }

  private def readTree(path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        col("codes"))

  private def asSet(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("gated rebuild writes exactly the from-scratch tree for base ∪ delta") {
    val store = freshStore("ivf")
    val idx = SimilarityOps.ivfRebuild(store, base, deltaShift,
      decision(rebuild = true), nCells = 16)
    assert(idx.isDefined, "a rebuild=true decision must retrain")
    val merged = base.unionByName(deltaShift)
    val scratch = SimilarityOps.buildIvfIndex(merged, nCells = 16)
    assert(asSet(readTree(store)) ==
      asSet(SimilarityOps.ivfSq8Coded(scratch, merged)),
      "swapped tree diverges from a from-scratch build on the merged corpus")
    // and the returned index IS that from-scratch index (seeded KMeans)
    assert(asSet(idx.get.assigned.select("vec_id", "cell")) ==
      asSet(scratch.assigned.select("vec_id", "cell")))
  }

  test("probing the swapped store equals a fresh in-memory probe (q79e contract)") {
    val store = freshStore("probe")
    val idx = SimilarityOps.ivfRebuild(store, base, deltaShift,
      decision(rebuild = true), nCells = 16).get
    val coded = SimilarityOps.ivfSq8Coded(idx,
      base.unionByName(deltaShift))
    val qCells = SimilarityOps.ivfSq8ProbeCells(idx, coded,
      everyNth = 50, nProbe = 8)
    val cells = qCells.select("cell").distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val stored = readTree(store).where(col("cell").isin(cells: _*))
    val viaStore = SimilarityOps.ivfSq8Score(idx, stored, qCells, 5, 4)
    val viaMemory = SimilarityOps.ivfSq8Score(idx, coded, qCells, 5, 4)
    assert(asSet(viaStore) == asSet(viaMemory),
      "stored-tree probe diverges from the in-memory probe after the swap")
  }

  test("a keep decision returns None and leaves the store byte-identical") {
    val store = freshStore("keep")
    // seed yesterday's tree
    val baseIdx = SimilarityOps.buildIvfIndex(base, nCells = 16)
    SimilarityOps.ivfSq8Coded(baseIdx, base)
      .write.mode("overwrite").partitionBy("cell").parquet(store)
    def listing(): Set[(String, Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(store))
        .map(f => (f.getPath, f.length, f.lastModified)).toSet
    }
    val before = listing()
    val out = SimilarityOps.ivfRebuild(store, base, deltaShift,
      decision(rebuild = false), nCells = 16)
    assert(out.isEmpty)
    assert(listing() == before, "keep path touched the stored tree")
  }

  test("crash-planted staging and parked states heal at the next rebuild") {
    val store = freshStore("crash")
    // first rebuild establishes a live tree
    SimilarityOps.ivfRebuild(store, base, deltaShift,
      decision(rebuild = true), nCells = 16)
    val live = new java.io.File(store)
    assert(live.exists)
    // crash simulation 1: a stale staging tree from a dead writer
    val staging = new java.io.File(s"$store-staging")
    assert(staging.mkdirs())
    java.nio.file.Files.writeString(
      staging.toPath.resolve("garbage"), "torn")
    // crash simulation 2: parked-without-live (died between park and
    // rename-in)
    val parked = new java.io.File(s"$store-old")
    assert(live.renameTo(parked))
    val out = SimilarityOps.ivfRebuild(store, base, deltaShift,
      decision(rebuild = true), nCells = 16)
    assert(out.isDefined)
    assert(live.exists && !parked.exists && !staging.exists,
      "recovery left swap debris behind")
    val merged = base.unionByName(deltaShift)
    assert(asSet(readTree(store)) ==
      asSet(SimilarityOps.ivfSq8Coded(
        SimilarityOps.buildIvfIndex(merged, 16), merged)))
  }

  test("pqRebuild: swapped code tree equals the from-scratch IVF-PQ build") {
    val store = freshStore("pq")
    val out = SimilarityOps.pqRebuild(store, base, deltaShift,
      decision(rebuild = true), nCells = 16, m = 8, kSub = 16)
    assert(out.isDefined)
    val merged = base.unionByName(deltaShift)
    val scratchIdx = SimilarityOps.buildIvfIndex(merged, 16)
    val scratchCb = SimilarityOps.trainPq(merged, 8, 16)
    assert(asSet(readTree(store)) ==
      asSet(SimilarityOps.ivfPqCoded(scratchIdx,
        SimilarityOps.pqEncode(merged, scratchCb))),
      "swapped PQ tree diverges from a from-scratch build")
  }
}
