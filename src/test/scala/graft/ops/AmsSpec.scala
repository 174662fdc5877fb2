package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gates for the AMS F2 sketch (q17e + the streaming twin): the
  * row-form/count-form identity (linearity within one relation), the
  * batch-additivity identity (linearity across a partition of the rows),
  * the estimator against exact F2 on a skewed synthetic, and the
  * streaming store's replay/derivation contract.
  */
class AmsSpec extends SparkSpec {
  import sqlImplicits._

  private def keyed(n: Int): org.apache.spark.sql.DataFrame = {
    // skewed: key 0 is hot (square-root law), the rest near-singletons
    val rows = (0 until n).map { i =>
      val k = if (i % 3 == 0) 0L else (i % 97).toLong
      (i.toLong, k)
    }
    rows.toDF("row_id", "user_id")
  }

  private def exactF2(df: org.apache.spark.sql.DataFrame): Long =
    df.groupBy("user_id").agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * c"))).head().getLong(0)

  test("row-form counters equal the count-form derivation (q17e's shape)") {
    val df = keyed(3000)
    val fromRows = AmsSketch.rowCounters(df.select("user_id"), "user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // count-relation form: Σ ±c per bucket, q17e's inner derivation
    val counts = df.groupBy("user_id").agg(count(lit(1)).as("c"))
    val fromCounts = counts
      .select(col("user_id").cast("string").as("k"), col("c"),
        explode(array((0 until AmsSketch.Reps).map(r => lit(r.toLong)): _*)).as("rep"))
      .withColumn("h", HashOps.charHash(
        concat(lit("r"), col("rep").cast("string"), lit(":"), col("k"))))
      .withColumn("b", pmod(col("h"), lit(AmsSketch.Buckets.toLong)))
      .withColumn("s",
        lit(1L) - lit(2L) * pmod(expr(s"h div ${AmsSketch.Buckets}"), lit(2L)))
      .groupBy("rep", "b").agg(sum(col("s") * col("c")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fromRows == fromCounts)
  }

  test("batch additivity: counters of 3 chunks sum to the whole relation's") {
    val df = keyed(3000)
    val whole = AmsSketch.rowCounters(df.select("user_id"), "user_id")
    val chunks = (0 until 3).map(i =>
      AmsSketch.rowCounters(
        df.where(col("row_id") % 3 === i).select("user_id"), "user_id"))
    val summed = chunks.reduce(_ unionByName _)
    assert(AmsSketch.estimate(summed) == AmsSketch.estimate(whole))
    val w = whole.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val s = summed.groupBy("rep", "b").agg(sum("z").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(w == s)
  }

  test("estimator lands within 3/sqrt(buckets) of exact F2 on skewed keys") {
    val df = keyed(6000)
    val est = AmsSketch.estimate(
      AmsSketch.rowCounters(df.select("user_id"), "user_id"))
    val exact = exactF2(df)
    val rel = math.abs(est - exact).toDouble / exact
    assert(rel < 3.0 / math.sqrt(AmsSketch.Buckets),
      s"estimate $est vs exact $exact (rel $rel)")
  }

  test("streaming twin: chunked file replay equals the batch sketch, " +
      "store carries one partition per batch") {
    import graft.streaming.StreamingOps
    val df = keyed(3000).select("user_id")
    val work = java.nio.file.Files.createTempDirectory("graft-ams-work")
    val streamDir = java.nio.file.Files.createTempDirectory("graft-ams-in")
    (0 until 3).foreach { i =>
      val part = work.resolve(s"c$i")
      keyed(3000).where(col("row_id") % 3 === i).select("user_id")
        .coalesce(1).write.parquet(part.toString)
      val files = java.nio.file.Files.list(part).iterator()
      var n = 0
      while (files.hasNext) {
        val f = files.next()
        if (f.toString.endsWith(".parquet")) {
          java.nio.file.Files.move(f, streamDir.resolve(f"chunk-$i%03d-$n.parquet"))
          n += 1
        }
      }
    }
    val stream = spark.readStream.schema("user_id LONG")
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    val summary = java.nio.file.Files.createTempDirectory("graft-ams-sum").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ams-ckpt").toString
    @volatile var last = -1L
    val q = StreamingOps.amsF2Stream(stream, summary, ckpt)(last = _)
    try q.processAllAvailable() finally q.stop()
    val batchEst = AmsSketch.estimate(AmsSketch.rowCounters(df, "user_id"))
    assert(last == batchEst, s"streamed $last vs batch $batchEst")
    assert(StreamingOps.mergedAmsF2(spark, summary) == batchEst)
    val parts = spark.read.parquet(summary)
      .select("ams_batch").distinct().count()
    assert(parts == 3, s"expected 3 stored batch partitions, got $parts")
  }
}
