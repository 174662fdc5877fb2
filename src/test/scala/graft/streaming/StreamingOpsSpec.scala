package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Drives the streaming surface with MemoryStream micro-batches and
  * verifies results against the equivalent batch computation (the
  * batch-streaming unification contract of EventOps/StreamingOps).
  */
class StreamingOpsSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val batch1 = Seq(
    (1L, ts("2024-01-01 00:01:00"), 7L, "click", 1.0),
    (2L, ts("2024-01-01 00:04:00"), 7L, "click", 2.0))
  private val batch2 = Seq(
    (3L, ts("2024-01-01 00:11:00"), 7L, "view", 3.0),
    (2L, ts("2024-01-01 00:04:00"), 7L, "click", 2.0), // exact redelivery
    (4L, ts("2024-01-01 00:31:00"), 8L, "view", 4.0))

  test("streaming tumbling counts match the batch computation (complete mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamingOps.tumblingCounts(df)
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("tumbling_test")
        .orderBy("window_start", "event_type").collect()
      val batch = graft.ops.EventOps.tumbling(
        (batch1 ++ batch2).toDF("event_id", "ts", "user_id", "event_type", "value"))
        .orderBy("window_start", "event_type").collect()
      assert(streamed.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the time bound only") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val joined = StreamingOps.intervalJoin(
      imps.toDF.toDF("event_id", "ts", "user_id"),
      clicks.toDF.toDF("event_id", "ts", "user_id"),
      key = "user_id", maxDelay = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssjoin_test")
      .outputMode("append").start()
    try {
      imps.addData((1L, ts("2024-01-01 00:00:00"), 7L),
        (2L, ts("2024-01-01 00:00:00"), 8L))
      clicks.addData(
        (10L, ts("2024-01-01 00:05:00"), 7L),  // within 10 min -> match
        (11L, ts("2024-01-01 00:20:00"), 8L),  // 20 min late -> no match
        (12L, ts("2024-01-01 00:03:00"), 9L))  // no impression -> no match
      q.processAllAvailable()
      val got = spark.table("ssjoin_test")
        .select("event_id", "event_id_r").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq((1L, 10L)))
    } finally q.stop()
  }

  test("idempotent partitioned sink: replaying a batch rewrites, never duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val mem = MemoryStream[(Long, String, Double)]
    val df = mem.toDF.toDF("event_id", "day", "value")
    val q = StreamingOps.idempotentPartitionedSink(
      df, s"$dir/out", "day", s"$dir/ckpt")
    try {
      mem.addData((1L, "d1", 1.0), (2L, "d2", 2.0))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$dir/out").count() == 2)
      // the same d1 rows arrive again (replay) plus a new d1 row: the d1
      // partition is REWRITTEN with exactly this batch's rows, d2 is kept
      mem.addData((1L, "d1", 1.0), (3L, "d1", 3.0))
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$dir/out")
        .orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getAs[String]("day")))
      assert(rows.toSeq == Seq((1L, "d1"), (2L, "d2"), (3L, "d1")))
    } finally q.stop()
  }

  test("streaming dedup drops redelivered keys, even with a different timestamp") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamingOps.dedupByKey(df, Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      // re-delivery of event 2 with a LATER timestamp — key-based dedup
      // must still drop it (dropDuplicates on key+ts would let it through)
      mem.addData(batch2 :+ (2L, ts("2024-01-01 00:06:00"), 7L, "click", 2.0): _*)
      q.processAllAvailable()
      val ids = spark.table("dedup_test").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L, 4L)) // event 2 delivered thrice, kept once
    } finally q.stop()
  }

  test("streaming exact dedup survivors match the batch tier's canonical groups") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF.toDF("doc_id", "ts", "text")
    val q = StreamingOps.exactDedupStream(df)
      .writeStream.format("memory").queryName("exact_dedup_stream")
      .outputMode("append").start()
    val t0 = ts("2024-01-01 00:00:00")
    try {
      // three content groups; duplicates both within one batch and
      // redelivered across batches
      mem.addData((1L, t0, "alpha beta"), (2L, t0, "gamma"),
        (3L, t0, "alpha beta"))
      q.processAllAvailable()
      mem.addData((4L, ts("2024-01-01 00:10:00"), "gamma"),
        (5L, ts("2024-01-01 00:10:00"), "delta"))
      q.processAllAvailable()
      val survivors = spark.table("exact_dedup_stream")
      assert(survivors.count() == 3, "one survivor per content group")
      val streamKeys = survivors.select("content_key")
        .collect().map(_.getLong(0)).toSet
      // the batch tier's groups, keyed identically
      val batchKeys = Seq("alpha beta", "gamma", "delta").toDF("text")
        .select(graft.ops.HashOps.contentKey(col("text")))
        .collect().map(_.getLong(0)).toSet
      assert(streamKeys == batchKeys)
    } finally q.stop()
  }

  test("file stream over the events fixture matches the batch relation") {
    val dir = "/root/testdata/sf0.001"
    // file streams read directories: stage the fixture file into one
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val streamed = StreamingOps.eventsFileStream(spark, streamDir.toString)
    val q = streamed.groupBy("event_type").count()
      .writeStream.format("memory").queryName("filestream_test")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("filestream_test").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = graft.Tables.events(spark, dir).groupBy("event_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want)
    } finally q.stop()
  }

  test("stream-static enrichment joins dimension rows per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((7L, "gold"), (8L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamingOps.enrich(df, dim, "user_id")
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      val tiers = spark.table("enrich_test").select("event_id", "tier")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(tiers == Set((1L, "gold"), (2L, "gold")))
    } finally q.stop()
  }

  test("stream-static interval enrichment tags events with containing windows") {
    implicit val sqlCtx = spark.sqlContext
    val iv = Seq(
      (100L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:05:00")),
      (101L, ts("2024-01-01 00:30:00"), ts("2024-01-01 00:35:00")))
      .toDF("iv_id", "w_start", "w_end")
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val df = mem.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = StreamingOps.enrichByInterval(
        df, iv, "ts", "w_start", "w_end", widthSeconds = 300L)
      .select("event_id", "iv_id")
      .writeStream.format("memory").queryName("interval_enrich_test")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val pairs = spark.table("interval_enrich_test").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // events at 00:01/00:04 fall in window 100, 00:31 in 101; 00:11
      // matches nothing and drops out
      assert(pairs == Set((1L, 100L), (2L, 100L), (4L, 101L)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps running per-user totals across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamingOps.UserEvent]
    val q = StreamingOps.runningUserTotals(mem.toDS())
      .writeStream.format("memory").queryName("running_test")
      .outputMode("append").start()
    try {
      mem.addData(StreamingOps.UserEvent(7L, ts("2024-01-01 00:01:00"), 1.0))
      q.processAllAvailable()
      mem.addData(StreamingOps.UserEvent(7L, ts("2024-01-01 00:02:00"), 2.0),
        StreamingOps.UserEvent(8L, ts("2024-01-01 00:03:00"), 5.0))
      q.processAllAvailable()
      val rows = spark.table("running_test")
        .groupBy("user_id").agg(max("n_events").as("n"), max("total_value").as("t"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set((7L, 2L, 3.0), (8L, 1L, 5.0)))
    } finally q.stop()
  }
}
