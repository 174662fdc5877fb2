package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Golden micro-fixtures for EventOps window semantics. */
class EventOpsSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    (1L, ts("2024-01-01 00:01:00"), 7L, "click", 1.10),
    (2L, ts("2024-01-01 00:04:00"), 7L, "click", 2.20),
    (3L, ts("2024-01-01 00:09:01"), 7L, "view", 3.30),   // 5:01 after #2 -> new session
    (4L, ts("2024-01-01 00:14:01"), 7L, "view", 4.40),   // exactly 5:00 gap -> still merges
    (5L, ts("2024-01-01 00:30:00"), 8L, "click", 5.50))
    .toDF("event_id", "ts", "user_id", "event_type", "value")

  test("tumbling windows floor to epoch-aligned 10-minute buckets") {
    val out = EventOps.tumbling(events).orderBy("window_start", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01 00:00:00", "click", 2L),
      ("2024-01-01 00:00:00", "view", 1L),
      ("2024-01-01 00:10:00", "view", 1L),
      ("2024-01-01 00:30:00", "click", 1L)))
  }

  test("sliding 10/5 windows place each event in exactly two windows") {
    val out = EventOps.sliding(events).orderBy("window_start").collect()
    assert(out.map(_.getAs[Long]("n_events")).sum == 10L) // 5 events x 2
    val w = out.map(r => r.getString(0) -> r.getAs[Long]("n_events")).toMap
    assert(w("2023-12-31 23:55:00") == 2L) // [23:55, 00:05): events 1,2
    assert(w("2024-01-01 00:00:00") == 3L) // [00:00, 00:10): events 1,2,3
    assert(w("2024-01-01 00:05:00") == 2L) // [00:05, 00:15): events 3,4
  }

  test("sessionization: gap > 5 min starts a new session; exactly 5 min merges") {
    val out = EventOps.sessions(events).orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(
      (7L, "2024-01-01 00:01:00.000000", 2L, 3.30),  // events 1,2 (5:01 gap to 3 splits)
      (7L, "2024-01-01 00:09:01.000000", 2L, 7.70),  // events 3,4 (exact 5:00 gap merges)
      (8L, "2024-01-01 00:30:00.000000", 1L, 5.50)))
  }

  test("incremental rollup merge equals the from-scratch recompute") {
    val dir = "/root/testdata/sf0.001"
    val merged = graft.queries.EventQueries
      .q98IncrementalRollup(spark, dir).collect().toSeq
    val full = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("ts"),
        col("value").cast("decimal(12,2)").as("v"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("v")).cast("double").as("sum_value"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_ts"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_ts"))
      .orderBy("event_type").collect().toSeq
    assert(merged == full)
  }

  test("json key extraction casts to long") {
    val df = Seq((1L, """{"k": 87}"""), (2L, """{"k": 0}""")).toDF("event_id", "props")
    val out = EventOps.withJsonKey(df).select("k").collect().map(_.getLong(0))
    assert(out.toSeq == Seq(87L, 0L))
  }
}
