package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` fixture: JSON extraction,
  * tumbling / sliding / session time windows (SURVEY.md §2.7 extension —
  * the reference is strictly batch). Batch-first so the DuckDB oracle can
  * verify them; StreamingOps runs the same aggregation bodies under
  * Structured Streaming with watermarks.
  *
  * Determinism rules: `value` is 2-decimal money-like — summed in DECIMAL
  * (order-independent) and cast to DOUBLE once at the end. Window bounds are
  * emitted as formatted strings (raw timestamps round-trip differently
  * through parquet/pandas across engines).
  *
  * Scale: time-windowed groupBys shuffle on (window, key) — naturally
  * balanced when keys are; sessionization shuffles on user_id once.
  */
object EventOps {

  private def decSum(c: Column): Column =
    sum(c.cast("decimal(12,2)")).cast("double")

  /** The events table with `k` extracted from the JSON `props` column.
    * `get_json_object` is codegen'd; at scale prefer extracting once and
    * persisting columnar over re-parsing JSON per query.
    */
  def withJsonKey(events: DataFrame): DataFrame =
    events.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))

  /** Tumbling-window aggregation: per (10-minute window, event_type) counts
    * and exact value sums. Uses Spark's native `window()` generator.
    */
  def tumbling(events: DataFrame, width: String = "10 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Per-window top-k events by value, through the typed bounded-heap
    * Aggregator ([[graft.functions.TopKAggregator]]) registered as an
    * untyped UDAF — the §2.7 × §2.8 composition: the SAME partial-
    * aggregable heap that powers q29c's kNN runs under (and, in the
    * streaming twin, under watermarked) window aggregation, so each map
    * task ships k rows per window to the shuffle instead of every event.
    * Scores are `floor(value · 1e6)` — one IEEE multiply + floor, exact
    * and identical in both engines; ties keep the smaller event_id
    * (the aggregator's contract, mirrored by the oracle's row_number).
    */
  def windowTopK(events: DataFrame, width: String = "10 minutes",
                 k: Int = 3): DataFrame = {
    val topk = udaf(new graft.functions.TopKAggregator.TopK(k),
      org.apache.spark.sql.Encoders.product[graft.functions.TopKAggregator.Scored])
    events
      .select(window(col("ts"), width).as("w"), col("event_id"),
        floor(col("value") * 1000000).cast("long").as("score"))
      .groupBy(col("w"))
      .agg(topk(col("event_id"), col("score")).as("top"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
        .as("window_start"), posexplode(col("top")))
      .select(col("window_start"), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("event_id"), col("col.score").as("score_micro"))
  }

  /** Sliding-window aggregation: 10-minute windows every 5 minutes (each
    * event lands in 2 windows).
    */
  def sliding(events: DataFrame, width: String = "10 minutes",
              slide: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_events"), col("sum_value"))

  /** Per-user sessionization with a fixed inactivity gap: Spark's native
    * `session_window` (works in batch since 3.2). A session's end is
    * last-event + gap; sessions merge while the inter-event gap is <= the
    * threshold (a gap of exactly the threshold still merges — touching
    * windows coalesce), so a new session needs gap > threshold.
    */
  def sessions(events: DataFrame, gap: String = "5 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("sum_value"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Sessionization under a PER-KEY gap — what `session_window`'s single
    * static gap cannot express (its dynamic-gap form takes an expression,
    * but the classic lag/flag/cumsum formulation also yields the session
    * SEQUENCE number and stays fully oracle-portable): a new session
    * starts where the gap to the previous event exceeds the key's own
    * threshold; the running sum of start flags numbers the sessions. One
    * user_id-keyed shuffle; both windows share its sort. `gapMicrosCol`
    * is any deterministic per-row expression (typically derived from the
    * key — a per-segment/per-tier inactivity budget).
    */
  def sessionsDynamicGap(events: DataFrame,
                         gapMicros: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        gapMicros.as("__gap"))
      .withColumn("__new",
        when(unix_micros(col("ts")) -
          unix_micros(lag(col("ts"), 1).over(byUser)) > col("__gap"), 1L)
          .when(lag(col("ts"), 1).over(byUser).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("__new")).over(run))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .withColumn("duration_sec",
        expr("(unix_micros(session_end) - unix_micros(session_start)) div 1000000"))
  }
}
