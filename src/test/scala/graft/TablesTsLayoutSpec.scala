package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression guard for fixture timestamp-layout drift (round 7 incident:
  * the driver regenerated `events.parquet` with ts as timestamp[us]/NTZ
  * and the then-hardcoded nanos shim broke every event-time query).
  *
  * Stages a tiny events-shaped parquet in each of the three layouts the
  * generator has shipped — Long nanos, TIMESTAMP_NTZ (us, naive), and
  * TIMESTAMP (us, UTC-adjusted) — and asserts Tables.events reads all
  * three to the SAME TimestampType instants. The next schema drift fails
  * here, not in the driver bench.
  */
class TablesTsLayoutSpec extends SparkSpec {
  import sqlImplicits._

  // one known instant: 2024-03-01T12:34:56.789012Z
  private val micros = 1709296496789012L

  private def baseRow(tsCol: org.apache.spark.sql.Column) =
    spark.range(1).select(
      lit(7L).as("event_id"),
      tsCol.as("ts"),
      lit(42L).as("user_id"),
      lit("view").as("event_type"),
      lit(1.5).as("value"),
      lit("{}").as("props"))

  private def stage(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ts-layout")
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir.toString
  }

  private def readInstant(dir: String): (DataType, Long) = {
    val got = Tables.events(spark, dir)
    val dt = got.schema("ts").dataType
    val us = got.select(unix_micros(col("ts"))).head().getLong(0)
    (dt, us)
  }

  test("Long (nanos-as-long) layout floor-converts to micros") {
    val dir = stage(baseRow(lit(micros * 1000L + 999L))) // ns with sub-us tail
    val (dt, us) = readInstant(dir)
    assert(dt == TimestampType)
    assert(us == micros, "ns→us must floor-truncate like DuckDB's cast")
  }

  test("TIMESTAMP_NTZ (us, naive) layout casts to identical UTC instant") {
    val dir = stage(baseRow(
      timestamp_micros(lit(micros)).cast(TimestampNTZType)))
    // confirm the file really round-trips as NTZ before normalization
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
    val (dt, us) = readInstant(dir)
    assert(dt == TimestampType)
    assert(us == micros)
  }

  test("TIMESTAMP (us, adjusted) layout passes through") {
    val dir = stage(baseRow(timestamp_micros(lit(micros))))
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == TimestampType)
    val (dt, us) = readInstant(dir)
    assert(dt == TimestampType)
    assert(us == micros)
  }

  test("an unrecognized ts layout fails loudly, not silently") {
    val dir = stage(baseRow(lit("2024-03-01")))
    intercept[IllegalArgumentException] {
      Tables.events(spark, dir)
    }
  }

  test("live fixture reads clean through whatever layout it currently has") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.where(col("ts").isNotNull).limit(1).count() == 1L)
  }
}
