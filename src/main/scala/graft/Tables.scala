package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated fixture tables (FIXTURES.md).
  *
  * Every operator in the engine takes DataFrames, not paths; these helpers
  * are the single place path layout is known. At cluster scale the same
  * loaders would point at a partitioned table root instead of a single
  * parquet file — callers are unaffected.
  */
object Tables {

  /** Session conf every graft entry point applies.
    *
    * InferFiltersFromGenerate is excluded: for `explode(<computed array>)`
    * it synthesizes `size(arr) > 0` filters that predicate-pushdown then
    * rewrites through the staging Project, re-evaluating the whole
    * tokenize/shingle expression tree 3-4x per row inside the Filter
    * (observed 1.5x slowdown on the shingle queries). Our generators
    * already guard emptiness explicitly, so the inferred filters only
    * duplicate work.
    */
  val SessionConf: Map[String, String] = Map(
    "spark.sql.optimizer.excludedRules" ->
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")

  def configure(spark: SparkSession): SparkSession = {
    SessionConf.foreach { case (k, v) => spark.conf.set(k, v) }
    spark
  }

  private def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which the
    * Spark reader rejects outright (PARQUET_TYPE_ILLEGAL). Read nanos as
    * Long and floor-convert to a microsecond timestamp — the same ns→us
    * truncation DuckDB applies when casting its TIMESTAMP_NS, so the oracle
    * sees identical instants.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(CAST(ts div 1000 AS BIGINT))"))
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame       = read(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "region")
}
