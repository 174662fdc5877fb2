package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Output contract for ORACLED queries: atomic columns only.
  *
  * The driver's correctness harness loads both the Spark result and the
  * DuckDB oracle result into pandas and `sort_values` over EVERY column
  * before hashing; a cell holding an array/map/struct is unhashable there
  * (`TypeError: unhashable type: 'numpy.ndarray'`), so the row records an
  * error with no rows/schema/hash verdicts at all. q100 hit exactly this
  * in round 8 (its `matched ARRAY<STRING>` audit column). This gate makes
  * the convention every other query already followed — explode, or
  * array_join/concat_ws, before registering — explicit and enforced, so
  * the class of red row cannot recur.
  *
  * Non-oracled queries (no_oracle tiers) are exempt: the driver only
  * counts their rows, and nested output is legitimate library surface
  * (e.g. blocklistFilter's ARRAY audit column).
  *
  * Schema inspection is analysis-only (no job runs), so this stays cheap
  * even though it touches every oracled query; construction-time eager
  * work (memo builds) is released like Verify/Bench do.
  */
class AtomicOutputSchemaSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def nestedFields(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] =>
        s"${f.name}: ${f.dataType.simpleString}"
    }.toSeq

  test("every oracled query key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without a query: $orphans")
  }

  test("every oracled query emits atomic columns only") {
    val oracled = SparkEntry.oracleSql.keySet
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => oracled(name) }
      .flatMap { case (name, fn) =>
        val bad = nestedFields(fn(spark, dir).schema)
        if (bad.nonEmpty) Some(s"$name -> ${bad.mkString(", ")}") else None
      }
    CacheScope.releaseAll()
    queries.SessionMemos.evictAll()
    assert(offenders.isEmpty,
      "oracled queries must emit atomic columns only (the driver's pandas " +
        "compare sorts every column; array cells are unhashable there):\n" +
        offenders.mkString("\n"))
  }
}
