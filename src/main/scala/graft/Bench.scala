package graft
import org.apache.spark.sql.SparkSession
/** Driver-run throughput bench: one JSON line with per-query seconds.
  *
  * Measurement protocol: queries run in sorted name order (Map iteration
  * order would shuffle which query absorbs residual warmup between rounds),
  * each query runs twice and reports the min — n=1 timings at this scale
  * are dominated by first-touch JIT/codegen of the query's own plan, which
  * round 1 showed as 10-50x artifacts on early slots. Failures are never
  * swallowed: a crashing query records its error message under "errors"
  * and counts -1 sec, so a regression can't silently improve the total.
  *
  * Materialization is a `noop`-format write, not `count()`: count lets
  * Catalyst prune every projection not needed for the row count, so a
  * narrow query would be timed as a bare scan; the noop sink evaluates
  * every output column and discards the bytes.
  */
object Bench {
  private val RunsPerQuery = 2

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen, shuffle machinery, parquet reader) so the
    // first measured query doesn't absorb one-time JVM/session init.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).limit(1).count()
    def jsonEscape(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to RunsPerQuery).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        }
        catch { case e: Throwable =>
          errors.getOrElseUpdate(name,
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
          None
        }
      }
      // release operator-internal persists at the query boundary (after
      // BOTH runs, so run 2 measures the warm-cache plan exactly as before
      // the lifecycle change and min-of-n stays comparable across rounds)
      CacheScope.releaseAll()
      name -> (if (times.nonEmpty) times.min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val errJson = errors.map { case (k, v) =>
      s"\"${jsonEscape(k)}\":\"${jsonEscape(v)}\""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
