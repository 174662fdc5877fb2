package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for skewed keys at scale.
  *
  * A shuffle join on a key with heavy skew (one hot key holding a large
  * fraction of rows) puts the whole hot partition on one task. AQE's skew
  * join splits oversized partitions at runtime, but only for sort-merge
  * joins after materialization; explicit salting is the portable fix when
  * the skew is known (and the only fix for aggregate-then-join shapes).
  */
object JoinOps {

  /** Salted equi-join: the skewed (big) side gets a deterministic salt in
    * [0, salts) derived from the join key plus the caller-designated cheap
    * columns; the other side is replicated `salts` times. The join key
    * becomes (key, salt), spreading each hot key over `salts` partitions.
    * Equivalent to `skewed.join(other, key)` for any 1:N relationship
    * where `other` has unique keys (each skewed row meets each matching
    * other row exactly once, in exactly one salt bucket).
    *
    * `saltCols` must vary within a hot key (a row id, a timestamp — any
    * cheap near-unique column) or every row of the hot key lands in one
    * salt bucket and the salting is a no-op. They exist so the salt hash
    * never touches wide payload columns: hashing a full documents-shaped
    * row (text and all) just to pick a bucket in [0, salts) wastes CPU on
    * exactly the side that is already in trouble.
    *
    * Cost: `other` is shuffled/broadcast `salts` times — size accordingly
    * (dim tables, pre-aggregated sides).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 salts: Int, saltCols: Seq[String]): DataFrame =
    saltedJoinKeys(skewed, other, Seq(key), salts, saltCols)

  /** Composite-key form of [[saltedJoin]] — q90's bigram scoring join
    * keys on (w1, w2). Same contract, all keys equi-joined plus the salt.
    *
    * Why manual salting here and not AQE: OptimizeSkewedJoin can only
    * rewrite a sort-merge join whose children are BOTH plain shuffle
    * reads (`Sort` directly over a materialized exchange) — splitting one
    * side's oversized partition re-reads the other side's matching
    * partition once per split, which requires that side to BE a shuffle.
    * An aggregated side (final HashAggregate above its exchange) or a
    * persisted side (the cache's partitioning satisfies the join, so no
    * exchange exists at all) breaks the pattern, and q90's corpus-derived
    * count relations are exactly those two shapes — verified empirically:
    * a 40x-skewed hot-bigram partition is left unsplit even with
    * forceOptimizeSkewedJoin on. The salt is applied at plan-construction
    * time instead, which is also cheaper: it never waits for runtime
    * statistics.
    */
  def saltedJoinKeys(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                     salts: Int, saltCols: Seq[String]): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(keys.nonEmpty, "at least one join key")
    require(saltCols.nonEmpty,
      "saltCols must name at least one cheap column that varies within a key")
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64((keys ++ saltCols).distinct.map(col): _*), lit(salts)))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<bigint>")))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** As-of join (left outer): each left row picks up `rightValCols` from
    * the LATEST right row with `right.tsCol <= left.tsCol` for the same
    * `key` (nulls when no right row precedes it) — the standard event/state
    * enrichment Spark has no native operator for (DuckDB/kdb spell it
    * ASOF JOIN).
    *
    * Spark-first formulation: tag both sides, union, and take
    * `last(rightStruct, ignoreNulls)` over a window ordered by
    * `(ts, side)` with right rows sorting first so an exactly-simultaneous
    * right row is visible to the left row. ONE shuffle keyed by `key` plus
    * a per-key sort — linear at any scale, unlike a per-row correlated
    * subquery (O(n) probes) or an inequality join (quadratic per key).
    *
    * The right side must be unique per (key, ts) — pre-aggregate if not —
    * otherwise which simultaneous right row wins is tie-broken by nothing
    * and the result is nondeterministic.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               rightValCols: Seq[String]): DataFrame =
    asofJoinDir(left, right, key, tsCol, rightValCols, "backward", None)

  /** [[asofJoin]] generalized to the full public `merge_asof` contract
    * (pandas semantics): `direction` picks the LATEST right row at-or-
    * before ("backward"), the EARLIEST at-or-after ("forward"), or the
    * closest of the two ("nearest", ties to backward — pandas' rule);
    * `toleranceMicros` bounds |left.ts − right.ts|, nulling the match
    * beyond it. Same single key-shuffle as the base form: backward and
    * forward are the same union+window scan in opposite sort orders
    * (consecutive windows share the exchange; nearest pays both sorts),
    * and tolerance is a post-pick filter on the carried right timestamp —
    * never a join-condition inequality, so the plan stays linear per key.
    */
  def asofJoinDir(left: DataFrame, right: DataFrame, key: String,
                  tsCol: String, rightValCols: Seq[String],
                  direction: String,
                  toleranceMicros: Option[Long]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    toleranceMicros.foreach(t => require(t >= 0, s"negative tolerance $t"))
    val rv = right.select(col(key), col(tsCol), lit(0).as("__side"),
      struct(col(tsCol).as("__rts") +: rightValCols.map(col): _*).as("__rv"))
    val rvType = rv.schema("__rv").dataType
    val lv = left.withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(rvType))
    val unioned = lv.unionByName(rv, allowMissingColumns = true)
    val wB = Window.partitionBy(key)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(key)
      .orderBy(col(tsCol).desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def within(pick: Column): Column = toleranceMicros match {
      case None => pick
      case Some(t) =>
        when(pick.isNotNull &&
          abs(unix_micros(col(tsCol)) -
            unix_micros(pick.getField("__rts"))) <= t, pick)
    }
    val picked = direction match {
      case "backward" =>
        unioned.withColumn("__asof",
          within(last(col("__rv"), ignoreNulls = true).over(wB)))
      case "forward" =>
        unioned.withColumn("__asof",
          within(last(col("__rv"), ignoreNulls = true).over(wF)))
      case "nearest" =>
        val withBoth = unioned
          .withColumn("__bwd", within(last(col("__rv"), ignoreNulls = true).over(wB)))
          .withColumn("__fwd", within(last(col("__rv"), ignoreNulls = true).over(wF)))
        val dB = unix_micros(col(tsCol)) - unix_micros(col("__bwd.__rts"))
        val dF = unix_micros(col("__fwd.__rts")) - unix_micros(col(tsCol))
        withBoth.withColumn("__asof",
          when(col("__bwd").isNull, col("__fwd"))
            .when(col("__fwd").isNull, col("__bwd"))
            .when(dF < dB, col("__fwd")) // strict <: ties go backward
            .otherwise(col("__bwd")))
          .drop("__bwd", "__fwd")
    }
    picked
      .where(col("__side") === 1)
      .select(left.columns.map(col).toIndexedSeq ++
        rightValCols.map(c => col(s"__asof.$c").as(c)): _*)
  }

  /** Bucketed range join: probe rows whose `tsCol` falls inside an
    * interval `[startCol, endCol)` — with NO equi key, the join Spark
    * plans as a BroadcastNestedLoopJoin, O(|probe|·|intervals|) and
    * undriveable once the interval side outgrows a broadcast.
    *
    * Both sides bucketize on exact epoch-microsecond integers
    * (`unix_micros`, no float truncation at bucket edges): a probe row
    * lands in exactly one `width`-sized bucket, an interval explodes to
    * the buckets its half-open span touches, and the join becomes a plain
    * shuffled equi-join on bucket id followed by the exact containment
    * filter. Every true pair meets exactly once (the probe's single
    * bucket), so no dedup pass is needed. Candidate volume is
    * (intervals-per-bucket × probes-per-bucket) summed over buckets —
    * linear in data for bounded interval density, and hot buckets are
    * ordinary join skew (AQE splits them; [[saltedJoin]] is the manual
    * hatch). Pick `widthSeconds` on the order of the typical interval
    * length: much smaller multiplies the interval explosion, much larger
    * multiplies false candidates per bucket.
    *
    * A pathological `width << span` configuration (1s buckets against
    * year-long intervals) would quietly explode each interval 10^7-fold;
    * any interval spanning more than `maxBucketsPerInterval` buckets
    * raises a clear error at execution instead of OOMing the shuffle.
    *
    * `extraKeys` names columns present on BOTH sides that must also be
    * equal — the bucketed join then shuffles on (key..., bucket), so
    * candidates are generated only within a key's bucket (the attribution
    * shape: correlate two event streams per user within a time bound).
    * The key multiplies selectivity for free — it rides the same shuffle.
    *
    * Output: the join keys (`extraKeys`) first, then remaining probe and
    * interval columns (names must be disjoint apart from `extraKeys`,
    * which appear once).
    */
  def rangeJoinBucketed(probe: DataFrame, intervals: DataFrame,
                        tsCol: String, startCol: String, endCol: String,
                        widthSeconds: Long,
                        maxBucketsPerInterval: Long = 65536L,
                        extraKeys: Seq[String] = Nil): DataFrame = {
    require(widthSeconds > 0, "bucket width must be positive")
    require(maxBucketsPerInterval > 0, "bucket cap must be positive")
    require(extraKeys.forall(k =>
      probe.columns.contains(k) && intervals.columns.contains(k)),
      "every extraKey must exist on both sides")
    val overlap = (probe.columns.toSet & intervals.columns.toSet) -- extraKeys
    require(overlap.isEmpty,
      s"column collision beyond extraKeys: ${overlap.mkString(", ")}")
    // the working column would silently overwrite (and then drop) a
    // caller's column of the same name
    require(!(probe.columns ++ intervals.columns).contains("__bucket"),
      "__bucket is reserved by rangeJoinBucketed")
    // integral `div`, not `/`: Column./ on longs promotes to double, and a
    // float quotient at an exact bucket boundary is the one place this
    // operator could silently drop a pair
    val w = widthSeconds * 1000000L
    val p = probe.withColumn("__bucket",
      expr(s"unix_micros($tsCol) div ${w}L"))
    // empty/inverted intervals match nothing; dropping them up front also
    // keeps the bucket sequence ascending (sequence() would otherwise
    // step DOWN from start-bucket to (end-1)-bucket and emit junk
    // candidates). Truncating div (not floor) is fine on both sides: all
    // that containment needs is the same monotone bucketing everywhere.
    val startB = expr(s"unix_micros($startCol) div ${w}L")
    val endB = expr(s"(unix_micros($endCol) - 1) div ${w}L")
    val iv = intervals.where(col(endCol) > col(startCol))
      .withColumn("__bucket",
        explode(when(endB - startB < lit(maxBucketsPerInterval),
          sequence(startB, endB))
          .otherwise(raise_error(lit(
            s"rangeJoinBucketed: interval spans more than " +
              s"$maxBucketsPerInterval buckets at width ${widthSeconds}s " +
              "— raise widthSeconds or maxBucketsPerInterval"))
            .cast("array<bigint>"))))
    p.join(iv, "__bucket" +: extraKeys)
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
