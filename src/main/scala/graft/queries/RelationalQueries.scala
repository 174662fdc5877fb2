package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface over the TPC-H-ish fixtures (SURVEY.md §7.2
  * step 5): aggregations, broadcast/sort-merge/semi/anti joins, windows,
  * rollup, set ops, top-k. All Spark built-ins — the point is that Catalyst
  * plans these (predicate pushdown, partial aggregation, broadcast
  * selection, TakeOrderedAndProject, WindowGroupLimit) with zero custom code.
  *
  * Oracle-parity rules (beyond NlpQueries'): money arithmetic is done in
  * DECIMAL (exact, order-independent partial aggregation) and only the
  * final aggregate is cast to DOUBLE — one deterministic rounding, so the
  * DuckDB hash compare is exact. No raw TIMESTAMP output columns (pandas
  * tz-representation differs between engines): dates are formatted strings.
  *
  * Scale notes: at 100 TB the lineitem joins shuffle on their keys; the dim
  * tables (region/nation/supplier, and customer at this ratio) are
  * broadcast — hinted explicitly where the optimizer's size estimate might
  * not see it (e.g., after a filter). Aggregations are partial+final hash
  * aggs; top-k is TakeOrderedAndProject (no global sort materialized).
  */
object RelationalQueries {

  /** Exact decimal cast for 2-decimal money/rate columns. */
  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  private def rate(c: Column): Column = c.cast("decimal(3,2)")
  private val one = lit(1).cast("decimal(3,2)")

  // --- q10: pricing summary (TPC-H Q1 pattern) ---------------------------
  def q10PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .where(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (one - rate(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(dec(col("l_extendedprice")) * (one - rate(col("l_discount")))
          * (one + rate(col("l_tax")))).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(rate(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q10Sql: String =
    """SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
      CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / count(*) AS avg_disc,
      count(*) AS count_order
    FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  // --- q10b: time-dimension aggregation (year/quarter revenue) -----------
  def q10bRevenueByQuarter(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        quarter(col("o_orderdate")).cast("long").as("qtr"))
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy("yr", "qtr")

  val q10bSql: String =
    """SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS yr,
      CAST(date_part('quarter', o_orderdate) AS BIGINT) AS qtr,
      count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1, 2 ORDER BY yr, qtr"""

  // --- q11: top unshipped-revenue orders (TPC-H Q3 pattern) --------------
  def q11TopOrders(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-06-01").cast("timestamp")
    val cust = Tables.customer(spark, dir).where(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir).where(col("o_orderdate") < cutoff)
    val li = Tables.lineitem(spark, dir).where(col("l_shipdate") > cutoff)
    // no broadcast hint on customer: it is a fact-scale table (150k×SF),
    // a hard hint OOMs the driver at cluster scale — AQE picks the join
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) * (one - rate(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  val q11Sql: String =
    """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"""

  // --- q12: revenue by nation within a region (TPC-H Q5 pattern) ---------
  def q12RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir).where(col("r_name") === "ASIA")
    // customer deliberately unhinted (fact-scale — AQE decides); the true
    // dimensions region/nation/supplier keep their broadcast hints
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(dec(col("l_extendedprice")) * (one - rate(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  val q12Sql: String =
    """SELECT n_name,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name ORDER BY revenue DESC, n_name ASC"""

  // --- q13: per-supplier top-3 lineitems + windowed totals ----------------
  def q13SupplierWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
    val byPrice = w.orderBy(col("l_extendedprice").desc,
      col("l_orderkey").asc, col("l_linenumber").asc)
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"),
        row_number().over(byPrice).cast("long").as("rn"),
        sum(dec(col("l_extendedprice"))).over(w).cast("double").as("supp_total"),
        count(lit(1)).over(w).as("supp_items"))
      .where(col("rn") <= 3)
      .orderBy("l_suppkey", "rn")
  }

  val q13Sql: String =
    """SELECT * FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        CAST(row_number() OVER (PARTITION BY l_suppkey ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS BIGINT) AS rn,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) OVER (PARTITION BY l_suppkey) AS DOUBLE) AS supp_total,
        count(*) OVER (PARTITION BY l_suppkey) AS supp_items
      FROM lineitem) t
    WHERE rn <= 3 ORDER BY l_suppkey, rn"""

  // --- q13b: analytic windows — lag/lead + bounded moving frame -----------
  def q13bAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val byDate = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val frame = byDate.rowsBetween(-2, 0)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(byDate).as("prev_price"),
        lead(col("o_totalprice"), 1).over(byDate).as("next_price"),
        // exact 3-row moving sum: DECIMAL accumulation, one final cast
        sum(dec(col("o_totalprice"))).over(frame).cast("double")
          .as("moving_sum_3"),
        row_number().over(byDate).cast("long").as("order_seq"))
      .orderBy("o_custkey", "order_seq")
  }

  val q13bSql: String =
    """SELECT o_custkey, o_orderkey,
      strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_totalprice,
      lag(o_totalprice, 1) OVER w AS prev_price,
      lead(o_totalprice, 1) OVER w AS next_price,
      CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
        OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum_3,
      CAST(row_number() OVER w AS BIGINT) AS order_seq
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    ORDER BY o_custkey, order_seq"""

  // --- q13e: time-based RANGE window frame ---------------------------------
  // The frame q13b's ROWS variant cannot express: "all events of this type
  // in the trailing 10 minutes" — a RANGE frame over event-time, where the
  // window population depends on VALUES, not row positions (bursts widen
  // it, gaps shrink it to 1). Spark has no interval RANGE frame over
  // timestamps directly; the engine form is rangeBetween over epoch
  // MICROseconds — exactly DuckDB's `RANGE INTERVAL '10 minutes'
  // PRECEDING` since both fixtures carry microsecond instants, which the
  // hash match proves. Exact DECIMAL value sums, one final cast.
  def q13eTimeRangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("ts_us"))
      .rangeBetween(-600000000L, 0L) // trailing 10 minutes in micros
    graft.Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .select(col("event_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
        count(lit(1)).over(w).as("n_10m"),
        sum(col("value").cast("decimal(12,2)")).over(w).cast("double")
          .as("sum_10m"))
      .orderBy("event_id")
  }

  val q13eSql: String =
    """WITH e AS (SELECT event_id, event_type,
      CAST(ts AS TIMESTAMP) AS ts, value FROM events)
    SELECT event_id, event_type,
      strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
      count(*) OVER w AS n_10m,
      CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_10m
    FROM e
    WINDOW w AS (PARTITION BY event_type ORDER BY ts
      RANGE BETWEEN INTERVAL '10 minutes' PRECEDING AND CURRENT ROW)
    ORDER BY event_id"""

  // --- q13f: LATERAL correlated subquery ------------------------------------
  // The SQL spelling of per-group top-k (the window/T5 shape expressed as
  // a correlated derived table): for each nation, its top-2 suppliers by
  // balance via `LATERAL (... ORDER BY ... LIMIT 2)`. Both engines
  // support SQL:1999 LATERAL; Spark plans it as a rewritten
  // domain-join + window under the hood, so this also pins the
  // decorrelation path. Balances are raw DOUBLE values (no aggregation),
  // exact cross-engine.
  def q13fLateralTopK(spark: SparkSession, dir: String): DataFrame = {
    Tables.nation(spark, dir).createOrReplaceTempView("q13f_nation")
    Tables.supplier(spark, dir).createOrReplaceTempView("q13f_supplier")
    spark.sql(
      """SELECT n.n_name, s.s_name, s.s_acctbal
      FROM q13f_nation n,
      LATERAL (
        SELECT s_name, s_acctbal FROM q13f_supplier
        WHERE s_nationkey = n.n_nationkey
        ORDER BY s_acctbal DESC, s_name ASC LIMIT 2) s
      ORDER BY n.n_name, s.s_acctbal DESC, s.s_name""")
  }

  val q13fSql: String =
    """SELECT n.n_name, s.s_name, s.s_acctbal
    FROM nation n,
    LATERAL (
      SELECT s_name, s_acctbal FROM supplier
      WHERE s_nationkey = n.n_nationkey
      ORDER BY s_acctbal DESC, s_name ASC LIMIT 2) s
    ORDER BY n.n_name, s.s_acctbal DESC, s.s_name"""

  // --- q125: try_* error-handling semantics ---------------------------------
  // Production SQL never lets one malformed row kill a 100 TB job: the
  // try_ family turns cast/arithmetic errors into NULLs. This pins the
  // NULL-on-error semantics CROSS-ENGINE over deterministic malformed
  // inputs: unparseable casts, integer overflow, division by zero —
  // per-class NULL counts plus the surviving sums, so an engine that
  // errored, skipped, or saturated instead of NULLing diverges.
  def q125TrySemantics(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        // every 7th key gets an unparseable string
        when(col("o_orderkey") % 7 === 0, lit("not-a-number"))
          .otherwise(col("o_orderkey").cast("string")).as("s"),
        // every 5th key divides by zero
        when(col("o_orderkey") % 5 === 0, lit(0L)).otherwise(lit(2L)).as("d"))
      .select(col("o_orderkey"),
        expr("try_cast(s AS BIGINT)").as("casted"),
        expr("try_divide(o_orderkey, d)").as("divided"),
        // overflow: even keys shift to ~9e18 then ×3, past Long.MaxValue
        // → NULL; odd keys multiply by 0 — a non-overflowing control
        expr("""try_multiply(try_add(o_orderkey, 9000000000000000000L),
          CASE WHEN o_orderkey % 2 = 0 THEN 3L ELSE 0L END)""")
          .as("overflowed"))
    o.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("casted").isNull, 1L).otherwise(0L)).as("null_casts"),
      sum(when(col("divided").isNull, 1L).otherwise(0L)).as("null_divides"),
      sum(when(col("overflowed").isNull, 1L).otherwise(0L)).as("null_overflows"),
      sum(col("casted")).as("sum_casted"),
      sum(col("divided").cast("decimal(20,1)")).cast("double").as("sum_divided"))
  }

  val q125Sql: String =
    """WITH o AS (SELECT o_orderkey,
      CASE WHEN o_orderkey % 7 = 0 THEN 'not-a-number'
           ELSE CAST(o_orderkey AS VARCHAR) END AS s,
      CASE WHEN o_orderkey % 5 = 0 THEN 0 ELSE 2 END AS d
      FROM orders),
    t AS (SELECT o_orderkey,
      TRY_CAST(s AS BIGINT) AS casted,
      CASE WHEN d = 0 THEN NULL
           ELSE CAST(o_orderkey AS DOUBLE) / d END AS divided,
      CASE WHEN o_orderkey % 2 = 0 THEN NULL  -- (k+9e18)*3 overflows
           ELSE 0 END AS overflowed
      FROM o)
    SELECT count(*) AS n_rows,
      CAST(sum(CASE WHEN casted IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_casts,
      CAST(sum(CASE WHEN divided IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_divides,
      CAST(sum(CASE WHEN overflowed IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_overflows,
      CAST(sum(casted) AS BIGINT) AS sum_casted,
      CAST(sum(CAST(divided AS DECIMAL(20,1))) AS DOUBLE) AS sum_divided
    FROM t"""

  // --- q123: ANALYZE-style column statistics --------------------------------
  // The optimizer-stats table every warehouse maintains (ANALYZE TABLE /
  // dbt docs): per column of lineitem — nulls, distinct count, min/max —
  // in ONE pass (a single wide aggregate; per-column sub-scans would
  // read the table N times). Emitted long-form (one row per column) so
  // the relation is schema-stable as columns are added; numeric min/max
  // ride as DOUBLEs (raw values, no aggregation arithmetic), everything
  // else as exact counts.
  def q123ColumnStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val cols = Seq("l_orderkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount")
    val agg = li.agg(
      count(lit(1)).as("n_rows"),
      cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_ndv"),
        min(col(c)).cast("double").as(s"${c}_min"),
        max(col(c)).cast("double").as(s"${c}_max"))): _*)
    // ONE corpus pass: the wide aggregate collapses to a single row,
    // collected (scalar-bound) and reshaped long-form driver-side — a
    // per-column UNION over the live plan would re-run the scan and the
    // distinct aggregation once per column (observed: 5 scans in the
    // plan audit before this collect)
    val r = agg.head()
    import spark.implicits._
    cols.map { c =>
      (c, r.getAs[Long]("n_rows"), r.getAs[Long](s"${c}_nulls"),
        r.getAs[Long](s"${c}_ndv"), r.getAs[Double](s"${c}_min"),
        r.getAs[Double](s"${c}_max"))
    }.toDF("column_name", "n_rows", "n_nulls", "n_distinct",
      "min_value", "max_value")
      .orderBy("column_name")
  }

  val q123Sql: String = {
    val cols = Seq("l_orderkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount")
    cols.map(c =>
      s"""SELECT '$c' AS column_name,
        count(*) AS n_rows,
        CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        count(DISTINCT $c) AS n_distinct,
        CAST(min($c) AS DOUBLE) AS min_value,
        CAST(max($c) AS DOUBLE) AS max_value
      FROM lineitem""").mkString("\n    UNION ALL\n    ") +
      "\n    ORDER BY column_name"
  }

  // --- q124: data-quality constraint suite ----------------------------------
  // The dbt-test / Great-Expectations gate as one relation: per declared
  // constraint, its violation count — uniqueness, referential integrity
  // across the star schema, value-domain bounds. A release pipeline
  // blocks when any row is nonzero; emitting COUNTS (not a boolean)
  // makes the failure actionable. Anti-joins for the FK checks (never
  // collected), one aggregate per constraint, all scalar-bound results
  // unioned.
  def q124DqChecks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val docs = Tables.documents(spark, dir)
    def cnt(name: String, d: org.apache.spark.sql.DataFrame) =
      d.agg(count(lit(1)).as("violations"))
        .select(lit(name).as("constraint_name"), col("violations"))
    val dupOrders = ord.groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      .where(col("n") > 1)
    val dupDocs = docs.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .where(col("n") > 1)
    val orphanLi = li.join(ord.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_anti")
    val orphanOrd = ord.join(cust.select(col("c_custkey")),
      col("o_custkey") === col("c_custkey"), "left_anti")
    val badDiscount = li.where(col("l_discount") < 0.0 || col("l_discount") > 0.1)
    val badQty = li.where(col("l_quantity") <= 0.0)
    cnt("orders_pk_unique", dupOrders)
      .unionByName(cnt("documents_pk_unique", dupDocs))
      .unionByName(cnt("lineitem_orderkey_fk", orphanLi))
      .unionByName(cnt("orders_custkey_fk", orphanOrd))
      .unionByName(cnt("lineitem_discount_domain", badDiscount))
      .unionByName(cnt("lineitem_quantity_positive", badQty))
      .orderBy("constraint_name")
  }

  val q124Sql: String =
    """SELECT 'orders_pk_unique' AS constraint_name,
      CAST((SELECT count(*) FROM (SELECT o_orderkey FROM orders
        GROUP BY o_orderkey HAVING count(*) > 1)) AS BIGINT) AS violations
    UNION ALL SELECT 'documents_pk_unique',
      (SELECT count(*) FROM (SELECT doc_id FROM documents
        GROUP BY doc_id HAVING count(*) > 1))
    UNION ALL SELECT 'lineitem_orderkey_fk',
      (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL SELECT 'orders_custkey_fk',
      (SELECT count(*) FROM orders o WHERE NOT EXISTS
        (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
    UNION ALL SELECT 'lineitem_discount_domain',
      (SELECT count(*) FROM lineitem WHERE l_discount < 0.0 OR l_discount > 0.1)
    UNION ALL SELECT 'lineitem_quantity_positive',
      (SELECT count(*) FROM lineitem WHERE l_quantity <= 0.0)
    ORDER BY constraint_name"""

  // --- q16c: NOT IN vs NOT EXISTS under NULLs -------------------------------
  // The classic tri-valued-logic trap, verified cross-engine: `x NOT IN
  // (subquery)` is `x <> v1 AND x <> v2 AND ...` — ONE NULL in the
  // subquery makes every conjunct UNKNOWN, so the predicate never passes
  // and the count is 0, while NOT EXISTS (a real anti-join) is
  // NULL-immune and keeps its rows. Both engines must agree on all four
  // variants over the same null-injected key set; an optimizer that
  // "fixed" NOT IN into a plain anti-join would be caught here. The
  // engine side exercises Spark's SQL subquery planner (temp views —
  // the DataFrame API deliberately has no NOT IN).
  def q16cNotInNulls(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("q16c_cust")
    val ord = Tables.orders(spark, dir).select(col("o_custkey"))
    ord.createOrReplaceTempView("q16c_ord")
    ord.unionByName(
      spark.range(1).select(lit(null).cast("long").as("o_custkey")))
      .createOrReplaceTempView("q16c_ord_null")
    spark.sql(
      """SELECT variant, CAST(n AS BIGINT) AS n FROM (
        SELECT 'in_null' AS variant,
          (SELECT count(*) FROM q16c_cust
           WHERE c_custkey IN (SELECT o_custkey FROM q16c_ord_null)) AS n
        UNION ALL SELECT 'not_exists_null',
          (SELECT count(*) FROM q16c_cust c WHERE NOT EXISTS
            (SELECT 1 FROM q16c_ord_null o WHERE o.o_custkey = c.c_custkey))
        UNION ALL SELECT 'not_in_clean',
          (SELECT count(*) FROM q16c_cust
           WHERE c_custkey NOT IN (SELECT o_custkey FROM q16c_ord))
        UNION ALL SELECT 'not_in_null',
          (SELECT count(*) FROM q16c_cust
           WHERE c_custkey NOT IN (SELECT o_custkey FROM q16c_ord_null)))
      ORDER BY variant""")
  }

  val q16cSql: String =
    """WITH ord AS (SELECT o_custkey FROM orders),
    ord_null AS (SELECT o_custkey FROM orders
      UNION ALL SELECT NULL)
    SELECT variant, CAST(n AS BIGINT) AS n FROM (
      SELECT 'in_null' AS variant,
        (SELECT count(*) FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM ord_null)) AS n
      UNION ALL SELECT 'not_exists_null',
        (SELECT count(*) FROM customer c WHERE NOT EXISTS
          (SELECT 1 FROM ord_null o WHERE o.o_custkey = c.c_custkey))
      UNION ALL SELECT 'not_in_clean',
        (SELECT count(*) FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM ord))
      UNION ALL SELECT 'not_in_null',
        (SELECT count(*) FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM ord_null)))
    ORDER BY variant"""

  // --- q13d: distribution window functions ---------------------------------
  // The §2.6 completion: ntile / percent_rank / cume_dist over supplier
  // balances within nation. The ratio functions are (k-1)/(n-1) and k/n —
  // each a single IEEE division of identical integers in both engines, so
  // the doubles hash-match bit-exactly (the q10 avg precedent). Ties on
  // acctbal are broken into the ORDER BY by suppkey, making every rank
  // deterministic.
  def q13dDistributionWindows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("s_nationkey")
      .orderBy(col("s_acctbal").asc, col("s_suppkey").asc)
    Tables.supplier(spark, dir)
      .select(col("s_nationkey"), col("s_suppkey"), col("s_acctbal"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("s_nationkey", "s_suppkey")
  }

  val q13dSql: String =
    """SELECT s_nationkey, s_suppkey, s_acctbal,
      CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      percent_rank() OVER w AS pct_rank,
      cume_dist() OVER w AS cume
    FROM supplier
    WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal ASC, s_suppkey ASC)
    ORDER BY s_nationkey, s_suppkey"""

  // --- q13c: correlated-subquery pattern (TPC-H Q2 shape) — cheapest
  // supplier per part, decorrelated as a min-aggregate self-join ----------
  def q13cMinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    val minPrice = li.groupBy("l_partkey")
      .agg(min(col("l_extendedprice")).as("min_price"))
    li.join(minPrice, Seq("l_partkey"))
      .where(col("l_extendedprice") === col("min_price"))
      .groupBy("l_partkey")
      .agg(min(col("l_suppkey")).as("cheapest_suppkey"), // dedup exact ties
        min(col("min_price")).as("min_price"))
      .orderBy("l_partkey")
      .limit(100)
  }

  val q13cSql: String =
    """SELECT l_partkey, CAST(min(l_suppkey) AS BIGINT) AS cheapest_suppkey,
      min(l_extendedprice) AS min_price
    FROM lineitem l
    WHERE l_extendedprice = (
      SELECT min(l_extendedprice) FROM lineitem i
      WHERE i.l_partkey = l.l_partkey)
    GROUP BY l_partkey ORDER BY l_partkey LIMIT 100"""

  // --- q14: rollup aggregation with grouping indicators -------------------
  def q14Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"), col("g_rf"), col("g_ls"))
      .orderBy("returnflag", "linestatus")

  val q14Sql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      coalesce(l_linestatus, 'ALL') AS linestatus,
      count(*) AS n,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
      CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus"""

  // --- q14c: asymmetric GROUPING SETS --------------------------------------
  // The granularity mix neither ROLLUP nor CUBE expresses: the detailed
  // (returnflag, linestatus) breakdown, a linenumber-only view, and the
  // grand total in ONE pass (one Expand + one aggregate — each input row
  // fans out to exactly 3 grouping rows, not 2^k).
  def q14cGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linenumber")), Seq()),
        col("l_returnflag"), col("l_linestatus"), col("l_linenumber"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"),
        grouping(col("l_linenumber")).cast("long").as("g_ln"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        coalesce(col("l_linenumber").cast("long"), lit(-1L)).as("linenumber"),
        col("n"), col("sum_qty"), col("g_rf"), col("g_ls"), col("g_ln"))
      .orderBy("returnflag", "linestatus", "linenumber", "g_rf", "g_ls", "g_ln")

  val q14cSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      coalesce(l_linestatus, 'ALL') AS linestatus,
      CAST(coalesce(l_linenumber, -1) AS BIGINT) AS linenumber,
      count(*) AS n,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
      CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
      CAST(grouping(l_linenumber) AS BIGINT) AS g_ln
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linenumber), ())
    ORDER BY returnflag, linestatus, linenumber, g_rf, g_ls, g_ln"""

  // --- q14b: full cube with grouping indicators ---------------------------
  def q14bCube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"), col("g_rf"), col("g_ls"))
      .orderBy("returnflag", "linestatus", "g_rf", "g_ls")

  val q14bSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      coalesce(l_linestatus, 'ALL') AS linestatus,
      count(*) AS n,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
      CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus, g_rf, g_ls"""

  // --- q15: set operations (union / intersect / except) -------------------
  def q15SetOps(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
    val bigSpenders = Tables.orders(spark, dir)
      .where(col("o_totalprice") > 300000).select(col("o_custkey").as("k")).distinct()
    def n(df: DataFrame, op: String): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
    n(building.union(bigSpenders).distinct(), "union")
      .unionAll(n(building.intersect(bigSpenders), "intersect"))
      .unionAll(n(building.except(bigSpenders), "except"))
      .orderBy("op")
  }

  val q15Sql: String =
    """WITH building AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
      big AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 300000)
    SELECT 'union' AS op, count(*) AS n FROM (SELECT k FROM building UNION SELECT k FROM big) t
    UNION ALL
    SELECT 'intersect' AS op, count(*) AS n FROM (SELECT k FROM building INTERSECT SELECT k FROM big) t
    UNION ALL
    SELECT 'except' AS op, count(*) AS n FROM (SELECT k FROM building EXCEPT SELECT k FROM big) t
    ORDER BY op"""

  // --- q16: semi/anti join — customers with/without orders per segment ----
  def q16SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir).select("o_custkey")
    val withO = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_with_orders"))
    val withoutO = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_without_orders"))
    cust.groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
      .join(withO, Seq("c_mktsegment"), "left")
      .join(withoutO, Seq("c_mktsegment"), "left")
      .select(col("c_mktsegment"), col("n_customers"),
        coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
        coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
      .orderBy("c_mktsegment")
  }

  // EXISTS/NOT EXISTS, not IN/NOT IN: the Spark side is semi/anti join and
  // NOT IN returns zero rows if o_custkey ever contains a NULL — a latent
  // cross-engine divergence the null-free fixture would mask
  val q16Sql: String =
    """SELECT c_mktsegment, count(*) AS n_customers,
      CAST(sum(CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
      CAST(sum(CASE WHEN NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS n_without_orders
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  // --- q16b: outer joins — nation coverage with zero-order nations ---------
  def q16bOuter(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val perNation = cust.groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"),
        sum(dec(col("c_acctbal"))).cast("double").as("total_acctbal"))
    nat.join(perNation, col("n_nationkey") === col("c_nationkey"), "full_outer")
      .select(
        coalesce(col("n_name"), lit("UNKNOWN")).as("nation"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("total_acctbal"), lit(0.0)).as("total_acctbal"))
      .orderBy("nation")
  }

  val q16bSql: String =
    """SELECT coalesce(n_name, 'UNKNOWN') AS nation,
      coalesce(n_customers, 0) AS n_customers,
      coalesce(total_acctbal, 0.0) AS total_acctbal
    FROM nation FULL OUTER JOIN (
      SELECT c_nationkey, count(*) AS n_customers,
        CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
      FROM customer GROUP BY c_nationkey) c
    ON n_nationkey = c_nationkey
    ORDER BY nation"""

  // --- q17: exact distinct counts ------------------------------------------
  def q17DistinctStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  val q17Sql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      count(DISTINCT l_suppkey) AS n_supps, count(DISTINCT l_orderkey) AS n_orders,
      count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** approx_count_distinct (HLL) — engines' sketches differ by design, so
    * this is rows-only checked (no oracle). The scale story: at 100 TB exact
    * distinct on a hot key is a full shuffle; the HLL sketch is partial-
    * aggregable and constant-size.
    */
  def q17bApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"))
      .orderBy("l_returnflag")

  // --- q18: global top-k (TakeOrderedAndProject) ---------------------------
  def q18TopOrderValues(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)

  val q18Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20"""

  // --- q19: orders above their customer's average (window analytics) -------
  def q19AboveCustomerAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        (sum(dec(col("o_totalprice"))).over(w).cast("double") /
          count(lit(1)).over(w)).as("cust_avg"),
        count(lit(1)).over(w).as("cust_orders"))
      .where(col("o_totalprice") > col("cust_avg"))
      .orderBy("o_orderkey")
  }

  val q19Sql: String =
    """SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey) AS DOUBLE)
          / count(*) OVER (PARTITION BY o_custkey) AS cust_avg,
        count(*) OVER (PARTITION BY o_custkey) AS cust_orders
      FROM orders) t
    WHERE o_totalprice > cust_avg ORDER BY o_orderkey"""

  // --- q19b: scalar-subquery pattern — orders above the global average ----
  def q19bAboveGlobalAvg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val globalAvg = o.agg(
      (sum(dec(col("o_totalprice"))).cast("double") / count(lit(1)))
        .as("global_avg"))
    o.crossJoin(broadcast(globalAvg))
      .where(col("o_totalprice") > col("global_avg"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy("o_orderpriority")
  }

  val q19bSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      min(o_totalprice) AS min_price, max(o_totalprice) AS max_price
    FROM orders
    WHERE o_totalprice > (
      SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
      FROM orders)
    GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  /** Exact, order-independent dispersion (n, mean, stddev) over
    * integer-scaled values, overflow-safe far past Int64 row counts.
    *
    * The naive exact form keeps Int64 Σq and Σq² and computes
    * `n·Σq² - (Σq)²` — which overflows 2^63 around 1e11 rows of
    * centi-scaled quantities, i.e. exactly at the 100 TB scale this
    * engine targets. Instead:
    *   - values are SHIFTED by a constant near the domain midpoint before
    *     squaring (d = qi - shift), shrinking both sums by orders of
    *     magnitude without changing the variance (Var(q - c) = Var(q),
    *     and the mean shifts back exactly);
    *   - accumulation runs in DECIMAL(38,0) — exact integer arithmetic
    *     with 1e38 headroom, partial-aggregable, still one shuffle. With
    *     |d| <= D, `n·Σd² - (Σd)²` <= n²·D², so centi-quantities
    *     (D = 2500) stay exact beyond 4e15 rows.
    * The only floats are the final single divisions/sqrt, identical
    * expressions on the DuckDB side (which runs the same integer math in
    * HUGEINT), so results stay hash-exact cross-engine.
    */
  def exactDispersion(rows: DataFrame, key: String, qi: Column, shift: Long,
                      scale: Double): DataFrame = {
    val dec38 = "decimal(38,0)"
    val d = (qi - lit(shift)).cast(dec38)
    rows.select(col(key), d.as("d"))
      .groupBy(key)
      .agg(count(lit(1)).as("n"),
        sum(col("d")).as("sumd"),
        sum(col("d") * col("d")).as("sumd2"))
      .select(col(key), col("n"),
        ((col("sumd").cast("double") / col("n") + shift) / scale).as("mean_qty"),
        (sqrt((col("n").cast(dec38) * col("sumd2") - col("sumd") * col("sumd"))
          .cast("double")
          / (col("n").cast(dec38) * (col("n") - 1).cast(dec38)).cast("double"))
          / scale).as("stddev_qty"))
  }

  /** q17c: dispersion statistics with cross-engine-exact semantics —
    * quantities scaled to exact integer centi-units, then
    * [[exactDispersion]]'s shifted DECIMAL(38) accumulation (the
    * formulation that survives 100 TB row counts; see its scaladoc).
    */
  def q17cStats(spark: SparkSession, dir: String): DataFrame =
    exactDispersion(
      Tables.lineitem(spark, dir).select(col("l_returnflag"),
        round(col("l_quantity") * 100).cast("long").as("qi")),
      "l_returnflag", col("qi"), shift = 2500L, scale = 100.0)
      .orderBy("l_returnflag")

  // HUGEINT (int128) carries the same exact integer math on the DuckDB
  // side; only n/mean/stddev (BIGINT/DOUBLE) reach the output, so no
  // HUGEINT->float64 dtype artifact can leak into the hash
  val q17cSql: String =
    """WITH s AS (
      SELECT l_returnflag,
        CAST(CAST(round(l_quantity * 100) AS BIGINT) - 2500 AS HUGEINT) AS d
      FROM lineitem),
    g AS (
      SELECT l_returnflag, count(*) AS n,
        sum(d) AS sumd, sum(d * d) AS sumd2
      FROM s GROUP BY l_returnflag)
    SELECT l_returnflag, n,
      (CAST(sumd AS DOUBLE) / n + 2500) / 100.0 AS mean_qty,
      sqrt(CAST(n * sumd2 - sumd * sumd AS DOUBLE)
        / CAST(CAST(n AS HUGEINT) * (n - 1) AS DOUBLE)) / 100.0 AS stddev_qty
    FROM g ORDER BY l_returnflag"""

  /** q17d: exact interpolated percentiles (Spark `percentile` vs DuckDB
    * `quantile_cont` — independent implementations of the same continuous-
    * quantile definition). Verifiable bit-exactly because every operand is
    * exactly representable: quantities are integer-valued doubles and
    * p ∈ {.25, .5, .75} interpolates on quarter-fractions, so the
    * interpolation and the 1e6 scaling stay exact in both engines. A p
    * like 0.9 would NOT be safe (0.9 has no finite binary expansion).
    * Exact percentile holds the full sorted group — at 100 TB prefer
    * approx_percentile (q17b's sketch family) unless exactness is the
    * point.
    */
  def q17dPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        floor(percentile(col("l_quantity"), lit(0.25)) * 1000000).cast("long").as("p25_micro"),
        floor(percentile(col("l_quantity"), lit(0.5)) * 1000000).cast("long").as("p50_micro"),
        floor(percentile(col("l_quantity"), lit(0.75)) * 1000000).cast("long").as("p75_micro"))
      .orderBy("l_returnflag")

  val q17dSql: String =
    """SELECT l_returnflag, count(*) AS n,
      CAST(floor(quantile_cont(l_quantity, 0.25) * 1000000) AS BIGINT) AS p25_micro,
      CAST(floor(quantile_cont(l_quantity, 0.50) * 1000000) AS BIGINT) AS p50_micro,
      CAST(floor(quantile_cont(l_quantity, 0.75) * 1000000) AS BIGINT) AS p75_micro
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** q17f: EXACT k-th order statistic (the lower median) in TWO bounded
    * passes — the scale path q17d's `percentile` aggregate doesn't have:
    * Spark's exact percentile buffers every group value in one
    * aggregation buffer (fine per returnflag at fixture scale, a
    * single-buffer OOM on a 1e12-row global column). Classic histogram
    * narrowing (Munro-Paterson selection, the distributed folklore
    * variant): pass 1 aggregates min/max + a `MedianBuckets`-bucket
    * histogram of integer cents (ONE scan, bounded state); the driver
    * walks ≤ MedianBuckets rows to locate the bucket containing global
    * rank k = (n+1) div 2 and the residual rank within it; pass 2 sorts
    * ONLY that bucket's members (≈ n/buckets rows) and takes the
    * residual rank. When a bucket still holds more than `Pass2Limit`
    * rows (the degenerate near-constant column: hi≈lo → width 1 buckets
    * that can't split value mass, or extreme skew piling rank mass into
    * one bucket), the narrowing RECURSES into that bucket's value range
    * with a fresh histogram instead of handing pass 2 an unbounded —
    * and beyond 2^31, silently Int-overflowed — TakeOrdered; each level
    * divides the value range by MedianBuckets, so ≤ ~6 levels cover the
    * full 64-bit cents domain, and a width-1 bucket IS the answer with
    * no sort at all. Every comparison is on `floor(100·x)` BIGINT cents —
    * the paired-IEEE-expression portability rule — so the result is
    * oracle-exact against DuckDB's direct ORDER BY/OFFSET formulation.
    * Output: `(n, k, median_cents)`.
    */
  val MedianBuckets = 1024L

  /** Max rows pass 2 may sort-and-take: 2^22 longs ≈ 32 MB on the driver
    * via TakeOrderedAndProject — comfortably bounded, far under Int range.
    */
  val Pass2Limit = 1L << 22

  def q17fMedian2Pass(spark: SparkSession, dir: String,
                      pass2Limit: Long = Pass2Limit): DataFrame = {
    val cents = Tables.lineitem(spark, dir)
      .select(floor(col("l_extendedprice") * 100).cast("long").as("v"))
    val staged = graft.CacheScope.persist(cents)
    val Seq(n, lo0, hi0) = staged
      .agg(count(lit(1)), min(col("v")), max(col("v")))
      .head().toSeq.map(_.asInstanceOf[Long]).toSeq
    val k = (n + 1) / 2
    var lo = lo0; var hi = hi0; var kCur = k
    var median = 0L; var done = false
    while (!done) {
      val w = (hi - lo + MedianBuckets) / MedianBuckets // ceil width, >= 1
      val ranged = staged.where(col("v") >= lo && col("v") <= hi)
      val hist = ranged
        .groupBy(expr(s"(v - $lo) div $w").as("b"))
        .agg(count(lit(1)).as("c"))
        .orderBy("b").collect().map(r => (r.getLong(0), r.getLong(1)))
      var cum = 0L; var bStar = -1L; var before = 0L; var inBucket = 0L
      val it = hist.iterator
      while (bStar < 0 && it.hasNext) {
        val (b, c) = it.next()
        if (cum + c >= kCur) { bStar = b; before = cum; inBucket = c }
        else cum += c
      }
      val bLo = lo + bStar * w
      val bHi = math.min(hi, bLo + w - 1)
      val kIn = kCur - before // residual rank inside the target bucket
      if (w == 1L) {
        median = bLo; done = true // single-value bucket: rank irrelevant
      } else if (inBucket <= pass2Limit) {
        median = staged
          .where(col("v") >= bLo && col("v") <= bHi)
          .orderBy("v").limit(kIn.toInt)
          .agg(max(col("v")).as("m")).head().getLong(0)
        done = true
      } else { // narrow into the heavy bucket and re-histogram
        lo = bLo; hi = bHi; kCur = kIn
      }
    }
    import spark.implicits._
    Seq((n, k, median)).toDF("n", "k", "median_cents")
  }

  val q17fSql: String =
    """WITH c AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v
      FROM lineitem),
    t AS (SELECT CAST(count(*) AS BIGINT) AS n,
      CAST((count(*) + 1) // 2 AS BIGINT) AS k FROM c),
    m AS (SELECT v FROM c ORDER BY v
      LIMIT 1 OFFSET (SELECT k - 1 FROM t))
    SELECT t.n, t.k, m.v AS median_cents FROM t CROSS JOIN m"""

  /** q56: the salted skew join, driver-verified. Salting is semantics-
    * preserving for 1:N joins with unique keys on the replicated side, so
    * the oracle is simply the PLAIN join — the check is that the salt
    * machinery (deterministic row-hash salt, explode-replicated dimension,
    * (key, salt) equi-join) changes nothing but the shuffle layout. The
    * fixture has no engineered hot key; the op exists for corpora where
    * one key holds a double-digit share of rows and AQE's skew split
    * can't apply (aggregate-then-join shapes).
    */
  def q56SaltedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
      .withColumnRenamed("c_custkey", "o_custkey")
    graft.ops.JoinOps.saltedJoin(ord, cust, "o_custkey", salts = 8,
      saltCols = Seq("o_orderkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
      .orderBy("c_mktsegment")
  }

  val q56Sql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_salted_revenue" -> (q56SaltedRevenue _),
    "q17c_stats" -> (q17cStats _),
    "q17d_percentiles" -> (q17dPercentiles _),
    "q17f_median_2pass" -> ((s, d) => q17fMedian2Pass(s, d)),
    "q19b_above_global_avg" -> (q19bAboveGlobalAvg _),
    "q10_pricing_summary" -> (q10PricingSummary _),
    "q10b_revenue_by_quarter" -> (q10bRevenueByQuarter _),
    "q11_top_orders" -> (q11TopOrders _),
    "q12_region_revenue" -> (q12RegionRevenue _),
    "q13_supplier_window" -> (q13SupplierWindow _),
    "q13b_analytics" -> (q13bAnalytics _),
    "q13e_time_range_frame" -> (q13eTimeRangeFrame _),
    "q13f_lateral_topk" -> (q13fLateralTopK _),
    "q16c_not_in_nulls" -> (q16cNotInNulls _),
    "q123_column_stats" -> (q123ColumnStats _),
    "q125_try_semantics" -> (q125TrySemantics _),
    "q124_dq_checks" -> (q124DqChecks _),
    "q13c_min_cost_supplier" -> (q13cMinCostSupplier _),
    "q14_rollup" -> (q14Rollup _),
    "q14c_grouping_sets" -> (q14cGroupingSets _),
    "q13d_distribution_windows" -> (q13dDistributionWindows _),
    "q14b_cube" -> (q14bCube _),
    "q15_set_ops" -> (q15SetOps _),
    "q16_semi_anti" -> (q16SemiAnti _),
    "q16b_outer" -> (q16bOuter _),
    "q17_distinct_stats" -> (q17DistinctStats _),
    "q17b_approx_distinct" -> (q17bApproxDistinct _),
    "q18_top_order_values" -> (q18TopOrderValues _),
    "q19_above_customer_avg" -> (q19AboveCustomerAvg _))

  val oracleSql: Map[String, String] = Map(
    "q56_salted_revenue" -> q56Sql,
    "q17c_stats" -> q17cSql,
    "q17d_percentiles" -> q17dSql,
    "q17f_median_2pass" -> q17fSql,
    "q19b_above_global_avg" -> q19bSql,
    "q10_pricing_summary" -> q10Sql,
    "q10b_revenue_by_quarter" -> q10bSql,
    "q11_top_orders" -> q11Sql,
    "q12_region_revenue" -> q12Sql,
    "q13_supplier_window" -> q13Sql,
    "q13b_analytics" -> q13bSql,
    "q13e_time_range_frame" -> q13eSql,
    "q13f_lateral_topk" -> q13fSql,
    "q16c_not_in_nulls" -> q16cSql,
    "q123_column_stats" -> q123Sql,
    "q125_try_semantics" -> q125Sql,
    "q124_dq_checks" -> q124Sql,
    "q13c_min_cost_supplier" -> q13cSql,
    "q14_rollup" -> q14Sql,
    "q14c_grouping_sets" -> q14cSql,
    "q13d_distribution_windows" -> q13dSql,
    "q14b_cube" -> q14bSql,
    "q15_set_ops" -> q15Sql,
    "q16_semi_anti" -> q16Sql,
    "q16b_outer" -> q16bSql,
    "q17_distinct_stats" -> q17Sql,
    "q18_top_order_values" -> q18Sql,
    "q19_above_customer_avg" -> q19Sql)
}
