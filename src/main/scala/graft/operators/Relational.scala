package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.Tables
import graft.functions.Num._

/** Relational query surface (SURVEY.md §2.B).
  *
  * Every query is declared with the DataFrame API so Catalyst owns the
  * physical plan: filters/projections reach the parquet scan, and
  * fact-fact joins shuffle on their keys under AQE. Explicit
  * `broadcast()` hints appear ONLY where the side is bounded at EVERY
  * scale factor: region/nation (fixed 5/25 rows) and single-row /
  * limit-bounded derivations (e.g. q15's global max). Tables that grow
  * with SF — customer, supplier, part, orders, lineitem — carry NO
  * forced hint: at bench scale AQE re-plans their joins to broadcast
  * from observed runtime sizes, while at the 100 TB design point a
  * forced hint would bypass AQE's size check and OOM the driver
  * (customer is ~10^10 rows at TPC-H ratios). PlanSpec's hint sweep
  * locks this rule in. All monetary aggregates use the fixed-point
  * helpers in [[graft.functions.Num]] for partition-order-independent
  * results.
  */
object Relational {

  /** q01: groupBy multi-aggregate scan of lineitem (TPC-H Q1 shape).
    * One shuffle on the 2-value group key; partial aggregation
    * (map-side combine) does nearly all the work before it.
    */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        lsum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        revenueSum.as("sum_disc_price"),
        intAvg(col("l_quantity")).as("avg_qty"),
        decAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q02: selective filter + narrow projection; both must reach the
    * parquet scan (PushedFilters + 3-column ReadSchema) — at 100 TB this
    * is the difference between reading 3 columns of a few row groups and
    * reading everything.
    */
  def q02FilterProject(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_quantity") < 5 && col("l_discount") > 0.08)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** q03: segment customers ⋈ orders ⋈ lineitem, revenue top-10
    * (TPC-H Q3 shape). The segment-filtered customer side carries no
    * broadcast hint — it is a fixed fraction of a table that grows with
    * SF, so AQE auto-broadcasts it at bench scale and falls back to a
    * shuffle join when it outgrows the threshold; the orders⋈lineitem
    * join shuffles on orderkey.
    */
  def q03TopRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val cust = t.customer.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    t.lineitem
      .join(t.orders.join(cust, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("order_date"),
        col("o_orderpriority"))
      .agg(revenueSum.as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** q04: EXISTS semi-join — orders having any discounted line, counted
    * by priority. Left-semi keeps the probe side narrow and never
    * duplicates order rows.
    */
  def q04OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val discounted = t.lineitem.filter(col("l_discount") > 0.05).select("l_orderkey")
    t.orders
      .join(discounted, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** q05: regional revenue — 6-way join (TPC-H Q5 shape). region/nation
    * are fixed-size → broadcast hints; supplier/customer grow with SF so
    * their joins are left to AQE (auto-broadcast at bench scale, shuffle
    * at 100 TB); the lineitem⋈orders backbone shuffles on orderkey.
    */
  def q05RegionalRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val asiaNations = t.nation
      .join(broadcast(t.region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(revenueSum.as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** q06: selective scan → scalar aggregate; filter fully pushed down,
    * no join, no shuffle beyond the final single-row reduce.
    */
  def q06ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast(DoubleType).as("forecast_revenue"))
  }

  /** q07: window ranking — top-2 orders per customer. Single shuffle on
    * the partition key; rank computed within partitions.
    */
  def q07WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t.orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 2)
      .orderBy("o_custkey", "rn")
  }

  /** q08: distinct aggregation per group (expands then dedups map-side). */
  def q08DistinctCount(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .groupBy("c_mktsegment")
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
        count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** q09: set operators — INTERSECT / EXCEPT / UNION (distinct forms). */
  def q09SetOps(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val orderCust = t.orders.select(col("o_custkey").as("custkey"))
    val active = t.customer.filter(col("c_acctbal") > 0)
      .select(col("c_custkey").as("custkey"))
      .intersect(orderCust)
    val machineryNoOrders = t.customer.filter(col("c_mktsegment") === "MACHINERY")
      .select(col("c_custkey").as("custkey"))
      .except(orderCust)
    active.union(machineryNoOrders).distinct().orderBy("custkey")
  }

  /** q10: ROLLUP over region→nation. Subtotal rows are labelled 'ALL'
    * via COALESCE (the group columns are non-null in the data, so NULL
    * unambiguously means "subtotal"), keeping the output null-free and
    * deterministically ordered.
    */
  def q10Rollup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("rg"), col("n_name").as("nt"), col("c_acctbal"))
      // expr()-based grouping: rollup's Expand duplicates dataset-tagged
      // attributes, which falsely trips the ambiguous-self-join detector
      // when the grouping columns carry __dataset_id metadata (as
      // rollup(String*) / col() do). expr() resolves purely by name.
      .rollup(expr("rg"), expr("nt"))
      .agg(decSum(expr("c_acctbal")).as("sum_acctbal"), count(lit(1)).as("n_cust"))
      .selectExpr(
        "coalesce(rg, 'ALL') AS region_name",
        "coalesce(nt, 'ALL') AS nation_name",
        "sum_acctbal", "n_cust")
      .orderBy("region_name", "nation_name")
  }

  /** q11: aggregate + HAVING filter on the aggregate. */
  def q11Having(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy("l_partkey")
      .agg(lsum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n_lines"))
      .filter(col("total_qty") > 200)
      .orderBy("l_partkey")
  }

  /** q12: CASE-WHEN conditional aggregation (pivot-style counts). */
  def q12ConditionalAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("returned_lines"),
        sum(when(col("l_returnflag") =!= "R", 1L).otherwise(0L)).as("kept_lines"),
        sum(when(col("l_tax") > 0.04, 1L).otherwise(0L)).as("high_tax_lines"))
      .orderBy("o_orderpriority")
  }

  /** q13: customer⋈orders left outer join → per-customer order counts →
    * distribution histogram (TPC-H Q13 shape; two shuffles, the second
    * over a tiny key space coalesced by AQE).
    */
  def q13OuterJoinHist(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** q14: NOT EXISTS anti-join — customers with no high-value order
    * (the subset predicate keeps the result non-empty at every SF,
    * unlike "no orders at all", which is vacuously empty in this data).
    */
  def q14AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val big = t.orders.filter(col("o_totalprice") > 100000).select("o_custkey")
    t.customer
      .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** q15: scalar-subquery-on-aggregate — supplier(s) with max revenue
    * (TPC-H Q15 shape). The single-row max side keeps its broadcast
    * hint (a grouping-free aggregate is one row at ANY scale) so the
    * "subquery" costs one extra stage, not a shuffle; supplier grows
    * with SF, so its join is AQE's call.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val rev = t.lineitem.groupBy("l_suppkey").agg(revenueSum.as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("max_rev"))
    rev
      .join(broadcast(maxRev), col("total_revenue") === col("max_rev"))
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  /** q16: multi-key global sort + limit (TakeOrderedAndProject — no full
    * sort materialization at scale).
    */
  def q16SortLimit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.part
      .select("p_partkey", "p_name", "p_retailprice")
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .limit(20)
  }

  /** q17: correlated-average comparison (TPC-H Q17 shape) — lines whose
    * quantity is below 20% of their part's average. The correlated
    * subquery is decorrelated by hand into a per-part aggregate joined
    * back on partkey; the per-part average uses exact integer sums so
    * the 0.2*avg threshold is bit-identical across engines.
    */
  def q17AvgCompare(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val brandParts = t.part.filter(col("p_brand") === "Brand#23").select("p_partkey")
    // prune lineitem to the brand's parts BEFORE the per-part aggregate:
    // the semi-filter cuts the aggregate's input (and its shuffle) ~25×
    // — aggregating quantity stats for parts no one asks about is pure
    // waste at 100 TB. No forced hint: brandParts is a fixed fraction
    // of part (which grows with SF); AQE broadcasts it while it fits
    val brandLines = t.lineitem
      .join(brandParts, col("l_partkey") === col("p_partkey"))
    val partAvg = brandLines.groupBy(col("l_partkey").as("ap_partkey"))
      .agg(intAvg(col("l_quantity")).as("avg_qty"))
    // no broadcast hint on partAvg: it is small after the brand filter
    // at bench scale (AQE re-plans it to broadcast at runtime), but a
    // forced hint would OOM the driver at 1000× part counts
    brandLines
      .join(partAvg, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((decSum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  /** q18: HAVING-subquery + join-back (TPC-H Q18 shape) — large orders
    * with their customers.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val big = t.lineitem.groupBy("l_orderkey")
      .agg(lsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 150)
    t.orders
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(t.customer, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** q19: OR-of-ANDs predicate bundles over a part⋈lineitem join
    * (TPC-H Q19 shape). The disjunction stays declarative so Catalyst
    * can extract the common p_brand IN (...) / quantity range filters
    * for pushdown.
    */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#15" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(revenueSum.as("revenue"), count(lit(1)).as("n_lines"))
  }

  /** q20: IN-subquery as a broadcast left-semi join. */
  def q20InSubquery(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val picked = t.nation.filter(col("n_name").like("NATION_1%")).select("n_nationkey")
    t.supplier
      .join(broadcast(picked), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  /** q21: string function pipeline (all codegen'd builtins). */
  def q21StringFuncs(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.part
      .filter(col("p_name").like("%a%"))
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        substring(col("p_name"), 1, 12).as("name_pfx"),
        translate(col("p_type"), " ", "_").as("type_tag"),
        length(col("p_name")).cast(LongType).as("name_len"))
      .orderBy("p_partkey")
  }

  /** q22: regexp extraction over JSON-ish props (RE2-portable pattern),
    * null-safe numeric cast.
    */
  def q22RegexExtract(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .select(col("event_id"),
        regexp_extract(col("props"), "([0-9]+)", 1).as("kstr"))
      .select(col("event_id"), expr("try_cast(kstr AS BIGINT)").as("k_val"))
      .orderBy("event_id")
  }

  /** q23: time-bucketed aggregation (hourly counts + exact value sums).
    * The bucket is emitted as a string so both engines serialize the
    * NTZ timestamp identically.
    */
  def q23EventsWindow(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(date_trunc("hour", col("ts")).cast("string").as("hour_ts"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("sum_value"))
      .orderBy("hour_ts", "event_type")
  }

  /** Gap-based sessionization prelude shared by q24 and q47 (ONE
    * definition of a "session", so the gap or tie-break can never
    * silently diverge between session counts and session paths): each
    * event gets its new-session flag and running session ordinal,
    * 30-minute inactivity gap, (ts, event_id) tie-break. One shuffle
    * on user_id; consumers that drop `sess_id` get it pruned from the
    * window by Catalyst.
    */
  private def sessionized(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          expr("ts - prev_ts > INTERVAL '30' MINUTE"), 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** q24: gap-based sessionization in batch — per-user session counts
    * over the shared [[sessionized]] prelude.
    */
  def q24Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    sessionized(t.events)
      .groupBy("user_id")
      .agg(sum(col("new_sess")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** q25: CDC "latest row per key" (upsert/merge read-side semantics;
    * also the table form of the incremental-sync planner f03).
    */
  def q25UpsertLatest(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    t.events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value")
      .orderBy("user_id")
  }

  /** q26: CUBE over (event_type, day-of-month) with 'ALL'/-1 subtotal
    * labels (group columns non-null, same COALESCE convention as q10).
    */
  def q26Cube(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .select(col("event_type"), dayofmonth(col("ts")).as("day_of_month"), col("value"))
      .cube("event_type", "day_of_month")
      .agg(count(lit(1)).as("n"), decSum(col("value")).as("sum_value"))
      .select(
        coalesce(col("event_type"), lit("ALL")).as("etype"),
        coalesce(col("day_of_month"), lit(-1)).as("dom"),
        col("n"), col("sum_value"))
      .orderBy("etype", "dom")
  }

  /** q31: window-function breadth — lag/lead, dense_rank, running sum,
    * per-partition share — over each customer's order history. All in
    * one window pass (single shuffle on the partition key).
    */
  def q31WindowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderkey"))
    val wAll = Window.partitionBy("o_custkey")
    t.orders
      .filter(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("price_rank",
        dense_rank().over(wAll.orderBy(col("o_totalprice").desc)).cast(LongType))
      .withColumn("running_spend",
        sum(dec(col("o_totalprice"))).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q32: explicit GROUPING SETS with grouping_id — finer control than
    * rollup/cube (only the requested combinations are expanded).
    */
  def q32GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem.createOrReplaceTempView("g32_lineitem")
    spark.sql(
      """SELECT COALESCE(l_returnflag, '*') AS rf,
        |       COALESCE(l_linestatus, '*') AS ls,
        |       CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM g32_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), ())
        |ORDER BY gid, rf, ls""".stripMargin)
  }

  /** q33: "supplier kept everyone waiting" (TPC-H Q21 shape) — late
    * lines in multi-supplier orders where this supplier was the ONLY
    * late one. The correlated EXISTS / NOT EXISTS pair decorrelates
    * into per-order distinct-supplier counts computed as WINDOW
    * aggregates over the orderkey partitioning the join already
    * established — the fact⋈fact intermediate is built and shuffled
    * ONCE (vs the join-back formulation's second full lineitem⋈orders
    * pass), and the window adds no exchange because its partition key
    * matches the join key.
    */
  def q33MultiExists(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val lo = t.lineitem
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(t.orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
    val w = Window.partitionBy("l_orderkey")
    lo
      .withColumn("n_supp", size(collect_set(col("l_suppkey")).over(w)))
      .withColumn("n_late_supp",
        size(collect_set(when(col("late"), col("l_suppkey"))).over(w)))
      .filter(col("late") && col("n_supp") >= 2 && col("n_late_supp") === 1)
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** q34: JSON path extraction from the events props column (proper
    * JSON semantics, vs q22's regex fallback). Codegen'd
    * get_json_object; no UDF, no parse-per-field repetition.
    */
  def q34JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k_val"))
      .orderBy("event_id")
  }

  /** q35: pivot — per-returnflag quantity totals spread across
    * linestatus columns. Explicit pivot values keep the plan static
    * (no extra distinct-scan job) — required practice at scale.
    */
  def q35Pivot(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(lsum(col("l_quantity")))
      .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o"))
      .orderBy("l_returnflag")
  }

  /** q36: unpivot/melt — wide part attributes to long (attr, val) rows. */
  def q36Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.part
      .select(col("p_partkey"),
        col("p_retailprice").cast(DoubleType).as("retailprice"),
        col("p_size").cast(DoubleType).as("size"))
      .unpivot(Array(col("p_partkey")),
        Array(col("retailprice"), col("size")), "attr", "val")
      .orderBy("p_partkey", "attr")
  }

  /** q27: exact percentiles over integral quantities — interpolation on
    * integer order statistics at quarter fractions is fp-exact, so the
    * result is bit-identical across engines with no rounding.
    */
  def q27Percentile(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"))
      .orderBy("l_returnflag")
  }

  /** q39: two-nation volume shipping (TPC-H Q7 shape) — revenue
    * flowing between a nation pair, by supplier nation, customer
    * nation, and ship year. The nation filter lands on BOTH dimension
    * sides before the fact joins (each side pre-restricted to the two
    * nations, the pair condition applied after), so the fact shuffle
    * carries only the two nations' commerce. Hints only on the
    * fixed-25-row nation filters; the supplier/customer mappings grow
    * with SF, so their joins are AQE's call.
    */
  def q39VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val pair = Seq("NATION_1", "NATION_2")
    val suppNation = t.supplier
      .join(broadcast(t.nation.filter(col("n_name").isin(pair: _*))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custNation = t.customer
      .join(broadcast(t.nation.filter(col("n_name").isin(pair: _*))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    t.lineitem
      .filter(year(col("l_shipdate")).between(1996, 1997))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .join(t.orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(custNation, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast(LongType).as("l_year"))
      .agg(revenueSum.as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** q40: market share (TPC-H Q8 shape) — the target nation's share of
    * revenue among ASIA-region customers for one part type, by order
    * year. ONE pass: numerator and denominator are conditional
    * fixed-point sums in the same aggregate (decimal addition is
    * order-independent, so the conditional sum is exact), so the
    * 7-way join tree is built and shuffled once. Hints only on
    * nation/region; the customer/supplier/part derivations all scale
    * with SF and are left to AQE.
    */
  def q40MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val asiaCust = t.customer
      .join(broadcast(t.nation.join(
          broadcast(t.region.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val suppNation = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val base = t.lineitem
      .join(t.part.filter(col("p_type") === "ECONOMY")
        .select("p_partkey"), col("l_partkey") === col("p_partkey"))
      .join(t.orders.filter(year(col("o_orderdate")).between(1996, 1997))
        .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .withColumn("o_year", year(col("o_orderdate")).cast(LongType))
    base.groupBy("o_year")
      .agg(
        // null-else conditional sum: SUM skips nulls, stays decimal
        sum(when(col("supp_nation") === "NATION_2", revenueExpr))
          .cast(DoubleType).as("nation_rev"),
        revenueSum.as("total_rev"))
      .select(col("o_year"),
        round(coalesce(col("nation_rev"), lit(0.0)) / col("total_rev"), 6)
          .as("mkt_share"))
      .orderBy("o_year")
  }

  /** q41: funnel analysis — how deep each user gets through
    * view → click → purchase, where each stage must occur AT OR AFTER
    * the user's first completion of the previous stage. Three
    * per-stage min-timestamp aggregates chained by user_id joins (the
    * per-type filters prune each scan to one event type before its
    * shuffle); the output is the reached depth only — timestamps stay
    * internal per the determinism rules.
    */
  def q41Funnel(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def stageMin(typ: String, after: Option[DataFrame]): DataFrame = {
      val base = t.events.filter(col("event_type") === typ)
        .select(col("user_id").as("u"), col("ts"))
      val gated = after match {
        case Some(prev) => base.join(prev, col("u") === col("pu"))
          .filter(col("ts") >= col("pt")).select(col("u"), col("ts"))
        case None => base
      }
      gated.groupBy(col("u").as("pu")).agg(min(col("ts")).as("pt"))
    }
    val s1 = stageMin("view", None)
    val s2 = stageMin("click", Some(s1))
    val s3 = stageMin("purchase", Some(s2))
    s1.select(col("pu").as("user_id"))
      .join(s2.select(col("pu").as("u2"), lit(1L).as("hit2")),
        col("user_id") === col("u2"), "left")
      .join(s3.select(col("pu").as("u3"), lit(1L).as("hit3")),
        col("user_id") === col("u3"), "left")
      .select(col("user_id"),
        (lit(1L) + coalesce(col("hit2"), lit(0L)) +
          coalesce(col("hit3"), lit(0L))).as("funnel_stage"))
      .orderBy("user_id")
  }

  /** q43: purchase cadence — for each repeat purchaser, the mean days
    * between first and last purchase per interval. All-integer inputs
    * (day diff, counts) into one double division keep the result
    * bit-deterministic; one aggregate shuffle on user_id.
    */
  def q43PurchaseCadence(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events.filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_purchases"),
        min(to_date(col("ts"))).as("first_d"),
        max(to_date(col("ts"))).as("last_d"))
      .filter(col("n_purchases") >= 2)
      .select(col("user_id"), col("n_purchases"),
        round(datediff(col("last_d"), col("first_d")).cast(DoubleType) /
          (col("n_purchases") - 1), 4).as("avg_gap_days"))
      .orderBy("user_id")
  }

  /** q42: cohort retention — users grouped by their first-activity
    * date (the cohort), counted distinct in each subsequent week-offset
    * bucket. Offsets are pure day arithmetic (datediff / 7) rather
    * than calendar week truncation, so both engines bucket identically
    * with no week-start semantics in play. Two shuffles: the per-user
    * first-date aggregate, then the (cohort, offset) distinct count.
    */
  def q42Retention(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val firstDay = t.events
      .groupBy(col("user_id").as("fu"))
      .agg(min(to_date(col("ts"))).as("cohort_date"))
    t.events
      .select(col("user_id"), to_date(col("ts")).as("event_date"))
      .join(firstDay, col("user_id") === col("fu"))
      .groupBy(col("cohort_date").cast("string").as("cohort"),
        (datediff(col("event_date"), col("cohort_date")) / 7)
          .cast(LongType).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy("cohort", "week_offset")
  }

  /** q38: incremental aggregate maintenance end-to-end — split events
    * into a "base" and a "delta" stream, aggregate each independently,
    * and merge the partials with [[Merge.refreshAgg]]. The oracle
    * aggregates the full table directly, so the hash compare IS the
    * materialized-view refresh correctness proof: merged partials must
    * equal the full recompute exactly (decimal partial sums make the
    * merge order-independent).
    */
  def q38IncrAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def partial(df: DataFrame): DataFrame = df.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(dec(col("value"))).as("sum_value_dec"))
    val base = partial(t.events.filter(pmod(col("event_id"), lit(4)) =!= 0))
    val delta = partial(t.events.filter(pmod(col("event_id"), lit(4)) === 0))
    Merge.refreshAgg(base, delta, "user_id", Seq("n_events", "sum_value_dec"))
      .select(col("user_id"), col("n_events"),
        col("sum_value_dec").cast(DoubleType).as("sum_value"))
      .orderBy("user_id")
  }

  /** q44: "rich customers with no orders" (TPC-H Q22 shape) —
    * customers in a nation subset whose balance exceeds the average
    * POSITIVE balance of that subset and who placed no orders, rolled
    * up per nation. The scalar "avg" subquery is decorrelated into a
    * 1-row (sum, count) aggregate, and the threshold compare is
    * cross-multiplied (c·n > S ⟺ c > S/n for n > 0) so no division
    * ever happens — the compare is exact decimal arithmetic, bit-
    * identical in any engine and partition order. The 1-row threshold
    * side keeps its broadcast hint (a grouping-free aggregate is
    * bounded at ANY scale — the one inequality join is a 1×N
    * nested-loop, which is why q44 sits in PlanSpec's NLJ allowlist);
    * the anti-join probes orders once. Q22's "no orders at all" is
    * vacuously empty in this data (every customer orders — the q14
    * lesson), so the anti-join targets very-large orders instead.
    */
  def q44NoOrderRich(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val pool = t.customer.filter(col("c_nationkey") < 13)
    val thr = pool.filter(col("c_acctbal") > 0.0)
      .agg(sum(dec(col("c_acctbal"))).as("s"), count(lit(1)).as("n"))
    pool
      .crossJoin(broadcast(thr))
      .filter(dec(col("c_acctbal")) * col("n") > col("s"))
      .join(t.orders.filter(col("o_totalprice") > 400000).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast(LongType).as("nation"))
      .agg(count(lit(1)).as("n_cust"), decSum(col("c_acctbal")).as("total_bal"))
      .orderBy("nation")
  }

  /** q45: time-series gap-fill / daily resample — each user's event
    * history projected onto a dense daily grid between their first and
    * last activity, with zero-filled gaps and a running event total.
    * The grid generates WITH the data (per-user `sequence` over the
    * date span, exploded) — no calendar table to join, no driver
    * involvement, and the row expansion is bounded by span × users.
    * Three user-keyed shuffles (daily agg, span agg + grid join,
    * running window) and the window's partition key matches the join
    * key, so no extra exchange. Day is emitted as an ISO string (sorts
    * identically to the date), daily money through the fixed-point
    * helpers.
    */
  /** Dense per-user daily grid between each user's first and last day
    * in `perDay` (must carry `user_id` and a date column `d`) — the
    * resample skeleton shared by q45 and q46, so the pair can never
    * disagree on which days exist.
    */
  private def denseDailyGrid(perDay: DataFrame): DataFrame =
    perDay
      .groupBy("user_id")
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("d"))

  def q45GapFill(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val daily = t.events
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("v"))
    val grid = denseDailyGrid(daily)
    val w = Window.partitionBy("user_id").orderBy("d")
    grid.join(daily, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        coalesce(col("v").cast(DoubleType), lit(0.0)).as("day_value"))
      .withColumn("cum_events", sum(col("n_events")).over(w))
      .select(col("user_id"), col("d").cast("string").as("day"),
        col("n_events"), col("day_value"), col("cum_events"))
      .orderBy("user_id", "day")
  }

  /** q46: forward-fill / LOCF resample — q45's dense daily grid, but
    * carrying the last observation forward across gap days (the other
    * canonical resample semantic; what makes event streams joinable
    * with daily panels). Per active day the carried observation is the
    * day's LAST event, picked deterministically by (ts, event_id); the
    * fill is one `last(ignoreNulls)` running window per user — and
    * because the grid starts at each user's first active day, the
    * carried columns are never null. Same shuffle budget as q45.
    */
  def q46ForwardFill(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w1 = Window.partitionBy("user_id", "d")
      .orderBy(col("ts").desc, col("event_id").desc)
    val lastPerDay = t.events
      .withColumn("d", to_date(col("ts")))
      .withColumn("rn", row_number().over(w1))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("d"),
        col("event_type").as("et"), col("event_id").as("eid"))
    val grid = denseDailyGrid(lastPerDay)
    val w2 = Window.partitionBy("user_id").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastPerDay, Seq("user_id", "d"), "left")
      .select(col("user_id"), col("d").cast("string").as("day"),
        last(col("et"), ignoreNulls = true).over(w2).as("carried_type"),
        last(col("eid"), ignoreNulls = true).over(w2).as("carried_event_id"))
      .orderBy("user_id", "day")
  }

  /** q47: session-path mining — the behavioral-sequence primitive on
    * top of q24's sessionization: each gap-bounded session becomes its
    * ordered event-type path ("view->click->purchase"), counted
    * corpus-wide, top-k. Order inside a session is made deterministic
    * by sorting collected (ts, event_id, type) structs — collect_list
    * alone guarantees NO order — and the per-session arrays are
    * bounded by session length, so the HOF extract stays off the
    * per-row hot path. Shuffles: the sessionize window, the per-
    * session path agg (same user key), one tiny path-count agg;
    * top-k is TakeOrdered, never a global sort.
    */
  def q47SessionPaths(spark: SparkSession, dir: String,
      k: Int = 20): DataFrame = {
    val t = Tables(spark, dir)
    sessionized(t.events)
      .groupBy("user_id", "sess_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))),
          x => x.getField("event_type")), "->").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** q48: session transition matrix — the Markov-chain view of q47's
    * paths: within-session adjacent event-type transitions counted
    * corpus-wide, with each (from → to) edge's exact conditional
    * probability. Rides the SAME per-user window the sessionize
    * prelude already established (lead of type + lead of new_sess
    * flag, so a transition never crosses a session boundary) — no
    * second shuffle on (user, session); the transition aggregation
    * shuffles only |event_type|² rows. The probability is one exact
    * integer division rounded once, so the oracle replays it
    * bit-identically.
    */
  /** q49: promo revenue share (TPC-H Q14 shape) — the fraction of one
    * quarter's revenue earned by promo-type parts. One lineitem⋈part
    * join shuffled once; numerator and denominator are conditional
    * fixed-point sums in the SAME aggregate (q40's one-pass
    * discipline), so the answer is a single once-rounded division of
    * two exact decimals. The date filter reaches the scan.
    */
  def q49PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .filter(col("l_shipdate") >= "1996-01-01" &&
        col("l_shipdate") < "1996-04-01")
      .join(t.part.select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", revenueExpr))
          .cast(DoubleType).as("promo_rev"),
        revenueSum.as("total_rev"))
      .select(
        round(lit(100.0) * coalesce(col("promo_rev"), lit(0.0)) /
          col("total_rev"), 6).as("promo_share"),
        coalesce(col("promo_rev"), lit(0.0)).as("promo_rev"),
        col("total_rev"))
  }

  /** q50: revenue concentration (TPC-H Q11 shape, adapted — the
    * testdata carries no partsupp): parts earning more than
    * `numer`/`denom` times the AVERAGE per-part revenue. The
    * average-relative threshold is SCALE-INVARIANT (per-part lineitem
    * count is constant across SFs, so a fixed global-share threshold
    * empties at scale), and the group-vs-global compare is
    * CROSS-MULTIPLIED in decimal (q44's discipline — no division, no
    * float fold): part_rev · n_parts · denom > tot_rev · numer, with
    * DECIMAL(27,4) casts keeping every product inside DECIMAL(38) in
    * both engines. The 1-row global aggregate broadcasts; the per-part
    * rollup shuffles once.
    */
  def q50RevenueConcentration(spark: SparkSession, dir: String,
      numer: Int = 13, denom: Int = 10): DataFrame = {
    val t = Tables(spark, dir)
    // per-part revenue is SF-invariant (~constant lineitems/part), so
    // DECIMAL(19,4) holds it at any scale; np_x = n_parts·denom GROWS
    // with SF — DECIMAL(18,0) (an int would wrap near SF ~1000) keeps
    // the cross-multiply at precision 19+18+1 = 38 exactly, no clamp,
    // in Spark and DuckDB alike
    val perPart = t.lineitem.groupBy("l_partkey")
      .agg(sum(revenueExpr).cast("decimal(19,4)").as("part_rev"))
    val total = t.lineitem.agg(
      sum(revenueExpr).cast("decimal(27,4)").as("tot_rev"),
      (countDistinct(col("l_partkey")) * denom).cast("decimal(18,0)")
        .as("np_x"))
    perPart
      .join(broadcast(total),
        col("part_rev") * col("np_x") > col("tot_rev") * lit(numer))
      .select(col("l_partkey"),
        col("part_rev").cast(DoubleType).as("part_rev"))
      .orderBy(col("part_rev").desc, col("l_partkey"))
  }

  /** q51: product profit by nation and year (TPC-H Q9 shape, adapted —
    * the testdata has no partsupp, so cost is p_retailprice·quantity):
    * profit = Σ(revenue − cost) as ONE fixed-point conditional sum per
    * (nation, year) group, every term decimal-exact. The part-name
    * filter prunes the part side before its join; only the fixed
    * 25-row nation dim is hint-broadcast.
    */
  def q51ProductProfit(spark: SparkSession, dir: String,
      namePart: String = "widget"): DataFrame = {
    val t = Tables(spark, dir)
    val suppNation = t.supplier
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    t.lineitem
      .join(t.part.filter(col("p_name").contains(namePart))
        .select("p_partkey", "p_retailprice"),
        col("l_partkey") === col("p_partkey"))
      .join(t.orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"),
        year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg(sum(revenueExpr -
          dec(col("p_retailprice")) * dec(col("l_quantity")))
        .cast(DoubleType).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** q52: returned-item revenue report (TPC-H Q10 shape): customers
    * who returned items in one quarter, ranked by lost revenue. The
    * returnflag filter prunes lineitem at the scan; the quarter
    * restriction prunes orders before the join; customers join by key
    * (AQE's call — the derivation scales with SF); top-20 rides
    * TakeOrderedAndProject on the (revenue, custkey) total order, not
    * a global sort.
    */
  def q52ReturnedItems(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem.filter(col("l_returnflag") === "R")
      .join(t.orders
        .filter(col("o_orderdate") >= "1996-01-01" &&
          col("o_orderdate") < "1996-04-01")
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select("c_custkey", "c_name", "c_acctbal",
        "c_nationkey"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(revenueSum.as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** q53: exact revenue-decile report — per-customer lifetime spend,
    * every customer ranked globally, cut into 10 equal-population
    * deciles, per-decile population/revenue/rank-span. The global rank
    * is c09's DISTRIBUTED prefix-sum, not `Window.orderBy` with no
    * partition key (the canonical single-task scale-killer): range-
    * partition on the (spend desc, custkey) total order, per-partition
    * row_numbers run in parallel, and only the per-partition COUNTS
    * (≤ shuffle-partition rows) ride a single-task prefix window
    * before AQE broadcasts them back. Rank/decile arithmetic is exact
    * integer `div`; money rides DECIMAL fixed-point end to end, so
    * the report is bit-stable at any partitioning and any SF.
    */
  def q53RevenueDeciles(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val nParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val rev = t.orders.groupBy("o_custkey")
      .agg(sum(dec(col("o_totalprice"))).as("cust_rev"))
    // range partitions follow the global sort order, so partition id
    // order == rank order; localCheckpoint materializes the slim rows
    // once for both consumers (c09's discipline — and the
    // nondeterministic-flagged partition id is evaluated exactly once)
    val ranged = rev
      .repartitionByRange(nParts, col("cust_rev").desc, col("o_custkey"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(false)
    val wLocal = Window.partitionBy("_pid")
      .orderBy(col("cust_rev").desc, col("o_custkey"))
    val local = ranged
      .withColumn("_r_local", row_number().over(wLocal).cast(LongType))
    val wPrefix = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTotal = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // ≤ nParts rows by construction; no broadcast hint — the lineage
    // reaches orders, so the hint sweep can't prove the cap and AQE's
    // runtime size check broadcasts it anyway
    val offsets = ranged.groupBy("_pid").agg(count(lit(1)).as("_pc"))
      .withColumn("_poff", coalesce(sum(col("_pc")).over(wPrefix), lit(0L)))
      .withColumn("_n", sum(col("_pc")).over(wTotal))
      .select("_pid", "_poff", "_n")
    local.join(offsets, Seq("_pid"))
      .withColumn("rnk", col("_poff") + col("_r_local"))
      .withColumn("decile", expr("((rnk - 1) * 10) div _n") + lit(1L))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cust_rev")).cast(DoubleType).as("decile_revenue"),
        min(col("rnk")).as("rank_lo"), max(col("rnk")).as("rank_hi"))
      .orderBy("decile")
  }

  def q48MarkovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wFrom = Window.partitionBy("from_type")
    sessionized(t.events)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .withColumn("next_new", lead(col("new_sess"), 1).over(w))
      .filter(col("next_type").isNotNull && col("next_new") === 0)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
      .withColumn("p",
        round(col("n_trans").cast(DoubleType) / sum(col("n_trans")).over(wFrom), 4))
      .orderBy("from_type", "to_type")
  }

  /** q37: rolling time-range window — each event's trailing-hour count
    * and value sum for its user, via RANGE BETWEEN on event-time
    * seconds. RANGE (not ROWS) frames make timestamp peers aggregate
    * together, so results are independent of any within-timestamp
    * ordering; the fixed-point sum keeps the frame total independent
    * of evaluation order. One shuffle on user_id, frames evaluated by
    * a single running pass per partition.
    */
  /** q54: SCD type-2 dimension history — the standard warehouse
    * pattern for tracking attribute changes over time (Kimball):
    * per user, consecutive events with the same `event_type` collapse
    * into one versioned state row with [effective_from, effective_to)
    * validity and an is_current flag on the open row. Deterministic
    * (ts, event_id) ordering; timestamps emitted as epoch
    * microseconds (the session is UTC-pinned, so the NTZ wall clock
    * IS the epoch both engines see).
    *
    * Scale: ONE shuffle on the entity key — both window passes (the
    * change-detection lag and the version/lead pass) share the same
    * partitioning and sort, so Catalyst plans a single exchange; per-
    * entity history is processed as one sorted run, never collected.
    */
  def q54Scd2(spark: SparkSession, dir: String): DataFrame =
    scd2Over(Tables(spark, dir).events)

  /** q54 over any events-shaped frame (user_id, ts, event_id,
    * event_type) — spec + pipeline reuse.
    */
  def scd2Over(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("version", row_number().over(w).cast(LongType))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("version"),
        col("event_type").as("state"),
        unix_micros(col("ts").cast("timestamp")).as("effective_from"),
        unix_micros(col("next_ts").cast("timestamp")).as("effective_to"),
        col("next_ts").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  def q37RollingWindow(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // NTZ → timestamp → epoch seconds; the session is UTC-pinned, so
    // the NTZ wall-clock IS the epoch both engines see
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").cast("timestamp").cast(LongType))
      .rangeBetween(-3599, Window.currentRow)
    t.events
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_trailing_hour"),
        sum(dec(col("value"))).over(w).cast(DoubleType)
          .as("sum_trailing_hour"))
      .orderBy("event_id")
  }

  /** q55: hierarchy flattening — resolve every node of a parent tree
    * to its (root, depth), the BOM-explosion / org-chart / category-
    * tree warehouse staple Spark has no recursive CTE for. The demo
    * tree is closed-form in doc_id (parent = id div 2; ids 0 and 1
    * are roots), so the DuckDB oracle replays the WALK itself as a
    * recursive CTE — a differential check of the iteration, not of a
    * formula.
    *
    * Scale: POINTER DOUBLING, not per-level walking — each round
    * composes the current ancestor jump with itself (anc ← anc(anc),
    * depths add), so a depth-d tree converges in ⌈log₂ d⌉ keyed
    * equi-joins (d07's contraction discipline: states checkpointed
    * per round, convergence = no non-root ancestor remains, checked
    * with a limit(1) existence probe — never a full count).
    */
  def q55TreeFlatten(spark: SparkSession, dir: String): DataFrame = {
    val ids = Tables(spark, dir).documents.select(col("doc_id").as("id"))
    var state = ids.select(col("id"),
      when(col("id") < 2, col("id")).otherwise(expr("id div 2")).as("anc"),
      when(col("id") < 2, lit(0L)).otherwise(lit(1L)).as("depth"))
      .localCheckpoint(false)
    // referential integrity, checked ONCE and loudly: the state join
    // drops a row whose ancestor id is absent — with integrity at
    // round 0 every composed ancestor is present inductively, without
    // it the result would be silently incomplete (an orphaned parent
    // reference is data corruption, not a tree)
    require(state.select(col("anc")).filter(col("anc") >= 2)
      .except(ids).limit(1).count() == 0L,
      "q55: parent chain references ids absent from the table")
    // size-adaptive broadcast of the jump side (g01 pageRankOver's
    // dial, guide §3.1): the state is one slim row per node and is
    // checkpointed every round, so the static planner sees an RDD
    // with no size stats and plans SMJ — paying both exchanges before
    // AQE downgrades. When the measured node count provably fits a
    // broadcast, hint it; above the bound nothing changes. Profiled
    // at sf0.1: 27 -> 23 jobs, 43 -> 31 stages, wall ~2.4 -> ~1.8 s.
    val smallState = ids.count() <= 4000000L
    def jumpSide(df: DataFrame): DataFrame =
      if (smallState) broadcast(df) else df
    var converged =
      state.filter(col("anc") >= 2).limit(1).count() == 0L
    var rounds = 0
    while (!converged) {
      rounds += 1
      // doubling halves remaining depth per round: 40 rounds covers
      // depth 2^40 — only a parent CYCLE can exhaust this (d07's cap
      // discipline: loud, never an infinite loop)
      require(rounds <= 40, "q55: no convergence after 40 doublings — cycle?")
      state = state.as("a")
        .join(jumpSide(state.select(col("id").as("j_id"),
          col("anc").as("j_anc"), col("depth").as("j_depth")).as("b")),
          col("a.anc") === col("b.j_id"))
        .select(col("a.id"), col("j_anc").as("anc"),
          (col("a.depth") + col("j_depth")).as("depth"))
        .localCheckpoint(false)
      converged = state.filter(col("anc") >= 2).limit(1).count() == 0L
    }
    state
      .select(col("id").as("doc_id"), col("anc").as("root_id"),
        col("depth"))
      .orderBy("doc_id")
  }
}
