package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface parity sweep: every B-family relational query runs as
  * PLAIN SQL TEXT over [[GraftCatalog.register]]'s views and produces
  * value-identical results to its DataFrame form. The texts are the
  * DuckDB oracle queries where those are ANSI enough for Spark's
  * parser; queries whose oracle leans on DuckDB dialect get a
  * Spark-SQL twin here (the parity claim is about the ENGINE's SQL
  * surface, not the oracle's dialect).
  *
  * Equality is the driver's discipline: columns aligned by sorted
  * name, rows compared as a sorted multiset of string-normalized
  * values (exact — no tolerance).
  */
class SqlParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private def num(name: String): Int = name.drop(1).take(2).toInt
  private val bFamily = SparkEntry.queries.keys
    .filter(n => n.matches("q\\d\\d_.*") &&
      (num(n) <= 27 || num(n) >= 31)).toSeq.sorted

  /** The one mechanical dialect bridge applied to every text: DuckDB's
    * decimal→double VARCHAR route spells Spark's STRING.
    */
  private def toSparkSql(text: String): String =
    text.replace("AS VARCHAR)", "AS STRING)")

  /** Spark-SQL texts for queries whose oracle text leans on DuckDB
    * constructs Spark doesn't parse (quantile_cont, multi-arg
    * GROUPING, `->>`, date_diff('day',..), `IGNORE NULLS` inside the
    * call, generate_series+unnest, order-qualified string_agg, `//`).
    */
  private val sparkSqlOverride: Map[String, String] = Map(
    // Spark spells integer division `div`, DuckDB `//` — otherwise
    // the recursive walk is the same ANSI text on both engines
    "q55_tree_flatten" ->
      """WITH RECURSIVE walk(id, anc, depth) AS (
        |  SELECT doc_id, doc_id, CAST(0 AS BIGINT) FROM documents
        |  UNION ALL
        |  SELECT id, anc div 2, depth + 1 FROM walk WHERE anc >= 2)
        |SELECT id AS doc_id, CAST(anc AS BIGINT) AS root_id, depth
        |FROM walk WHERE anc < 2
        |ORDER BY doc_id""".stripMargin,

    "q27_percentile" ->
      """SELECT l_returnflag,
        |       percentile(l_quantity, 0.25) AS p25,
        |       percentile(l_quantity, 0.5) AS p50,
        |       percentile(l_quantity, 0.75) AS p75,
        |       MIN(l_quantity) AS min_qty,
        |       MAX(l_quantity) AS max_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q32_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, '*') AS rf,
        |       COALESCE(l_linestatus, '*') AS ls,
        |       CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (l_returnflag), ())
        |ORDER BY gid, rf, ls""".stripMargin,

    "q34_json_extract" ->
      """SELECT event_id,
        |       CAST(get_json_object(props, '$.k') AS BIGINT) AS k_val
        |FROM events
        |ORDER BY event_id""".stripMargin,

    // Spark spells DuckDB's epoch_us as unix_micros over an NTZ→TZ
    // cast (UTC-pinned session, so the epochs agree)
    "q54_scd2" ->
      """WITH ordered AS (SELECT user_id, ts, event_id, event_type,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |chg AS (SELECT user_id, ts, event_id, event_type FROM ordered
        |        WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id
        |       ORDER BY ts, event_id) AS BIGINT) AS version,
        |  event_type AS state,
        |  unix_micros(CAST(ts AS TIMESTAMP)) AS effective_from,
        |  unix_micros(CAST(LEAD(ts) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS TIMESTAMP)) AS effective_to,
        |  (LEAD(ts) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id) IS NULL) AS is_current
        |FROM chg
        |ORDER BY user_id, version""".stripMargin,

    "q37_rolling_window" ->
      """SELECT event_id, user_id,
        |  COUNT(*) OVER w AS n_trailing_hour,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS STRING)
        |       AS DOUBLE) AS sum_trailing_hour
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |             ORDER BY CAST(CAST(ts AS TIMESTAMP) AS BIGINT)
        |             RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q45_gap_fill" ->
      """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS n,
        |                      SUM(CAST(value AS DECIMAL(18,4))) AS v
        |               FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, min(d) AS d0, max(d) AS d1
        |         FROM daily GROUP BY 1),
        |grid AS (SELECT user_id,
        |           explode(sequence(d0, d1, interval 1 day)) AS d
        |         FROM span)
        |SELECT grid.user_id, CAST(d AS STRING) AS day,
        |  COALESCE(n, 0) AS n_events,
        |  COALESCE(CAST(CAST(v AS STRING) AS DOUBLE), 0.0) AS day_value,
        |  CAST(SUM(COALESCE(n, 0)) OVER (PARTITION BY grid.user_id ORDER BY d)
        |       AS BIGINT) AS cum_events
        |FROM grid LEFT JOIN daily USING (user_id, d)
        |ORDER BY 1, 2""".stripMargin,

    "q42_retention" ->
      """WITH fd AS (
        |  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_date
        |  FROM events GROUP BY user_id)
        |SELECT CAST(cohort_date AS STRING) AS cohort,
        |  CAST(floor(datediff(CAST(e.ts AS DATE), cohort_date) / 7)
        |       AS BIGINT) AS week_offset,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
        |FROM events e JOIN fd ON e.user_id = fd.user_id
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q43_purchase_cadence" ->
      """SELECT user_id, COUNT(*) AS n_purchases,
        |  round(CAST(datediff(MAX(CAST(ts AS DATE)),
        |    MIN(CAST(ts AS DATE))) AS DOUBLE) / (COUNT(*) - 1), 4)
        |    AS avg_gap_days
        |FROM events
        |WHERE event_type = 'purchase'
        |GROUP BY user_id
        |HAVING COUNT(*) >= 2
        |ORDER BY user_id""".stripMargin,

    "q46_forward_fill" ->
      """WITH ranked AS (SELECT user_id, CAST(ts AS DATE) AS d, event_type,
        |                       event_id,
        |                       ROW_NUMBER() OVER (
        |                         PARTITION BY user_id, CAST(ts AS DATE)
        |                         ORDER BY ts DESC, event_id DESC) AS rn
        |                FROM events),
        |lastday AS (SELECT user_id, d, event_type AS et, event_id AS eid
        |            FROM ranked WHERE rn = 1),
        |span AS (SELECT user_id, min(d) AS d0, max(d) AS d1
        |         FROM lastday GROUP BY 1),
        |grid AS (SELECT user_id,
        |           explode(sequence(d0, d1, interval 1 day)) AS d
        |         FROM span)
        |SELECT grid.user_id, CAST(d AS STRING) AS day,
        |  last_value(et) IGNORE NULLS OVER (PARTITION BY grid.user_id
        |    ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS carried_type,
        |  CAST(last_value(eid) IGNORE NULLS OVER (PARTITION BY grid.user_id
        |    ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS carried_event_id
        |FROM grid LEFT JOIN lastday USING (user_id, d)
        |ORDER BY 1, 2""".stripMargin,

    "q47_session_paths" ->
      """WITH e AS (SELECT user_id, ts, event_id, event_type,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |       THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |      FROM e),
        |p AS (SELECT user_id, sess_id,
        |        listagg(event_type, '->')
        |          WITHIN GROUP (ORDER BY ts, event_id) AS path
        |      FROM s GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions
        |FROM p GROUP BY 1
        |ORDER BY n_sessions DESC, path
        |LIMIT 20""".stripMargin,

    "q53_revenue_deciles" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS cust_rev
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT o_custkey, cust_rev,
        |    ROW_NUMBER() OVER (ORDER BY cust_rev DESC, o_custkey) AS rnk,
        |    COUNT(*) OVER () AS n
        |  FROM rev)
        |SELECT CAST((rnk - 1) * 10 div n + 1 AS BIGINT) AS decile,
        |  COUNT(*) AS n_customers,
        |  CAST(CAST(SUM(cust_rev) AS STRING) AS DOUBLE) AS decile_revenue,
        |  CAST(MIN(rnk) AS BIGINT) AS rank_lo,
        |  CAST(MAX(rnk) AS BIGINT) AS rank_hi
        |FROM ranked GROUP BY 1
        |ORDER BY decile""".stripMargin)

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toSeq
    df.selectExpr(cols.map(c => s"`$c`"): _*).collect().toSeq
      .map(r => cols.indices.map { i =>
        r.get(i) match {
          case null => "NULL"
          case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
          case d: Double => if (d == d.floor && math.abs(d) < 1e15)
            d.toLong.toString else d.toString
          case f: Float => f.toString
          case x => x.toString
        }
      })
      .sortBy(_.mkString(""))
  }

  bFamily.foreach { name =>
    test(s"sql parity: $name") {
      GraftCatalog.register(spark, dir)
      val text = toSparkSql(sparkSqlOverride.getOrElse(name, Oracles.sql(name)))
      val viaSql = canon(spark.sql(text))
      val viaDf = canon(SparkEntry.queries(name)(spark, dir))
      assert(viaSql == viaDf,
        s"$name: SQL surface diverges from the DataFrame form " +
          s"(sql ${viaSql.length} rows, df ${viaDf.length} rows)")
    }
  }
}
