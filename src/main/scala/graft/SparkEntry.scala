package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._

/** Driver contract — see SURVEY.md §7.1.
  *
  * Each entry in [[queries]] instantiates one operator (or operator cluster)
  * from SURVEY.md §2 against the driver testdata; [[oracleSql]] carries the
  * equivalent DuckDB SQL over the same parquet tables. Column names, column
  * types, and row ordering are aligned on both sides; every floating-point
  * output is rounded to 4 dp on BOTH sides (CoreOps.rnd) so accumulation-order
  * bit noise cannot flip the driver's hash compare. DuckDB `sum(BIGINT)`
  * returns HUGEINT, so integer window sums are CAST back to BIGINT in the
  * oracle SQL.
  */
object SparkEntry {

  /** Flagship query on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("weekly_agg_events")(spark, "/root/testdata/sf0.001")

  // ---- shared DuckDB CTEs: weekly → densified grid → rolling windows ----
  // Mirrors Pipeline.weeklyOrders / denseOrders / windowsOrders exactly.
  private val denseCte =
    """WITH weekly AS (
      |  SELECT date_trunc('week', o_orderdate) AS week, o_orderpriority AS dim,
      |         count(DISTINCT o_orderkey) AS transactions,
      |         CASE WHEN count(__cents) = 0 THEN NULL
      |              ELSE floor((CAST(sum(__cents) AS DOUBLE) / 100.0 / count(__cents)) * 10000 + 0.5) / 10000 END AS price_mean
      |  FROM (SELECT *, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS __cents FROM orders) o
      |  GROUP BY 1, 2),
      |bounds AS (SELECT min(week) AS wmin, max(week) AS wmax FROM weekly),
      |weeks AS (SELECT unnest(generate_series(wmin, wmax, INTERVAL 7 DAY)) AS week FROM bounds),
      |dims AS (SELECT DISTINCT dim FROM weekly WHERE dim IS NOT NULL),
      |dense AS (
      |  SELECT g.week, g.dim, coalesce(w.transactions, 0) AS transactions, w.price_mean
      |  FROM (SELECT weeks.week AS week, dims.dim AS dim FROM weeks CROSS JOIN dims) g
      |  LEFT JOIN weekly w ON g.week = w.week AND g.dim = w.dim)""".stripMargin

  private val winsCte = denseCte +
    """,
      |wins AS (
      |  SELECT week, dim, transactions,
      |         CAST(sum(transactions) OVER w4 AS BIGINT) AS rolling_trans,
      |         price_mean,
      |         floor((CAST(sum(CAST(floor(price_mean * 1000000 + 0.5) AS BIGINT)) OVER w4 AS DOUBLE) / 1000000 / count(price_mean) OVER w4) * 10000 + 0.5) / 10000 AS rolling_price_mean,
      |         4 AS window_weeks
      |  FROM dense
      |  WINDOW w4 AS (PARTITION BY dim ORDER BY week ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |  UNION ALL
      |  SELECT week, dim, transactions,
      |         CAST(sum(transactions) OVER w12 AS BIGINT) AS rolling_trans,
      |         price_mean,
      |         floor((CAST(sum(CAST(floor(price_mean * 1000000 + 0.5) AS BIGINT)) OVER w12 AS DOUBLE) / 1000000 / count(price_mean) OVER w12) * 10000 + 0.5) / 10000 AS rolling_price_mean,
      |         12 AS window_weeks
      |  FROM dense
      |  WINDOW w12 AS (PARTITION BY dim ORDER BY week ROWS BETWEEN 11 PRECEDING AND CURRENT ROW))""".stripMargin

  private val langDimSql =
    "(VALUES ('en','English'),('de','German'),('fr','French'),('es','Spanish')) l(lang_code, lang_name)"

  private def langDim(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(("en", "English"), ("de", "German"), ("fr", "French"), ("es", "Spanish"))
      .toDF("lang_code", "lang_name")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- weekly aggregation tier (P7 + A1-A5 + SO1) ----
    "weekly_agg_events" -> ((s, d) => {
      val e = Tables.events(s, d)
      WeeklyAgg.weeklyStats(e, col("ts"), col("event_type"),
        col("event_id"), col("value"))
    }),
    "weekly_agg_orders" -> ((s, d) => {
      val o = Tables.orders(s, d)
      WeeklyAgg.weeklyStats(o, col("o_orderdate"), col("o_orderpriority"),
        col("o_orderkey"), col("o_totalprice"))
    }),
    "type_breakdown" -> ((s, d) => {
      val o = Tables.orders(s, d)
      WeeklyAgg.typeBreakdown(o, col("o_orderdate"), col("o_orderpriority"),
        col("o_orderstatus"))
    }),

    // ---- cleaning / scalar tier (P3-P9, P11-P13) ----
    // P3+P5 — ANSI-safe coercing casts: junk → NULL, parseable round-trips.
    "coerce_clean" -> ((s, d) => {
      val e = Tables.events(s, d)
      e.agg(
        count(lit(1)).as("n_rows"),
        count(CoreOps.coerceDouble(col("event_type"))).as("n_junk_price"),
        count(CoreOps.coerceDouble(col("value").cast("string"))).as("n_price_ok"),
        count(CoreOps.coerceTimestamp(col("event_type"))).as("n_junk_date"),
        count(CoreOps.coerceTimestamp(col("ts").cast("string"))).as("n_date_ok"))
    }),
    // P6+P8+P9 — key/category normalization + prefix key.
    "normalize_keys" -> ((s, d) => {
      val c = Tables.customer(s, d)
      c.select(
        col("c_custkey"),
        CoreOps.normalizeKey(col("c_name")).as("key_norm"),
        CoreOps.normalizeCategory(col("c_mktsegment")).as("seg_norm"),
        CoreOps.prefixKey(CoreOps.normalizeKey(col("c_name")), 4).as("key_prefix"))
        .orderBy("c_custkey")
    }),
    // P4+A1 — synthetic ids are unique: distinct count == row count.
    "synthetic_id_distinct" -> ((s, d) => {
      val li = CoreOps.withSyntheticId(Tables.lineitem(s, d), "tid")
      li.agg(count_distinct(col("tid")).as("n_ids"))
    }),

    // ---- join tier (J1 + A10) ----
    "lookup_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      val cn = Joins.lookupJoin(c, n, c("c_nationkey") === n("n_nationkey"))
      Joins.lookupJoin(cn, r, cn("n_regionkey") === r("r_regionkey"))
        .select(col("c_custkey"), col("c_name"),
          col("n_name").as("nation"), col("r_name").as("region"))
        .orderBy("c_custkey")
    }),
    "coverage_docs" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val l = langDim(s)
      Joins.lookupJoin(docs, l, docs("lang") === l("lang_code"))
        .agg(count(lit(1)).as("n_docs"),
          Joins.coveragePct(col("lang_name")).as("coverage_pct"))
    }),
    "prefix_fallback" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val l = langDim(s)
      Joins.lookupJoin(docs, l, docs("lang") === l("lang_code"))
        .withColumn("la",
          coalesce(col("lang_name"), CoreOps.prefixKey(upper(col("lang")), 2)))
        .groupBy("la").agg(count(lit(1)).as("n"))
        .orderBy("la")
    }),

    // ---- windowed tier (J2/J3 + P12 + W1-W4 + P10/A6 + A11) ----
    "densify_orders" -> ((s, d) =>
      Pipeline.denseOrders(s, d)
        .select("week", "dim", "transactions", "price_mean")
        .orderBy("dim", "week")),
    "rolling_windows" -> ((s, d) =>
      Pipeline.windowsOrders(s, d)
        .select("week", "dim", "transactions", "rolling_trans",
          "price_mean", "rolling_price_mean", "window_weeks")
        .orderBy("window_weeks", "dim", "week")),
    "anomaly_zscore" -> ((s, d) =>
      Pipeline.anomaliesOrders(s, d)
        .select("week", "dim", "window_weeks", "transactions", "rolling_trans",
          "z_transactions", "z_rolling_trans",
          "anomaly_transactions", "anomaly_rolling_trans")
        .orderBy("window_weeks", "dim", "week")),
    "latest_snapshot" -> ((s, d) =>
      Snapshot.latestWeek(Pipeline.windowsOrders(s, d))
        .select("week", "dim", "transactions", "rolling_trans",
          "price_mean", "rolling_price_mean", "window_weeks")
        .orderBy("window_weeks", "dim")),
    "qa_summary" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .withColumn("week", CoreOps.weekStart(col("o_orderdate")))
      Joins.qaSummary(o, col("week"), col("o_orderpriority"))
    }),
    "yoy_orders" -> ((s, d) =>
      Rolling.yoy(Pipeline.denseOrders(s, d), "transactions")
        .select("week", "dim", "transactions", "prev_year", "yoy_change")
        .orderBy("dim", "week")),
  )

  def oracleSql: Map[String, String] = Map(
    "weekly_agg_events" ->
      """SELECT date_trunc('week', ts) AS week, event_type AS dim,
        |  count(DISTINCT event_id) AS transactions,
        |  CASE WHEN count(__cents) = 0 THEN NULL ELSE floor((CAST(sum(__cents) AS DOUBLE) / 100.0 / count(__cents)) * 10000 + 0.5) / 10000 END AS price_mean,
        |  floor((quantile_cont(__cents, 0.5) / 100.0) * 10000 + 0.5) / 10000 AS price_median,
        |  floor((quantile_cont(__cents, 0.10) / 100.0) * 10000 + 0.5) / 10000 AS price_p10,
        |  floor((quantile_cont(__cents, 0.90) / 100.0) * 10000 + 0.5) / 10000 AS price_p90
        |FROM (SELECT *, CAST(floor(value * 100 + 0.5) AS BIGINT) AS __cents FROM events) e
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "weekly_agg_orders" ->
      """SELECT date_trunc('week', o_orderdate) AS week, o_orderpriority AS dim,
        |  count(DISTINCT o_orderkey) AS transactions,
        |  CASE WHEN count(__cents) = 0 THEN NULL ELSE floor((CAST(sum(__cents) AS DOUBLE) / 100.0 / count(__cents)) * 10000 + 0.5) / 10000 END AS price_mean,
        |  floor((quantile_cont(__cents, 0.5) / 100.0) * 10000 + 0.5) / 10000 AS price_median,
        |  floor((quantile_cont(__cents, 0.10) / 100.0) * 10000 + 0.5) / 10000 AS price_p10,
        |  floor((quantile_cont(__cents, 0.90) / 100.0) * 10000 + 0.5) / 10000 AS price_p90
        |FROM (SELECT *, CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS __cents FROM orders) o
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "type_breakdown" ->
      """SELECT date_trunc('week', o_orderdate) AS week, o_orderpriority AS dim,
        |  lower(trim(CAST(o_orderstatus AS VARCHAR))) AS category,
        |  count(*) AS count
        |FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "coerce_clean" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  count(TRY_CAST(event_type AS DOUBLE)) AS n_junk_price,
        |  count(TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE)) AS n_price_ok,
        |  count(TRY_CAST(event_type AS TIMESTAMP)) AS n_junk_date,
        |  count(TRY_CAST(CAST(ts AS VARCHAR) AS TIMESTAMP)) AS n_date_ok
        |FROM events""".stripMargin,
    "normalize_keys" ->
      """SELECT c_custkey,
        |  upper(regexp_replace(CAST(c_name AS VARCHAR), '\s+', '', 'g')) AS key_norm,
        |  lower(trim(CAST(c_mktsegment AS VARCHAR))) AS seg_norm,
        |  substring(upper(regexp_replace(CAST(c_name AS VARCHAR), '\s+', '', 'g')), 1, 4) AS key_prefix
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "synthetic_id_distinct" ->
      "SELECT CAST(count(*) AS BIGINT) AS n_ids FROM lineitem",
    "lookup_join" ->
      """SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region
        |FROM customer c
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        |ORDER BY c.c_custkey""".stripMargin,
    "coverage_docs" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |  floor((coalesce(avg(CASE WHEN l.lang_name IS NOT NULL THEN 1 ELSE 0 END) * 100.0, 0.0)) * 10000 + 0.5) / 10000 AS coverage_pct
         |FROM documents d LEFT JOIN $langDimSql ON d.lang = l.lang_code""".stripMargin,
    "prefix_fallback" ->
      s"""SELECT coalesce(l.lang_name, substring(upper(d.lang), 1, 2)) AS la,
         |  count(*) AS n
         |FROM documents d LEFT JOIN $langDimSql ON d.lang = l.lang_code
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "densify_orders" ->
      (denseCte + "\nSELECT week, dim, transactions, price_mean FROM dense ORDER BY dim, week"),
    "rolling_windows" ->
      (winsCte + "\nSELECT week, dim, transactions, rolling_trans, price_mean, rolling_price_mean, window_weeks FROM wins ORDER BY window_weeks, dim, week"),
    "anomaly_zscore" ->
      (winsCte +
        """,
          |z AS (
          |  SELECT week, dim, window_weeks, transactions, rolling_trans,
          |    floor((CASE WHEN stddev_samp(transactions) OVER wd IS NULL
          |                 OR stddev_samp(transactions) OVER wd = 0 THEN 0.0
          |          ELSE (transactions - avg(transactions) OVER wd)
          |               / stddev_samp(transactions) OVER wd END) * 10000 + 0.5) / 10000 AS z_transactions,
          |    floor((CASE WHEN stddev_samp(rolling_trans) OVER wd IS NULL
          |                 OR stddev_samp(rolling_trans) OVER wd = 0 THEN 0.0
          |          ELSE (rolling_trans - avg(rolling_trans) OVER wd)
          |               / stddev_samp(rolling_trans) OVER wd END) * 10000 + 0.5) / 10000 AS z_rolling_trans
          |  FROM wins WINDOW wd AS (PARTITION BY dim))
          |SELECT week, dim, window_weeks, transactions, rolling_trans,
          |  z_transactions, z_rolling_trans,
          |  abs(z_transactions) > 3.0 AS anomaly_transactions,
          |  abs(z_rolling_trans) > 3.0 AS anomaly_rolling_trans
          |FROM z ORDER BY window_weeks, dim, week""".stripMargin),
    "latest_snapshot" ->
      (winsCte + "\nSELECT week, dim, transactions, rolling_trans, price_mean, rolling_price_mean, window_weeks FROM wins WHERE week = (SELECT max(week) FROM wins) ORDER BY window_weeks, dim"),
    "qa_summary" ->
      """SELECT CAST(count(*) AS BIGINT) AS rows_raw,
        |  count(DISTINCT o_orderpriority) AS dims,
        |  floor((coalesce(avg(CASE WHEN o_orderpriority IS NOT NULL THEN 1 ELSE 0 END) * 100.0, 0.0)) * 10000 + 0.5) / 10000 AS coverage_pct,
        |  max(date_trunc('week', o_orderdate)) AS latest_week
        |FROM orders""".stripMargin,
    "yoy_orders" ->
      (denseCte +
        """
          |SELECT week, dim, transactions,
          |  lag(transactions, 52) OVER (PARTITION BY dim ORDER BY week) AS prev_year,
          |  transactions - lag(transactions, 52) OVER (PARTITION BY dim ORDER BY week) AS yoy_change
          |FROM dense ORDER BY dim, week""".stripMargin),
  )
}
