package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._

/** Driver contract — see SURVEY.md §7.1.
  *
  * Each entry in [[queries]] instantiates one operator (or operator cluster)
  * from SURVEY.md §2 against the driver testdata; [[oracleSql]] carries the
  * equivalent DuckDB SQL over the same parquet tables. Column names and
  * ordering are aligned on both sides because the driver hash-compares values
  * after sorting columns by name; every floating-point output is rounded to
  * 6 dp on BOTH sides (CoreOps.r6) so accumulation-order bit noise cannot
  * flip the hash.
  */
object SparkEntry {

  /** Flagship query on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("weekly_agg_events")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P7+A1-A4+SO1 — weekly stats over the dense events table
    // (reference etl/etl_main.py:199-218).
    "weekly_agg_events" -> ((s, d) => {
      val e = Tables.events(s, d)
      WeeklyAgg.weeklyStats(e, col("ts"), col("event_type"),
        col("event_id"), col("value"))
    }),
    // Same operator over the sparse-week orders table (SURVEY.md §7.2).
    "weekly_agg_orders" -> ((s, d) => {
      val o = Tables.orders(s, d)
      WeeklyAgg.weeklyStats(o, col("o_orderdate"), col("o_orderpriority"),
        col("o_orderkey"), col("o_totalprice"))
    }),
    // A5+P8 — per-(week, dim, category) breakdown (etl/etl_main.py:221-225).
    "type_breakdown" -> ((s, d) => {
      val o = Tables.orders(s, d)
      WeeklyAgg.typeBreakdown(o, col("o_orderdate"), col("o_orderpriority"),
        col("o_orderstatus"))
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "weekly_agg_events" ->
      """SELECT date_trunc('week', ts) AS week, event_type AS dim,
        |  count(DISTINCT event_id) AS transactions,
        |  round(avg(value), 6) AS price_mean,
        |  round(quantile_cont(value, 0.5), 6) AS price_median,
        |  round(quantile_cont(value, 0.10), 6) AS price_p10,
        |  round(quantile_cont(value, 0.90), 6) AS price_p90
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "weekly_agg_orders" ->
      """SELECT date_trunc('week', o_orderdate) AS week, o_orderpriority AS dim,
        |  count(DISTINCT o_orderkey) AS transactions,
        |  round(avg(o_totalprice), 6) AS price_mean,
        |  round(quantile_cont(o_totalprice, 0.5), 6) AS price_median,
        |  round(quantile_cont(o_totalprice, 0.10), 6) AS price_p10,
        |  round(quantile_cont(o_totalprice, 0.90), 6) AS price_p90
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "type_breakdown" ->
      """SELECT date_trunc('week', o_orderdate) AS week, o_orderpriority AS dim,
        |  lower(trim(CAST(o_orderstatus AS VARCHAR))) AS category,
        |  count(*) AS count
        |FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
  )
}
