package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._

/** The reference's full batch lifecycle (SURVEY.md §3.1; reference
  * etl/etl_main.py:320-403) re-expressed as lazy DataFrame combinators over
  * the testdata's `orders` table (instantiation per SURVEY.md §7.2:
  * o_orderdate ~ transfer date, o_totalprice ~ price, o_orderkey ~
  * transaction id, o_orderpriority ~ local authority analog).
  *
  * Each stage is a pure plan transformation; nothing executes until a sink.
  * The whole pipeline shuffles fact-scale data exactly once (the weekly
  * groupBy); every later stage operates on the bounded weeks × dims frame.
  */
object Pipeline {

  /** prepare_transactions → weekly stats (etl_main.py:140-228). */
  def weeklyOrders(s: SparkSession, d: String): DataFrame =
    WeeklyAgg.weeklyStatsCore(Tables.orders(s, d), col("o_orderdate"),
      col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))

  /** Densified (week × dim) grid with zero-filled counts (etl_main.py:239-245).
    * Grid axes derive from a raw 2-column projection of orders so the
    * weekly aggregation lineage isn't re-evaluated for bounds/dims.
    */
  def denseOrders(s: SparkSession, d: String): DataFrame =
    Densify.densify(
      weeklyOrders(s, d).select("week", "dim", "transactions", "price_mean"),
      fillZero = Seq("transactions"),
      gridFrom = Some(Tables.orders(s, d).select(
        CoreOps.weekStart(col("o_orderdate")).as("week"),
        col("o_orderpriority").as("dim"))))

  /** Multi-window rolling frame, stacked (etl_main.py:247-256). */
  def windowsOrders(s: SparkSession, d: String,
                    windows: Seq[Int] = Rolling.DefaultWindows): DataFrame =
    Rolling.rollingWindows(denseOrders(s, d), windows)

  /** Z-score anomaly flags over the stacked frame (etl_main.py:260-282). */
  def anomaliesOrders(s: SparkSession, d: String): DataFrame =
    Anomaly.detectAnomalies(windowsOrders(s, d))
}
