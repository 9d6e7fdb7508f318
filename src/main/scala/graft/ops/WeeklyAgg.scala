package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weekly grouped aggregation (SURVEY.md §2.D A1-A5, reference
  * etl/etl_main.py:199-228): bucket a timestamp to Monday-start weeks, then
  * per (week, dimension) compute exact transaction counts and price
  * statistics.
  *
  * Aggregates are EXACT — `count_distinct`, exact `median`/`percentile`
  * (linear interpolation, matching numpy's nanpercentile and DuckDB's
  * quantile_cont) — because the correctness oracle hash-compares values.
  * Catalyst plans this as a two-phase HashAggregate (partial map-side combine
  * + final after a single hash shuffle on the group keys); at 100 TB the only
  * fact-scale shuffle is that one exchange. Approximate variants for
  * scale-first pipelines are in [[ScaleOps]].
  */
object WeeklyAgg {

  /** P7 + A1-A4: weekly stats per dimension.
    *
    * @param ts   event-time column (already a timestamp, or coercible)
    * @param dim  grouping dimension (the reference's local_authority analog)
    * @param id   transaction-id column for the distinct count (A1; null-skipping
    *             in both pandas nunique and Spark count_distinct)
    * @param price value column for mean/median/p10/p90 (A2-A4; all
    *             null-skipping, null on all-null groups — pandas NaN parity)
    */
  def weeklyStats(df: DataFrame, ts: Column, dim: Column, id: Column,
                  price: Column): DataFrame = {
    import CoreOps.r6
    df.withColumn("week", CoreOps.weekStart(ts))
      .withColumn("dim", dim)
      .groupBy("week", "dim")
      .agg(
        count_distinct(id).as("transactions"),
        r6(avg(price)).as("price_mean"),
        r6(median(price)).as("price_median"),
        r6(percentile(price, lit(0.10))).as("price_p10"),
        r6(percentile(price, lit(0.90))).as("price_p90"))
      .orderBy("week", "dim")
  }

  /** A5 — per (week, dim, category) row count (etl/etl_main.py:221-225).
    * `groupby(...).size()` counts rows including NaN keys/values, so this is
    * `count(*)`, not `count(col)`.
    */
  def typeBreakdown(df: DataFrame, ts: Column, dim: Column,
                    category: Column): DataFrame =
    df.withColumn("week", CoreOps.weekStart(ts))
      .withColumn("dim", dim)
      .withColumn("category", CoreOps.normalizeCategory(category))
      .groupBy("week", "dim", "category")
      .agg(count(lit(1)).as("count"))
      .orderBy("week", "dim", "category")
}
