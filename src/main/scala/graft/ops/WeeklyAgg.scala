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
                  price: Column): DataFrame =
    weeklyStatsCore(df, ts, dim, id, price).orderBy("week", "dim")

  /** Unsorted variant for composition — downstream densify/rolling stages
    * re-partition anyway, so a mid-plan sort would be pure waste.
    */
  def weeklyStatsCore(df: DataFrame, ts: Column, dim: Column, id: Column,
                      price: Column): DataFrame = {
    import CoreOps.rnd
    // Aggregate over exact integer cents (see CoreOps.moneyCents): the mean
    // becomes an exact long sum + fixed double divisions, reproducible across
    // partitionings and engines; order statistics interpolate between exact
    // integers. Null prices stay null (cents of null is null), preserving the
    // pandas null-skipping semantics of mean/median/percentile.
    val cents = col("__cents")
    // ONE percentile aggregate for all three order statistics: each
    // separate percentile/median call buffers every group value in its own
    // ObjectHashAggregate state — three full copies of the fact column and
    // three sorts per group. The array form shares one buffer and one sort;
    // percentile(c, 0.5) IS median, so the values are bit-identical.
    df.withColumn("week", CoreOps.weekStart(ts))
      .withColumn("dim", dim)
      .withColumn("__cents", CoreOps.moneyCents(price))
      .groupBy("week", "dim")
      .agg(
        count_distinct(id).as("transactions"),
        when(count(cents) === 0, lit(null).cast("double"))
          .otherwise(rnd(sum(cents).cast("double") / 100.0 / count(cents)))
          .as("price_mean"),
        percentile(cents, typedLit(PctQuantiles)).as("__pcts"))
      .select(col("week") +: col("dim") +: col("transactions")
        +: col("price_mean") +: pctsPriceColumns(col("__pcts")): _*)
  }

  /** Skew-lean weekly stats — the A1/A2 subset (distinct transactions +
    * mean) WITHOUT the order-statistics buffer, for DOMINANT-KEY
    * dimensions (SURVEY §4.3(d) names the per-LA weekly family as
    * skew-prone; one authority can carry half the national volume).
    *
    * Why this shape survives a ≥50 %-share key at 100 TB:
    * `count_distinct` rewrites to a two-level aggregate whose FIRST
    * fact-scale exchange is keyed on (week, dim, id) — the dominant dim
    * splits across the id domain before any (week, dim)-keyed stage — and
    * the mean's long partials combine map-side, so no task ever
    * materializes a fact-scale group. The percentile tier deliberately
    * stays out: `percentile`'s ObjectHashAggregate buffers whole groups
    * per task (fine for balanced dims; a skewed dim takes the bounded
    * histogram path, [[ScaleOps.groupQuantilesByHistogram]]). The graded
    * `rolling_windows_skewed` runs the full weekly→densify→rolling
    * lifecycle through here with a synthesized ≥50 %-share dim, and
    * PlanSpec pins the exchange keying this scaladoc claims.
    */
  def weeklyCountMean(df: DataFrame, ts: Column, dim: Column, id: Column,
                      price: Column): DataFrame = {
    import CoreOps.rnd
    val cents = col("__cents")
    df.withColumn("week", CoreOps.weekStart(ts))
      .withColumn("dim", dim)
      .withColumn("__cents", CoreOps.moneyCents(price))
      .groupBy("week", "dim")
      .agg(
        count_distinct(id).as("transactions"),
        when(count(cents) === 0, lit(null).cast("double"))
          .otherwise(rnd(sum(cents).cast("double") / 100.0 / count(cents)))
          .as("price_mean"))
  }

  /** Quantiles computed by the shared percentile buffer, in the order
    * [[pctsPriceColumns]] unpacks them.
    */
  private[ops] val PctQuantiles: Seq[Double] = Seq(0.50, 0.10, 0.90)

  /** Unpack the shared percentile array into the named price columns —
    * one definition for the exact ([[weeklyStatsCore]]) and approximate
    * (`ScaleOps.approxWeeklyStats`) tiers, so rounding / quantile order /
    * naming cannot drift between them.
    */
  private[ops] def pctsPriceColumns(pcts: Column): Seq[Column] = {
    import CoreOps.rnd
    Seq(rnd(pcts.getItem(0) / 100.0).as("price_median"),
      rnd(pcts.getItem(1) / 100.0).as("price_p10"),
      rnd(pcts.getItem(2) / 100.0).as("price_p90"))
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

  /** Exact mode per key with a DETERMINISTIC tie-break (smallest value
    * wins): engines' built-in `mode` aggregates break frequency ties by
    * encounter order — partition-layout-dependent, so unusable under a
    * hash-compared contract. Two standard shapes instead: count per
    * (key, value), then top-1 per key by (count desc, value asc) — which
    * [[org.apache.spark.sql.execution.window.WindowGroupLimitExec]] pushes
    * below the exchange like any rank<=k filter. Null values are excluded
    * (the mode of the DEFINED values, `mode()`'s own convention).
    */
  def exactMode(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    exactMode(df, Seq(keyCol), valueCol)

  /** Composite-key variant — same two-shape plan, partitioned by all key
    * columns (the per-(week, dim) mode a reporting rollup wants).
    */
  def exactMode(df: DataFrame, keyCols: Seq[String],
                valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty, "exactMode needs at least one key column")
    val counted = df.where(col(valueCol).isNotNull)
      .groupBy((keyCols.map(col) :+ col(valueCol)): _*)
      .agg(count(lit(1)).as("n_mode"))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("n_mode").desc, col(valueCol).asc)
    counted.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
      .withColumnRenamed(valueCol, "mode_value")
  }
}
