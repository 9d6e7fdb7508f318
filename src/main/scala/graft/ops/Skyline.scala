package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-dimensional Pareto frontier (skyline) — "record" rows no other row
  * beats on both axes (extension tier; the reference's analytics stop at
  * per-group extrema, etl/etl_main.py:241-244, but a corpus/market table
  * routinely asks "which rows were the best tradeoff seen so far?").
  *
  * Dominance contract: row A dominates row B iff
  * `A.maxv >= B.maxv && A.minv <= B.minv` with at least one strict
  * inequality. The skyline is every non-dominated row; exact ties on BOTH
  * axes are mutually non-dominating, so all copies survive.
  *
  * Scale design — the naive formulations are a quadratic self-join or a
  * single-task global window over the full input; neither survives 100×.
  * This is the standard two-phase skyline instead (coarse prune, exact
  * finish — the distributed-skyline shape from the literature):
  *
  *  1. PRUNE, distributed: bucket `maxv` into `bucketWidth`-wide integer
  *     ranges and aggregate `min(minv)` per bucket (map-side partials; the
  *     exchange carries one row per bucket). A running min over strictly
  *     higher buckets (a window over the BOUNDED bucket table — single
  *     task, constant size) yields, per bucket, the best `minv` any
  *     strictly-greater-`maxv` witness achieves. A row with
  *     `minv >= that witness` is dominated (the witness's bucket floor
  *     already exceeds the row's `maxv`), so the broadcast-join prefilter
  *     drops it at scan time. Fact-scale work is one scan + one tiny
  *     aggregate — no fact-table shuffle at all.
  *  2. FINISH, exact: the survivors are rows not dominated by any bucket's
  *     best witness — in practice O(frontier), orders of magnitude smaller
  *     than the input (the skyline-smallness assumption every published
  *     skyline algorithm rides on; worst case — e.g. the input already IS
  *     a frontier — degrades to the single-task sort, loudly visible in
  *     the UI rather than silently wrong). Over the survivors, two window
  *     frames decide exact dominance:
  *       - `min(minv)` over strictly-greater `maxv` (integer RANGE frame
  *         ending 1 before current, descending) — strict-on-max witnesses;
  *       - `min(minv)` within the same `maxv` partition — strict-on-min
  *         witnesses at equal `maxv`.
  *     A survivor stays iff neither witness strictly improves on it.
  *
  * PRECONDITION: both axes must be integer-valued (cast to long; dates go
  * through `datediff`-style day numbers) — the RANGE frame's "1 preceding"
  * and the bucket floor are exact only in integer arithmetic.
  */
object Skyline {

  /** Skyline of `df` maximizing `maxv` and minimizing `minv` (both
    * integer-valued long expressions). Returns the input columns plus
    * `__maxv`/`__minv` dropped — callers keep their own projection.
    */
  def skyline2d(df: DataFrame, maxv: Column, minv: Column,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth must be positive")
    val withAxes = df.withColumn("__maxv", maxv.cast("long"))
      .withColumn("__minv", minv.cast("long"))
    val bucket = CoreOps.integralDiv(
      col("__maxv") - pmod(col("__maxv"), lit(bucketWidth)), bucketWidth)

    // Phase 1: per-bucket best minv, then the running best over strictly
    // higher buckets. The bucket table is bounded by value-range/width —
    // the unpartitioned window is a constant-size single task, not a
    // fact-scale sort.
    val perBucket = withAxes.groupBy(bucket.as("__b"))
      .agg(min(col("__minv")).as("__bmin"))
    val higherW = Window.orderBy(col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketCum = perBucket
      .select(col("__b"), min(col("__bmin")).over(higherW).as("__higher_min"))

    // Broadcast the tiny bucket digest back and prune: a row whose minv is
    // not strictly better than the best strictly-higher-bucket witness is
    // dominated (that witness's maxv is strictly greater by bucket-floor
    // construction). Null higher_min = top bucket, nothing above, keep.
    val survivors = withAxes
      .join(broadcast(bucketCum), bucket === col("__b"), "left")
      .where(col("__higher_min").isNull || col("__minv") < col("__higher_min"))
      .drop("__b", "__higher_min")

    // Phase 2: exact dominance over the pruned candidate set (frontier-
    // sized by the smallness contract above).
    val strictHigher = Window.orderBy(col("__maxv").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val sameMax = Window.partitionBy(col("__maxv"))
    val judged = survivors
      .withColumn("__hmin", min(col("__minv")).over(strictHigher))
      .withColumn("__emin", min(col("__minv")).over(sameMax))
    judged
      .where((col("__hmin").isNull || col("__minv") < col("__hmin")) &&
        col("__minv") === col("__emin"))
      .drop("__maxv", "__minv", "__hmin", "__emin")
  }
}
