package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling-window analytics (SURVEY.md §2.E W1/W2/W4; reference
  * etl/etl_main.py:247-256): per-dimension trailing sums/means over the
  * densified weekly series, fanned out over multiple window widths and
  * stacked with a `window_weeks` tag.
  *
  * ROWS frames are correct here *because* the series was densified to exactly
  * one row per (week, dim) — a row offset equals a week offset. Pandas'
  * `min_periods=1` partial-head frames are Spark's natural behavior. All
  * window widths share the same `partitionBy(dim) orderBy(week)` sort order,
  * so Catalyst computes every width from one exchange + one sort.
  */
object Rolling {

  val DefaultWindows: Seq[Int] = Seq(4, 12)

  def rollingWindows(dense: DataFrame,
                     windows: Seq[Int] = DefaultWindows): DataFrame = {
    import CoreOps.rnd
    val frames = windows.map { w =>
      val win = Window.partitionBy("dim").orderBy("week")
        .rowsBetween(-(w - 1), Window.currentRow)
      // price_mean is already on the RoundDp grid, so micro-units are exact
      // integers: summing them as longs is order-independent, making the
      // rolling mean bit-identical across engines regardless of how each one
      // associates its window frame sums (Spark: sequential; DuckDB: segment
      // tree). Empty frames (all-null price weeks) → null, = pandas
      // min_periods=1 NaN.
      val pmMicros = floor(col("price_mean") * 1e6 + 0.5)
      val cnt = count(col("price_mean")).over(win)
      dense
        .withColumn("rolling_trans", sum("transactions").over(win))
        .withColumn("rolling_price_mean",
          when(cnt === 0, lit(null).cast("double"))
            .otherwise(rnd(sum(pmMicros).over(win).cast("double") / 1e6 / cnt)))
        .withColumn("window_weeks", lit(w))
    }
    // SO2 — UNION ALL stack, no dedup (etl/etl_main.py:256)
    frames.reduce(_ unionByName _)
  }

  /** Declared-but-unimplemented in the reference (file header at
    * etl/etl_main.py:5 advertises YOY; no code computes it — SURVEY.md §2.E).
    * Implemented as the natural Spark formulation: value 52 densified weeks
    * back via `lag` over the same per-dim sort.
    */
  def yoy(dense: DataFrame, valueCol: String): DataFrame = {
    val win = Window.partitionBy("dim").orderBy("week")
    dense
      .withColumn("prev_year", lag(col(valueCol), 52).over(win))
      .withColumn("yoy_change", col(valueCol) - col("prev_year"))
  }
}
