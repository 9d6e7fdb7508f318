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
    // guard the library API, not just the CLI: an empty list would explode
    // zero structs and silently DELETE every row; a repeated width would
    // silently duplicate its rows (two identical structs per row)
    require(windows.nonEmpty, "rollingWindows needs at least one width")
    require(windows.forall(_ > 0), s"window widths must be positive: $windows")
    require(windows.distinct == windows, s"duplicate window widths: $windows")
    // Single-pass multi-window fan-out: a UNION of per-width frames would
    // re-evaluate the entire upstream lineage (fact scan → weekly agg →
    // densify) once per width — the physical plan literally contained the
    // subtree W times. Instead every width is a window column over the SAME
    // partitionBy(dim)/orderBy(week) spec (Catalyst collapses them into one
    // sort + one Window operator), and the stacked UNION-ALL layout
    // (etl/etl_main.py:256) is recovered by exploding an inline array of
    // per-width structs — pure row fan-out, no second pass.
    //
    // price_mean is already on the RoundDp grid, so micro-units are exact
    // integers: summing them as longs is order-independent, making the
    // rolling mean bit-identical across engines regardless of how each one
    // associates its window frame sums (Spark: sequential; DuckDB: segment
    // tree). Empty frames (all-null price weeks) → null, = pandas
    // min_periods=1 NaN.
    val sortWin = Window.partitionBy("dim").orderBy("week")
    val pmMicros = floor(col("price_mean") * 1e6 + 0.5)
    // Window expressions are not allowed inside a generator, so each width's
    // aggregates land in flat columns first (one shared Window operator)...
    val withCols = windows.foldLeft(dense) { (df, w) =>
      val win = sortWin.rowsBetween(-(w - 1), Window.currentRow)
      val cnt = count(col("price_mean")).over(win)
      df.withColumn(s"__rt_$w", sum("transactions").over(win))
        .withColumn(s"__rpm_$w",
          when(cnt === 0, lit(null).cast("double"))
            .otherwise(rnd(sum(pmMicros).over(win).cast("double") / 1e6 / cnt)))
    }
    // ...then the stacked layout explodes per-width structs of those columns.
    val perWidth = windows.map { w =>
      struct(col(s"__rt_$w").as("rolling_trans"),
        col(s"__rpm_$w").as("rolling_price_mean"),
        lit(w).as("window_weeks"))
    }
    withCols
      .withColumn("__w", explode(array(perWidth: _*)))
      .select(col("week"), col("dim"), col("transactions"), col("price_mean"),
        col("__w.rolling_trans").as("rolling_trans"),
        col("__w.rolling_price_mean").as("rolling_price_mean"),
        col("__w.window_weeks").as("window_weeks"))
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
