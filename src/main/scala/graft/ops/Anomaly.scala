package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Z-score anomaly flagging (SURVEY.md §2.E W3 + §2.B P11; reference
  * etl/etl_main.py:260-282).
  *
  * Semantics mirrored exactly from the reference, including its quirks:
  *   - grouping is by dimension ONLY — the multi-window stacked frame is NOT
  *     split by `window_weeks` (the reference's groupby("local_authority")
  *     runs over the concatenated windows table);
  *   - sample std (pandas ddof=1 → `stddev_samp`);
  *   - std == 0 or undefined (single-row group) → z = 0.0;
  *   - `transactions` is zero-filled before scoring (etl_main.py:268).
  *
  * The reference iterates groups in a Python loop; here the whole thing is
  * one unbounded window over `partitionBy(dim)` — a single exchange, fully
  * codegen'd, no driver involvement.
  */
object Anomaly {

  def zScore(x: Column, byDim: Column): Column = {
    val w = Window.partitionBy(byDim)
    val m = avg(x).over(w)
    val s = stddev_samp(x).over(w)
    CoreOps.rnd(when(s.isNull || s === 0.0, 0.0).otherwise((x - m) / s))
  }

  def detectAnomalies(windows: DataFrame, zThresh: Double = 3.0): DataFrame = {
    val t = coalesce(col("transactions"), lit(0L))
    windows
      .withColumn("z_transactions", zScore(t, col("dim")))
      .withColumn("z_rolling_trans", zScore(col("rolling_trans"), col("dim")))
      .withColumn("anomaly_transactions",
        CoreOps.anomalyFlag(col("z_transactions"), zThresh))
      .withColumn("anomaly_rolling_trans",
        CoreOps.anomalyFlag(col("z_rolling_trans"), zThresh))
  }
}
