package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (extension beyond the reference's weekly
  * buckets): a new session starts when the gap to the user's previous
  * event exceeds `gapMs`. The classic lag → flag → running-sum formulation:
  * one shuffle on the user key, everything else window arithmetic over the
  * per-user sort. Millisecond-exact gap arithmetic (`unix_millis`) keeps
  * the semantics portable across engines.
  *
  * Ordering is total — (ts, id) — so equal timestamps can't make session
  * assignment nondeterministic.
  */
object Sessionize {
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 idCol: String, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_millis(col(tsCol)) - unix_millis(col("__prev")) > gapMs, 1L)
        .otherwise(0L))
      .withColumn("session_id", sum("__new").over(run))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("t_start"), max(col(tsCol)).as("t_end"))
  }
}
