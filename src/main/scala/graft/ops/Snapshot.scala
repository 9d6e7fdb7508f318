package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Latest-week snapshot (SURVEY.md §2.B P10 + §2.D A6; reference
  * etl/etl_main.py:340-341): keep only rows of the most recent week.
  *
  * Formulated as an inner join against the 1-row global max — no driver-side
  * collect of the max, and the 1-row side broadcasts, so the filter costs no
  * shuffle of the main table.
  */
object Snapshot {
  /** @param latestFrom optional cheaper source for the max week: without a
    *   CTE-style reuse mechanism, Catalyst re-evaluates `df`'s whole
    *   lineage inside the 1-row max subtree. When the max is derivable
    *   from an upstream table with a narrower scan (e.g. max(week) of the
    *   windows frame == weekStart(max(order date)) — week bucketing is
    *   monotone), passing that 1-column aggregate instead avoids the
    *   duplicate pass.
    */
  def latestWeek(df: DataFrame, latestFrom: Option[DataFrame] = None): DataFrame = {
    val latest = latestFrom.getOrElse(df).agg(max("week").as("week"))
    df.join(broadcast(latest), Seq("week"))
  }
}
