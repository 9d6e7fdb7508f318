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
  def latestWeek(df: DataFrame): DataFrame = {
    val latest = df.agg(max("week").as("week"))
    df.join(broadcast(latest), Seq("week"))
  }
}
