package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed time-range self join (SURVEY.md §2.C lists range joins as
  * absent from the reference; this is the scalable batch formulation).
  *
  * A naive |Δt| ≤ tol join is a per-key nested loop. Bucketing event time
  * into tolerance-sized cells turns it into an equi-join: a pair within
  * tolerance must sit in the same or adjacent cells, so the left side
  * explodes into its 3 candidate cells and joins on (key, cell), then the
  * exact predicate filters. Each qualifying pair matches exactly one right
  * cell, so no dedup pass is needed. Work scales with cell occupancy, not
  * the square of the key's row count.
  */
object RangeJoin {

  /** Pairs of rows sharing `keyCol` with |ts difference| ≤ toleranceMs,
    * emitted once per unordered pair (left id < right id).
    */
  def selfTimeRangeJoin(df: DataFrame, keyCol: String, tsCol: String,
                        idCol: String, toleranceMs: Long): DataFrame = {
    def cellOf(c: String) = expr(s"unix_millis($c) div $toleranceMs")
    val left = df.select(col(keyCol).as("k"), col(idCol).as("l_id"),
        col(tsCol).as("l_ts"))
      .withColumn("cell",
        explode(array(cellOf("l_ts") - 1, cellOf("l_ts"), cellOf("l_ts") + 1)))
    val right = df.select(col(keyCol).as("rk"), col(idCol).as("r_id"),
        col(tsCol).as("r_ts"))
      .withColumn("cell", cellOf("r_ts"))
    left.join(right,
        left("k") === right("rk") && left("cell") === right("cell")
          && left("l_id") < right("r_id"))
      .where(abs(unix_millis(col("l_ts")) - unix_millis(col("r_ts")))
        <= toleranceMs)
      .select("k", "l_id", "r_id")
  }
}
