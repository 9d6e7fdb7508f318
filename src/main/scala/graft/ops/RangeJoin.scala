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

  /** Keyed point-in-interval join: each point row pairs with every
    * interval row of the same key whose CLOSED interval [start, end]
    * contains the point's timestamp.
    *
    * The scalable formulation of `ON p.ts BETWEEN i.start AND i.end` —
    * which Spark would otherwise execute as a per-key nested loop (range
    * conditions can't hash). Intervals explode into the `cellMs` time
    * cells they span (duration/cellMs + 1 rows — size `cellMs` to the
    * typical interval length); a point maps to exactly ONE cell, so a
    * qualifying (point, interval) pair meets in exactly that cell and
    * containment needs no dedup pass. One (key, cell) equi-exchange per
    * side, work ∝ cell occupancy.
    *
    * Column names of the two frames must be disjoint (rename the interval
    * side's key) — this also sidesteps self-join attribute ambiguity when
    * the intervals derive from the points (the session-assignment use).
    */
  def pointInIntervalJoin(points: DataFrame, pKey: String, pTs: String,
                          intervals: DataFrame, iKey: String,
                          startCol: String, endCol: String,
                          cellMs: Long): DataFrame = {
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "points and intervals must have disjoint column names")
    val pc = points.withColumn("__pcell",
      expr(s"unix_millis($pTs) div $cellMs"))
    val ic = intervals.withColumn("__icell", explode(sequence(
      expr(s"unix_millis($startCol) div $cellMs"),
      expr(s"unix_millis($endCol) div $cellMs"))))
    pc.join(ic, col(pKey) === col(iKey) && col("__pcell") === col("__icell"))
      .where(col(pTs) >= col(startCol) && col(pTs) <= col(endCol))
      .drop("__pcell", "__icell")
  }
}
