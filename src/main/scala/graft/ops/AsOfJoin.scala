package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: each left row picks the most recent right-side
  * value at or before its timestamp, per key — the temporal lookup Spark
  * has no built-in operator for (SURVEY.md §2.C "not present" list; DuckDB
  * ships a native ASOF JOIN, which the oracle uses).
  *
  * Composed Spark-first (preference tier (a) of the custom-operator
  * ladder): interleave both timelines into one frame and carry the latest
  * non-null right value forward with `last_value(ignoreNulls)` over the
  * per-key time sort. One shuffle on the key, one sort, no range-join
  * explosion — the classic scalable formulation; a right-side timestamp
  * tie-breaker orders right rows before left rows at equal timestamps so
  * "at or before" includes same-instant values.
  */
object AsOfJoin {

  /** @param left  (key, ts, ...) probe rows
    * @param right (key, ts, value) versioned lookup rows
    * @return left rows + `asof_value` (null when no right row precedes)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, valueCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left.withColumn("__v", lit(null).cast(
        right.schema(valueCol).dataType))
      .withColumn("__side", lit(1))
    val r = right.select(col(keyCol), col(tsCol),
        col(valueCol).as("__v"))
      .withColumn("__side", lit(0))
    val combined = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    combined
      .withColumn("asof_value", last(col("__v"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) :+ col("asof_value"): _*)
  }
}
