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
  * right ROW forward with `last_value(ignoreNulls)` over the per-key time
  * sort. The carried value rides inside a struct marker so a right row
  * whose VALUE is null is still "the most recent row" (matching DuckDB's
  * native ASOF JOIN, which returns that row's NULL — a bare
  * `last(value, ignoreNulls)` would skip it and resurrect a stale earlier
  * value). One shuffle on the key, one sort, no range-join explosion —
  * the classic scalable formulation; a side tie-breaker orders right rows
  * before left rows at equal timestamps so "at or before" includes
  * same-instant values, and right rows sharing (key, ts) resolve to the
  * greatest marker (engine-stable, not partition-layout-dependent) when
  * the value type is orderable. For a non-orderable value type (MapType),
  * the marker is left out of the sort — the join still analyzes and runs,
  * but ties among right rows sharing an exact (key, ts) resolve
  * arbitrarily (callers needing determinism there should pre-dedup).
  * NULL-key probe rows get a NULL `asof_value` (SQL join semantics:
  * NULL = NULL never matches), not values carried from null-key right
  * rows that happen to share the window partition.
  */
object AsOfJoin {

  /** @param left  (key, ts, ...) probe rows
    * @param right (key, ts, value) versioned lookup rows
    * @return left rows + `asof_value` (null when no right row precedes)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, valueCol: String): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns
    val dt = right.schema(valueCol).dataType
    val markerType = StructType(Seq(StructField("v", dt)))
    val l = left.withColumn("__m", lit(null).cast(markerType))
      .withColumn("__side", lit(1))
    // A NULL-timestamp lookup row would sort FIRST (asc nulls-first) and
    // back-fill its value onto every probe with no real predecessor;
    // DuckDB's native ASOF (the oracle) evaluates ts >= NULL as no-match.
    // Drop such rows — they have no place on a time axis.
    val r = right.where(col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol),
        struct(col(valueCol).as("v")).as("__m"))
      .withColumn("__side", lit(0))
    val combined = l.unionByName(r, allowMissingColumns = true)
    // The marker tie-break only when the value type sorts: ordering by a
    // MapType-valued struct fails at analysis, and the previous bare
    // value-column formulation handled maps fine.
    val tieBreak =
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(markerType))
        Seq(col("__m"))
      else Seq.empty
    val w = Window.partitionBy(keyCol)
      .orderBy(Seq(col(tsCol), col("__side")) ++ tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    combined
      .withColumn("asof_value",
        when(col(keyCol).isNull, lit(null).cast(dt))
          .otherwise(last(col("__m"), ignoreNulls = true).over(w)
            .getField("v")))
      .where(col("__side") === 1)
      .select(leftCols.toIndexedSeq.map(col) :+ col("asof_value"): _*)
  }
}
