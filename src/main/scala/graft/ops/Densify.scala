package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series densification (SURVEY.md §2.C J2/J3 + §2.B P12; reference
  * etl/etl_main.py:239-245): build the complete Monday-week × dimension grid
  * between the observed min and max week, left-join the observed weekly
  * aggregates onto it, and fill absent transaction counts with 0 (price
  * columns stay NULL, matching pandas' fill-with-NaN no-op).
  *
  * Everything stays in-plan — the week axis is `explode(sequence(min, max,
  * 7 days))` built from a 1-row aggregate, never a driver-side collect. The
  * grid is |weeks| × |dims| (bounded, small); Spark broadcasts it against the
  * weekly aggregate, so densification costs no fact-scale shuffle.
  */
object Densify {

  /** @param weekly aggregated input with `week` (timestamp) + `dim` columns
    * @param fillZero columns whose missing values become 0 (the reference
    *                 fills only `transactions`)
    * @param gridFrom optional cheaper (week, dim) source for the grid axes:
    *                 without CTE reuse, deriving bounds and distinct dims
    *                 from `weekly` re-evaluates its whole aggregation
    *                 lineage twice more. Any projection with the same week
    *                 bucketing and dim values (e.g. the raw fact table,
    *                 2 columns) yields an identical grid — min/max commute
    *                 with the monotone week bucketing and the distinct dim
    *                 set is unchanged by aggregation.
    */
  def densify(weekly: DataFrame, fillZero: Seq[String],
              gridFrom: Option[DataFrame] = None): DataFrame = {
    val axes = gridFrom.getOrElse(weekly)
    val weeks = axes
      .agg(min("week").as("wmin"), max("week").as("wmax"))
      .select(explode(expr("sequence(wmin, wmax, interval 7 days)")).as("week"))
    // dropna on the grid axis — etl/etl_main.py:239
    val dims = axes.where(col("dim").isNotNull).select("dim").distinct()
    val grid = weeks.crossJoin(dims)
    grid.join(weekly, Seq("week", "dim"), "left")
      .na.fill(0, fillZero)
  }
}
