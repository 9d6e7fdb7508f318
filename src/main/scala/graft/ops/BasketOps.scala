package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence: which item pairs appear in the same basket
  * more often than their solo popularity predicts (extension tier — the
  * association-rule screen a merchandising or corpus-curation pipeline runs
  * over transaction logs).
  *
  * Scale design: the pair generator is a self-join on the basket key — the
  * one market-basket step that can explode, because a basket of m items
  * emits m·(m−1)/2 pairs. Two guards keep it survivable at 100 TB:
  *
  *  - **Basket cap.** Baskets larger than `maxBasketSize` are dropped whole
  *    BEFORE pairing (the standard market-basket hygiene — a degenerate
  *    "basket" like a crawler session or a wholesale order contributes
  *    O(m²) pairs of near-zero analytical value). The cap bounds per-basket
  *    fan-out to a constant, so the pair stage is O(rows · cap), linear.
  *  - **Support floor.** Pairs below `minPairCount` drop at the aggregate,
  *    bounding the result to pairs with actual evidence.
  *
  * Both sides of the self-join arrive partitioned by basket from the sizing
  * window, so the join itself adds no exchange beyond the two inputs'
  * shared one; pair counts then shuffle on the (item, item) key — pair
  * cardinality, not row cardinality.
  */
object BasketOps {

  /** (item_a, item_b, n_ab, n_a, n_b, support, lift) for every unordered
    * item pair co-occurring in at least `minPairCount` capped baskets.
    *
    * `support` = n_ab / N and `lift` = N·n_ab / (n_a·n_b) where N counts
    * the baskets that survived the cap, and n_a/n_b count those baskets
    * containing each item (duplicate item rows collapse first). Counts are
    * exact longs; the two ratios are fixed IEEE expressions over exact
    * inputs, rounded 4 dp — products go through double BEFORE multiplying
    * (N·n_ab can pass 2^63 at warehouse scale; double keeps the quotient's
    * 4 dp exact far beyond that).
    */
  /** Distinct `(b, i)` incidence rows from baskets of at most
    * `maxBasketSize` distinct items — the shared front door of every
    * quadratic-in-basket-size stage here and in [[GraphOps]]. One window
    * over the basket exchange; downstream self-joins reuse that
    * partitioning.
    */
  def cappedBasketItems(df: DataFrame, basketCol: String, itemCol: String,
                        maxBasketSize: Int): DataFrame = {
    require(maxBasketSize >= 2, s"maxBasketSize=$maxBasketSize: pairs need 2")
    df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .where(col("b").isNotNull && col("i").isNotNull)
      .distinct()
      .withColumn("__sz", count(lit(1)).over(Window.partitionBy(col("b"))))
      .where(col("__sz") <= maxBasketSize)
      .drop("__sz")
  }

  def copurchaseLift(df: DataFrame, basketCol: String, itemCol: String,
                     maxBasketSize: Int, minPairCount: Long): DataFrame =
    copurchaseLiftFromItems(
      cappedBasketItems(df, basketCol, itemCol, maxBasketSize), minPairCount)

  /** The lift computation over a prepared `(b, i)` incidence frame — split
    * out so callers sharing the capped incidence across several graph/basket
    * operators (SparkEntry's graph tier memoizes it) don't re-run the
    * sizing window per query.
    */
  def copurchaseLiftFromItems(sized: DataFrame,
                              minPairCount: Long): DataFrame = {
    require(minPairCount >= 1, s"minPairCount=$minPairCount must be positive")

    val nBaskets = sized.select(col("b")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCounts = sized.groupBy(col("i")).agg(count(lit(1)).as("n_i"))

    val pairs = sized.as("x")
      .join(sized.as("y"),
        col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("item_a"), col("y.i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairCount)

    val nD = col("n_baskets").cast("double")
    pairs
      .join(itemCounts.withColumnRenamed("n_i", "n_a"),
        col("item_a") === col("i")).drop("i")
      .join(itemCounts.withColumnRenamed("n_i", "n_b"),
        col("item_b") === col("i")).drop("i")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        CoreOps.rnd(col("n_ab").cast("double") / nD).as("support"),
        CoreOps.rnd(nD * col("n_ab").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
  }
}
