package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) — the
  * standard way a retrieval stack merges rankings from incomparable
  * signals (BM25 vs embedding distance vs quality prior) without score
  * calibration: each signal contributes `1 / (k + rank)`, so agreement
  * near the top dominates and a signal's score SCALE is irrelevant.
  *
  * Scale design: every ranking here is a window partitioned by the
  * stratum column — there is deliberately NO global-ranking variant,
  * because `row_number()` over an unpartitioned frame is a single-task
  * sort of the corpus (the exact trap [[SetSimJoin]]'s scaladoc names).
  * Fusing within strata (language, source, query-shard) is both the
  * retrieval-correct shape (rankings only compose within one candidate
  * pool) and the distributed-correct one: m+1 window columns share one
  * `(stratum)` exchange, each adding only its own sort.
  *
  * Determinism: ranks are exact ints (ties broken by the id column);
  * the fused score is a fixed left-associated sum of `1/(k + rank)`
  * quotients — identical IEEE doubles in any engine — rounded 4 dp, and
  * the fused rank re-ranks by that ROUNDED score with the id tie-break,
  * so rounding collisions stay deterministic too.
  */
object RankFusion {

  /** Top `topN` rows per `partCol` stratum by RRF over `signals` (each
    * ranked descending, ties → ascending `idCol`). Adds `rank_1..rank_m`,
    * `rrf`, `fused_rank`.
    */
  def rrfFuse(df: DataFrame, partCol: String, idCol: String,
              signals: Seq[Column], k: Int = 60, topN: Int = 10): DataFrame = {
    require(signals.nonEmpty, "rrfFuse needs at least one signal")
    require(k >= 1, s"k=$k must be positive")
    require(topN >= 1, s"topN=$topN must be positive")
    val ranked = signals.zipWithIndex.foldLeft(df) { case (d, (sig, i)) =>
      d.withColumn(s"rank_${i + 1}", row_number().over(
        Window.partitionBy(col(partCol))
          .orderBy(sig.desc, col(idCol).asc)).cast("long"))
    }
    val rrf = signals.indices
      .map(i => lit(1.0) /
        (lit(k).cast("double") + col(s"rank_${i + 1}").cast("double")))
      .reduce(_ + _)
    ranked
      .withColumn("rrf", CoreOps.rnd(rrf))
      .withColumn("fused_rank", row_number().over(
        Window.partitionBy(col(partCol))
          .orderBy(col("rrf").desc, col(idCol).asc)).cast("long"))
      .where(col("fused_rank") <= topN)
  }
}
