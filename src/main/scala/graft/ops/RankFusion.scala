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

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein, SIGIR
    * 1998) at λ = 1/2 over a BOUNDED per-query candidate frame: greedily
    * pick the candidate maximizing `relevance − max similarity to the
    * already-selected set` — the diversity pass a retrieval stack runs
    * after fusion so the result page isn't five paraphrases of one
    * document. At λ = 1/2 the MMR objective's ranking is EXACTLY
    * `rel − maxSim`, so with both scores quantized to integer units the
    * whole greedy trace is deterministic (ties → smaller candidate id)
    * and replays bit-for-bit in the oracle.
    *
    * The selection is inherently sequential (each pick changes the next
    * penalty), so the k steps unroll into the plan: step t anti-joins the
    * previous selection, attaches each survivor's max similarity INTO the
    * selection, and takes the per-query argmax via a (score, id)
    * struct-max aggregation — every step over candidate-bounded frames
    * (`candidates` per query × queries), never the corpus. Each
    * generation is localCheckpointed: the selection feeds the next step
    * twice (anti-join + penalty join), and an unrolled lazy plan would
    * double per step. The pairwise similarity frame is computed ONCE and
    * shared by all steps.
    *
    * @param candidates (qid, cid, rel_q) — bounded per-query candidates,
    *                   integer-quantized relevance
    * @param sims       (qid, ca, cb, sim_q) — pairwise candidate
    *                   similarities within each query, integer-quantized,
    *                   both directions
    * @param k          picks per query
    * @return (qid, mmr_rank, cid, rel_q)
    */
  def mmrRerank(candidates: DataFrame, sims: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    val cand = candidates.select(col("qid"), col("cid"), col("rel_q"))
      .localCheckpoint(true)
    val sim = sims.select(col("qid"), col("ca"), col("cb"), col("sim_q"))
      .localCheckpoint(true)
    def argmax(df: DataFrame, score: Column, rank: Int): DataFrame =
      df.groupBy(col("qid"))
        .agg(max(struct(score.as("s"), (lit(0L) - col("cid")).as("nc"),
          col("cid").as("cid"), col("rel_q").as("rel_q"))).as("__w"))
        .select(col("qid"), lit(rank.toLong).as("mmr_rank"),
          col("__w.cid").as("cid"), col("__w.rel_q").as("rel_q"))
    var selected = argmax(cand, col("rel_q"), 1).localCheckpoint(true)
    for (t <- 2 to k) {
      val penalty = selected
        .join(sim, col("cb") === selected("cid") && sim("qid") === selected("qid"))
        .groupBy(sim("qid").as("qid2"), col("ca"))
        .agg(max(col("sim_q")).as("__sm"))
      val pick = cand
        .join(selected.select(col("qid"), col("cid")), Seq("qid", "cid"),
          "left_anti")
        .join(penalty, col("qid") === col("qid2") && col("cid") === col("ca"),
          "left")
        .select(col("qid"), col("cid"), col("rel_q"),
          (col("rel_q") - coalesce(col("__sm"), lit(0L))).as("__score"))
      selected = selected
        .unionByName(argmax(pick, col("__score"), t)
          .select("qid", "mmr_rank", "cid", "rel_q"))
        .localCheckpoint(true)
    }
    selected
  }
}
