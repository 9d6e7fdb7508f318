package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RankFusionSpec extends SparkTestBase {
  import spark.implicits._

  private def fuse(rows: Seq[(String, Long, Long, Long)], k: Int, topN: Int) =
    RankFusion.rrfFuse(rows.toDF("part", "id", "s1", "s2"), "part", "id",
      Seq(col("s1"), col("s2")), k, topN)
      .select("part", "id", "rank_1", "rank_2", "rrf", "fused_rank")
      .as[(String, Long, Long, Long, Double, Long)]
      .collect().sortBy(r => (r._1, r._6))

  test("hand case: agreement near the top wins over one spike") {
    // doc 1 is rank 1 on both signals; doc 2 tops s1 but tanks s2
    val rows = Seq(
      ("x", 1L, 50L, 50L), ("x", 2L, 90L, 10L), ("x", 3L, 40L, 45L))
    val got = fuse(rows, k = 60, topN = 10)
    // s1 ranks: 2,1,3 → doc1 r=2; s2 ranks: 1,3,2
    assert(got.map(r => (r._2, r._3, r._4)) ===
      Seq((1L, 2L, 1L), (2L, 1L, 3L), (3L, 3L, 2L)))
    val rrf1 = math.floor((1.0 / 62 + 1.0 / 61) * 10000 + 0.5) / 10000
    assert(got.head._2 === 1L && got.head._5 === rrf1)
  }

  test("rrf ties break by id; topN truncates per stratum") {
    // symmetric ranks: both docs score 1/(k+1) + 1/(k+2) → id order
    val rows = Seq(("x", 7L, 10L, 5L), ("x", 3L, 5L, 10L))
    val got = fuse(rows, k = 1, topN = 1)
    assert(got.map(_._2) === Seq(3L))
    assert(got.head._6 === 1L)
  }

  test("strata rank independently — no cross-partition leakage") {
    val rows = Seq(
      ("a", 1L, 100L, 100L), ("a", 2L, 1L, 1L),
      ("b", 9L, 1L, 1L))
    val got = fuse(rows, k = 60, topN = 10)
    // the lone doc of stratum b is its rank-1 on everything
    val b = got.filter(_._1 == "b").head
    assert((b._3, b._4, b._6) === ((1L, 1L, 1L)))
    assert(got.count(_._1 == "a") === 2)
  }

  test("mmrRerank: a near-duplicate of the top pick is demoted below a diverse doc") {
    // query 0: cid 1 (rel 900) and cid 2 (rel 890) are near-identical
    // (sim 880); cid 3 (rel 500) is unrelated (sim 0 to both). Pure
    // relevance orders 1, 2, 3 — MMR at lambda = 1/2 picks 1, then scores
    // 2 at 890-880 = 10 vs 3 at 500-0 = 500, so the diverse doc wins
    // rank 2 and the paraphrase drops to rank 3.
    val cands = Seq(
      (0L, 1L, 900L), (0L, 2L, 890L), (0L, 3L, 500L))
      .toDF("qid", "cid", "rel_q")
    val sims = Seq(
      (0L, 1L, 2L, 880L), (0L, 2L, 1L, 880L),
      (0L, 1L, 3L, 0L), (0L, 3L, 1L, 0L),
      (0L, 2L, 3L, 0L), (0L, 3L, 2L, 0L))
      .toDF("qid", "ca", "cb", "sim_q")
    val got = RankFusion.mmrRerank(cands, sims, k = 3)
      .orderBy("qid", "mmr_rank")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 1L), (2L, 3L), (3L, 2L)))
    // k above the candidate count stops cleanly at the available rows
    val short = RankFusion.mmrRerank(cands, sims, k = 5).count()
    assert(short === 3L)
    // score ties resolve to the smaller cid: two equal-rel, equally
    // dissimilar docs pick in id order
    val tie = RankFusion.mmrRerank(
      Seq((7L, 5L, 100L), (7L, 9L, 100L)).toDF("qid", "cid", "rel_q"),
      Seq((7L, 5L, 9L, 0L), (7L, 9L, 5L, 0L)).toDF("qid", "ca", "cb", "sim_q"),
      k = 2).orderBy("mmr_rank")
      .collect().map(_.getLong(2)).toSeq
    assert(tie === Seq(5L, 9L))
  }
}
