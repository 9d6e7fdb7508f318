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
}
