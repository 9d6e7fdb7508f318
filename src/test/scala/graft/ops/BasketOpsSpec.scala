package graft.ops

import graft.SparkTestBase

class BasketOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], cap: Int = 10, floor: Long = 1L) =
    BasketOps.copurchaseLift(rows.toDF("b", "i"), "b", "i", cap, floor)
      .orderBy("item_a", "item_b")
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSeq

  test("hand case: counts, support, and lift from exact basket algebra") {
    // baskets: {1,2}, {1,2}, {1,3}, {2} → N=4, n_1=3, n_2=3, n_3=1
    val rows = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 3L), (40L, 2L))
    val out = run(rows)
    // pair (1,2): n_ab=2, support=0.5, lift=4*2/(3*3)=0.8889
    // pair (1,3): n_ab=1, support=0.25, lift=4*1/(3*1)=1.3333
    assert(out === Seq(
      (1L, 2L, 2L, 3L, 3L, 0.5, 0.8889),
      (1L, 3L, 1L, 3L, 1L, 0.25, 1.3333)))
  }

  test("duplicate item rows in one basket collapse before pairing") {
    val rows = Seq((10L, 1L), (10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L))
    val out = run(rows)
    assert(out === Seq((1L, 2L, 2L, 2L, 2L, 1.0, 1.0)))
  }

  test("oversized baskets drop whole: their items vanish from N, n_i, and pairs") {
    // basket 99 has 3 items and would dominate; cap 2 removes it entirely
    val rows = Seq((10L, 1L), (10L, 2L),
      (99L, 1L), (99L, 2L), (99L, 3L))
    val out = run(rows, cap = 2)
    assert(out === Seq((1L, 2L, 1L, 1L, 1L, 1.0, 1.0)))
  }

  test("minPairCount floors the pair table") {
    val rows = Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L), (30L, 1L), (30L, 3L))
    val out = run(rows, floor = 2L)
    assert(out.map(r => (r._1, r._2, r._3)) === Seq((1L, 2L, 2L)))
  }

  test("lift above 1 flags over-represented pairs, below 1 under-represented") {
    // items 1,2 always together (2 of 4 baskets); items 3,4 never co-occur
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 3L), (4L, 4L))
    val out = run(rows)
    assert(out === Seq((1L, 2L, 2L, 2L, 2L, 0.5, 2.0)))
  }
}
