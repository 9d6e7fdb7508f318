package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  /** Quadratic reference dominance check — the definition, verbatim. */
  private def bruteSkyline(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    rows.filter { case (_, ma, mi) =>
      !rows.exists { case (_, bMa, bMi) =>
        bMa >= ma && bMi <= mi && (bMa > ma || bMi < mi)
      }
    }.toSet

  private def run(rows: Seq[(Long, Long, Long)], width: Long) =
    Skyline.skyline2d(rows.toDF("id", "ma", "mi"), col("ma"), col("mi"), width)
      .as[(Long, Long, Long)].collect().toSet

  test("hand case: dominated rows drop, frontier stays") {
    // (ma, mi): (10,5) dominates (9,6) and (10,6); (3,1) survives (best mi)
    val rows = Seq((1L, 10L, 5L), (2L, 9L, 6L), (3L, 10L, 6L), (4L, 3L, 1L), (5L, 7L, 3L))
    assert(run(rows, 4L) === Set((1L, 10L, 5L), (4L, 3L, 1L), (5L, 7L, 3L)))
  }

  test("exact ties on both axes are mutually non-dominating: all copies kept") {
    val rows = Seq((1L, 10L, 5L), (2L, 10L, 5L), (3L, 9L, 9L))
    assert(run(rows, 4L) === Set((1L, 10L, 5L), (2L, 10L, 5L)))
  }

  test("equal max with distinct min: only the best min survives") {
    val rows = Seq((1L, 10L, 5L), (2L, 10L, 4L), (3L, 10L, 6L))
    assert(run(rows, 100L) === Set((2L, 10L, 4L)))
  }

  test("matches brute-force dominance on a deterministic scatter, any bucket width") {
    val rows = Seq.tabulate(300) { i =>
      (i.toLong, ((i * 131) % 997).toLong, ((i * 271) % 883).toLong)
    }
    val expected = bruteSkyline(rows)
    for (width <- Seq(1L, 7L, 100L, 100000L))
      assert(run(rows, width) === expected, s"width=$width")
  }

  test("negative axis values bucket and judge correctly") {
    val rows = Seq((1L, -5L, -2L), (2L, -3L, -1L), (3L, -3L, -9L), (4L, -20L, -30L))
    // (-3,-9) dominates (-3,-1) and (-5,-2); (-20,-30) survives on min axis
    assert(run(rows, 4L) === Set((3L, -3L, -9L), (4L, -20L, -30L)))
  }

  test("single row and already-frontier input pass through") {
    assert(run(Seq((1L, 5L, 5L)), 10L) === Set((1L, 5L, 5L)))
    val frontier = Seq((1L, 30L, 10L), (2L, 20L, 5L), (3L, 10L, 1L))
    assert(run(frontier, 8L) === frontier.toSet)
  }
}
