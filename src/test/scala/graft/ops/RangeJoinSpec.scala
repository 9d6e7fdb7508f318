package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("pointInIntervalJoin: closed bounds, multi-cell intervals, key isolation") {
    val points = Seq(
      (1L, "2024-01-01 10:00:00", 1L),  // == start: contained (closed)
      (1L, "2024-01-01 13:30:00", 2L),  // interior, 3.5h in — interval spans cells
      (1L, "2024-01-01 15:00:00", 3L),  // == end: contained (closed)
      (1L, "2024-01-01 15:00:01", 4L),  // 1 s past end: out
      (2L, "2024-01-01 11:00:00", 5L))  // other key: no interval
      .toDF("user", "t", "pid")
      .select(col("user"), col("t").cast("timestamp").as("pt"), col("pid"))
    val intervals = Seq((1L, "2024-01-01 10:00:00", "2024-01-01 15:00:00", 100L))
      .toDF("iuser", "s", "e", "iid")
      .select(col("iuser"), col("s").cast("timestamp").as("istart"),
        col("e").cast("timestamp").as("iend"), col("iid"))
    val out = RangeJoin.pointInIntervalJoin(points, "user", "pt",
      intervals, "iuser", "istart", "iend", cellMs = 3600000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
    assert(out === Seq((1L, 100L), (2L, 100L), (3L, 100L)))
  }

  test("pointInIntervalJoin: overlapping intervals each match; no dup per pair") {
    val points = Seq((1L, "2024-01-01 10:30:00", 1L))
      .toDF("user", "t", "pid")
      .select(col("user"), col("t").cast("timestamp").as("pt"), col("pid"))
    val intervals = Seq(
      (1L, "2024-01-01 09:00:00", "2024-01-01 11:00:00", 100L), // contains, 3 cells
      (1L, "2024-01-01 10:00:00", "2024-01-01 10:59:00", 200L), // contains, 1 cell
      (1L, "2024-01-01 11:00:00", "2024-01-01 12:00:00", 300L)) // after
      .toDF("iuser", "s", "e", "iid")
      .select(col("iuser"), col("s").cast("timestamp").as("istart"),
        col("e").cast("timestamp").as("iend"), col("iid"))
    val out = RangeJoin.pointInIntervalJoin(points, "user", "pt",
      intervals, "iuser", "istart", "iend", cellMs = 3600000L)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq.sorted
    // pid 1 matches 100 and 200 exactly once each, despite interval 100
    // spanning several cells — the point meets it only in its own cell
    assert(out === Seq((1L, 100L), (1L, 200L)))
  }

  test("pointInIntervalJoin plan: equi-join on (key, cell), no nested loop") {
    val points = Seq((1L, "2024-01-01 10:00:00", 1L))
      .toDF("user", "t", "pid")
      .select(col("user"), col("t").cast("timestamp").as("pt"), col("pid"))
    val intervals = Seq((1L, "2024-01-01 09:00:00", "2024-01-01 11:00:00", 9L))
      .toDF("iuser", "s", "e", "iid")
      .select(col("iuser"), col("s").cast("timestamp").as("istart"),
        col("e").cast("timestamp").as("iend"), col("iid"))
    val plan = RangeJoin.pointInIntervalJoin(points, "user", "pt",
      intervals, "iuser", "istart", "iend", 3600000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("pointInIntervalJoin rejects colliding column names") {
    val df = Seq((1L, 2L)).toDF("user", "x")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInIntervalJoin(df, "user", "x", df, "user", "x", "x", 1000L)
    }
  }

  test("selfTimeRangeJoin: pairs within tolerance, each unordered pair once") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L),
      (1L, "2024-01-01 10:00:30", 2L),  // 30 s from 1: pair
      (1L, "2024-01-01 10:02:00", 3L),  // 90 s from 2: out at 60 s tol
      (2L, "2024-01-01 10:00:10", 4L))  // other key: never pairs
      .toDF("user", "t", "id")
      .select(col("user"), col("t").cast("timestamp").as("ts"), col("id"))
    val out = RangeJoin.selfTimeRangeJoin(df, "user", "ts", "id", 60000L)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq.sorted
    assert(out === Seq((1L, 2L)))
  }
}
