package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class EventAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toSeq.map { case (u, t, w) => (u, t, ts(w)) }
      .toDF("user_id", "event_type", "ts")

  test("funnel: ordered stages only — early stage-2 events don't count") {
    val df = ev(
      // u1: clean signup → click → purchase
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 11:00:00"),
      (1L, "purchase", "2024-01-01 12:00:00"),
      // u2: click BEFORE signup (ignored), later click counts, purchase
      // lands before that click → stage 3 not reached
      (2L, "click", "2024-01-01 09:00:00"),
      (2L, "signup", "2024-01-01 10:00:00"),
      (2L, "purchase", "2024-01-01 11:00:00"),
      (2L, "click", "2024-01-01 12:00:00"),
      // u3: signup only
      (3L, "signup", "2024-01-01 10:00:00"),
      // u4: never signed up — excluded from every stage
      (4L, "click", "2024-01-01 10:00:00"),
      (4L, "purchase", "2024-01-01 11:00:00"))
    val r = EventAnalytics.funnelSummary(df, "user_id", "ts", "event_type",
      Seq("signup", "click", "purchase")).head()
    assert(r.getAs[Long]("n_stage_0") === 3L)
    assert(r.getAs[Long]("n_stage_1") === 2L)
    assert(r.getAs[Long]("n_stage_2") === 1L)
    assert(r.getAs[Double]("conv_1") === 0.6667)
    assert(r.getAs[Double]("conv_2") === 0.5)
  }

  test("funnel: stage event AT the previous stage's timestamp counts (>=)") {
    val df = ev(
      (1L, "signup", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:00:00"))
    val r = EventAnalytics.funnelSummary(df, "user_id", "ts", "event_type",
      Seq("signup", "click")).head()
    assert(r.getAs[Long]("n_stage_1") === 1L)
  }

  test("cohortRetention: first-week cohorts, distinct weekly actives, whole-week offsets") {
    val df = ev(
      // u1: cohort 2024-01-01 week, active again two weeks later (twice in
      // the same week — counted once)
      (1L, "view", "2024-01-02 10:00:00"),
      (1L, "view", "2024-01-15 10:00:00"),
      (1L, "view", "2024-01-16 10:00:00"),
      // u2: cohort week 0, active week 1
      (2L, "view", "2024-01-03 10:00:00"),
      (2L, "view", "2024-01-08 10:00:00"),
      // u3: cohort week 1 only
      (3L, "view", "2024-01-10 10:00:00"))
    val out = EventAnalytics.cohortRetention(df, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01 00:00:00.0", 0L, 2L),
      ("2024-01-01 00:00:00.0", 1L, 1L),
      ("2024-01-01 00:00:00.0", 2L, 1L),
      ("2024-01-08 00:00:00.0", 0L, 1L)))
  }

  test("transitionMatrix: per-user sequences, last event drops, probs per from-row") {
    import spark.implicits._
    val df = Seq(
      // u1: a → b → a → b  (pairs a→b, b→a, a→b)
      (1L, 1L, "2024-01-01 10:00:00", "a"),
      (1L, 2L, "2024-01-01 10:01:00", "b"),
      (1L, 3L, "2024-01-01 10:02:00", "a"),
      (1L, 4L, "2024-01-01 10:03:00", "b"),
      // u2: a → c (no cross-user pair with u1's last b)
      (2L, 5L, "2024-01-01 11:00:00", "a"),
      (2L, 6L, "2024-01-01 11:05:00", "c"))
      .toDF("user_id", "event_id", "s", "event_type")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val out = EventAnalytics.transitionMatrix(df, "user_id", "ts", "event_id",
      "event_type")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("a", "b", 2L, 0.6667), ("a", "c", 1L, 0.3333), ("b", "a", 1L, 1.0)))
  }

  test("transitionMatrix: same-ts events pair deterministically by the tie column") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "x"), (1L, 11L, "y"), (1L, 12L, "z"))
      .toDF("user_id", "event_id", "event_type")
      .withColumn("ts", lit("2024-01-01 00:00:00").cast("timestamp"))
    val out = EventAnalytics.transitionMatrix(df, "user_id", "ts", "event_id",
      "event_type")
      .orderBy("from_type").as[(String, String, Long, Double)].collect().toSeq
    assert(out === Seq(("x", "y", 1L, 1.0), ("y", "z", 1L, 1.0)))
  }

  test("weeklyStreaks: consecutive weeks merge, gaps split, duplicates collapse") {
    import spark.implicits._
    val df = Seq(
      // k1: 3-week run (two hits in week 1 collapse), then a gap, then a singleton
      (1L, "2024-01-01 09:00:00"), (1L, "2024-01-03 09:00:00"),
      (1L, "2024-01-08 09:00:00"), (1L, "2024-01-15 09:00:00"),
      (1L, "2024-02-05 09:00:00"),
      // k2: independent singleton in k1's gap week
      (2L, "2024-01-22 09:00:00"))
      .toDF("k", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = EventAnalytics.weeklyStreaks(df, "k", "ts")
      .orderBy("key", "streak_start")
      .as[(Long, java.sql.Date, java.sql.Date, Long)].collect().toSeq
    def d(s: String) = java.sql.Date.valueOf(s)
    assert(out === Seq(
      (1L, d("2024-01-01"), d("2024-01-15"), 3L),
      (1L, d("2024-02-05"), d("2024-02-05"), 1L),
      (2L, d("2024-01-22"), d("2024-01-22"), 1L)))
  }

  test("weeklyChurn: lifecycle states and horizon-clipped churn") {
    import spark.implicits._
    // weeks W1=01-01 W2=01-08 W3=01-15 W4=01-22
    // k1 active W1,W2,W4: new@W1, retained@W2, churned@W3, resurrected@W4
    // k2 active W1 only:  new@W1, churned@W2
    // k3 active W4 only:  new@W4; its would-be churn at W5 is past horizon
    val df = Seq(
      (1L, "2024-01-01 09:00:00"), (1L, "2024-01-08 09:00:00"),
      (1L, "2024-01-22 09:00:00"),
      (2L, "2024-01-01 10:00:00"),
      (3L, "2024-01-22 11:00:00"))
      .toDF("k", "s").withColumn("ts", col("s").cast("timestamp"))
    val out = EventAnalytics.weeklyChurn(df, "k", "ts")
      .orderBy("week")
      .as[(java.sql.Date, Long, Long, Long, Long)].collect().toSeq
    def d(s: String) = java.sql.Date.valueOf(s)
    assert(out === Seq(
      (d("2024-01-01"), 2L, 0L, 0L, 0L),
      (d("2024-01-08"), 0L, 1L, 0L, 1L),
      (d("2024-01-15"), 0L, 0L, 0L, 1L),
      (d("2024-01-22"), 1L, 0L, 1L, 0L)))
  }

  test("topPaths: opening-prefix paths, short users keep their prefix") {
    import spark.implicits._
    // u1: A,B,C,D → A>B>C (depth 3 truncates); u2, u3: A,B → A>B (the
    // missing third step is skipped by concat_ws, not rendered as a
    // dangling separator)
    val ev = Seq(
      (1L, 1L, "A", 1L), (1L, 2L, "B", 2L), (1L, 3L, "C", 3L), (1L, 4L, "D", 4L),
      (2L, 1L, "A", 5L), (2L, 2L, "B", 6L),
      (3L, 1L, "A", 7L), (3L, 2L, "B", 8L))
      .toDF("user_id", "sec", "event_type", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = EventAnalytics.topPaths(ev, col("user_id"), col("ts"),
      col("event_type"), col("event_id")).orderBy("rnk")
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "A>B", 2L), (2L, "A>B>C", 1L)))
    // same-ts events order by the tie column, so the path is unique
    val tied = Seq((1L, 5L, "X", 2L), (1L, 5L, "Y", 1L))
      .toDF("user_id", "sec", "event_type", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val p = EventAnalytics.topPaths(tied, col("user_id"), col("ts"),
      col("event_type"), col("event_id"))
      .select("path").as[String].collect().head
    assert(p === "Y>X")
  }

  test("rfmSegments: hand-computed quintile grid on 5 separated customers") {
    import spark.implicits._
    // Customers 1..5: frequency 1..5, monetary 100..500 cents, last
    // dates 01-01..01-05 → recency 4..0. n=5: the IEEE products q·5 all
    // round to the exact integers (e.g. 0.2·5 → 1.0), so the ⌈q·n⌉ picks
    // are ranks (1,2,3,4) — thresholds are each metric's first four
    // order statistics and every customer lands on the diagonal:
    // customer c scores (c, c, c) with recency inverted into alignment.
    val rows = (1 to 5).flatMap { c =>
      (1 to c).map(i => (c.toLong, s"2020-01-0$c", 1.0))
    }
    val df = rows.toDF("cust", "ds", "amt")
      .withColumn("d", col("ds").cast("timestamp"))
    val got = EventAnalytics.rfmSegments(df, col("cust"), col("d"),
      graft.ops.CoreOps.moneyCents(col("amt")))
      .orderBy("r_score", "f_score", "m_score")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 1L, 1L, 1.0),
      (2L, 2L, 2L, 1L, 2.0),
      (3L, 3L, 3L, 1L, 3.0),
      (4L, 4L, 4L, 1L, 4.0),
      (5L, 5L, 5L, 1L, 5.0)))
  }

  test("attribution: first/last/linear micro-credit, remainder to last") {
    val df = Seq(
      // u1: ad → email → ad → purchase; the post-purchase click is out
      (1L, "ad", "2024-01-01 10:00:00", 1L),
      (1L, "email", "2024-01-01 11:00:00", 2L),
      (1L, "ad", "2024-01-01 12:00:00", 3L),
      (1L, "purchase", "2024-01-01 13:00:00", 4L),
      (1L, "email", "2024-01-01 14:00:00", 5L),
      // u2 converts with no prior touch → attributes nothing
      (2L, "purchase", "2024-01-01 09:00:00", 6L),
      // u3 touches but never converts → attributes nothing
      (3L, "ad", "2024-01-01 09:00:00", 7L))
      .map { case (u, e, t, id) => (u, e, ts(t), id) }
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = EventAnalytics.attribution(df, col("user_id"), col("ts"),
      col("event_type"), col("event_id"), "purchase")
      .orderBy("model", "channel")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    // u1's 3 touches: first = ad(rn1), last = ad(rn3); linear share
    // 1e6 div 3 = 333333 each, remainder 1 to the last touch; position
    // (U-shaped): endpoints 400000 each (both ad), middle email 200000.
    assert(got === Seq(
      ("first_touch", "ad", 2L, 1000000L, 1.0),
      ("first_touch", "email", 1L, 0L, 0.0),
      ("last_touch", "ad", 2L, 1000000L, 1.0),
      ("last_touch", "email", 1L, 0L, 0.0),
      ("linear", "ad", 2L, 666667L, 0.6667),
      ("linear", "email", 1L, 333333L, 0.3333),
      ("position", "ad", 2L, 800000L, 0.8),
      ("position", "email", 1L, 200000L, 0.2)))
  }

  test("attribution: per-model credit sums to exactly 1e6 per converter") {
    // 7 touches → linear share 142857 ×7 = 999999 and position middles
    // 200000 div 5 = 40000 ×5; each model's remainder must land on its
    // designated touch so every model's total is exactly 1e6.
    val touches = (1 to 7).map(i =>
      (1L, s"ch${i % 3}", ts(f"2024-01-01 0$i%d:00:00"), i.toLong))
    val df = (touches :+ ((1L, "purchase", ts("2024-01-01 09:00:00"), 8L)))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = EventAnalytics.attribution(df, col("user_id"), col("ts"),
      col("event_type"), col("event_id"), "purchase")
      .groupBy("model").agg(sum("credit_micro").as("c"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("first_touch" -> 1000000L, "last_touch" -> 1000000L,
      "linear" -> 1000000L, "position" -> 1000000L))
  }

  test("attribution position model: n=1 takes all, n=2 splits 50/50") {
    val df = Seq(
      (1L, "ad", "2024-01-01 10:00:00", 1L),
      (1L, "purchase", "2024-01-01 11:00:00", 2L),
      (2L, "ad", "2024-01-01 10:00:00", 3L),
      (2L, "email", "2024-01-01 11:00:00", 4L),
      (2L, "purchase", "2024-01-01 12:00:00", 5L))
      .map { case (u, e, t, id) => (u, e, ts(t), id) }
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = EventAnalytics.attribution(df, col("user_id"), col("ts"),
      col("event_type"), col("event_id"), "purchase")
      .where(col("model") === "position").orderBy("channel")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    // u1: single ad touch → 1e6; u2: ad and email → 500000 each
    assert(got === Seq(
      ("position", "ad", 2L, 1500000L, 1.5),
      ("position", "email", 1L, 500000L, 0.5)))
  }

  test("cohortLtv: cumulative revenue per cohort, truncating micro-cents") {
    val df = Seq(
      // cohort W0 (Mon 2024-01-01): u1 buys 500c wk0 + 300c wk1,
      // u2 active both weeks, never buys
      (1L, "purchase", "2024-01-02 10:00:00", Some(5.0)),
      (1L, "purchase", "2024-01-09 10:00:00", Some(3.0)),
      (2L, "view", "2024-01-03 10:00:00", None),
      (2L, "view", "2024-01-10 10:00:00", None),
      // cohort W1: u3 buys 100c in its week 0
      (3L, "purchase", "2024-01-08 10:00:00", Some(1.0)))
      .map { case (u, e, t, v) => (u, e, ts(t), v) }
      .toDF("user_id", "event_type", "ts", "value")
    val got = EventAnalytics.cohortLtv(df, col("user_id"), col("ts"),
      when(col("event_type") === "purchase",
        CoreOps.moneyCents(col("value")).cast("long")))
      .orderBy("cohort_week", "age_weeks")
      .as[(java.sql.Timestamp, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    def w(s: String) = ts(s + " 00:00:00")
    assert(got === Seq(
      (w("2024-01-01"), 0L, 2L, 2L, 500L, 500L, 250000000L),
      (w("2024-01-01"), 1L, 2L, 2L, 300L, 800L, 400000000L),
      (w("2024-01-08"), 0L, 1L, 1L, 100L, 100L, 100000000L)))
  }
}
