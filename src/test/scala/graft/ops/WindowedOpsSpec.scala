package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins weekly-aggregation, densification, rolling, and anomaly edge
  * semantics from SURVEY.md §5.2 / FIXTURES.md §2.
  */
class WindowedOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def weekly(rows: Seq[(String, String, Long, Option[Double])]) =
    rows.map { case (w, d, t, p) => (ts(w + " 00:00:00"), d, t, p) }
      .toDF("week", "dim", "transactions", "price_mean")

  test("A1-A4: all-null price group → null mean/median/percentiles, nunique skips nulls") {
    val df = Seq(
      (ts("2024-01-01 10:00:00"), "x", Some(1L), None: Option[Double]),
      (ts("2024-01-02 10:00:00"), "x", Some(1L), None),
      (ts("2024-01-03 10:00:00"), "x", None: Option[Long], None))
      .toDF("d", "la", "id", "price")
    val out = WeeklyAgg.weeklyStats(df, $"d", $"la", $"id", $"price").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("transactions") == 1L)  // nunique skips null ids
    assert(r.isNullAt(r.fieldIndex("price_mean")))
    assert(r.isNullAt(r.fieldIndex("price_median")))
    assert(r.isNullAt(r.fieldIndex("price_p10")))
  }

  test("exactMode: deterministic tie-break on the smaller value; nulls excluded") {
    val df = Seq(
      ("k", Some(3L)), ("k", Some(3L)), ("k", Some(1L)), ("k", Some(1L)),
      ("k", Some(9L)), ("k", None),
      ("m", Some(7L)))
      .toDF("key", "v")
    val out = WeeklyAgg.exactMode(df, "key", "v")
      .select("key", "mode_value", "n_mode")
      .as[(String, Long, Long)].collect()
      .map { case (k, v, n) => k -> ((v, n)) }.toMap
    // 1 and 3 both appear twice; the tie resolves to the SMALLER value —
    // a fixed rule, not encounter order (built-in mode() is layout-
    // dependent on exactly this input)
    assert(out("k") == ((1L, 2L)))
    assert(out("m") == ((7L, 1L)))
  }

  test("A5 typeBreakdown counts rows including null categories (size() parity)") {
    val df = Seq(
      (ts("2024-01-01 10:00:00"), "x", Some(" D ")),
      (ts("2024-01-01 11:00:00"), "x", None: Option[String]))
      .toDF("d", "la", "ptype")
    val out = WeeklyAgg.typeBreakdown(df, $"d", $"la", $"ptype")
      .select("category", "count").as[(Option[String], Long)].collect().toMap
    assert(out(Some("d")) == 1L)
    assert(out.size == 2)  // null-category row still counted
  }

  test("J2/J3/P12 densify fills missing weeks with 0 transactions, null prices") {
    val w = weekly(Seq(
      ("2024-01-01", "a", 5L, Some(10.0)),
      ("2024-01-15", "a", 3L, Some(20.0)),   // 2024-01-08 missing
      ("2024-01-01", "b", 1L, Some(1.0))))
    val dense = Densify.densify(w, Seq("transactions"))
    assert(dense.count() == 6)  // 3 weeks x 2 dims
    val gap = dense.where($"dim" === "a" && $"week" === ts("2024-01-08 00:00:00"))
      .collect().head
    assert(gap.getAs[Long]("transactions") == 0L)
    assert(gap.isNullAt(gap.fieldIndex("price_mean")))
    // densification preserves total transactions
    assert(dense.agg(sum("transactions")).as[Long].collect().head == 9L)
  }

  test("W1/W2 rolling: min_periods=1 partial head frames; null-skipping mean") {
    val dense = weekly(Seq(
      ("2024-01-01", "a", 1L, Some(10.0)),
      ("2024-01-08", "a", 2L, None),
      ("2024-01-15", "a", 3L, Some(30.0)),
      ("2024-01-22", "a", 4L, Some(50.0))))
    val out = Rolling.rollingWindows(dense, Seq(3))
      .orderBy("week").collect()
    assert(out.map(_.getAs[Long]("rolling_trans")).toSeq == Seq(1L, 3L, 6L, 9L))
    val means = out.map(r => Option(r.getAs[java.lang.Double]("rolling_price_mean")).map(_.toDouble))
    // head frame = {10}; then {10,null}→10; {10,null,30}→20; {null,30,50}→40
    assert(means.toSeq == Seq(Some(10.0), Some(10.0), Some(20.0), Some(40.0)))
  }

  test("W3 z-score: constant series → 0.0, single-row group → 0.0, ddof=1") {
    val wins = Seq(
      (ts("2024-01-01 00:00:00"), "const", 5L, 5L),
      (ts("2024-01-08 00:00:00"), "const", 5L, 5L),
      (ts("2024-01-01 00:00:00"), "single", 7L, 7L),
      (ts("2024-01-01 00:00:00"), "var", 1L, 1L),
      (ts("2024-01-08 00:00:00"), "var", 3L, 3L))
      .toDF("week", "dim", "transactions", "rolling_trans")
    val out = Anomaly.detectAnomalies(wins)
      .select("dim", "z_transactions").as[(String, Double)].collect()
    assert(out.filter(_._1 == "const").forall(_._2 == 0.0))
    assert(out.filter(_._1 == "single").forall(_._2 == 0.0))
    // var: mean 2, stddev_samp = sqrt(2) → z = ±1/sqrt(2) ≈ ±0.70711 → ±0.7071
    val zv = out.filter(_._1 == "var").map(_._2).sorted
    assert(zv.toSeq == Seq(-0.7071, 0.7071))
  }

  test("W4 + SO2: multi-window stack tags window_weeks, UNION ALL no dedup") {
    val dense = weekly(Seq(("2024-01-01", "a", 1L, Some(1.0)),
      ("2024-01-08", "a", 2L, Some(2.0))))
    val out = Rolling.rollingWindows(dense, Seq(2, 4))
    assert(out.count() == 4)
    assert(out.select("window_weeks").distinct().as[Int].collect().sorted.toSeq == Seq(2, 4))
  }

  test("Rolling.yoy: lag 52 densified weeks") {
    val rows = (0 until 60).map(i =>
      (new java.sql.Timestamp(ts("2023-01-02 00:00:00").getTime + i * 7L * 86400 * 1000),
        "a", i.toLong, Some(1.0)))
    val dense = rows.toDF("week", "dim", "transactions", "price_mean")
    val out = Rolling.yoy(dense, "transactions")
      .where($"prev_year".isNotNull)
    assert(out.count() == 8)
    val first = out.orderBy("week").select("transactions", "prev_year", "yoy_change")
      .as[(Long, Long, Long)].collect().head
    assert(first == ((52L, 0L, 52L)))
  }

  test("AsOfJoin.asofBackward picks latest at-or-before value per key") {
    val right = Seq(("a", ts("2024-01-01 10:00:00"), 10.0),
      ("a", ts("2024-01-03 10:00:00"), 30.0),
      ("b", ts("2024-01-02 10:00:00"), 99.0))
      .toDF("k", "ts", "rate")
    val left = Seq(("a", ts("2024-01-01 09:00:00"), 1L),  // before any → null
      ("a", ts("2024-01-02 00:00:00"), 2L),               // → 10.0
      ("a", ts("2024-01-03 10:00:00"), 3L),               // same instant → 30.0
      ("a", ts("2024-01-09 00:00:00"), 4L),               // → 30.0
      ("b", ts("2024-01-05 00:00:00"), 5L))               // → 99.0
      .toDF("k", "ts", "id")
    val got = AsOfJoin.asofBackward(left, right, "k", "ts", "rate")
      .select("id", "asof_value").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got == Map(1L -> None, 2L -> Some(10.0), 3L -> Some(30.0),
      4L -> Some(30.0), 5L -> Some(99.0)))
  }

  test("AsOfJoin.asofBackward: a NULL-timestamp lookup row never back-fills probes") {
    // nulls-first ordering would have carried the null-ts row's value onto
    // every probe with no real predecessor; DuckDB's native ASOF (the
    // oracle) treats ts >= NULL as no-match — so must we.
    val right = Seq(("a", null.asInstanceOf[java.sql.Timestamp], 42.0),
      ("a", ts("2024-01-02 10:00:00"), 10.0))
      .toDF("k", "ts", "rate")
    val left = Seq(("a", ts("2024-01-01 00:00:00"), 1L),  // before any real row
      ("a", ts("2024-01-03 00:00:00"), 2L))               // → 10.0
      .toDF("k", "ts", "id")
    val got = AsOfJoin.asofBackward(left, right, "k", "ts", "rate")
      .select("id", "asof_value").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got == Map(1L -> None, 2L -> Some(10.0)))
  }

  test("AsOfJoin.asofBackward handles a non-orderable (map) value column") {
    // MapType cannot appear in a sort order; the marker tie-break must be
    // skipped (not fail analysis) while the asof semantics still hold.
    val right = Seq(("a", ts("2024-01-01 10:00:00"), Map("v" -> 1)),
      ("a", ts("2024-01-03 10:00:00"), Map("v" -> 3)))
      .toDF("k", "ts", "attrs")
    val left = Seq(("a", ts("2024-01-02 00:00:00"), 1L),
      ("a", ts("2024-01-04 00:00:00"), 2L),
      ("a", ts("2024-01-01 00:00:00"), 3L))
      .toDF("k", "ts", "id")
    val got = AsOfJoin.asofBackward(left, right, "k", "ts", "attrs")
      .select("id", "asof_value").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isDefined && got(2L).isDefined && got(3L).isEmpty)
    val m2 = AsOfJoin.asofBackward(left, right, "k", "ts", "attrs")
      .where($"id" === 2L).select("asof_value")
      .collect().head.getMap[String, Int](0)
    assert(m2 == Map("v" -> 3))
  }

  test("Snapshot.latestWeek keeps only the max week") {
    val df = weekly(Seq(("2024-01-01", "a", 1L, None),
      ("2024-01-08", "a", 2L, None), ("2024-01-08", "b", 3L, None)))
    val out = Snapshot.latestWeek(df)
    assert(out.count() == 2)
    assert(out.select("week").distinct().collect().head.getTimestamp(0) ==
      ts("2024-01-08 00:00:00"))
  }
}
