package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.TextFunctions

/** Pins the edge semantics of the round-5 time-series tier
  * (TimeSeriesOps) and the per-source token budget cap
  * (CorpusOps.sourceBudgetCap).
  */
class TimeSeriesOpsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- slidingRangeStats ----

  private def events(rows: (Long, String, String, Option[Double])*) =
    rows.map { case (id, k, t, v) => (id, k, ts(t), v) }
      .toDF("event_id", "key", "ts", "value")

  test("slidingRangeStats: range frame is closed on both ends") {
    // window = 1h: an event EXACTLY 1h older is in frame; 1h+1ms is out.
    val df = events(
      (1L, "a", "2024-01-01 10:00:00", Some(1.0)),
      (2L, "a", "2024-01-01 11:00:00.000", Some(2.0)),  // sees #1 (boundary)
      (3L, "a", "2024-01-01 12:00:00.001", Some(4.0)))  // #2 out by 1 ms? no: 11:00→12:00.001 is 1h+1ms → only itself
    val out = TimeSeriesOps.slidingRangeStats(df, "key", "ts", "value",
      windowMs = 3600000L)
      .select("event_id", "n_window", "sum_window")
      .as[(Long, Long, Option[Double])].collect()
      .map { case (id, n, sm) => id -> ((n, sm)) }.toMap
    assert(out(1L) == ((1L, Some(1.0))))
    assert(out(2L) == ((2L, Some(3.0))))   // closed lower bound includes #1
    assert(out(3L) == ((1L, Some(4.0))))   // #2 is 1 ms outside the hour
  }

  test("slidingRangeStats: ties on the time axis are frame peers; null values counted but not summed") {
    val df = events(
      (1L, "a", "2024-01-01 10:00:00", Some(1.0)),
      (2L, "a", "2024-01-01 10:00:00", Some(2.0)),   // same instant → peer
      (3L, "b", "2024-01-01 10:30:00", None))        // lone null-value event
    val out = TimeSeriesOps.slidingRangeStats(df, "key", "ts", "value",
      windowMs = 3600000L)
      .select("event_id", "n_window", "sum_window")
      .as[(Long, Long, Option[Double])].collect()
      .map { case (id, n, sm) => id -> ((n, sm)) }.toMap
    // RANGE peers: both same-instant rows see each other regardless of order
    assert(out(1L) == ((2L, Some(3.0))))
    assert(out(2L) == ((2L, Some(3.0))))
    // count counts the row; the money sum has nothing non-null → null
    assert(out(3L) == ((1L, None)))
  }

  // ---- robustZScores ----

  test("robustZScores: median/MAD scores, outlier-resistant, exact dyadic arithmetic") {
    // values 1,2,3,4,100 → cents 100..400,10000; median 300, deviations
    // 200,100,0,100,9700 → MAD 100. z(3.0) = 0; z(100) = 9700/148.26.
    val df = Seq((1L, "k", 1.0), (2L, "k", 2.0), (3L, "k", 3.0),
      (4L, "k", 4.0), (5L, "k", 100.0))
      .toDF("event_id", "key", "value")
    val out = TimeSeriesOps.robustZScores(df, "key", "value")
      .select("event_id", "robust_z").as[(Long, Double)].collect().toMap
    assert(out(3L) == 0.0)
    assert(out(5L) == math.floor(9700.0 / (1.4826 * 100.0) * 10000 + 0.5) / 10000)
    // mean/std z would have dragged the center toward the outlier; the
    // median/MAD center stays at 3.0 so the inliers score small
    assert(math.abs(out(1L)) <= 1.35 && math.abs(out(4L)) <= 0.68)
  }

  test("robustZScores: MAD == 0 degrades to 0.0; null value stays null") {
    val df = Seq((1L, "k", Some(5.0)), (2L, "k", Some(5.0)),
      (3L, "k", Some(5.0)), (4L, "k", Some(9.0)), (5L, "k", None))
      .toDF("event_id", "key", "value")
    val out = TimeSeriesOps.robustZScores(df, "key", "value")
      .select("event_id", "robust_z").as[(Long, Option[Double])]
      .collect().toMap
    // median 500, deviations 0,0,0,400 → MAD 0 → all defined rows 0.0
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_) == Some(0.0)))
    assert(out(5L).isEmpty)
  }

  // ---- interpolateGaps ----

  private def dense(rows: (String, String, Option[Double])*) =
    rows.map { case (w, d, v) => (ts(w + " 00:00:00"), d, v) }
      .toDF("week", "dim", "price_mean")

  test("interpolateGaps: interior gap lerps by calendar distance, edges stay null") {
    val df = dense(
      ("2024-01-01", "a", None),           // leading edge: no predecessor
      ("2024-01-08", "a", Some(10.0)),
      ("2024-01-15", "a", None),           // interior: 1/3 of 10→40 span
      ("2024-01-22", "a", None),           // interior: 2/3 of the span
      ("2024-01-29", "a", Some(40.0)),
      ("2024-02-05", "a", None))           // trailing edge: no successor
    val out = TimeSeriesOps.interpolateGaps(df, "price_mean")
      .select("week", "price_mean_interp", "is_interpolated")
      .as[(java.sql.Timestamp, Option[Double], Boolean)].collect()
      .map { case (w, v, f) => w.toString.take(10) -> ((v, f)) }.toMap
    assert(out("2024-01-01") == ((None, false)))
    assert(out("2024-01-08") == ((Some(10.0), false)))   // observed passthrough
    assert(out("2024-01-15") == ((Some(20.0), true)))    // 10 + 30 * 7/21
    assert(out("2024-01-22") == ((Some(30.0), true)))    // 10 + 30 * 14/21
    assert(out("2024-02-05") == ((None, false)))
  }

  test("interpolateGaps: partitions do not leak neighbors across dims") {
    val df = dense(
      ("2024-01-01", "a", Some(10.0)),
      ("2024-01-08", "b", None),           // b has NO observed rows at all
      ("2024-01-15", "a", Some(20.0)))
    val out = TimeSeriesOps.interpolateGaps(df, "price_mean")
      .where($"dim" === "b")
      .select("price_mean_interp", "is_interpolated")
      .as[(Option[Double], Boolean)].collect()
    assert(out.toSeq == Seq((None, false)))
  }

  // ---- ewmaFinite ----

  test("ewmaFinite: dyadic decay, head renormalization, null taps skipped") {
    val df = dense(
      ("2024-01-01", "a", Some(4.0)),
      ("2024-01-08", "a", Some(2.0)),
      ("2024-01-15", "a", None),
      ("2024-01-22", "a", Some(8.0)))
    val out = TimeSeriesOps.ewmaFinite(df, "dim", "week", "price_mean",
      taps = 4)
      .select("week", "ewma")
      .as[(java.sql.Timestamp, Option[Double])].collect()
      .map { case (w, v) => w.toString.take(10) -> v }.toMap
    // head: only tap 0 present → ewma == value (weights renormalize)
    assert(out("2024-01-01") == Some(4.0))
    // (2*1 + 4*0.5) / 1.5 — exact dyadic terms, then portable rounding
    assert(out("2024-01-08") == Some(math.floor(4.0 / 1.5 * 10000 + 0.5) / 10000))
    // the null row itself still smooths from its lags: (2*.5 + 4*.25)/.75
    assert(out("2024-01-15") == Some(math.floor(2.0 / 0.75 * 10000 + 0.5) / 10000))
    // null tap skipped mid-chain: (8*1 + 2*.25 + 4*.125) / 1.375
    assert(out("2024-01-22") == Some(math.floor(9.0 / 1.375 * 10000 + 0.5) / 10000))
  }

  test("ewmaFinite: all-null window yields null, not a zero-division") {
    val df = dense(("2024-01-01", "a", None), ("2024-01-08", "a", None))
    val out = TimeSeriesOps.ewmaFinite(df, "dim", "week", "price_mean",
      taps = 2)
      .select("ewma").as[Option[Double]].collect()
    assert(out.forall(_.isEmpty))
  }

  // ---- sourceBudgetCap ----

  test("sourceBudgetCap: clean prefix cut in md5 pick order, per source") {
    val df = Seq(
      (1L, "s1", "a b c"), (2L, "s1", "d e"), (3L, "s1", "f g h i"),
      (4L, "s2", "x"))
      .toDF("doc_id", "source", "text")
    val out = CorpusOps.sourceBudgetCap(df, "source", "doc_id",
      TextFunctions.tokenCount(col("text")), budget = 5)
      .select("doc_id", "source", "n_tokens", "cum_tokens")
      .as[(Long, String, Long, Long)].collect()
    val s1 = out.filter(_._2 == "s1")
    // whatever md5 order picked: the kept set is a prefix — cum is the
    // running sum of kept rows only and never exceeds the budget
    assert(s1.map(_._4).max <= 5)
    assert(s1.map(_._3).sum == s1.map(_._4).max)
    // s2's single 1-token doc always fits
    assert(out.filter(_._2 == "s2").map(_._1).toSeq == Seq(4L))
    // deterministic across runs
    val again = CorpusOps.sourceBudgetCap(df, "source", "doc_id",
      TextFunctions.tokenCount(col("text")), budget = 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == out.map(_._1).sorted.toSeq)
  }

  test("sourceBudgetCap: budget beyond the total keeps every row") {
    val df = Seq((1L, "s", "a b"), (2L, "s", "c"))
      .toDF("doc_id", "source", "text")
    val out = CorpusOps.sourceBudgetCap(df, "source", "doc_id",
      TextFunctions.tokenCount(col("text")), budget = 1000L)
    assert(out.count() == 2)
    // the audit column reports the full running total
    assert(out.agg(max("cum_tokens")).as[Long].head() == 3L)
  }

  // ---- cusumChangepoints ----

  private def cusumRun(rows: Seq[(String, Int, Long)], thresholdCents: Long) =
    TimeSeriesOps.cusumChangepoints(
      rows.toDF("k", "t", "cents"), "k", "t", "cents", thresholdCents)
      .select("k", "t", "cusum_up", "cusum_down", "alarm_up", "alarm_down")
      .as[(String, Int, Double, Double, Boolean, Boolean)]
      .collect().sortBy(r => (r._1, r._2))

  /** The sequential textbook recursion the closed form must reproduce. */
  private def cusumBrute(xs: Seq[Long]): (Seq[Double], Seq[Double]) = {
    val n = xs.size.toLong
    val tot = xs.sum
    val ys = xs.map(x => n * x - tot)
    val up = ys.scanLeft(0L)((s, y) => math.max(0L, s + y)).tail
    val dn = ys.scanLeft(0L)((s, y) => math.max(0L, s - y)).tail
    (up.map(_.toDouble / n / 100.0), dn.map(_.toDouble / n / 100.0))
  }

  test("cusumChangepoints: closed form equals the sequential recursion") {
    // a step change: mean 100 for 5 steps then 300 for 5 steps (cents)
    val xs = Seq(100L, 90L, 110L, 100L, 100L, 300L, 310L, 290L, 300L, 300L)
    val (upB, dnB) = cusumBrute(xs)
    val got = cusumRun(xs.zipWithIndex.map { case (x, i) => ("a", i, x) }, 200L)
    got.zipWithIndex.foreach { case ((_, _, u, d, _, _), i) =>
      assert(u === math.floor(upB(i) * 10000 + 0.5) / 10000, s"up at $i")
      assert(d === math.floor(dnB(i) * 10000 + 0.5) / 10000, s"dn at $i")
    }
    // the upward alarm fires after the level shift, never before it
    val alarmAt = got.filter(_._5).map(_._2)
    assert(alarmAt.nonEmpty && alarmAt.min >= 5, got.mkString("\n"))
  }

  test("cusumChangepoints: zero seed floors both sides on a monotone drift") {
    // monotone decreasing series: the down side accumulates toward the
    // trough while the up side never goes below the zero seed
    val xs = Seq(500L, 400L, 300L, 200L, 100L)
    val got = cusumRun(xs.zipWithIndex.map { case (x, i) => ("a", i, x) }, 100L)
    val (upB, dnB) = cusumBrute(xs)
    got.zipWithIndex.foreach { case ((_, _, u, d, _, _), i) =>
      assert(u === math.floor(upB(i) * 10000 + 0.5) / 10000)
      assert(d === math.floor(dnB(i) * 10000 + 0.5) / 10000)
    }
    assert(got.last._6, "down alarm should fire at the trough")
  }

  test("cusumChangepoints: keys do not leak into each other") {
    val a = Seq(100L, 100L, 900L)
    val b = Seq(500L, 500L, 500L)
    val rows = a.zipWithIndex.map { case (x, i) => ("a", i, x) } ++
      b.zipWithIndex.map { case (x, i) => ("b", i, x) }
    val got = cusumRun(rows, 100L)
    // the flat key never deviates from its own mean
    got.filter(_._1 == "b").foreach { r =>
      assert(r._3 === 0.0 && r._4 === 0.0 && !r._5 && !r._6)
    }
    // the stepped key alarms on its jump row
    assert(got.filter(_._1 == "a").last._5)
  }

  private def decompose(rows: Seq[(String, Long)]) =
    TimeSeriesOps.seasonalDecompose(rows.toDF("d", "v"),
      to_date(col("d")), col("v"))
      .orderBy("day")
      .select(col("day").cast("string"), col("y"), col("trend"),
        col("seasonal"), col("resid"))
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq

  test("seasonalDecompose: a pure weekly pattern lands entirely in seasonal") {
    // 21 days from Mon 2024-01-01: Mondays 200, everything else 100.
    // Every interior 7-day window spans each weekday once → trend is the
    // constant weekly mean 800/7; seasonal absorbs the Monday bump
    // exactly; interior residuals are exactly zero.
    val rows = (0 until 21).map { i =>
      val day = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      (day.toString, if (day.getDayOfWeek.getValue == 1) 200L else 100L)
    }
    val got = decompose(rows)
    val interior = got.slice(3, 18)
    interior.foreach(r => assert(r._3.contains(114.2857), r.toString))
    interior.foreach { r => assert(r._5.contains(0.0), r.toString) }
    val monday = got.find(_._1 == "2024-01-08").get
    assert(math.abs(monday._4.get - 600.0 / 7.0) < 0.0001)
    // edge rows: incomplete window → null trend and resid, seasonal set
    assert(got.head._3.isEmpty && got.head._5.isEmpty && got.head._4.nonEmpty)
  }

  test("seasonalDecompose: a constant series has zero seasonal and residual") {
    val rows = (0 until 14).map(i =>
      (java.time.LocalDate.of(2024, 3, 4).plusDays(i).toString, 700L))
    val got = decompose(rows)
    got.slice(3, 11).foreach { r =>
      assert(r._3.contains(700.0) && r._4.contains(0.0) &&
        r._5.contains(0.0), r.toString)
    }
  }

  test("mannKendall: monotone, all-tied, and tie-corrected hand cases") {
    import spark.implicits._
    def mk(vals: Seq[Long]) = TimeSeriesOps.mannKendall(
      vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("t", "v"),
      col("t"), col("v"))
      .as[(Long, Long, Long, Option[Double])].collect().head
    // strictly increasing: S = 3, var18 = 3·2·11 = 66,
    // z = 2/√(66/18) = 1.0445
    assert(mk(Seq(1L, 2L, 3L)) === ((3L, 3L, 66L, Some(1.0445))))
    // every value tied: variance 0, Z undefined
    assert(mk(Seq(5L, 5L, 5L)) === ((3L, 0L, 0L, None)))
    // one tie pair, falling: S = −2, tt = 2·1·9 = 18, var18 = 48,
    // z = −1/√(48/18) = −0.6124
    assert(mk(Seq(3L, 3L, 1L)) === ((3L, -2L, 48L, Some(-0.6124))))
  }

  test("autocorrelation: hand-computed lags on a linear ramp") {
    import spark.implicits._
    // x = 1..4 → y = 4x − 10 = (−6, −2, 2, 6); den = 80;
    // lag1: 12 − 4 + 12 = 20 → 0.25; lag2: −12 − 12 = −24 → −0.3;
    // lag3: −36 → −0.45 (scaleDiv 1 keeps the products exact here)
    val s = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("t", "v")
    val got = TimeSeriesOps.autocorrelation(s, col("t"), col("v"),
      maxLag = 3, scaleDiv = 1.0).orderBy("lag")
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(got === Seq((1L, 3L, Some(0.25)), (2L, 2L, Some(-0.3)),
      (3L, 1L, Some(-0.45))))
    // constant series: zero denominator → null acf, not a crash
    val flat = TimeSeriesOps.autocorrelation(
      Seq((1L, 7L), (2L, 7L)).toDF("t", "v"), col("t"), col("v"), 1, 1.0)
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(flat === Seq((1L, 1L, None)))
  }

  test("binsegChangepoint: step series splits at the step, gains hand-checked") {
    import spark.implicits._
    // v = (10,10,10,50,50): S=130; gain(3) = 900/3 + 100²/2 − 130²/5 =
    // 1920 (the max; gain(2)=853.33, gain(4)=720) → split after t=3,
    // means 10 / 50, gain_m = 1920/1e6 → 0.0019.
    val got = TimeSeriesOps.binsegChangepoint(
      Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 50L), (5L, 50L))
        .toDF("t", "v"), col("t"), col("v"))
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(got === ((5L, 3L, 3L, 0.0019, 10.0, 50.0)))
    // constant series: every gain is exactly 0 → earliest split wins
    val flat = TimeSeriesOps.binsegChangepoint(
      Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("t", "v"), col("t"), col("v"))
      .as[(Long, Long, Long, Double, Double, Double)].collect().head
    assert(flat === ((3L, 1L, 1L, 0.0, 7.0, 7.0)))
  }

  test("theilSen: hand-computed pair medians, even and odd counts") {
    import spark.implicits._
    // v = (10,20,35,40): slopes (10, 12.5, 10, 15, 10, 5) → sorted with
    // (s,xa,xb) tie-break: ranks 3,4 are both 10 → slope 10; residuals
    // v−10x = (0,0,5,0) → median 0.
    val even = TimeSeriesOps.theilSen(
      Seq((1L, 10L), (2L, 20L), (3L, 35L), (4L, 40L)).toDF("t", "v"),
      col("t"), col("v"))
      .as[(Long, Long, Double, Double)].collect().head
    assert(even === ((4L, 6L, 10.0, 0.0)))
    // odd pair count: slopes (10,7,4) → middle 7; residuals (−7,−4,−7)
    // → sorted (−7@x1, −7@x3, −4@x2), middle −7
    val odd = TimeSeriesOps.theilSen(
      Seq((1L, 0L), (2L, 10L), (3L, 14L)).toDF("t", "v"),
      col("t"), col("v"))
      .as[(Long, Long, Double, Double)].collect().head
    assert(odd === ((3L, 3L, 7.0, -7.0)))
    // one outlier week does NOT move the slope (the point of the op):
    // same ramp with v3 spiked 10× still reads slope 10
    val robust = TimeSeriesOps.theilSen(
      Seq((1L, 10L), (2L, 20L), (3L, 350L), (4L, 40L), (5L, 50L)).toDF("t", "v"),
      col("t"), col("v"))
      .as[(Long, Long, Double, Double)].collect().head
    assert(robust._3 === 10.0)
  }

  test("mannKendall/theilSen: bounded-quadratic contract ENFORCED") {
    import spark.implicits._
    // 11 rows over maxN=10 must die loudly before any pair forms — a
    // fact table handed in by mistake gets the actionable message, not
    // a silent O(n²) explosion (holtLinear's maxLen discipline).
    val big = (1L to 11L).map(i => (i, i)).toDF("t", "v")
    val e1 = intercept[IllegalArgumentException](
      TimeSeriesOps.mannKendall(big, col("t"), col("v"), maxN = 10))
    assert(e1.getMessage.contains("bounded-quadratic"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      TimeSeriesOps.theilSen(big, col("t"), col("v"), maxN = 10))
    assert(e2.getMessage.contains("bounded-quadratic"), e2.getMessage)
    // at exactly maxN both run fine
    val okFrame = (1L to 10L).map(i => (i, 2L * i)).toDF("t", "v")
    val mkOk = TimeSeriesOps.mannKendall(okFrame, col("t"), col("v"),
      maxN = 10).as[(Long, Long, Long, Option[Double])].collect().head
    assert(mkOk._1 === 10L && mkOk._2 === 45L)
    val tsOk = TimeSeriesOps.theilSen(okFrame, col("t"), col("v"),
      maxN = 10).as[(Long, Long, Double, Double)].collect().head
    assert(tsOk === ((10L, 45L, 2.0, 0.0)))
  }

  test("interArrivalBurstiness: hand-computed gaps, per-stream isolation") {
    import spark.implicits._
    // user 1 type a at 0,10,30,40 → gaps (10,20,10): n=3 Σg=40 Σg²=600,
    // varN=200, mean=13.3333, cv2=0.125, B=(√200−40)/(√200+40)=−0.4776.
    // user 2 type a contributes NO gap (single event — streams isolate).
    // type b at 0,5 → one gap 5: varN=0 → cv2=0, B=−1.
    val ev = Seq(
      (1L, "a", 0L, 1L), (1L, "a", 10L, 2L), (1L, "a", 30L, 3L),
      (1L, "a", 40L, 4L), (2L, "a", 99L, 5L),
      (1L, "b", 0L, 6L), (1L, "b", 5L, 7L))
      .toDF("user_id", "event_type", "sec", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = TimeSeriesOps.interArrivalBurstiness(ev, col("user_id"),
      col("event_type"), col("ts"), col("event_id")).orderBy("cls")
      .as[(String, Long, Double, Option[Double], Option[Double])]
      .collect().toSeq
    assert(got === Seq(
      ("a", 3L, 13.3333, Some(0.125), Some(-0.4776)),
      ("b", 1L, 5.0, Some(0.0), Some(-1.0))))
  }

  // ---- crossCorrelation ----

  test("crossCorrelation: proportional series peak at lag 0; band edges") {
    def series(vs: Long*) = vs.zipWithIndex.map { case (v, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(7L * i)), v)
    }.toDF("w", "v")
    val x = series(1L, 2L, 3L, 4L)
    val y = series(2L, 4L, 6L, 8L)     // y = 2x
    val got = TimeSeriesOps.crossCorrelation(x, col("w"), col("v"),
      y, col("w"), col("v"), maxLag = 3, scaleDiv = 1.0)
      .orderBy("lag")
      .as[(Long, Long, Option[Double])].collect().toSeq
    // centered cx = [-6,-2,2,6], cy = 2·cx; dx=80 dy=320.
    // lag 0: 160/√(80·320)=1; ±1: 40/160=0.25; ±2: -48/160=-0.3;
    // ±3: -72/160=-0.45. Pairs 4/3/2/1 by band position.
    assert(got === Seq(
      (-3L, 1L, Some(-0.45)), (-2L, 2L, Some(-0.3)), (-1L, 3L, Some(0.25)),
      (0L, 4L, Some(1.0)),
      (1L, 3L, Some(0.25)), (2L, 2L, Some(-0.3)), (3L, 1L, Some(-0.45))))
  }

  test("crossCorrelation: constant series yields null ccf; misaligned drop") {
    def series(vs: Long*) = vs.zipWithIndex.map { case (v, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(7L * i)), v)
    }.toDF("w", "v")
    val x = series(1L, 2L, 3L)
    val const = series(5L, 5L, 5L)
    val got = TimeSeriesOps.crossCorrelation(x, col("w"), col("v"),
      const, col("w"), col("v"), maxLag = 1, scaleDiv = 1.0)
      .orderBy("lag").as[(Long, Long, Option[Double])].collect().toSeq
    assert(got.map(_._3).forall(_.isEmpty))
    // y missing the middle week: only 2 aligned rows survive the join
    val sparse = Seq(
      (java.sql.Date.valueOf("2024-01-01"), 7L),
      (java.sql.Date.valueOf("2024-01-15"), 9L)).toDF("w", "v")
    val n = TimeSeriesOps.crossCorrelation(x, col("w"), col("v"),
      sparse, col("w"), col("v"), maxLag = 1, scaleDiv = 1.0)
      .agg(max("n_pairs")).as[Long].collect().head
    assert(n === 2L)
  }

  // ---- holtLinear ----

  private def holtSeries(ys: Long*) =
    ys.zipWithIndex.map { case (y, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(7L * i)), y)
    }.toDF("ord", "y")

  test("holtLinear: hand-folded scaled-integer recurrence + forecast") {
    val got = TimeSeriesOps.holtLinear(holtSeries(10L, 12L, 11L, 15L),
      col("ord"), col("y"), aNum = 5, bNum = 3, den = 10, horizon = 2)
      .orderBy("ord")
      .as[(java.sql.Date, String, Option[Long], Long, Long,
           Option[Long], Option[Long])].collect().toSeq
    def d(s: String) = java.sql.Date.valueOf(s)
    // init l=100 b=20; steps hand-folded in den-ths with truncating div:
    // t1: fit 12, l=120 b=20, resid 0; t2: fit 14, l=125 b=15, resid -3;
    // t3: fit 14, l=145 b=16, resid 1. Forecasts (145+h·16) div 10.
    assert(got === Seq(
      (d("2024-01-01"), "fit", Some(10L), 100L, 20L, None, None),
      (d("2024-01-08"), "fit", Some(12L), 120L, 20L, Some(12L), Some(0L)),
      (d("2024-01-15"), "fit", Some(11L), 125L, 15L, Some(14L), Some(-3L)),
      (d("2024-01-22"), "fit", Some(15L), 145L, 16L, Some(14L), Some(1L)),
      (d("2024-01-29"), "forecast", None, 145L, 16L, Some(16L), None),
      (d("2024-02-05"), "forecast", None, 145L, 16L, Some(17L), None)))
  }

  test("ewmaControl: hand recurrence, steady-state limits, breach flag") {
    def series(vs: Long*) = vs.zipWithIndex.map { case (v, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(7L * i)), v)
    }.toDF("w", "v")
    val got = TimeSeriesOps.ewmaControl(
      series((Seq.fill(9)(10L) :+ 30L): _*), col("w"), col("v"),
      aNum = 9, den = 10, lSigma = 1.0).orderBy("ord")
      .as[(java.sql.Date, Long, Long, Option[Double], Option[Double],
           Option[Double], Option[Boolean])].collect().toSeq
    // μ=12, σ=√40, half=√(9/11): limits 12 ± 5.7208 → [6.2792, 17.7208].
    // z stays 100 den-ths (zd=10, inside) until the spike:
    // z₉ = (9·30·10 + 1·100)/10 = 280 → zd=28 breaches high.
    assert(got.map(_._3) === Seq.fill(9)(100L) :+ 280L)
    assert(got.map(_._7.get) === Seq.fill(9)(false) :+ true)
    assert(got.head._4 === Some(12.0))
    assert(got.head._5 === Some(6.2792) && got.head._6 === Some(17.7208))
  }

  test("ewmaControl: n=1 has no sigma; preconditions fail loudly") {
    def series(vs: Long*) = vs.zipWithIndex.map { case (v, i) =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1)
        .plusDays(7L * i)), v)
    }.toDF("w", "v")
    val one = TimeSeriesOps.ewmaControl(series(42L), col("w"), col("v"),
      aNum = 2, den = 10)
      .as[(java.sql.Date, Long, Long, Option[Double], Option[Double],
           Option[Double], Option[Boolean])].collect().toSeq
    assert(one.map(r => (r._2, r._3, r._4, r._7)) ===
      Seq((42L, 420L, None, None)))
    intercept[IllegalArgumentException](
      TimeSeriesOps.ewmaControl(series(1L, 2L), col("w"), col("v"),
        aNum = 10, den = 10))
    intercept[IllegalArgumentException](
      TimeSeriesOps.ewmaControl(series(1L, 2L, 3L), col("w"), col("v"),
        aNum = 2, den = 10, maxLen = 2))
  }

  test("holtLinear: preconditions fail loudly") {
    val one = intercept[IllegalArgumentException] {
      TimeSeriesOps.holtLinear(holtSeries(10L), col("ord"), col("y"),
        5, 3, 10, horizon = 1)
    }
    assert(one.getMessage.contains(">= 2 observations"))
    val bad = intercept[IllegalArgumentException] {
      TimeSeriesOps.holtLinear(holtSeries(10L, 11L), col("ord"), col("y"),
        10, 3, 10, horizon = 1)
    }
    assert(bad.getMessage.contains("must satisfy"))
    val long = intercept[IllegalArgumentException] {
      TimeSeriesOps.holtLinear(holtSeries((1L to 5L): _*), col("ord"),
        col("y"), 5, 3, 10, horizon = 0, maxLen = 4)
    }
    assert(long.getMessage.contains("maxLen"))
  }

  test("conformalForecast: exact residual order statistic bands the forecast") {
    val got = TimeSeriesOps.conformalForecast(
      holtSeries(10L, 12L, 11L, 15L), col("ord"), col("y"),
      aNum = 5, bNum = 3, den = 10, horizon = 2, coverBp = 9000)
      .orderBy("ord")
      .as[(java.sql.Date, Long, Long, Long, Long, Long)].collect().toSeq
    def d(s: String) = java.sql.Date.valueOf(s)
    // holtLinear residuals 0, -3, 1 -> |res| sorted [0,1,3], n=3;
    // k = min(3, ceil(4*0.9)) = 3 -> q = 3; forecasts 16 and 17
    assert(got === Seq(
      (d("2024-01-29"), 16L, 13L, 19L, 3L, 3L),
      (d("2024-02-05"), 17L, 14L, 20L, 3L, 3L)))
    intercept[IllegalArgumentException](
      TimeSeriesOps.conformalForecast(holtSeries(1L, 2L), col("ord"),
        col("y"), 5, 3, 10, horizon = 1, coverBp = 10000))
  }

  test("holtWinters: hand-folded seasonal recurrence + ring-indexed forecast") {
    val got = TimeSeriesOps.holtWinters(
      holtSeries(10L, 14L, 11L, 15L, 12L), col("ord"), col("y"),
      aNum = 5, bNum = 5, gNum = 5, den = 10, period = 2, horizon = 3)
      .orderBy("ord")
      .as[(java.sql.Date, String, Option[Long], Long, Long, Long,
           Option[Long], Option[Long])].collect().toSeq
    def d(s: String) = java.sql.Date.valueOf(s)
    // init (p=2): l=120 b=5, s=[-20, 20]; steps hand-folded in den-ths
    // with truncating div (sNew at t2 is -185/10 -> -18, toward zero):
    // t2: fit 10, l=127 b=6 s0=-18; t3: fit 15, l=131 b=5 s1=19;
    // t4: fit 11, l=137 b=5 s0=-17. Forecasts ring through [s1, s0].
    assert(got === Seq(
      (d("2024-01-01"), "fit", Some(10L), 120L, 5L, -20L, None, None),
      (d("2024-01-08"), "fit", Some(14L), 120L, 5L, 20L, None, None),
      (d("2024-01-15"), "fit", Some(11L), 127L, 6L, -18L, Some(10L), Some(1L)),
      (d("2024-01-22"), "fit", Some(15L), 131L, 5L, 19L, Some(15L), Some(0L)),
      (d("2024-01-29"), "fit", Some(12L), 137L, 5L, -17L, Some(11L), Some(1L)),
      (d("2024-02-05"), "forecast", None, 137L, 5L, 19L, Some(16L), None),
      (d("2024-02-12"), "forecast", None, 137L, 5L, -17L, Some(13L), None),
      (d("2024-02-19"), "forecast", None, 137L, 5L, 19L, Some(17L), None)))
  }

  test("holtWinters: preconditions fail loudly") {
    val short = intercept[IllegalArgumentException] {
      TimeSeriesOps.holtWinters(holtSeries(1L, 2L, 3L), col("ord"),
        col("y"), 2, 1, 3, 10, period = 2, horizon = 1)
    }
    assert(short.getMessage.contains(">= 2*period"))
    val badP = intercept[IllegalArgumentException] {
      TimeSeriesOps.holtWinters(holtSeries(1L, 2L, 3L, 4L), col("ord"),
        col("y"), 2, 1, 3, 10, period = 1, horizon = 1)
    }
    assert(badP.getMessage.contains("period"))
    val badG = intercept[IllegalArgumentException] {
      TimeSeriesOps.holtWinters(holtSeries(1L, 2L, 3L, 4L), col("ord"),
        col("y"), 2, 1, 10, 10, period = 2, horizon = 1)
    }
    assert(badG.getMessage.contains("must satisfy"))
  }
}
