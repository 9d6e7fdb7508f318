package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time window analytics beyond the reference's fixed weekly grid
  * (SURVEY.md §2.E extension tier): true time-range sliding frames, robust
  * (median/MAD) anomaly scores, and linear interpolation over densified
  * series. All three are single-exchange window plans — the 100 TB shape is
  * one `partitionBy(key)` shuffle with every downstream window column
  * computed from that same sort, exactly like [[Rolling]].
  */
object TimeSeriesOps {

  /** Trailing time-RANGE sliding aggregates per key: for every event, the
    * count and money-sum of the key's events in `[ts - windowMs, ts]`
    * (inclusive both ends — Spark's `rangeBetween(-windowMs, 0)` and
    * SQL's `RANGE BETWEEN windowMs PRECEDING AND CURRENT ROW` agree on
    * closed bounds, and rows tied on the order value are frame peers in
    * both engines, so the result is layout-independent).
    *
    * This is what [[Rolling]]'s ROWS frames cannot express on raw events:
    * there the densified weekly grid made row offsets equal time offsets;
    * on an irregular event stream only a RANGE frame over the epoch axis
    * gives "the last hour", however many rows that is.
    *
    * Scale shape: ONE exchange on the key + one sort on the epoch axis;
    * the range frame is a moving two-pointer over the sorted run (Spark
    * buffers only the live frame). Money sums run over integer cents
    * (exact, association-free — see README determinism lesson 2).
    */
  def slidingRangeStats(df: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String, windowMs: Long): DataFrame = {
    require(windowMs > 0, s"windowMs=$windowMs must be positive")
    val w = Window.partitionBy(keyCol).orderBy(col("__ms"))
      .rangeBetween(-windowMs, 0)
    df.withColumn("__ms", unix_millis(col(tsCol)))
      .withColumn("__cents", CoreOps.moneyCents(col(valueCol)))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("sum_window",
        when(count(col("__cents")).over(w) === 0, lit(null).cast("double"))
          .otherwise(CoreOps.rnd(
            sum(col("__cents")).over(w).cast("double") / 100.0)))
      .drop("__ms", "__cents")
  }

  /** Robust per-key anomaly scores: median/MAD instead of mean/std, the
    * outlier-resistant variant of [[Anomaly.zScore]] (a single wild value
    * moves a mean/std z-score arbitrarily; it moves the median/MAD score
    * by at most one rank). z = (x − median) / (1.4826 · MAD), the usual
    * normal-consistency constant; MAD == 0 (a majority-constant key)
    * degrades to 0.0 like the reference's std == 0 guard.
    *
    * Exactness contract: both medians run over integer cents, where
    * linear interpolation at the 0.5 quantile yields exact dyadic values
    * (x.0/x.5, then x.25 for the MAD of half-integer deviations) —
    * bit-identical between Spark's `median` and DuckDB's `quantile_cont`.
    * Both window aggregates share one `partitionBy(key)` exchange (no
    * orderBy → whole-partition frames, no sort at all); exact medians
    * buffer per key like the graded exact-percentile tier — bounded here
    * by key cardinality, with [[ScaleOps.approxWeeklyStats]] as the
    * sketch-based escape hatch when keys are hot.
    */
  def robustZScores(df: DataFrame, keyCol: String,
                    valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
    val cents = col("__cents")
    df.withColumn("__cents", CoreOps.moneyCents(col(valueCol)))
      .withColumn("__med", median(cents).over(w))
      .withColumn("__mad", median(abs(cents - col("__med"))).over(w))
      .withColumn("robust_z",
        when(cents.isNull, lit(null).cast("double"))
          .when(col("__mad") === 0.0, lit(0.0))
          .otherwise(CoreOps.rnd(
            (cents - col("__med")) / (lit(1.4826) * col("__mad")))))
      .drop("__cents", "__med", "__mad")
  }

  /** Finite-impulse exponentially-weighted moving average over a densified
    * series: value smoothed with dyadic decay weights 2^-j over the last
    * `taps` rows, null taps skipped (the weight mass renormalizes over
    * the PRESENT taps — pandas `ewm(adjust=True)` semantics, truncated to
    * a finite window so the whole thing is a fixed lag chain instead of a
    * recursive state).
    *
    * Why dyadic weights: multiplying a double by a power of two never
    * rounds, so every term is exact, and the fixed left-to-right term sum
    * is the same IEEE chain on any engine — the determinism trick that
    * makes an EWMA oracle-checkable at all (an arbitrary α would put a
    * rounding step in every multiply, and cross-engine agreement would
    * rest on luck rather than construction). A 2^-j tail also truncates
    * honestly: 8 taps cover all but 1/256 of the weight mass.
    *
    * Scale shape: `taps` lag columns over ONE `partitionBy(dim)
    * orderBy(week)` window — single exchange, single sort, the same
    * shared-spec pattern as [[Rolling.rollingWindows]].
    */
  def ewmaFinite(df: DataFrame, dimCol: String, weekCol: String,
                 valueCol: String, taps: Int = 8): DataFrame = {
    require(taps >= 1 && taps <= 30, s"taps=$taps must be in [1, 30]")
    val w = Window.partitionBy(dimCol).orderBy(weekCol)
    val v = col(valueCol).cast("double")
    val terms = (0 until taps).map { j =>
      val lv = if (j == 0) v else lag(v, j).over(w)
      (lv, math.pow(0.5, j))
    }
    val num = terms.map { case (lv, wt) =>
      coalesce(lv * lit(wt), lit(0.0)) }.reduce(_ + _)
    val den = terms.map { case (lv, wt) =>
      when(lv.isNotNull, lit(wt)).otherwise(lit(0.0)) }.reduce(_ + _)
    df.withColumn("ewma",
      when(den === 0.0, lit(null).cast("double"))
        .otherwise(CoreOps.rnd(num / den)))
  }

  /** Linear interpolation of interior gaps in a densified series: for each
    * null `valueCol` row with an observed value on BOTH sides of its
    * partition, lerp between the two neighbors proportionally to calendar
    * distance; edge gaps (no predecessor or no successor) stay null —
    * interpolation fills holes, it does not extrapolate.
    *
    * Input contract: `dense` is a densified (one row per (week, dim))
    * frame as produced by [[Densify.densify]] — the grid guarantees the
    * neighbor search sees every week. Neighbor value and neighbor week are
    * separate ignore-nulls window columns over the same frame; they pair
    * consistently because both are non-null on exactly the observed rows.
    *
    * Determinism: observed values are already on the 4-dp grid and
    * bit-identical across engines (they hash-match in `densify_orders`),
    * and the lerp is one fixed chain of IEEE ops (div, sub, mul, add) on
    * those bit-identical inputs, then portably rounded. Scale shape: one
    * exchange + one sort per dim, three Window columns over the same spec.
    */
  def interpolateGaps(dense: DataFrame, valueCol: String,
                      dimCol: String = "dim",
                      weekCol: String = "week"): DataFrame = {
    val ord = Window.partitionBy(dimCol).orderBy(weekCol)
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    val after = ord.rowsBetween(1, Window.unboundedFollowing)
    val v = col(valueCol)
    val observedWeek = when(v.isNotNull, col(weekCol))
    val pv = last(v, ignoreNulls = true).over(before)
    val pw = last(observedWeek, ignoreNulls = true).over(before)
    val nv = first(v, ignoreNulls = true).over(after)
    val nw = first(observedWeek, ignoreNulls = true).over(after)
    val frac = datediff(col(weekCol), col("__pw")).cast("double") /
      datediff(col("__nw"), col("__pw")).cast("double")
    dense
      .withColumn("__pv", pv).withColumn("__pw", pw)
      .withColumn("__nv", nv).withColumn("__nw", nw)
      .withColumn("is_interpolated",
        v.isNull && col("__pv").isNotNull && col("__nv").isNotNull)
      .withColumn(s"${valueCol}_interp",
        when(v.isNotNull, v)
          .when(col("is_interpolated"),
            CoreOps.rnd(col("__pv") + (col("__nv") - col("__pv")) * frac))
          .otherwise(lit(null).cast("double")))
      .drop("__pv", "__pw", "__nv", "__nw")
  }

  /** Two-sided CUSUM change detection over a pre-aggregated per-key series
    * (one row per `(key, ord)`): cumulative deviation from the key's own
    * mean, with an alarm once it clears `thresholdCents`.
    *
    * The textbook recursion `S⁺_t = max(0, S⁺_{t−1} + (x_t − μ))` looks
    * sequential, but closed-form it is `C_t − min_{j≤t} C_j` over the
    * deviation cumsum `C` (seeded with C₀ = 0) — two prefix windows on one
    * sort, fully parallel across keys. The slack parameter is folded into
    * the threshold (k = 0), the common monitoring form.
    *
    * Exactness: μ = Σx/n never materializes as a float — everything is
    * scaled by n (`y_t = n·x_t − Σx`, an exact BIGINT), CUSUM runs in
    * scaled cents, and the alarm compares `S ≥ n·thresholdCents` in exact
    * longs. The reported magnitudes divide back out as a single double
    * quotient of exact longs (identical in any IEEE engine), rounded 4 dp.
    * Envelope: `n · max|cents| · series_length` must stay inside 2⁶³ —
    * at 10⁴ weekly buckets of 10¹² cents that is 10²⁰ per-key *worst case*,
    * so key the series accordingly (deviations, not raw sums, accumulate;
    * real headroom is far larger).
    *
    * Scale shape: one exchange on the key; the whole-partition count/sum
    * and both prefix frames ride the same `(key, ord)` sort. Series length
    * per key is the partition bound — calendar-sized here, exactly like
    * [[Rolling]].
    *
    * Output adds `cusum_up`, `cusum_down` (dollars of cumulated deviation,
    * 4 dp) and `alarm_up` / `alarm_down` booleans.
    */
  def cusumChangepoints(series: DataFrame, keyCol: String, ordCol: String,
                        centsCol: String, thresholdCents: Long): DataFrame = {
    require(thresholdCents > 0, s"thresholdCents=$thresholdCents must be > 0")
    val byKey = Window.partitionBy(keyCol)
    val prefix = Window.partitionBy(keyCol).orderBy(ordCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nd = col("__n").cast("double")
    series
      .withColumn("__x", col(centsCol).cast("long"))
      .withColumn("__n", count(lit(1)).over(byKey))
      .withColumn("__tot", sum(col("__x")).over(byKey))
      .withColumn("__c", sum(col("__n") * col("__x") - col("__tot")).over(prefix))
      // least/greatest with the literal seed C₀ = 0: an all-negative or
      // all-positive run must not lift the baseline off zero
      .withColumn("__up",
        col("__c") - least(lit(0L), min(col("__c")).over(prefix)))
      .withColumn("__dn",
        greatest(lit(0L), max(col("__c")).over(prefix)) - col("__c"))
      .withColumn("cusum_up",
        CoreOps.rnd(col("__up").cast("double") / nd / 100.0))
      .withColumn("cusum_down",
        CoreOps.rnd(col("__dn").cast("double") / nd / 100.0))
      .withColumn("alarm_up", col("__up") >= col("__n") * thresholdCents)
      .withColumn("alarm_down", col("__dn") >= col("__n") * thresholdCents)
      .drop("__x", "__n", "__tot", "__c", "__up", "__dn")
  }

  /** Classical additive seasonal decomposition of a daily series —
    * y = trend + day-of-week seasonal + residual: trend is the centered
    * 7-row moving average (each window spans every weekday exactly once,
    * so the weekly cycle cancels out of it), the seasonal component is
    * the per-weekday mean of the detrended interior, and the residual is
    * what seasonality-aware anomaly detection should threshold INSTEAD
    * of raw values (a quiet Sunday is not an incident).
    *
    * Exactness discipline: the daily aggregate, the 7-row window sum,
    * and the 7-scaled detrended values (7y − Σ₇) are all exact longs;
    * the three displayed components are fixed IEEE expressions over
    * those longs, 4-dp rounded — engine-exact. Edge rows (incomplete
    * 7-row window) carry null trend/resid rather than a biased mean.
    * Rows are observed days: calendar gaps make the window span observed
    * neighbors (densify first — [[graft.ops.Densify]] — when strict
    * calendar windows are required).
    *
    * Scale shape: the daily aggregate is the only fact-scale exchange;
    * the rolling and weekday windows run over the calendar-bounded daily
    * table (thousands of rows at any corpus size), the same bounded-
    * series single-task justification as [[StatOps.histogram]].
    *
    * @param value integer-valued column (cents), summed per day
    * @return (day, y, trend, seasonal, resid), one row per observed day
    */
  def seasonalDecompose(df: DataFrame, dateCol: Column,
                        value: Column): DataFrame = {
    import CoreOps.rnd
    val daily = df.where(dateCol.isNotNull && value.isNotNull)
      .groupBy(dateCol.as("day")).agg(sum(value.cast("long")).as("y"))
    val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val t = daily
      .withColumn("__sum7", sum(col("y")).over(w7))
      .withColumn("__cnt7", count(col("y")).over(w7))
      .withColumn("__det7",
        when(col("__cnt7") === 7, lit(7L) * col("y") - col("__sum7")))
    val wd = Window.partitionBy(dayofweek(col("day")))
    t.withColumn("__sn", sum(col("__det7")).over(wd))
      .withColumn("__sc", count(col("__det7")).over(wd))
      .select(col("day"), col("y"),
        when(col("__cnt7") === 7,
          rnd(col("__sum7").cast("double") / lit(7.0))).as("trend"),
        when(col("__sc") > 0,
          rnd(col("__sn").cast("double") /
            (lit(7.0) * col("__sc").cast("double")))).as("seasonal"),
        when(col("__cnt7") === 7 && col("__sc") > 0,
          rnd(col("y").cast("double") - col("__sum7").cast("double") / lit(7.0)
            - col("__sn").cast("double") /
              (lit(7.0) * col("__sc").cast("double")))).as("resid"))
  }

  /** Mann–Kendall trend test over an ordered series — the nonparametric
    * "is this metric drifting?" monitor that needs no distribution or
    * linearity assumption ([[graft.ops.StatOps.bivariateStats]]'s slope
    * assumes both): S = Σ_{i<j} sign(xⱼ − xᵢ) with the tie-corrected
    * variance Var = [n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)] / 18 and the
    * continuity-corrected Z = (S∓1)/√Var. S and the variance numerator
    * (`var18`, the pre-/18 integer) are EXACT integer sums, so the
    * statistic hash-matches any engine; Z is one fixed IEEE expression
    * over them (IEEE sqrt is correctly rounded), 4-dp displayed.
    *
    * Scale shape: the caller reduces facts to the bounded series (one
    * fact-scale aggregate — weeks, days); the O(n²) pair scan runs on
    * that bounded frame only (~10⁵ pairs for a decade of weeks), the same
    * bounded-quadratic justification as the skyline/waterfill tiers —
    * ENFORCED: the op counts the series and fails loudly past `maxN`
    * rows (default 10⁴ → ≤5×10⁷ pairs), holtLinear's loud-precondition
    * treatment. Var = 0 (every value tied) leaves Z null — the test is
    * undefined.
    *
    * @param series pre-aggregated frame, one row per period
    * @param maxN hard row cap on the series (loud require)
    * @return one row: (n, s_stat, var18, z)
    */
  def mannKendall(series: DataFrame, order: Column, value: Column,
                  maxN: Int = 10000): DataFrame = {
    import CoreOps.rnd
    require(maxN >= 2, s"maxN=$maxN must be at least 2")
    val s = series.where(order.isNotNull && value.isNotNull)
      .select(order.as("__o"), value.cast("long").as("__v"))
    val nIn = s.limit(maxN + 1).count()
    require(nIn <= maxN,
      s"mannKendall: series exceeds maxN=$maxN rows — this op's O(n²)" +
        " pair scan is bounded-quadratic by contract; pre-aggregate to" +
        " a coarser grid or raise maxN deliberately")
    val a = s.select(col("__o").as("__oa"), col("__v").as("__va"))
    val b = s.select(col("__o").as("__ob"), col("__v").as("__vb"))
    val pairs = a.join(b, col("__oa") < col("__ob"))
      .agg(coalesce(sum(
        when(col("__vb") > col("__va"), lit(1L))
          .when(col("__vb") < col("__va"), lit(-1L)).otherwise(lit(0L))),
        lit(0L)).as("s_stat"))
    val n = s.agg(count(lit(1)).as("n"))
    val ties = s.groupBy(col("__v")).agg(count(lit(1)).as("__t"))
      .where(col("__t") > 1L)
      .agg(coalesce(sum(col("__t") * (col("__t") - 1L)
        * (lit(2L) * col("__t") + 5L)), lit(0L)).as("__tt"))
    pairs.crossJoin(broadcast(n)).crossJoin(broadcast(ties))
      .withColumn("var18",
        col("n") * (col("n") - 1L) * (lit(2L) * col("n") + 5L) - col("__tt"))
      .select(col("n"), col("s_stat"), col("var18"),
        when(col("var18") === 0L, lit(null).cast("double"))
          .when(col("s_stat") > 0L, rnd((col("s_stat") - 1L).cast("double") /
            sqrt(col("var18").cast("double") / lit(18.0))))
          .when(col("s_stat") < 0L, rnd((col("s_stat") + 1L).cast("double") /
            sqrt(col("var18").cast("double") / lit(18.0))))
          .otherwise(lit(0.0)).as("z"))
  }

  /** Autocorrelation function of an ordered series at lags 1..`maxLag` —
    * the seasonality/persistence screen that tells a pipeline whether its
    * weekly metric still remembers last week (and [[seasonalDecompose]]
    * whether a 7-period season is even present): r_k = Σ yₜ·yₜ₋ₖ / Σ yₜ²
    * with y the n-fold-scaled centered series yₜ = n·xₜ − Σx (EXACT
    * longs — no float mean enters). Each product quantizes through ONE
    * fixed IEEE expression (floor(yᵃ·yᵇ/scale + ½), both factors exact in
    * double below 2^53) into associative long sums, so numerator and
    * denominator hash-match across engines; the shared scale cancels in
    * the displayed ratio.
    *
    * Scale shape: caller reduces facts to the bounded series; the lag
    * join and both sums run on that bounded frame. Precondition (the
    * quantized-product recipe's usual): |n·x| < 2^53 and Σ|y·y|/scale
    * < 2^63 — pick `scaleDiv` so per-term magnitudes land near 10¹²⁄n.
    *
    * @return one row per lag 1..maxLag: (lag, n_pairs, acf 4-dp)
    */
  def autocorrelation(series: DataFrame, order: Column, value: Column,
                      maxLag: Int, scaleDiv: Double = 1e12): DataFrame = {
    import CoreOps.rnd
    require(maxLag >= 1, s"maxLag=$maxLag must be positive")
    val s0 = series.where(order.isNotNull && value.isNotNull)
      .select(order.as("__o"), value.cast("long").as("__x"))
    val tot = s0.agg(count(lit(1)).as("__n"), sum(col("__x")).as("__s"))
    val y = s0.crossJoin(broadcast(tot))
      .select(row_number().over(Window.orderBy(col("__o"))).as("__rn"),
        (col("__n") * col("__x") - col("__s")).as("__y"))
    val qprod = (a: Column, b: Column) =>
      floor(a.cast("double") * b.cast("double") / lit(scaleDiv) + lit(0.5))
        .cast("long")
    val den = y.agg(coalesce(sum(qprod(col("__y"), col("__y"))), lit(0L))
      .as("__den"))
    val a = y.select(col("__rn").as("__ra"), col("__y").as("__ya"))
    val b = y.select(col("__rn").as("__rb"), col("__y").as("__yb"))
    a.join(b, (col("__rb") - col("__ra")).between(lit(1), lit(maxLag)))
      .groupBy((col("__rb") - col("__ra")).cast("long").as("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(qprod(col("__ya"), col("__yb"))), lit(0L)).as("__num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        when(col("__den") === 0L, lit(null).cast("double"))
          .otherwise(rnd(col("__num").cast("double") /
            col("__den").cast("double"))).as("acf"))
  }

  /** Cross-correlation function between two ALIGNED integer series —
    * r(ℓ) = Σ x̃ₜ·ỹₜ₊ℓ / √(Σx̃² · Σỹ²) for ℓ in −maxLag..maxLag (Box &
    * Jenkins ch. 11's lead/lag identification read): which series LEADS,
    * and by how many periods? Positive ℓ means y lags x (x leads);
    * negative means y leads. The marketing-spend-vs-revenue /
    * deploys-vs-errors diagnostic [[autocorrelation]] can't answer
    * because it sees one series.
    *
    * Determinism: the [[autocorrelation]] recipe on both series — center
    * as exact integers (n·x − Σx, so no float mean forms), quantize each
    * product through ONE fixed IEEE floor(a·b/scaleDiv + 0.5), sum as
    * exact longs; r is one double division + sqrt at display, 4-dp. The
    * normalization uses the FULL-series sums of squares (the standard
    * CCF estimator, biased at large |ℓ|, consistent and engine-simple).
    * Alignment is by join on the order column — periods present in only
    * one series drop (densify both first for gap semantics).
    *
    * Scale shape: caller reduces facts to the bounded series; the
    * inner-join alignment, the ±maxLag band self-join, and all sums run
    * on that bounded frame.
    *
    * @return one row per lag −maxLag..maxLag with ≥1 pair: (lag,
    *         n_pairs, ccf 4-dp; null when either variance is 0)
    */
  def crossCorrelation(xs: DataFrame, xOrder: Column, xValue: Column,
                       ys: DataFrame, yOrder: Column, yValue: Column,
                       maxLag: Int, scaleDiv: Double = 1e12): DataFrame = {
    import CoreOps.rnd
    require(maxLag >= 1, s"maxLag=$maxLag must be positive")
    val joined = xs.where(xOrder.isNotNull && xValue.isNotNull)
      .select(xOrder.as("__o"), xValue.cast("long").as("__x"))
      .join(ys.where(yOrder.isNotNull && yValue.isNotNull)
        .select(yOrder.as("__o"), yValue.cast("long").as("__y")), Seq("__o"))
    val tot = joined.agg(count(lit(1)).as("__n"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"))
    val c = joined.crossJoin(broadcast(tot))
      .select(row_number().over(Window.orderBy(col("__o"))).as("__rn"),
        (col("__n") * col("__x") - col("__sx")).as("__cx"),
        (col("__n") * col("__y") - col("__sy")).as("__cy"))
    val qprod = (a: Column, b: Column) =>
      floor(a.cast("double") * b.cast("double") / lit(scaleDiv) + lit(0.5))
        .cast("long")
    val den = c.agg(coalesce(sum(qprod(col("__cx"), col("__cx"))), lit(0L))
        .as("__dx"),
      coalesce(sum(qprod(col("__cy"), col("__cy"))), lit(0L)).as("__dy"))
    val a = c.select(col("__rn").as("__ra"), col("__cx"))
    val b = c.select(col("__rn").as("__rb"), col("__cy"))
    a.join(b, abs(col("__rb") - col("__ra")) <= lit(maxLag))
      .groupBy((col("__rb") - col("__ra")).cast("long").as("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        coalesce(sum(qprod(col("__cx"), col("__cy"))), lit(0L)).as("__num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        when(col("__dx") === 0L || col("__dy") === 0L,
          lit(null).cast("double"))
          .otherwise(rnd(col("__num").cast("double") /
            sqrt(col("__dx").cast("double") * col("__dy").cast("double"))))
          .as("ccf"))
  }

  /** Single-changepoint detection by binary segmentation — the first
    * split of the classic recursive scheme (Scott & Knott 1974; the
    * step CUSUM's drift alarm [[cusumChangepoints]] localizes less
    * sharply): choose the split t maximizing the variance explained,
    * gain(t) = S_l²/n_l + S_r²/n_r − S²/n (the SSE drop of fitting two
    * means instead of one — Σv² cancels out of the argmax, so it is
    * never computed).
    *
    * Determinism: prefix sums are exact longs off the bounded series;
    * each gain is ONE fixed IEEE expression over exact longs (casts
    * exact below 2^53), so engines agree bit-for-bit and the argmax
    * (tie-break smallest t) picks the same split everywhere.
    *
    * Scale shape: caller reduces facts to the bounded series; the
    * prefix-sum window, the n−1 candidate gains, and the rank-1 pick all
    * live on that bounded frame.
    *
    * @return one row: (n, t_split — 1-based last index of the left
    *         segment, split_at — the order value at t, gain_m — the SSE
    *         drop in MILLIONS of squared input units (squared magnitudes
    *         overflow the 4-dp rounding's long floor otherwise),
    *         mean_left, mean_right), 4-dp
    */
  def binsegChangepoint(series: DataFrame, order: Column,
                        value: Column): DataFrame = {
    import CoreOps.rnd
    val s = series.where(order.isNotNull && value.isNotNull)
      .select(order.as("__o"), value.cast("long").as("__v"))
      .withColumn("__t", row_number().over(Window.orderBy(col("__o")))
        .cast("long"))
      .withColumn("__cum", sum(col("__v")).over(
        Window.orderBy(col("__t"))))
    val tot = s.agg(count(lit(1)).as("__n"), sum(col("__v")).as("__s"))
    val nD = col("__n").cast("double")
    val sl = col("__cum").cast("double"); val st = col("__s").cast("double")
    val nl = col("__t").cast("double")
    val nr = (col("__n") - col("__t")).cast("double")
    val gain = sl * sl / nl + (st - sl) * (st - sl) / nr - st * st / nD
    s.crossJoin(broadcast(tot))
      .where(col("__t") < col("__n"))
      .withColumn("__gain", gain)
      .withColumn("__rnk", row_number().over(
        Window.orderBy(col("__gain").desc, col("__t"))))
      .where(col("__rnk") === 1)
      .select(col("__n").as("n"), col("__t").as("t_split"),
        col("__o").as("split_at"),
        rnd(col("__gain") / lit(1000000.0)).as("gain_m"),
        rnd(col("__cum").cast("double") / col("__t").cast("double"))
          .as("mean_left"),
        rnd((col("__s") - col("__cum")).cast("double") /
          (col("__n") - col("__t")).cast("double")).as("mean_right"))
  }

  /** Theil–Sen estimator — the robust trend line for a bounded series:
    * slope = median of all pairwise slopes (Theil 1950, Sen 1968), then
    * intercept = median of per-point residual offsets at that slope. Up
    * to ~29% of the points can be arbitrarily corrupted before the
    * estimate moves (the OLS line [[StatOps.bivariateStats]] fits moves
    * with ONE bad week — this is the version a dashboard should trend).
    *
    * Determinism: positions are dense ranks of the order column (exact
    * integers), each pairwise slope is ONE IEEE division of exact longs
    * (identical on every engine), and the median picks ranks
    * ⌈m/2⌉ / ⌈m/2⌉+1 under (value, i, j) ordering — even counts average
    * two engine-identical doubles, odd counts take the middle directly.
    *
    * Scale shape: caller reduces facts to the bounded series (weeks,
    * days); the O(n²) pair frame and its rank windows live entirely on
    * that bounded frame — the [[mannKendall]] justification, ENFORCED
    * the same way: a loud `maxN` require (default 10⁴ → ≤5×10⁷ pairs)
    * before any pair is formed. The fact-scale work happened in the
    * caller's aggregation.
    *
    * @param maxN hard row cap on the series (loud require)
    * @return one row: (n, n_pairs, slope, intercept), 4-dp
    */
  def theilSen(series: DataFrame, order: Column, value: Column,
               maxN: Int = 10000): DataFrame = {
    import CoreOps.rnd
    require(maxN >= 2, s"maxN=$maxN must be at least 2")
    val s1 = series.where(order.isNotNull && value.isNotNull)
    val nIn = s1.limit(maxN + 1).count()
    require(nIn <= maxN,
      s"theilSen: series exceeds maxN=$maxN rows — this op's O(n²)" +
        " pair frame is bounded-quadratic by contract; pre-aggregate to" +
        " a coarser grid or raise maxN deliberately")
    val s = s1
      .select(row_number().over(Window.orderBy(order)).cast("long").as("__x"),
        value.cast("long").as("__v"))
    val a = s.select(col("__x").as("__xa"), col("__v").as("__va"))
    val b = s.select(col("__x").as("__xb"), col("__v").as("__vb"))
    val slopes = a.join(b, col("__xa") < col("__xb"))
      .select(col("__xa"), col("__xb"),
        ((col("__vb") - col("__va")).cast("double") /
          (col("__xb") - col("__xa")).cast("double")).as("__s"))
    def medianOf(df: DataFrame, v: Column, ord: Seq[Column]): DataFrame = {
      val w = Window.orderBy(ord: _*)
      df.select(v.as("__m"), row_number().over(w).as("__rn"),
          count(lit(1)).over(Window.partitionBy()).as("__cnt"))
        .agg(max(col("__cnt")).as("__n"),
          max(when(col("__rn") === ceil(col("__cnt").cast("double") / 2.0),
            col("__m"))).as("__m1"),
          max(when(col("__rn") ===
            ceil(col("__cnt").cast("double") / 2.0) +
              (lit(1L) - pmod(col("__cnt"), lit(2L))), col("__m")))
            .as("__m2"))
        .select(col("__n"), ((col("__m1") + col("__m2")) / 2.0).as("med"))
    }
    val slopeMed = medianOf(slopes, col("__s"),
      Seq(col("__s"), col("__xa"), col("__xb")))
    val n = s.agg(count(lit(1)).as("n"))
    val resid = s.crossJoin(broadcast(slopeMed.select(col("med"))))
      .select(col("__x"),
        (col("__v").cast("double") - col("med") * col("__x").cast("double"))
          .as("__r"))
    val interMed = medianOf(resid, col("__r"), Seq(col("__r"), col("__x")))
    n.crossJoin(broadcast(slopeMed.select(col("__n").as("n_pairs"),
        col("med").as("__slope"))))
      .crossJoin(broadcast(interMed.select(col("med").as("__inter"))))
      .select(col("n"), col("n_pairs"),
        rnd(col("__slope")).as("slope"), rnd(col("__inter")).as("intercept"))
  }

  /** Inter-arrival burstiness per stream class — the traffic-shape read
    * capacity planning and bot/anomaly screens run on an event feed: for
    * each (entity, class) stream, consecutive-event gaps in whole seconds,
    * rolled up per class into mean gap, squared coefficient of variation
    * CV² = σ²/μ², and the Goh–Barabási burstiness B = (σ−μ)/(σ+μ) ∈
    * (−1, 1) (B≈0 ⇒ Poisson memoryless; B→1 ⇒ bursty; B→−1 ⇒ periodic;
    * Goh & Barabási 2008, EPL 81).
    *
    * Determinism: the gap sequence depends on event ORDER, so the lag
    * window orders by (ts, tie-break id) — engines disagreeing on tie
    * order would see different gaps; with the id the sequence is unique.
    * Gaps are exact longs (floor-second epoch diffs), the class rollup
    * accumulates (n, Σg, Σg²) as exact longs, and μ, CV², B are fixed
    * IEEE expressions over those exact sums (σ and μ share the 1/n scale,
    * so B = (√varN − Σg)/(√varN + Σg) needs no division by n at all).
    *
    * Scale shape: ONE fact-scale window keyed on (entity, class) — the
    * natural event-log partitioning, no single-partition stage — then a
    * hash rollup to the bounded class table. Envelope: Σg² < 2^63 (loud
    * under ANSI); ~10⁹ gaps of a day each fit.
    *
    * @return per class: (n_gaps, mean_gap_s, cv2, burstiness), all 4-dp
    */
  def interArrivalBurstiness(df: DataFrame, entity: Column, cls: Column,
                             ts: Column, tieBreak: Column): DataFrame = {
    import CoreOps.rnd
    val w = Window.partitionBy(entity, cls).orderBy(ts, tieBreak)
    val gaps = df.where(entity.isNotNull && cls.isNotNull && ts.isNotNull)
      .select(cls.as("cls"),
        (unix_timestamp(ts) - lag(unix_timestamp(ts), 1).over(w)).as("g"))
      .where(col("g").isNotNull)
    val agged = gaps.groupBy("cls").agg(
      count(lit(1)).as("n_gaps"),
      sum(col("g")).as("sg"),
      sum(col("g") * col("g")).as("sgg"))
    val nD = col("n_gaps").cast("double")
    val sg = col("sg").cast("double")
    val varN = nD * col("sgg").cast("double") - sg * sg // n²·σ² (ddof=0)
    agged.select(col("cls"), col("n_gaps"),
      rnd(sg / nD).as("mean_gap_s"),
      when(col("sg") === 0L, lit(null).cast("double"))
        .otherwise(rnd(varN / (sg * sg))).as("cv2"),
      when(col("sg") === 0L, lit(null).cast("double"))
        .otherwise(rnd((sqrt(varN) - sg) / (sqrt(varN) + sg)))
        .as("burstiness"))
  }

  /** Holt linear-trend smoothing + h-step forecast of an integer series —
    * the first FORECASTING op in the time-series tier (everything else
    * here describes the past): level/trend double exponential smoothing
    * (Holt 1957), lₜ = α·yₜ + (1−α)(lₜ₋₁+bₜ₋₁), bₜ = β(lₜ−lₜ₋₁) +
    * (1−β)bₜ₋₁, fitted one-step-ahead f̂ₜ = lₜ₋₁+bₜ₋₁, then ŷ_{T+h} =
    * l_T + h·b_T. The capacity-planning / revenue-projection read every
    * weekly dashboard eventually asks for.
    *
    * Determinism: α and β are exact RATIONALS (aNum/den, bNum/den) and
    * the whole recurrence runs in scaled-integer state — lₜ and bₜ carry
    * `den`-ths of a unit, each step is one multiply-add and ONE
    * truncating integer division per state — so the entire trajectory is
    * engine-exact: no float accumulates, and the oracle replays it
    * digit-for-digit as a recursive CTE. Init: l₁ = y₁, b₁ = y₂ − y₁
    * (the standard two-point start; requires ≥ 2 observations, loudly).
    *
    * Scale shape: the fact-scale work is whatever aggregate BUILT the
    * series; the recurrence itself is inherently sequential (each state
    * needs the last), so it folds on the driver over the COLLECTED
    * series — sound for the same reason Lloyd's centroid state is: the
    * series is bounded by the time axis (weeks of history), not by data
    * volume. 100 TB of orders is still ~500 weekly rows. The guard
    * enforces that contract loudly rather than assuming it.
    *
    * @param series   (order, value) frame; order must be a DATE column
    *                 on a uniform `stepDays` grid (densify first), value
    *                 integer-scaled (cents)
    * @param horizon  h forecast steps past the last observation
    * @param stepDays grid spacing in days (7 for weekly)
    * @return per observed row: (ord, kind='fit', y, level_den, trend_den,
    *         fitted, resid) — level/trend in den-ths, fitted/resid whole
    *         units, first row's fitted/resid null (no prior state) — then
    *         `horizon` rows (kind='forecast', y/resid null).
    */
  def holtLinear(series: DataFrame, order: Column, value: Column,
                 aNum: Long, bNum: Long, den: Long, horizon: Int,
                 stepDays: Int = 7, maxLen: Int = 100000): DataFrame = {
    require(den > 0 && aNum > 0 && aNum < den && bNum > 0 && bNum < den,
      s"smoothing rationals aNum=$aNum bNum=$bNum den=$den must satisfy" +
        " 0 < aNum, bNum < den")
    require(horizon >= 0, s"horizon=$horizon must be non-negative")
    require(stepDays >= 1, s"stepDays=$stepDays must be positive")
    val spark = series.sparkSession
    val rows = series.where(order.isNotNull && value.isNotNull)
      .select(order.cast("date").as("ord"), value.cast("long").as("y"))
      .orderBy(col("ord")).limit(maxLen + 1).collect()
    require(rows.length >= 2,
      s"holtLinear needs >= 2 observations, got ${rows.length}")
    require(rows.length <= maxLen,
      s"holtLinear: series exceeds maxLen=$maxLen rows — this op's" +
        " driver-fold contract is for TIME-BOUNDED series; pre-aggregate" +
        " to a coarser grid or raise maxLen deliberately")
    // scaled-integer fold: l, b in den-ths of a unit; every division is
    // the truncating `/` (matches SQL div and the oracle's `//`).
    // Overflow headroom: each step's products stay near den²·|y|, loud
    // under ANSI far past any money series.
    val y = rows.map(_.getLong(1))
    var l = y(0) * den
    var b = (y(1) - y(0)) * den
    val out = Array.newBuilder[(java.sql.Date, String, java.lang.Long,
      Long, Long, java.lang.Long, java.lang.Long)]
    out += ((rows(0).getDate(0), "fit", Long.box(y(0)), l, b, null, null))
    var t = 1
    while (t < y.length) {
      val fitted = (l + b) / den
      val lPrev = l
      l = (aNum * y(t) * den + (den - aNum) * (lPrev + b)) / den
      b = (bNum * (l - lPrev) + (den - bNum) * b) / den
      out += ((rows(t).getDate(0), "fit", Long.box(y(t)), l, b,
        Long.box(fitted), Long.box(y(t) - fitted)))
      t += 1
    }
    val lastDay = rows.last.getDate(0).toLocalDate
    (1 to horizon).foreach { h =>
      out += ((java.sql.Date.valueOf(lastDay.plusDays(stepDays.toLong * h)),
        "forecast", null, l, b, Long.box((l + h * b) / den), null))
    }
    import spark.implicits._
    out.result().toSeq
      .toDF("ord", "kind", "y", "level_den", "trend_den", "fitted", "resid")
  }

  /** EWMA control chart over an integer series — zₜ = λyₜ + (1−λ)zₜ₋₁
    * against steady-state limits μ ± L·σ·√(λ/(2−λ)) (Roberts 1959;
    * Montgomery SPC ch. 9): the small-persistent-shift monitor that
    * completes the chart family — Shewhart-style z-score flags single
    * spikes, [[graft.ops.ChangeOps]]'s CUSUM localizes a drift onset,
    * EWMA alarms on sustained small shifts fastest.
    *
    * Determinism: λ is the exact rational aNum/den and the recurrence
    * runs in scaled-integer state (zₜ carries den-ths, one multiply-add
    * + ONE truncating division per step, z₀ = y₀·den), so the trajectory
    * is engine-exact — the oracle replays it as a recursive CTE. μ and
    * σ² derive from exact long sums (Σy, Σy²); the limits and the
    * breach comparison are fixed IEEE expressions over those exact
    * inputs, and breach compares the EXACT zₜ/den (one double division)
    * against them.
    *
    * Scale shape: [[holtLinear]]'s contract — the fact-scale work is
    * whatever aggregate built the series; the inherently-sequential
    * recurrence folds on the driver over the time-bounded series (loudly
    * length-guarded), because 100 TB of facts is still a few hundred
    * weekly buckets.
    *
    * @param lSigma control-limit width in sigmas (the classic 3.0)
    * @return per row: (ord, y, ewma_den — zₜ in den-ths, center 4-dp,
    *         lcl 4-dp, ucl 4-dp, breach) — limits/breach null when n < 2
    *         (σ undefined)
    */
  def ewmaControl(series: DataFrame, order: Column, value: Column,
                  aNum: Long, den: Long, lSigma: Double = 3.0,
                  maxLen: Int = 100000): DataFrame = {
    require(den > 0 && aNum > 0 && aNum < den,
      s"smoothing rational aNum=$aNum den=$den must satisfy 0 < aNum < den")
    require(lSigma > 0, s"lSigma=$lSigma must be positive")
    val spark = series.sparkSession
    val rows = series.where(order.isNotNull && value.isNotNull)
      .select(order.cast("date").as("ord"), value.cast("long").as("y"))
      .orderBy(col("ord")).limit(maxLen + 1).collect()
    require(rows.nonEmpty, "ewmaControl needs at least 1 observation")
    require(rows.length <= maxLen,
      s"ewmaControl: series exceeds maxLen=$maxLen rows — this op's" +
        " driver-fold contract is for TIME-BOUNDED series; pre-aggregate" +
        " to a coarser grid or raise maxLen deliberately")
    val y = rows.map(_.getLong(1))
    val n = y.length
    // Exact integer moments in BigInt — s² alone overflows a long for a
    // cents-scale money series (weekly sums ~10¹⁰ → s² ~10²⁰); the
    // oracle mirrors with HUGEINT. The variance numerator converts to
    // double ONCE (correctly-rounded from the exact integer in both
    // engines), then the σ expression is one fixed IEEE formula.
    val s = BigInt(y.sum)
    val s2 = y.map(v => BigInt(v) * BigInt(v)).sum
    val haveSigma = n >= 2
    val mu = y.sum.toDouble / n
    val sigma = if (haveSigma)
      math.sqrt((BigInt(n) * s2 - s * s).toDouble /
        (n.toDouble * (n - 1))) else 0.0
    val half = math.sqrt(aNum.toDouble / (2 * den - aNum))
    val lcl = mu - lSigma * sigma * half
    val ucl = mu + lSigma * sigma * half
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    var z = y(0) * den
    val out = Array.newBuilder[(java.sql.Date, Long, Long,
      java.lang.Double, java.lang.Double, java.lang.Double,
      java.lang.Boolean)]
    var t = 0
    while (t < n) {
      if (t > 0) z = (aNum * y(t) * den + (den - aNum) * z) / den
      val zd = z.toDouble / den
      out += ((rows(t).getDate(0), y(t), z,
        if (haveSigma) Double.box(r4(mu)) else null,
        if (haveSigma) Double.box(r4(lcl)) else null,
        if (haveSigma) Double.box(r4(ucl)) else null,
        if (haveSigma) Boolean.box(zd < lcl || zd > ucl) else null))
      t += 1
    }
    import spark.implicits._
    out.result().toSeq
      .toDF("ord", "y", "ewma_den", "center", "lcl", "ucl", "breach")
  }

  /** Split-conformal prediction interval on the [[holtLinear]] forecast
    * (Vovk et al.; Lei et al. 2018 — the distribution-free calibration
    * recipe): the fitted one-step residuals are the calibration scores,
    * q = the ⌈(n+1)·cover⌉-th smallest |residual|, and every h-step
    * forecast ships as [ŷ−q, ŷ+q]. Finite-sample marginal coverage
    * with NO distributional assumption — the uncertainty readout a
    * forecast dashboard needs next to the point line, and the honest
    * one when nobody believes the residuals are Gaussian.
    *
    * Determinism: residuals are [[holtLinear]]'s exact longs; the rank
    * index is pure integer arithmetic (⌈(n+1)·bp/10⁴⌉ capped at n); q
    * is an exact order statistic; the band endpoints are long adds.
    *
    * Scale shape: [[holtLinear]]'s driver-fold contract — everything
    * here is bounded by the time axis; the fact-scale work happened in
    * the aggregate that built the series.
    *
    * @param coverBp target coverage in basis points (9000 = 90%)
    * @return per forecast step: (ord, fitted, lo, hi, q, n_cal)
    */
  def conformalForecast(series: DataFrame, order: Column, value: Column,
                        aNum: Long, bNum: Long, den: Long, horizon: Int,
                        coverBp: Int = 9000, stepDays: Int = 7,
                        maxLen: Int = 100000): DataFrame = {
    require(coverBp >= 1 && coverBp <= 9999,
      s"coverBp=$coverBp must be in [1, 9999]")
    require(horizon >= 1, s"horizon=$horizon must be positive for a band")
    val spark = series.sparkSession
    val rows = holtLinear(series, order, value, aNum, bNum, den, horizon,
      stepDays, maxLen).collect()
    val cal = rows.filter(r => r.getString(1) == "fit" && !r.isNullAt(6))
      .map(r => math.abs(r.getLong(6))).sorted
    require(cal.nonEmpty,
      "conformalForecast: no fitted residuals — series too short")
    val n = cal.length.toLong
    val k = math.min(n, ((n + 1) * coverBp + 9999L) / 10000L).toInt
    val q = cal(k - 1)
    val out = rows.filter(_.getString(1) == "forecast").map { r =>
      val f = r.getLong(5)
      (r.getDate(0), f, f - q, f + q, q, n)
    }.toSeq
    import spark.implicits._
    out.toDF("ord", "fitted", "lo", "hi", "q", "n_cal")
  }

  /** Holt-Winters ADDITIVE seasonal smoothing + h-step forecast (Winters
    * 1960; Hyndman & Athanasopoulos FPP §8.3) — [[holtLinear]] plus a
    * period-`p` seasonal state, the forecasting op for series whose
    * cycle the linear trend flattens away: lₜ = α(yₜ−sₜ₋ₚ) +
    * (1−α)(lₜ₋₁+bₜ₋₁), bₜ = β(lₜ−lₜ₋₁)+(1−β)bₜ₋₁, sₜ =
    * γ(yₜ−lₜ)+(1−γ)sₜ₋ₚ, fitted f̂ₜ = lₜ₋₁+bₜ₋₁+sₜ₋ₚ, forecast
    * ŷ_{T+h} = l_T + h·b_T + s_{T−p+1+((h−1) mod p)}.
    *
    * Determinism: α, β, γ are exact rationals over one `den`; level,
    * trend, and every seasonal carry den-ths as longs; each step is
    * integer multiply-adds with ONE truncating division per state (the
    * Scala `/` and DuckDB `//` both truncate toward zero — verified on
    * negatives, which seasonals hit by construction), so the trajectory
    * is engine-exact and the oracle replays it digit-for-digit as a
    * recursive CTE carrying the seasonal ring as a LIST column. Init is
    * the standard two-cycle start: l = mean of cycle 1, b = (mean of
    * cycle 2 − mean of cycle 1)/p, sᵢ = yᵢ − l for i = 1..p, all in
    * truncating den-ths; the first p rows carry that init state with
    * null fitted (no prior state to forecast them from).
    *
    * Scale shape: [[holtLinear]]'s contract — fact-scale work is the
    * aggregate that BUILT the series; the recurrence is inherently
    * sequential and folds on the driver over the collected
    * time-bounded series (loudly length-guarded).
    *
    * @param period  seasonal cycle length p in grid steps (>= 2);
    *                needs >= 2p observations (loudly)
    * @return per observed row: (ord, kind='fit', y, level_den,
    *         trend_den, season_den — the seasonal UPDATED at this step,
    *         fitted, resid), then `horizon` rows (kind='forecast',
    *         y/resid null, season_den the forecast's seasonal)
    */
  def holtWinters(series: DataFrame, order: Column, value: Column,
                  aNum: Long, bNum: Long, gNum: Long, den: Long,
                  period: Int, horizon: Int,
                  stepDays: Int = 7, maxLen: Int = 100000): DataFrame = {
    require(den > 0 && Seq(aNum, bNum, gNum).forall(n => n > 0 && n < den),
      s"smoothing rationals aNum=$aNum bNum=$bNum gNum=$gNum den=$den" +
        " must satisfy 0 < num < den")
    require(period >= 2, s"period=$period must be >= 2")
    require(horizon >= 0, s"horizon=$horizon must be non-negative")
    require(stepDays >= 1, s"stepDays=$stepDays must be positive")
    val spark = series.sparkSession
    val rows = series.where(order.isNotNull && value.isNotNull)
      .select(order.cast("date").as("ord"), value.cast("long").as("y"))
      .orderBy(col("ord")).limit(maxLen + 1).collect()
    require(rows.length >= 2 * period,
      s"holtWinters needs >= 2*period=${2 * period} observations," +
        s" got ${rows.length}")
    require(rows.length <= maxLen,
      s"holtWinters: series exceeds maxLen=$maxLen rows — this op's" +
        " driver-fold contract is for TIME-BOUNDED series; pre-aggregate" +
        " to a coarser grid or raise maxLen deliberately")
    val y = rows.map(_.getLong(1))
    val p = period
    val sum1 = y.slice(0, p).sum
    val sum2 = y.slice(p, 2 * p).sum
    var l = sum1 * den / p
    var b = (sum2 - sum1) * den / (p.toLong * p)
    val s = Array.tabulate(p)(i => y(i) * den - l)
    val out = Array.newBuilder[(java.sql.Date, String, java.lang.Long,
      Long, Long, Long, java.lang.Long, java.lang.Long)]
    (0 until p).foreach { i =>
      out += ((rows(i).getDate(0), "fit", Long.box(y(i)), l, b, s(i),
        null, null))
    }
    var t = p
    while (t < y.length) {
      val sPrev = s(t % p)
      val fitted = (l + b + sPrev) / den
      val lPrev = l
      l = (aNum * (y(t) * den - sPrev) + (den - aNum) * (lPrev + b)) / den
      b = (bNum * (l - lPrev) + (den - bNum) * b) / den
      val sNew = (gNum * (y(t) * den - l) + (den - gNum) * sPrev) / den
      s(t % p) = sNew
      out += ((rows(t).getDate(0), "fit", Long.box(y(t)), l, b, sNew,
        Long.box(fitted), Long.box(y(t) - fitted)))
      t += 1
    }
    val lastDay = rows.last.getDate(0).toLocalDate
    val n = y.length
    (1 to horizon).foreach { h =>
      val season = s((n + h - 1) % p)
      out += ((java.sql.Date.valueOf(lastDay.plusDays(stepDays.toLong * h)),
        "forecast", null, l, b, season,
        Long.box((l + h * b + season) / den), null))
    }
    import spark.implicits._
    out.result().toSeq
      .toDF("ord", "kind", "y", "level_den", "trend_den", "season_den",
        "fitted", "resid")
  }
}
