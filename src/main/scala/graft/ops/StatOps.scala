package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bivariate statistics — per-group correlation and least-squares
  * regression (extension tier; the reference's analytics stop at univariate
  * mean/median/std, etl/etl_main.py:212-218).
  *
  * Spark's built-in `corr`/`regr_slope` stream FLOAT partials whose merge
  * order follows the partition layout — two runs of the same query can
  * disagree in the last ulps, and no hash-compared oracle can gate that.
  * Here the five power sums (n, Σx, Σy, Σxy, Σx², Σy²) are accumulated as
  * exact LONG sums (associative + commutative → layout-independent), and
  * every derived statistic is one fixed IEEE expression over those exact
  * inputs — bit-reproducible across plans, partitionings, and engines,
  * same contract as [[graft.functions.MomentsAgg]].
  *
  * PRECONDITION: x and y must be integer-valued columns scaled so the sums
  * stay exactly representable — |Σx²|, |Σy²|, |Σxy| < 2^53 (the long→double
  * cast must be exact; the long sum itself throws loudly past 2^63 under
  * ANSI). For money, pass whole units (dollars), not cents, when row counts
  * are large; at corpus scales beyond that, bucket first or shift units
  * down — do NOT swap in float sums.
  */
object StatOps {

  /** Per-group (n, Σx, Σy, Σxy, Σx², Σy²) + derived slope / intercept /
    * Pearson r / R² of the y-on-x least-squares fit, rounded via
    * [[CoreOps.rnd]]. Groups with zero x-variance (or n == 1) yield null
    * slope/intercept/r/r2 rather than ±inf.
    *
    * Plan shape: one hash aggregate with map-side partials — six long
    * partials per group cross the exchange, nothing else.
    */
  def bivariateStats(df: DataFrame, group: Column, x: Column, y: Column): DataFrame = {
    val xl = x.cast("long")
    val yl = y.cast("long")
    val agged = df.groupBy(group.as("g")).agg(
      count(lit(1)).as("n"),
      sum(xl).as("sx"),
      sum(yl).as("sy"),
      sum(xl * yl).as("sxy"),
      sum(xl * xl).as("sxx"),
      sum(yl * yl).as("syy"))
    // Fixed IEEE expression over exact inputs. cov/var here are the n-fold
    // scaled versions (n·Σxy − Σx·Σy etc.) — the n² factors cancel in every
    // derived statistic, and skipping the division keeps the expression
    // shorter (fewer roundings, same determinism).
    val nD = col("n").cast("double")
    val sx = col("sx").cast("double");  val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
    val covN  = nD * sxy - sx * sy
    val varxN = nD * sxx - sx * sx
    val varyN = nD * syy - sy * sy
    val undef = col("n") === 1L || varxN <= 0.0
    val slope = covN / varxN
    agged.select(
      col("g"), col("n"),
      when(undef, lit(null).cast("double"))
        .otherwise(CoreOps.rnd(slope)).as("slope"),
      when(undef, lit(null).cast("double"))
        .otherwise(CoreOps.rnd((sy - slope * sx) / nD)).as("intercept"),
      // Pearson r additionally needs y-variance; constant-y ⇒ r undefined
      when(undef || varyN <= 0.0, lit(null).cast("double"))
        .otherwise(CoreOps.rnd(covN / sqrt(varxN * varyN))).as("pearson_r"),
      when(undef || varyN <= 0.0, lit(null).cast("double"))
        .otherwise(CoreOps.rnd(covN * covN / (varxN * varyN))).as("r2"))
  }

  /** Per-group Welch two-sample t-test — the unequal-variance A/B read
    * (Welch 1947): for each group, compare the metric between the rows
    * where `variant` is true (arm A) and false (arm B).
    *
    * `t = (mean_A − mean_B) / √(s²_A/n_A + s²_B/n_B)` with sample
    * (ddof=1) variances. Arms with fewer than 2 non-null observations, or
    * a zero pooled standard error (both arms constant), yield null t.
    *
    * Determinism: the six sufficient statistics per group (n, Σx, Σx² per
    * arm) are exact longs over integer cents — conditional aggregates, so
    * ONE pass, ONE hash aggregate with map-side partials, six partials
    * crossing the exchange. Every derived value is then a fixed IEEE
    * expression over those exact ints (IEEE sqrt is correctly rounded, so
    * engines agree bit-for-bit), rounded 4 dp. Envelope: Σx² must stay
    * inside 2⁶³ — ~10⁸ rows per (group, arm) at 10⁵-cent values; shard
    * the group key before that (same caveat family as
    * [[TimeSeriesOps.cusumChangepoints]]).
    */
  def welchTTest(df: DataFrame, group: Column, variant: Column,
                 cents: Column): DataFrame = {
    val x = cents.cast("long")
    val inA = variant && x.isNotNull
    val inB = !variant && x.isNotNull
    val zero = lit(0L)
    val agged = df.groupBy(group.as("g")).agg(
      count(when(inA, lit(1))).as("n_a"),
      sum(when(inA, x).otherwise(zero)).as("sa"),
      sum(when(inA, x * x).otherwise(zero)).as("ssa"),
      count(when(inB, lit(1))).as("n_b"),
      sum(when(inB, x).otherwise(zero)).as("sb"),
      sum(when(inB, x * x).otherwise(zero)).as("ssb"))
    val naD = col("n_a").cast("double"); val nbD = col("n_b").cast("double")
    val sa = col("sa").cast("double");   val sb = col("sb").cast("double")
    val ssa = col("ssa").cast("double"); val ssb = col("ssb").cast("double")
    // sample variance via n·Σx² − (Σx)², divided by n(n−1); cents units
    val varA = (naD * ssa - sa * sa) / (naD * (naD - 1.0))
    val varB = (nbD * ssb - sb * sb) / (nbD * (nbD - 1.0))
    val se = sqrt(varA / naD + varB / nbD)
    val undef = col("n_a") < 2L || col("n_b") < 2L || se <= 0.0
    agged.select(
      col("g"), col("n_a"), col("n_b"),
      when(col("n_a") === 0L, lit(null).cast("double"))
        .otherwise(CoreOps.rnd(sa / naD / 100.0)).as("mean_a"),
      when(col("n_b") === 0L, lit(null).cast("double"))
        .otherwise(CoreOps.rnd(sb / nbD / 100.0)).as("mean_b"),
      when(undef, lit(null).cast("double"))
        .otherwise(CoreOps.rnd((sa / naD - sb / nbD) / se)).as("t_stat"),
      when(undef, lit(null).cast("boolean"))
        .otherwise(abs((sa / naD - sb / nbD) / se) > 1.96).as("significant"))
  }

  /** Equi-width histogram of an integer-valued column: (bin, bin_lo, n,
    * share). Binning is pure integer arithmetic — `(v − v mod w) / w` is an
    * exact multiple divided by its width, so the double division is exact
    * and every engine lands rows in the same bin, negatives included
    * (pmod keeps the remainder non-negative, so the bin is the floor).
    *
    * Shape: one hash aggregate on the bin key (map-side partials), then
    * the share window runs over the BOUNDED bin table (≤ range/width
    * rows), so the empty partitionBy is a constant-size single task, not
    * a global shuffle of input rows.
    */
  def histogram(df: DataFrame, value: Column, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth must be positive")
    import org.apache.spark.sql.expressions.Window
    val v = value.cast("long")
    // (v − v mod w) is an exact multiple of w; divide it with INTEGRAL
    // division — a float division would misbin past 2^53 (same hazard
    // packSequences documents for its offsets). pmod makes the multiple a
    // floor multiple, so negatives bin into [lo, hi) like positives.
    val bin = CoreOps.integralDiv(v - pmod(v, lit(binWidth)), binWidth)
    df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"), (col("bin") * lit(binWidth)).as("bin_lo"), col("n"),
        CoreOps.rnd(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy()).cast("double")).as("share"))
  }

  /** Exact ROC-AUC — the Mann–Whitney rank statistic with the standard
    * tie correction (ties count ½) — computed WITHOUT ranking the input:
    * aggregate the (integer) scores to a (score, n_pos, n_neg) histogram,
    * run [[ScaleOps.globalRunningTotal]] over it in score order for the
    * cumulative negative count, and fold the doubled U numerator
    *
    *   U2 = Σ_bins n_pos · (2·negs_below + n_neg_at_bin),  AUC = U2 / (2·P·N)
    *
    * as exact long sums. The textbook formulation sorts all P+N scored
    * rows globally and averages ranks — a full-input global sort that is
    * the first thing to die when the eval set is a 100 TB corpus scored
    * by a classifier. Here input rows only cross one hash exchange as
    * map-combined histogram partials (rows ∝ distinct scores, not input),
    * and the prefix sum runs over the bounded histogram; ties are exact by
    * construction because tied scores share a bin. Everything up to the
    * final division is integer, so the statistic hash-matches any engine;
    * the single double division is one fixed IEEE expression, 4-dp
    * rounded via [[CoreOps.rnd]].
    *
    * @param label boolean column — true = positive class; null-labeled or
    *              null-scored rows are excluded (SQL aggregate convention)
    * @param score integer-valued column (quantize doubles to micro-units
    *              first — the same precondition every exact operator here
    *              documents); higher score should predict the positive
    *              class (AUC < 0.5 = anti-predictive, not an error)
    * @return one row: (u2, n_pos, n_neg, auc); auc is null when either
    *         class is empty (the statistic is undefined, not 0)
    *
    * Overflow precondition (loud, ENFORCED): 2·n_pos·n_neg < 2^63 —
    * a `raise_error` guard on the class totals fires with an actionable
    * message before any rank-sum term evaluates; subsample or bucket
    * scores beyond ~3·10⁹ rows per class.
    */
  def aucHistogram(df: DataFrame, label: Column, score: Column): DataFrame =
    aucFromCounts(df.where(label.isNotNull && score.isNotNull)
      .groupBy(score.cast("long").as("__s"))
      .agg(count(when(label, lit(1))).as("__pos"),
        count(when(!label, lit(1))).as("__neg")))

  /** Post-histogram stage of [[aucHistogram]], split out so the overflow
    * guard is unit-testable with synthetic billion-scale counts. Expects
    * (__s, __pos, __neg) per distinct score.
    */
  private[graft] def aucFromCounts(h: DataFrame): DataFrame = {
    val cum = ScaleOps.globalRunningTotal(h, Seq(col("__s")), col("__neg"))
    // Overflow precondition, enforced like [[ksFromCounts]]'s: u2 and each
    // of its terms are bounded by 2·n_pos·n_neg (cum ≤ n_neg), so guard on
    // the totals before any term evaluates. Conservative by at most one
    // unit of the floor division — acceptable at a 2^63 boundary.
    val n = h.agg(coalesce(sum(col("__pos")), lit(0L)).as("__tp"),
      coalesce(sum(col("__neg")), lit(0L)).as("__tn"))
    val ovf = col("__tp") > 0L &&
      col("__tn") > CoreOps.integralDiv(lit(Long.MaxValue / 2L), col("__tp"))
    val guard = raise_error(format_string(
      "graft.StatOps.aucHistogram overflow: 2*n_pos*n_neg = 2*%d*%d >=" +
        " 2^63 — subsample or bucket scores first",
      col("__tp"), col("__tn"))).cast("long")
    cum.crossJoin(broadcast(n))
      .agg(
        coalesce(sum(when(ovf, guard).otherwise(col("__pos") *
          (lit(2L) * (col("cum") - col("__neg")) + col("__neg")))), lit(0L))
          .as("u2"),
        coalesce(sum(col("__pos")), lit(0L)).as("n_pos"),
        coalesce(sum(col("__neg")), lit(0L)).as("n_neg"))
      .select(col("u2"), col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L || col("n_neg") === 0L,
          lit(null).cast("double"))
          .otherwise(CoreOps.rnd(col("u2").cast("double") /
            (lit(2.0) * col("n_pos").cast("double")
              * col("n_neg").cast("double")))).as("auc"))
  }

  /** Kaplan–Meier survival (product-limit) over integer-day durations —
    * time from a subject's first activity to its first qualifying event,
    * right-censored at `horizonDays` (administrative censoring: subjects
    * whose event falls past the horizon, or never happens, leave the
    * risk set at the horizon without counting as events). The
    * time-to-conversion / retention-curve estimator that a naive
    * "share converted by day t" gets WRONG the moment censoring exists,
    * because censored subjects must leave the denominator.
    *
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) with nᵢ = subjects whose duration
    * ≥ tᵢ. Engine-portable as a LOG-sum: each factor's ln((nᵢ−dᵢ)/nᵢ)
    * has an exact-integer-ratio argument, micro-quantizes before the
    * cumulative sum, and exponentiates once for display; a step where
    * nᵢ = dᵢ (risk set exhausted by events) drives S to exactly 0 from
    * that duration on, handled by a flag rather than ln 0.
    *
    * Scale shape: ONE fact-scale exchange (the per-subject min/min
    * aggregate); everything after runs on the duration table, bounded by
    * horizonDays+1 rows — the unpartitioned windows are constant-size
    * single tasks, same justification as [[histogram]]'s share window.
    *
    * @param eventPred row predicate marking the qualifying event (e.g.
    *                  `event_type === "purchase"`)
    * @return one row per duration with ≥1 event: (t_days, n_risk,
    *         events, surv 4-dp)
    */
  def kmSurvival(df: DataFrame, key: Column, ts: Column, eventPred: Column,
                 horizonDays: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = durationTable(df, key, ts, eventPred, horizonDays)
    val term = when(col("__d") === 0L, lit(0L))
      .when(col("n_risk") === col("__d"), lit(0L))
      .otherwise(floor(log((col("n_risk") - col("__d")).cast("double") /
        col("n_risk").cast("double")) * lit(1000000.0) + lit(0.5))
        .cast("long"))
    val dead = when(col("n_risk") === col("__d") && col("__d") > 0L, lit(1))
      .otherwise(lit(0))
    a.withColumn("n_risk", sum(col("__n_at")).over(Window.orderBy(col("t").desc)))
      .withColumn("__term", term)
      .withColumn("__dead", dead)
      .withColumn("__cum", sum(col("__term")).over(Window.orderBy(col("t"))))
      .withColumn("__anydead", max(col("__dead")).over(Window.orderBy(col("t"))))
      .where(col("__d") > 0L)
      .select(col("t").as("t_days"), col("n_risk"),
        col("__d").as("events"),
        when(col("__anydead") === 1, lit(0.0))
          .otherwise(CoreOps.rnd(exp(col("__cum").cast("double") /
            lit(1000000.0)))).as("surv"))
  }

  /** Shared duration table for the survival estimators: per subject, whole
    * days from first activity to first qualifying event, administratively
    * censored at `horizonDays`, then grouped to (t, __n_at subjects with
    * duration t, __d of them that are events). The ONE fact-scale exchange
    * of [[kmSurvival]] / [[naHazard]]; everything downstream is bounded by
    * horizonDays+1 rows. */
  private def durationTable(df: DataFrame, key: Column, ts: Column,
                            eventPred: Column, horizonDays: Int): DataFrame = {
    require(horizonDays >= 1, s"horizonDays=$horizonDays must be positive")
    val us = unix_micros(ts)
    val u = df.where(key.isNotNull && ts.isNotNull)
      .groupBy(key.as("__k"))
      .agg(min(us).as("__f"), min(when(eventPred, us)).as("__p"))
    val tRaw = CoreOps.integralDiv(col("__p") - col("__f"), 86400000000L)
    val horizon = lit(horizonDays.toLong)
    val durations = u.select(
      when(col("__p").isNotNull && tRaw <= horizon, tRaw)
        .otherwise(horizon).as("t"),
      (col("__p").isNotNull && tRaw <= horizon).cast("int").as("__ev"))
    durations.groupBy(col("t"))
      .agg(count(lit(1)).as("__n_at"), sum(col("__ev")).as("__d"))
  }

  /** Nelson–Aalen cumulative hazard over the same censored duration table
    * as [[kmSurvival]] — H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ, the counting-process
    * companion to the product-limit curve (Nelson 1972, Aalen 1978; see
    * also the Fleming–Harrington survival estimate S̃(t) = e^{−H(t)},
    * which dominates KM exactly where small risk sets make the product
    * unstable). Extension tier: the reference's analytics stop at
    * univariate mean/median/std (etl/etl_main.py:212-218).
    *
    * Determinism: each increment is the EXACT truncating integer division
    * (dᵢ·10⁶) div nᵢ — no float ratio ever forms — and the cumulative
    * hazard is an exact long sum over those increments, so every output
    * digit is engine-portable; the single display exponential is one
    * fixed IEEE expression, 4-dp floored, same contract as [[kmSurvival]].
    *
    * Scale shape: identical to [[kmSurvival]] — ONE fact-scale exchange
    * (the per-subject min/min aggregate in [[durationTable]]); the
    * cumulative windows run over the horizonDays+1-row duration table, a
    * constant-size single task.
    *
    * @return one row per duration with ≥1 event: (t_days, n_risk, events,
    *         h_inc_micro, cum_hazard_micro, na_surv 4-dp)
    */
  def naHazard(df: DataFrame, key: Column, ts: Column, eventPred: Column,
               horizonDays: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val a = durationTable(df, key, ts, eventPred, horizonDays)
    a.withColumn("n_risk", sum(col("__n_at")).over(Window.orderBy(col("t").desc)))
      .withColumn("h_inc_micro",
        CoreOps.integralDiv(col("__d") * lit(1000000L), col("n_risk")))
      .withColumn("cum_hazard_micro",
        sum(col("h_inc_micro")).over(Window.orderBy(col("t"))))
      .where(col("__d") > 0L)
      .select(col("t").as("t_days"), col("n_risk"), col("__d").as("events"),
        col("h_inc_micro"), col("cum_hazard_micro"),
        CoreOps.rnd(exp(-col("cum_hazard_micro").cast("double") /
          lit(1000000.0))).as("na_surv"))
  }

  /** Two-arm log-rank test (Mantel 1966; Peto & Peto 1972) over the same
    * censored integer-day durations as [[kmSurvival]] — the inferential
    * closer of the survival family: KM/NA DRAW the two curves, log-rank
    * says whether they differ beyond chance. At each duration t with ≥1
    * event, arm A's observed events d₁ₜ are compared to the
    * hypergeometric expectation dₜ·n₁ₜ/nₜ; O−E sums across times, the
    * variance Σ dₜ(n₁ₜ/nₜ)(n₂ₜ/nₜ)(nₜ−dₜ)/(nₜ−1) normalizes it, and
    * Z = (O−E)/√V ~ N(0,1) under H₀. The A/B read for time-to-event
    * outcomes where a naive means test is wrong under censoring.
    *
    * Determinism: the expectation and variance terms are micro-quantized
    * with TRUNCATING integer divisions in a fixed order — e₁ₜ =
    * (dₜ·n₁ₜ·10⁶) div nₜ, then b = (e₁ₜ·n₂ₜ) div nₜ, then v₁ₜ =
    * (b·(nₜ−dₜ)) div (nₜ−1) — and summed as exact longs, so every
    * reported integer column is engine-portable; z/chi2 are one fixed
    * IEEE expression each, 4-dp. Per-subject arm is min(arm) for
    * determinism (the arm must be constant per subject; a subject that
    * appears under both arms is assigned the lexicographic minimum).
    * Exactly two arms are required — anything else fails loudly.
    * Overflow precondition (loud): dₜ·n₁ₜ < 2^63/10⁶ per event time —
    * a `raise_error` guard fires with an actionable message; bucket
    * durations coarser beyond that.
    *
    * Scale shape: ONE fact-scale exchange (the per-subject min/min/min
    * aggregate); the per-arm duration table is 2·(horizonDays+1) rows,
    * and the event-time risk join, pivot, and final sum all run on that
    * bounded frame.
    *
    * @return one row: (arm_a, arm_b, n_a, n_b — subjects per arm,
    *         n_times — event times, o_a — arm-A observed events,
    *         e_a_micro — expected in micro-events, v_micro — variance in
    *         micro-units, z 4-dp, chi2 4-dp; z/chi2 null when V = 0)
    */
  def logRank(df: DataFrame, key: Column, ts: Column, eventPred: Column,
              arm: Column, horizonDays: Int): DataFrame = {
    require(horizonDays >= 1, s"horizonDays=$horizonDays must be positive")
    val us = unix_micros(ts)
    val u = df.where(key.isNotNull && ts.isNotNull && arm.isNotNull)
      .groupBy(key.as("__k"))
      .agg(min(arm.cast("string")).as("__a"), min(us).as("__f"),
        min(when(eventPred, us)).as("__p"))
    val tRaw = CoreOps.integralDiv(col("__p") - col("__f"), 86400000000L)
    val horizon = lit(horizonDays.toLong)
    val dt = u.select(col("__a"),
        when(col("__p").isNotNull && tRaw <= horizon, tRaw)
          .otherwise(horizon).as("t"),
        (col("__p").isNotNull && tRaw <= horizon).cast("int").as("__ev"))
      .groupBy(col("__a"), col("t"))
      .agg(count(lit(1)).as("__n_at"), sum(col("__ev")).cast("long").as("__d"))
    // Arm inventory — bounded (k distinct arms); the k ≠ 2 case fails
    // loudly in the final projection rather than mis-pivoting silently.
    val per = dt.groupBy(col("__a")).agg(sum(col("__n_at")).as("__na"))
    val lim = per.agg(count(lit(1)).as("__karms"),
      min(col("__a")).as("arm_a"), max(col("__a")).as("arm_b"))
    val info = per.crossJoin(broadcast(lim))
      .groupBy(col("__karms"), col("arm_a"), col("arm_b"))
      .agg(coalesce(sum(when(col("__a") === col("arm_a"), col("__na"))),
          lit(0L)).as("n_a"),
        coalesce(sum(when(col("__a") === col("arm_b"), col("__na"))),
          lit(0L)).as("n_b"))
    // Event-time grid (durations where either arm saw an event) and each
    // arm's risk set there: a theta-join of two bounded frames.
    val et = dt.groupBy(col("t")).agg(sum(col("__d")).as("__dt"))
      .where(col("__dt") > 0L).select(col("t").as("__te"))
    val risk = dt.join(et, dt("t") >= et("__te"))
      .groupBy(et("__te").as("__t"), dt("__a").as("__ra"))
      .agg(sum(col("__n_at")).as("__nr"),
        sum(when(dt("t") === et("__te"), col("__d")).otherwise(lit(0L)))
          .as("__da"))
    val byTime = risk.crossJoin(broadcast(info))
      .groupBy(col("__t"), col("__karms"), col("arm_a"), col("arm_b"),
        col("n_a"), col("n_b"))
      .agg(
        coalesce(sum(when(col("__ra") === col("arm_a"), col("__nr"))),
          lit(0L)).as("__n1"),
        coalesce(sum(when(col("__ra") === col("arm_a"), col("__da"))),
          lit(0L)).as("__d1"),
        coalesce(sum(when(col("__ra") === col("arm_b"), col("__nr"))),
          lit(0L)).as("__n2"),
        coalesce(sum(when(col("__ra") === col("arm_b"), col("__da"))),
          lit(0L)).as("__d2"))
    val n = col("__n1") + col("__n2")
    val d = col("__d1") + col("__d2")
    // Guard BOTH downstream products: e1 = d·n1·1e6/n needs d·n1·1e6 <
    // 2^63, and the very next step multiplies __e1 (up to d·1e6) by
    // __n2 — so the bound must cover d·max(n1, n2), or an asymmetric
    // risk set (tiny arm A, huge arm B) overflows e1·n2 first and dies
    // with a generic ANSI error instead of this actionable one.
    val nMax = greatest(col("__n1"), col("__n2"))
    val ovf = d > 0L &&
      nMax > CoreOps.integralDiv(lit(Long.MaxValue / 1000000L), d)
    val guard = raise_error(format_string(
      "graft.StatOps.logRank overflow: d*max(n1,n2) = %d*%d >= 2^63/1e6" +
        " at one event time — bucket durations coarser first",
      d, nMax)).cast("long")
    val e1 = when(ovf, guard)
      .otherwise(CoreOps.integralDiv(d * col("__n1") * lit(1000000L), n))
    val terms = byTime
      .withColumn("__e1", e1)
      .withColumn("__b", CoreOps.integralDiv(col("__e1") * col("__n2"), n))
      .withColumn("__v1", when(n > 1L,
        CoreOps.integralDiv(col("__b") * (n - d), n - lit(1L)))
        .otherwise(lit(0L)))
    val badArms = raise_error(format_string(
      "graft.StatOps.logRank: expected exactly 2 arms, found %d",
      col("__karms"))).cast("long")
    terms
      .groupBy(col("__karms"), col("arm_a"), col("arm_b"), col("n_a"),
        col("n_b"))
      .agg(count(lit(1)).as("n_times"),
        coalesce(sum(col("__d1")), lit(0L)).as("o_a"),
        coalesce(sum(col("__e1")), lit(0L)).as("e_a_micro"),
        coalesce(sum(col("__v1")), lit(0L)).as("v_micro"))
      .select(col("arm_a"), col("arm_b"),
        when(col("__karms") =!= 2L, badArms).otherwise(col("n_a")).as("n_a"),
        col("n_b"), col("n_times"), col("o_a"), col("e_a_micro"),
        col("v_micro"),
        when(col("v_micro") === 0L, lit(null).cast("double"))
          .otherwise(CoreOps.rnd(
            (col("o_a").cast("double") -
              col("e_a_micro").cast("double") / lit(1000000.0)) /
              sqrt(col("v_micro").cast("double") / lit(1000000.0))))
          .as("z"),
        when(col("v_micro") === 0L, lit(null).cast("double"))
          .otherwise(CoreOps.rnd(
            pow(col("o_a").cast("double") -
              col("e_a_micro").cast("double") / lit(1000000.0), 2.0) /
              (col("v_micro").cast("double") / lit(1000000.0))))
          .as("chi2"))
  }

  /** Calibration reliability diagram — the per-bin audit of a [0, 1]
    * score against a binary outcome (is the scorer's "0.7" actually right
    * 70% of the time?), the companion read to [[aucHistogram]]: AUC says
    * the RANKING separates classes, the reliability table says the LEVELS
    * mean what they claim (DeGroot & Fienberg 1983; Niculescu-Mizil &
    * Caruana 2005). The quality-score-vs-label calibration check a
    * training-data pipeline runs before thresholding a heuristic scorer.
    *
    * Determinism: the score arrives micro-quantized ([0, 10⁶] longs); bin
    * assignment, per-bin mean prediction (sum div n), observed positive
    * rate (pos·10⁶ div n), and their gap are all exact truncating integer
    * arithmetic — no float forms anywhere, every output column is a long.
    *
    * Scale shape: ONE map-side-combined hash aggregate to ≤ `bins` rows;
    * derived columns are map-only over that bounded table. Overflow: the
    * per-bin score sum needs n_bin·10⁶ < 2^63 (n_bin below ~9·10¹²) —
    * loudly guarded, far past the 100 TB envelope.
    *
    * @param scoreMicro integer score in [0, 10⁶] (caller quantizes;
    *                   out-of-range values are loudly rejected)
    * @return one row per non-empty bin: (bin, n, pos, mean_pred_micro,
    *         frac_pos_micro, gap_micro = mean_pred − frac_pos)
    */
  def reliabilityBins(df: DataFrame, label: Column, scoreMicro: Column,
                      bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins=$bins outside [2, 1000]")
    val s = when(scoreMicro < 0L || scoreMicro > 1000000L,
      raise_error(format_string(
        "graft.StatOps.reliabilityBins: score_micro %d outside [0, 1e6]" +
          " — quantize scores into micro-units first", scoreMicro))
      .cast("long")).otherwise(scoreMicro)
    val bin = least(CoreOps.integralDiv(s * lit(bins.toLong), 1000000L),
      lit(bins.toLong - 1L))
    val agged = df.where(scoreMicro.isNotNull && label.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(label.cast("int")).as("pos"),
        sum(s).as("__ssum"))
    val guarded = agged.withColumn("n",
      when(col("n") >= lit(9223372036854L), raise_error(format_string(
        "graft.StatOps.reliabilityBins overflow: bin count %d pushes the" +
          " micro-score sum past 2^63 — shard the audit first", col("n")))
        .cast("long")).otherwise(col("n")))
    guarded
      .withColumn("mean_pred_micro", CoreOps.integralDiv(col("__ssum"), col("n")))
      .withColumn("frac_pos_micro",
        CoreOps.integralDiv(col("pos") * lit(1000000L), col("n")))
      .select(col("bin"), col("n"), col("pos"), col("mean_pred_micro"),
        col("frac_pos_micro"),
        (col("mean_pred_micro") - col("frac_pos_micro")).as("gap_micro"))
  }

  /** Per-group Wilson score interval (Wilson 1927) for a binary rate —
    * the error bar a conversion/defect-rate readout ships with, correct
    * where the naive ±z√(p̂q̂/n) Wald band fails (small n, p̂ near 0/1:
    * Wald collapses to zero width at p̂ ∈ {0, 1}; Wilson never does):
    * center = (p̂ + z²/2n) / (1 + z²/n), half-width =
    * z·√(p̂q̂/n + z²/4n²) / (1 + z²/n).
    *
    * Determinism: (n, pos) are exact longs off one hash aggregate; the
    * interval is ONE fixed IEEE expression over them (√ is correctly
    * rounded by IEEE 754; the z² literal parses to the same double in
    * both engines), 4-dp displayed.
    *
    * Scale shape: one fact-scale hash aggregate to the per-group
    * (n, pos) table; everything after is group-count bounded, map-only.
    *
    * @param z normal quantile (default 1.96 — the 95 % band)
    * @return per group: (g, n, pos, rate, wilson_lo, wilson_hi), 4-dp
    */
  def wilsonIntervals(df: DataFrame, group: Column, success: Column,
                      z: Double = 1.96): DataFrame = {
    import CoreOps.rnd
    require(z > 0, s"z=$z must be positive")
    val agged = df.where(group.isNotNull && success.isNotNull)
      .groupBy(group.as("g"))
      .agg(count(lit(1)).as("n"), sum(success.cast("int")).as("pos"))
    val nD = col("n").cast("double")
    val p = col("pos").cast("double") / nD
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / nD
    val center = (p + z2 / (lit(2.0) * nD)) / denom
    val hw = (lit(z) * sqrt(p * (lit(1.0) - p) / nD
      + z2 / (lit(4.0) * nD * nD))) / denom
    agged.select(col("g"), col("n"), col("pos"),
      rnd(p).as("rate"),
      rnd(center - hw).as("wilson_lo"),
      rnd(center + hw).as("wilson_hi"))
  }

  /** Cohen's κ inter-annotator agreement (Cohen 1960) — the label-noise
    * read a data-labeling pipeline runs between two raters (or a rater
    * and a heuristic): κ = (p_o − p_e)/(1 − p_e), chance-corrected
    * agreement over the confusion matrix. Everything up to the final
    * division is EXACT integers: κ = (n·a − e)/(n² − e) with a = Σ n_ii
    * (observed agreement count) and e = Σ_l row_l·col_l (chance
    * agreement numerator) — no float probability ever enters, so the
    * statistic hash-matches any engine.
    *
    * Scale shape: ONE fact-scale hash aggregate to the label-pair
    * confusion table (bounded by the label domain, checkpointed once
    * for its four consumers); margins and the scalar reduce run on that
    * bounded table. Envelope (loud under ANSI): n² < 2^63 → n below
    * ~3×10⁹ rated items; shard past that.
    *
    * @return one row: (n, n_labels — distinct labels across both
    *         raters, agree, po 4-dp, pe 4-dp, kappa 4-dp; kappa null
    *         when p_e = 1 — a single shared label, agreement undefined)
    */
  def cohensKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    import CoreOps.rnd
    val conf = df.where(raterA.isNotNull && raterB.isNotNull)
      .groupBy(raterA.cast("string").as("__a"),
        raterB.cast("string").as("__b"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val nAgree = conf.agg(sum(col("__c")).as("n"),
      coalesce(sum(when(col("__a") === col("__b"), col("__c"))), lit(0L))
        .as("agree"))
    val rows = conf.groupBy(col("__a").as("__l")).agg(sum("__c").as("__ra"))
    val cols = conf.groupBy(col("__b").as("__l")).agg(sum("__c").as("__rb"))
    val labels = rows.select("__l").unionAll(cols.select("__l")).distinct()
    val e = rows.join(cols, Seq("__l"))
      .agg(coalesce(sum(col("__ra") * col("__rb")), lit(0L)).as("__e"))
    val nLab = labels.agg(count(lit(1)).as("n_labels"))
    nAgree.crossJoin(broadcast(nLab)).crossJoin(broadcast(e))
      .select(col("n"), col("n_labels"), col("agree"),
        rnd(col("agree").cast("double") / col("n").cast("double")).as("po"),
        rnd(col("__e").cast("double")
          / (col("n") * col("n")).cast("double")).as("pe"),
        when(col("n") * col("n") === col("__e"),
          lit(null).cast("double"))
          .otherwise(rnd(
            (col("n") * col("agree") - col("__e")).cast("double")
              / (col("n") * col("n") - col("__e")).cast("double")))
          .as("kappa"))
  }

  /** Murphy (1973) decomposition of the Brier score over the
    * [[reliabilityBins]] grid — Brier = REL − RES + UNC read off the
    * same per-bin table the reliability diagram plots: REL (calibration
    * error the diagram shows), RES (how much the forecast separates
    * outcomes), UNC (base-rate entropy, the no-skill floor). The direct
    * fact-scale Brier rides along so the binning/micro-grid residual is
    * visible rather than assumed away.
    *
    * Exactness: per-bin gaps are exact micro integers off
    * [[reliabilityBins]]' integer table, each squared term accumulates
    * as an exact long (micro² units), and only the four displayed
    * ratios are IEEE divisions — no float sum whose order could differ
    * across engines. ō enters RES on the same micro grid (one integer
    * division), a deterministic quantization shared by the oracle.
    * Envelope (loud under ANSI): n·10¹² < 2^63 → n below ~9.2×10⁶
    * scored rows per audit; shard or sample beyond.
    *
    * @param scoreMicro forecast probability in [0, 1e6] micro-units
    * @return one row: (n, pos, brier, reliability, resolution,
    *         uncertainty), all 4-dp
    */
  def brierDecomposition(df: DataFrame, label: Column, scoreMicro: Column,
                         bins: Int = 10): DataFrame = {
    import CoreOps.rnd
    // the bin table is bins-bounded; checkpoint so its two consumers
    // (totals, term sums) run the fact-scale aggregate once
    val binsDf = reliabilityBins(df, label, scoreMicro, bins)
      .localCheckpoint(true)
    val tot = binsDf.agg(sum(col("n")).as("n"), sum(col("pos")).as("pos"))
    // exact micro² accumulators: n_k·gap², n_k·(ō_k − ō)²
    val terms = binsDf.crossJoin(broadcast(
        tot.select(col("n").as("__nt"), col("pos").as("__pt"))))
      .withColumn("__obar",
        CoreOps.integralDiv(col("__pt") * lit(1000000L), col("__nt")))
      .agg(
        coalesce(sum(col("n") * col("gap_micro") * col("gap_micro")),
          lit(0L)).as("__rel2"),
        coalesce(sum(col("n") * (col("frac_pos_micro") - col("__obar"))
          * (col("frac_pos_micro") - col("__obar"))), lit(0L)).as("__res2"))
    // direct Brier at fact scale, exact micro² per row
    val s = when(scoreMicro < 0L || scoreMicro > 1000000L,
      raise_error(format_string(
        "graft.StatOps.brierDecomposition: score_micro %d outside" +
          " [0, 1e6] — quantize scores into micro-units first", scoreMicro))
      .cast("long")).otherwise(scoreMicro)
    val direct = df.where(scoreMicro.isNotNull && label.isNotNull)
      .select(((s - label.cast("long") * lit(1000000L))
        * (s - label.cast("long") * lit(1000000L))).as("__d2"))
      .agg(coalesce(sum(col("__d2")), lit(0L)).as("__b2"))
    tot.crossJoin(broadcast(terms)).crossJoin(broadcast(direct))
      .select(col("n"), col("pos"),
        rnd(col("__b2").cast("double") / 1e12 / col("n").cast("double"))
          .as("brier"),
        rnd(col("__rel2").cast("double") / 1e12 / col("n").cast("double"))
          .as("reliability"),
        rnd(col("__res2").cast("double") / 1e12 / col("n").cast("double"))
          .as("resolution"),
        rnd(col("pos").cast("double") * (col("n") - col("pos")).cast("double")
          / (col("n") * col("n")).cast("double")).as("uncertainty"))
  }

  /** Exact two-sample Kolmogorov–Smirnov distance — the nonparametric
    * "did the distribution change?" companion to [[welchTTest]] (means)
    * and [[aucHistogram]] (ranking): D = sup_s |F_a(s) − F_b(s)|,
    * computed ENTIRELY in integers as max |cumA·n_b − cumB·n_a| over the
    * merged value histogram, divided once at the end — no float CDFs, so
    * the supremum and its argmax are engine-exact, ties included.
    *
    * Scale shape: one fact-scale hash exchange builds the per-value
    * (c_a, c_b) histogram; the cumulative window then runs over the
    * BOUNDED histogram (rows ∝ distinct values — integer cents here), a
    * constant-size single task like [[histogram]]'s share window. For a
    * value domain too large for that, run the same max over two
    * [[ScaleOps.globalRunningTotal]] passes — the formulation is
    * unchanged, only the prefix-sum mechanism swaps.
    *
    * Overflow precondition (loud, ENFORCED): cum·n < 2^63 → n_a·n_b <
    * 2^63, i.e. each sample below ~3·10⁹ rows; subsample or bucket beyond
    * that. A `raise_error` guard on the sample totals fires with an
    * actionable message before any product evaluates (StatOpsSpec proves
    * the loud failure on synthetic billion-scale counts).
    *
    * @return one row: (n_a, n_b, d_num = max|cumA·n_b − cumB·n_a|,
    *         d_stat = d_num/(n_a·n_b) 4-dp; null when a sample is empty)
    */
  def ksTest(df: DataFrame, label: Column, value: Column): DataFrame =
    ksFromCounts(df.where(label.isNotNull && value.isNotNull)
      .groupBy(value.cast("long").as("__s"))
      .agg(count(when(label, lit(1))).as("__ca"),
        count(when(!label, lit(1))).as("__cb")))

  /** Post-histogram stage of [[ksTest]], split out so the overflow guard
    * is unit-testable with synthetic billion-scale counts (building 3·10⁹
    * real rows in a spec is not). Expects (__s, __ca, __cb) per distinct
    * value. Also the entry point for the doc's too-large-value-domain
    * path: build the histogram with [[ScaleOps.globalRunningTotal]]-style
    * machinery and feed it here.
    */
  private[graft] def ksFromCounts(h: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("__s"))
    val c = h.select(
      sum(col("__ca")).over(w).as("__cua"),
      sum(col("__cb")).over(w).as("__cub"))
    val n = c.agg(coalesce(max(col("__cua")), lit(0L)).as("n_a"),
      coalesce(max(col("__cub")), lit(0L)).as("n_b"))
    // Enforce the documented overflow precondition LOUDLY: every product
    // below is bounded by n_a·n_b (cum ≤ n), so past 2^63 ANSI mode would
    // abort mid-aggregate with a generic ARITHMETIC_OVERFLOW that names
    // neither the operator nor the remedy. Raise the actionable error
    // first, before any product can evaluate (the products sit in the
    // otherwise-branch, so they never run once the guard trips).
    val ovf = col("n_a") > 0L &&
      col("n_b") > CoreOps.integralDiv(lit(Long.MaxValue), col("n_a"))
    val guard = raise_error(format_string(
      "graft.StatOps.ksTest overflow: n_a*n_b = %d*%d >= 2^63 — subsample" +
        " or bucket values first", col("n_a"), col("n_b"))).cast("long")
    c.crossJoin(broadcast(n))
      .agg(coalesce(max(col("n_a")), lit(0L)).as("n_a"),
        coalesce(max(col("n_b")), lit(0L)).as("n_b"),
        coalesce(max(when(ovf, guard).otherwise(abs(col("__cua") * col("n_b")
          - col("__cub") * col("n_a")))), lit(0L)).as("d_num"))
      .select(col("n_a"), col("n_b"), col("d_num"),
        when(col("n_a") === 0L || col("n_b") === 0L,
          lit(null).cast("double"))
          .otherwise(CoreOps.rnd(col("d_num").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double"))))
          .as("d_stat"))
  }

  /** Mutual information between two categorical columns, with the joint
    * entropy — the model-free feature-association screen (is the label
    * leaking through a feature? is a pair redundant?): MI = Σ p_xy ·
    * ln(p_xy / (p_x·p_y)), 0 iff independent. The ln argument is formed
    * from INTEGER products, (c_xy·n)/(c_x·c_y), so both engines feed the
    * log identical doubles, and each term micro-quantizes before the sum
    * (associative longs — the same engine-portability recipe as
    * [[ChangeOps.mixtureDrift]]).
    *
    * Scale shape: one fact-scale hash aggregate to the (x, y) joint
    * histogram; marginals and the total are windows over that bounded
    * table (≤ |X|·|Y| rows), so nothing after the first exchange sees
    * input-proportional data.
    *
    * @return one row: (n, mi_micro, mi, h_joint) — the exact long
    *         micro-sum plus 4-dp displays
    *
    * Overflow precondition (loud, ENFORCED): c_xy·n < 2^63 and c_x·c_y <
    * 2^63 — a per-cell `raise_error` guard fires with an actionable
    * message before either product evaluates; bucket categories or
    * subsample beyond ~3·10⁹ rows.
    */
  def mutualInformation(df: DataFrame, x: Column, y: Column): DataFrame =
    miFromJoint(df.where(x.isNotNull && y.isNotNull)
      .groupBy(x.as("__x"), y.as("__y"))
      .agg(count(lit(1)).as("__cxy")))

  /** Post-histogram stage of [[mutualInformation]], split out so the
    * overflow guard is unit-testable with synthetic billion-scale counts.
    * Expects the joint histogram (__x, __y, __cxy).
    */
  private[graft] def miFromJoint(c: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = c
      .withColumn("__cx", sum(col("__cxy")).over(Window.partitionBy(col("__x"))))
      .withColumn("__cy", sum(col("__cxy")).over(Window.partitionBy(col("__y"))))
      .withColumn("__n", sum(col("__cxy")).over(Window.partitionBy()))
    val pxy = col("__cxy").cast("double") / col("__n").cast("double")
    // Per-cell overflow guard on the two integer products feeding the ln
    // argument (c_xy·n and c_x·c_y, each bounded only by n²): raise the
    // actionable error instead of ANSI's generic ARITHMETIC_OVERFLOW. The
    // joint histogram is bounded (≤ |X|·|Y| rows), so the per-row integral
    // divisions cost nothing measurable.
    val ovf = (col("__cxy") > 0L &&
        col("__n") > CoreOps.integralDiv(lit(Long.MaxValue), col("__cxy"))) ||
      (col("__cx") > 0L &&
        col("__cy") > CoreOps.integralDiv(lit(Long.MaxValue), col("__cx")))
    val guard = raise_error(format_string(
      "graft.StatOps.mutualInformation overflow: c_xy*n = %d*%d or" +
        " c_x*c_y = %d*%d >= 2^63 — bucket categories or subsample first",
      col("__cxy"), col("__n"), col("__cx"), col("__cy"))).cast("long")
    val mt = when(ovf, guard)
      .otherwise(floor(pxy * log((col("__cxy") * col("__n")).cast("double") /
        (col("__cx") * col("__cy")).cast("double")) * lit(1000000.0) + lit(0.5))
        .cast("long"))
    val ht = floor(pxy * log(pxy) * lit(-1000000.0) + lit(0.5)).cast("long")
    t.agg(max(col("__n")).as("n"), sum(mt).as("mi_micro"), sum(ht).as("__h"))
      .select(col("n"), col("mi_micro"),
        CoreOps.rnd(col("mi_micro").cast("double") / lit(1000000.0)).as("mi"),
        CoreOps.rnd(col("__h").cast("double") / lit(1000000.0)).as("h_joint"))
  }

  /** First-significant-digit distribution (the Benford's-law fraud /
    * data-fabrication screen): (digit, n, share) over the positive values
    * of an integer-valued column. The digit is extracted lexically —
    * `substr(cast(v AS string), 1, 1)` — pure integer/string ops, so every
    * engine agrees exactly (a log10-based extraction would hinge on
    * transcendental rounding). Non-positive values carry no leading
    * significant digit and are excluded.
    *
    * Shape: map-side partial counts into a 9-group hash aggregate; the
    * share window runs over the 9-row digit table only.
    */
  def benfordDigits(df: DataFrame, value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = value.cast("long")
    df.where(v > 0L)
      .groupBy(substring(v.cast("string"), 1, 1).cast("int").as("digit"))
      .agg(count(lit(1)).as("n"))
      .select(col("digit"), col("n"),
        CoreOps.rnd(col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy()).cast("double")).as("share"))
  }

  /** Per-group Gini coefficient — the inequality read ("how concentrated
    * is this week's revenue across its orders?") via the tie-aware rank
    * formula on the per-group VALUE HISTOGRAM: with doubled average
    * ranks r2 = 2·cumBefore + c + 1, the numerator Σ r2·v·c equals
    * 2·Σ rank·x exactly, and G = (Σ r2·v·c − (n+1)·S) / (n·S) — every
    * term an exact long, ONE IEEE division at the end (negative values
    * rejected loudly; Gini is undefined below zero).
    *
    * Scale shape: one fact-scale hash aggregate to the (group, value)
    * histogram; the cumulative window PARTITIONS BY GROUP over histogram
    * rows (distinct values per group — never raw rows, never a single
    * partition). Envelope (loud under ANSI): 2·n·S < 2^63 per group.
    *
    * @return per group: (g, n, gini 4-dp); all-zero groups yield null
    */
  def giniByGroup(df: DataFrame, group: Column, value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val guarded = when(value < 0L, raise_error(format_string(
      "graft.StatOps.giniByGroup: negative value %d — Gini needs" +
        " non-negative values; shift or clamp first", value.cast("long")))
      .cast("long")).otherwise(value.cast("long"))
    val h = df.where(group.isNotNull && value.isNotNull)
      .groupBy(group.as("g"), guarded.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy("g").orderBy("__v")
    val r2 = sum(col("__c")).over(wCum) * 2L - col("__c") + 1L
    h.withColumn("__r2vc", r2 * col("__v") * col("__c"))
      .groupBy("g")
      .agg(sum(col("__c")).as("n"), sum(col("__v") * col("__c")).as("__s"),
        sum(col("__r2vc")).as("__num"))
      .select(col("g"), col("n"),
        when(col("__s") === 0L, lit(null).cast("double"))
          .otherwise(CoreOps.rnd(
            (col("__num") - (col("n") + 1L) * col("__s")).cast("double") /
              (col("n") * col("__s")).cast("double"))).as("gini"))
  }

  /** Kendall τ-b between two metrics of a BOUNDED series — the
    * tie-corrected concordance coefficient (Kendall 1945): over all
    * pairs, τ_b = (C − D) / √((n₀−t_x)(n₀−t_y)) with n₀ = n(n−1)/2 and
    * t the tied-pair counts per axis. The third rank-association read
    * next to [[spearman]] (magnitude-free, O(1)-interpretable as
    * P(concordant) − P(discordant)) — and the exact statistic
    * [[graft.ops.TimeSeriesOps.mannKendall]] specializes when one axis
    * is time.
    *
    * Everything before the final division is an exact integer: pair
    * signs, C, D, tie counts. Pair enumeration order cannot matter —
    * concordance is symmetric under swapping a pair's endpoints — so no
    * tie-break discipline is even needed. τ is one fixed IEEE
    * expression, 4-dp.
    *
    * Scale: the O(n²) pair join runs on the caller-reduced bounded frame
    * only (same bounded-quadratic contract as mannKendall/theilSen) —
    * and the contract is ENFORCED: the op counts the reduced frame and
    * fails loudly past `maxN` rows (default 10⁴ → ≤5×10⁷ pairs), the
    * same loud-precondition treatment as holtLinear's maxLen. A fact
    * table handed in by mistake dies with an actionable message, not a
    * silent cartesian explosion.
    *
    * @param maxN hard row cap on the reduced frame (loud require)
    * @return one row: (n, concordant, discordant, tau_b)
    */
  def kendallTau(df: DataFrame, x: Column, y: Column,
                 maxN: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import CoreOps.rnd
    require(maxN >= 2, s"maxN=$maxN must be at least 2")
    val s0 = df.where(x.isNotNull && y.isNotNull)
      .select(x.cast("long").as("__x"), y.cast("long").as("__y"))
    val nIn = s0.limit(maxN + 1).count()
    require(nIn <= maxN,
      s"kendallTau: frame exceeds maxN=$maxN rows — this op's O(n²)" +
        " pair join is bounded-quadratic by contract; pre-aggregate to" +
        " a coarser grid or raise maxN deliberately")
    val s = s0
      .withColumn("__rn", row_number().over(
        Window.orderBy(col("__x"), col("__y"))))
    val a = s.select(col("__rn").as("__ra"), col("__x").as("__xa"),
      col("__y").as("__ya"))
    val b = s.select(col("__rn").as("__rb"), col("__x").as("__xb"),
      col("__y").as("__yb"))
    val sgn = (c: Column) =>
      when(c > 0L, lit(1L)).when(c < 0L, lit(-1L)).otherwise(lit(0L))
    val pairs = a.join(b, col("__ra") < col("__rb"))
      .select((sgn(col("__xb") - col("__xa")) *
        sgn(col("__yb") - col("__ya"))).as("__p"))
      .agg(coalesce(sum(when(col("__p") === 1L, 1L).otherwise(0L)), lit(0L))
          .as("concordant"),
        coalesce(sum(when(col("__p") === -1L, 1L).otherwise(0L)), lit(0L))
          .as("discordant"))
    val n = s.agg(count(lit(1)).as("n"))
    def tiePairs(c: Column, out: String): DataFrame =
      s.groupBy(c.as("__g")).agg(count(lit(1)).as("__t"))
        .agg(coalesce(expr("sum(__t * (__t - 1)) div 2"), lit(0L)).as(out))
    pairs.crossJoin(broadcast(n))
      .crossJoin(broadcast(tiePairs(col("__x"), "__tx")))
      .crossJoin(broadcast(tiePairs(col("__y"), "__ty")))
      .withColumn("__n0", expr("(n * (n - 1)) div 2"))
      .select(col("n"), col("concordant"), col("discordant"),
        when(col("__n0") === col("__tx") || col("__n0") === col("__ty"),
          lit(null).cast("double"))
          .otherwise(rnd(
            (col("concordant") - col("discordant")).cast("double") /
              sqrt((col("__n0") - col("__tx")).cast("double") *
                (col("__n0") - col("__ty")).cast("double"))))
          .as("tau_b"))
  }

  /** Half-sample bootstrap confidence interval for the per-group mean —
    * the distribution-free error bar a metrics pipeline attaches to its
    * weekly aggregates: `reps` deterministic half-samples per group, each
    * replicate's mean, and the empirical [loQ, hiQ] band of those means
    * (Efron 1979's percentile method over half-sampling — the
    * "bag of little bootstraps"-style variant that needs no row
    * duplication, only membership tests).
    *
    * Determinism is the whole design: replicate membership is a PURE
    * FUNCTION of (row key, replicate id) — the Knuth multiplicative hash
    * `pmod((k·reps + b) · 2654435761, 2^32)`, row included in replicate b
    * iff the hash lands in the top half — so every engine draws the SAME
    * "random" samples with no RNG state anywhere. pmod (not %) folds
    * NEGATIVE keys onto the same wheel, so signed ids participate
    * instead of silently failing every membership test. Replicate means are one
    * fixed IEEE division of exact long sums; the band picks ranks
    * ⌈q·cnt⌉ (tie-break by replicate id), so ordering is identical
    * everywhere.
    *
    * Scale shape: the replicate fan-out is generated MAP-SIDE (explode of
    * a `reps`-element sequence) and immediately reduced by the hash
    * aggregate to (group, replicate) partials — the shuffled volume is
    * |groups|·reps rows, never reps× the fact table. The rank window
    * partitions by group over the reps-bounded replicate table. Overflow
    * envelope (loud under ANSI): |k·reps + reps|·2654435761 < 2^63 →
    * |k|·reps < 3.4×10⁹ — shard the key space past that.
    *
    * @param key stable row identity (drives membership; cast to long)
    * @return per group: (n, mean, ci_lo, ci_hi, n_reps), money rescaled
    *         /100 and 4-dp rounded
    */
  def bootstrapMeanCi(df: DataFrame, group: Column, key: Column,
                      valueCents: Column, reps: Int = 100,
                      loQ: Double = 0.05, hiQ: Double = 0.95): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(reps >= 2, s"reps=$reps must be at least 2")
    require(loQ > 0 && hiQ <= 1 && loQ < hiQ,
      s"quantile band ($loQ, $hiQ) must satisfy 0 < lo < hi <= 1")
    val base = df
      .where(group.isNotNull && key.isNotNull && valueCents.isNotNull)
      .select(group.as("g"), key.cast("long").as("k"),
        valueCents.cast("long").as("v"))
    val repMembers = base
      .select(col("g"), col("k"), col("v"),
        explode(sequence(lit(0), lit(reps - 1))).as("__b"))
      .select(col("g"), col("k"), col("v"), col("__b").cast("long").as("b"))
      // pmod, not %: Spark's % keeps the dividend's sign, so a NEGATIVE
      // key would make the hash negative, the >= 2^31 test always false,
      // and the row silently vanish from every replicate — pmod folds
      // both signs onto the same [0, 2^32) wheel (oracle mirrors with
      // ((x % m) + m) % m).
      .where(pmod((col("k") * lit(reps.toLong) + col("b"))
          * lit(2654435761L), lit(4294967296L)) >= lit(2147483648L))
    val repMeans = repMembers.groupBy("g", "b")
      .agg(count(lit(1)).as("__n"), sum(col("v")).as("__s"))
      .select(col("g"), col("b"),
        (col("__s").cast("double") / col("__n").cast("double")).as("__m"))
    val w = Window.partitionBy("g")
    val ranked = repMeans
      .withColumn("__rn", row_number().over(
        w.orderBy(col("__m"), col("b"))))
      .withColumn("__cnt", count(lit(1)).over(w))
    val ci = ranked.groupBy("g").agg(
      max(col("__cnt")).as("n_reps"),
      max(when(col("__rn") === greatest(lit(1L),
        ceil(lit(loQ) * col("__cnt"))), col("__m"))).as("__lo"),
      max(when(col("__rn") === ceil(lit(hiQ) * col("__cnt")),
        col("__m"))).as("__hi"))
    base.groupBy("g")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("__s"))
      .join(ci, Seq("g"), "left")
      .select(col("g"), col("n"),
        CoreOps.rnd(col("__s").cast("double") / col("n").cast("double")
          / lit(100.0)).as("mean"),
        CoreOps.rnd(col("__lo") / lit(100.0)).as("ci_lo"),
        CoreOps.rnd(col("__hi") / lit(100.0)).as("ci_hi"),
        coalesce(col("n_reps"), lit(0L)).as("n_reps"))
  }

  /** Spearman rank correlation — tie-aware average ranks on a fixed
    * 1e4-unit percentile grid: the monotone-association read Pearson
    * ([[bivariateStats]]) misses when the relationship is nonlinear, and
    * the robust one when either column is heavy-tailed (ranks are
    * outlier-immune by construction).
    *
    * Exactness recipe: the doubled average rank `r2 = 2·cumBefore + c + 1`
    * is an exact integer off each marginal histogram's prefix sum (ties get
    * the textbook midrank, no float averaging), then snaps to the
    * percentile grid with ONE integer floor division `p = (r2·5000) div n`
    * (both engines truncate positive longs identically). Pearson over the
    * grid ranks runs as exact long power sums weighted by the joint
    * histogram's counts, and ρ is one fixed IEEE expression over those
    * exact sums, 4-dp rounded — bit-reproducible across partitionings and
    * engines. Grid quantization bounds the error at ±2e-4 on ρ while
    * keeping Σp² ≤ 1e8·n — without it the exact rank products grow as n³
    * and overflow long at ~2e6 rows.
    *
    * Scale shape: ONE fact-scale hash aggregate to the (x, y) joint
    * histogram (map-side partials; only distinct value pairs cross the
    * exchange); marginals, prefix-sum ranks, and the final power sums all
    * run over value-domain-bounded tables. The rank windows order a
    * marginal histogram, never the fact table. Overflow precondition
    * (loud): Σp·p′·c ≤ 1e8·n < 2^63 → n < 9.2×10¹⁰ rows, enforced with
    * `raise_error` before the products; the fixed-IEEE contract
    * additionally wants the sums exactly double-castable (< 2^53, the
    * [[bivariateStats]] envelope) — shift the grid down a digit past that.
    *
    * @param x integer-valued column (quantize first; small domain best)
    * @param y integer-valued column
    * @return one row: (n, rho_s 4-dp)
    */
  def spearman(df: DataFrame, x: Column, y: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // MATERIALIZED: three consumers (both marginals + the cell join)
    // would otherwise each re-run the fact-scale aggregate — Catalyst
    // collapses the marginal groupings straight onto the base table, so
    // exchange reuse never triggers (PlanSpec pins the single fact pass).
    val joint = df.where(x.isNotNull && y.isNotNull)
      .groupBy(x.cast("long").as("x"), y.cast("long").as("y"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    // Marginal percentile-grid ranks off the bounded histograms: the
    // window orders distinct VALUES of one column, not fact rows.
    def gridRanks(keyCol: String, out: String): DataFrame = {
      val h = joint.groupBy(keyCol).agg(sum("c").as("ck"))
      val cum = sum(col("ck")).over(Window.orderBy(keyCol))
      h.select(col(keyCol),
          (cum * 2L - col("ck") + 1L).as("__r2"),
          sum(col("ck")).over(Window.partitionBy()).as("__n"))
        .select(col(keyCol),
          expr("(__r2 * 5000) div __n").as(out))
    }
    val px = gridRanks("x", "px")
    val py = gridRanks("y", "py")
    val cells = joint.join(px, "x").join(py, "y")
    val sums = cells.agg(
      sum(col("c")).as("n"),
      sum(col("px") * col("c")).as("sx"),
      sum(col("py") * col("c")).as("sy"),
      sum(col("px") * col("px") * col("c")).as("sxx"),
      sum(col("py") * col("py") * col("c")).as("syy"),
      sum(col("px") * col("py") * col("c")).as("sxy"))
    // 1e8·n must stay under 2^63 for the weighted grid products.
    val guarded = sums.select(
      when(col("n") >= lit(92233720368L), raise_error(format_string(
        "graft.StatOps.spearman overflow: n = %d pushes 1e8*n past 2^63" +
          " — shift the percentile grid down a digit", col("n")))
        .cast("long")).otherwise(col("n")).as("n"),
      col("sx"), col("sy"), col("sxx"), col("syy"), col("sxy"))
    val nD = col("n").cast("double")
    val sx = col("sx").cast("double");  val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
    val covN  = nD * sxy - sx * sy
    val varxN = nD * sxx - sx * sx
    val varyN = nD * syy - sy * sy
    guarded.select(col("n"),
      when(varxN <= 0.0 || varyN <= 0.0, lit(null).cast("double"))
        .otherwise(CoreOps.rnd(covN / sqrt(varxN * varyN))).as("rho_s"))
  }

  /** Robust per-group location: mean, trimmed mean, and winsorized mean
    * in one pass (Tukey 1962 frames both as the standard outlier-robust
    * location family). Trimming DROPS the k_lo lowest and k_hi highest
    * observations; winsorizing CLAMPS them to the surviving boundary
    * values — the robust read an `avg` poisoned by a fat tail needs,
    * with exact counts rather than approximate quantile cuts.
    *
    * Determinism: k_lo = (n·loBp) div 10⁴ and k_hi = (n·hiBp) div 10⁴
    * are truncating integer cuts of per-group ranks; trimmed and
    * winsorized sums are exact longs (the clamp boundary values are the
    * actual order statistics at ranks k_lo+1 and n−k_hi, well-defined
    * under ties); the three means are one double division each, 4-dp.
    * loBp + hiBp < 10⁴ guarantees ≥ 1 surviving row per group, so no
    * division can hit zero.
    *
    * Scale shape: ONE key exchange — the rank window and the group
    * count/sum run on the same key partitioning, and the final aggregate
    * reuses it (no second fact scan for the boundary values: they come
    * from conditional aggregation over the ranked rows). Per-key sort is
    * the usual distributed sort-within-partition; salt upstream if one
    * key dominates.
    *
    * @param loBp basis points trimmed from the low tail (1000 = 10%)
    * @param hiBp basis points trimmed from the high tail
    * @return per key: (key, n, k_lo, k_hi, mean, trimmed_mean,
    *         winsor_mean — all 4-dp in input units)
    */
  def robustMeans(df: DataFrame, key: Column, value: Column,
                  loBp: Int = 1000, hiBp: Int = 1000): DataFrame = {
    require(loBp >= 0 && hiBp >= 0 && loBp + hiBp < 10000,
      s"loBp=$loBp hiBp=$hiBp must be non-negative and sum below 10000")
    import org.apache.spark.sql.expressions.Window
    val base = df.where(key.isNotNull && value.isNotNull)
      .select(key.as("key"), value.cast("long").as("__v"))
    val r = base
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("__v"))).cast("long"))
      .withColumn("__n",
        count(lit(1)).over(Window.partitionBy(col("key"))))
    val kLo = CoreOps.integralDiv(col("__n") * lit(loBp.toLong), 10000L)
    val kHi = CoreOps.integralDiv(col("__n") * lit(hiBp.toLong), 10000L)
    val inMid = col("__rn") > kLo && col("__rn") <= col("__n") - kHi
    r.groupBy(col("key"))
      .agg(max(col("__n")).as("n"),
        max(kLo).as("k_lo"), max(kHi).as("k_hi"),
        sum(col("__v")).as("__s"),
        coalesce(sum(when(inMid, col("__v"))), lit(0L)).as("__st"),
        coalesce(sum(when(inMid, 1L)), lit(0L)).as("__ct"),
        max(when(col("__rn") === kLo + 1L, col("__v"))).as("__vlo"),
        max(when(col("__rn") === col("__n") - kHi, col("__v"))).as("__vhi"))
      .select(col("key"), col("n"), col("k_lo"), col("k_hi"),
        CoreOps.rnd(col("__s").cast("double") / col("n").cast("double"))
          .as("mean"),
        CoreOps.rnd(col("__st").cast("double") / col("__ct").cast("double"))
          .as("trimmed_mean"),
        CoreOps.rnd((col("__st") + col("k_lo") * col("__vlo")
          + col("k_hi") * col("__vhi")).cast("double")
          / col("n").cast("double")).as("winsor_mean"))
  }

  /** Difference-in-differences over a 2×2 (group × period) design: the
    * causal-inference workhorse for "did the treated group's metric
    * move MORE than the control's after the cutoff" — the read a
    * before/after comparison alone gets wrong whenever both groups
    * drift together. DID = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre).
    *
    * Determinism: the four cells are exact (Σ long, n long) pairs off
    * ONE fact-scale hash aggregate; each mean and the DID are single
    * IEEE expressions over those exact sums, displayed 4-dp in display
    * units (value/100 — the cents discipline).
    *
    * @param treated boolean column naming the treatment group
    * @param post    boolean column naming the post period
    * @param value   integer-scaled metric (cents)
    * @return ONE row: per cell (n_<cell>, mean_<cell>) for
    *         tpre/tpost/cpre/cpost, plus did 4-dp — null if any cell
    *         is empty (the design is broken, say so rather than 0)
    */
  def didEstimate(df: DataFrame, treated: Column, post: Column,
                  value: Column): DataFrame = {
    val cells = df
      .where(treated.isNotNull && post.isNotNull && value.isNotNull)
      .groupBy(treated.as("__t"), post.as("__p"))
      .agg(count(lit(1)).as("__n"), sum(value.cast("long")).as("__s"))
    def cell(t: Boolean, p: Boolean, suffix: String) = Seq(
      coalesce(max(when(col("__t") === t && col("__p") === p, col("__n"))),
        lit(0L)).as(s"n_$suffix"),
      max(when(col("__t") === t && col("__p") === p,
        col("__s").cast("double") / col("__n").cast("double") / 100.0))
        .as(s"__m_$suffix"))
    val allCells = cell(true, false, "tpre") ++ cell(true, true, "tpost") ++
      cell(false, false, "cpre") ++ cell(false, true, "cpost")
    val aggAll = cells.agg(allCells.head, allCells.tail: _*)
    import CoreOps.rnd
    aggAll.select(
      col("n_tpre"), rnd(col("__m_tpre")).as("mean_tpre"),
      col("n_tpost"), rnd(col("__m_tpost")).as("mean_tpost"),
      col("n_cpre"), rnd(col("__m_cpre")).as("mean_cpre"),
      col("n_cpost"), rnd(col("__m_cpost")).as("mean_cpost"),
      rnd((col("__m_tpost") - col("__m_tpre"))
        - (col("__m_cpost") - col("__m_cpre"))).as("did"))
  }

  /** Smoothed target encoding (Micci-Barreca 2001) + the
    * leave-one-category-out check: per category, the shrunk mean
    * enc = (Σy_c + m·μ)/(n_c + m) — rare categories pull toward the
    * global mean instead of memorizing their few labels — plus
    * enc_rest = (S − Σy_c)/(N − n_c), the complement mean whose gap to
    * enc is the leakage a category-as-feature would inject. The
    * feature-engineering op every tabular training pipeline runs, done
    * with the smoothing that makes it safe.
    *
    * Determinism: both encodings are single ratios of exact integer
    * products — enc = (Σy_c·N + m·S)/(N·(n_c + m)) carries the global
    * mean as the exact rational S/N rather than a rounded double —
    * displayed 4-dp. Overflow (loud under ANSI): Σy_c·N < 2⁶³; whole
    * currency units hold to ~10⁷ rows of ~10⁵-unit values per category
    * — quantize coarser beyond.
    *
    * Scale shape: ONE fact-scale hash aggregate; the global totals are
    * a broadcast scalar; output is category-count bounded.
    *
    * @param m smoothing pseudo-count (categories with n_c ≪ m read as
    *          the global mean)
    * @return per category: (category, n, sum_y, enc 4-dp, enc_rest
    *         4-dp — null when the category holds every row)
    */
  def targetEncoding(df: DataFrame, category: Column, y: Column,
                     m: Long): DataFrame = {
    import CoreOps.rnd
    require(m >= 1, s"m=$m must be positive")
    val cats = df.where(category.isNotNull && y.isNotNull)
      .groupBy(category.as("category"))
      .agg(count(lit(1)).as("n"), sum(y.cast("long")).as("sum_y"))
    val tot = cats.agg(sum(col("n")).as("__N"), sum(col("sum_y")).as("__S"))
    cats.crossJoin(broadcast(tot))
      .select(col("category"), col("n"), col("sum_y"),
        rnd((col("sum_y") * col("__N") + lit(m) * col("__S")).cast("double")
          / (col("__N") * (col("n") + lit(m))).cast("double")).as("enc"),
        when(col("__N") === col("n"), lit(null).cast("double"))
          .otherwise(rnd((col("__S") - col("sum_y")).cast("double")
            / (col("__N") - col("n")).cast("double"))).as("enc_rest"))
  }

  /** Neyman-optimal stratified sample allocation (Neyman 1934): split a
    * sampling budget across strata ∝ N_h·σ_h — the allocation that
    * minimizes the estimator's variance, vs the proportional ∝ N_h a
    * naive splitter uses (identical only when every stratum has the
    * same spread). The audit/QA sampling op: spend the label budget
    * where the metric actually varies.
    *
    * Determinism: per-stratum (n, Σy, Σy²) are exact longs; σ_h is ONE
    * IEEE sqrt (correctly rounded per IEEE-754) over those; the weight
    * quantizes to w_h = floor(n_h·σ_h + ½) and the integer allocation
    * is largest-remainder over exact longs ([[graft.ops.CorpusOps]]'s
    * waterfilling discipline): floor share (B·w_h) div W, remainders
    * ranked (remainder desc, stratum) — allocations SUM TO B exactly.
    * Overflow (loud under ANSI): B·w_h < 2⁶³ — a 10⁶ budget against
    * 10¹²-scale weights fits with headroom.
    *
    * Scale shape: ONE fact-scale hash aggregate to the per-stratum
    * table; the ranking window runs over strata (bounded domain — the
    * waterfill precedent), never the facts.
    *
    * @return per stratum: (stratum, n, sd 4-dp, w, alloc), every
    *         stratum present (zero-variance strata carry w = 0 and only
    *         win remainder units if the budget exceeds ΣfloorShares)
    */
  def neymanAllocation(df: DataFrame, stratum: Column, value: Column,
                       budget: Long): DataFrame = {
    import CoreOps.rnd
    require(budget >= 1, s"budget=$budget must be positive")
    val s = df.where(stratum.isNotNull && value.isNotNull)
      .groupBy(stratum.as("stratum"))
      .agg(count(lit(1)).as("n"),
        sum(value.cast("long")).as("__sy"),
        sum(value.cast("long") * value.cast("long")).as("__syy"))
    val nD = col("n").cast("double")
    val varH = col("__syy").cast("double") / nD -
      (col("__sy").cast("double") / nD) * (col("__sy").cast("double") / nD)
    val t = s.withColumn("sd", rnd(sqrt(varH)))
      .withColumn("w", floor(sqrt(varH) * nD + 0.5).cast("long"))
    val tot = t.agg(sum(col("w")).as("__W"))
    val shares = t.crossJoin(broadcast(tot))
      .withColumn("__floor",
        CoreOps.integralDiv(lit(budget) * col("w"), col("__W")))
      .withColumn("__rem", (lit(budget) * col("w")) % col("__W"))
    val fsum = shares.agg(sum(col("__floor")).as("__fsum"))
    val byRem = org.apache.spark.sql.expressions.Window
      .orderBy(col("__rem").desc, col("stratum"))
    shares.crossJoin(broadcast(fsum))
      .withColumn("__rk", row_number().over(byRem).cast("long"))
      .select(col("stratum"), col("n"), col("sd"), col("w"),
        (col("__floor") + when(col("__rk") <= lit(budget) - col("__fsum"),
          1L).otherwise(0L)).as("alloc"))
  }

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker 2013): adjust
    * a per-unit experiment metric by its pre-period covariate —
    * ŷᵢ = yᵢ − θ(xᵢ − x̄) with θ = cov(x,y)/var(x) — and report how much
    * metric variance the adjustment removes. The experimentation-
    * platform op that makes [[welchTTest]]-style comparisons sensitive
    * enough to ship: same mean, (1 − ρ²)× the variance.
    *
    * Determinism: everything derives from the five exact long sums
    * (n, Σx, Σy, Σx², Σxy, Σy²) of ONE unit-level aggregate — var(ŷ) is
    * computed algebraically as var(y) − cov²/var(x), never a second
    * pass over adjusted rows — so θ, both variances, and the reduction
    * are single IEEE expressions over exact integers, 4-dp. Variances
    * are reported in the metric's OWN units² — callers pick the
    * quantization. Overflow (loud under ANSI, documented): Σx² under
    * 2⁶³ needs n·(per-unit total)² < 9.2·10¹⁸ — whole currency units
    * hold to ~10⁸ units of ~10⁶-unit spend; cents there do NOT (the
    * reason the graded query quantizes to units, not cents).
    *
    * @param unit unit (user) key; x/y are summed per unit first
    * @param x    pre-period covariate (integer-scaled)
    * @param y    experiment-period metric (integer-scaled)
    * @return ONE row: (n_units, theta, var_y, var_adj, reduction —
    *         1 − var_adj/var_y; nulls when var(x) or var(y) is 0)
    */
  def cupedAdjusted(df: DataFrame, unit: Column, x: Column,
                    y: Column): DataFrame = {
    import CoreOps.rnd
    val perUnit = df.where(unit.isNotNull)
      .groupBy(unit.as("__u"))
      .agg(coalesce(sum(x.cast("long")), lit(0L)).as("__x"),
        coalesce(sum(y.cast("long")), lit(0L)).as("__y"))
    val s = perUnit.agg(
      count(lit(1)).as("n_units"),
      sum(col("__x")).as("__sx"), sum(col("__y")).as("__sy"),
      sum(col("__x") * col("__x")).as("__sxx"),
      sum(col("__x") * col("__y")).as("__sxy"),
      sum(col("__y") * col("__y")).as("__syy"))
    val n = col("n_units").cast("double")
    val varX = col("__sxx").cast("double") / n -
      (col("__sx").cast("double") / n) * (col("__sx").cast("double") / n)
    val varY = col("__syy").cast("double") / n -
      (col("__sy").cast("double") / n) * (col("__sy").cast("double") / n)
    val covXY = col("__sxy").cast("double") / n -
      (col("__sx").cast("double") / n) * (col("__sy").cast("double") / n)
    s.select(col("n_units"),
      when(varX === 0.0, lit(null).cast("double"))
        .otherwise(rnd(covXY / varX)).as("theta"),
      rnd(varY).as("var_y"),
      when(varX === 0.0, lit(null).cast("double"))
        .otherwise(rnd(varY - covXY * covXY / varX)).as("var_adj"),
      when(varX === 0.0 || varY === 0.0, lit(null).cast("double"))
        .otherwise(rnd(covXY * covXY / (varX * varY))).as("reduction"))
  }
}
