package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application and slowly-changing-dimension history
  * (extension tier). The reference recomputes its whole dashboard from raw
  * every run (etl/etl_main.py:149-156 re-downloads and re-aggregates); a
  * warehouse-scale engine instead needs the incremental counterparts:
  * apply a batch of keyed upserts/deletes onto a snapshot (the batch MERGE
  * shape), and compact a keyed change stream into validity intervals
  * (SCD type 2). Both are single-window-exchange plans — the shuffle is on
  * the entity key, volume ∝ rows, never a self-join.
  */
object ChangeOps {

  /** Latest-wins change application — the batch MERGE/upsert shape.
    *
    * Semantics: `base` rows carry implicit change priority 0, `changes`
    * rows priority 1 upward via `version` (higher wins; among equal
    * versions a change outranks base). Per key the single winner survives;
    * a winner whose `deleteFlag` is true removes the key entirely.
    *
    * `changes` must contain every `base` column (extra change-side columns
    * — the version source, delete markers — are allowed and dropped from
    * the result); `version` and `deleteFlag` are evaluated on `changes`
    * only — base rows take version = -inf, delete = false. Ordering must
    * be total per key across base ∪ changes: base unique per key and a
    * tie-breaking version on the change side, or winners are
    * nondeterministic exactly where SQL MERGE would reject duplicate
    * matches.
    *
    * Plan shape: unionByName is a no-shuffle concat; the only exchange is
    * the window hash partition on `keys`. row_number + rn=1 filter
    * collapses to WindowGroupLimit (per-partition partial top-1 before the
    * exchange), so the shuffle carries at most one candidate row per key
    * per map partition.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String],
                   version: Column, deleteFlag: Column): DataFrame = {
    val cols = base.columns.toSeq
    val b = base
      .withColumn("__v", lit(null).cast("long"))
      .withColumn("__del", lit(false))
    val c = changes
      // null change versions pin to MinValue so "any change beats base"
      // holds deterministically (a bare null would tie with base's null
      // under desc_nulls_last and leave the winner to chance)
      .withColumn("__v", coalesce(version.cast("long"), lit(Long.MinValue)))
      .withColumn("__del", deleteFlag)
      .select((cols :+ "__v" :+ "__del").map(col): _*)
    // nulls_first on the DESC version puts base (__v null → asc_nulls_first
    // reversed) LAST: any change beats base. Spark desc() is nulls-last.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__v").desc_nulls_last)
    b.unionByName(c)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && !col("__del"))
      .drop("__rn", "__v", "__del")
  }

  /** SCD type-2 history build: compact a keyed, timestamped change stream
    * into validity intervals over the tracked attributes.
    *
    * Two window passes over the SAME (keys; ts, tie) ordering — one
    * exchange, the second window reuses the first's partitioning and sort:
    *  1. change detection: keep a row iff any tracked attribute differs
    *     from the previous row of the key (null-safe struct compare), so
    *     consecutive duplicates compact away;
    *  2. intervals: effective_from = its ts, effective_to = the NEXT
    *     surviving change's ts (null on the open current row),
    *     is_current = effective_to IS NULL.
    *
    * `tie` must make the ordering total (same-ts changes of one key), or
    * interval endpoints are nondeterministic.
    */
  def scd2(changes: DataFrame, keys: Seq[String], ts: Column, tie: Column,
           tracked: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ts.asc, tie.asc)
    val cur = struct(tracked.map(col): _*)
    val changed = changes
      .withColumn("__prev", lag(cur, 1).over(w))
      // first row of a key: lag is null → keep (a real null-attr row still
      // differs via the null-safe compare on the struct)
      .where(col("__prev").isNull || !(cur <=> col("__prev")))
      .drop("__prev")
    changed
      .withColumn("effective_from", ts)
      .withColumn("effective_to", lead(ts, 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
  }

  /** Snapshot diff: classify every key across two snapshots as `added`
    * (new side only), `removed` (old side only), `changed` (present in
    * both, any tracked attribute differs null-safely), or `unchanged` —
    * with `n_diff_cols` counting how many tracked attributes moved (null
    * for added/removed rows, which have no counterpart to count against).
    * The audit table a warehouse publishes alongside a snapshot swap, and
    * the input a selective-recompute step reads (only `changed`/`added`
    * keys need reprocessing — the incremental answer to the reference's
    * recompute-everything daily run).
    *
    * Plan shape: ONE full-outer equi-join on the keys — two key-hashed
    * exchanges feeding a SortMergeJoin, the correct fact×fact plan (a
    * full outer cannot broadcast); everything else is per-row projection.
    * Presence is detected by explicit markers, not tracked-column
    * nullness, so an all-null-attributes row still classifies correctly.
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                   tracked: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs join keys")
    require(tracked.nonEmpty, "snapshotDiff needs tracked attributes")
    val o = oldDf.select(
      (keys.map(col) ++ tracked.map(c => col(c).as(s"__o_$c"))): _*)
      .withColumn("__in_o", lit(true))
    val n = newDf.select(
      (keys.map(col) ++ tracked.map(c => col(c).as(s"__n_$c"))): _*)
      .withColumn("__in_n", lit(true))
    val nDiff = tracked.map(c =>
      when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    o.join(n, keys, "full_outer")
      .withColumn("status",
        when(col("__in_o").isNull, lit("added"))
          .when(col("__in_n").isNull, lit("removed"))
          .when(nDiff > 0, lit("changed"))
          .otherwise(lit("unchanged")))
      .withColumn("n_diff_cols",
        when(col("__in_o").isNull || col("__in_n").isNull,
          lit(null).cast("long")).otherwise(nDiff))
      .select((keys.map(col) :+ col("status") :+ col("n_diff_cols")): _*)
  }

  /** NUMERIC distribution drift between consecutive periods — the
    * Kolmogorov–Smirnov companion to [[mixtureDrift]]'s categorical JSD:
    * per period, the exact two-sample KS distance between this period's
    * and the previous period's value distribution, computed entirely in
    * integers over the merged value histogram
    * ([[StatOps.ksTest]]'s formulation, per period-pair):
    * D = max |cum_cur·n_prev − cum_prev·n_cur| / (n_cur·n_prev).
    *
    * Scale shape: one fact-scale hash aggregate to the (period, value)
    * histogram; the previous period attaches by shifting that reduced
    * table forward and full-outer-joining, and every cumulative window
    * is PARTITIONED BY the period — no single-partition stage anywhere,
    * at any domain size. Boundary periods (no predecessor) drop.
    *
    * @param value integer-valued column (quantize money to cents first)
    * @return (period, n, n_prev, d_num, d_stat 4-dp) per period with a
    *         predecessor on the `stepDays` grid
    */
  def distributionDrift(df: DataFrame, period: Column, value: Column,
                        stepDays: Int = 7): DataFrame = {
    require(stepDays > 0, s"stepDays=$stepDays must be positive")
    import CoreOps.rnd
    val h = df.where(period.isNotNull && value.isNotNull)
      .groupBy(period.as("period"), value.cast("long").as("__s"))
      .agg(count(lit(1)).as("c"))
    val prev = h.select(date_add(col("period"), stepDays).as("period"),
      col("__s"), col("c").as("d"))
    val grid = h.join(prev, Seq("period", "__s"), "full_outer")
      .select(col("period"), col("__s"),
        coalesce(col("c"), lit(0L)).as("c"),
        coalesce(col("d"), lit(0L)).as("d"))
    val wCum = Window.partitionBy(col("period")).orderBy(col("__s"))
    val wAll = Window.partitionBy(col("period"))
    grid
      .withColumn("__cua", sum(col("c")).over(wCum))
      .withColumn("__cub", sum(col("d")).over(wCum))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("n_prev", sum(col("d")).over(wAll))
      .where(col("n") > 0 && col("n_prev") > 0)
      .groupBy(col("period"))
      .agg(max(col("n")).as("n"), max(col("n_prev")).as("n_prev"),
        max(abs(col("__cua") * col("n_prev") - col("__cub") * col("n")))
          .as("d_num"))
      .select(col("period"), col("n"), col("n_prev"), col("d_num"),
        rnd(col("d_num").cast("double") /
          (col("n").cast("double") * col("n_prev").cast("double")))
          .as("d_stat"))
  }

  /** Distribution drift between consecutive periods — per period, the
    * Jensen–Shannon divergence of the categorical mixture against the
    * previous period's, plus the current mixture's Shannon entropy. The
    * monitoring statistic a pipeline alerts on when an upstream source
    * changes shape (a scraper breaking, a locale flipping, a category
    * vanishing): JSD is symmetric, finite even when a category appears or
    * disappears (KL alone is +∞ there), and bounded by ln 2.
    *
    * Scale shape: the only fact-scale operation is the first
    * (period, category) hash aggregate (map-side partials, narrow rows).
    * The previous period attaches by shifting that reduced table forward
    * `stepDays` and full-outer-joining on (period, category) — so a
    * category present in only one side still contributes its half of the
    * divergence — and every window/aggregation after that runs over the
    * bounded periods×categories table. Boundary periods (no predecessor,
    * or nothing current) drop: the statistic compares two real mixtures
    * or none.
    *
    * Engine portability: each per-category term p·ln(p/m) (m the
    * two-sided mean) quantizes to micro-unit longs BEFORE the per-period
    * sum — associative, layout-independent — and the ln input is the
    * same fixed IEEE expression over exact integer counts on both
    * engines; doubled-JSD stays integer in `jsd2_micro`, with `jsd` and
    * `entropy` as displayed 4-dp roundings.
    *
    * @param period   DATE column, already truncated to the period grain
    *                 (e.g. [[CoreOps.weekStart]] cast to date)
    * @param stepDays grid distance between consecutive periods
    * @return (period, n, n_prev, jsd2_micro, jsd, entropy) per period
    *         with a predecessor on the grid
    */
  def mixtureDrift(df: DataFrame, period: Column, category: Column,
                   stepDays: Int = 7): DataFrame = {
    require(stepDays > 0, s"stepDays=$stepDays must be positive")
    import CoreOps.rnd
    val counts = df.where(period.isNotNull && category.isNotNull)
      .groupBy(period.as("period"), category.as("cat"))
      .agg(count(lit(1)).as("c"))
    val prev = counts.select(date_add(col("period"), stepDays).as("period"),
      col("cat"), col("c").as("d"))
    val grid = counts.join(prev, Seq("period", "cat"), "full_outer")
      .select(col("period"), col("cat"),
        coalesce(col("c"), lit(0L)).as("c"),
        coalesce(col("d"), lit(0L)).as("d"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("period"))))
      .withColumn("n_prev",
        sum(col("d")).over(Window.partitionBy(col("period"))))
      .where(col("n") > 0 && col("n_prev") > 0)
    val pp = col("c").cast("double") / col("n").cast("double")
    val qq = col("d").cast("double") / col("n_prev").cast("double")
    val m = (pp + qq) / lit(2.0)
    val t1 = when(col("c") > 0,
      floor(pp * log(pp / m) * lit(1000000.0) + lit(0.5)).cast("long"))
      .otherwise(lit(0L))
    val t2 = when(col("d") > 0,
      floor(qq * log(qq / m) * lit(1000000.0) + lit(0.5)).cast("long"))
      .otherwise(lit(0L))
    val h = when(col("c") > 0,
      floor(pp * log(pp) * lit(-1000000.0) + lit(0.5)).cast("long"))
      .otherwise(lit(0L))
    grid.groupBy(col("period"))
      .agg(max(col("n")).as("n"), max(col("n_prev")).as("n_prev"),
        sum(t1 + t2).as("jsd2_micro"), sum(h).as("__h"))
      .select(col("period"), col("n"), col("n_prev"), col("jsd2_micro"),
        rnd(col("jsd2_micro").cast("double") / lit(2000000.0)).as("jsd"),
        rnd(col("__h").cast("double") / lit(1000000.0)).as("entropy"))
  }

  /** Pearson χ² categorical drift between consecutive periods — the
    * frequentist companion to [[mixtureDrift]]'s JSD (JSD sizes the
    * mixture shift; χ² scales it by sample size into a test statistic a
    * monitor can threshold at a p-value, the remaining standard drift
    * alarm a production pipeline ships): per period, the two-sample
    * homogeneity χ² of the current category mixture against the previous
    * period's, over the same shifted full-outer grid.
    *
    * Algebra: for the 2×k table with rows (c_i, d_i), row sums
    * (n, n_prev) and column sums m_i = c_i + d_i, the textbook
    * Σ (O−E)²/E collapses to Σ_i (c_i·n_prev − d_i·n)² /
    * (n·n_prev·m_i) — every numerator is an EXACT integer, so each term
    * is one fixed IEEE expression over exact longs, micro-quantized
    * before the associative long sum (the [[StatOps.mutualInformation]]
    * recipe — engines agree to the bit).
    *
    * Scale shape: identical to [[mixtureDrift]] — one fact-scale hash
    * aggregate to (period, cat) counts; every window period-partitioned
    * (the drift family's no-SinglePartition PlanSpec pin covers this
    * operator too). Overflow precondition (loud, ENFORCED): the integer
    * products are bounded by n·n_prev < 2^63 — the same per-row
    * raise_error guard as [[StatOps.ksTest]].
    *
    * @return (period, n, n_prev, dof, chi2_micro, chi2) per period with
    *         a predecessor on the grid; dof = categories observed across
    *         the two periods − 1
    */
  def chiSquareDrift(df: DataFrame, period: Column, category: Column,
                     stepDays: Int = 7): DataFrame = {
    require(stepDays > 0, s"stepDays=$stepDays must be positive")
    import CoreOps.rnd
    val counts = df.where(period.isNotNull && category.isNotNull)
      .groupBy(period.as("period"), category.as("cat"))
      .agg(count(lit(1)).as("c"))
    val prev = counts.select(date_add(col("period"), stepDays).as("period"),
      col("cat"), col("c").as("d"))
    val grid = counts.join(prev, Seq("period", "cat"), "full_outer")
      .select(col("period"), col("cat"),
        coalesce(col("c"), lit(0L)).as("c"),
        coalesce(col("d"), lit(0L)).as("d"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("period"))))
      .withColumn("n_prev",
        sum(col("d")).over(Window.partitionBy(col("period"))))
      .where(col("n") > 0 && col("n_prev") > 0)
    val ovf = col("n") > 0L &&
      col("n_prev") > CoreOps.integralDiv(lit(Long.MaxValue), col("n"))
    val guard = raise_error(format_string(
      "graft.ChangeOps.chiSquareDrift overflow: n*n_prev = %d*%d >= 2^63" +
        " — subsample or bucket the periods first",
      col("n"), col("n_prev"))).cast("long")
    // c ≤ n and d ≤ n_prev, so both products (and their difference) stay
    // inside the guarded n·n_prev bound; m > 0 on every grid row (a row
    // exists only where at least one side counted something)
    val delta = when(ovf, guard)
      .otherwise(col("c") * col("n_prev") - col("d") * col("n"))
    val term = floor(delta.cast("double") * delta.cast("double") /
      (col("n").cast("double") * col("n_prev").cast("double")
        * (col("c") + col("d")).cast("double")) * lit(1000000.0) + lit(0.5))
      .cast("long")
    grid.groupBy(col("period"))
      .agg(max(col("n")).as("n"), max(col("n_prev")).as("n_prev"),
        (count(lit(1)) - lit(1)).cast("long").as("dof"),
        sum(term).as("chi2_micro"))
      .select(col("period"), col("n"), col("n_prev"), col("dof"),
        col("chi2_micro"),
        rnd(col("chi2_micro").cast("double") / lit(1000000.0)).as("chi2"))
  }

  /** Period-over-period revenue bridge — the FP&A decomposition of a
    * revenue delta into a RATE effect (average ticket moved) and a
    * VOLUME effect (count moved): with m = s/n the period mean,
    * price_effect = (m_t − m_p)·n_t and volume_effect = (n_t − n_p)·m_p.
    * The two effects sum to Δrevenue EXACTLY in the reals (the identity
    * telescopes), which is the property that makes the bridge a bridge —
    * the dashboard answer to "did we sell more, or sell higher?".
    *
    * Determinism: per-period (n, s) are exact longs; the previous period
    * attaches by shifting the reduced table `stepDays` forward and
    * joining on the grid (the [[distributionDrift]] pattern — no window
    * at all, so nothing to partition); every effect is one fixed IEEE
    * expression over the four exact longs, 4-dp in display units
    * (cents/100). Boundary periods without a predecessor drop.
    *
    * @return (period, n, n_prev, d_rev, price_effect, volume_effect)
    */
  def revenueBridge(df: DataFrame, period: Column, valueCents: Column,
                    stepDays: Int = 7): DataFrame = {
    require(stepDays > 0, s"stepDays=$stepDays must be positive")
    import CoreOps.rnd
    val cur = df.where(period.isNotNull && valueCents.isNotNull)
      .groupBy(period.as("period"))
      .agg(count(lit(1)).as("n"), sum(valueCents.cast("long")).as("s"))
    val prev = cur.select(date_add(col("period"), stepDays).as("period"),
      col("n").as("n_prev"), col("s").as("s_prev"))
    val mT = col("s").cast("double") / col("n").cast("double")
    val mP = col("s_prev").cast("double") / col("n_prev").cast("double")
    cur.join(prev, Seq("period"))
      .select(col("period"), col("n"), col("n_prev"),
        rnd((col("s") - col("s_prev")).cast("double") / 100.0).as("d_rev"),
        rnd((mT - mP) * col("n").cast("double") / 100.0).as("price_effect"),
        rnd((col("n") - col("n_prev")).cast("double") * mP / 100.0)
          .as("volume_effect"))
  }

  /** PSI — Population Stability Index, the model-monitoring industry's
    * default numeric-drift score (banking scorecard heritage; the usual
    * alert bands read <0.1 stable, 0.1–0.25 shifting, >0.25 shifted):
    * bin today's distribution by the BASELINE period's deciles and score
    * Σ (p_cur − p_base)·ln(p_cur/p_base) per period. Complements the
    * drift family: KS is threshold-free, χ²/JSD are categorical — PSI is
    * the numeric score with fixed baseline-derived bins that ops teams
    * already have runbooks for.
    *
    * Determinism: bin edges are EXACT baseline deciles
    * ([[graft.ops.ScaleOps.exactQuantilesByHistogram]], rank ⌈q·n⌉);
    * binning is `1 + Σ(v > edge)` integer comparisons against the
    * broadcast edges; counts take add-one smoothing (every bin of both
    * sides, so empty bins are well-defined without any float epsilon);
    * each bin's term is one fixed IEEE expression over exact longs,
    * micro-quantized BEFORE the per-period sum (associative long sum —
    * the [[mixtureDrift]] ln recipe).
    *
    * Scale shape: one fact-scale pass builds the baseline histogram
    * (value-domain-bounded), one fact-scale hash aggregate bins the
    * scored periods; the periods×bins grid (densified so empty bins
    * score) and everything after is bounded.
    *
    * @param baselinePred rows the bins derive from (e.g. the training
    *                     window); scored periods are all rows where it
    *                     is false
    * @return (period, n, psi_micro, psi 4-dp) per scored period
    */
  def psiDrift(df: DataFrame, period: Column, valueCents: Column,
               baselinePred: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 100, s"bins=$bins outside [2, 100]")
    import CoreOps.rnd
    val rows = df.where(period.isNotNull && valueCents.isNotNull)
      .select(period.as("period"), valueCents.cast("long").as("__v"),
        baselinePred.as("__base"))
    val qs = (1 until bins).map(_.toDouble / bins)
    val edges = ScaleOps.exactQuantilesByHistogram(
      rows.where(col("__base")), col("__v"), qs)
    val edgeCols = qs.map(q => col(s"p${math.round(q * 100)}"))
    val binned = rows.crossJoin(broadcast(edges))
      .select(col("period"), col("__base"),
        edgeCols.map(e => (col("__v") > e).cast("long"))
          .reduce(_ + _).as("__bin"))
    val baseCounts = binned.where(col("__base"))
      .groupBy("__bin").agg(count(lit(1)).as("cb"))
    val baseTot = baseCounts.agg(sum(col("cb")).as("nb"))
    val curCounts = binned.where(!col("__base"))
      .groupBy("period", "__bin").agg(count(lit(1)).as("cc"))
    val periods = curCounts.select("period").distinct()
    val binIds = df.sparkSession.range(0, bins).select(col("id").as("__bin"))
    val grid = periods.crossJoin(broadcast(binIds))
      .join(curCounts, Seq("period", "__bin"), "left")
      .na.fill(0L, Seq("cc"))
      .join(broadcast(baseCounts), Seq("__bin"), "left")
      .na.fill(0L, Seq("cb"))
      .crossJoin(broadcast(baseTot))
      // empty baseline → null edges → silently null PSI; fail loudly
      // instead (an all-null monitoring column is how drift goes unseen)
      .withColumn("nb", when(col("nb").isNull, raise_error(lit(
        "graft.ChangeOps.psiDrift: baselinePred matched no rows — PSI" +
          " needs a non-empty baseline to derive its bins"))
        .cast("long")).otherwise(col("nb")))
    val wP = org.apache.spark.sql.expressions.Window.partitionBy("period")
    val withN = grid.withColumn("__nw", sum(col("cc")).over(wP))
    // smoothed shares: (c+1)/(n+bins) on both sides; the ln argument is
    // one exact-integer ratio, the term one fixed IEEE expression.
    val pc = (col("cc") + 1L).cast("double") /
      (col("__nw") + bins.toLong).cast("double")
    val pb = (col("cb") + 1L).cast("double") /
      (col("nb") + bins.toLong).cast("double")
    val lnRatio = log(((col("cc") + 1L) * (col("nb") + bins.toLong))
      .cast("double") /
      ((col("cb") + 1L) * (col("__nw") + bins.toLong)).cast("double"))
    val termMicro = floor((pc - pb) * lnRatio * lit(1000000.0) + lit(0.5))
      .cast("long")
    withN.withColumn("__t", termMicro)
      .groupBy("period")
      .agg(max(col("__nw")).as("n"), sum(col("__t")).as("psi_micro"))
      .select(col("period"), col("n"), col("psi_micro"),
        rnd(col("psi_micro").cast("double") / lit(1000000.0)).as("psi"))
  }
}
