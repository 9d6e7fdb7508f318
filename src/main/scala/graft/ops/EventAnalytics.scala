package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-funnel and cohort-retention analytics (extension tier): the two
  * classic product-analytics rollups a clickstream warehouse runs daily,
  * expressed as single-exchange window plans.
  *
  * Scale design: every per-user computation is a `Window.partitionBy(user)`
  * unbounded-frame aggregate — all stages share ONE hash exchange on the
  * user key (Catalyst reuses the exchange/sort across same-partitioning
  * window nodes), then the rollup is an ordinary two-phase hash-aggregate on
  * the (tiny) stage/cohort keys. No joins, no self-scans, no collect; at
  * 100 TB the only fact-scale movement is that single user-key shuffle,
  * skew-mitigated by AQE.
  */
object EventAnalytics {

  /** Ordered-funnel timestamps: for each stage i, the earliest event of
    * stage i's type occurring at-or-after the user's stage i-1 timestamp
    * (strictly the textbook "did A, then B, then C" sequence — an early B
    * before any A does not count). Adds one `ts_<i>` column per stage.
    */
  def funnelStages(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(col(userCol))
    stages.zipWithIndex.foldLeft(events) { case (df, (stage, i)) =>
      val gate =
        if (i == 0) col(typeCol) === stage
        else col(typeCol) === stage && col(tsCol) >= col(s"ts_${i - 1}")
      df.withColumn(s"ts_$i", min(when(gate, col(tsCol))).over(w))
    }
  }

  /** One-row funnel summary: users reaching each stage plus step conversion
    * rates (stage i users / stage i-1 users, 4-dp).
    */
  def funnelSummary(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, stages: Seq[String]): DataFrame = {
    import CoreOps.rnd
    val staged = funnelStages(events, userCol, tsCol, typeCol, stages)
    // ts_i is constant within a user's partition; max() just collapses the
    // per-event rows back to one row per user (null-skipping, so a user who
    // never reached stage i stays null).
    val perUserAggs = stages.indices.map(i => max(col(s"ts_$i")).as(s"ts_$i"))
    val perUser = staged.groupBy(col(userCol))
      .agg(perUserAggs.head, perUserAggs.tail: _*)
    val countAggs = stages.indices.map(i =>
      count(when(col(s"ts_$i").isNotNull, 1)).as(s"n_stage_$i"))
    val counts = perUser.agg(countAggs.head, countAggs.tail: _*)
    stages.indices.tail.foldLeft(counts) { (df, i) =>
      // ANSI default: double division by zero THROWS — an empty funnel
      // stage must read as an undefined (null) conversion, not kill the job
      df.withColumn(s"conv_$i",
        when(col(s"n_stage_${i - 1}") === 0, lit(null).cast("double"))
          .otherwise(rnd(col(s"n_stage_$i").cast("double")
            / col(s"n_stage_${i - 1}"))))
    }
  }

  /** Cohort-retention matrix: users are assigned to the Monday-start week of
    * their first event (their cohort); each later active week counts them at
    * `week_offset` = whole weeks since the cohort week. Returns
    * (cohort_week, week_offset, n_users) — offset 0 is cohort size.
    */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val week = CoreOps.weekStart(col(tsCol))
    events
      .select(col(userCol).as("user"), week.as("week"))
      .withColumn("cohort_week",
        min(col("week")).over(Window.partitionBy(col("user"))))
      .select("user", "cohort_week", "week").distinct()
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7)
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * (from_type, to_type, n, prob) where prob is n over all transitions
    * leaving from_type. `tieCol` totalizes the per-user ordering (same-ts
    * events), or the lead pairing — hence the matrix — is nondeterministic.
    * A user's last event has no successor and contributes no pair.
    *
    * Shape: one window exchange on user (sequence building), then a hash
    * aggregate on the (from, to) pairs — group count is event-type² bounded
    * regardless of input rows. prob derives from exact long counts via a
    * window over the bounded pair table, not a second scan.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    val pairs = events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    pairs.withColumn("prob", CoreOps.rnd(
      col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("from_type"))).cast("double")))
  }

  /** Gaps-and-islands: maximal runs of CONSECUTIVE Monday-start active
    * weeks per key. The classic trick — rank each key's distinct active
    * weeks, subtract `7·rank` days from each; consecutive weeks collapse to
    * one constant anchor date, so a plain group-by recovers the islands.
    * Returns (key, streak_start, streak_end, weeks) — `weeks` is the run
    * length; singleton weeks are 1-row streaks.
    *
    * Shape: three stages all keyed on the entity — the distinct-week
    * aggregate shuffles (key, week) once, the rank window repartitions on
    * key alone, and the island group-by hashes (key, anchor) over rows
    * already local to their key's partition. Group cardinality is bounded
    * by active (key, week) pairs — weeks-per-key, not events-per-key, so a
    * hot key contributes its calendar span, not its event volume.
    */
  def weeklyStreaks(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val weeks = df
      .select(col(keyCol).as("key"),
        CoreOps.weekStart(col(tsCol)).cast("date").as("week"))
      .where(col("week").isNotNull)
      .distinct()
    val rn = row_number().over(
      Window.partitionBy(col("key")).orderBy(col("week").asc))
    weeks
      .withColumn("anchor", date_sub(col("week"), rn * 7))
      .groupBy(col("key"), col("anchor"))
      .agg(min(col("week")).as("streak_start"),
        max(col("week")).as("streak_end"),
        count(lit(1)).as("weeks"))
      .drop("anchor")
  }

  /** Weekly lifecycle accounting: per Monday-start week, how many keys were
    * `new` (first active week ever), `retained` (also active the previous
    * week), `resurrected` (active before, but not the previous week), and
    * `churned` (active the previous week, absent this one). A churn is
    * charged to the week the key went missing — one week after its last
    * activity — and only within the observed horizon (keys active in the
    * final week get no churn verdict; the data ends before they could
    * return).
    *
    * Shape: one (key, week) distinct, one key-partitioned window carrying
    * both lag and lead on the same sort, then two bounded per-week
    * aggregates full-outer-merged on the week key — the merge table is
    * calendar-sized, not data-sized.
    */
  def weeklyChurn(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val weeks = df
      .select(col(keyCol).as("key"),
        CoreOps.weekStart(col(tsCol)).cast("date").as("week"))
      .where(col("week").isNotNull)
      .distinct()
    val w = Window.partitionBy(col("key")).orderBy(col("week").asc)
    val classified = weeks.select(col("key"), col("week"),
      lag(col("week"), 1).over(w).as("prev_week"),
      lead(col("week"), 1).over(w).as("next_week"))

    val active = classified.groupBy(col("week")).agg(
      sum(when(col("prev_week").isNull, 1L).otherwise(0L)).as("n_new"),
      sum(when(col("prev_week") === date_sub(col("week"), 7), 1L)
        .otherwise(0L)).as("n_retained"),
      sum(when(col("prev_week").isNotNull &&
        col("prev_week") < date_sub(col("week"), 7), 1L)
        .otherwise(0L)).as("n_resurrected"))

    val horizon = weeks.agg(max(col("week")).as("max_week"))
    val churned = classified
      .where(col("next_week").isNull ||
        col("next_week") > date_add(col("week"), 7))
      .select(date_add(col("week"), 7).as("week"))
      .crossJoin(broadcast(horizon))
      .where(col("week") <= col("max_week"))
      .groupBy(col("week")).agg(count(lit(1)).as("n_churned"))

    active.join(churned, Seq("week"), "full_outer")
      .select(col("week"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
  }

  /** Top user journeys — the most common opening event paths (first
    * `depth` events per user, in time order): the "how do users actually
    * start" read next to [[funnelSummary]]'s "do they follow OUR
    * script". Users with fewer than `depth` events contribute their
    * shorter prefix (the path skips the missing tail).
    *
    * Determinism: the per-user ordering tie-breaks on `tieCol`, so the
    * event sequence is unique; the top-k ranks by (count desc, path).
    *
    * Scale shape: ONE fact-scale window keyed on the user (rank ≤ depth
    * prunes immediately), a user-keyed pivot aggregate sharing that
    * exchange, then a hash count into the bounded path table (≤ |event
    * types|^depth rows) where the ranking window runs.
    *
    * @return (rnk, path, n_users) for the top `k` paths
    */
  def topPaths(events: DataFrame, userCol: Column, tsCol: Column,
               typeCol: Column, tieCol: Column, depth: Int = 3,
               k: Int = 20): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth=$depth outside [1, 8]")
    require(k >= 1, s"k=$k must be positive")
    val w = Window.partitionBy(userCol).orderBy(tsCol, tieCol)
    val ranked = events
      .where(userCol.isNotNull && tsCol.isNotNull && typeCol.isNotNull)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= depth)
    val steps = (1 to depth).map(i =>
      max(when(col("__rn") === i, typeCol)).as(s"__s$i"))
    val paths = ranked.groupBy(userCol.as("__u")).agg(steps.head, steps.tail: _*)
      .select(concat_ws(">", (1 to depth).map(i => col(s"__s$i")): _*)
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
    paths.withColumn("rnk", row_number().over(
        Window.orderBy(col("n_users").desc, col("path"))).cast("long"))
      .where(col("rnk") <= k)
      .select(col("rnk"), col("path"), col("n_users"))
  }

  /** RFM segmentation — the classic customer-value grid (recency /
    * frequency / monetary, each scored 1–5 by population quintile;
    * Hughes 1994): per entity, days since last transaction, transaction
    * count, and total spend, each bucketed against the EXACT population
    * quintile thresholds, then rolled up per (r, f, m) cell. The
    * marketing/churn-targeting read every transactional warehouse ships.
    *
    * Determinism: thresholds come from
    * [[ScaleOps.exactQuantilesByHistogram]] (rank ⌈q·n⌉ off the value
    * histogram's prefix sum — no sketch, no sort); scores are pure
    * comparisons `1 + Σ (v > p_q)` against those exact thresholds, so
    * ties at a threshold land in the same bucket on every engine.
    * Recency inverts (`6 − score`): most-recent must read 5.
    *
    * Scale shape: ONE fact-scale hash aggregate to the per-entity table;
    * each metric's quantile runs the histogram + distributed-prefix-sum
    * path (value-domain-bounded, no single-partition sort); the three
    * 1-row threshold frames broadcast back and scoring is map-only; the
    * final rollup has ≤125 groups. Monetary must already be integer
    * (cents); recency is whole days against the corpus max date.
    *
    * @return (r_score, f_score, m_score, n_customers, total_monetary)
    *         — monetary re-scaled to whole units (cents/100), 4-dp
    */
  def rfmSegments(df: DataFrame, keyCol: Column, dateCol: Column,
                  amountCents: Column): DataFrame = {
    val cust = df
      .where(keyCol.isNotNull && dateCol.isNotNull && amountCents.isNotNull)
      .groupBy(keyCol.as("cust"))
      .agg(max(dateCol.cast("date")).as("__last"),
        count(lit(1)).as("frequency"),
        sum(amountCents).as("monetary"))
    val anchor = cust.agg(max(col("__last")).as("__anchor"))
    val rfm = cust.crossJoin(broadcast(anchor))
      .select(col("cust"),
        datediff(col("__anchor"), col("__last")).cast("long").as("recency_d"),
        col("frequency"), col("monetary"))
      .localCheckpoint(true) // consumed 4× (3 histograms + scoring)
    val qs = Seq(0.2, 0.4, 0.6, 0.8)
    def thresholds(metric: String, pfx: String): DataFrame =
      ScaleOps.exactQuantilesByHistogram(rfm, col(metric), qs)
        .select(qs.map(q => col(s"p${math.round(q * 100)}")
          .as(s"${pfx}_p${math.round(q * 100)}")): _*)
    def score(v: Column, pfx: String): Column =
      lit(1L) +
        (v > col(s"${pfx}_p20")).cast("long") +
        (v > col(s"${pfx}_p40")).cast("long") +
        (v > col(s"${pfx}_p60")).cast("long") +
        (v > col(s"${pfx}_p80")).cast("long")
    rfm
      .crossJoin(broadcast(thresholds("recency_d", "r")))
      .crossJoin(broadcast(thresholds("frequency", "f")))
      .crossJoin(broadcast(thresholds("monetary", "m")))
      .select(col("cust"), col("monetary"),
        (lit(6L) - score(col("recency_d"), "r")).as("r_score"),
        score(col("frequency"), "f").as("f_score"),
        score(col("monetary"), "m").as("m_score"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(count(lit(1)).as("n_customers"),
        CoreOps.rnd(sum(col("monetary")).cast("double") / 100.0)
          .as("total_monetary"))
  }

  /** Multi-touch conversion attribution — first-touch / last-touch /
    * linear / position-based (U-shaped 40/20/40) credit per channel
    * (Shao & Li, KDD 2011 frame the position
    * heuristics this generalizes): for every user whose path reaches a
    * first `convType` event, the touches STRICTLY BEFORE that instant
    * split one conversion's worth of credit under each model. The
    * channel-budget question every marketing/growth warehouse answers
    * from its clickstream; extension tier — the reference has no event
    * concept at all.
    *
    * Determinism: credit is integer micro-units summing to EXACTLY 10⁶
    * per converting user under every model — linear gives each of n
    * touches 10⁶ div n and assigns the division remainder to the LAST
    * touch (deterministic, position-justified: the closer of the tied
    * claims), so no float split and no lost remainder can drift the
    * totals; position-based follows the same remainder discipline on its
    * middle share. Touch order is (ts, tie) — the tie column makes
    * same-instant touches a total order.
    *
    * Scale shape: the header-comment contract — the conversion instant,
    * touch rank, and path length are all windows over ONE user-key
    * exchange (no self-join against a conversions table); the rollup is a
    * two-phase hash aggregate on the tiny channel key, then a bounded
    * 3-way melt. Users who convert with zero prior touches assign no
    * credit (there is nothing to attribute it to) — count them from
    * [[funnelSummary]] if needed.
    *
    * @return one row per (model, channel): (model, channel, touches,
    *         credit_micro, conversions 4-dp = credit_micro/10⁶)
    */
  def attribution(events: DataFrame, userCol: Column, tsCol: Column,
                  typeCol: Column, tieCol: Column,
                  convType: String): DataFrame = {
    val base = events
      .where(userCol.isNotNull && tsCol.isNotNull && typeCol.isNotNull)
      .select(userCol.as("__u"), tsCol.as("__ts"), typeCol.as("__ch"),
        tieCol.as("__tie"))
    val wAll = Window.partitionBy(col("__u"))
    val touches = base
      .withColumn("__p",
        min(when(col("__ch") === convType, col("__ts"))).over(wAll))
      .where(col("__p").isNotNull && col("__ch") =!= convType &&
        col("__ts") < col("__p"))
    val wOrd = Window.partitionBy(col("__u"))
      .orderBy(col("__ts"), col("__tie"))
    val ranked = touches
      .withColumn("__rn", row_number().over(wOrd).cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
    val share = CoreOps.integralDiv(lit(1000000L), col("__n"))
    val isLast = col("__rn") === col("__n")
    // Position-based (U-shaped 40/20/40): endpoints take 40% each, the
    // middles split 20% — n=1 takes all, n=2 splits 50/50; the middle
    // share's division remainder goes to the LAST middle (rn = n−1),
    // same closer-claim-wins justification as linear's remainder.
    val midShare = CoreOps.integralDiv(lit(200000L), col("__n") - 2L)
    val posCredit = when(col("__n") === 1L, lit(1000000L))
      .when(col("__n") === 2L, lit(500000L))
      .when(col("__rn") === 1L || isLast, lit(400000L))
      .otherwise(midShare + when(col("__rn") === col("__n") - 1L,
        lit(200000L) - midShare * (col("__n") - 2L)).otherwise(lit(0L)))
    val perChannel = ranked.select(col("__ch").as("channel"),
        when(col("__rn") === 1L, lit(1000000L)).otherwise(lit(0L))
          .as("__ft"),
        when(isLast, lit(1000000L)).otherwise(lit(0L)).as("__lt"),
        (share + when(isLast, lit(1000000L) - share * col("__n"))
          .otherwise(lit(0L))).as("__lin"),
        posCredit.as("__pos"))
      .groupBy("channel")
      .agg(count(lit(1)).as("touches"), sum(col("__ft")).as("__ft"),
        sum(col("__lt")).as("__lt"), sum(col("__lin")).as("__lin"),
        sum(col("__pos")).as("__pos"))
    perChannel.select(col("channel"), col("touches"),
        expr("stack(4, 'first_touch', __ft, 'last_touch', __lt," +
          " 'linear', __lin, 'position', __pos) AS (model, credit_micro)"))
      .select(col("model"), col("channel"), col("touches"),
        col("credit_micro"),
        CoreOps.rnd(col("credit_micro").cast("double") / 1000000.0)
          .as("conversions"))
  }

  /** Cohort lifetime-value curve: users join the Monday-start week of
    * their FIRST event (their cohort, same assignment as
    * [[cohortRetention]]); at each whole-week age since then, the
    * cohort's cumulative qualifying revenue divided by its size is the
    * LTV-per-user the payback-period read needs (the
    * "CAC < LTV by week k?" question). Ages with activity but no revenue
    * still appear (cum carries forward); ages with no events at all are
    * absent — densify against a grid if a chart needs them.
    *
    * Determinism: revenue accumulates as exact long cents; per-user LTV
    * is the truncating division (cum_cents·10⁶) div cohort_size — in
    * MICRO-cents so small cohorts don't truncate to zero precision.
    *
    * Scale shape: one user-keyed window (cohort assignment), one hash
    * aggregate to (cohort, age) — bounded by weeks², not rows — and the
    * cumulative window partitioned BY COHORT over ages (bounded, never
    * a single global partition). Cohort size joins back from offset 0 of
    * the same aggregate rather than a second fact scan.
    *
    * @param revenue per-row revenue in CENTS (long; null → 0), already
    *                gated to qualifying rows by the caller (e.g.
    *                `when(type === "purchase", moneyCents(value))`)
    * @return (cohort_week, age_weeks, n_users — cohort size, active —
    *         distinct users this age, rev_cents, cum_rev_cents,
    *         ltv_microcents = cum·10⁶ div n_users)
    */
  def cohortLtv(events: DataFrame, userCol: Column, tsCol: Column,
                revenue: Column): DataFrame = {
    val week = CoreOps.weekStart(tsCol)
    val base = events.where(userCol.isNotNull && tsCol.isNotNull)
      .select(userCol.as("__u"), week.as("__w"),
        coalesce(revenue.cast("long"), lit(0L)).as("__r"))
      .withColumn("__cw",
        min(col("__w")).over(Window.partitionBy(col("__u"))))
    val byAge = base
      .groupBy(col("__cw").as("cohort_week"),
        (datediff(col("__w"), col("__cw")) / 7).cast("long").as("age_weeks"))
      .agg(count_distinct(col("__u")).as("active"),
        sum(col("__r")).as("rev_cents"))
    val size = byAge.where(col("age_weeks") === 0L)
      .select(col("cohort_week"), col("active").as("n_users"))
    val wCum = Window.partitionBy(col("cohort_week")).orderBy(col("age_weeks"))
    byAge.join(size, Seq("cohort_week"))
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(wCum))
      .select(col("cohort_week"), col("age_weeks"), col("n_users"),
        col("active"), col("rev_cents"), col("cum_rev_cents"),
        CoreOps.integralDiv(col("cum_rev_cents") * lit(1000000L),
          col("n_users")).as("ltv_microcents"))
  }
}
