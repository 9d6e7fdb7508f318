package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations (extension tier). The reference
  * hard-codes two ad-hoc sanity checks (etl/etl_main.py:151-156 row-count
  * and required-column asserts); a governed corpus needs the general form:
  * a rule set evaluated into one violations report per run, cheap enough
  * to ride in front of every ingest.
  *
  * All three report builders emit the same (rule, violations, total)
  * schema so callers union them into one report table.
  */
object DqOps {

  /** Row-predicate rules, all evaluated in ONE scan: each rule is a
    * boolean Column that good rows satisfy; the report counts violators.
    * One hash aggregate with map-side partials — k+1 long partials total
    * (not per group), then a k-row unpivot of the single result row.
    * NULL predicate results (e.g. comparisons on null columns) count as
    * violations — an expectation a row cannot prove, it fails.
    */
  def expectations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectations needs at least one rule")
    // coalesce each sum: on an EMPTY batch the report must read 0
    // violations of 0 rows, not NULL — callers gate on violations == 0
    val aggs = count(lit(1)).as("__total") +:
      rules.zipWithIndex.map { case ((_, pred), i) =>
        coalesce(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)), lit(0L))
          .as(s"__v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = lit(rules.size) +: rules.zipWithIndex.flatMap {
      case ((name, _), i) => Seq(lit(name), col(s"__v$i"))
    }
    one.select(stack(stackArgs: _*).as(Seq("rule", "violations")),
      col("__total").as("total"))
  }

  /** Key-uniqueness rule: violations = rows sharing their key tuple with
    * at least one other row (so a key seen c times contributes c, not
    * c−1 — every copy of an ambiguous key is suspect). Null keys group
    * like values, matching SQL GROUP BY. Shape: keys-only hash aggregate,
    * then a scalar rollup.
    */
  def uniqueness(df: DataFrame, keys: Seq[String], rule: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
      .agg(
        coalesce(sum(when(col("__c") > 1L, col("__c")).otherwise(0L)), lit(0L))
          .as("violations"),
        coalesce(sum(col("__c")), lit(0L)).as("total"))
      .select(lit(rule).as("rule"),
        col("violations").cast("long").as("violations"),
        col("total").cast("long").as("total"))

  /** Referential-integrity rule: violations = child rows whose non-null
    * foreign key misses `parent` (null fk = no claim, not an orphan —
    * pair with a not-null expectation when the fk is mandatory).
    * Shape: distinct parent keys broadcast into a left-anti join when the
    * parent is dimension-sized; for fact-sized parents probe a bloom
    * filter instead ([[BloomOps]]) and accept the false-positive rate.
    */
  def orphans(child: DataFrame, parent: DataFrame, fk: String, pk: String,
              rule: String): DataFrame = {
    val total = child.agg(count(lit(1)).as("total"))
    val bad = child.where(col(fk).isNotNull)
      .join(broadcast(parent.select(col(pk)).distinct()),
        col(fk) === col(pk), "left_anti")
      .agg(count(lit(1)).as("violations"))
    bad.crossJoin(total)
      .select(lit(rule).as("rule"), col("violations"), col("total"))
  }

  /** Per-column profile in ONE scan: (column, non_null, nulls, distinct)
    * for each named column — the "describe this table before you train on
    * it" report. Exact distincts, not approximate: with k columns Spark
    * plans one Expand (k+1 projections) feeding a single hash aggregate,
    * so the cost is k passes' worth of rows through ONE shuffle, not k
    * jobs. Bound k (profile the columns you govern, not SELECT *) — for
    * hundreds of columns switch the distinct to approx_count_distinct and
    * keep the same report shape.
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__d_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = lit(cols.size) +: cols.flatMap { c =>
      Seq(lit(c), col(s"__nn_$c"), col(s"__d_$c"))
    }
    one.select(stack(stackArgs: _*).as(Seq("col_name", "non_null", "n_distinct")),
      (col("__total") - col("non_null")).as("nulls"))
      .select("col_name", "non_null", "nulls", "n_distinct")
  }

  /** k-anonymity audit over a quasi-identifier tuple: every equivalence
    * class with its size and whether it re-identifies below the `k`
    * threshold. Null quasi-identifier values form classes like any other
    * value (GROUP BY semantics) — an absent attribute still narrows a
    * linkage attack. One keys-only hash aggregate with map-side partials;
    * the class table is bounded by the quasi-identifier domain product,
    * not the row count.
    */
  def kAnonymity(df: DataFrame, quasi: Seq[String], k: Long): DataFrame = {
    require(quasi.nonEmpty, "kAnonymity needs at least one quasi-identifier")
    require(k >= 2, s"k=$k: below 2 every class trivially passes")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)
  }

  /** l-diversity audit — the leak [[kAnonymity]] cannot see: a large
    * equivalence class whose members all share one SENSITIVE value still
    * reveals the secret of everyone in it (homogeneity attack). Per
    * quasi-identifier class: size, distinct sensitive values (nulls count
    * as one value — "withheld" is itself an observable state), and the
    * `sensitive_distinct < l` risk flag.
    *
    * Same plan shape as the k-anonymity audit — one hash aggregate on the
    * quasi keys; the distinct count rides the same exchange as a
    * two-phase partial, so the audit costs one pass at any scale.
    */
  def lDiversity(df: DataFrame, quasi: Seq[String], sensitive: String,
                 l: Long): DataFrame = {
    require(quasi.nonEmpty, "lDiversity needs at least one quasi-identifier")
    require(!quasi.contains(sensitive),
      s"sensitive '$sensitive' cannot also be a quasi-identifier")
    require(l >= 2, s"l=$l: below 2 every class trivially passes")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        // nulls count as one extra observable value (count_distinct
        // skips them) -- collision-free, unlike a string sentinel that a
        // real value could equal
        (count_distinct(col(sensitive)) +
          max(when(col(sensitive).isNull, lit(1L)).otherwise(lit(0L))))
          .as("sensitive_distinct"))
      .withColumn("at_risk", col("sensitive_distinct") < l)
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * leak [[lDiversity]] cannot see: a class can hold l distinct sensitive
    * values yet still skew far from the population (all l of them in the
    * top income bands, say), and the skew itself is the disclosure. Per
    * quasi-identifier class: the Earth Mover's Distance between the
    * class's distribution over an ORDERED sensitive attribute and the
    * global distribution, flagged when it exceeds `t`.
    *
    * For ordered values v_1 < … < v_m the EMD with unit ground distance
    * is (1/(m−1)) Σᵢ |P_i − Q_i| over the CDF prefixes. Both CDFs are
    * ratios of exact counts, so each prefix gap rewrites to the exact
    * integer |cumC_i·n − cumG_i·n_c| over the common denominator n_c·n —
    * the whole statistic is one long sum (`emd_num`, hash-exact on any
    * engine) and a single final IEEE division. m = 1 (single-valued
    * domain) makes every class trivially 0-close.
    *
    * Null sensitive values carry no position on the ordered axis and are
    * excluded from both distributions (the homogeneity risk of "withheld"
    * as a value is [[lDiversity]]'s job); classes whose rows are ALL null
    * drop entirely.
    *
    * Scale shape: one fact-scale hash aggregate to (class, value) counts;
    * the dense class×value grid, both CDFs, and the per-class rollup all
    * live on bounded frames (quasi-domain × value-domain). The global CDF
    * window runs unpartitioned over the value domain only — the same
    * bounded-frame justification as the histogram quantile tier.
    *
    * Overflow precondition: cum·n ≤ n² < 2^63 (n below ~3·10⁹ non-null
    * rows) — the [[graft.ops.StatOps.ksTest]] bound, same remedy
    * (pre-bucket the sensitive domain; it only sharpens the audit).
    *
    * @param sensitive ordered NUMERIC column name (band/bucket it first
    *                  for continuous attributes)
    * @return one row per class: (quasi…, class_size, emd_num, emd 4-dp,
    *         at_risk)
    */
  def tCloseness(df: DataFrame, quasi: Seq[String], sensitive: String,
                 t: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quasi.nonEmpty, "tCloseness needs at least one quasi-identifier")
    require(!quasi.contains(sensitive),
      s"sensitive '$sensitive' cannot also be a quasi-identifier")
    require(t > 0 && t < 1, s"t=$t must lie in (0, 1)")
    val rows = df.where(col(sensitive).isNotNull)
      .select((quasi.map(col) :+ col(sensitive).cast("long").as("__v")): _*)
    val qc = quasi.map(col)
    val cv = rows.groupBy((qc :+ col("__v")): _*).agg(count(lit(1)).as("__c"))
    val gv = rows.groupBy(col("__v")).agg(count(lit(1)).as("__g"))
    val classes = cv.select(qc: _*).distinct()
    val grid = classes.crossJoin(gv.select(col("__v")))
      .join(cv, quasi :+ "__v", "left")
      .na.fill(0L, Seq("__c"))
      .join(gv, Seq("__v"))
    val wCum = Window.partitionBy(qc: _*).orderBy(col("__v"))
    val wCls = Window.partitionBy(qc: _*)
    val scored = grid
      .withColumn("__cumc", sum(col("__c")).over(wCum))
      .withColumn("__cumg", sum(col("__g")).over(wCum))
      .withColumn("__nc", sum(col("__c")).over(wCls))
      .withColumn("__m", count(lit(1)).over(wCls))
      .withColumn("__n", max(col("__cumg")).over(wCls))
      .where(col("__nc") > 0)
    scored.groupBy(qc: _*)
      .agg(max(col("__nc")).as("class_size"),
        sum(abs(col("__cumc") * col("__n") - col("__cumg") * col("__nc")))
          .as("emd_num"),
        max(col("__m")).as("__m"), max(col("__n")).as("__n"))
      .withColumn("emd",
        when(col("__m") === 1L, lit(0.0)).otherwise(
          CoreOps.rnd(col("emd_num").cast("double") /
            ((col("__m") - 1L).cast("double") * col("class_size").cast("double")
              * col("__n").cast("double")))))
      .withColumn("at_risk", col("emd") > t)
      .select((qc :+ col("class_size") :+ col("emd_num") :+ col("emd")
        :+ col("at_risk")): _*)
  }

  /** Header/detail reconciliation — the double-entry audit every
    * warehouse with an order/line (invoice/item, statement/transaction)
    * pair runs: per header, does the header's stated amount equal the
    * sum of its details' computed amounts, and how bad is the drift?
    * Catches partial loads, duplicated detail batches, rounding-policy
    * mismatches, and orphaned headers in one pass.
    *
    * All money is exact integer cents; the per-detail amount should be
    * ONE fixed IEEE expression quantized at source (caller passes it).
    * Headers with no details reconcile as `n_no_detail`, never as a
    * zero-diff match.
    *
    * Plan shape: one detail-side hash aggregate + one header⋈detail
    * equi-join, both keyed on the header key (they share the exchange);
    * the verdict is a single global rollup of narrow longs.
    *
    * @return one row: (n_headers, n_no_detail, n_matched, n_mismatched,
    *         max_abs_diff_cents, total_abs_diff_cents) — matched within
    *         `tolCents`
    */
  def headerDetailReconcile(header: DataFrame, detail: DataFrame,
                            headerKey: String, detailKey: String,
                            headerCents: Column, detailCents: Column,
                            tolCents: Long = 0L): DataFrame = {
    require(tolCents >= 0L, s"tolCents=$tolCents must be non-negative")
    val h = header.where(col(headerKey).isNotNull && headerCents.isNotNull)
      .select(col(headerKey).as("__k"), headerCents.cast("long").as("__h"))
    val d = detail.where(col(detailKey).isNotNull && detailCents.isNotNull)
      .groupBy(col(detailKey).as("__k"))
      .agg(sum(detailCents.cast("long")).as("__d"))
    val diff = abs(col("__h") - col("__d"))
    h.join(d, Seq("__k"), "left")
      .agg(count(lit(1)).as("n_headers"),
        sum(when(col("__d").isNull, 1L).otherwise(0L)).as("n_no_detail"),
        sum(when(col("__d").isNotNull && diff <= tolCents, 1L).otherwise(0L))
          .as("n_matched"),
        sum(when(col("__d").isNotNull && diff > tolCents, 1L).otherwise(0L))
          .as("n_mismatched"),
        coalesce(max(diff), lit(0L)).as("max_abs_diff_cents"),
        coalesce(sum(diff), lit(0L)).as("total_abs_diff_cents"))
  }
}
