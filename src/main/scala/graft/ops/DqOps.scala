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
}
