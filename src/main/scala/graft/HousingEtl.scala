package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._
import graft.sources.{CsvSniffSource, Sinks}

/** The reference's complete lifecycle (etl/etl_main.py main(), SURVEY.md
  * §3.1) over housing-shaped CSV input: sniff → canonicalize → enrich with
  * local authority → weekly stats → densify → rolling windows → anomaly
  * flags → latest snapshot → QA — every stage a lazy plan, executed only at
  * the sinks.
  *
  * This is the user-facing parity API (the graded queries in SparkEntry
  * exercise the same operators against the driver testdata); the fixture
  * corpus in HousingEtlSpec mirrors FIXTURES.md §2.
  */
object HousingEtl {

  final case class Outputs(weekly: DataFrame, typeBreakdown: Option[DataFrame],
      coveragePct: DataFrame, windows: DataFrame, anomalies: DataFrame,
      snapshot: DataFrame, qa: DataFrame)

  private lazy val logger = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Stage-boundary diagnostics channel, mirroring the reference's
    * info-level logger (etl_main.py:56-57 setup; parse diagnostics at
    * 129/132/135, branch decisions throughout). Injectable so tests can
    * assert the lines; defaults to slf4j.
    */
  def defaultLog: String => Unit = logger.info(_)

  def run(spark: SparkSession, rawCsvPath: String,
          lookupPath: Option[String] = None,
          windows: Seq[Int] = Rolling.DefaultWindows,
          zThresh: Double = 3.0,
          log: String => Unit = defaultLog): Outputs = {
    val (raw, rc) = CsvSniffSource.sniffCsv(spark, rawCsvPath)
    // The reference logs each stage's decisions eagerly because pandas is
    // eager; a lazy engine logs its PLAN-TIME decisions here (separator,
    // resolved columns, branch taken) and leaves measured metrics to the
    // sinks (runCli logs the QA report once artifacts are written).
    log(s"parse: sep=${if (rc.sep == "\t") "\\t" else rc.sep} " +
      s"date=${rc.date} price=${rc.price} " +
      s"id=${rc.id.getOrElse("<synthetic>")} " +
      s"postcode=${rc.postcode.getOrElse("<absent>")} " +
      s"prop_type=${rc.propType.getOrElse("<absent>")}")
    // The reference ASSIGNS df["local_authority"] (etl_main.py:181-190),
    // replacing any same-named source column; without the drop, a raw CSV
    // that already carries local_authority would make every downstream
    // reference ambiguous after the lookup join adds a second copy.
    val canon = CsvSniffSource.toCanonical(raw, rc).drop("local_authority")

    // J1 / P9 — lookup enrichment with prefix fallback
    // (etl_main.py:178-191): invalid or absent lookup → postcode[:4].
    val withLa = lookupPath.map(CsvSniffSource.readLookup(spark, _)) match {
      case Some(Right(lookup)) =>
        log(s"lookup: joined ${lookupPath.get}")
        Joins.lookupJoin(canon, lookup, canon("postcode") === lookup("pc_nospace"))
          .drop("pc_nospace")
      case other =>
        // the Left carries WHICH failure happened (missing file vs wrong
        // columns) — the reference logs them distinctly (etl_main.py:177-182)
        log(other match {
          case Some(Left(reason)) => s"$reason - postcode-prefix fallback"
          case _ => "lookup: none - postcode-prefix fallback"
        })
        canon.withColumn("local_authority", CoreOps.prefixKey(col("postcode")))
    }

    // pandas groupby parity (etl_main.py:213/223, dropna defaults true):
    // rows whose local_authority resolved to NaN are excluded from BOTH
    // grouped outputs — and from the densify grid axes, whose week range
    // the reference derives from the (already filtered) weekly frame. They
    // still count in coverage and QA, which the reference computes on the
    // full frame before grouping.
    val grouped = withLa.where(col("local_authority").isNotNull)

    val coverage = withLa.agg(
      Joins.coveragePct(col("local_authority")).as("coverage_pct"))

    val weekly = WeeklyAgg.weeklyStatsCore(grouped, col("date"),
      col("local_authority"), col("transaction_id"), col("price"))

    val typeBreak =
      if (withLa.columns.contains("prop_type"))
        // astype(str) parity (etl_main.py:223): pandas stringifies the
        // type column BEFORE grouping, so a missing prop_type becomes the
        // literal "nan" group — it is local_authority NaN that drops the
        // row, never prop_type.
        Some(WeeklyAgg.typeBreakdown(
          grouped.withColumn("prop_type",
            coalesce(col("prop_type"), lit("nan"))),
          col("date"), col("local_authority"), col("prop_type")))
      else None  // etl_main.py:221-225: breakdown only when a type col exists
    log(s"type breakdown: ${if (typeBreak.isDefined) "enabled"
      else "skipped (no property-type column)"}")
    log(s"windows: ${windows.mkString(", ")} weeks; z-threshold $zThresh")

    // Cheap (week, dim) projection for the densify grid axes and the
    // snapshot's max week — avoids re-evaluating the CSV-scan → weekly-agg
    // lineage inside 1-row bound subtrees (same escape hatch Pipeline uses).
    val weekDim = grouped.select(
      CoreOps.weekStart(col("date")).as("week"),
      col("local_authority").as("dim"))
    val dense = Densify.densify(
      weekly.select("week", "dim", "transactions", "price_mean"),
      fillZero = Seq("transactions"),
      gridFrom = Some(weekDim))
    val rolled = Rolling.rollingWindows(dense, windows)
    val anomalies = Anomaly.detectAnomalies(rolled, zThresh)
    val snapshot = Snapshot.latestWeek(rolled, latestFrom = Some(weekDim))
    // QA parity (etl_main.py:344-350): rows_raw counts the RAW parse —
    // before the invalid-date drop — while the other metrics describe the
    // cleaned frame; a 1-row cross join keeps both lazy.
    val qa = raw.agg(count(lit(1)).as("rows_raw")).crossJoin(
      withLa.withColumn("week", CoreOps.weekStart(col("date"))).agg(
        count_distinct(col("local_authority")).as("dims"),
        Joins.coveragePct(col("local_authority")).as("coverage_pct"),
        max(col("week")).as("latest_week")))

    Outputs(weekly.orderBy("dim", "week"), typeBreak, coverage, rolled,
      anomalies, snapshot, qa)
  }

  /** Artifact export (S6; etl_main.py:387-401). */
  def writeArtifacts(out: Outputs, sink: Sinks.ReportSink): Unit = {
    sink.write("weekly", out.weekly)
    out.typeBreakdown.foreach(sink.write("type_breakdown", _))
    sink.write("windows", out.windows)
    sink.write("anomalies", out.anomalies)
    sink.write("latest_snapshot", out.snapshot)
    sink.write("qa", out.qa)
  }
}
