package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import org.apache.spark.sql.DataFrame

import graft.ops.CoreOps

/** Sinks and the driver-side landing zone (SURVEY.md §2.A).
  *
  * The reference's remote sinks (Google Sheets S7, BigQuery S8) are API
  * pushes of small report tables; offline they are modeled as a sink trait
  * with a collect-based stringified implementation (S7's NaN→"" cast-all
  * semantics) and a generic DataFrameWriter passthrough (S8). Only
  * report-scale tables may flow through the collecting sink — fact-scale
  * data always goes through distributed writers.
  */
object Sinks {

  trait ReportSink {
    def write(tab: String, df: DataFrame): Unit
  }

  /** S6 — CSV artifact sink (etl_main.py:387-401): one header'd CSV per
    * table. `coalesce(1)` mirrors the reference's single-file artifacts and
    * is only for report-scale outputs.
    */
  final class CsvDirSink(baseDir: String) extends ReportSink {
    def write(tab: String, df: DataFrame): Unit =
      df.coalesce(1).write.option("header", "true").mode("overwrite")
        .csv(s"$baseDir/$tab")
  }

  /** S7 — Sheets-style sink (etl_main.py:286-300): header row + all values
    * stringified with null→"". The push function receives the rows; the
    * real Sheets API client is environment-specific and injected by the
    * caller.
    */
  final class StringifiedPushSink(push: (String, Seq[Seq[String]]) => Unit)
      extends ReportSink {
    def write(tab: String, df: DataFrame): Unit = {
      val s = CoreOps.stringifyForExport(df)
      val rows = s.columns.toSeq +:
        s.collect().toSeq.map(_.toSeq.map(_.asInstanceOf[String]))
      push(tab, rows)
    }
  }

  /** S8 — warehouse sink stub: format-parameterized DataFrameWriter
    * (`bigquery`, `jdbc`, ... — connector availability is deployment
    * config, not engine logic).
    */
  final class WriterSink(format: String, options: Map[String, String])
      extends ReportSink {
    /** Caller-configured options WIN over the tab-derived default: the
      * `--bq-table` destination must not be silently clobbered by the
      * logical tab name (writing the windows tab to a table literally
      * named "windows" instead of the configured one).
      */
    private[graft] def effectiveOptions(tab: String): Map[String, String] =
      Map("table" -> tab) ++ options

    def write(tab: String, df: DataFrame): Unit =
      df.write.format(format).options(effectiveOptions(tab))
        .mode("overwrite").save()
  }

  /** S3-at-scale — date-partitioned raw zone (SURVEY.md §2.A: the
    * timestamped-backup pattern becomes `partitionBy` on a derived
    * partition column at 100 TB, so reprocessing a window prunes to its
    * partitions instead of rescanning the zone).
    */
  def writeRawZone(df: DataFrame, tsCol: String, dir: String): Unit =
    df.withColumn("ingest_week",
      org.apache.spark.sql.functions.date_format(
        graft.ops.CoreOps.weekStart(org.apache.spark.sql.functions.col(tsCol)),
        "yyyy-MM-dd"))
      .write.mode("overwrite")
      // dynamic: overwrite ONLY the partitions present in this batch —
      // under the static default, every incremental ingest would truncate
      // the whole zone, destroying exactly the history the raw zone exists
      // to keep (reprocessing a window must touch that window alone).
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_week").parquet(dir)

  /** S1-S3 — landing zone: TTL cache + timestamped backup around an
    * injected fetcher (the reference's retried streaming HTTP GET at
    * etl_main.py:61-117; offline harnesses inject a file copy). Returns the
    * cached file path for `spark.read`.
    */
  final class LandingZone(dir: String, ttlHours: Long = 24) {
    private val cache = Paths.get(dir, "landing.csv")

    def fetch(fetcher: Path => Unit, force: Boolean = false): Path = {
      Files.createDirectories(Paths.get(dir))
      val fresh = Files.exists(cache) && !force &&
        Files.getLastModifiedTime(cache).toInstant
          .isAfter(Instant.now().minusSeconds(ttlHours * 3600))
      if (!fresh) {
        // Fetch into a temp file and move atomically: writing straight to
        // the cache path would leave a fresh-mtime corrupt cache if the
        // fetcher dies mid-write, poisoning every read for the next TTL.
        val tmp = Paths.get(dir, ".landing.tmp")
        fetcher(tmp)
        Files.move(tmp, cache, StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.ATOMIC_MOVE)
        val stamp = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss")
          .withZone(ZoneOffset.UTC).format(Instant.now())
        val backups = Paths.get(dir, "backups")
        Files.createDirectories(backups)
        Files.copy(cache, backups.resolve(s"landing-$stamp.csv"),
          StandardCopyOption.REPLACE_EXISTING)
      }
      cache
    }
  }
}
