package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.sources.Sinks

/** Runnable demo of the housing ETL surface: writes a small Price-Paid-shaped
  * CSV + postcode lookup, runs the full pipeline, prints every output table,
  * and exports CSV artifacts. Usage: runMain graft.HousingDemo [outDir]
  */
object HousingDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("housing-demo")
    val raw = dir.resolve("pp.csv")
    Files.writeString(raw,
      """transaction_unique_identifier,price,date_of_transfer,postcode,property_type
        |T1,250000,2024-01-02 00:00,SW1A 1AA,D
        |T2,noprice,2024-01-03 00:00,sw1a1aa ,S
        |T3,185000,not-a-date,EC1A 1BB,T
        |T4,420000,2023-12-31 00:00,,F
        |T5,300000,2024-01-09 00:00,SW1A 1AA,D
        |T6,150000,2024-01-16 00:00,EC1A 1BB,T
        |""".stripMargin)
    val lookup = dir.resolve("lookup.csv")
    Files.writeString(lookup,
      "postcode,local_authority\nsw1a 1aa,Westminster\nEC1A1BB,Islington\n")

    val out = HousingEtl.run(spark, raw.toString, Some(lookup.toString),
      windows = Seq(2, 4))

    println("== weekly =="); out.weekly.show(false)
    println("== type breakdown =="); out.typeBreakdown.foreach(_.show(false))
    println("== coverage =="); out.coveragePct.show(false)
    println("== windows =="); out.windows.orderBy("window_weeks", "dim", "week").show(50, false)
    println("== anomalies =="); out.anomalies
      .select("week", "dim", "window_weeks", "z_transactions", "anomaly_transactions")
      .orderBy("window_weeks", "dim", "week").show(50, false)
    println("== latest snapshot =="); out.snapshot.show(false)
    println("== qa =="); out.qa.show(false)

    val artDir = args.headOption.getOrElse(dir.resolve("artifacts").toString)
    HousingEtl.writeArtifacts(out, new Sinks.CsvDirSink(artDir))
    println(s"artifacts written to $artDir")
    spark.stop()
  }
}
