package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool for the optimization rounds: dump `.explain("formatted")` for a
  * set of declared queries to files, so plan claims in OPTIMIZATION_r*.md are
  * checkable without running Spark.
  *
  * Usage: `sbt "runMain graft.PlanDump <sfDir> <outDir> q1,q2,..."`
  * writes `<outDir>/<query>.txt` per query. Self-cleaning queries return a
  * materialized checkpoint whose visible plan is just `ExistingRDD`; for
  * those the real serving plan is the `capturedPlans` entry recorded at
  * execution time, so the query is EXECUTED first and the captured formatted
  * plan preferred when present (the same source PlanSpec pins read).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[plandump] no such query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            // Execute so AQE finalizes and self-cleaning queries record
            // their captured serving plan.
            df.write.format("noop").mode("overwrite").save()
            val plan = SparkEntry.capturedPlans.get(s"$name.formatted")
              .getOrElse(df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode))
            Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
            println(s"[plandump] wrote $outDir/$name.txt")
          } catch { case e: Throwable =>
            System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
