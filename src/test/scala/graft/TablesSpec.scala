package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Contracts for the parquet loaders — specifically the two timestamp
  * generations [[Tables.events]] normalizes (nanos-as-long and
  * TIMESTAMP(MICROS, isAdjustedToUTC=false)). The driver fixtures only
  * ever exhibit one generation at a time, so the other branch needs a
  * synthetic fixture or a regression there would ride along ungraded.
  */
class TablesSpec extends SparkTestBase {

  test("events: NTZ parquet ts casts to TimestampType with unchanged epoch values") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ntz").toString
    // java.time.LocalDateTime encodes as TimestampNTZType, which the
    // parquet writer stores as TIMESTAMP(MICROS, isAdjustedToUTC=false) —
    // the second fixture generation.
    val rows = Seq(
      (1L, java.time.LocalDateTime.of(2024, 1, 8, 0, 0, 0), 7L,
        "click", 1.5, "{}"),
      (2L, java.time.LocalDateTime.of(2024, 3, 31, 23, 59, 59, 123456000), 8L,
        "view", 2.5, "{}"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value",
      "props")
    assert(df.schema("ts").dataType == TimestampNTZType)
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")

    val e = Tables.events(spark, dir)
    assert(e.schema("ts").dataType == TimestampType)
    // Under the UTC session this project pins everywhere, the NTZ→zoned
    // cast must keep the wall clock, i.e. epoch micros equal the
    // wall-clock instant read as UTC.
    val got = e.orderBy("event_id").select(unix_micros(col("ts")))
      .as[Long].collect().toSeq
    val want = rows.map { r =>
      val i = r._2.toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    assert(got == want)
  }
}
