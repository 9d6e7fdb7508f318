package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the pandas-coerce edge semantics of SURVEY.md §2.B (reference
  * etl/etl_main.py:158-199) under Spark 4's ANSI default.
  */
class CoreOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("P5 coerceDouble nulls junk instead of throwing (ANSI)") {
    val got = Seq("123.5", "noprice", "", "7")
      .toDF("p").select(CoreOps.coerceDouble($"p").as("v"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(123.5), None, None, Some(7.0)))
  }

  test("P3 parseDateAndDrop drops unparseable dates, keeps valid") {
    val df = Seq(("a", "2024-01-02 00:00:00"), ("b", "not-a-date"))
      .toDF("id", "raw")
    val out = CoreOps.parseDateAndDrop(df, "raw", "date")
    assert(out.select("id").as[String].collect().toSeq == Seq("a"))
  }

  test("P6 normalizeKey strips all whitespace, uppercases, idempotent") {
    val got = Seq("sw1a 1aa ", " e c 1\tA", null)
      .toDF("pc").select(CoreOps.normalizeKey($"pc").as("k"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("SW1A1AA"), Some("EC1A"), None))
    val twice = Seq("sw1a 1aa").toDF("pc")
      .select(CoreOps.normalizeKey(CoreOps.normalizeKey($"pc")).as("k"))
      .as[String].collect().head
    assert(twice == "SW1A1AA")
  }

  test("P7 weekStart is Monday, including across year boundaries") {
    // 2024-01-01 is a Monday; 2023-12-31 is a Sunday belonging to the week
    // starting Monday 2023-12-25 (pandas to_period('W').start_time parity).
    val got = Seq(ts("2024-01-01 05:00:00"), ts("2023-12-31 23:59:59"),
        ts("2024-01-07 00:00:00"))
      .toDF("d").select(CoreOps.weekStart($"d").as("w"))
      .collect().map(_.getTimestamp(0).toString)
    assert(got.toSeq == Seq("2024-01-01 00:00:00.0", "2023-12-25 00:00:00.0",
      "2024-01-01 00:00:00.0"))
  }

  test("P9 prefixKey of null stays null (pandas slice parity)") {
    val got = Seq(Some("SW1A1AA"), None).toDF("pc")
      .select(CoreOps.prefixKey($"pc").as("p"))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("SW1A"), None))
  }

  test("rnd is portable floor-based rounding at 4dp") {
    // The exact double nearest 1.00005 is slightly above the half (→ up);
    // the one nearest -1.00005 is slightly below (→ down). What matters is
    // that the floor formula is deterministic on the stored double — the
    // oracle SQL computes the identical chain.
    val got = Seq(1.00005, 1.00004, -1.00005).toDF("x")
      .select(CoreOps.rnd($"x").as("r")).as[Double].collect().toSeq
    assert(got == Seq(1.0001, 1.0, -1.0001))
  }

  test("moneyCents is exact for 2dp money") {
    val got = Seq(499978.59, 1013.70, 0.01).toDF("x")
      .select(CoreOps.moneyCents($"x").as("c")).as[Long].collect().toSeq
    assert(got == Seq(49997859L, 101370L, 1L))
  }
}
