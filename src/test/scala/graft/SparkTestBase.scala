package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM (suites reuse it via
  * getOrCreate). UTC + small shuffle partitioning mirror the driver's
  * Verify configuration.
  */
trait SparkTestBase extends AnyFunSuite {
  // Pin the JVM default timezone, not just Spark's session timezone: the
  // fixtures build wall-clock Timestamps via Timestamp.valueOf and assert
  // rendered toString values, both of which go through the JVM default —
  // on a non-UTC machine the same tests would otherwise shift by the
  // local offset (and rows near week boundaries could change weeks).
  java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  /** The shared smoke-scale fixture dir — one definition so re-pointing
    * the testdata can't silently leave a spec on a different corpus.
    */
  val sfTest = "/root/testdata/sf0.001"
}
