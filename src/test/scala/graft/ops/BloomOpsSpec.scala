package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the bloom membership contract: one-sided error (recall 1.0 is
  * structural), bounded false positives, deterministic bits, total on
  * empty build sides.
  */
class BloomOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val members = (0 until 1000).map(i => s"member-$i")
  private val strangers = (0 until 1000).map(i => s"stranger-$i")

  test("no false negatives: every inserted item probes true") {
    val bloom = BloomOps.buildBloom(members.toDF("s"), col("s"),
      expectedItems = 1000, fpp = 1e-4)
    assert(bloom.isDefined)
    val hits = members.toDF("s")
      .where(BloomOps.mightContain(bloom, col("s"))).count()
    assert(hits == 1000L)
  }

  test("false positives bounded near the configured fpp") {
    val bloom = BloomOps.buildBloom(members.toDF("s"), col("s"),
      expectedItems = 1000, fpp = 1e-4)
    val fp = strangers.toDF("s")
      .where(BloomOps.mightContain(bloom, col("s"))).count()
    // 1000 probes at fpp 1e-4 → expected 0.1 false positives; 5 is a
    // deterministic-data margin, not a statistical one (same data, same
    // hash, same bits → same count every run)
    assert(fp <= 5L, s"$fp false positives out of 1000 at fpp=1e-4")
  }

  test("deterministic bits: partial-merge order cannot change the filter") {
    val df = members.toDF("s").repartition(7)
    val a = BloomOps.buildBloom(df, col("s"), 1000, 1e-4).get
    val b = BloomOps.buildBloom(df.repartition(3), col("s"), 1000, 1e-4).get
    assert(java.util.Arrays.equals(a, b))
  }

  test("empty build side: None, and the probe is constant-false") {
    val empty = members.toDF("s").where(lit(false))
    assert(BloomOps.buildBloom(empty, col("s"), 10, 0.01).isEmpty)
    val kept = members.toDF("s")
      .where(BloomOps.mightContain(None, col("s"))).count()
    assert(kept == 0L)
  }
}
