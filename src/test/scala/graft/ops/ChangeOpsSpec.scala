package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ChangeOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("applyChanges: insert, update, multi-version override, delete, untouched") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "b1", 1L, false), // update existing
      (4L, "d1", 1L, false), // insert new key, v1...
      (4L, "d2", 2L, false), // ...overridden by v2
      (3L, "xx", 1L, true),  // delete existing
      (5L, "e1", 1L, true)   // delete of an absent key: still absent
    ).toDF("k", "v", "ver", "dead")
    val out = ChangeOps.applyChanges(base, changes, Seq("k"),
      col("ver"), col("dead"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(out === Seq((1L, "a"), (2L, "b1"), (4L, "d2")))
  }

  test("applyChanges: change at any version beats base, internal cols dropped") {
    val base = Seq((1L, "old")).toDF("k", "v")
    val changes = Seq((1L, "new", 0L, false)).toDF("k", "v", "ver", "dead")
    val out = ChangeOps.applyChanges(base, changes, Seq("k"), col("ver"), col("dead"))
    assert(out.columns.toSeq === Seq("k", "v"))
    assert(out.as[(Long, String)].collect().toSeq === Seq((1L, "new")))
  }

  test("applyChanges: a NULL-version change still deterministically beats base") {
    val base = Seq((1L, "old")).toDF("k", "v")
    val changes = Seq((1L, "new", Option.empty[Long], false))
      .toDF("k", "v", "ver", "dead")
    val out = ChangeOps.applyChanges(base, changes, Seq("k"),
      col("ver"), col("dead")).as[(Long, String)].collect().toSeq
    assert(out === Seq((1L, "new")))
  }

  test("applyChanges plan: single key exchange, top-1 pushed to WindowGroupLimit") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "b", 1L, false)).toDF("k", "v", "ver", "dead")
    val plan = ChangeOps.applyChanges(base, changes, Seq("k"),
      col("ver"), col("dead")).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("scd2: consecutive duplicates compact; intervals chain; open current row") {
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, "open"),
      (1L, ts("2024-01-03 00:00:00"), 11L, "open"),   // duplicate → compacted
      (1L, ts("2024-01-05 00:00:00"), 12L, "closed"),
      (1L, ts("2024-01-07 00:00:00"), 13L, "open"),   // re-open: NOT deduped globally
      (2L, ts("2024-02-01 00:00:00"), 20L, "open")
    ).toDF("k", "t", "id", "status")
    val out = ChangeOps.scd2(rows, Seq("k"), col("t"), col("id"), Seq("status"))
      .select("k", "status", "effective_from", "effective_to", "is_current")
      .orderBy("k", "effective_from")
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp], Boolean)]
      .collect().toSeq
    assert(out === Seq(
      (1L, "open",   ts("2024-01-01 00:00:00"), Some(ts("2024-01-05 00:00:00")), false),
      (1L, "closed", ts("2024-01-05 00:00:00"), Some(ts("2024-01-07 00:00:00")), false),
      (1L, "open",   ts("2024-01-07 00:00:00"), None, true),
      (2L, "open",   ts("2024-02-01 00:00:00"), None, true)))
  }

  test("scd2: null-safe change detection on tracked attrs") {
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, Option.empty[String]),
      (1L, ts("2024-01-02 00:00:00"), 2L, Option.empty[String]), // null==null → compacted
      (1L, ts("2024-01-03 00:00:00"), 3L, Some("x"))             // null→x → change
    ).toDF("k", "t", "id", "status")
    val out = ChangeOps.scd2(rows, Seq("k"), col("t"), col("id"), Seq("status"))
      .orderBy("effective_from").select("effective_from").as[java.sql.Timestamp]
      .collect().toSeq
    assert(out === Seq(ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00")))
  }

  test("scd2 plan: one exchange serves both window passes") {
    val rows = Seq((1L, ts("2024-01-01 00:00:00"), 1L, "a")).toDF("k", "t", "id", "s")
    val plan = ChangeOps.scd2(rows, Seq("k"), col("t"), col("id"), Seq("s"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }

  test("snapshotDiff: added/removed/changed/unchanged, null-safe counts") {
    val old = Seq(
      (1L, Some("a"), Some(10L)),   // unchanged
      (2L, Some("b"), Some(20L)),   // value changes → 1 col
      (3L, Some("c"), Some(30L)),   // both change → 2 cols
      (4L, Some("d"), Some(40L)),   // removed
      (6L, None, None))             // all-null attrs, unchanged: the
                                    // presence markers must classify it
      .toDF("k", "s", "v")
    val neu = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("b"), Some(21L)),
      (3L, Some("x"), Some(31L)),
      (5L, Some("e"), Some(50L)),   // added
      (6L, None, None))
      .toDF("k", "s", "v")
    val got = ChangeOps.snapshotDiff(old, neu, Seq("k"), Seq("s", "v"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got === Seq(
      (1L, "unchanged", 0L), (2L, "changed", 1L), (3L, "changed", 2L),
      (4L, "removed", -1L), (5L, "added", -1L), (6L, "unchanged", 0L)))
    // null→value and value→null both count as a change, null-safely
    val nd = ChangeOps.snapshotDiff(
      Seq((7L, Option.empty[String], Some(1L))).toDF("k", "s", "v"),
      Seq((7L, Some("now"), Option.empty[Long])).toDF("k", "s", "v"),
      Seq("k"), Seq("s", "v")).collect().head
    assert(nd.getString(1) === "changed" && nd.getLong(2) === 2L)
  }

  private def drift(rows: Seq[(String, String)]) =
    ChangeOps.mixtureDrift(
      rows.toDF("day", "cat"), to_date(col("day")), col("cat"))
      .orderBy("period")
      .select(col("period").cast("string"), col("n"), col("n_prev"),
        col("jsd"), col("entropy"))
      .as[(String, Long, Long, Double, Double)].collect().toSeq

  test("mixtureDrift: identical mixtures → JSD 0; disjoint → ln 2") {
    val same = drift(Seq(
      ("2024-01-01", "a"), ("2024-01-01", "a"), ("2024-01-01", "b"),
      ("2024-01-08", "a"), ("2024-01-08", "a"), ("2024-01-08", "b")))
    // entropy of {2/3, 1/3} = ln3 − (2/3)ln2 ≈ 0.6365
    assert(same === Seq(("2024-01-08", 3L, 3L, 0.0, 0.6365)))
    val disj = drift(Seq(
      ("2024-01-01", "a"), ("2024-01-01", "a"),
      ("2024-01-08", "b"), ("2024-01-08", "b")))
    // maximal divergence between distributions = ln 2; one-point entropy 0
    assert(disj === Seq(("2024-01-08", 2L, 2L, 0.6931, 0.0)))
  }

  test("mixtureDrift: appearing/vanishing categories stay finite; chain emits per step") {
    val out = drift(Seq(
      ("2024-01-01", "a"), ("2024-01-01", "b"),
      ("2024-01-08", "a"), ("2024-01-08", "c"),
      ("2024-01-15", "a"), ("2024-01-15", "c")))
    assert(out.map(_._1) === Seq("2024-01-08", "2024-01-15"))
    // b vanished, c appeared: JSD = ½ln2 + ½ln2 − ... = ½ ln 2 exactly
    // here (half the mass flips): 0.5·[½ln2·2] → 0.3466
    assert(out.head._4 === 0.3466)
    assert(out(1)._4 === 0.0)
  }

  private def kdrift(rows: Seq[(String, Long)]) =
    ChangeOps.distributionDrift(
      rows.toDF("day", "v"), to_date(col("day")), col("v"))
      .orderBy("period")
      .select(col("period").cast("string"), col("n"), col("n_prev"),
        col("d_num"), col("d_stat"))
      .as[(String, Long, Long, Long, Double)].collect().toSeq

  test("distributionDrift: identical weeks → 0; shifted values → hand-computed D") {
    val same = kdrift(Seq(("2024-01-01", 5L), ("2024-01-01", 9L),
      ("2024-01-08", 5L), ("2024-01-08", 9L)))
    assert(same === Seq(("2024-01-08", 2L, 2L, 0L, 0.0)))
    // prev {1,1,2} vs cur {2,3,3}: sup gap 2/3 (after value 1 and 2)
    val shift = kdrift(Seq(
      ("2024-01-01", 1L), ("2024-01-01", 1L), ("2024-01-01", 2L),
      ("2024-01-08", 2L), ("2024-01-08", 3L), ("2024-01-08", 3L)))
    assert(shift === Seq(("2024-01-08", 3L, 3L, 6L, 0.6667)))
  }

  test("distributionDrift: off-grid periods never pair") {
    assert(kdrift(Seq(("2024-01-01", 1L), ("2024-01-15", 1L))) === Seq())
  }

  test("mixtureDrift: off-grid periods never pair; boundaries drop") {
    // 14-day gap on a 7-day grid: no period has a predecessor
    assert(drift(Seq(("2024-01-01", "a"), ("2024-01-15", "a"))) === Seq())
  }

  private def x2drift(rows: Seq[(String, String)]) =
    ChangeOps.chiSquareDrift(
      rows.toDF("day", "cat"), to_date(col("day")), col("cat"))
      .orderBy("period")
      .select(col("period").cast("string"), col("n"), col("n_prev"),
        col("dof"), col("chi2"))
      .as[(String, Long, Long, Long, Double)].collect().toSeq

  test("chiSquareDrift: identical mixtures → 0; hand-computed 2×2 table") {
    val same = x2drift(Seq(
      ("2024-01-01", "a"), ("2024-01-01", "b"),
      ("2024-01-08", "a"), ("2024-01-08", "b")))
    assert(same === Seq(("2024-01-08", 2L, 2L, 1L, 0.0)))
    // 2×2: cur (a=3, b=1), prev (a=1, b=3); Δ_a = 3·4 − 1·4 = 8,
    // Δ_b = −8; each term 64/(4·4·4) = 1 → χ² = 2 (the textbook
    // Σ(O−E)²/E over the four cells: 4·(1²)/2 = 2)
    val shift = x2drift(Seq(
      ("2024-01-01", "a"), ("2024-01-01", "b"), ("2024-01-01", "b"),
      ("2024-01-01", "b"),
      ("2024-01-08", "a"), ("2024-01-08", "a"), ("2024-01-08", "a"),
      ("2024-01-08", "b")))
    assert(shift === Seq(("2024-01-08", 4L, 4L, 1L, 2.0)))
    // complete separation of k=2 over N=4 observations: χ² = N = 4
    val disj = x2drift(Seq(
      ("2024-01-01", "a"), ("2024-01-01", "a"),
      ("2024-01-08", "b"), ("2024-01-08", "b")))
    assert(disj === Seq(("2024-01-08", 2L, 2L, 1L, 4.0)))
    // off-grid periods never pair
    assert(x2drift(Seq(("2024-01-01", "a"), ("2024-01-15", "a"))) === Seq())
  }

  test("revenueBridge: effects telescope to the delta exactly") {
    import spark.implicits._
    // wk1: n=2 s=200 (mean 100); wk2: n=3 s=600 (mean 200):
    // Δrev 400¢ = 4.0; price (200−100)·3 = 300¢; volume (3−2)·100 = 100¢
    val rows = Seq(
      ("2024-01-01", 100L), ("2024-01-01", 100L),
      ("2024-01-08", 200L), ("2024-01-08", 200L), ("2024-01-08", 200L))
      .toDF("day", "cents").withColumn("d", to_date(col("day")))
    val got = ChangeOps.revenueBridge(rows, col("d"), col("cents"))
      .select(col("period").cast("string"), col("n"), col("n_prev"),
        col("d_rev"), col("price_effect"), col("volume_effect"))
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got === Seq(("2024-01-08", 3L, 2L, 4.0, 3.0, 1.0)))
    // boundary week (no predecessor) drops
    assert(got.size === 1)
  }

  test("psiDrift: identical mixture scores EXACTLY zero; a jump scores big") {
    import spark.implicits._
    // baseline + one scored week with the identical 1..100 spectrum:
    // every (cc, nw) equals (cb, nb), so each micro term is exactly 0.
    val base = (1L to 100L).map(v => ("2023-12-25", v, true))
    val same = (1L to 100L).map(v => ("2024-01-01", v, false))
    def run(rows: Seq[(String, Long, Boolean)]) =
      ChangeOps.psiDrift(rows.toDF("day", "v", "b"),
        to_date(col("day")), col("v"), col("b"))
        .select(col("period").cast("string"), col("n"), col("psi_micro"),
          col("psi"))
        .as[(String, Long, Long, Double)].collect().toSeq
    assert(run(base ++ same) === Seq(("2024-01-01", 100L, 0L, 0.0)))
    // every scored value lands above the top decile → big PSI
    val jump = (1L to 100L).map(v => ("2024-01-01", v + 2000L, false))
    val got = run(base ++ jump).head
    assert(got._2 === 100L && got._4 > 1.0, got.toString)
    // empty baseline fails loudly instead of emitting all-null PSI
    val e = intercept[Exception] { run(same) }
    assert(e.getMessage != null &&
      (e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
        .contains("non-empty baseline"), e.getMessage)
  }
}
