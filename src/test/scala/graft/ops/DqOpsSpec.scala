package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class DqOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("expectations: counts violators per rule in one pass; null predicate = violation") {
    val df = Seq(
      (Some(1L), "ok"), (Some(2L), "ok"), (Some(-5L), "bad"), (None, "ok")
    ).toDF("amount", "tag")
    val out = DqOps.expectations(df, Seq(
      "positive_amount" -> (col("amount") > 0L),       // null amount → null pred → violation
      "tag_ok" -> (col("tag") === "ok"),
      "never_fires" -> lit(true)))
      .orderBy("rule").as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("never_fires", 0L, 4L),
      ("positive_amount", 2L, 4L),
      ("tag_ok", 1L, 4L)))
  }

  test("expectations plan: one scan, one scalar aggregate, no per-rule jobs") {
    val df = Seq((1L, "a")).toDF("x", "y")
    val plan = DqOps.expectations(df, Seq(
      "r1" -> (col("x") > 0L), "r2" -> col("y").isNotNull))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan|Scan".r.findAllIn(plan).size === 1, plan)
  }

  test("uniqueness: every copy of a shared key counts; null keys group together") {
    val df = Seq(Some(1L), Some(1L), Some(2L), None, None, None)
      .toDF("k")
    val out = DqOps.uniqueness(df, Seq("k"), "unique_k")
      .as[(String, Long, Long)].collect().head
    // key 1 contributes 2, null-key group contributes 3, key 2 is clean
    assert(out === ("unique_k", 5L, 6L))
  }

  test("orphans: non-null fk misses parent; null fk makes no claim") {
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = DqOps.orphans(child, parent, "fk", "pk", "fk_check")
      .as[(String, Long, Long)].collect().head
    assert(out === ("fk_check", 1L, 4L))
  }

  test("empty batch: zero violations of zero rows, never NULL") {
    val empty = Seq.empty[(Long, String)].toDF("x", "y")
    val rr = DqOps.expectations(empty, Seq("r" -> (col("x") > 0L)))
      .as[(String, Long, Long)].collect().toSeq
    assert(rr === Seq(("r", 0L, 0L)))
    val u = DqOps.uniqueness(empty, Seq("x"), "u")
      .as[(String, Long, Long)].collect().toSeq
    assert(u === Seq(("u", 0L, 0L)))
  }

  test("columnProfile: null, non-null, and exact distinct per column in one scan") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("b")), (Some(2L), None), (None, Some("a"))
    ).toDF("num", "tag")
    val out = DqOps.columnProfile(df, Seq("num", "tag"))
      .orderBy("col_name").as[(String, Long, Long, Long)].collect().toSeq
    // distinct skips nulls (SQL COUNT(DISTINCT) semantics)
    assert(out === Seq(("num", 3L, 1L, 2L), ("tag", 3L, 1L, 2L)))
  }

  test("columnProfile plan: one scan feeds all columns, no per-column jobs") {
    val df = Seq((1L, "a")).toDF("x", "y")
    val plan = DqOps.columnProfile(df, Seq("x", "y"))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan|Scan".r.findAllIn(plan).size === 1, plan)
  }

  test("kAnonymity: classes below k flag at_risk, nulls form their own class") {
    val df = Seq(
      (Some("uk"), "m"), (Some("uk"), "m"), (Some("uk"), "m"),
      (Some("fr"), "m"), (Some("fr"), "f"),
      (None, "f"), (None, "f")
    ).toDF("country", "seg")
    val out = DqOps.kAnonymity(df, Seq("country", "seg"), k = 3L)
      .orderBy(col("country").asc_nulls_first, col("seg"))
      .as[(Option[String], String, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      (None, "f", 2L, true),
      (Some("fr"), "f", 1L, true),
      (Some("fr"), "m", 1L, true),
      (Some("uk"), "m", 3L, false)))
  }

  test("the three report shapes union into one schema") {
    val df = Seq((1L, 1L)).toDF("a", "b")
    val r = DqOps.expectations(df, Seq("r" -> (col("a") > 0L)))
      .unionByName(DqOps.uniqueness(df, Seq("a"), "u"))
      .unionByName(DqOps.orphans(df, df.select(col("a").as("pk")), "b", "pk", "fk"))
    assert(r.columns.toSeq === Seq("rule", "violations", "total"))
    assert(r.count() === 3L)
  }

  test("lDiversity: homogeneous class flags even when large; nulls add one value") {
    val df = Seq(
      // big but homogeneous: 3 members, all sensitive "x" → at risk at l=2
      ("homog", "x"), ("homog", "x"), ("homog", "x"),
      // diverse: 2 distinct values → passes l=2
      ("ok", "x"), ("ok", "y"),
      // null + one value = 2 observables → passes l=2
      ("withnull", "x"), ("withnull", null)).toDF("q", "s")
    val got = DqOps.lDiversity(df, Seq("q"), "s", l = 2L)
      .orderBy("q").as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(("homog", 3L, 1L, true), ("ok", 2L, 2L, false),
      ("withnull", 2L, 2L, false)))
    intercept[IllegalArgumentException](
      DqOps.lDiversity(df, Seq("q", "s"), "s", l = 2L))
    intercept[IllegalArgumentException](
      DqOps.lDiversity(df, Seq("q"), "s", l = 1L))
  }

  test("tCloseness: hand-computed ordered EMD; m=1 trivially close; null class drops") {
    // A is 3:1 over {1,2}, B is 1:3, global 4:4. Prefix at v=1:
    // |cumC·n − cumG·n_c| = |3·8 − 4·4| = 8 (A), |1·8 − 4·4| = 8 (B);
    // at v=2 both are 0. emd = 8 / ((2−1)·4·8) = 0.25 → at risk at t=0.2.
    val rows = Seq(
      ("A", 1L), ("A", 1L), ("A", 1L), ("A", 2L),
      ("B", 1L), ("B", 2L), ("B", 2L), ("B", 2L)).toDF("q", "v")
    val out = DqOps.tCloseness(rows, Seq("q"), "v", 0.2).orderBy("q")
      .as[(String, Long, Long, Double, Boolean)].collect().toSeq
    assert(out === Seq(("A", 4L, 8L, 0.25, true), ("B", 4L, 8L, 0.25, true)))
    // single-valued sensitive domain: every class is trivially 0-close
    val one = DqOps.tCloseness(Seq(("A", 5L), ("B", 5L)).toDF("q", "v"),
      Seq("q"), "v", 0.2).orderBy("q")
      .as[(String, Long, Long, Double, Boolean)].collect().toSeq
    assert(one === Seq(("A", 1L, 0L, 0.0, false), ("B", 1L, 0L, 0.0, false)))
    // null sensitive values carry no position; an all-null class drops
    val n = DqOps.tCloseness(
      Seq(("A", Some(1L)), ("A", Some(2L)), ("C", Option.empty[Long]))
        .toDF("q", "v"), Seq("q"), "v", 0.2)
    assert(n.select("q").as[String].collect().toSeq === Seq("A"))
    intercept[IllegalArgumentException](
      DqOps.tCloseness(rows, Seq("q"), "v", 1.5))
  }

  test("headerDetailReconcile: match, drift, and orphan headers in one row") {
    val h = Seq((1L, 100L), (2L, 200L), (3L, 50L)).toDF("k", "amt")
    val d = Seq((1L, 60L), (1L, 40L), (2L, 150L)).toDF("k", "amt")
    val got = DqOps.headerDetailReconcile(h, d, "k", "k",
      col("amt"), col("amt"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    // order 1 reconciles exactly, order 2 drifts 50, order 3 has no lines
    assert(got === ((3L, 1L, 1L, 1L, 50L, 50L)))
    // tolerance folds the drifted header into the matched column
    val tol = DqOps.headerDetailReconcile(h, d, "k", "k",
      col("amt"), col("amt"), tolCents = 50L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(tol === ((3L, 1L, 2L, 0L, 50L, 50L)))
    intercept[IllegalArgumentException](
      DqOps.headerDetailReconcile(h, d, "k", "k", col("amt"), col("amt"), -1L))
  }
}
