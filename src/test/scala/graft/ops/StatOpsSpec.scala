package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class StatOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]) =
    StatOps.bivariateStats(rows.toDF("g", "x", "y"), col("g"), col("x"), col("y"))
      .orderBy("g")
      .as[(String, Long, Option[Double], Option[Double], Option[Double], Option[Double])]
      .collect().toSeq

  test("perfect line y = 2x + 1: slope 2, intercept 1, r = r2 = 1") {
    val out = run(Seq(("a", 1L, 3L), ("a", 2L, 5L), ("a", 3L, 7L), ("a", 10L, 21L)))
    assert(out === Seq(("a", 4L, Some(2.0), Some(1.0), Some(1.0), Some(1.0))))
  }

  test("perfect negative line: r = -1") {
    val out = run(Seq(("a", 0L, 10L), ("a", 1L, 8L), ("a", 2L, 6L)))
    assert(out === Seq(("a", 3L, Some(-2.0), Some(10.0), Some(-1.0), Some(1.0))))
  }

  test("degenerate groups: n=1 and constant-x yield nulls, constant-y zero slope") {
    val out = run(Seq(
      ("single", 5L, 7L),
      ("constx", 3L, 1L), ("constx", 3L, 9L),
      ("consty", 1L, 4L), ("consty", 6L, 4L)))
    val m = out.map(r => r._1 -> r).toMap
    assert(m("single") === ("single", 1L, None, None, None, None))
    assert(m("constx") === ("constx", 2L, None, None, None, None))
    // flat y: slope and covariance are exactly 0, but Pearson r is 0/0 → null
    assert(m("consty") === ("consty", 2L, Some(0.0), Some(4.0), None, None))
  }

  test("hand-computed scatter matches the closed form to 4 dp") {
    // points (1,2),(2,2),(3,4): n=3 Σx=6 Σy=8 Σxy=18 Σx²=14 Σy²=24
    // covN=54-48=6, varxN=42-36=6, varyN=72-64=8 → slope=1, intercept=2/3,
    // r=6/√48≈0.8660, r²=36/48=0.75
    val out = run(Seq(("a", 1L, 2L), ("a", 2L, 2L), ("a", 3L, 4L)))
    assert(out === Seq(("a", 3L, Some(1.0), Some(0.6667), Some(0.8660), Some(0.75))))
  }

  test("result is partition-layout invariant (exact sums)") {
    val rows = Seq.tabulate(500)(i => ("g", (i % 37).toLong, ((i * 7) % 101).toLong))
    val one = StatOps.bivariateStats(rows.toDF("g", "x", "y").repartition(1),
      col("g"), col("x"), col("y")).collect().head
    val many = StatOps.bivariateStats(rows.toDF("g", "x", "y").repartition(13),
      col("g"), col("x"), col("y")).collect().head
    assert(one === many)
  }

  test("plan: one hash aggregate exchange with map-side partials") {
    val df = Seq(("a", 1L, 2L)).toDF("g", "x", "y")
    val plan = StatOps.bivariateStats(df, col("g"), col("x"), col("y"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1, plan)
  }

  test("histogram: exact integer binning, negatives floor, shares sum to one") {
    val df = (Seq(-5L, -1L) ++ (0L until 20L) ++ Seq(25L, 29L)).toDF("v")
    val out = StatOps.histogram(df, col("v"), binWidth = 10L)
      .orderBy("bin").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (-1L, -10L, 2L), (0L, 0L, 10L), (1L, 10L, 10L), (2L, 20L, 2L)).map {
      case (b, lo, n) => (b, lo, n, math.floor(n / 24.0 * 10000 + 0.5) / 10000)
    })
    assert(math.abs(out.map(_._4).sum - 1.0) < 0.001)
  }

  test("histogram: boundary values land in the upper bin (half-open [lo, hi))") {
    val out = StatOps.histogram(Seq(10L, 20L).toDF("v"), col("v"), 10L)
      .orderBy("bin").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._3)) === Seq((1L, 1L), (2L, 1L)))
  }

  test("histogram: integral division stays exact past 2^53 (float div would misbin)") {
    val v = (1L << 53) + 3L  // not representable in double; float path binned
    val out = StatOps.histogram(Seq(v).toDF("v"), col("v"), 3L)
      .as[(Long, Long, Long, Double)].collect().head
    assert(out._1 === v / 3L && out._2 === (v / 3L) * 3L)
  }

  test("benfordDigits: lexical first digit, non-positives excluded, shares sum to 1") {
    val vals = Seq(1L, 19L, 123L, 2L, 29L, 999L, 0L, -7L)
    val out = StatOps.benfordDigits(vals.toDF("v"), col("v"))
      .orderBy("digit").as[(Int, Long, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) === Seq((1, 3L), (2, 2L), (9, 1L)))
    assert(math.abs(out.map(_._3).sum - 1.0) < 0.001)
    // lexical extraction: 19 and 123 both lead with 1 regardless of magnitude
    assert(out.head === ((1, 3L, 0.5)))
  }

  // ---- welchTTest ----

  private def welch(rows: Seq[(String, Boolean, Option[Long])]) =
    StatOps.welchTTest(rows.toDF("g", "v", "cents"),
      col("g"), col("v"), col("cents"))
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Boolean])]
      .collect().map(r => r._1 -> r).toMap

  test("welch: hand-computed t on unequal variances") {
    // A = {100, 200, 300} cents: mean 200, s² = 10000
    // B = {90, 110} cents: mean 100, s² = 200
    // se = sqrt(10000/3 + 200/2) = sqrt(3433.33...), t = 100/se
    val rows = Seq(("g", true, Some(100L)), ("g", true, Some(200L)),
      ("g", true, Some(300L)), ("g", false, Some(90L)), ("g", false, Some(110L)))
    val (_, na, nb, ma, mb, t, sig) = welch(rows)("g")
    assert((na, nb) === ((3L, 2L)))
    assert((ma.get, mb.get) === ((2.0, 1.0)))  // dollars
    val se = math.sqrt(10000.0 / 3 + 200.0 / 2)
    assert(t.get === math.floor((100.0 / se) * 10000 + 0.5) / 10000)
    assert(sig.get === false)  // t ≈ 1.706 < 1.96
  }

  test("welch: singleton or constant-both arms yield null t, means survive") {
    val rows = Seq(
      ("single", true, Some(100L)), ("single", false, Some(50L)),
      ("single", false, Some(70L)),
      ("const", true, Some(10L)), ("const", true, Some(10L)),
      ("const", false, Some(20L)), ("const", false, Some(20L)),
      ("onearm", true, Some(10L)), ("onearm", true, Some(30L)))
    val r = welch(rows)
    assert(r("single")._6.isEmpty && r("single")._7.isEmpty)
    assert(r("single")._4.get === 1.0)
    assert(r("const")._6.isEmpty)   // zero pooled se
    assert(r("onearm")._3 === 0L && r("onearm")._5.isEmpty)
  }

  test("welch: null observations are excluded, a clear effect is significant") {
    val a = (1L to 50L).map(i => ("g", true, Some(1000L + (i % 3))))
    val b = (1L to 50L).map(i => ("g", false, Some(100L + (i % 3))))
    val r = welch(a ++ b :+ (("g", true, None)))
    assert(r("g")._2 === 50L)  // the null row never counts
    assert(r("g")._7.get === true)
  }

  private def ks(rows: Seq[(Option[Boolean], Option[Long])]) =
    StatOps.ksTest(rows.toDF("lbl", "s"), col("lbl"), col("s"))
      .as[(Long, Long, Long, Option[Double])].collect().head

  test("ksTest: hand-computed sup gap; identical → 0; separated → 1; empty → null") {
    // A={1,3}, B={2,4}: CDF gap peaks at 1/2 (after value 1 and 3)
    val inter = Seq((true, 1L), (true, 3L), (false, 2L), (false, 4L))
      .map { case (l, s) => (Some(l), Some(s)) }
    assert(ks(inter) === ((2L, 2L, 2L, Some(0.5))))
    val same = Seq((Some(true), Some(5L)), (Some(false), Some(5L)),
      (Some(true), Some(7L)), (Some(false), Some(7L)))
    assert(ks(same) === ((2L, 2L, 0L, Some(0.0))))
    val apart = Seq((true, 1L), (true, 2L), (false, 3L), (false, 4L))
      .map { case (l, s) => (Some(l), Some(s)) }
    assert(ks(apart) === ((2L, 2L, 4L, Some(1.0))))
    assert(ks(Seq((Some(true), Some(1L)), (None, Some(9L)))) ===
      ((1L, 0L, 0L, None)))
  }

  private def km(rows: Seq[(Long, String, String)], horizon: Int = 3) =
    StatOps.kmSurvival(rows.toDF("u", "ts", "et"), col("u"),
      to_timestamp(col("ts")), col("et") === "purchase", horizon)
      .orderBy("t_days").as[(Long, Long, Long, Double)].collect().toSeq

  test("kmSurvival: hand-computed product limit with censoring") {
    def user(u: Long, buyDay: Option[Int]) =
      (u, "2024-01-01 00:00:00", "view") +: buyDay.toSeq.map(k =>
        (u, f"2024-01-0${k + 1}%d 00:00:00", "purchase"))
    val rows = user(1, Some(1)) ++ user(2, Some(2)) ++ user(3, Some(5)) ++
      user(4, Some(2)) ++ user(5, None)
    // t=1: n=5 d=1 → S=0.8; t=2: n=4 d=2 → S=0.4; u3 (buys at day 5)
    // and u5 (never) are censored at the day-3 horizon and just leave
    // the risk set — no row, but they held n_risk at 5 and 4
    assert(km(rows) === Seq((1L, 5L, 1L, 0.8), (2L, 4L, 2L, 0.4)))
  }

  test("kmSurvival: an exhausted risk set pins survival to exactly zero") {
    val rows = Seq((1L, "2024-01-01 00:00:00", "purchase"),
      (2L, "2024-01-01 00:00:00", "view"),
      (2L, "2024-01-02 00:00:00", "purchase"))
    // t=0: n=2 d=1 → 0.5; t=1: n=1 d=1 → risk set exhausted → 0.0
    assert(km(rows) === Seq((0L, 2L, 1L, 0.5), (1L, 1L, 1L, 0.0)))
  }

  private def mi(rows: Seq[(Option[String], Option[String])]) =
    StatOps.mutualInformation(rows.toDF("x", "y"), col("x"), col("y"))
      .as[(Long, Long, Double, Double)].collect().head

  test("mutualInformation: independent → 0; deterministic map → ln k; nulls out") {
    val indep = for { x <- Seq("a", "b"); y <- Seq("1", "2") }
      yield (Some(x), Some(y))
    assert(mi(indep) === ((4L, 0L, 0.0, 1.3863)))  // h_joint = ln 4
    val dep = Seq(("a", "1"), ("a", "1"), ("b", "2"), ("b", "2"))
      .map { case (x, y) => (Some(x), Some(y)) }
    // y determined by x, two equiprobable cells: MI = H = ln 2; each
    // ½·ln2 term rounds to 346574 micro BEFORE the sum → 693148
    assert(mi(dep) === ((4L, 693148L, 0.6931, 0.6931)))
    val withNulls = dep :+ ((Some("c"), Option.empty[String]))
    assert(mi(withNulls)._1 === 4L)
  }

  private def auc(rows: Seq[(Option[Boolean], Option[Long])]) =
    StatOps.aucHistogram(rows.toDF("lbl", "s"), col("lbl"), col("s"))
      .as[(Long, Long, Long, Option[Double])].collect().head

  test("auc: perfect separation is 1.0, reversed is 0.0, all-tied is 0.5") {
    val pos = Seq(10L, 20L).map(v => (Some(true), Some(v)))
    val neg = Seq(1L, 2L).map(v => (Some(false), Some(v)))
    assert(auc(pos ++ neg) === ((8L, 2L, 2L, Some(1.0))))
    val rev = pos.map { case (_, s) => (Some(false), s) } ++
      neg.map { case (_, s) => (Some(true), s) }
    assert(auc(rev) === ((0L, 2L, 2L, Some(0.0))))
    val tied = Seq((Some(true), Some(5L)), (Some(true), Some(5L)),
      (Some(false), Some(5L)))
    assert(auc(tied) === ((2L, 2L, 1L, Some(0.5))))
  }

  test("auc: hand-computed mixed case with a cross-class tie") {
    // pos {3, 1}, neg {2, 1}: wins 2, losses 1, ties 1 → U = 2.5 of 4
    val rows = Seq((Some(true), Some(3L)), (Some(true), Some(1L)),
      (Some(false), Some(2L)), (Some(false), Some(1L)))
    assert(auc(rows) === ((5L, 2L, 2L, Some(0.625))))
  }

  test("auc: null label or score excluded; an empty class yields null AUC") {
    val rows = Seq((Some(true), Some(9L)), (Some(true), Some(4L)),
      (None, Some(100L)), (Some(false), None))
    assert(auc(rows) === ((0L, 2L, 0L, None)))
  }

  test("auc: partition-layout invariant (histogram sums are exact)") {
    val rows = (1L to 400L).map(i =>
      (Some(i % 3 == 0), Some(i % 17)): (Option[Boolean], Option[Long]))
    val one = StatOps.aucHistogram(
      rows.toDF("lbl", "s").repartition(1), col("lbl"), col("s"))
      .as[(Long, Long, Long, Option[Double])].collect().head
    val many = StatOps.aucHistogram(
      rows.toDF("lbl", "s").repartition(13), col("lbl"), col("s"))
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(one === many)
    assert(one._2 === 133L && one._3 === 267L)
  }

  // --- overflow preconditions are ENFORCED, not just documented (r8
  // verdict finding 2). The guards live in the post-histogram stages so
  // they can be proven here with synthetic billion-scale COUNTS — the
  // alternative (3·10⁹ real rows in a spec) is not a test anyone runs.

  private def messageOf(t: Throwable): String = {
    var c: Throwable = t; val sb = new StringBuilder
    while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
    sb.toString
  }

  test("ksTest overflow guard: n_a*n_b >= 2^63 raises the actionable error") {
    val big = 3100000000L // > sqrt(2^63) ≈ 3.037e9
    val h = Seq((1L, big, 1L), (2L, 1L, big)).toDF("__s", "__ca", "__cb")
    val e = intercept[Exception] { StatOps.ksFromCounts(h).collect() }
    assert(messageOf(e).contains("ksTest overflow"), messageOf(e))
    // Just inside the bound: no guard, exact integer statistic.
    val ok = Seq((1L, 3000000000L, 1L), (2L, 1L, 2L)).toDF("__s", "__ca", "__cb")
    assert(StatOps.ksFromCounts(ok).collect().head.getLong(0) === 3000000001L)
  }

  test("auc overflow guard: 2*n_pos*n_neg >= 2^63 raises the actionable error") {
    val big = 2200000000L // 2*2.2e9*2.2e9 > 2^63
    val h = Seq((1L, big, 0L), (2L, 0L, big)).toDF("__s", "__pos", "__neg")
    val e = intercept[Exception] { StatOps.aucFromCounts(h).collect() }
    assert(messageOf(e).contains("aucHistogram overflow"), messageOf(e))
    // Negatives at the low score, positives at the high one → AUC 1.0.
    val ok = Seq((1L, 0L, 2L), (2L, 2000000000L, 0L)).toDF("__s", "__pos", "__neg")
    val r = StatOps.aucFromCounts(ok).collect().head
    assert(r.getLong(1) === 2000000000L && r.getDouble(3) === 1.0)
  }

  test("mutualInformation overflow guard: c_xy*n >= 2^63 raises the actionable error") {
    val big = 3100000000L
    val j = Seq(("a", "p", big), ("b", "q", big)).toDF("__x", "__y", "__cxy")
    val e = intercept[Exception] { StatOps.miFromJoint(j).collect() }
    assert(messageOf(e).contains("mutualInformation overflow"), messageOf(e))
    // A deterministic 2-cell map just inside the bound still computes: n =
    // 2·1.5e9 and every product c_xy·n = 1.5e9·3e9 < 2^63.
    val ok = Seq(("a", "p", 1500000000L), ("b", "q", 1500000000L))
      .toDF("__x", "__y", "__cxy")
    val r = StatOps.miFromJoint(ok).collect().head
    assert(r.getLong(0) === 3000000000L && r.getDouble(2) === 0.6931)
  }

  test("giniByGroup: textbook values, tie exactness, loud negatives") {
    def g(rows: Seq[(String, Long)]) =
      StatOps.giniByGroup(rows.toDF("g", "v"), col("g"), col("v"))
        .orderBy("g").as[(String, Long, Option[Double])].collect().toSeq
    // (0,100) → 0.5; all equal → 0; single → 0; groups isolate
    assert(g(Seq(("a", 0L), ("a", 100L), ("b", 50L), ("b", 50L), ("c", 9L)))
      === Seq(("a", 2L, Some(0.5)), ("b", 2L, Some(0.0)),
        ("c", 1L, Some(0.0))))
    // maximal concentration approaches (n−1)/n
    assert(g(Seq(("a", 0L), ("a", 0L), ("a", 0L), ("a", 100L)))
      === Seq(("a", 4L, Some(0.75))))
    // all-zero group: undefined, not a crash
    assert(g(Seq(("z", 0L), ("z", 0L))) === Seq(("z", 2L, None)))
    val e = intercept[Exception] {
      StatOps.giniByGroup(Seq(("a", -5L)).toDF("g", "v"),
        col("g"), col("v")).collect()
    }
    assert(messageOf(e).contains("negative value"), messageOf(e))
  }

  test("kendallTau: hand cases — one inversion, ties, degenerate axis") {
    def kt(rows: Seq[(Long, Long)]) =
      StatOps.kendallTau(rows.toDF("x", "y"), col("x"), col("y"))
        .as[(Long, Long, Long, Option[Double])].collect().head
    // y = (1,3,2,4): one discordant pair of six → τ = 4/6 = 0.6667
    assert(kt(Seq((1L, 1L), (2L, 3L), (3L, 2L), (4L, 4L)))
      === ((4L, 5L, 1L, Some(0.6667))))
    // ties on both axes: C=2, D=0, tx=ty=1, n0=3 → τ = 2/√(2·2) = 1
    assert(kt(Seq((1L, 5L), (1L, 5L), (2L, 7L)))
      === ((3L, 2L, 0L, Some(1.0))))
    // constant x: every pair x-tied → n0 = tx → τ undefined
    assert(kt(Seq((7L, 1L), (7L, 2L), (7L, 3L)))._4 === None)
  }

  test("kendallTau: bounded-quadratic contract is ENFORCED, not just documented") {
    // 11 rows over maxN=10 must die loudly BEFORE the O(n²) pair join —
    // a fact table handed in by mistake gets an actionable message, not
    // a silent cartesian explosion.
    val big = (1L to 11L).map(i => (i, i)).toDF("x", "y")
    val e = intercept[IllegalArgumentException](
      StatOps.kendallTau(big, col("x"), col("y"), maxN = 10))
    assert(e.getMessage.contains("bounded-quadratic"), e.getMessage)
    // at exactly maxN the op runs fine
    val ok = StatOps.kendallTau((1L to 10L).map(i => (i, i)).toDF("x", "y"),
      col("x"), col("y"), maxN = 10)
      .as[(Long, Long, Long, Option[Double])].collect().head
    assert(ok === ((10L, 45L, 0L, Some(1.0))))
    intercept[IllegalArgumentException](
      StatOps.kendallTau(big, col("x"), col("y"), maxN = 1))
  }

  test("wilsonIntervals: hand case, extreme-rate behavior vs the Wald collapse") {
    // g1: 3/4 successes → p̂ 0.75; replay the closed form in Scala
    // (same IEEE op order as the Column expression)
    val rows = Seq(("g1", true), ("g1", true), ("g1", true), ("g1", false),
      ("g2", false), ("g2", false))
    val got = StatOps.wilsonIntervals(rows.toDF("g", "s"), col("g"), col("s"))
      .orderBy("g")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    def wilson(n: Long, pos: Long): (Double, Double) = {
      val nd = n.toDouble; val p = pos.toDouble / nd; val z2 = 1.96 * 1.96
      val denom = 1.0 + z2 / nd
      val c = (p + z2 / (2.0 * nd)) / denom
      val hw = (1.96 * math.sqrt(p * (1.0 - p) / nd
        + z2 / (4.0 * nd * nd))) / denom
      (r4(c - hw), r4(c + hw))
    }
    assert(got(0) === (("g1", 4L, 3L, 0.75) match {
      case (g, n, pos, rate) =>
        val (lo, hi) = wilson(n, pos); (g, n, pos, rate, lo, hi)
    }))
    // p̂ = 0: the Wald band collapses to [0, 0]; Wilson stays a real
    // interval strictly inside (0, 1) at its upper end
    val (lo2, hi2) = wilson(2L, 0L)
    assert(got(1) === (("g2", 2L, 0L, 0.0, lo2, hi2)))
    assert(hi2 > 0.0 && hi2 < 1.0, s"upper bound $hi2")
    intercept[IllegalArgumentException](
      StatOps.wilsonIntervals(rows.toDF("g", "s"), col("g"), col("s"),
        z = 0.0))
  }

  test("cohensKappa: hand confusion matrix, degenerate and disjoint labels") {
    // (x,x)×20 (y,y)×10 (x,y)×5 (y,x)×5: n=40, agree=30, po=0.75;
    // margins 25/15 both sides → e=850, pe=850/1600=0.5313;
    // κ=(1200−850)/(1600−850)=0.4667
    val rows = Seq.fill(20)(("x", "x")) ++ Seq.fill(10)(("y", "y")) ++
      Seq.fill(5)(("x", "y")) ++ Seq.fill(5)(("y", "x"))
    val got = StatOps.cohensKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long, Double, Double, Option[Double])].collect().head
    assert(got === ((40L, 2L, 30L, 0.75, 0.5313, Some(0.4667))))
    // every rating identical: pe = 1 → κ undefined, not a crash
    val const = StatOps.cohensKappa(
      Seq.fill(5)(("z", "z")).toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long, Double, Double, Option[Double])].collect().head
    assert(const === ((5L, 1L, 5L, 1.0, 1.0, None)))
    // disjoint label sets: zero agreement, zero chance agreement → κ=0
    val disj = StatOps.cohensKappa(
      Seq.fill(4)(("a", "b")).toDF("a", "b"), col("a"), col("b"))
      .as[(Long, Long, Long, Double, Double, Option[Double])].collect().head
    assert(disj === ((4L, 2L, 0L, 0.0, 0.0, Some(0.0))))
  }

  test("brierDecomposition: perfect and constant forecasters, Murphy identity") {
    // perfect forecaster: brier 0, REL 0, RES = UNC = 0.25 (10+10 rows)
    val perfect = (1L to 10L).map(_ => (1, 1000000L)) ++
      (1L to 10L).map(_ => (0, 0L))
    val p = StatOps.brierDecomposition(perfect.toDF("y", "sm"),
      col("y") === 1, col("sm"), bins = 10)
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(p === ((20L, 10L, 0.0, 0.0, 0.25, 0.25)))
    // constant 0.5 forecaster: brier 0.25 = 0 − 0 + 0.25
    val flat = (1L to 10L).map(_ => (1, 500000L)) ++
      (1L to 10L).map(_ => (0, 500000L))
    val f = StatOps.brierDecomposition(flat.toDF("y", "sm"),
      col("y") === 1, col("sm"), bins = 10)
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(f === ((20L, 10L, 0.25, 0.0, 0.0, 0.25)))
    // out-of-range score dies loudly (reliabilityBins' guard)
    val e = intercept[Exception] {
      StatOps.brierDecomposition(Seq((1, 2000000L)).toDF("y", "sm"),
        col("y") === 1, col("sm")).collect()
    }
    assert(messageOf(e).contains("outside [0, 1e6]"), messageOf(e))
  }

  test("bootstrapMeanCi: NEGATIVE keys participate in replicates (pmod wheel)") {
    // Signed ids: under % the hash of a negative key is negative, the
    // >= 2^31 test never passes, and those rows silently vanish from
    // every replicate. pmod folds them onto the wheel — replay it.
    val reps = 20
    val rows = (-50L to 50L).filter(_ != 0L).map(k => ("g", k, k + 100L))
    val got = StatOps.bootstrapMeanCi(rows.toDF("g", "k", "v"),
      col("g"), col("k"), col("v"), reps = reps)
      .as[(String, Long, Double, Option[Double], Option[Double], Long)]
      .collect().head
    // every replicate must draw SOME negative key: replay membership
    val anyNeg = (0 until reps).exists { b =>
      (-50L to -1L).exists { k =>
        Math.floorMod((k * reps + b) * 2654435761L, 4294967296L) >= 2147483648L
      }
    }
    assert(anyNeg, "test construction: negatives should be drawable")
    assert(got._6 === reps.toLong, s"expected $reps replicates, got ${got._6}")
    // replay one replicate's mean exactly
    val b0 = rows.filter { case (_, k, _) =>
      Math.floorMod((k * reps + 0L) * 2654435761L, 4294967296L) >= 2147483648L }
    assert(b0.exists(_._2 < 0L),
      "replicate 0 should include a negative key under pmod")
  }

  test("bootstrapMeanCi: matches a driver-side replay of the hash draw") {
    // 200 rows, one group, value == key cents. Replay the EXACT membership
    // function and rank picks in plain Scala; the engine must agree on
    // every field — no tolerance, the draw is deterministic by design.
    val reps = 20
    val rows = (1L to 200L).map(k => ("w1", k, k))
    val df = rows.toDF("g", "k", "v")
    val got = StatOps.bootstrapMeanCi(df, col("g"), col("k"), col("v"),
      reps = reps).as[(String, Long, Double, Option[Double],
        Option[Double], Long)].collect().head
    val means = (0 until reps).flatMap { b =>
      val in = rows.map(_._2)
        .filter(k => ((k * reps + b) * 2654435761L) % 4294967296L >= 2147483648L)
      if (in.isEmpty) None
      else Some((in.sum.toDouble / in.size, b))
    }.sorted
    def rnd(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val lo = means(math.max(1, math.ceil(0.05 * means.size).toInt) - 1)._1
    val hi = means(math.ceil(0.95 * means.size).toInt - 1)._1
    assert(got === (("w1", 200L, rnd(100.5 / 100.0),
      Some(rnd(lo / 100.0)), Some(rnd(hi / 100.0)), means.size.toLong)))
    // the band is a real interval around the mean on this symmetric data
    assert(got._4.get < got._3 && got._3 < got._5.get)
  }

  test("spearman: monotone nonlinear hits ±1; Pearson on the same data does not") {
    val cubic = Seq((1L, 1L), (2L, 8L), (3L, 27L), (4L, 64L), (5L, 125L))
      .toDF("x", "y")
    val up = StatOps.spearman(cubic, col("x"), col("y"))
      .as[(Long, Option[Double])].collect().head
    assert(up === ((5L, Some(1.0))))
    val down = StatOps.spearman(cubic.select(col("x"), (-col("y")).as("y")),
      col("x"), col("y")).as[(Long, Option[Double])].collect().head
    assert(down._2.get <= -0.9999)
    // Pearson on the cubic is strictly below 1 — the monotone blind spot
    // spearman exists to cover.
    val p = StatOps.bivariateStats(cubic.withColumn("g", lit("a")),
      col("g"), col("x"), col("y")).select("pearson_r")
      .as[Option[Double]].collect().head.get
    assert(p < 1.0 && p > 0.9)
  }

  test("spearman: tie midranks match the hand-computed textbook value") {
    // (x,y): (1,2),(1,4),(2,6),(3,6),(3,1) — x midranks (1.5,1.5,3,4.5,4.5),
    // y midranks (2,3,4.5,4.5,1). Grid p = r2·1000 exactly (n=5 divides),
    // so grid rho == exact tie-aware Spearman = 15/√(180·190) ≈ 0.0811.
    val df = Seq((1L, 2L), (1L, 4L), (2L, 6L), (3L, 6L), (3L, 1L)).toDF("x", "y")
    val out = StatOps.spearman(df, col("x"), col("y"))
      .as[(Long, Option[Double])].collect().head
    assert(out === ((5L, Some(0.0811))))
  }

  test("spearman: constant column yields null rho; nulls drop before ranking") {
    val df = Seq((Some(1L), Some(7L)), (Some(2L), Some(7L)),
      (Some(3L), Some(7L)), (None, Some(9L)), (Some(4L), None)).toDF("x", "y")
    val out = StatOps.spearman(df, col("x"), col("y"))
      .as[(Long, Option[Double])].collect().head
    assert(out === ((3L, None)))
  }

  private def na(rows: Seq[(Long, String, String)], horizon: Int = 3) =
    StatOps.naHazard(rows.toDF("u", "ts", "et"), col("u"),
      to_timestamp(col("ts")), col("et") === "purchase", horizon)
      .orderBy("t_days")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq

  test("naHazard: hand-computed hazard increments and cumulative sum") {
    def user(u: Long, buyDay: Option[Int]) =
      (u, "2024-01-01 00:00:00", "view") +: buyDay.toSeq.map(k =>
        (u, f"2024-01-0${k + 1}%d 00:00:00", "purchase"))
    val rows = user(1, Some(1)) ++ user(2, Some(2)) ++ user(3, Some(5)) ++
      user(4, Some(2)) ++ user(5, None)
    // durations: t=1 (n_at=1, d=1), t=2 (n_at=2, d=2), t=3 censored
    // (n_at=2, d=0). Risk sets 5/4/2; h_inc = d·1e6 div n_risk:
    // 200000 then 500000; cum 200000, 700000; censored row filtered.
    // exp(-0.2)=0.8187, exp(-0.7)=0.4966 (4-dp floor-rounded).
    assert(na(rows) === Seq(
      (1L, 5L, 1L, 200000L, 200000L, 0.8187),
      (2L, 4L, 2L, 500000L, 700000L, 0.4966)))
  }

  test("naHazard: exhausted risk set yields finite hazard (KM pins zero)") {
    val rows = Seq((1L, "2024-01-01 00:00:00", "purchase"),
      (2L, "2024-01-01 00:00:00", "view"),
      (2L, "2024-01-02 00:00:00", "purchase"))
    // t=0: n=2 d=1 → h=500000; t=1: n=1 d=1 → h=1000000, cum 1500000.
    // Unlike the product limit, NA stays positive when the risk set
    // empties — exp(-1.5)=0.2231 — the documented divergence of the two.
    assert(na(rows) === Seq(
      (0L, 2L, 1L, 500000L, 500000L, 0.6065),
      (1L, 1L, 1L, 1000000L, 1500000L, 0.2231)))
  }

  private val relCols = Seq("bin", "n", "pos", "mean_pred_micro",
    "frac_pos_micro", "gap_micro")

  test("reliabilityBins: hand-computed deciles, truncating arithmetic") {
    val df = Seq((250000L, true), (250000L, false), (1000000L, true),
      (999999L, true)).toDF("s", "y")
    val out = StatOps.reliabilityBins(df, col("y"), col("s"), bins = 10)
      .orderBy("bin").as[(Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    // bin 2: n=2 pos=1 ssum=500000 → mean 250000, frac 500000, gap -250000
    // bin 9 (1e6 clamps into the top bin): n=2 pos=2 ssum=1999999 →
    // mean 999999, frac 1000000, gap -1
    assert(out === Seq(
      (2L, 2L, 1L, 250000L, 500000L, -250000L),
      (9L, 2L, 2L, 999999L, 1000000L, -1L)))
  }

  test("reliabilityBins: out-of-range score fails loudly") {
    val df = Seq((1000001L, true)).toDF("s", "y")
    val e = intercept[Exception] {
      StatOps.reliabilityBins(df, col("y"), col("s")).collect()
    }
    assert(e.getMessage.contains("outside [0, 1e6]"))
  }

  private def lr(rows: Seq[(Long, String, String, String)]) =
    StatOps.logRank(rows.toDF("u", "ts", "et", "arm"), col("u"),
      to_timestamp(col("ts")), col("et") === "purchase", col("arm"),
      horizonDays = 3)
      .as[(String, String, Long, Long, Long, Long, Long, Long,
           Option[Double], Option[Double])].collect().toSeq

  test("logRank: hand-computed O-E, variance, z on two small arms") {
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", "view", "a"),
      (1L, "2024-01-02 00:00:00", "purchase", "a"),
      (2L, "2024-01-01 00:00:00", "view", "a"),       // censored at 3
      (3L, "2024-01-01 00:00:00", "view", "b"),
      (3L, "2024-01-02 00:00:00", "purchase", "b"),
      (4L, "2024-01-01 00:00:00", "view", "b"),
      (4L, "2024-01-03 00:00:00", "purchase", "b"))
    // t=1: n1=2 n2=2 d1=d2=1 → e1=1000000, b=500000, v=(500000·2)//3=333333
    // t=2: n1=1 n2=1 d2=1 → e1=500000, b=250000, v=250000
    // O=1, E=1.5, V=0.583333 → z=-0.5/√0.583333=-0.6547, chi2=0.4286
    assert(lr(rows) === Seq(("a", "b", 2L, 2L, 2L, 1L, 1500000L, 583333L,
      Some(-0.6547), Some(0.4286))))
  }

  test("logRank: identical arms give z near zero; != 2 arms fails loudly") {
    val sym = Seq(
      (1L, "2024-01-01 00:00:00", "view", "a"),
      (1L, "2024-01-02 00:00:00", "purchase", "a"),
      (2L, "2024-01-01 00:00:00", "view", "a"),      // censored
      (3L, "2024-01-01 00:00:00", "view", "b"),
      (3L, "2024-01-02 00:00:00", "purchase", "b"),
      (4L, "2024-01-01 00:00:00", "view", "b"))      // censored
    // one event time t=1: n1=n2=2, d1=d2=1 → e1=1000000 so O−E=0
    // exactly; b=500000, v=(500000·(4−2))//3=333333
    assert(lr(sym) === Seq(("a", "b", 2L, 2L, 1L, 1L, 1000000L, 333333L,
      Some(0.0), Some(0.0))))
    val three = Seq(
      (1L, "2024-01-01 00:00:00", "purchase", "a"),
      (2L, "2024-01-01 00:00:00", "purchase", "b"),
      (3L, "2024-01-01 00:00:00", "purchase", "c"))
    val e = intercept[Exception] { lr(three) }
    assert(e.getMessage.contains("expected exactly 2 arms"))
  }

  test("robustMeans: 20% cuts drop the outlier; winsor clamps it") {
    val df = (Seq(1L, 2L, 3L, 4L, 100L).map(("a", _)) ++
      Seq(("b", 7L))).toDF("g", "v")
    val got = StatOps.robustMeans(df, col("g"), col("v"),
      loBp = 2000, hiBp = 2000).orderBy("key")
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    // a: n=5, k=1 each side → trimmed {2,3,4} = 3.0; winsor clamps
    // 1→2 and 100→4 → (2+3+4+2+4)/5 = 3.0; raw mean 22.0.
    // b: n=1, k=0 → all three means are the value.
    assert(got === Seq(
      ("a", 5L, 1L, 1L, 22.0, 3.0, 3.0),
      ("b", 1L, 0L, 0L, 7.0, 7.0, 7.0)))
  }

  test("robustMeans: ties at the cut are count-exact, not value-exact") {
    // six 5s and two 50s at 25% high trim: k_hi = 2 → BOTH 50s drop
    // regardless of tie ordering; k_lo = 8·0//10⁴ = 0.
    val df = (Seq.fill(6)(5L) ++ Seq(50L, 50L)).map(("g", _)).toDF("g", "v")
    val got = StatOps.robustMeans(df, col("g"), col("v"),
      loBp = 0, hiBp = 2500)
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().head
    // mean 130/8 = 16.25; trimmed 30/6 = 5.0; winsor clamps the two
    // dropped rows to the surviving boundary 5 → 40/8 = 5.0
    assert(got === (("g", 8L, 0L, 2L, 16.25, 5.0, 5.0)))
  }

  test("targetEncoding: shrinkage toward the global mean, exact complement") {
    val rows = Seq(("A", 10L), ("A", 30L), ("B", 100L)).toDF("c", "y")
    val got = StatOps.targetEncoding(rows, col("c"), col("y"), m = 2L)
      .orderBy("category")
      .as[(String, Long, Long, Double, Option[Double])].collect().toSeq
    // global mean 140/3; A: (40*3 + 2*140)/(3*4) = 400/12 = 33.3333
    // (raw 20 pulled toward 46.67); B: (100*3 + 280)/(3*3) = 64.4444
    // (raw 100 shrunk hard — n=1 vs m=2). Complements exact.
    assert(got === Seq(
      ("A", 2L, 40L, 33.3333, Some(100.0)),
      ("B", 1L, 100L, 64.4444, Some(20.0))))
    // single-category frame: complement undefined, never 0/0
    val one = StatOps.targetEncoding(
      Seq(("X", 5L), ("X", 7L)).toDF("c", "y"), col("c"), col("y"), 2L)
      .as[(String, Long, Long, Double, Option[Double])].collect().head
    assert(one._5.isEmpty && one._4 === 6.0)
  }

  test("neymanAllocation: weights n*sd, largest-remainder shares sum to budget") {
    val rows = Seq(("A", 0L), ("A", 20L), ("B", 5L), ("B", 5L),
      ("C", 0L), ("C", 0L), ("C", 20L), ("C", 20L)).toDF("s", "v")
    val got = StatOps.neymanAllocation(rows, col("s"), col("v"),
      budget = 7L).orderBy("stratum")
      .as[(String, Long, Double, Long, Long)].collect().toSeq
    // A: n=2 sd=10 w=20; B: zero-variance w=0; C: n=4 sd=10 w=40; W=60.
    // floors 2/0/4 leave one unit; C holds the largest remainder (40)
    assert(got === Seq(("A", 2L, 10.0, 20L, 2L), ("B", 2L, 0.0, 0L, 0L),
      ("C", 4L, 10.0, 40L, 5L)))
    assert(got.map(_._5).sum === 7L)
    intercept[IllegalArgumentException](
      StatOps.neymanAllocation(rows, col("s"), col("v"), budget = 0L))
  }

  test("didEstimate: four hand cells, one interaction") {
    val rows = Seq(
      (true, false, 100L), (true, false, 200L), (true, true, 400L),
      (false, false, 100L), (false, true, 200L))
      .toDF("t", "p", "cents")
    val got = StatOps.didEstimate(rows, col("t"), col("p"), col("cents"))
      .as[(Long, Double, Long, Double, Long, Double, Long, Double, Double)]
      .collect().head
    // treated 1.5 -> 4.0 (+2.5), control 1.0 -> 2.0 (+1.0) => DID 1.5
    assert(got === ((2L, 1.5, 1L, 4.0, 1L, 1.0, 1L, 2.0, 1.5)))
  }

  test("cupedAdjusted: perfectly-correlated covariate removes all variance") {
    val rows = Seq((1L, 100L, 200L), (2L, 200L, 400L), (3L, 300L, 600L))
      .toDF("u", "x", "y")
    val got = StatOps.cupedAdjusted(rows, col("u"), col("x"), col("y"))
      .as[(Long, Option[Double], Double, Option[Double], Option[Double])]
      .collect().head
    // y = 2x exactly: theta 2, var_y 26666.6667 (the metric's own
    // units^2), adjusted variance collapses to 0, reduction 1
    assert(got === ((3L, Some(2.0), 26666.6667, Some(0.0), Some(1.0))))
    // constant covariate -> var(x)=0 -> loud nulls, never division blowup
    val flat = StatOps.cupedAdjusted(
      Seq((1L, 5L, 10L), (2L, 5L, 30L)).toDF("u", "x", "y"),
      col("u"), col("x"), col("y"))
      .as[(Long, Option[Double], Double, Option[Double], Option[Double])]
      .collect().head
    assert(flat._2.isEmpty && flat._4.isEmpty && flat._5.isEmpty)
  }
}
