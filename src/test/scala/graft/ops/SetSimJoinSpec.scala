package graft.ops

import graft.SparkTestBase

class SetSimJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def jac(a: String, b: String): Double = {
    val (x, y) = (a.split(" ").toSet, b.split(" ").toSet)
    x.intersect(y).size.toDouble / x.union(y).size
  }

  private def brute(docs: Seq[(Long, String)], t: Double) =
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs
      if ia < ib && jac(ta, tb) >= t
    } yield (ia, ib)).toSet

  private def run(docs: Seq[(Long, String)], t: Double) =
    SetSimJoin.jaccardJoinExact(docs.toDF("doc_id", "text"), "doc_id", "text", t)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("hand case: near-identical pair found, disjoint pair not") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox leaps"),   // J = 4/6 with doc 1
      (3L, "completely different words here"))
    assert(run(docs, 0.6) === Set((1L, 2L)))
    assert(run(docs, 0.7) === Set.empty[(Long, Long)])
  }

  test("boundary: a pair landing exactly ON the threshold qualifies (>=)") {
    // J = 2/4 = 0.5 exactly
    val docs = Seq((1L, "a b c"), (2L, "a b d"))
    assert(jac(docs(0)._2, docs(1)._2) === 0.5)
    assert(run(docs, 0.5) === Set((1L, 2L)))
    assert(run(docs, 0.51) === Set.empty[(Long, Long)])
  }

  test("matches brute force on a stopword-heavy corpus at several thresholds") {
    // every doc shares the stopword spine; similarity is decided by the
    // rare tail — the exact regime the prefix filter targets
    val spine = "the of and to in"
    val docs = Seq.tabulate(40) { i =>
      val rare = Seq.tabulate(4)(k => s"w${(i * 7 + k * 13) % 23}").mkString(" ")
      (i.toLong, s"$spine $rare")
    }
    for (t <- Seq(0.5, 0.7, 0.9))
      assert(run(docs, t) === brute(docs, t), s"t=$t")
  }

  test("positional filter is lossless: randomized brute force, mixed sizes") {
    // Random docs of widely mixed lengths at thresholds including exact
    // fractions (a pair can land exactly ON t, exercising the epsilon
    // guard in the α bound) — any over-pruning by the positional filter
    // shows up as a missing pair vs brute force.
    val rng = new scala.util.Random(42)
    val vocab = Seq.tabulate(30)(i => s"v$i")
    val docs = Seq.tabulate(60) { i =>
      val n = 3 + rng.nextInt(8)
      (i.toLong, rng.shuffle(vocab).take(n).mkString(" "))
    }
    for (t <- Seq(0.3, 0.5, 2.0 / 3, 0.75, 0.95))
      assert(run(docs, t) === brute(docs, t), s"t=$t")
  }

  test("exact duplicates at threshold 1.0; reported counts are exact") {
    val docs = Seq((1L, "x y z"), (2L, "z y x"), (3L, "x y q"))
    val out = SetSimJoin.jaccardJoinExact(docs.toDF("doc_id", "text"),
      "doc_id", "text", 1.0)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 2L, 3L, 3L, 1.0)))
  }

  test("singleton-token docs: size filter prunes incompatible lengths safely") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "a b c d e f g h i j"))
    assert(run(docs, 0.9) === Set((1L, 2L)))
  }

  test("blocking columns: identical docs in different blocks never pair") {
    val docs = Seq(
      (1L, "x y z", "en"), (2L, "x y z", "en"), (3L, "x y z", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = SetSimJoin.jaccardJoinExact(docs, "doc_id", "text", 0.9,
      blocking = Seq("lang"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L)))
  }
}
