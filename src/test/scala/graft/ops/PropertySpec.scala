package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property-based tests (SURVEY.md §5.2): algebraic invariants of the
  * operator library over generated inputs. Spark jobs are expensive, so
  * properties run with a reduced case count but unconstrained shapes.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic sampler (the scalatest-scalacheck bridge isn't in the
    * offline cache): N generated cases per property from a fixed seed.
    */
  private def forAllSampled[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => body(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced == n, s"generator too sparse: $produced/$n")
  }

  private val seriesGen: Gen[List[Long]] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, Gen.choose(0L, 1000L)))

  test("property: rolling sum equals sliding slice sums (min_periods=1)") {
    forAllSampled(Gen.zip(seriesGen, Gen.choose(1, 8))) { case (xs, w) =>
      val dense = xs.zipWithIndex.map { case (v, i) =>
        (new java.sql.Timestamp(ts("2024-01-01 00:00:00").getTime
          + i.toLong * 7 * 86400 * 1000), "g", v, Option.empty[Double])
      }.toDF("week", "dim", "transactions", "price_mean")
      val got = Rolling.rollingWindows(dense, Seq(w))
        .orderBy("week").select("rolling_trans").as[Long].collect().toList
      val want = xs.indices.map(i =>
        xs.slice(math.max(0, i - w + 1), i + 1).sum).toList
      assert(got == want)
    }
  }

  test("property: z-scores of a constant series are all zero") {
    forAllSampled(Gen.zip(Gen.choose(1, 20), Gen.choose(0L, 500L))) { case (n, v) =>
      val wins = (0 until n).map(i =>
        (new java.sql.Timestamp(ts("2024-01-01 00:00:00").getTime
          + i.toLong * 7 * 86400 * 1000), "g", v, v))
        .toDF("week", "dim", "transactions", "rolling_trans")
      val zs = Anomaly.detectAnomalies(wins)
        .select("z_transactions", "z_rolling_trans")
        .as[(Double, Double)].collect()
      assert(zs.forall(z => z._1 == 0.0 && z._2 == 0.0))
    }
  }

  test("property: densification preserves total transactions and covers the full grid") {
    val rowGen = for {
      wk <- Gen.choose(0, 30)
      dim <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0L, 100L)
    } yield (wk, dim, t)
    forAllSampled(Gen.nonEmptyListOf(rowGen)) { rows =>
      val weekly = rows.groupBy(r => (r._1, r._2)).toList.map { case ((wk, d), rs) =>
        (new java.sql.Timestamp(ts("2024-01-01 00:00:00").getTime
          + wk.toLong * 7 * 86400 * 1000), d, rs.map(_._3).sum, Option.empty[Double])
      }.toDF("week", "dim", "transactions", "price_mean")
      val dense = Densify.densify(weekly, Seq("transactions"))
      val (wMin, wMax) = (rows.map(_._1).min, rows.map(_._1).max)
      val nWeeks = wMax - wMin + 1
      val nDims = rows.map(_._2).distinct.size
      assert(dense.count() == nWeeks.toLong * nDims)
      assert(dense.agg(sum("transactions")).as[Long].collect().head ==
        rows.map(_._3).sum)
    }
  }

  test("property: key normalization is idempotent and whitespace-insensitive") {
    val strGen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\t')))
      .map(_.mkString)
    forAllSampled(strGen) { s =>
      val df = Seq(s).toDF("x")
      val once = df.select(CoreOps.normalizeKey($"x").as("k")).as[String].collect().head
      val twice = df.select(CoreOps.normalizeKey(CoreOps.normalizeKey($"x")).as("k"))
        .as[String].collect().head
      assert(once == twice)
      assert(!once.exists(_.isWhitespace))
      val spaced = df.select(CoreOps.normalizeKey(concat(lit(" "), $"x", lit("\t")))
        .as("k")).as[String].collect().head
      assert(spaced == once)
    }
  }

  test("property: fingerprint detects any transposition of distinct adjacent tokens") {
    val tokGen = Gen.choose(2, 12).flatMap(n =>
      Gen.listOfN(n, Gen.choose('a', 'z').map(_.toString)))
    forAllSampled(Gen.zip(tokGen, Gen.choose(0, 10))) { case (toks, posRaw) =>
      val i = posRaw % (toks.length - 1)
      if (toks(i) != toks(i + 1)) {
        val swapped = toks.updated(i, toks(i + 1)).updated(i + 1, toks(i))
        val df = Seq((1L, toks.mkString(" ")), (2L, swapped.mkString(" ")))
          .toDF("id", "text")
        val fp = graft.functions.TextFunctions.fingerprint(df, "id", "text")
          .as[(Long, Long)].collect().toMap
        assert(fp(1L) != fp(2L))
      }
    }
  }

  test("property: fused SimHash64/MinHashSignature match the composed forms on random text") {
    // The fused kernels' graded outputs are no_oracle (xxhash64), so
    // bit-identity to the composed built-in formulation is their
    // correctness contract — pushed here past the fixture corpus to
    // adversarial shapes: space runs, leading/trailing spaces, unicode,
    // punctuation, empty strings. One DataFrame → one comparison job.
    val charGen = Gen.frequency(
      6 -> Gen.alphaNumChar, 3 -> Gen.const(' '),
      1 -> Gen.oneOf('é', '東', 'ü', '!', '.', ','))
    val strGen = Gen.listOf(charGen).map(_.mkString)
    val strs = scala.collection.mutable.ListBuffer.empty[String]
    forAllSampled(strGen, n = 60)(strs += _)
    val df = (strs.toSeq :+ "").toDF("text")
    assert(df.select(Dedup.simhash64("text").as("f"),
        Dedup.simhash64Composed("text").as("r"))
      .where($"f" =!= $"r").count() == 0)
    for ((k, sh) <- Seq((16, 1), (8, 3))) {
      assert(df.select(Dedup.minhashSignature("text", k, sh).as("f"),
          Dedup.minhashSignatureComposed("text", k, sh).as("r"))
        .where($"f" =!= $"r").count() == 0, s"k=$k shingleSize=$sh")
    }
  }

  test("property: assignSplit is a partition — every key exactly one split") {
    val keysGen = Gen.choose(5, 60).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100000L, 100000L)).map(_.distinct))
    forAllSampled(keysGen, n = 6) { keys =>
      val df = keys.toDF("k")
      val s = CorpusOps.assignSplit(df, "k", Seq("a" -> 25, "b" -> 25, "c" -> 50))
      assert(s.count() == keys.length)            // no row lost or duplicated
      assert(s.where(col("split").isNull).count() == 0)
      // determinism: a second independent evaluation agrees row-for-row
      val t = CorpusOps.assignSplit(df, "k", Seq("a" -> 25, "b" -> 25, "c" -> 50))
      assert(s.as("s").join(t.as("t"), "k")
        .where(col("s.split") =!= col("t.split")).count() == 0)
    }
  }

  test("property: packSequences reconstructs positions — offsets < budget, cum consistent") {
    val docsGen = for {
      n <- Gen.choose(1, 30)
      shards <- Gen.listOfN(n, Gen.oneOf("s1", "s2"))
      toks <- Gen.listOfN(n, Gen.choose(1L, 700L))
      budget <- Gen.choose(64, 1024)
    } yield (shards.zip(toks).zipWithIndex, budget)
    forAllSampled(docsGen, n = 6) { case (rows, budget) =>
      val df = rows.map { case ((sh, nt), i) => (i.toLong, sh, nt) }
        .toDF("doc_id", "shard", "nt")
      val packed = CorpusOps.packSequences(df, "doc_id", "shard", col("nt"), budget)
        .orderBy("doc_id")
        .select("doc_id", "shard", "n_tokens", "pack_id", "pack_offset")
        .as[(Long, String, Long, Long, Long)].collect()
      // replay the packing sequentially per shard
      val cum = scala.collection.mutable.Map.empty[String, Long]
      packed.foreach { case (_, sh, nt, packId, off) =>
        val pos = cum.getOrElse(sh, 0L)
        assert(packId == pos / budget)
        assert(off == pos % budget && off >= 0 && off < budget)
        cum(sh) = pos + nt
      }
    }
  }
}
