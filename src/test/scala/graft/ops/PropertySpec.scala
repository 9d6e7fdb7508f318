package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.functions.TextFunctions

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

  test("property: packSequencesBfd is a valid packing and never beats OPT's floor or loses to next-fit") {
    // random (length, id) multisets: (a) every doc placed exactly once;
    // (b) no bin overflows; (c) bins tile contiguously from offset 0;
    // (d) bin count >= ceil(total/budget) (the LP floor);
    // (e) bin count <= next-fit's (the graded bfd_no_worse contract).
    val itemsGen = Gen.choose(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1L, 100L)))
    forAllSampled(Gen.zip(itemsGen, Gen.choose(40, 120)), n = 6) {
      case (lens, budget) =>
        val df = lens.zipWithIndex.map { case (l, i) => (i.toLong, "s", l) }
          .toDF("id", "src", "nt")
        val bfd = CorpusOps.packSequencesBfd(df, "id", "src", col("nt"),
          budget)
          .select("id", "n_tokens", "bin_id", "bin_offset")
          .as[(Long, Long, Long, Long)].collect().toSeq
        assert(bfd.map(_._1).sorted == lens.indices.map(_.toLong))
        val byBin = bfd.groupBy(_._3)
        byBin.values.foreach { rows =>
          assert(rows.map(_._2).sum <= budget)
          assert(rows.map(r => r._4 + r._2).max == rows.map(_._2).sum)
          assert(rows.map(_._4).min == 0L)
        }
        val total = bfd.map(_._2).sum
        val nBins = byBin.size.toLong
        assert(byBin.keySet == (0L until nBins).toSet)
        assert(nBins >= (total + budget - 1) / budget)
        val nfBins = CorpusOps.packSequencesNextFit(df, "id", "src",
          col("nt"), budget)
          .agg(max("bin_id")).as[Long].collect().head + 1
        assert(nBins <= nfBins, s"BFD $nBins bins vs next-fit $nfBins")
    }
  }

  test("property: temperatureMixture rates are valid and the realized draw is rate-monotone") {
    // random per-source counts: rates in (0, 1e6]; the clamped tail is
    // taken whole; every sampled id would also be sampled at any higher
    // targetFrac (the md5 draw's monotonicity, per source).
    val cntGen = Gen.choose(2, 5).flatMap(k =>
      Gen.listOfN(k, Gen.choose(1, 60)))
    forAllSampled(cntGen, n = 6) { counts =>
      val rows = counts.zipWithIndex.flatMap { case (n, s) =>
        (0 until n).map(i => ((s * 1000 + i).toLong, s"src$s"))
      }.toDF("id", "src")
      val lo = CorpusOps.temperatureMixture(rows, "id", "src", 0.3)
        .select("source", "n_docs", "rate_micro", "n_sampled")
        .as[(String, Long, Long, Long)].collect()
      val hi = CorpusOps.temperatureMixture(rows, "id", "src", 0.9)
        .select("source", "rate_micro", "n_sampled")
        .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
      lo.foreach { case (src, nDocs, rate, sampled) =>
        assert(rate > 0L && rate <= 1000000L)
        assert(sampled <= nDocs)
        if (rate == 1000000L) assert(sampled == nDocs)
        // monotone: the higher budget samples at least as much per source
        assert(hi(src)._2 >= rate)
        assert(hi(src)._3 >= sampled)
      }
    }
  }

  test("property: ngramSet grams are exactly the distinct contiguous n-windows") {
    val tokGen = for {
      n <- Gen.choose(0, 12)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
    } yield toks
    forAllSampled(Gen.zip(Gen.nonEmptyListOf(tokGen), Gen.choose(1, 4)), n = 6) {
      case (docs, n) =>
        val df = docs.zipWithIndex
          .map { case (t, i) => (i.toLong, t.mkString(" ")) }.toDF("id", "text")
        val got = CorpusOps.ngramSet(df, "id", "text", n)
          .as[(Long, String)].collect().toSet
        val want = docs.zipWithIndex.flatMap { case (t, i) =>
          // tokens() splits the joined text, so an empty doc is [""] — one
          // token — exactly like the operator sees it
          val toks = t.mkString(" ").split(" ", -1).toSeq
          toks.sliding(n).filter(_.size == n)
            .map(w => (i.toLong, w.mkString(" "))).toSet
        }.toSet
        assert(got == want, s"n=$n docs=$docs")
    }
  }

  test("property: piiScrub is idempotent and removes every counted match") {
    // placeholders contain no digits or '@', so a second scrub pass finds
    // nothing — and after scrubbing, every category counts zero
    val piiGen = Gen.oneOf(
      "bob@corp.example.org", "10.2.30.4", "+49 170 5551234")
    val wordGen = Gen.oneOf("alpha", "beta", "42", "x.y", "-")
    val textGen = Gen.listOf(Gen.frequency(4 -> wordGen, 1 -> piiGen))
      .map(_.mkString(" "))
    val texts = scala.collection.mutable.ListBuffer.empty[String]
    forAllSampled(textGen, n = 40)(texts += _)
    val df = texts.toSeq.toDF("text")
    val once = df.select(TextFunctions.piiScrub($"text").as("text"))
    assert(once.select(
        TextFunctions.piiCount($"text", "email").as("e"),
        TextFunctions.piiCount($"text", "ipv4").as("i"),
        TextFunctions.piiCount($"text", "phone").as("p"))
      .where($"e" > 0 || $"i" > 0 || $"p" > 0).count() == 0)
    val twice = once.select(TextFunctions.piiScrub($"text").as("text"))
    assert(once.collect().map(_.getString(0)).toSeq ==
      twice.collect().map(_.getString(0)).toSeq)
  }

  test("property: funnel stage counts are monotone non-increasing") {
    val evGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1L, 6L), Gen.oneOf("signup", "click", "purchase", "view"),
      Gen.choose(0L, 100L)))
    forAllSampled(evGen, n = 6) { evs =>
      val df = evs.map { case (u, t, off) =>
        (u, t, new java.sql.Timestamp(
          ts("2024-01-01 00:00:00").getTime + off * 3600 * 1000))
      }.toDF("user_id", "event_type", "ts")
      val r = EventAnalytics.funnelSummary(df, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase")).head()
      val (n0, n1, n2) = (r.getAs[Long]("n_stage_0"),
        r.getAs[Long]("n_stage_1"), r.getAs[Long]("n_stage_2"))
      assert(n0 >= n1 && n1 >= n2, s"funnel not monotone: $n0 $n1 $n2")
      // an all-zero head stage must yield null conversions, not a crash
      if (n0 == 0) assert(r.isNullAt(r.fieldIndex("conv_1")))
    }
  }

  test("property: cohort offset-0 counts partition the user population") {
    val evGen = Gen.nonEmptyListOf(Gen.zip(
      Gen.choose(1L, 8L), Gen.choose(0L, 40L)))
    forAllSampled(evGen, n = 6) { evs =>
      val df = evs.map { case (u, d) =>
        (u, "view", new java.sql.Timestamp(
          ts("2024-01-01 00:00:00").getTime + d * 86400 * 1000))
      }.toDF("user_id", "event_type", "ts")
      val rows = EventAnalytics.cohortRetention(df, "user_id", "ts").collect()
      // every user contributes exactly once at their cohort's offset 0
      val atZero = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
      assert(atZero == evs.map(_._1).distinct.size)
      // no later offset of a cohort can exceed its size
      val size0 = rows.filter(_.getLong(1) == 0L)
        .map(r => r.getTimestamp(0) -> r.getLong(2)).toMap
      rows.foreach { r =>
        assert(r.getLong(2) <= size0(r.getTimestamp(0)),
          s"offset ${r.getLong(1)} larger than cohort")
      }
    }
  }

  test("property: dropDuplicateChunks is idempotent and keeps one copy per distinct chunk") {
    val tokGen = Gen.oneOf("a", "b", "c", "d")
    val docGen = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, tokGen))
    forAllSampled(Gen.nonEmptyListOf(docGen), n = 6) { docs =>
      val df = docs.zipWithIndex
        .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
        .toDF("doc_id", "text")
      val once = CorpusOps.dropDuplicateChunks(df, "doc_id", "text", 2)
      // surviving chunk count == distinct chunk count of the input
      val distinctChunks = CorpusOps
        .chunkDocuments(df, "doc_id", "text", 2, 2)
        .select("chunk_text").distinct().count()
      assert(once.agg(sum("n_chunks_kept")).head().getLong(0) == distinctChunks)
      // second pass changes nothing: all surviving chunks are unique
      val twice = CorpusOps.dropDuplicateChunks(
        once.select(col("doc_id"), col("text")), "doc_id", "text", 2)
      assert(twice.orderBy("doc_id").collect().toSeq ==
        once.select("doc_id", "n_chunks_kept", "text")
          .orderBy("doc_id").collect().toSeq)
    }
  }

  test("property: quantization error bound and sign preservation hold on random vectors") {
    val vecGen = Gen.choose(2, 16).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1000, 1000).map(_ / 250.0f)))
    forAllSampled(Gen.nonEmptyListOf(vecGen), n = 6) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val bad = df.select(
        EmbeddingOps.quantizeInt8(col("embedding")).as("q"),
        col("embedding"),
        EmbeddingOps.int8Scale(col("embedding")).as("s"))
        .where(expr("exists(zip_with(q, embedding, (qq, x) -> " +
          "abs(qq * s - cast(x as double)) > s / 2 + 1e-9 OR " +
          "(qq > 0 AND x < 0) OR (qq < 0 AND x > 0)), p -> p)"))
        .count()
      assert(bad == 0L)
    }
  }

  test("property: decontaminate flags exactly the docs sharing a planted n-gram") {
    val fill = Gen.listOfN(6, Gen.oneOf("p", "q", "r", "s", "t", "u"))
    val docGen = Gen.zip(fill, Gen.oneOf(true, false))
    forAllSampled(Gen.nonEmptyListOf(docGen), n = 6) { docs =>
      val marker = "zz1 zz2 zz3" // never generated by `fill`
      val train = docs.zipWithIndex.map { case ((toks, planted), i) =>
        val text = if (planted) (toks.take(3) :+ marker) ++ toks.drop(3)
          else toks
        (i.toLong, text.mkString(" "))
      }.toDF("id", "text")
      val eval = Seq((100L, s"header $marker footer")).toDF("id", "text")
      val got = CorpusOps.decontaminate(train, eval, "id", "text", n = 3)
        .as[(Long, Long, Boolean)].collect()
        .map(r => r._1 -> r._3).toMap
      docs.zipWithIndex.foreach { case ((_, planted), i) =>
        assert(got(i.toLong) == planted, s"doc $i planted=$planted")
      }
    }
  }

  test("property: duplicatedSpans equals a naive sliding-window recount") {
    val docGen = Gen.choose(2, 8).flatMap(nd => Gen.listOfN(nd,
      Gen.choose(1, 12).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c")))))
    forAllSampled(Gen.zip(docGen, Gen.choose(2, 4)), n = 6) { case (docs, sn) =>
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = CorpusOps.duplicatedSpans(df, "doc_id", "text", sn)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      val spans = docs.zipWithIndex.flatMap { case (ws, i) =>
        ws.sliding(sn).filter(_.size == sn)
          .map(g => (i.toLong, g.mkString(" "))) }
      val tot = spans.groupBy(_._2).map { case (g, xs) => g -> xs.size }
      val want = docs.indices.map { i =>
        val mine = spans.filter(_._1 == i.toLong)
        (i.toLong, mine.size.toLong, mine.count(s => tot(s._2) > 1).toLong)
      }.toList
      assert(got == want)
    }
  }

  test("property: bm25TopK equals the naive formula on random corpora") {
    val docGen = Gen.choose(2, 10).flatMap(nd => Gen.listOfN(nd,
      Gen.choose(1, 15).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e")))))
    forAllSampled(docGen, n = 6) { docs =>
      val terms = Seq("a", "b")
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = CorpusOps.bm25TopK(df, "doc_id", "text", terms, k = 4)
        .orderBy("rnk").collect()
        .map(r => (r.getLong(0), r.getDouble(2), r.getLong(3))).toList
      // naive micro-unit recomputation with the operator's exact op order
      val nDocs = docs.size.toDouble
      val avgdl = docs.map(_.size.toLong).sum.toDouble / docs.size
      val dfT = terms.map(t =>
        t -> docs.count(_.contains(t)).toLong).toMap
      val su = docs.zipWithIndex.flatMap { case (ws, i) =>
        val dl = ws.size.toLong
        val micro = terms.flatMap { t =>
          val tf = ws.count(_ == t).toLong
          if (tf == 0) None else {
            val idf = math.log((nDocs - dfT(t) + 0.5) / (dfT(t) + 0.5) + 1)
            val raw = idf * (tf * (1.2 + 1)) /
              (tf + 1.2 * ((1 - 0.75) + 0.75 * dl / avgdl))
            Some(math.floor(raw * 1000000 + 0.5).toLong)
          }
        }
        if (micro.isEmpty) None else Some(i.toLong -> micro.sum)
      }
      val want = su.sortBy { case (id, s) => (-s, id) }.take(4)
        .zipWithIndex.map { case ((id, s), r) =>
          (id, math.floor(s / 1000000.0 * 10000 + 0.5) / 10000, r + 1L) }
        .toList
      assert(got == want)
    }
  }

  test("property: charTrigramNll equals a naive MLE refit") {
    val docGen = Gen.choose(2, 8).flatMap(nd => Gen.listOfN(nd,
      Gen.choose(0, 10).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))).map(_.mkString)))
    forAllSampled(docGen, n = 6) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = CorpusOps.charTrigramNll(df, "doc_id", "text")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList
      val tris = docs.zipWithIndex.flatMap { case (t, i) =>
        t.sliding(3).filter(_.length == 3).map(g => (i.toLong, g)) }
      val ct = tris.groupBy(_._2).map { case (g, xs) => g -> xs.size.toLong }
      val cp = ct.groupBy(_._1.take(2)).map { case (p, xs) =>
        p -> xs.values.sum }
      val want = tris.groupBy(_._1).toList.sortBy(_._1).map { case (i, xs) =>
        val su = xs.map { case (_, g) =>
          math.floor(-math.log(ct(g).toDouble / cp(g.take(2))) * 1000000 + 0.5)
            .toLong
        }.sum
        (i, xs.size.toLong,
          math.floor(su / 1000000.0 / xs.size * 10000 + 0.5) / 10000)
      }
      assert(got == want)
    }
  }

  test("property: histogram quantiles equal sorted ceil-rank selection per group") {
    val rowGen = for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0L, 30L) // narrow domain → duplicates guaranteed
    } yield (g, v)
    forAllSampled(Gen.nonEmptyListOf(rowGen), n = 6) { rows =>
      val df = rows.toDF("g", "v")
      val qs = Seq(0.10, 0.50, 0.90)
      val got = ScaleOps.groupQuantilesByHistogram(df, Seq(col("g")),
        col("v"), qs).orderBy("g").collect()
        .map(r => (r.getString(0), r.getLong(1),
          (2 to 4).map(r.getLong).toList)).toList
      val want = rows.groupBy(_._1).toList.sortBy(_._1).map { case (g, xs) =>
        val sorted = xs.map(_._2).sorted
        val n = sorted.size
        (g, n.toLong,
          qs.map(q => sorted(math.ceil(q * n).toInt - 1)).toList)
      }
      assert(got == want)
    }
  }

  test("property: semanticDedupKeepFirst keeps exactly the lower-id-neighbor-free set") {
    val vecGen = Gen.choose(2, 12).flatMap(nv => Gen.listOfN(nv,
      Gen.listOfN(3, Gen.choose(-5, 5).map(_.toFloat))))
    forAllSampled(vecGen, n = 6) { vecs =>
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      val kept = graft.functions.Similarity
        .semanticDedupKeepFirst(df, "vec_id", "embedding", threshold = 0.9)
        .select("vec_id").as[Long].collect().toSet
      def cos(a: List[Float], b: List[Float]): Double = {
        val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        val na = a.map(x => x.toDouble * x.toDouble).sum
        val nb = b.map(x => x.toDouble * x.toDouble).sum
        math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 10000 + 0.5) / 10000
      }
      val want = vecs.indices.filter { j =>
        // NaN cosine (zero-norm side) compares false — the row is kept
        !(0 until j).exists(i => cos(vecs(i), vecs(j)) >= 0.9)
      }.map(_.toLong).toSet
      assert(kept == want)
    }
  }

  test("property: waterfilling sums to min(budget, availability), respects caps and saturation order") {
    // sources: (name, avail, weight); share in [1, 100]%
    val srcGen = for {
      n <- Gen.choose(1, 8)
      avails <- Gen.listOfN(n, Gen.choose(0L, 2000L))
      weights <- Gen.listOfN(n, Gen.choose(1L, 9L))
    } yield avails.zip(weights).zipWithIndex.map { case ((a, w), i) =>
      (s"s$i", a, w) }
    forAllSampled(Gen.zip(srcGen, Gen.choose(1L, 100L)), n = 6) {
      case (srcs, sharePct) =>
        val df = srcs.toDF("source", "n", "w")
        val out = CorpusOps.waterfillAllocation(df, "source", col("n"),
          col("w"), sharePct * 10000L)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getBoolean(4)))
        val totalAvail = srcs.map(_._2).sum
        val budget = totalAvail * (sharePct * 10000L) / 1000000L
        // every source appears exactly once
        assert(out.map(_._1).sorted.toSeq === srcs.map(_._1).sorted)
        // allocation never exceeds availability; saturated means exactly
        // the availability
        out.foreach { case (src, _, avail, alloc, sat) =>
          assert(alloc >= 0L && alloc <= avail, s"$src alloc $alloc/$avail")
          if (sat) assert(alloc === avail, s"$src saturated but alloc<avail")
        }
        // exact budget absorption: all of B when feasible, all of the
        // corpus when B exceeds it
        assert(out.map(_._4).sum === math.min(budget, totalAvail))
        // water-level consistency: no unsaturated source sits at a lower
        // availability-to-weight ratio than a saturated one (saturation
        // happens in ratio order)
        val satRatios = out.filter(_._5).map(r => (r._3.toDouble / r._2, r._1))
        val unsatRatios = out.filterNot(_._5).map(r => (r._3.toDouble / r._2, r._1))
        if (satRatios.nonEmpty && unsatRatios.nonEmpty) {
          val maxSat = satRatios.map(_._1).max
          val minUnsat = unsatRatios.map(_._1).min
          assert(maxSat <= minUnsat + 1e-9,
            s"saturation out of ratio order: $maxSat > $minUnsat")
        }
    }
  }

  test("property: AUC and KS are invariant under strictly monotone score maps") {
    // both statistics are rank-based: s → 3s + 17 must leave U2, the KS
    // numerator, and both sample sizes bit-identical — the invariant
    // that separates a rank statistic from a value statistic
    val gen = for {
      n <- Gen.choose(5, 60)
      rows <- Gen.listOfN(n, for {
        lbl <- Gen.oneOf(true, false)
        s <- Gen.choose(-50L, 50L)
      } yield (lbl, s))
    } yield rows
    forAllSampled(gen, n = 6) { rows =>
      val raw = rows.toDF("lbl", "s")
      val mapped = rows.map { case (l, s) => (l, 3 * s + 17) }.toDF("lbl", "s")
      def aucOf(df: org.apache.spark.sql.DataFrame) =
        StatOps.aucHistogram(df, col("lbl"), col("s"))
          .as[(Long, Long, Long, Option[Double])].collect().head
      def ksOf(df: org.apache.spark.sql.DataFrame) =
        StatOps.ksTest(df, col("lbl"), col("s"))
          .as[(Long, Long, Long, Option[Double])].collect().head
      assert(aucOf(raw) === aucOf(mapped))
      assert(ksOf(raw) === ksOf(mapped))
    }
  }

  test("property: mutual information is symmetric and bounded by joint entropy") {
    val gen = for {
      n <- Gen.choose(6, 50)
      rows <- Gen.listOfN(n, for {
        x <- Gen.oneOf("a", "b", "c")
        y <- Gen.oneOf("p", "q")
      } yield (x, y))
    } yield rows
    forAllSampled(gen, n = 6) { rows =>
      def miOf(df: org.apache.spark.sql.DataFrame) =
        StatOps.mutualInformation(df, col("x"), col("y"))
          .as[(Long, Long, Double, Double)].collect().head
      val xy = miOf(rows.toDF("x", "y"))
      val yx = miOf(rows.map(_.swap).toDF("x", "y"))
      // every per-cell term is symmetric in (x, y), so the micro sums
      // match EXACTLY, not approximately
      assert(xy === yx)
      // information-theoretic sanity (exact math allows tiny negative
      // MI only through per-term rounding; micro units bound that)
      assert(xy._2 >= -rows.size.toLong, xy.toString)
      assert(xy._3 <= xy._4 + 0.001, s"MI ${xy._3} > H_joint ${xy._4}")
    }
  }

  test("property: neymanAllocation sums to the budget; zero-spread strata get floor shares") {
    val gen = for {
      k <- Gen.choose(2, 5)
      strata <- Gen.listOfN(k, for {
        n <- Gen.choose(1, 8)
        vs <- Gen.listOfN(n, Gen.choose(0L, 500L))
      } yield vs)
      budget <- Gen.choose(1L, 200L)
    } yield (strata, budget)
    forAllSampled(gen, n = 6) { case (strata, budget) =>
      val rows = strata.zipWithIndex.flatMap { case (vs, i) =>
        vs.map(v => (s"s$i", v))
      }.toDF("s", "v")
      // all-zero-spread inputs divide by W=0 — the documented loud path;
      // only exercise the defined domain
      if (strata.exists(vs => vs.distinct.size > 1)) {
        val got = StatOps.neymanAllocation(rows, col("s"), col("v"), budget)
          .as[(String, Long, Double, Long, Long)].collect().toSeq
        assert(got.map(_._5).sum === budget,
          s"allocs ${got.map(_._5)} must sum to $budget")
        assert(got.forall(_._5 >= 0))
        // a zero-weight stratum can only win remainder units
        got.filter(_._4 == 0L).foreach(r => assert(r._5 <= 1L))
      }
    }
  }

  test("property: curationFunnel counts are monotone non-increasing down the funnel") {
    val gen = Gen.listOf(Gen.option(Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("abcdxy ".toSeq)).map(_.mkString))))
      .map(_.take(25))
    forAllSampled(gen, n = 6) { texts =>
      val rows = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t.orNull) }
      if (rows.nonEmpty) {
        val got = CorpusOps.curationFunnel(rows.toDF("doc_id", "text"),
          "doc_id", "text", minChars = 3, maxChars = 12)
          .orderBy("stage_idx")
          .as[(Long, String, Long, Option[Double])].collect().toSeq
        val counts = got.map(_._3)
        assert(counts.size === 4)
        counts.zip(counts.tail).foreach { case (a, b) =>
          assert(b <= a, s"funnel grew: $counts") }
        assert(counts.head === rows.size.toLong)
      }
    }
  }

  test("property: negativeEdges never emits an edge, a self-pair, or an unstable set") {
    val gen = for {
      n <- Gen.choose(3, 10)
      extra <- Gen.listOfN(6, Gen.zip(Gen.choose(1L, 10L), Gen.choose(1L, 10L)))
    } yield (n, extra.filter { case (a, b) => a != b })
    forAllSampled(gen, n = 5) { case (n, extra) =>
      val path = (1L until n.toLong).map(i => (i, i + 1))
      val edges = (path ++ extra).distinct
      if (edges.nonEmpty) {
        val e = edges.toDF("u", "v")
        val got = GraphOps.negativeEdges(e, perNode = 2)
          .as[(Long, Long, Long)].collect().toSeq
        val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toSet
        got.foreach { case (u, _, v) =>
          assert(u != v && !und((u, v)), s"($u,$v) is not a non-edge")
        }
        val again = GraphOps.negativeEdges(e.repartition(3), perNode = 2)
          .as[(Long, Long, Long)].collect().toSeq
        assert(again.sorted === got.sorted)
      }
    }
  }
}
