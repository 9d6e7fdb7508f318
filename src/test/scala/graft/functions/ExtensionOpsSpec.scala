package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.ops.Dedup

/** Semantics tests for the training-data extension tier — especially the
  * xxhash64-based operators that have no DuckDB oracle (SparkEntry notes).
  */
class ExtensionOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en"),
    (1L, "the quick brown fox jumps over the lazy cat", "en"),   // near-dup of 0
    (2L, "der schnelle braune fuchs und der faule hund ist da", "de"),
    (3L, "completely different words entirely unrelated content here", "en"),
    (4L, "the quick brown fox jumps over the lazy dog", "en"))   // exact dup of 0
    .toDF("doc_id", "text", "lang")

  test("exactGroups finds the exact duplicate, keeps min id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
    assert(g.count() == 4)
    val dup = g.where($"n_copies" === 2).collect()
    assert(dup.length == 1 && dup.head.getAs[Long]("keep_id") == 0L)
    assert(Dedup.dropExact(docs, "doc_id", "text").count() == 4)
  }

  test("dropExactIncremental: seen content drops, batch dups collapse, new survives") {
    val existing = Seq(
      (10L, "alpha beta"), (11L, "gamma delta")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "alpha beta"),   // digest already in the corpus → drops
      (3L, "epsilon zeta"), // new content, min id of its digest → survives
      (5L, "epsilon zeta"), // batch-internal duplicate → drops
      (7L, "eta theta"))    // new → survives
      .toDF("doc_id", "text")
    val kept = Dedup.dropExactIncremental(batch, existing, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 7L))
    // seen-content suppression is content-addressed, not id-ordered: a
    // batch id SMALLER than the existing holder still drops
    assert(!kept.contains(1L))
    // empty existing side degenerates to plain dropExact
    val empty = existing.where(lit(false))
    val soloKept = Dedup.dropExactIncremental(batch, empty, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(soloKept ==
      Dedup.dropExact(batch, "doc_id", "text")
        .select("doc_id").as[Long].collect().toSet)
    // NULL text is content too: a null-text batch row must NOT re-enter
    // past a null-text existing doc (null-safe anti-join, matching how
    // groupBy already equates NULL digests within the batch)
    val exNull = Seq((20L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val batchNull = Seq((9L, null.asInstanceOf[String]), (11L, "fresh"))
      .toDF("doc_id", "text")
    assert(Dedup.dropExactIncremental(batchNull, exNull, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet == Set(11L))
  }

  test("jaccardPairs computes exact token-set jaccard within blocks") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", "lang", 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    // docs 0 and 4 identical → jaccard 1.0; 0 and 1: 8 distinct tokens each
    // ("the" repeats), 7 shared, union 9 → 7/9
    assert(pairs((0L, 4L)) == 1.0)
    assert(pairs((0L, 1L)) == 0.7778)
    // cross-lang pair (0,2) must not appear (blocked)
    assert(!pairs.contains((0L, 2L)))
  }

  test("containmentPairs: embedded short doc scores 1.0 where jaccard dilutes") {
    val d = Seq(
      (0L, "alpha beta gamma", "en"),
      // doc 0's tokens embedded verbatim in a much longer doc: overlap
      // coefficient 3/3 = 1.0, jaccard only 3/10
      (1L, "alpha beta gamma one two three four five six seven", "en"),
      (2L, "unrelated words entirely different content", "en"),
      (3L, "alpha beta gamma", "de"))  // same text, other block → no pair
      .toDF("doc_id", "text", "lang")
    val got = Dedup.containmentPairs(d, "doc_id", "text", "lang", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    assert(got === Seq((0L, 1L, 3L, 1.0, 0L)))
    // the same pair is invisible to jaccard at any comparable threshold
    assert(Dedup.jaccardPairs(d, "doc_id", "text", "lang", 0.5).count() === 0)
    // equal-size sets tie the contained side to the smaller id
    val tie = Seq((5L, "x y z", "en"), (9L, "x y q", "en"))
      .toDF("doc_id", "text", "lang")
    val t = Dedup.containmentPairs(tie, "doc_id", "text", "lang", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    assert(t === Seq((5L, 9L, 5L)))
  }

  test("TrigramCounts equals the composed substring explode, code points included") {
    import graft.expressions.TrigramCounts.trigramCounts
    val texts = Seq(
      (1L, "abcabcab"),                 // overlapping repeats
      (2L, "ab"),                       // below trigram length -> empty
      (3L, "h\u00e9llo w\u00f6rld h\u00e9l"), // multi-byte code points
      (4L, "\ud83d\ude00ab\ud83d\ude00abX"), // supplementary (4-byte) chars
      (5L, "aaaa"))
      .toDF("id", "t")
    val fused = texts.select(col("id"),
        explode(trigramCounts(col("t"))).as("tc"))
      .select(col("id"), col("tc.tri"), col("tc.c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    val composed = texts
      .withColumn("k", length(col("t")) - 2)
      .where(col("k") >= 1)
      .select(col("id"), explode(expr(
        "transform(sequence(1, k), i -> substring(t, i, 3))")).as("tri"))
      .groupBy("id", "tri").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(fused === composed)
    // null text -> null array -> explode drops, like the composed filter
    val n = Seq((9L, Option.empty[String])).toDF("id", "t")
      .select(explode(trigramCounts(col("t")))).count()
    assert(n === 0L)
  }

  test("minhash: exact dups agree on every signature position; est tracks jaccard") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", k = 32, bands = 8,
        estThreshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("est_jaccard")).toMap
    assert(pairs((0L, 4L)) == 1.0)             // identical text, identical sig
    assert(pairs.get((0L, 1L)).exists(_ > 0.5)) // near-dup collides + high est
  }

  test("char-shingle minhash: near-dup texts collide, distinct shingles correct") {
    val sh = Seq("abcdef").toDF("text")
      .select(Dedup.shingles("text", 3).as("s"))
      .as[Seq[String]].collect().head
    assert(sh.toSet == Set("abc", "bcd", "cde", "def"))
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", k = 32, bands = 8,
        estThreshold = 0.0, shingleSize = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("est_jaccard")).toMap
    assert(pairs((0L, 4L)) == 1.0)  // identical text → identical char shingles
    assert(pairs.get((0L, 1L)).exists(_ > 0.5))
  }

  test("simhash: identical text → distance 0; near-dup closer than unrelated") {
    val h = docs.select($"doc_id", Dedup.simhash64("text").as("h"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0L), h(4L)) == 0)
    assert(ham(h(0L), h(1L)) < ham(h(0L), h(3L)))
  }

  test("MomentsAgg: layout-independent exact sums; matches var_samp; n=1 has no variance") {
    import org.apache.spark.sql.functions.{stddev_samp, col}
    val vals = Seq(("a", 100L), ("a", 300L), ("a", 200L), ("a", 900L),
      ("b", 42L))
    def run(parts: Int) = vals.toDS().repartition(parts)
      .groupByKey(_._1).mapValues(_._2)
      .agg(MomentsAgg.toColumn.name("m"))
      .collect().toMap
    // exact long sums merge associatively+commutatively: any partition
    // layout produces the SAME buffer, not just the same statistic
    val one = run(1); val many = run(7)
    assert(one == many)
    assert(one("a") == Moments(4L, 1500L, 950000L))
    // derived sample variance agrees with Spark's own float var_samp
    val varFromSums = {
      val m = one("a")
      (m.sumSqCents.toDouble - m.sumCents.toDouble * m.sumCents.toDouble / m.n)
        .ensuring(_ >= 0) / (m.n - 1).toDouble
    }
    val sparkStd = vals.toDF("k", "v").where(col("k") === "a")
      .agg(stddev_samp(col("v"))).as[Double].head()
    assert(math.abs(math.sqrt(varFromSums) - sparkStd) < 1e-9)
    // a single-row group carries n=1 — variance is undefined downstream
    assert(one("b") == Moments(1L, 42L, 1764L))
  }

  test("editDistancePairs: exact DP distances, block isolation, symmetric emission") {
    val df = Seq(
      (1L, "en", "kitten sat here"),
      (2L, "en", "sitten sat here"),   // 1 substitution from #1
      (3L, "en", "totally different words entirely"),
      (4L, "de", "kitten sat here"))   // identical text, OTHER block
      .toDF("doc_id", "lang", "text")
    val out = Dedup.editDistancePairs(df, "doc_id", "text", "lang",
      prefixLen = 80, maxDist = 3)
      .select("id_a", "id_b", "edit_dist")
      .as[(Long, Long, Long)].collect().toSet
    // only the in-block near pair survives; the identical cross-block text
    // never compares (blocking is a hard wall), and each unordered pair
    // emits exactly once (id_a < id_b)
    assert(out == Set((1L, 2L, 1L)))
    // threshold is inclusive, distances are the exact classic DP values
    val loose = Dedup.editDistancePairs(df.where($"lang" === "en"),
      "doc_id", "text", "lang", prefixLen = 80, maxDist = 100)
      .select("id_a", "id_b", "edit_dist")
      .as[(Long, Long, Long)].collect()
      .map { case (a, b, e) => (a, b) -> e }.toMap
    assert(loose((1L, 2L)) == 1L)
    assert(loose((1L, 3L)) > 10L)
  }

  test("simhashBandedPairs equals the brute-force Hamming scan (lossless banding)") {
    // Pigeonhole: bands = maxHamming + 1, so any pair within the radius
    // shares >= 1 exact band — candidates are complete, the exact
    // post-filter makes them precise. Check on real testdata (near-dup
    // dense: 500 docs, 31-word vocab) that the pair SET matches all-pairs.
    val d = graft.Tables.documents(spark, sfTest)
    for (maxH <- Seq(0, 3)) {
      val banded = Dedup.simhashBandedPairs(d, "doc_id", "text", maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val h = d.select($"doc_id".as("id"), Dedup.simhash64("text").as("sh"))
      val brute = h.as("a").join(h.as("b"), $"a.id" < $"b.id")
        .select($"a.id", $"b.id",
          bit_count($"a.sh".bitwiseXOR($"b.sh")).as("hamming"))
        .where($"hamming" <= maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(banded == brute, s"maxHamming=$maxH")
      assert(brute.nonEmpty) // fixture really exercises the radius
    }
    // Bounded candidates on a single-block corpus: banding needs no
    // semantic blocking column at all (the round-1 lang-block scale risk)
    // — and the pair set still equals the brute-force scan there.
    val en = d.where($"lang" === "en")
    val enBanded = Dedup.simhashBandedPairs(en, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val enH = en.select($"doc_id".as("id"), Dedup.simhash64("text").as("sh"))
    val enBrute = enH.as("a").join(enH.as("b"), $"a.id" < $"b.id")
      .where(bit_count($"a.sh".bitwiseXOR($"b.sh")) <= 2)
      .select($"a.id", $"b.id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(enBanded == enBrute)
  }

  test("first-band pair dedup equals the distinct formulation, no duplicate pairs") {
    // bandedPairIds keeps a colliding pair only in its first agreeing band
    // (in-stage filter) instead of a distinct exchange; the pair SET must
    // equal the explode → join → distinct reference on real testdata.
    val d = graft.Tables.documents(spark, sfTest)
    val cands = Dedup.candidatePairIds(d, "doc_id", "text") // k=32, bands=8
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cands.length == cands.toSet.size, "duplicate pairs emitted")
    val sigs = d.select($"doc_id".as("id"),
      Dedup.minhashSignature("text", 32).as("sig"))
    val banded = sigs.select($"id", posexplode(
        expr("transform(sequence(0, 7), j -> xxhash64(slice(sig, j * 4 + 1, 4)))"))
      .as(Seq("band", "bucket")))
    val ref = banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket"
          && $"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cands.toSet == ref.toSet)
    assert(ref.nonEmpty)
    // the fused FirstAgreeingIndex matches the composed built-in form
    val pairs = sigs.limit(60).select($"sig".as("sa"))
      .crossJoin(sigs.limit(60).select($"sig".as("sb")))
    val diff = pairs.select(
        graft.expressions.FirstAgreeingIndex.firstAgree($"sa", $"sb").as("fast"),
        (coalesce(array_position(
          expr("zip_with(sa, sb, (x, y) -> x = y)"), lit(true)), lit(0L))
          .cast("int") - 1).as("ref"))
      .where($"fast" =!= $"ref")
    assert(diff.count() == 0)
  }

  test("verifiedNearDupPairs: LSH-verified scale path equals the exhaustive join") {
    // Precision is structural (candidates are exactly re-verified); recall
    // is probabilistic per missed band (2^-32 at j=0.5 with bands=32,r=1)
    // — pin BOTH at 1.0 on the real fixture corpus vs jaccardPairs run
    // with a constant block (i.e. the full quadratic pair space).
    val d = graft.Tables.documents(spark, sfTest)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "shared", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val scale = pairSet(Dedup.verifiedNearDupPairs(d, "doc_id", "text", 0.5))
    val exhaustive = pairSet(
      Dedup.jaccardPairs(d.withColumn("one", lit(1)), "doc_id", "text", "one", 0.5))
    assert(exhaustive.nonEmpty)
    assert(scale == exhaustive)
  }

  test("incrementalNearDupPairs: manifest probe + known pairs == full-corpus run") {
    // The selective_recompute proof on the near-dup tier: split the
    // fixture by id parity, run the incremental path (existing-half
    // manifest probed by the batch half), and demand the result SET
    // equals the full-corpus verified run — cross-batch pairs come off
    // the probe, batch-internal off the self-join, known off the
    // previous run, nothing duplicated, nothing lost.
    val d = graft.Tables.documents(spark, sfTest)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "shared", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val inc = pairSet(Dedup.incrementalNearDupPairs(
      batch = d.where(pmod($"doc_id", lit(2)) === 1),
      existing = d.where(pmod($"doc_id", lit(2)) === 0),
      "doc_id", "text", threshold = 0.5))
    val full = pairSet(Dedup.verifiedNearDupPairs(d, "doc_id", "text", 0.5))
    assert(full.nonEmpty)
    assert(inc == full)
    // and the incremental frame has no duplicate pair rows
    val incDf = Dedup.incrementalNearDupPairs(
      d.where(pmod($"doc_id", lit(2)) === 1),
      d.where(pmod($"doc_id", lit(2)) === 0), "doc_id", "text", 0.5)
    assert(incDf.count() === incDf.select("id_a", "id_b").distinct().count())
  }

  test("AHash64 fused kernel is bit-identical to the composed HOF form") {
    // real fixture text windows + crafted edges: short window (< 64
    // chars — zero-pixels past the end), uniform window (no bit can
    // exceed the mean), half/half split
    val d = graft.Tables.documents(spark, sfTest)
      .select(substring($"text", 1, 64).as("w"))
      .unionAll(Seq("abc", "z" * 64, "a" * 32 + "z" * 32)
        .toDF("w"))
    val diff = d.select(
        graft.expressions.AHash64.ahash($"w").as("fast"),
        graft.multimodal.MultimodalOps.aHash64Composed("w").as("ref"))
      .where($"fast" =!= $"ref")
    assert(diff.count() == 0)
    // uniform window: every p·64 == sum, never >, fp = 0
    val z = Seq("z" * 64).toDF("w")
      .select(graft.expressions.AHash64.ahash($"w")).as[Long].collect().head
    assert(z === 0L)
  }

  test("incrementalSimhashPairs: manifest probe == full-corpus Hamming run") {
    // Pigeonhole losslessness holds across frames: parity-split the
    // fixture, probe the existing half's band manifest with the batch
    // half, and demand the pair set equals the full banded run (which
    // itself provably equals the brute-force Hamming scan).
    val d = graft.Tables.documents(spark, sfTest)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val inc = pairSet(Dedup.incrementalSimhashPairs(
      batch = d.where(pmod($"doc_id", lit(2)) === 1),
      existing = d.where(pmod($"doc_id", lit(2)) === 0),
      "doc_id", "text", maxHamming = 3))
    val full = pairSet(Dedup.simhashReplayableBandedPairs(
      d, "doc_id", "text", maxHamming = 3))
    assert(full.nonEmpty)
    assert(inc == full)
  }

  test("clusterPairs finds connected components with min-id labels") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val comp = Dedup.clusterPairs(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("clusterPairs converges on a path graph of diameter far above maxIter") {
    // 200-node path: diameter 199 needed 199 rounds under plain one-hop
    // propagation (old behavior: IllegalStateException at maxIter=10);
    // pointer jumping resolves it within the default cap.
    val n = 200L
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.clusterPairs(pairs).as[(Long, Long)].collect().toMap
    assert(comp.size == n)
    assert(comp.values.forall(_ == 0L))
  }

  test("clusterPairs pointer jumping matches union-find on random graphs") {
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 60
      val edges = Seq.fill(50)((rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // driver-side union-find oracle
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(v => v -> find(v.toInt).toLong).toMap
      val got = Dedup.clusterPairs(edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"trial=$trial")
    }
  }

  test("dropNearDups keeps one canonical doc per component plus singletons") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over dogs"),  // ~dup of 2
      (2L, "the quick brown fox jumps over cats"),  // component {1,2}: keep 1
      (5L, "completely different text entirely here"), // singleton: kept
      (7L, "lorem ipsum dolor sit amet tokens"))       // singleton: kept
      .toDF("doc_id", "text")
    val kept = Dedup.dropNearDups(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L, 7L))
  }

  test("normalizeText: urls stripped, case folded, whitespace squeezed, trimmed") {
    val got = Seq(
      "  Hello   WORLD  ",
      "see https://example.com/x?y=1 now",
      "a\tb\n c",
      "",
      "visit HTTP://X.COM now",       // uppercase URLs are URLs too
      "see http://a.com\nkeep this")  // URL stops at ANY whitespace
      .toDF("t")
      .select(TextFunctions.normalizeText($"t")).as[String].collect().toSeq
    assert(got == Seq("hello world", "see now", "a b c", "",
      "visit now", "see keep this"))
  }

  test("tokenCountBpeish splits letter/digit/punct runs") {
    val got = Seq("hello world42 a-b, c!").toDF("t")
      .select(TextFunctions.tokenCountBpeish($"t")).as[Long].collect().head
    // hello | world | 42 | a | - | b | , | c | !  = 9
    assert(got == 9L)
  }

  test("TextFunctions: token count, wordlist hits, lang predict tie-break") {
    val t = Seq(("the der la cat", 0L)).toDF("text", "id")
    assert(t.select(TextFunctions.tokenCount($"text")).as[Long].collect().head == 4L)
    assert(t.select(TextFunctions.wordlistHits($"text", Seq("the", "la")))
      .as[Long].collect().head == 2L)
    // one hit per language → tie → first list order wins (en)
    assert(t.select(TextFunctions.langPredict($"text")).as[String].collect().head == "en")
    assert(Seq(("der und ist hund", 0L)).toDF("text", "id")
      .select(TextFunctions.langPredict($"text")).as[String].collect().head == "de")
  }

  test("repetitionSignals: hand-computed dup/bigram/top-token ratios") {
    val got = TextFunctions.repetitionSignals(
      Seq((1L, "a a b"), (2L, "x"), (3L, "w w w w")).toDF("id", "text"), "id", "text")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // "a a b": 3 tokens, 2 distinct -> 1/3; grams {"a a","a b"} distinct -> 0;
    // top token "a" 2/3. "x": single token, no grams. "w w w w": all dup.
    assert(got(0) == ((1L, 3L, 0.3333, 0.0, 0.6667)))
    assert(got(1) == ((2L, 1L, 0.0, 0.0, 1.0)))
    assert(got(2) == ((3L, 4L, 0.75, 0.6667, 1.0)))
    // null text: the doc id survives with null metrics (no silent drop)
    val n = TextFunctions.repetitionSignals(
      Seq((4L, Option.empty[String])).toDF("id", "text"), "id", "text")
      .collect()
    assert(n.length == 1 && n.head.getLong(0) == 4L && n.head.isNullAt(1))
  }

  test("piiScrub/piiCount: emails, IPs, phones redacted in order; clean text untouched") {
    val texts = Seq(
      (1L, "mail a.b+c@ex-1.co.uk and d@e.io now"),   // two emails
      (2L, "server 192.168.0.1 and 10.0.0.255 up"),   // two IPs
      (3L, "call +44 7700-900123 or +1 555 0100 ok"), // two phones
      (4L, "no pii here at all"),                     // untouched
      (5L, "x@y.zz from 8.8.8.8 tel +33 1 23 45 67")) // one of each
      .toDF("id", "text")
    val got = texts
      .select($"id",
        TextFunctions.piiCount($"text", "email").as("e"),
        TextFunctions.piiCount($"text", "ipv4").as("i"),
        TextFunctions.piiCount($"text", "phone").as("p"),
        TextFunctions.piiScrub($"text").as("red"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    assert(got(0) == ((1L, 2L, 0L, 0L, "mail <EMAIL> and <EMAIL> now")))
    assert(got(1) == ((2L, 0L, 2L, 0L, "server <IP> and <IP> up")))
    assert(got(2) == ((3L, 0L, 0L, 2L, "call <PHONE> or <PHONE> ok")))
    assert(got(3) == ((4L, 0L, 0L, 0L, "no pii here at all")))
    assert(got(4) == ((5L, 1L, 1L, 1L, "<EMAIL> from <IP> tel <PHONE>")))
    // (doc 2/5 also pin that an IPv4 never double-counts as a phone —
    // the phone pattern is anchored on '+')
    intercept[IllegalArgumentException](
      TextFunctions.piiCount($"text", "ssn"))
  }

  test("charRatio and empty-string guard") {
    val got = Seq("a1b2", "").toDF("t")
      .select(TextFunctions.charRatio($"t", "[0-9]").as("r")).as[Double].collect().toSeq
    assert(got == Seq(0.5, 0.0))
  }

  test("fingerprint is order-sensitive and deterministic") {
    val fp = TextFunctions.fingerprint(
      Seq((1L, "a b c"), (2L, "c b a"), (3L, "a b c")).toDF("id", "text"),
      "id", "text").as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(3L))
    assert(fp(1L) != fp(2L))
  }

  test("fingerprint keeps a NULL-text document's id (null fingerprint, not a dropped row)") {
    val out = TextFunctions.fingerprint(
      Seq((1L, "a b"), (2L, null.asInstanceOf[String])).toDF("id", "text"),
      "id", "text").collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out.keySet == Set(1L, 2L)) // posexplode would have dropped id 2
    assert(!out(1L) && out(2L))
  }

  test("knnIvf: a zero-norm vector (null cosine) cannot hijack cell ranking or top-k") {
    import org.apache.spark.sql.functions.typedlit
    val e = graft.Tables.embeddings(spark, sfTest)
      .where($"vec_id" < 40)
      .unionByName(graft.Tables.embeddings(spark, sfTest)
        .where($"vec_id" === 0)
        .select(org.apache.spark.sql.functions.lit(999L).as("vec_id"),
          typedlit(Seq.fill(64)(0.0f)).as("embedding"),
          $"label"))
    val q = e.where($"vec_id" < 3)
    val got = Similarity.knnIvf(q, e, k = 3, nlist = 4, nprobe = 4)
      .collect()
    // nprobe = nlist probes every cell, so the zero vector is always a
    // candidate — its NULL cosine must rank LAST (desc nulls-last) and
    // never appear in a top-3 among 40 real neighbors; before the
    // coalesce fix its cell scored ns=NULL and sorted FIRST instead.
    assert(got.nonEmpty)
    assert(!got.map(_.getAs[Long]("cid")).contains(999L))
  }

  test("knnIvf returns valid ranked pairs whose cosines match brute force") {
    val e = graft.Tables.embeddings(spark, sfTest)
    val q = e.where($"vec_id" < 5)
    val ivf = Similarity.knnIvf(q, e, k = 3).collect()
    assert(ivf.nonEmpty)
    assert(ivf.forall(r => r.getAs[Int]("rnk") >= 1 && r.getAs[Int]("rnk") <= 3))
    val brute = Similarity.knnBrute(q, e, k = 2000)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"))
        -> r.getAs[Double]("cos_sim")).toMap
    ivf.foreach { r =>
      val key = (r.getAs[Long]("qid"), r.getAs[Long]("cid"))
      assert(brute(key) == r.getAs[Double]("cos_sim"))
    }
  }

  test("ivfAssign/knnIvfOnPostings: append equals rebuild; serving matches knnIvf") {
    val e = graft.Tables.embeddings(spark, sfTest)
    val cb = Similarity.trainCodebook(
      e.where($"vec_id" % 2 === 0), nlist = 4)
    // assignment is per-row and codebook-fixed, so assigning the halves
    // separately and unioning IS the full rebuild — the set identity the
    // graded incremental_ivf_append holds as a boolean
    val full = Similarity.ivfAssign(e, "vec_id", "embedding", cb)
      .select("cid", "cell").as[(Long, Int)].collect().toSet
    val appended = Similarity
      .ivfAssign(e.where($"vec_id" % 2 === 0), "vec_id", "embedding", cb)
      .unionByName(Similarity
        .ivfAssign(e.where($"vec_id" % 2 === 1), "vec_id", "embedding", cb))
      .select("cid", "cell").as[(Long, Int)].collect().toSet
    assert(appended === full)
    // serving from pre-assigned postings returns exactly what the
    // inline-assignment path returns (same codebook, same nprobe)
    val q = e.where($"vec_id" < 3)
    def ranked(df: org.apache.spark.sql.DataFrame) = df
      .select($"qid", $"cid", $"rnk".cast("long")).as[(Long, Long, Long)]
      .collect().toSet
    val inline = ranked(Similarity.knnIvf(q, e, k = 3, nlist = 4,
      nprobe = 2, codebook = Some(cb)))
    val served = ranked(Similarity.knnIvfOnPostings(q,
      Similarity.ivfAssign(e, "vec_id", "embedding", cb), k = 3,
      nprobe = 2, codebook = cb))
    assert(served === inline)
  }

  test("ivfadcEncode/knnIvfadcOnCodes: append equals re-encode; serving matches ivfadcTopK") {
    import graft.ops.EmbeddingOps
    val e = graft.Tables.embeddings(spark, sfTest)
    val model = EmbeddingOps.ivfadcTrain(e, "vec_id", "embedding",
      dim = 64, nlist = 4, m = 4, k = 8, iterations = 3)
    // encoding is per-row and model-fixed: halves encoded separately and
    // unioned IS the full re-encode — the set identity the graded
    // incremental_ivfadc_append holds as a boolean
    def codeSet(df: org.apache.spark.sql.DataFrame) = df
      .select($"vec_id", $"cell", $"subspace", $"code")
      .as[(Long, Long, Long, Long)].collect().toSet
    val full = codeSet(EmbeddingOps.ivfadcEncode(e, "vec_id",
      "embedding", model))
    val appended = codeSet(
      EmbeddingOps.ivfadcEncode(e.where($"vec_id" % 2 === 0),
        "vec_id", "embedding", model)
      .unionByName(EmbeddingOps.ivfadcEncode(
        e.where($"vec_id" % 2 === 1), "vec_id", "embedding", model)))
    assert(appended === full)
    // serving from pre-encoded codes returns exactly what the
    // train-and-serve monolith returns (same Lloyd state, same LUTs,
    // same totalized ranks) — with and without the +R exact re-rank
    def ranked2(df: org.apache.spark.sql.DataFrame) = df
      .select($"qid", $"rank", $"vec_id").as[(Long, Long, Long)]
      .collect().toSet
    val codes = EmbeddingOps.ivfadcEncode(e, "vec_id", "embedding", model)
    for (rr <- Seq(0, 20)) {
      val inline = ranked2(EmbeddingOps.ivfadcTopK(e, "vec_id",
        "embedding", dim = 64, nlist = 4, nprobe = 2, m = 4, k = 8,
        iterations = 3, queryIds = Seq(1L, 2L), topK = 5, rerank = rr))
      val served = ranked2(EmbeddingOps.knnIvfadcOnCodes(e, "vec_id",
        "embedding", Seq(1L, 2L), codes, model, nprobe = 2, topK = 5,
        rerank = rr))
      assert(served === inline, s"rerank=$rr")
    }
  }

  test("ANN recall floors: the graded configs clear their contracts on real data") {
    // The graded queries assert per-query recall >= 0.3 via recallVsBrute;
    // this pins the stronger measured numbers (deterministic: fixed data,
    // fixed hash planes, fixed KMeans seed) so a silent quality regression
    // fails here even before the oracle gate. Measured at sf0.001:
    // lsh(b=4, L=16) min 1/3 avg 0.867; ivf(nl=16, np=8) min 1/3 avg 0.800.
    val e = graft.Tables.embeddings(spark, sfTest)
    val q = e.where($"vec_id" < 10)
    val brute = Similarity.knnBrute(q, e, 3).select($"qid", $"cid")
    def recalls(ann: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = brute.join(ann.select($"qid", $"cid", lit(1).as("hit")),
          Seq("qid", "cid"), "left")
        .groupBy("qid")
        .agg((sum(coalesce($"hit", lit(0))) / count(lit(1))).as("recall"))
        .agg(min("recall"), avg("recall")).collect().head
      (r.getDouble(0), r.getDouble(1))
    }
    val (lshMin, lshAvg) = recalls(Similarity.knnLsh(q, e, 3, bits = 4, tables = 16))
    assert(lshMin >= 0.33, s"lsh min recall $lshMin")
    assert(lshAvg >= 0.80, s"lsh avg recall $lshAvg")
    val (ivfMin, ivfAvg) = recalls(Similarity.knnIvf(q, e, 3, nlist = 16, nprobe = 8))
    assert(ivfMin >= 0.33, s"ivf min recall $ivfMin")
    assert(ivfAvg >= 0.75, s"ivf avg recall $ivfAvg")
  }

  test("fused CosineSimilarity expression is bit-identical to the composed built-ins") {
    import graft.expressions.CosineSimilarity
    val e = graft.Tables.embeddings(spark, sfTest).limit(50)
    val pairs = e.select($"vec_id".as("qid"), $"embedding".as("qe"))
      .crossJoin(e.select($"vec_id".as("cid"), $"embedding".as("ce")))
    val diff = pairs.select(
        CosineSimilarity.cosineFast($"qe", $"ce").as("fast"),
        Similarity.cosine("qe", "ce").as("ref"))
      .where($"fast" =!= $"ref" || $"fast".isNull =!= $"ref".isNull)
    assert(diff.count() == 0)
    // SQL registration path
    CosineSimilarity.register(spark)
    pairs.limit(5).createOrReplaceTempView("cos_pairs")
    val viaSql = spark.sql("SELECT cosine_sim(qe, ce) c FROM cos_pairs")
    assert(viaSql.count() == 5)
    // null input → null output
    val n = pairs.limit(1)
      .select(CosineSimilarity.cosineFast(lit(null).cast("array<float>"), $"ce").as("c"))
      .collect().head
    assert(n.isNullAt(0))
    // zero-norm vector — the ONE pinned divergence: fused → NULL
    // (try_divide semantics, so a degenerate row can't outrank real
    // similarities or kill a job), composed → ANSI DIVIDE_BY_ZERO
    val zdf = Seq((Array(0.0f, 0.0f), Array(1.0f, 0.0f))).toDF("qe", "ce")
    val z = zdf.select(CosineSimilarity.cosineFast($"qe", $"ce").as("fast"))
      .collect().head
    assert(z.isNullAt(0))
    val thrown = intercept[Exception] {
      zdf.select(Similarity.cosine("qe", "ce").as("ref")).collect()
    }
    assert(thrown.getMessage.contains("DIVIDE_BY_ZERO"))
  }

  test("fused SignatureAgreement is bit-identical to the composed built-ins") {
    import graft.expressions.SignatureAgreement
    val d = graft.Tables.documents(spark, sfTest).limit(80)
    val sigs = d.select($"doc_id".as("id"),
      Dedup.minhashSignature("text", 32).as("sig"))
    val pairs = sigs.select($"id".as("id_a"), $"sig".as("sig_a"))
      .crossJoin(sigs.select($"id".as("id_b"), $"sig".as("sig_b")))
    val diff = pairs.select(
        SignatureAgreement.agreement($"sig_a", $"sig_b").as("fast"),
        expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), e -> e))")
          .as("ref"))
      .where($"fast" =!= $"ref")
    assert(diff.count() == 0)
    // null array -> null out
    val n = pairs.limit(1).select(SignatureAgreement
      .agreement(lit(null).cast("array<bigint>"), $"sig_b").as("c"))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("fused SrpBuckets is bit-identical to the composed built-ins") {
    // fixture includes empty, zero, negative, and NULL-ELEMENT vectors
    // (the composed fold null-poisons every dot product → all-zero
    // buckets; the fused kernel must replicate that, not read null as 0)
    val withNullElem = Seq(
      Tuple1(Seq(Option(1.5f), Option.empty[Float], Option(2.0f))))
      .toDF("embedding")
    val e = graft.Tables.embeddings(spark, sfTest)
      .select($"embedding".cast("array<float>"))
      .union(Seq(Array.empty[Float], Array(0.0f, 0.0f), Array(-1.5f, 2.5f, 0.0f))
        .toDF("embedding"))
      .union(withNullElem.select($"embedding".cast("array<float>")))
    for ((bits, tables) <- Seq((4, 16), (2, 1), (8, 3))) {
      val diff = e.select(
          Similarity.srpBuckets("embedding", bits, tables).as("fast"),
          Similarity.srpBucketsComposed("embedding", bits, tables).as("ref"))
        .where($"fast" =!= $"ref" || $"fast".isNull =!= $"ref".isNull)
      assert(diff.count() == 0, s"bits=$bits tables=$tables")
    }
    // null vector — the ONE pinned divergence: fused → NULL (sane null
    // propagation), composed → all-zero buckets (its array() let-binding
    // wraps the null, and every when() collapses to 0L — real buckets for
    // a missing embedding)
    val nulls = Seq(Tuple1(Option.empty[Array[Float]])).toDF("embedding")
    assert(nulls.select(Similarity.srpBuckets("embedding", 4, 2))
      .collect().head.isNullAt(0))
    val composedOnNull = nulls
      .select(Similarity.srpBucketsComposed("embedding", 4, 2).as("b"))
      .collect().head
    assert(!composedOnNull.isNullAt(0)
      && composedOnNull.getSeq[Long](0) == Seq(0L, 0L))
  }

  test("fused SimHash64 is bit-identical to the composed built-ins") {
    // Bit-identity to the round-2 composable formulation IS the
    // correctness contract for the fused kernel (xxhash64 is not
    // replayable outside Spark, so no SQL oracle can gate it) — on real
    // testdata (covers multi-space runs, punctuation, every lang) plus
    // adversarial edges the corpus may lack.
    val d = graft.Tables.documents(spark, sfTest)
      .select($"text")
      .union(Seq("", " ", "  ", "a  b ", " leading", "trailing ",
        "único café naïve 東京 züge").toDF("text"))
    // null-asymmetric divergence counts too: bare =!= is NULL (row
    // filtered out) when exactly one side is null, which would let a
    // null-on-edge-input regression pass as "bit-identical"
    val diff = d.select(
        Dedup.simhash64("text").as("fast"),
        Dedup.simhash64Composed("text").as("ref"))
      .where($"fast" =!= $"ref" || ($"fast".isNull =!= $"ref".isNull))
    assert(diff.count() == 0)
    // null in → null out, matching the composed expression
    val n = Seq(Tuple1(Option.empty[String])).toDF("text")
      .select(Dedup.simhash64("text")).collect().head
    assert(n.isNullAt(0))
  }

  test("fused SimHashMd5 is bit-identical to the composed md5 fold") {
    // The graded simhash_hamming query runs the banding join over THIS
    // fingerprint at full corpus; the DuckDB oracle refolds it per hex
    // digit, and this pin ties the fused kernel to the composed Spark
    // formulation the oracle SQL mirrors.
    val d = graft.Tables.documents(spark, sfTest)
      .select($"text")
      .union(Seq("", " ", "  ", "a  b ", " leading", "trailing ",
        "único café naïve 東京 züge").toDF("text"))
    val diff = d.select(
        Dedup.simhashReplayable64("text").as("fast"),
        Dedup.simhashReplayable64Composed("text").as("ref"))
      .where($"fast" =!= $"ref" || ($"fast".isNull =!= $"ref".isNull))
    assert(diff.count() == 0)
    val n = Seq(Tuple1(Option.empty[String])).toDF("text")
      .select(Dedup.simhashReplayable64("text")).collect().head
    assert(n.isNullAt(0))
  }

  test("fused MinHashSignature is bit-identical to the composed built-ins") {
    val d = graft.Tables.documents(spark, sfTest)
      .select($"text")
      .union(Seq("", " ", "  ", "a  b ", " leading", "trailing ", "ab",
        "único café naïve 東京 züge").toDF("text"))
    for ((k, shingle) <- Seq((32, 1), (64, 1), (32, 3))) {
      val diff = d.select(
          Dedup.minhashSignature("text", k, shingle).as("fast"),
          Dedup.minhashSignatureComposed("text", k, shingle).as("ref"))
        .where($"fast" =!= $"ref" || ($"fast".isNull =!= $"ref".isNull))
      assert(diff.count() == 0, s"k=$k shingleSize=$shingle")
    }
    val n = Seq(Tuple1(Option.empty[String])).toDF("text")
      .select(Dedup.minhashSignature("text", 32)).collect().head
    assert(n.isNullAt(0))
  }

  test("GraftExtensions injects cosine_sim as a session extension function") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    // production sessions get this at build time via spark.sql.extensions;
    // the bridge applies the same injection payload to the live session
    org.apache.spark.sql.GraftExpressionBridge
      .applyFunctionExtensions(ext, spark)
    val got = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))")
      .collect().head.getDouble(0)
    assert(got == 1.0)
    // the fused sketch expressions ride the same injection payload
    val sketch = spark.sql(
      "SELECT simhash64('a b'), minhash_signature('a b', 4), " +
        "signature_agreement(minhash_signature('a b', 4), minhash_signature('a b', 4))")
      .collect().head
    assert(sketch.getSeq[Long](1).length == 4)
    assert(sketch.getInt(2) == 4)
    // SQL path agrees with the Column-API path bit-for-bit
    val viaCol = Seq("a b").toDF("t")
      .select(Dedup.simhash64("t")).collect().head.getLong(0)
    assert(sketch.getLong(0) == viaCol)
    // a fractional k must error loudly, not silently truncate 2.5 → 2
    val frac = intercept[Exception] {
      spark.sql("SELECT minhash_signature('a b', 2.5)").collect()
    }
    assert(frac.getMessage.contains("literal integer"))
    // integral literals of other widths still work (BIGINT k)
    assert(spark.sql("SELECT minhash_signature('a b', CAST(4 AS BIGINT))")
      .collect().head.getSeq[Long](0).length == 4)
  }

  test("cosineNearDupPairs: LSH pairs are a subset of exhaustive, recall clears the floor") {
    val e = graft.Tables.embeddings(spark, sfTest)
    val lsh = Similarity.cosineNearDupPairs(e, "vec_id", "embedding",
      threshold = 0.4, bits = 4, tables = 24)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val truth = Similarity.cosinePairsExhaustive(e, "vec_id", "embedding",
      threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // precision is exact by construction (every candidate re-verified)
    assert(lsh.subsetOf(truth))
    // measured 1.0 at sf0.001 with b=4/L=24; the graded contract floor is
    // 0.95 — same number cosine_dedup_quality gates through the oracle
    assert(truth.nonEmpty && lsh.size.toDouble / truth.size >= 0.95)
  }

  test("cosineNearDupPairsOnState: incremental over persisted rows equals the full run") {
    // split the fixture corpus, derive the "prior run" artifacts from the
    // even half, probe with the odd half — the union must be SET-equal to
    // a full-corpus LSH run (all three legs share the first-agreeing-
    // table rule, so this is an identity, not a recall statement)
    val e = graft.Tables.embeddings(spark, sfTest)
    val existing = e.where(col("vec_id") % 2 === 0)
    val batch = e.where(col("vec_id") % 2 === 1)
    val manifest = Similarity.srpBandRows(existing, "vec_id", "embedding",
      bits = 4, tables = 24)
    val known = Similarity.cosineNearDupPairs(existing, "vec_id",
      "embedding", threshold = 0.4, bits = 4, tables = 24)
    val incr = Similarity.cosineNearDupPairsOnState(batch, manifest,
      known, existing, "vec_id", "embedding", threshold = 0.4,
      bits = 4, tables = 24)
      .as[(Long, Long, Double)].collect().toSet
    val full = Similarity.cosineNearDupPairs(e, "vec_id", "embedding",
      threshold = 0.4, bits = 4, tables = 24)
      .as[(Long, Long, Double)].collect().toSet
    assert(incr === full && full.nonEmpty)
  }

  test("mutualTopOne: only reciprocal pairs survive; hub's satellites drop") {
    // a and b are each other's top-1; c's top-1 is b, but b's is a — so c
    // pairs with nobody (the hub-satellite asymmetry mutuality exists to
    // kill). d orthogonal to everyone, mutual with nobody... except that
    // top-1 ALWAYS exists, so d's top-1 (c) must not reciprocate either.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.01f, 0.0f)),
      (2L, Array(0.7f, 0.7f, 0.0f)),
      (3L, Array(0.0f, 0.1f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.mutualTopOne(vecs, "vec_id", "embedding")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((0L, 1L, 1.0)))
  }

  test("knnBrute: identical vector ranks first with cos 1.0; LSH is a subset") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),    // identical to 0
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),    // close
      (3L, Array(0.0f, 0.0f, 0.0f, 1.0f)))    // orthogonal
      .toDF("vec_id", "embedding")
    val brute = Similarity.knnBrute(vecs.where($"vec_id" === 0), vecs, 3)
      .orderBy("rnk").collect()
    assert(brute.head.getAs[Long]("cid") == 1L)
    assert(brute.head.getAs[Double]("cos_sim") == 1.0)
    assert(brute.map(_.getAs[Long]("cid")).toSeq == Seq(1L, 2L, 3L))
    val lsh = Similarity.knnLsh(vecs.where($"vec_id" === 0), vecs, 3, bits = 2)
      .collect().map(_.getAs[Long]("cid")).toSet
    assert(lsh.subsetOf(Set(1L, 2L, 3L)))
    assert(lsh.contains(1L))  // identical vector always shares the bucket
  }

  test("semanticDedupKeepFirst: lower-id neighbor drops, independent of dropper's own fate") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.01f)),   // ~v1 → dropped by 1
      (3L, Array(0.0f, 1.0f)),    // kept (orthogonal to 1, 2)
      (4L, Array(0.01f, 1.0f)),   // ~v3 → dropped by 3
      (5L, Array(-1.0f, 0.0f)),   // cos(v1) = -1 → kept
      (6L, Array(1.0f, 0.02f)))   // near BOTH 1 and the dropped 2 — still dropped
      .toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedupKeepFirst(vecs, "vec_id", "embedding",
      threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
    // and the kept set equals the rule recomputed from the exhaustive pairs
    val pairs = Similarity.cosinePairsExhaustive(vecs, "vec_id", "embedding",
      threshold = 0.9).select("id_b").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 5L, 6L) -- pairs)
    // schema passes through unchanged
    assert(Similarity.semanticDedupKeepFirst(vecs, "vec_id", "embedding", 0.9)
      .columns.toSeq == vecs.columns.toSeq)
  }

  test("NearestCentroid kernels equal the composed struct-min form bit-for-bit") {
    import graft.expressions.NearestCentroid._
    // pseudo-random micro-unit vectors, including exact centroid copies
    // (distance 0) and a duplicated centroid (exercises the id tie rule:
    // equal distance must resolve to the SMALLER id in both forms)
    val dim = 16
    def vec(seed: Long): Seq[Long] =
      (0 until dim).map(i => ((seed * 6364136223846793005L + i * 1442695040888963407L) >> 33) % 1000000L)
    val cents: Seq[(Long, Seq[Long])] =
      Seq((0L, vec(1)), (3L, vec(2)), (5L, vec(2)), (9L, vec(3)))
    val rows = ((0L until 40L).map(s => (s, vec(s))) ++
      Seq((100L, vec(2)), (101L, vec(3)))).toDF("id", "qv")
    val mat = typedLit(cents.map(_._2))
    val ids = typedLit(cents.map(_._1))
    val composed = array_min(array(cents.map { case (cl, cv) =>
      struct(
        aggregate(zip_with(col("qv"), typedLit(cv), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("dist"),
        lit(cl).as("cl"))
    }: _*))
    val out = rows.select(col("id"),
        nearestCentroidId(col("qv"), mat, ids).as("kid"),
        nearestCentroidDist(col("qv"), mat).as("kdist"),
        composed.getField("cl").as("cid"),
        composed.getField("dist").as("cdist"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(3), s"id mismatch on row ${r.getLong(0)}")
      assert(r.getLong(2) == r.getLong(4), s"dist mismatch on row ${r.getLong(0)}")
    }
    // the duplicated-centroid copy must land on id 3, not 5
    assert(out.find(_.getLong(0) == 100L).get.getLong(1) == 3L)
    // empty centroid matrix → NULL, not a crash
    val empty = rows.limit(1).select(
      nearestCentroidId(col("qv"),
        typedLit(Seq.empty[Seq[Long]]), typedLit(Seq.empty[Long])).as("x"))
      .collect().head
    assert(empty.isNullAt(0))
    // centroids/ids length mismatch throws loudly instead of reading
    // out-of-bounds UnsafeArrayData and returning garbage ids (r8 ADVICE)
    val mismatch = intercept[Exception] {
      rows.limit(1).select(
        nearestCentroidId(col("qv"), mat, typedLit(Seq(0L, 3L))).as("x"))
        .collect()
    }
    def chain(t: Throwable): String = {
      var c: Throwable = t; val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    assert(chain(mismatch).contains("must be index-aligned"), chain(mismatch))
  }
}
