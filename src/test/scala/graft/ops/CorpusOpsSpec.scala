package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Semantics of the corpus-preparation tier: deterministic splits,
  * context-window packing invariants, TF-IDF scores on a hand-checked
  * corpus.
  */
class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("assignSplit: content-addressed, complete, reproducible, ~weighted") {
    val docs = graft.Tables.documents(spark, sfTest)
    val s = CorpusOps.assignSplit(docs, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val counts = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 500)
    assert(counts.keySet == Set("train", "val", "test"))
    // md5 buckets are uniform enough that 500 keys land near the weights
    assert(counts("train") > 350 && counts("val") > 20 && counts("test") > 20)
    // same key -> same split, independent of the rest of the data
    val again = CorpusOps.assignSplit(docs.sample(0.5, seed = 7), "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .select("doc_id", "split")
    val full = s.select("doc_id", "split")
    assert(again.join(full, "doc_id")
      .where(again("split") =!= full("split")).count() == 0)
    // weights must cover the bucket space
    intercept[IllegalArgumentException](
      CorpusOps.assignSplit(docs, "doc_id", Seq("a" -> 50, "b" -> 40)))
  }

  test("leakageSafeSplit: exact duplicates can never straddle splits") {
    // the smoke fixture has unique texts, so plant duplicate groups with
    // ids spread far apart — an id-keyed split scatters such copies
    // across splits, the digest-keyed split cannot
    val docs = graft.Tables.documents(spark, sfTest).select("doc_id", "text")
      .unionByName((1 to 30).map(i =>
        (900000L + i, s"planted duplicate body ${i % 3}")).toDF("doc_id", "text"))
    val s = CorpusOps.leakageSafeSplit(docs, "text",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(s.groupBy("digest").agg(count_distinct(col("split")).as("ns"))
      .where(col("ns") > 1).count() == 0)
    // still a complete partition of the corpus
    assert(s.count() == docs.count())
    assert(s.where(col("split").isNull).count() == 0)
    // and genuinely group-aware: the planted digests have >1 copy, so the
    // invariant above is not vacuous
    assert(s.groupBy("digest").count().where(col("count") > 1).count() >= 3)
  }

  test("deterministicSample: reproducible, near-fraction, and nested") {
    val docs = graft.Tables.documents(spark, sfTest)
    val s30 = CorpusOps.deterministicSample(docs, "doc_id", 0.3)
    val s60 = CorpusOps.deterministicSample(docs, "doc_id", 0.6)
    val n30 = s30.count(); val n60 = s60.count()
    assert(math.abs(n30 - 150) < 50 && math.abs(n60 - 300) < 60)
    // nested: the 30% sample is a strict subset of the 60% sample
    assert(s30.join(s60, Seq("doc_id"), "left_anti").count() == 0)
    // reproducible: a second evaluation returns the IDENTICAL id set —
    // both directions (a one-sided except would pass if the re-evaluation
    // nondeterministically LOST rows: subset, not identity)
    val again = CorpusOps.deterministicSample(docs, "doc_id", 0.3)
    assert(again.select("doc_id").except(s30.select("doc_id")).count() == 0)
    assert(s30.select("doc_id").except(again.select("doc_id")).count() == 0)
  }

  test("weightedSample: boundary weights, ~proportional inclusion, monotone in weight") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfTest)
    val n = docs.count()
    // weight 1 keeps everything, weight 0 keeps nothing
    assert(CorpusOps.weightedSample(docs, "doc_id", lit(1.0)).count() === n)
    assert(CorpusOps.weightedSample(docs, "doc_id", lit(0.0)).count() === 0L)
    // uniform weight w ≈ fraction w of the corpus (md5 is uniform)
    val half = CorpusOps.weightedSample(docs, "doc_id", lit(0.5)).count()
    assert(math.abs(half - n / 2.0) < n * 0.15, s"$half of $n at w=0.5")
    // monotone per row: a row kept at its own weight stays kept at a
    // higher weight — the low-weight sample is a subset of the high
    val lo = CorpusOps.weightedSample(docs, "doc_id",
      least(lit(0.9), col("n_chars").cast("double") / 4000.0))
    val hi = CorpusOps.weightedSample(docs, "doc_id",
      least(lit(0.9), col("n_chars").cast("double") / 2000.0))
    assert(lo.join(hi, Seq("doc_id"), "left_anti").count() === 0L)
    assert(lo.count() < hi.count())
  }

  test("packSequences: offsets are cumulative within shard, packs chunk at the budget") {
    val df = Seq(
      (1L, "en", 100L), (2L, "en", 300L), (3L, "en", 200L), (4L, "en", 50L),
      (10L, "de", 600L), (11L, "de", 10L))
      .toDF("doc_id", "lang", "nt")
    val packed = CorpusOps.packSequences(df, "doc_id", "lang", col("nt"), 512)
      .orderBy("doc_id")
      .select("doc_id", "pack_id", "pack_offset")
      .as[(Long, Long, Long)].collect().toSeq
    // en: positions 0, 100, 400, 600 -> packs 0,0,0,1; offsets 0,100,400,88
    // de: positions 0, 600 -> packs 0,1; offsets 0,88
    assert(packed == Seq((1L, 0L, 0L), (2L, 0L, 100L), (3L, 0L, 400L),
      (4L, 1L, 88L), (10L, 0L, 0L), (11L, 1L, 88L)))
  }

  test("corpus_prep_attrition: lineage is monotone and consistent with the chain readout") {
    // docs and tokens can only shrink stage over stage (excision shrinks
    // tokens at constant docs); the final stage's totals must equal the
    // corpus_prep_full mixture report's — the two readouts share one
    // memoized chain, so a drift here means the lineage table lies.
    val att = graft.SparkEntry.queries("corpus_prep_attrition")(
      spark, sfTest)
      .select("stage_ord", "n_docs", "n_tokens", "id_sum")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(att.map(_._1).toSeq == (1L to 7L))
    att.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2, s"docs grew: $a -> $b")
      assert(b._3 <= a._3, s"tokens grew: $a -> $b")
    }
    val full = graft.SparkEntry.queries("corpus_prep_full")(spark, sfTest)
      .agg(sum("n_docs"), sum("n_tokens"), sum("id_sum"))
      .as[(Long, Long, Long)].collect().head
    val last = att.last
    assert((last._2, last._3, last._4) === full)
  }

  test("temperatureMixture: sqrt smoothing upsamples the tail, rates are exact micro-longs") {
    // uniform sources: every rate collapses to targetFrac exactly
    val uni = (0L until 400L).map(i => (i, s"s${i % 4}")).toDF("id", "src")
    val u = CorpusOps.temperatureMixture(uni, "id", "src", targetFrac = 0.5)
      .select("source", "rate_micro").as[(String, Long)].collect().toMap
    assert(u.values.toSet == Set(500000L))
    // 9:1 skew at α=1/2: w = (3, 1) over n = (360, 40); the tail's rate
    // must exceed the head's and BOTH exceed/undershoot targetFrac the
    // mT5 way (head downsampled, tail upsampled)
    val skew = (0L until 400L).map(i =>
      (i, if (i < 360) "big" else "small")).toDF("id", "src")
    val r = CorpusOps.temperatureMixture(skew, "id", "src",
      targetFrac = 0.5)
      .select("source", "n_docs", "rate_micro", "n_sampled")
      .as[(String, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    // exact: w_micro = (18973666, 6324555); rates = w/Σw * 200 / n
    assert(r("big")._3 < 500000L && r("small")._3 > 500000L)
    assert(r("big")._3 == 416667L, r("big").toString) // 0.75*200/360
    assert(r("small")._3 == 1000000L) // 0.25*200/40 = 1.25 -> clamped
    assert(r("small")._4 == 40L) // clamp takes the tail whole
    // the draw is content-addressed: a rate can only ADD members
    val lo = CorpusOps.temperatureMixture(skew, "id", "src",
      targetFrac = 0.25).select("source", "n_sampled")
      .as[(String, Long)].collect().toMap
    assert(lo("big") <= r("big")._4)
  }

  test("packSequencesBfd: best-fit-decreasing deal, hand-checked") {
    // lengths 60,50,40,30,20 @ budget 100, sorted DESC:
    //  60 -> new bin0 (rem 40); 50 -> new bin1 (rem 50)
    //  40 -> best fit is bin0 (rem 40 < 50) -> rem 0, offset 60
    //  30 -> bin1 (rem 20, offset 50); 20 -> bin1 (rem 0, offset 80)
    // => 2 bins, both exactly full
    val df = Seq((1L, "s", 60L), (2L, "s", 50L), (3L, "s", 40L),
      (4L, "s", 30L), (5L, "s", 20L)).toDF("id", "src", "nt")
    val bfd = CorpusOps.packSequencesBfd(df, "id", "src", col("nt"), 100)
      .orderBy("id").select("id", "bin_id", "bin_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(bfd == Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 60L),
      (4L, 1L, 50L), (5L, 1L, 80L)))
    // next-fit in id order wastes a third bin: 60|50,40|30,20
    val nf = CorpusOps.packSequencesNextFit(df, "id", "src", col("nt"), 100)
      .orderBy("id").select("id", "bin_id", "bin_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(nf == Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 1L, 50L),
      (4L, 2L, 0L), (5L, 2L, 30L)))
  }

  test("packSequencesBfd: ties go to the lowest bin index; oversize docs truncate") {
    // two bins at equal remainder 40: the 40-token doc must land in bin 0
    val tie = Seq((1L, "s", 60L), (2L, "s", 60L), (3L, "s", 40L))
      .toDF("id", "src", "nt")
    val t = CorpusOps.packSequencesBfd(tie, "id", "src", col("nt"), 100)
      .orderBy("id").select("id", "bin_id").as[(Long, Long)].collect().toSeq
    assert(t == Seq((1L, 0L), (2L, 1L), (3L, 0L)))
    // a doc longer than the budget occupies exactly one full bin
    val big = Seq((1L, "s", 150L), (2L, "s", 100L)).toDF("id", "src", "nt")
    val b = CorpusOps.packSequencesBfd(big, "id", "src", col("nt"), 100)
      .orderBy("id").select("id", "n_tokens", "bin_id", "bin_offset")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(b == Seq((1L, 100L, 0L, 0L), (2L, 100L, 1L, 0L)))
  }

  test("packSequencesBfd: shards pack independently; every doc fits its bin") {
    val docs = graft.Tables.documents(spark, sfTest)
    val bfd = CorpusOps.packSequencesBfd(docs, "doc_id", "source",
      graft.functions.TextFunctions.tokenCount(col("text")), 128)
    // no bin overflows: per (shard, bin) token sum <= budget
    val over = bfd.groupBy("shard", "bin_id")
      .agg(sum("n_tokens").as("s")).where(col("s") > 128).count()
    assert(over == 0)
    // offsets are consistent: within a bin, docs tile without overlap
    val bad = bfd.groupBy("shard", "bin_id")
      .agg(sum("n_tokens").as("s"), max(col("bin_offset") + col("n_tokens"))
        .as("end"))
      .where(col("s") =!= col("end")).count()
    assert(bad == 0)
    // every doc appears exactly once
    assert(bfd.count() == docs.count())
    assert(bfd.select("doc_id").distinct().count() == docs.count())
  }

  test("chunkDocuments: strided windows cover every token, exact overlap") {
    // 10 tokens, chunk 4, stride 2 → chunks at 0/2/4/6; the last covers
    // t6..t9 so coverage is complete; adjacent chunks overlap by 2.
    val doc = (0 until 10).map(i => s"t$i").mkString(" ")
    val got = CorpusOps.chunkDocuments(
      Seq((1L, doc)).toDF("doc_id", "text"), "doc_id", "text", 4, 2)
      .orderBy("chunk_id")
      .select("chunk_id", "token_start", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 2L, 4L, "t2 t3 t4 t5"),
      (2L, 4L, 4L, "t4 t5 t6 t7"),
      (3L, 6L, 4L, "t6 t7 t8 t9")))
    // short doc → exactly one (possibly partial) chunk
    val short = CorpusOps.chunkDocuments(
      Seq((2L, "a b"), (3L, "")).toDF("doc_id", "text"), "doc_id", "text", 4, 2)
      .orderBy("doc_id")
      .select("doc_id", "chunk_id", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(short == Seq((2L, 0L, 2L, "a b"), (3L, 0L, 1L, "")))
  }

  test("tfIdf/topTerms: hand-checked scores, shared terms discounted") {
    val docs = Seq(
      (1L, "cat cat dog"),
      (2L, "dog fish"),
      (3L, "fish fish fish bird"))
      .toDF("id", "text")
    val scores = CorpusOps.tfIdf(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val ln = (x: Double) => math.log(x)
    def rnd4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    assert(scores((1L, "cat")) == ((2L, rnd4(2 * ln(3.0 / 1)))))
    assert(scores((1L, "dog")) == ((1L, rnd4(1 * ln(3.0 / 2)))))
    assert(scores((3L, "fish")) == ((3L, rnd4(3 * ln(3.0 / 2)))))
    // top-1 per doc: doc 1 -> cat, doc 2 -> dog or fish (same score, term
    // tiebreak -> dog), doc 3 -> fish
    val top1 = CorpusOps.topTerms(docs, "id", "text", 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top1 == Map(1L -> "cat", 2L -> "dog", 3L -> "fish"))
  }

  test("ngramSet: per-doc-distinct grams, short docs contribute none") {
    val docs = Seq(
      (1L, "a b c a b c"), // bigrams "a b","b c","c a" repeat -> distinct once
      (2L, "a b"),         // exactly n tokens: the single bigram
      (3L, "x"))           // shorter than n: contributes no grams
      .toDF("id", "text")
    val grams = CorpusOps.ngramSet(docs, "id", "text", 2)
      .as[(Long, String)].collect().toSet
    assert(grams == Set((1L, "a b"), (1L, "b c"), (1L, "c a"),
      (2L, "a b")))
  }

  test("decontaminate: flags train docs sharing an n-gram with eval, zero-fills clean ones") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),   // shares "quick brown fox" w/ eval
      (2L, "lorem ipsum dolor sit amet"),  // clean
      (3L, "a quick brown fox runs fast")) // same shared 3-gram
      .toDF("id", "text")
    val eval = Seq(
      (10L, "see the quick brown fox here"),
      (11L, "unrelated eval document text"))
      .toDF("id", "text")
    val got = CorpusOps.decontaminate(train, eval, "id", "text", n = 3)
      .as[(Long, Long, Boolean)].collect().toSet
    // doc 1 shares "the quick brown", "quick brown fox"; doc 3 shares
    // "quick brown fox"; doc 2 shares nothing but MUST still be present
    assert(got == Set((1L, 2L, true), (3L, 1L, true), (2L, 0L, false)))
  }

  test("stratifiedQuota: bounded per stratum, deterministic, short strata kept whole") {
    val docs = graft.Tables.documents(spark, sfTest)
    val q = CorpusOps.stratifiedQuota(docs, "lang", "doc_id", quota = 5)
    val perLang = q.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang.values.forall(_ <= 5))
    // deterministic: same ids picked on re-evaluation
    val ids1 = q.select("doc_id").as[Long].collect().toSet
    val ids2 = CorpusOps.stratifiedQuota(docs, "lang", "doc_id", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2)
    // a stratum smaller than the quota survives complete
    val tiny = Seq((1L, "zz"), (2L, "zz"), (3L, "en")).toDF("doc_id", "lang")
    assert(CorpusOps.stratifiedQuota(tiny, "lang", "doc_id", 5).count() == 3)
  }

  test("stratifiedQuotaPrefix: identical picks and ranks to the window spelling") {
    // the prefix-sum path must be a drop-in: same (stratum, rn, key)
    // triples as stratifiedQuota on the same corpus — the
    // cluster_balanced_sample oracle replays the md5 pick order, so any
    // divergence would flip the graded hash
    val docs = graft.Tables.documents(spark, sfTest)
    val win = CorpusOps.stratifiedQuota(docs, "lang", "doc_id", quota = 5)
      .select("lang", "rn", "doc_id").as[(String, Long, Long)]
      .collect().toSet
    val pre = CorpusOps.stratifiedQuotaPrefix(docs, "lang", "doc_id",
      quota = 5)
      .select("lang", "rn", "doc_id").as[(String, Long, Long)]
      .collect().toSet
    assert(pre === win)
    // short strata survive complete here too
    val tiny = Seq((1L, "zz"), (2L, "zz"), (3L, "en")).toDF("doc_id", "lang")
    assert(CorpusOps.stratifiedQuotaPrefix(tiny, "lang", "doc_id", 5)
      .count() == 3)
  }

  test("mixtureStats: shares sum to 1 over strata, counts exact") {
    val docs = Seq(
      (1L, "en", "a b c"), (2L, "en", "d e"), (3L, "de", "f g h i j"))
      .toDF("id", "lang", "text")
    val asMap = CorpusOps.mixtureStats(docs, Seq("lang"),
      graft.functions.TextFunctions.tokenCount(col("text")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(asMap("en") == ((2L, 5L, 0.5)))
    assert(asMap("de") == ((1L, 5L, 0.5)))
  }

  test("dropDuplicateChunks: first occurrence wins, docs reassemble in order, fully-dup docs vanish") {
    val docs = Seq(
      (1L, "a b c d"),  // chunks "a b", "c d" — both first occurrences
      (2L, "c d a b"),  // both chunks seen in doc 1 → doc vanishes
      (3L, "a b x y"))  // "a b" dropped, "x y" survives
      .toDF("doc_id", "text")
    val out = CorpusOps.dropDuplicateChunks(docs, "doc_id", "text", 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq((1L, 2L, "a b c d"), (3L, 1L, "x y")))
  }

  test("cdcChunks: chunks reassemble exactly; a prefix insertion realigns boundaries") {
    val body = (1 to 60)
      .map(i => s"token$i word${i * 7 % 13} item${i * 31 % 97}")
      .mkString(" ")
    val docs = Seq(
      (1L, body),
      (2L, "PREFIX 12345 " + body), // every byte shifted by 13
      (3L, "tiny"),                 // shorter than the window → one chunk
      (4L, ""), (5L, null.asInstanceOf[String])) // no rows
      .toDF("doc_id", "text")
    val ch = CorpusOps.cdcChunks(docs, "doc_id", "text").localCheckpoint()
    // lossless cover: per doc the chunks concatenate to the source text
    val back = ch.groupBy(col("doc_id"))
      .agg(array_join(transform(array_sort(collect_list(
          struct(col("chunk_id"), col("chunk_text")))),
        s => s.getField("chunk_text")), "").as("re"),
        sum(col("n_chars")).as("nc"))
      .as[(Long, String, Long)].collect()
      .map { case (id, re, nc) => id -> ((re, nc)) }.toMap
    assert(back(1L) === ((body, body.length.toLong)))
    assert(back(2L) === (("PREFIX 12345 " + body,
      ("PREFIX 12345 " + body).length.toLong)))
    assert(back(3L) === (("tiny", 4L)))
    assert(!back.contains(4L) && !back.contains(5L))
    // SHIFT RESISTANCE — the claim fixed-offset chunking cannot make:
    // once the window clears the 13-char edit, every boundary decision
    // re-derives, so doc 2 re-produces all but the chunks touching the
    // prefix. Compare distinct chunk digests.
    val digs = ch.select(col("doc_id"),
        md5(col("chunk_text").cast("binary")).as("g"))
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val lost = digs(1L) -- digs(2L)
    assert(digs(1L).size >= 5, s"want a real chunking, got ${digs(1L).size}")
    assert(lost.size <= 2,
      s"shift resistance: doc 1 has ${digs(1L).size} distinct chunks," +
        s" ${lost.size} missing from the shifted copy")
    // deterministic under a different layout
    val re = CorpusOps.cdcChunks(docs.repartition(4), "doc_id", "text")
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(re === ch.orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq)
  }

  test("cdcChunkPairs: an edited copy still pairs; the df cut silences boilerplate") {
    val body = (1 to 60)
      .map(i => s"token$i word${i * 7 % 13} item${i * 31 % 97}")
      .mkString(" ")
    val docs = Seq(
      (1L, body),
      (2L, "PREFIX 12345 " + body),            // shifted copy
      (3L, "completely different content here entirely unrelated words"))
      .toDF("doc_id", "text")
    val got = CorpusOps.cdcChunkPairs(docs, "doc_id", "text",
      minShared = 2L, maxDocFreq = 50L)
      .as[(Long, Long, Long)].collect().toSeq
    // the shifted copy re-derives the shared chunks → exactly one pair,
    // with nearly all of doc 1's chunks shared
    assert(got.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    assert(got.head._3 >= 5, s"expected many shared chunks: ${got.head._3}")
    // maxDocFreq = 1: every shared digest sits in 2 docs → all cut → no
    // pairs survive (the boilerplate-silencing rule)
    assert(CorpusOps.cdcChunkPairs(docs, "doc_id", "text",
      minShared = 1L, maxDocFreq = 2L).count() === 1L)
    assert(CorpusOps.cdcChunkPairs(docs.union(docs
        .select(col("doc_id") + 10, col("text"))), "doc_id", "text",
      minShared = 1L, maxDocFreq = 2L)
      .where(col("shared_fp") >= 5).count() === 0L,
      "digests now in 4 docs must fall to the df <= 2 cut")
  }

  test("heavyHitters: exact shares, threshold on the raw ratio, minors dropped") {
    val docs = Seq((1L, "a a a b"), (2L, "a b c")).toDF("id", "text")
    // counts: a=4, b=2, c=1, total=7
    val hh = CorpusOps.heavyHitters(docs, "text", minShare = 0.2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(hh.keySet == Set("a", "b")) // c at 1/7 ≈ 0.143 < 0.2
    assert(hh("a") == ((4L, 0.5714)))
    assert(hh("b") == ((2L, 0.2857)))
  }

  test("duplicatedSpans: cross-doc and within-doc recurrence, short docs NULL out") {
    val docs = Seq(
      (1L, "a b c d"),     // spans "a b c", "b c d" — first is shared with doc 2
      (2L, "x a b c y"),   // "x a b", "a b c", "b c y"
      (3L, "a b"),         // too short for n=3 — zero spans, NULL frac
      (4L, "z z z z"))     // "z z z" twice — WITHIN-doc recurrence counts too
      .toDF("doc_id", "text")
    val out = CorpusOps.duplicatedSpans(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq == Seq(
      (1L, 2L, 1L, Some(0.5)),
      (2L, 3L, 1L, Some(0.3333)),
      (3L, 0L, 0L, None),
      (4L, 2L, 2L, Some(1.0))))
  }

  test("bm25TopK matches a closed-form recomputation; non-matching docs absent") {
    val docs = Seq(
      (1L, "cat dog"), (2L, "cat cat fish"), (3L, "fish bird"))
      .toDF("doc_id", "text")
    val out = CorpusOps.bm25TopK(docs, "doc_id", "text", Seq("cat"), k = 5)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // independent recomputation with the same micro-unit quantization
    def score(tf: Long, dl: Long): Double = {
      val nDocs = 3.0; val dfT = 2.0; val avgdl = 7.0 / 3.0
      val idf = math.log((nDocs - dfT + 0.5) / (dfT + 0.5) + 1)
      // (1.2 + 1), not the literal 2.2 — the two differ in the last ulp
      // and this recomputation must share the operator's exact arithmetic
      val raw = idf * (tf * (1.2 + 1)) /
        (tf + 1.2 * ((1 - 0.75) + 0.75 * dl / avgdl))
      val micro = math.floor(raw * 1000000 + 0.5).toLong
      math.floor(micro / 1000000.0 * 10000 + 0.5) / 10000
    }
    // doc 2: tf=2 beats doc 1: tf=1 even with the longer-doc penalty;
    // doc 3 has no query term and must be ABSENT, not zero-scored
    assert(out.toSeq == Seq(
      (2L, 1L, score(2, 3), 1L),
      (1L, 1L, score(1, 2), 2L)))
  }

  test("tailGate: rank boundaries exact, ties move together, single-row stratum kept") {
    // stratum "s": values 0..20 → percent_rank = i/20; [0.05, 0.95] keeps
    // exactly i = 1..19 (both boundaries land ON the gate and stay in)
    val rows = (0 to 20).map(i => (i.toLong, "s", i.toLong)) :+
      ((100L, "solo", 7L)) // single-row stratum: percent_rank 0.0
    val df = rows.toDF("id", "src", "len")
    val kept = CorpusOps.tailGate(df, "src", col("len"), 0.05, 0.95)
      .select("id").as[Long].collect().toSet
    assert(kept == (1L to 19L).toSet) // solo's pr 0.0 < 0.05 → gated out
    // with lo = 0 the single-row stratum passes
    val kept0 = CorpusOps.tailGate(df, "src", col("len"), 0.0, 0.95)
      .select("id").as[Long].collect().toSet
    assert(kept0.contains(100L))
    // ties share a rank: duplicate the max value — both copies must fall
    // on the same side of the gate
    val tied = ((0 to 18).map(i => (i.toLong, "t", i.toLong))
      ++ Seq((50L, "t", 18L))).toDF("id", "src", "len")
    val keptT = CorpusOps.tailGate(tied, "src", col("len"), 0.05, 0.90)
      .select("id").as[Long].collect().toSet
    assert(keptT.contains(18L) == keptT.contains(50L))
    // NULL metric ranks LAST (standard-SQL order, unlike Spark's
    // nulls-first ascending default): pr = 0, 0.5, 1.0 → [0, 0.5] keeps
    // the two real values and trims the NULL row at the high tail
    val withNull = Seq((1L, "n", Some(1L)), (2L, "n", Some(2L)),
      (3L, "n", Option.empty[Long])).toDF("id", "src", "len")
    val keptN = CorpusOps.tailGate(withNull, "src", col("len"), 0.0, 0.5)
      .select("id").as[Long].collect().toSet
    assert(keptN == Set(1L, 2L))
  }

  test("mergePairCandidates: adjacency counts with multiplicity, rank tie-break by pair") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text")
    // pairs: (a,b)x2 from doc1 + 1 from doc2 = 3; (b,a)=1; (b,c)=1;
    // doc3 has no adjacency
    val out = CorpusOps.mergePairCandidates(docs, "text", k = 2)
      .orderBy("rnk").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("a", "b", 3L, 1L), ("b", "a", 1L, 2L)))
  }

  test("ngramNovelty: first doc owns the gram, repeats score zero, short docs NULL") {
    val docs = Seq(
      (1L, "a b c"),   // introduces "a b c"
      (2L, "a b c"),   // nothing new
      (3L, "a b c x"), // "a b c" seen; "b c x" new → novelty 0.5
      (4L, "a b"))     // too short for n=3
      .toDF("doc_id", "text")
    val out = CorpusOps.ngramNovelty(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, Some(1.0)),
      (2L, 1L, 0L, Some(0.0)),
      (3L, 2L, 1L, Some(0.5)),
      (4L, 0L, 0L, None)))
  }

  test("concentrationStats: uniform mixture scores zero Gini, monopoly scores high") {
    val uniform = Seq(("a", 10L), ("b", 10L), ("c", 10L), ("d", 10L))
      .toDF("src", "w")
    val u = CorpusOps.concentrationStats(uniform, "src", col("w"))
      .collect().head
    assert(u.getLong(0) == 4L)
    assert(u.getDouble(1) == 0.25)   // HHI = 4 · (1/4)²
    assert(u.getDouble(2) == 0.25)   // top share
    assert(u.getDouble(3) == 0.0)    // Gini of a uniform mixture
    val skewed = Seq(("a", 97L), ("b", 1L), ("c", 1L), ("d", 1L))
      .toDF("src", "w")
    val s = CorpusOps.concentrationStats(skewed, "src", col("w"))
      .collect().head
    assert(s.getDouble(2) == 0.97)
    // hand Gini: ranks (1,2,3 on the ties by key, 4 on 97):
    // G = (2·(1·1+2·1+3·1+4·97) − 5·100) / (4·100) = (788 − 500) / 400
    assert(s.getDouble(3) == 0.72)
    assert(s.getDouble(3) > u.getDouble(3))
  }

  test("charTrigramNll: hand-built MLE model, short docs drop, repetition scores low") {
    val docs = Seq((1L, "aaaa"), (2L, "aab"), (3L, "ab"))
      .toDF("doc_id", "text")
    // model: ct("aaa")=2, ct("aab")=1, prefix "aa" total 3
    // doc 1: two trigrams "aaa", -ln(2/3) each; doc 2: one "aab", -ln(1/3)
    // doc 3: no trigram — absent from the output, same as the oracle
    val out = CorpusOps.charTrigramNll(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def q(x: Double): Double = {
      val micro = math.floor(x * 1000000 + 0.5).toLong
      math.floor(micro / 1000000.0 * 10000 + 0.5) / 10000
    }
    assert(out.toSeq == Seq(
      (1L, 2L, q(-math.log(2.0 / 3.0))),
      (2L, 1L, q(-math.log(1.0 / 3.0)))))
    // the repetitive doc is the more probable one under its own corpus
    assert(out(0)._3 < out(1)._3)
  }

  test("waterfillAllocation: saturation, exact budget sum, remainder ties") {
    def run(rows: Seq[(String, Long)], shareMicro: Long) =
      CorpusOps.waterfillAllocation(
        rows.toDF("source", "n"), "source", col("n"), lit(1L), shareMicro)
        .orderBy("source")
        .collect()
        .map(r => (r.getString(0), r.getLong(2), r.getLong(3),
          r.getBoolean(4)))
        .toSeq

    // hand case: equal weights, B = 50% of 400 = 200; the 100-token
    // source saturates exactly at the water level, the rest flows to b
    assert(run(Seq(("a", 100L), ("b", 300L)), 500000L) ===
      Seq(("a", 100L, 100L, true), ("b", 300L, 100L, false)))

    // full-share budget saturates everything: alloc == avail
    assert(run(Seq(("a", 10L), ("b", 70L), ("c", 20L)), 1000000L) ===
      Seq(("a", 10L, 10L, true), ("b", 70L, 70L, true),
        ("c", 20L, 20L, true)))

    // largest-remainder: B = 1501 over three weight-1 sources → q = 500
    // each, one leftover token goes to the lexicographically smallest
    // source (equal remainders) — and the total is EXACTLY the budget
    val r = run(Seq(("a", 1000L), ("b", 1000L), ("c", 1002L)), 500000L)
    assert(r === Seq(("a", 1000L, 501L, false), ("b", 1000L, 500L, false),
      ("c", 1002L, 500L, false)))
    assert(r.map(_._3).sum === (3002L * 500000L) / 1000000L)

    // weights steer the split: same availabilities, weight 3-vs-1
    val w = CorpusOps.waterfillAllocation(
      Seq(("a", 400L), ("b", 400L)).toDF("source", "n"), "source",
      col("n"), when(col("source") === "a", 3L).otherwise(1L), 500000L)
      .orderBy("source").collect()
      .map(r2 => (r2.getString(0), r2.getLong(3), r2.getBoolean(4))).toSeq
    // B = 400; ideal 300/100, neither saturates
    assert(w === Seq(("a", 300L, false), ("b", 100L, false)))

    // document rows aggregate per source before the solve
    val agg = run(Seq(("a", 50L), ("a", 50L), ("b", 300L)), 500000L)
    assert(agg === Seq(("a", 100L, 100L, true), ("b", 300L, 100L, false)))

    // non-positive weight fails LOUDLY (r8 ADVICE): weight=0 would give
    // an Infinity water-level sort key and a silent zero allocation
    val bad = intercept[Exception] {
      CorpusOps.waterfillAllocation(
        Seq(("a", 100L), ("b", 300L)).toDF("source", "n"), "source",
        col("n"), when(col("source") === "a", 0L).otherwise(1L), 500000L)
        .collect()
    }
    def chain(t: Throwable): String = {
      var c: Throwable = t; val sb = new StringBuilder
      while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
      sb.toString
    }
    assert(chain(bad).contains("non-positive weight"), chain(bad))
  }

  private def search(docs: Seq[(Long, String)], pats: Seq[String]) =
    CorpusOps.trigramIndexSearch(docs.toDF("doc_id", "text"),
      "doc_id", "text", pats)
      .orderBy("pattern", "doc_id").as[(String, Long)].collect().toSeq

  test("trigramIndexSearch: matches == naive contains; covering non-match pruned") {
    val docs = Seq(
      (1L, "the quick brown fox"),
      // contains every trigram of "own fox" ("own", "wn ", "n f", " fo",
      // "fox") but not contiguously — a candidate the verify must reject
      (2L, "own foo fox wn fn f"),
      (3L, "quick own foxes run"),
      (4L, "xx"))
    val pats = Seq("own fox", "quick", "zzz")
    val got = search(docs, pats)
    val naive = for {
      (id, t) <- docs; p <- pats if t.contains(p)
    } yield (p, id)
    assert(got === naive.sortBy(r => (r._1, r._2)))
    // doc 2 (covering candidate) pruned; doc 3 matches via "own foxes"
    assert(got === Seq(("own fox", 1L), ("own fox", 3L),
      ("quick", 1L), ("quick", 3L)))
  }

  test("trigramIndexSearch: code-point trigrams keep multi-byte text exact") {
    // 4 code points each — "héllo" slices (hél, éll, llo); a byte- or
    // UTF-16-sliced pattern side would disagree with TrigramCounts
    val docs = Seq((1L, "ein héllo wörld über alles"), (2L, "héllq wörl"))
    assert(search(docs, Seq("héllo", "wörld über")) ===
      Seq(("héllo", 1L), ("wörld über", 1L)))
  }

  test("tokenCooccurrence: occurrence-pair counts, symmetric, diagonal included") {
    // "a a b": occurrences a=2, b=1 → (a,a)=4, (a,b)=(b,a)=2, (b,b)=1
    val got = CorpusOps.tokenCooccurrence(
      Seq(Tuple1("a a b"), Tuple1("c")).toDF("text"), "text")
      .orderBy("i", "j").as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("a", "a", 4L), ("a", "b", 2L), ("b", "a", 2L),
      ("b", "b", 1L), ("c", "c", 1L)))
  }

  test("cooc principal direction: Perron nonnegativity and layout invariance") {
    val docs = (1L to 60L).map(i =>
      Tuple1(if (i % 3 == 0) "x y x z" else "x q r x")).toDF("text")
    def run(parts: Int) =
      graft.ops.EmbeddingOps.powerIterate(
        CorpusOps.tokenCooccurrence(docs.repartition(parts), "text"),
        iters = 4, shift = 100L)
        .orderBy("i").as[(String, Long, Option[Double])].collect().toSeq
    val one = run(1)
    // nonnegative matrix + positive init → every iterate stays ≥ 0
    assert(one.forall(_._2 >= 0L), one.toString)
    // the dominant token carries the largest component
    assert(one.maxBy(_._2)._1 === "x")
    assert(one === run(7))
  }

  test("vocabCoverageCurve: hand-computed curve, deterministic tie ranking") {
    // global counts: x:3, y:3, z:1, q:1 → rank x,y,q,z ((cnt desc, token))
    val docs = Seq(("a", "x x y z"), ("b", "x y y q")).toDF("lang", "text")
    val got = CorpusOps.vocabCoverageCurve(docs, "lang", "text", Seq(1, 3))
      .orderBy("v", "stratum")
      .as[(Long, String, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, "a", 4L, 2L, 2L, 0.5), (1L, "b", 4L, 1L, 2L, 0.25),
      (3L, "a", 4L, 3L, 1L, 0.75), (3L, "b", 4L, 4L, 0L, 1.0)))
    intercept[IllegalArgumentException](
      CorpusOps.vocabCoverageCurve(docs, "lang", "text", Seq(3, 3)))
    intercept[IllegalArgumentException](
      CorpusOps.vocabCoverageCurve(docs, "lang", "text", Seq.empty))
  }

  test("trigramIndexSearch: rejects short and duplicate patterns loudly") {
    val docs = Seq((1L, "abc"))
    intercept[IllegalArgumentException](search(docs, Seq("ab")))
    intercept[IllegalArgumentException](search(docs, Seq("abc", "abc")))
    intercept[IllegalArgumentException](search(docs, Seq.empty))
  }

  test("sourceVocabOverlap: hand-computed Jaccard/containment; disjoint pairs absent") {
    import spark.implicits._
    // A={a,b,c}, B={b,c,d}, C={x}: (A,B) shares {b,c} → jaccard 2/4,
    // containment 2/3; C overlaps nobody → no row (absent = disjoint).
    // Duplicate tokens within a source count once (distinct incidence).
    val docs = Seq(
      (1L, "A", "a b c b"), (2L, "B", "b c d"), (3L, "C", "x"))
      .toDF("doc_id", "source", "text")
    val got = CorpusOps.sourceVocabOverlap(docs, "source", "text")
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(got === Seq(("A", "B", 3L, 3L, 2L, 0.5, 0.6667)))
    // full containment: D inside E reads containment 1.0
    val sub = Seq((1L, "D", "p q"), (2L, "E", "p q r s"))
      .toDF("doc_id", "source", "text")
    val c = CorpusOps.sourceVocabOverlap(sub, "source", "text")
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().head
    assert(c === (("D", "E", 2L, 4L, 2L, 0.5, 1.0)))
  }

  test("zipfFit: exact 1/rank spectrum fits slope −1 with R² 1") {
    import spark.implicits._
    // counts (6, 3, 2) over ranks (1, 2, 3) are cnt = 6/rank exactly, so
    // ln(cnt) = ln6 − ln(rank) and the micro-quantized points stay
    // EXACTLY collinear (0+1791759 = 693147+1098612 = 1098612+693147):
    // slope −1, R² 1, intercept ln6 → 1.7918.
    val docs = Seq((1L, "a a a a a a b b b c c")).toDF("doc_id", "text")
    val got = CorpusOps.zipfFit(docs, "text", k = 3)
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(got === ((3L, Some(-1.0), Some(1.7918), Some(1.0))))
    // degenerate: a single rank has zero x-variance → null fit, loud k
    intercept[IllegalArgumentException](CorpusOps.zipfFit(docs, "text", 2))
    val one = CorpusOps.zipfFit(
      Seq((1L, "x x")).toDF("doc_id", "text"), "text", 3)
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().head
    assert(one === ((1L, None, None, None)))
  }

  test("ndcgEval: tf-inflated low-relevance doc outranks → ndcg < 1") {
    // b is common (4 of 5 docs) so its idf is weak; doc 3 pumps tf on a
    // hard enough that BM25 ranks it above the rel-2 doc 2. Gains are
    // rel/(ln(i+1)/ln 2) micro-floored: DCG = 1e6 + ⌊2/1.58496·1e6⌉ =
    // 2261860; ideal order (rel desc, id asc) gives 2e6 + 630930.
    val docs = Seq((2L, "a b"), (3L, "a a a a a a a a"), (4L, "b"),
      (5L, "b"), (6L, "b")).toDF("doc_id", "text")
    val got = CorpusOps.ndcgEval(docs, "doc_id", "text",
      queries = Seq(1L -> Seq("a", "b")), k = 2)
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got === Seq((1L, 5L, 2261860L, 2630930L, Some(0.8597))))
  }

  test("ndcgEval: perfect ranking is exactly 1; no-hit query still rows") {
    val docs = Seq((1L, "a b c"), (2L, "a x"), (3L, "y z"))
      .toDF("doc_id", "text")
    val got = CorpusOps.ndcgEval(docs, "doc_id", "text",
      queries = Seq(1L -> Seq("a", "b"), 2L -> Seq("absent")), k = 2)
      .orderBy("qid")
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    // doc 1 (rel 2) carries both idf terms so it outranks doc 2 (rel 1):
    // BM25 order == ideal order → ndcg exactly 1; 'absent' matches
    // nothing, but the one-row-per-query contract still owes qid 2 its
    // row: n_rel 0, micros 0, ndcg null.
    assert(got.map(_._1) === Seq(1L, 2L))
    assert(got.head._2 === 2L && got.head._5 === Some(1.0))
    assert(got(1) === ((2L, 0L, 0L, 0L, None)))
    intercept[IllegalArgumentException](
      CorpusOps.ndcgEval(docs, "doc_id", "text", Seq(1L -> Seq("a"),
        1L -> Seq("b")), k = 2))
    intercept[IllegalArgumentException](
      CorpusOps.ndcgEval(docs, "doc_id", "text", Seq(1L -> Seq()), k = 2))
  }

  test("logOddsTokens: hand-computed Fightin'-Words delta and z") {
    val docs = Seq(("A", "x x y"), ("B", "y z")).toDF("src", "text")
    val got = CorpusOps.logOddsTokens(docs, "src", "text", "A", "B",
      priorNum = 1L, priorDen = 1L, minCount = 1L)
      .orderBy(col("z").desc, col("token"))
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    // prior α_w = bg_w: x → ln(4/4)−ln(2/5), z=δ/√(1/4+1/2);
    // y → ln(3/5)−ln(3/4); z → ln(1/7)−ln(2/5) (all hand-checked)
    assert(got === Seq(
      ("x", 2L, 0L, 2L, 0.9163, 1.058),
      ("y", 1L, 1L, 2L, -0.2231, -0.2733),
      ("z", 0L, 1L, 1L, -1.0296, -0.8407)))
  }

  test("logOddsTokens: minCount gates, equal usage is exactly zero") {
    val docs = Seq(("A", "w w rare"), ("B", "w w")).toDF("src", "text")
    val got = CorpusOps.logOddsTokens(docs, "src", "text", "A", "B",
      priorNum = 1L, priorDen = 10L, minCount = 2L)
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    // 'rare' (count 1) is gated out. 'w': n1=24 d1=11, n2=24 d2=1 →
    // δ = ln(24/11) − ln(24/1) = ln(1/11) = −2.3979 — equal raw counts
    // still read B-flavored because B's corpus is ALL 'w' (the odds, not
    // the counts, are what the statistic compares).
    assert(got === Seq(("w", 2L, 2L, 4L, -2.3979, -2.6268)))
    intercept[IllegalArgumentException](
      CorpusOps.logOddsTokens(docs, "src", "text", "A", "A"))
  }

  test("pmiCollocations: hand-counted bigrams, margins off the bigram table") {
    val docs = Seq("a b a b", "a b c", "c c").toDF("text")
    val got = CorpusOps.pmiCollocations(docs, "text", minCount = 1L, k = 10)
      .as[(Long, String, String, Long, Long, Long, Long, Double)]
      .collect().toSeq
    // bigrams: (a,b)x3, (b,a), (b,c), (c,c); N=6. Margins are the bigram
    // table's, not raw token counts: left a=3 b=2 c=1, right a=1 b=3 c=2.
    // pmi(b,a)=ln(6/2)=ln3, pmi(c,c)=ln(6/2)=ln3 — tie totalized by
    // tok_a; pmi(a,b)=ln(18/9)=ln2; pmi(b,c)=ln(6/4).
    assert(got === Seq(
      (1L, "b", "a", 1L, 2L, 1L, 1098612L, 1.0986),
      (2L, "c", "c", 1L, 1L, 2L, 1098612L, 1.0986),
      (3L, "a", "b", 3L, 3L, 3L, 693147L, 0.6931),
      (4L, "b", "c", 1L, 2L, 2L, 405465L, 0.4055)))
    // minCount floor gates the hapax pairs
    val floored = CorpusOps.pmiCollocations(docs, "text", minCount = 2L,
      k = 10).as[(Long, String, String, Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(floored.map(r => (r._2, r._3)) === Seq(("a", "b")))
  }

  test("prfExpansion: feedback terms scored f_tf x idf, query terms excluded") {
    val docs = Seq(
      (1L, "spark join fast engine"),
      (2L, "spark join query engine"),
      (3L, "other words here")).toDF("doc_id", "text")
    val got = CorpusOps.prfExpansion(docs, "doc_id", "text",
      terms = Seq("spark", "join"), k = 10, m = 20)
      .as[(Long, String, Long, Long, Long, Long, Double)].collect().toSeq
    // feedback set = docs 1,2; candidates: fast (1*ln3), query (1*ln3)
    // tie totalized by term; engine (2*ln1.5) third; query terms absent
    assert(got === Seq(
      (1L, "fast", 1L, 1L, 1L, 1098612L, 1.0986),
      (2L, "query", 1L, 1L, 1L, 1098612L, 1.0986),
      (3L, "engine", 2L, 2L, 2L, 810930L, 0.8109)))
  }

  test("tokenEntropy: uniform source normalizes to 1; degenerate vocab to null") {
    val docs = Seq(("s1", "a b a b"), ("s2", "x x x")).toDF("source", "text")
    val got = CorpusOps.tokenEntropy(docs, "source", "text")
      .orderBy("source")
      .as[(String, Long, Long, Double, Option[Double])].collect().toSeq
    // s1: a:2 b:2 -> H = ln4 - (2*floor(2ln2*1e6+.5))/4e6 = ln2 ->
    //   0.6931, norm = H/ln2 = 1.0. s2: one token -> H rounds to 0,
    //   norm undefined (ln V = 0).
    assert(got === Seq(
      ("s1", 4L, 2L, 0.6931, Some(1.0)),
      ("s2", 3L, 1L, 0.0, None)))
  }

  test("bpeMergePairs: frequency-weighted adjacent char pairs off the vocabulary") {
    val docs = Seq("aa ab aa", "ab abc").toDF("text")
    val got = CorpusOps.bpeMergePairs(docs, "text", k = 10)
      .as[(Long, String, Long, Long)].collect().toSeq
    // vocab: aa:2, ab:2, abc:1. Pairs: 'ab' from words ab (n 2) and abc
    // (n 1) -> 2 forms, n 3; 'aa' 1 form, n 2; 'bc' 1 form, n 1.
    assert(got === Seq(
      (1L, "ab", 2L, 3L), (2L, "aa", 1L, 2L), (3L, "bc", 1L, 1L)))
  }

  test("bpeTrainMerges: hand-traced rounds, greedy overlap, merged symbols re-merge") {
    // vocab: abab:3, aaaa:2, ab:1. Round 1 slots: (a,b) 2 in abab (n 6)
    //   + 1 in ab (n 1) → n_forms 3, n 7; (b,a) n 3; (a,a) 3 slots in
    //   aaaa → n 6. Argmax (a,b) → abab=(ab)(ab), ab=(ab).
    // Round 2: (ab,ab) n 3; (a,a) still 3 raw slots, n 6 → merge (a,a);
    //   GREEDY replace turns (a)(a)(a)(a) into (aa)(aa), NOT (aa)(a)(a).
    // Round 3: (aa,aa) n 2 vs (ab,ab) n 3 → merged symbols re-merge to
    //   abab. Round 4: (aa,aa) → aaaa. Round 5: nothing left — stop.
    val docs = (Seq.fill(3)("abab") ++ Seq.fill(2)("aaaa") ++ Seq("ab"))
      .map(w => Tuple1(w)).toDF("text")
    val got = CorpusOps.bpeTrainMerges(docs, "text", rounds = 10)
      .orderBy("round")
      .as[(Long, String, String, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "a", "b", "ab", 3L, 7L),
      (2L, "a", "a", "aa", 3L, 6L),
      (3L, "ab", "ab", "abab", 1L, 3L),
      (4L, "aa", "aa", "aaaa", 1L, 2L)))
    intercept[IllegalArgumentException](
      CorpusOps.bpeTrainMerges(docs, "text", rounds = 0))
  }

  test("epochShuffle: per-epoch permutation, epochs decorrelate, partition-invariant") {
    val docs = (1L to 40L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val got = CorpusOps.epochShuffle(docs, "doc_id", epochs = 2)
      .as[(Long, Long, Long)].collect().toSeq
    val byEpoch = got.groupBy(_._1)
    assert(byEpoch.keySet === Set(0L, 1L))
    // each epoch is a full 1..n permutation
    byEpoch.values.foreach { rows =>
      assert(rows.map(_._3).sorted === (1L to 40L))
      assert(rows.map(_._2).toSet === (1L to 40L).toSet)
    }
    // the two epochs are genuinely different orders
    val ord0 = byEpoch(0L).sortBy(_._3).map(_._2)
    val ord1 = byEpoch(1L).sortBy(_._3).map(_._2)
    assert(ord0 !== ord1)
    // and the order replays the md5 rank exactly
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(e: Int, id: Long) =
      md.digest(s"$e#$id".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(ord0 === (1L to 40L).sortBy(id => (h(0, id), id)))
    // partition-layout invariance (the prefix-sum boundary contract)
    val re = CorpusOps.epochShuffle(docs.repartition(7), "doc_id", 2)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(re === got.sorted)
  }

  test("exactSubstrDedup: first occurrence survives, overlaps merge, full-dup doc empties") {
    // n=2 spans. "a b" occurs at (1,1), (2,2), (3,1), (3,3), (3,5):
    // (1,1) survives; the rest excise. "b a" occurs at (3,2), (3,4):
    // (3,2) survives as a SPAN but its positions are already covered by
    // the merged "a b" excisions — position-level union empties d3.
    val docs = Seq(
      (1L, "a b c d"),    // untouched (its span is every dup's FIRST)
      (2L, "x a b y"),    // excises positions 2-3 → "x y"
      (3L, "a b a b a b") // every position covered → ""
    ).toDF("doc_id", "text")
    val got = CorpusOps.exactSubstrDedup(docs, "doc_id", "text", n = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 4L, 4L, "a b c d"),
      (2L, 4L, 2L, "x y"),
      (3L, 6L, 0L, "")))
    // short docs (no spans) pass through untouched
    val short = CorpusOps.exactSubstrDedup(
      Seq((9L, "solo")).toDF("doc_id", "text"), "doc_id", "text", n = 2)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(short === Seq((9L, 1L, 1L, "solo")))
    intercept[IllegalArgumentException](
      CorpusOps.exactSubstrDedup(docs, "doc_id", "text", n = 0))
  }

  test("epochShuffleResume: suffix equals the full epoch's slice — no skip, no replay") {
    val docs = (1L to 40L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val full = CorpusOps.epochShuffle(docs, "doc_id", epochs = 2)
      .as[(Long, Long, Long)].collect().toSeq
      .filter(_._1 == 1L).sortBy(_._3)
    val resumed = CorpusOps.epochShuffleResume(docs, "doc_id",
      epoch = 1, fromPosition = 17L)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._3)
    assert(resumed === full.filter(_._3 >= 17L))
    // boundary contracts: resume at 1 is the whole epoch; past the end
    // is empty; position 0 is a contract error
    assert(CorpusOps.epochShuffleResume(docs, "doc_id", 1, 1L).count()
      === 40L)
    assert(CorpusOps.epochShuffleResume(docs, "doc_id", 1, 41L).count()
      === 0L)
    intercept[IllegalArgumentException](
      CorpusOps.epochShuffleResume(docs, "doc_id", 1, 0L))
    intercept[IllegalArgumentException](
      CorpusOps.epochShuffleResume(docs, "doc_id", -1, 1L))
  }

  test("ngramUniqueness: corpus-count-1 share, short docs drop, repeats collapse") {
    // d1/d2 share "a b c"; each owns one unique trigram → 0.5 each;
    // d3 has < 3 tokens → no row; d4 repeats its gram (distinct first)
    val docs = Seq((1L, "a b c d"), (2L, "a b c x"), (3L, "q q"),
      (4L, "m m m m")).toDF("doc_id", "text")
    val got = CorpusOps.ngramUniqueness(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // d4: grams {"m m m"} (two slots, ONE distinct), unique to d4 → 1.0
    assert(got === Seq(
      (1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5), (4L, 1L, 1L, 1.0)))
  }

  test("temperatureAllocation: sqrt weights, Hamilton apportionment sums to budget") {
    // counts 1/4/16, T=2 → weights 1:2:4 of budget 7 → exact 1/2/4,
    // zero leftover
    val docs = (Seq.fill(1)("s1") ++ Seq.fill(4)("s2") ++ Seq.fill(16)("s3"))
      .map(s => (s, "x")).toDF("source", "text")
    val t2 = CorpusOps.temperatureAllocation(docs, "source", budget = 7L,
      temperature = 2).orderBy("source")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(t2.map(r => (r._1, r._2, r._4)) ===
      Seq(("s1", 1L, 1L), ("s2", 4L, 2L), ("s3", 16L, 4L)))
    assert(t2.map(_._4).sum === 7L)
    // T=1 (plain proportional), budget 10 over 1:4:16 — bases 0/1/7,
    // remainders 10/19/13 of 21 → the 2 leftover seats go to s2 then s3
    val t1 = CorpusOps.temperatureAllocation(docs, "source", budget = 10L,
      temperature = 1).orderBy("source")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(t1.map(r => (r._1, r._4)) ===
      Seq(("s1", 0L), ("s2", 2L), ("s3", 8L)))
    assert(t1.map(_._4).sum === 10L)
    // T=4 still sums exactly; higher count never gets a smaller alloc
    val t4 = CorpusOps.temperatureAllocation(docs, "source", budget = 101L,
      temperature = 4).orderBy("source")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(t4.map(_._4).sum === 101L)
    assert(t4.sortBy(_._2).map(_._4) === t4.sortBy(_._2).map(_._4).sorted)
    intercept[IllegalArgumentException](
      CorpusOps.temperatureAllocation(docs, "source", 10L, temperature = 3))
    intercept[IllegalArgumentException](
      CorpusOps.temperatureAllocation(docs, "source", 0L))
  }

  test("bpeEncodeStats: trained merges applied greedily, per-source compression") {
    // vocab: abab:1, ab:1, aaaa:1. Round 1 ties (a,a) n=3 vs (a,b) n=3
    // → (a,a) by the (l, r) tiebreak; round 2 merges (a,b).
    // Encoding: abab→(ab)(ab)=2 toks, ab→(ab)=1, aaaa→(aa)(aa)=2.
    val docs = Seq(("A", "abab ab"), ("B", "aaaa")).toDF("source", "text")
    val got = CorpusOps.bpeEncodeStats(docs, "source", "text", rounds = 2)
      .orderBy("source")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq(
      ("A", 2L, 6L, 3L, 1.5, 2.0),
      ("B", 1L, 4L, 2L, 2.0, 2.0)))
    // rounds beyond exhaustion: training stops early (4 realizable
    // merges), every form collapses to ONE symbol, and the
    // vocabulary-scale encode reads that final state — no per-merge
    // fact-side chain to run off the end of
    val full = CorpusOps.bpeEncodeStats(docs, "source", "text", rounds = 50)
      .orderBy("source")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(full === Seq(
      ("A", 2L, 6L, 2L, 1.0, 3.0),
      ("B", 1L, 4L, 1L, 1.0, 4.0)))
  }

  test("BPE guard: words with delimiter parens or line terminators fail loudly") {
    // The (sym) wrapping relies on parens never occurring inside a
    // symbol and on `(.)` seeing every char — a '(' or a newline in a
    // word would silently corrupt symbol boundaries IDENTICALLY in
    // engine and oracle, which the hash grade can never catch. The
    // precondition is enforced, not assumed.
    val bad = Seq(("A", "ok(word here")).toDF("source", "text")
    val e = intercept[Exception](
      CorpusOps.bpeTrainMerges(bad, "text", rounds = 2).collect())
    assert(e.getMessage.contains("delimiter paren"), e.getMessage)
    val nl = Seq(("A", "ok")).toDF("source", "text")
      .select(col("source"), concat(lit("a"), lit("\n"), lit("b")).as("text"))
    val e2 = intercept[Exception](
      CorpusOps.bpeEncodeStats(nl, "source", "text", rounds = 1).collect())
    assert(e2.getMessage.contains("line terminator"), e2.getMessage)
    // a SINGLE-CHARACTER '(' never reaches the length>=2 vocabulary, so
    // the vocab-side guard alone would let it slip through the encode's
    // coalesce fallback as "1 token" while a delimiter-counting oracle
    // sees 2 — the occurrence-pass guard catches it loudly instead
    val single = Seq(("A", "ok ( ok")).toDF("source", "text")
    val e3 = intercept[Exception](
      CorpusOps.bpeEncodeStats(single, "source", "text", rounds = 1)
        .collect())
    assert(e3.getMessage.contains("delimiter paren"), e3.getMessage)
  }

  test("bpeEncodeStats lifetime: superseded generations freed in-loop, zero blocks after the public free") {
    // The r11 ADVICE finding made a pin: Dataset.unpersist is a NO-OP on
    // localCheckpointed frames (CacheManager never saw them), so the
    // loop must free superseded generations via the LogicalRDD walk —
    // after the encode's action, exactly ONE checkpoint block set (the
    // final vocabulary backing the broadcast side) may remain, and the
    // public Dedup.unpersistCheckpoint helper frees that one too (the
    // lever a many-encodes-per-JVM caller needs).
    val docs = Seq(("A", "abab ab"), ("B", "aaaa")).toDF("source", "text")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val stats = CorpusOps.bpeEncodeStats(docs, "source", "text", rounds = 3)
    stats.collect()
    val resident = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(resident.size === 1,
      s"expected only the final vocabulary's block set, got: $resident")
    Dedup.unpersistCheckpoint(stats)
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty, s"blocks not freed by the public helper: $after")
  }

  test("bpeEncodeIds: deterministic ids (base lexicographic, then merge order), real sequences") {
    // vocab abab:1, ab:1, aaaa:1 (the bpeEncodeStats fixture +
    // single-char word "a"). Round 1 merges (a,a), round 2 (a,b) →
    // final segs abab=(ab)(ab), ab=(ab), aaaa=(aa)(aa). Universe
    // {a, aa, ab}; ids by (first merge round, symbol): a=1 (base),
    // aa=2 (round 1), ab=3 (round 2).
    val docs = Seq((1L, "abab ab a"), (2L, "aaaa")).toDF("doc_id", "text")
    val model = CorpusOps.bpeTrain(docs, "text", rounds = 2)
    val got = CorpusOps.bpeEncodeIds(docs, "doc_id", "text", model)
      .orderBy("doc_id")
      .as[(Long, Long, Seq[Int])].collect().toSeq
    assert(got === Seq((1L, 4L, Seq(3, 3, 3, 1)), (2L, 2L, Seq(2, 2))))
    // an OOV symbol (a corpus the model never saw) fails loudly — a
    // silent join drop would truncate training sequences undetectably
    val oov = Seq((9L, "zz qq")).toDF("doc_id", "text")
    val e = intercept[Exception](
      CorpusOps.bpeEncodeIds(oov, "doc_id", "text", model).collect())
    assert(e.getMessage.contains("not in the"), e.getMessage)
  }

  test("bpeTrainMerges: per-round work is vocabulary-scale — no corpus rescan") {
    // The 100 TB contract: after bpeVocabSeg's one corpus aggregate,
    // every round's pair count reads the CHECKPOINTED vocabulary — a
    // round plan containing a parquet/file scan would mean the corpus
    // is re-tokenized per merge.
    val docs = Seq("abc abd", "abc").toDF("text")
    val vocab = CorpusOps.bpeVocabSeg(docs, "text")
    val roundPlan = CorpusOps.bpeRoundPairs(vocab)
      .queryExecution.executedPlan.toString
    assert(roundPlan.contains("ExistingRDD") || roundPlan.contains("Scan rdd"),
      s"round input should be the checkpoint RDD:\n$roundPlan")
    assert(!roundPlan.contains("FileScan") && !roundPlan.contains("parquet"),
      s"round plan must not rescan the corpus:\n$roundPlan")
    // at most one exchange: the vocabulary-scale pair hash-agg — and
    // when the vocabulary-sized coalesce leaves ONE partition (as on
    // this fixture), the aggregate needs no exchange at all
    val ex = "Exchange".r.findAllIn(roundPlan).size
    assert(ex <= 1, s"expected <=1 vocab-scale exchange, got $ex:\n$roundPlan")
  }

  test("ictPairs: hash-picked chunk out, remainder as context; short docs drop") {
    val tokens = (1 to 25).map(i => s"t$i")
    val docs = Seq((7L, tokens.mkString(" ")), (8L, "a b c"))
      .toDF("doc_id", "text")
    val got = CorpusOps.ictPairs(docs, "doc_id", "text", chunkTokens = 10)
      .as[(Long, Long, Long, String, String)].collect().toSeq
    assert(got.map(_._1) === Seq(7L))   // 3-token doc has 1 chunk: dropped
    val (_, nc, qi, query, context) = got.head
    assert(nc === 3L)
    // independent pick: first 8 md5 hex chars of "7" as a number, mod 3
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("7".getBytes("UTF-8")).take(4)
      .map(b => f"$b%02x").mkString
    val want = java.lang.Long.parseLong(hex, 16) % 3
    assert(qi === want)
    val chunks = tokens.grouped(10).map(_.mkString(" ")).toSeq
    assert(query === chunks(qi.toInt))
    assert(context === chunks.zipWithIndex.filter(_._2 != qi.toInt)
      .map(_._1).mkString(" "))
  }

  test("curationFunnel: per-stage attrition with shares of raw") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, ""),
      (3L, "abcdefg"), (4L, "abcdefg"), (5L, "ab"),
      (6L, "aaaaaaaaaaaaaaa")).toDF("doc_id", "text")
    val got = CorpusOps.curationFunnel(docs, "doc_id", "text",
      minChars = 5, maxChars = 10).orderBy("stage_idx")
      .as[(Long, String, Long, Option[Double])].collect().toSeq
    // 6 raw; 4 nonempty; band [5,10] keeps the two identical 7-char
    // docs; dedup collapses them to one survivor
    assert(got === Seq(
      (0L, "raw", 6L, Some(1.0)), (1L, "nonempty", 4L, Some(0.6667)),
      (2L, "length_band", 2L, Some(0.3333)),
      (3L, "dedup_survivor", 1L, Some(0.1667))))
    intercept[IllegalArgumentException](
      CorpusOps.curationFunnel(docs, "doc_id", "text", 10, 5))
  }

  test("hardNegatives: high-scoring non-relevant docs, relevant never leak in") {
    val docs = Seq(
      (1L, "x y z"), (2L, "x q z z z z z z z z"), (3L, "y x x"),
      (4L, "q q q q")).toDF("doc_id", "text")
    val got = CorpusOps.hardNegatives(docs, "doc_id", "text",
      queries = Seq(1L -> Seq("x", "q")), k = 5)
      .orderBy("qid", "neg_rank")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // only doc 2 contains both terms (relevant, excluded); the dense-q
    // doc 4 is the hardest negative, then the x-heavy 3, then 1
    assert(got.map(r => (r._1, r._2, r._3, r._4)) === Seq(
      (1L, 1L, 4L, 1L), (1L, 2L, 3L, 1L), (1L, 3L, 1L, 1L)))
    assert(!got.map(_._3).contains(2L))
  }

  test("retrievalEval: conjunctive relevance — MRR/AP penalize the buried hit") {
    val docs = Seq(
      (1L, "x y z"), (2L, "x q z z z z z z z z"), (3L, "y x x"),
      (4L, "q q q q")).toDF("doc_id", "text")
    val got = CorpusOps.retrievalEval(docs, "doc_id", "text",
      queries = Seq(1L -> Seq("x"), 2L -> Seq("x", "q"),
        3L -> Seq("y", "q"), 4L -> Seq("absent")), k = 10)
      .orderBy("qid")
      .as[(Long, Long, Long, Option[Long], Long, Long,
           Option[Double], Option[Double])].collect().toSeq
    // q1 (x): docs 1,2,3 all relevant (single term) — perfect by
    //   construction: rr=1, ap=1 (three positions, precision 1 at each).
    // q2 (x,q): only doc 2 contains both, but doc 4's dense q run
    //   outranks its diluted dl=10 — first_rank=2, rr=ap=0.5.
    // q3 (y,q): docs match y or q but none BOTH — n_rel=0, nulls.
    // q4 (absent): matches NOTHING at all — the one-row-per-query
    //   contract still owes it a row, zeros and nulls.
    assert(got === Seq(
      (1L, 3L, 3L, Some(1L), 1000000L, 3000000L, Some(1.0), Some(1.0)),
      (2L, 1L, 1L, Some(2L), 500000L, 500000L, Some(0.5), Some(0.5)),
      (3L, 0L, 0L, None, 0L, 0L, None, None),
      (4L, 0L, 0L, None, 0L, 0L, None, None)))
  }

  test("nbClassify: hand-checked argmax, unseen tokens hit the smoothed floor") {
    // class a favors 'x', class b favors 'y'; equal priors, equal class
    // token mass (5 each) so the unseen-token floors coincide exactly
    val train = Seq((1L, "a", "x x y"), (2L, "a", "x x"),
      (3L, "b", "y y x"), (4L, "b", "y y")).toDF("id", "lab", "text")
    val testDf = Seq((10L, "a", "x x"), (11L, "b", "y"),
      (12L, "a", "zz zz")).toDF("id", "lab", "text")
    val out = CorpusOps.nbClassify(train, testDf, "id", "text", "lab")
      .orderBy("id").collect()
    assert(out.length == 3, "one row per test document")
    assert(out(0).getAs[String]("pred_lab") == "a")
    assert(out(0).getAs[Long]("is_correct") == 1L)
    assert(out(1).getAs[String]("pred_lab") == "b")
    // doc 12: both tokens unseen ANYWHERE -> both classes score the
    // identical floor 2*ln(1/(5+2)) + equal prior; the tie must break
    // to the lexicographically smaller label, deterministically
    assert(out(2).getAs[String]("pred_lab") == "a")
    // exact micro-log score: 2*qlog(1/7) + qlog(1/2)
    val expected = 2L * math.floor(math.log(1.0 / 7) * 1e6 + 0.5).toLong +
      math.floor(math.log(0.5) * 1e6 + 0.5).toLong
    assert(out(2).getAs[Long]("score_micro") == expected)
  }

  test("nbClassify: hashed-feature path is deterministic and tracks the exact model") {
    // the 100 TB posture: features hash into a bounded bucket space so
    // the broadcast model size is a choice, not a corpus property —
    // predictions must be a pure function of (corpus, buckets), and at
    // a bucket count comfortably above the fixture vocabulary the
    // hashed model should agree with the exact one on nearly every doc
    val docs = graft.Tables.documents(spark, sfTest)
    val train = docs.where(pmod(col("doc_id"), lit(5)) =!= 1)
    val testDf = docs.where(pmod(col("doc_id"), lit(5)) === 1)
    def run(h: Option[Int]) = CorpusOps.nbClassify(train, testDf,
      "doc_id", "text", "lang", hashBuckets = h)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    val hashed = run(Some(1 << 14))
    assert(hashed == run(Some(1 << 14)), "hashed path must be pure")
    val exact = run(None)
    val agree = hashed.count { case (id, p) => exact(id) == p }
    assert(agree.toDouble / exact.size >= 0.9,
      s"hashed model diverged: $agree/${exact.size}")
    intercept[IllegalArgumentException](
      CorpusOps.nbClassify(train, testDf, "doc_id", "text", "lang",
        hashBuckets = Some(1)))
  }

  test("dsirSelect: target-flavored docs outrank, rank dense, k bound holds") {
    val raw = Seq((1L, "aa aa aa"), (2L, "bb bb bb"), (3L, "aa bb aa"))
      .toDF("id", "text")
    val target = Seq((9L, "aa aa aa aa")).toDF("id", "text")
    val rows = CorpusOps.dsirSelect(raw, target, "id", "text", k = 2)
      .collect()
    assert(rows.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L))
    // the pure-'aa' doc matches the target distribution best, the
    // mixed doc second; the pure-'bb' doc is cut by k
    assert(rows.map(_.getAs[Long]("id")).toSeq == Seq(1L, 3L))
    assert(rows.head.getAs[Long]("weight_micro") >
      rows(1).getAs[Long]("weight_micro"))
    intercept[IllegalArgumentException](
      CorpusOps.dsirSelect(raw, target, "id", "text", k = 0))
  }

  test("perplexityBuckets: tertiles partition each language, scores ordered") {
    val docs = graft.Tables.documents(spark, sfTest)
    val out = CorpusOps.perplexityBuckets(docs, "doc_id", "text", "lang")
      .collect()
    val perLang = out.groupBy(_.getAs[String]("lang"))
    val langCounts = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    perLang.foreach { case (lang, rows) =>
      // every document of the language lands in exactly one bucket
      assert(rows.map(_.getAs[Long]("n_docs")).sum == langCounts(lang))
      assert(rows.map(_.getAs[String]("bucket")).toSet
        .subsetOf(Set("head", "middle", "tail")))
      // value thresholds order the bucket means: head <= middle <= tail
      val m = rows.map(r =>
        r.getAs[String]("bucket") -> r.getAs[Double]("avg_score")).toMap
      for (a <- m.get("head"); b <- m.get("middle")) assert(a <= b)
      for (b <- m.get("middle"); c <- m.get("tail")) assert(b <= c)
    }
  }

  test("mixtureInterleave: stride clock keeps every prefix near its weighted share") {
    // 6 a-docs at weight 2 vs 3 b-docs at weight 1: lcm 2 gives strides
    // (a=1, b=2), clocks a:1,3,5,7,9,11 / b:2,6,10 — the merged order is
    // a b a a b a a b a, dense positions, independent of which doc got
    // which in-stratum rank
    val docs = ((1L to 6L).map(i => (i, "a")) ++
      (11L to 13L).map(i => (i, "b"))).toDF("id", "s")
    val out = CorpusOps.mixtureInterleave(docs, "id", "s",
      Seq("a" -> 2L, "b" -> 1L)).orderBy("position")
    val rows = out.collect()
    assert(rows.map(_.getAs[Long]("position")).toSeq == (1L to 9L))
    assert(rows.map(_.getAs[String]("s")).toSeq ==
      Seq("a", "b", "a", "a", "b", "a", "a", "b", "a"))
    // the scaladoc fairness bound, asserted: while every source has
    // supply (through position 8 here — b's last emission), each
    // prefix holds each source within ONE doc of its weighted share
    val seq = rows.map(_.getAs[String]("s")).toSeq
    for (p <- 1 to 8; (st, w) <- Seq("a" -> 2.0, "b" -> 1.0)) {
      val emitted = seq.take(p).count(_ == st)
      assert(math.abs(emitted - p * w / 3.0) <= 1.0,
        s"prefix $p stratum $st: $emitted vs ${p * w / 3.0}")
    }
    // pure function of (corpus, weights): a second evaluation is
    // byte-identical
    val again = CorpusOps.mixtureInterleave(docs, "id", "s",
      Seq("a" -> 2L, "b" -> 1L)).orderBy("position").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // strata without a weight are dropped (membership is the gate's job)
    val dropped = CorpusOps.mixtureInterleave(
      docs.unionByName(Seq((99L, "zz")).toDF("id", "s")), "id", "s",
      Seq("a" -> 2L, "b" -> 1L))
    assert(dropped.count() == 9L)
    intercept[IllegalArgumentException](
      CorpusOps.mixtureInterleave(docs, "id", "s", Seq("a" -> 0L)))
  }

  test("bpeTokenIdTable: ids are a property of the MODEL — new shards cannot shift them") {
    // the shipped-tokenizer contract: the id table derives from the
    // trained model's frozen universe (vocab symbols + training-corpus
    // base alphabet), so encoding ANY later shard reuses identical ids
    val train = Seq((1L, "ab ab cd e"), (2L, "ab e e")).toDF("id", "text")
    val model = CorpusOps.bpeTrain(train, "text", rounds = 4)
    val ids1 = CorpusOps.bpeTokenIdTable(model)
      .as[(String, Int)].collect().toMap
    val ids2 = CorpusOps.bpeTokenIdTable(model)
      .as[(String, Int)].collect().toMap
    assert(ids1 === ids2)
    // a shard inside the universe encodes against the SAME table
    val shard = Seq((9L, "ab e")).toDF("id", "text")
    val enc = CorpusOps.bpeEncodeIds(shard, "id", "text", model)
    val dec = CorpusOps.bpeDecode(enc, "id",
      CorpusOps.bpeTokenIdTable(model))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(dec === Map(9L -> "abe"))
    // a shard with a NOVEL single-character word raises loudly — before
    // the freeze it would have silently entered the universe and
    // SHIFTED every lexicographically-later id
    val novel = Seq((10L, "ab z")).toDF("id", "text")
    val e = intercept[Exception](
      CorpusOps.bpeEncodeIds(novel, "id", "text", model).collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => Option(c.getMessage)
      .exists(_.contains("not in the model's vocabulary"))), s"got: $e")
  }

  test("qualityDriftPsi: identical snapshots read zero; a shifted snapshot reads positive") {
    val a = Seq((1L, "en", "the a and of to"), (2L, "en", "x y z"),
      (3L, "de", "the quick brown fox"), (4L, null.asInstanceOf[String], "dropped"))
      .toDF("id", "lang", "text")
    // same distribution on both sides: every (pa − pb) term is exactly 0
    val same = CorpusOps.qualityDriftPsi(a, a, "text", "lang")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(same.nonEmpty)
    assert(same.forall(_._5 == 0.0), same.mkString(", "))
    // NULL strata never contribute
    assert(!same.exists(_._1 == null))
    // a digit-heavy, stopword-free snapshot shifts the quality bins
    val b = Seq((1L, "en", "9 9 9 9 9 9"), (2L, "en", "99 98 97"),
      (3L, "de", "1 2 3 4 5 6 7 8 9")).toDF("id", "lang", "text")
    val drift = CorpusOps.qualityDriftPsi(a, b, "text", "lang")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(drift.forall(_._5 > 0.0), drift.mkString(", "))
  }

  test("winnowFingerprints: matches a driver replay; the w+k-1 guarantee holds") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y z a b c d e f q r"), // shares the 6-word run "a b c d e f"
      (3L, "p q"), // shorter than k: no grams, no fingerprints
      (4L, "m n o")) // one gram: the single whole-doc window
      .toDF("id", "text")
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def replay(text: String): Set[(String, Long)] = {
      val toks = text.split(" ", -1)
      if (toks.length < 3) return Set.empty
      val hs = toks.sliding(3).map(_.mkString(" ")).zipWithIndex
        .map { case (g, i) => (md5hex(g), (i + 1).toLong) }.toVector
      (1 to math.max(hs.length - 3, 1)).map { s0 =>
        hs.slice(s0 - 1, math.min(s0 + 3, hs.length))
          .minBy { case (h, p) => (h, -p) }
      }.toSet
    }
    val got = CorpusOps.winnowFingerprints(docs, "id", "text", k = 3, w = 4)
      .as[(Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    val want = Map(
      1L -> replay("a b c d e f g h"),
      2L -> replay("x y z a b c d e f q r"),
      4L -> replay("m n o"))
    assert(got === want)
    assert(got(4L).size === 1) // single whole-doc window
    // the winnowing guarantee: a shared run of w + k − 1 = 6 words
    // yields at least one shared fingerprint HASH
    assert(got(1L).map(_._1).intersect(got(2L).map(_._1)).nonEmpty)
    // and winnowPairs surfaces exactly that pair at minShared = 1
    val pairs = CorpusOps.winnowPairs(docs, "id", "text", k = 3, w = 4,
      minShared = 1L, maxDocFreq = 50L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)) === Seq((1L, 2L)))
  }

  test("incrementalWinnowPairsOnState: union equals the frozen-blocklist full run") {
    // docs 2/4 (even) are the existing corpus, 1/3 (odd) the batch;
    // doc 1 duplicates doc 2, and docs 2/4 share the "a b c d e f" run
    // whose fingerprints a df>1 blocklist freezes OUT — the cut must
    // bite identically on the incremental and the full spelling
    val docs = Seq(
      (2L, "a b c d e f g h"),
      (4L, "x y z a b c d e f q r"),
      (1L, "a b c d e f g h"),
      (3L, "m n o p q r s t u v")).toDF("id", "text")
    val even = docs.where($"id" % 2 === 0)
    val fpsE = CorpusOps.winnowFingerprints(even, "id", "text")
      .select($"id", $"fp_hash").distinct()
    val blk = fpsE.groupBy("fp_hash")
      .agg(countDistinct($"id").as("df")).where($"df" > 1)
      .select("fp_hash")
    val manifest = fpsE.join(blk, Seq("fp_hash"), "left_anti")
    def pairsOf(fps: org.apache.spark.sql.DataFrame) =
      fps.as("a").join(fps.as("b"),
          $"a.fp_hash" === $"b.fp_hash" && $"a.id" < $"b.id")
        .groupBy($"a.id".as("id_a"), $"b.id".as("id_b"))
        .agg(count(lit(1)).as("shared_fp"))
        .where($"shared_fp" >= 1)
    val known = pairsOf(manifest)
    val batchFp = CorpusOps.winnowFingerprints(
      docs.where($"id" % 2 === 1), "id", "text")
      .select($"id", $"fp_hash")
    val got = CorpusOps.incrementalWinnowPairsOnState(batchFp, manifest,
      blk, known, minShared = 1L)
      .as[(Long, Long, Long)].collect().toSet
    val full = pairsOf(CorpusOps.winnowFingerprints(docs, "id", "text")
        .select($"id", $"fp_hash").distinct()
        .join(blk, Seq("fp_hash"), "left_anti"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === full)
    // the duplicate pair survives through its un-blocked fingerprints
    assert(got.exists(p => p._1 == 1L && p._2 == 2L))
    // the blocklist bit: 2-4 may only pair through non-frozen hashes
    val blocked = blk.as[String].collect().toSet
    assert(blocked.nonEmpty)
  }

  test("contrastiveBatches: dense md5-ordered deal, replayed on the driver") {
    val ids = (1L to 10L)
    val df = ids.map(i => (i, s"doc $i")).toDF("id", "payload")
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val order = ids.sortBy(i => (md5hex(i.toString), i))
    val want = order.zipWithIndex.map { case (id, r) =>
      id -> ((r / 4).toLong, (r % 4).toLong)
    }.toMap
    val got = CorpusOps.contrastiveBatches(df, "id", batchSize = 4)
      .select("id", "batch_id", "slot")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === want)
    // pure function of the corpus: re-evaluation is identical
    val again = CorpusOps.contrastiveBatches(df, "id", batchSize = 4)
      .select("id", "batch_id", "slot")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(again === want)
    intercept[IllegalArgumentException](
      CorpusOps.contrastiveBatches(df, "id", batchSize = 1))
  }

  test("bpeDecode: inverts bpeEncodeIds exactly; an unknown id fails loudly") {
    // "ab ab cd e" repeated forms: the merge loop realizes (a,b) at
    // least; whatever the model learns, decode ∘ encode must rebuild
    // the delimiter-stripped text EXACTLY
    val docs = Seq((1L, "ab ab cd e"), (2L, "ab e e"), (3L, "   "))
      .toDF("id", "text")
    val model = CorpusOps.bpeTrain(docs, "text", rounds = 4)
    val ids = CorpusOps.bpeTokenIdTable(model)
    val enc = CorpusOps.bpeEncodeIds(docs, "id", "text", model)
    val dec = CorpusOps.bpeDecode(enc, "id", ids)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 3 is all-delimiter: zero tokens, no encoded row, no decode row
    assert(dec === Map(1L -> "ababcde", 2L -> "abee"))
    // an id outside the table must raise, not silently drop a symbol
    val bad = enc.withColumn("token_ids",
      array(lit(Int.MaxValue)))
    val e = intercept[Exception](
      CorpusOps.bpeDecode(bad, "id", ids).collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c => Option(c.getMessage)
      .exists(_.contains("not in the model's id table"))), s"got: $e")
  }

  test("packReport: hand-computed fills, tail waste, and spanning docs") {
    // shard A tokens 100, 200, 30 in id order: cum 100/300/330 —
    // doc 2 starts at offset 100 and crosses the 256 boundary; 2 packs
    // of 256 hold 330 tokens → tail waste 182, fill 330/512 = 0.6445.
    // shard B: one exactly-full pack — zero waste, fill 1.0, no span.
    val df = Seq((1L, "A", 100L), (2L, "A", 200L), (3L, "A", 30L),
      (10L, "B", 256L)).toDF("id", "src", "nt")
    val rep = CorpusOps.packReport(
      CorpusOps.packSequences(df, "id", "src", col("nt"), budget = 256),
      budget = 256)
      .orderBy("shard")
      .as[(String, Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(rep === Seq(
      ("A", 3L, 330L, 2L, 1L, 182L, 0.6445),
      ("B", 1L, 256L, 1L, 0L, 0L, 1.0)))
  }

  test("mixtureInterleave: overflow fails loudly, never reorders silently") {
    val docs = ((1L to 3L).map(i => (i, "a")) ++
      (11L to 13L).map(i => (i, "b"))).toDF("id", "s")
    // coprime near-max weights: the lcm is ~2^124 — the driver-side
    // multiplyExact must throw before any clock is computed
    val big = intercept[IllegalArgumentException](
      CorpusOps.mixtureInterleave(docs, "id", "s",
        Seq("a" -> (Long.MaxValue / 2 - 1), "b" -> (Long.MaxValue / 3 - 2))))
    assert(big.getMessage.contains("lcm overflows"))
    // lcm fits but a clock doesn't: weight 2^61 beside 1 gives stride
    // 2^61 for the light stratum, so its rank-2 clock (2·2−1)·2^61
    // exceeds Long — the row-level guard must raise, not wrap negative
    val e = intercept[Exception] {
      CorpusOps.mixtureInterleave(docs, "id", "s",
        Seq("a" -> (1L << 61), "b" -> 1L)).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("virtual time overflows"))),
      s"unexpected failure: $e")
  }

  test("curriculumOrder: levels stream easiest-first, dense positions") {
    val docs = Seq((1L, 2L), (2L, 0L), (3L, 1L), (4L, 0L), (5L, 1L))
      .toDF("id", "lvl")
    val rows = CorpusOps.curriculumOrder(docs, "id", "lvl")
      .orderBy("position").collect()
    assert(rows.map(_.getAs[Long]("position")).toSeq == (1L to 5L))
    // level blocks are contiguous and ascending
    assert(rows.map(_.getAs[Long]("lvl")).toSeq == Seq(0L, 0L, 1L, 1L, 2L))
  }

  test("distinctNgramRatio: hand-counted grams, short docs only emit valid n") {
    val df = Seq((1L, "en", "a b"), (2L, "en", "a b c"), (3L, "fr", "x"))
      .toDF("id", "lang", "text")
    val got = CorpusOps.distinctNgramRatio(df, "text", "lang")
      .orderBy("lang", "n")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    // en 2-grams: "a b" (doc1), "a b","b c" (doc2) -> 3 total, 2 distinct
    // en 3-grams: "a b c" only; fr: single token -> no grams at all
    assert(got === Seq(
      ("en", 2L, 3L, 2L, 0.6667),
      ("en", 3L, 1L, 1L, 1.0)))
  }
}
