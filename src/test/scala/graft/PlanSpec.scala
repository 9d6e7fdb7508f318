package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FormattedMode, SimpleMode}
import org.apache.spark.sql.functions._

import graft.ops._
import graft.functions.Similarity

/** Physical-plan contracts: the scale properties the operators claim
  * (broadcast dimensions, pushed filters, top-k pushdown, one fact-scale
  * shuffle) asserted on FINALIZED adaptive plans, so a regression in plan
  * shape fails like a regression in results would.
  *
  * AQE note: a plan must be EXECUTED through its own QueryExecution before
  * reading it — `count()`/`write()` build different QueryExecutions and
  * leave this one un-finalized (initial plans show neither the adaptive
  * join strategy nor codegen stages).
  */
class PlanSpec extends SparkTestBase {

  private val sf = sfTest

  /** Run the frame's own QueryExecution once; read any explain mode from
    * it afterwards (tests needing BOTH modes execute the job once, not
    * once per mode — some of these plans are the suite's slowest jobs).
    */
  private def executed(df: DataFrame): DataFrame = {
    df.queryExecution.toRdd.foreachPartition(_ => ())
    df
  }

  // AQE prints "== Final Plan ==" followed by "== Initial Plan ==";
  // assertions must read only the final one or every operator counts
  // twice.
  private def stripInitialPlan(s: String): String = {
    val initial = s.indexOf("== Initial Plan ==")
    if (initial >= 0) s.substring(0, initial) else s
  }

  private def simpleOf(df: DataFrame): String =
    stripInitialPlan(df.queryExecution.explainString(SimpleMode))

  private def executedSimple(df: DataFrame): String = simpleOf(executed(df))

  private def executedFormatted(df: DataFrame): String =
    executed(df).queryExecution.explainString(FormattedMode)

  /** Hash exchanges EXCLUDING the small-input width clamp
    * (ScaleOps.fanOut — prints as REPARTITION_BY_NUM): the clamp is a
    * deliberate session-width repartition that exists only in the
    * few-splits regime, so plan-shape pins about FACT-SCALE shuffles
    * must not count it (and must keep failing if a real shuffle of the
    * guarded stream appears).
    *
    * The exclusion matches the clamp PRECISELY, not every explicit-count
    * repartition (which can carry fact-scale data — e.g. the
    * editDistancePairs pair-stream spread prints the same tag): the
    * exchange must (a) repartition to exactly the session's
    * defaultParallelism and (b) sit directly above a scan-level subtree
    * (Project/Filter over a scan or checkpoint leaf — fanOut's own
    * placement guard). Anything else counts as a fact exchange and
    * fails the pin.
    */
  private def factHashExchanges(plan: String): Int = {
    val lines = plan.linesIterator.toVector
    def depth(l: String): Int =
      "^[\\s:+\\-]*".r.findFirstIn(l).get.length
    def op(l: String): String =
      l.substring(depth(l)).replaceFirst("^\\*\\(\\d+\\) ", "")
    val want = spark.sparkContext.defaultParallelism
    val scanLevelOps = Seq("Project", "Filter", "Scan", "FileScan",
      "ColumnarToRow", "InputAdapter", "WholeStageCodegen")
    lines.zipWithIndex.count { case (l, i) =>
      l.contains("Exchange hashpartitioning") && {
        val isClamp = l.contains(s", $want), REPARTITION_BY_NUM") && {
          val d = depth(l)
          lines.drop(i + 1).takeWhile(x => depth(x) > d).forall { x =>
            val o = op(x)
            o.isEmpty || scanLevelOps.exists(o.startsWith)
          }
        }
        !isClamp
      }
    }
  }

  test("lookup join: dimension side broadcasts, no sort-merge exchange") {
    val plan = executedSimple(SparkEntry.queries("lookup_join")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("lookup_join_smj: the broadcast-threshold fallback is a real sort-merge plan") {
    // The J1 posture "lookup always broadcasts" needs its degradation
    // path proven: when the dim can't broadcast, the SAME answer must
    // come off a sort-merge plan. The MERGE hint pins that plan (AQE is
    // not allowed to re-broadcast a user hint), and the oracle row in
    // CORRECTNESS grades the answer itself.
    val plan = executedSimple(
      SparkEntry.queries("lookup_join_smj")(spark, sf))
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("BroadcastHashJoin"), plan)
  }

  test("knnBrute: rank<=k pushes into WindowGroupLimit before the full sort") {
    val e = Tables.embeddings(spark, sf)
    val plan = executedSimple(Similarity.knnBrute(e.where(col("vec_id") < 5), e, 3))
    assert(plan.contains("WindowGroupLimit"))
  }

  test("pmiCollocations: margins never re-scan the corpus; broadcast attaches only") {
    // The op's scale claim: ONE fact-scale bigram aggregate, materialized
    // once; total, both margins, and the final attach all derive from it.
    // The returned plan must therefore contain ZERO parquet scans (every
    // leaf is the checkpointed bigram RDD or a broadcast of its
    // aggregates) and no shuffle-side join.
    val plan = executedSimple(
      SparkEntry.queries("pmi_collocations")(spark, sf))
    assert(!plan.contains("Scan parquet"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("retrievalEval: the top-k rank filter pushes into WindowGroupLimit") {
    val plan = executedSimple(
      SparkEntry.queries("retrieval_mrr_map")(spark, sf))
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("pqAdcTopK: LUT broadcasts into the code join; rank<=k hits WindowGroupLimit") {
    // the serving plan's two claims: candidates join the m x k lookup
    // table as a BROADCAST (never a shuffle on the code table), and the
    // per-query top-k keeps window state k-bounded
    val plan = executedSimple(
      SparkEntry.queries("pq_adc_topk")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("bpeMergePairs: the pair explosion runs over the aggregated vocabulary") {
    // The scale claim that makes iterative BPE training feasible: the
    // corpus reduces to (word, count) FIRST; only the vocabulary gets
    // char-pair-exploded. In the printed plan (root first) the Generate
    // must therefore sit ABOVE a word-count HashAggregate — a Generate
    // with no aggregate below it would mean the corpus itself explodes.
    val lines = executedSimple(
      SparkEntry.queries("bpe_merge_pairs")(spark, sf)).linesIterator.toSeq
    val gens = lines.zipWithIndex.filter(_._1.contains("Generate explode"))
    assert(gens.nonEmpty, lines.mkString("\n"))
    // two Generates exist (token explode near the scan, pair explode
    // above the vocab agg); the TOPMOST one is the pair explosion and
    // must have the word-count aggregate somewhere below it
    val pairGen = gens.map(_._2).min
    assert(lines.drop(pairGen + 1).exists(_.contains("HashAggregate")),
      s"pair explosion not above the vocabulary aggregate:\n" +
        lines.mkString("\n"))
  }

  test("stratifiedQuota: the quota filter pushes into WindowGroupLimit") {
    val docs = Tables.documents(spark, sf)
    val plan = executedSimple(
      graft.ops.CorpusOps.stratifiedQuota(docs, "lang", "doc_id", 20))
    // partial per-stratum limiting runs BEFORE the exchange, so each map
    // task forwards at most `quota` rows per stratum through the shuffle
    assert(plan.contains("WindowGroupLimit"))
  }

  test("filter + projection pushdown reach the parquet scan") {
    val e = Tables.embeddings(spark, sf).where(col("vec_id") < 10)
      .select("vec_id")
    val plan = executedFormatted(e)
    assert(plan.contains("LessThan(vec_id,10)"), "filter not pushed")
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("embedding"), s"column pruning failed: $read")
  }

  test("weekly stats: two exchanges, both with map-side partial aggregation") {
    // Exact count_distinct rewrites to a two-level aggregate: the fact
    // table shuffles ONCE on (week, dim, id) after a map-side partial,
    // and only the distinct-expanded (already aggregated, bounded) frame
    // re-shuffles on (week, dim). Anything beyond these two would mean
    // the fact table crossed the wire twice.
    val o = Tables.orders(spark, sf)
    val agg = WeeklyAgg.weeklyStatsCore(o, col("o_orderdate"),
      col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val plan = executedSimple(agg)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges, plan:\n$plan")
    // the first (fact-scale) exchange must sit above a partial aggregate
    val firstExchange = plan.lastIndexOf("Exchange hashpartitioning")
    assert(plan.substring(firstExchange).contains("partial"),
      s"fact rows shuffled without map-side combine:\n$plan")
  }

  test("SQL entry variant keeps the fluent plan shape: two hash exchanges, partials map-side") {
    // weekly_agg_orders_sql is the raw-SQL spelling of the flagship
    // aggregation; it must compile to the same two-exchange
    // count_distinct-rewrite shape (plus only the grading sort's range
    // exchange), with the shared percentile array buffer — three separate
    // percentile calls cost 2× (measured) and would show up here as the
    // same exchange count but was caught by the bench; the exchange pin
    // guards the structural half of parity.
    val plan = executedSimple(
      SparkEntry.queries("weekly_agg_orders_sql")(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 hash exchanges:\n$plan")
    assert(plan.contains("partial"), s"no map-side combine:\n$plan")
  }

  test("exact dedup groups: one exchange keyed by the digest, partials map-side") {
    val d = Tables.documents(spark, sf)
    val plan = executedSimple(Dedup.exactGroups(d, "doc_id", "text"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1)
    // the shuffle key is the md5 grouping expression (computed map-side),
    // never the raw text column, and the partial min/count run below it
    val exchangeLine = plan.linesIterator
      .find(_.contains("Exchange hashpartitioning")).get
    assert(exchangeLine.contains("_groupingexpression")
      && !exchangeLine.contains("text#"),
      s"exchange not keyed by the digest: $exchangeLine")
    assert(plan.contains("partial_min"), s"no map-side combine:\n$plan")
  }

  test("q3: BUILDING customer side broadcasts, lineitem date filter pushed to scan") {
    val df = executed(SparkEntry.queries("q3_shipping_priority")(spark, sf))
    val simple = simpleOf(df)
    // the segment-filtered customer dim joins orders as a broadcast — the
    // hint in the query must survive to the physical plan
    assert(simple.contains("BroadcastHashJoin"), s"no broadcast join:\n$simple")
    val formatted = df.queryExecution.explainString(FormattedMode)
    // l_shipdate > cutoff must reach the parquet scan as a pushed filter,
    // not a post-scan Filter over all rows
    val pushed = formatted.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("GreaterThan(l_shipdate"),
      s"lineitem ship-date filter not pushed:\n$pushed")
    assert(pushed.contains("LessThan(o_orderdate"),
      s"orders date filter not pushed:\n$pushed")
  }

  test("frame sampling is map-only: zero exchanges from scan to generator") {
    // decode (mapPartitions) -> explode(sequence) never needs a shuffle;
    // an Exchange appearing here would mean the generator plan regressed
    // into something that moves media rows around.
    val media = Tables.documents(spark, sf).select(
      col("doc_id").as("media_id"), lit("text/plain").as("mime"),
      col("text").cast("binary").as("bytes"))
    val frames = graft.multimodal.MultimodalOps.frameSamplePlan(
      graft.multimodal.MultimodalOps.decodeMeta(media), everyMs = 60000L)
    val plan = executedSimple(frames)
    assert(!plan.contains("Exchange"), s"frame sampling shuffled:\n$plan")
  }

  test("repetition signals: aggregates partial map-side, no cartesian join") {
    val plan = executedSimple(graft.functions.TextFunctions.repetitionSignals(
      Tables.documents(spark, sf), "doc_id", "text"))
    assert(plan.contains("partial_count") || plan.contains("partial_max"),
      s"no map-side combine:\n$plan")
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"),
      s"unkeyed join in repetition signals:\n$plan")
  }

  test("banded self-joins pin an uncoalescible join-key repartition") {
    // The explicit-count repartition shows up as REPARTITION_BY_NUM, the
    // origin AQE must honor — without it, input-sized coalescing collapses
    // the exploding self-join onto the scan's single partition.
    val d = Tables.documents(spark, sf)
    val plan = executedSimple(Dedup.minhashCandidates(d, "doc_id", "text"))
    assert(plan.contains("REPARTITION_BY_NUM"),
      s"band repartition missing or demoted:\n$plan")
  }

  test("cosine near-dup: SRP self-join keeps its repartition and never ships vectors") {
    val e = Tables.embeddings(spark, sf)
    val df = executed(Similarity.cosineNearDupPairs(
      e, "vec_id", "embedding", threshold = 0.4, bits = 4, tables = 24))
    val plan = simpleOf(df)
    // same contract as the MinHash banding: explicit-count repartition on
    // the bucket join key survives AQE
    assert(plan.contains("REPARTITION_BY_NUM"),
      s"bucket repartition missing or demoted:\n$plan")
    // the self-join operates on (tbl, bkt, id, bkts) — the embedding
    // arrays join back on candidates only, never through the bucket
    // exchange (a vector in that exchange would multiply shuffle bytes by
    // dim x tables). SimpleMode exchange lines print only partition keys,
    // so the attribute check must read FormattedMode's per-node
    // "Input [..]" detail for the bucket-keyed exchange node.
    val fm = df.queryExecution.explainString(FormattedMode)
    val exchBlocks = fm.split("\n\n").filter(b =>
      b.contains("Exchange") && b.contains("hashpartitioning(tbl"))
    assert(exchBlocks.nonEmpty, s"no bucket exchange node found:\n$fm")
    assert(exchBlocks.forall(!_.contains("vec#")),
      s"embedding shipped through the bucket exchange:\n${exchBlocks.mkString("\n\n")}")
  }

  test("decontaminate: eval gram set broadcasts into a semi join (train side never reshuffles on grams)") {
    val docs = Tables.documents(spark, sf)
    val split = CorpusOps.assignSplit(docs, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    val plan = executedSimple(CorpusOps.decontaminate(
      split.where(col("split") === "train"),
      split.where(col("split") === "test"), "doc_id", "text", n = 8))
    // the distinct eval gram set is benchmark-sized: it must build a
    // broadcast for the LeftSemi probe, leaving the train-side gram
    // stream entirely shuffle-free. ONE line must carry both markers —
    // checking them independently would let a SortMergeJoin LeftSemi pass
    // on the strength of an unrelated broadcast elsewhere in the plan.
    assert(plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi")),
      s"eval-gram semi join is not a broadcast join:\n$plan")
  }

  test("funnel: all stage windows and the per-user rollup share ONE user exchange") {
    // funnelStages' three windows all partition by user_id and the groupBy
    // that follows reuses the same partitioning — a second
    // hashpartitioning(user_id...) exchange would mean the window specs
    // diverged and each stage re-shuffles the events.
    val plan = executedSimple(EventAnalytics.funnelSummary(
      Tables.events(spark, sf), "user_id", "ts", "event_type",
      Seq("signup", "click", "purchase")))
    val userExchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning(user_id"))
    assert(userExchanges == 1, s"expected 1 user exchange, got $userExchanges:\n$plan")
  }

  test("embedding quantization is map-only: zero exchanges") {
    val e = Tables.embeddings(spark, sf)
    val plan = executedSimple(e.select(col("vec_id"),
      graft.ops.EmbeddingOps.quantizeInt8(col("embedding")).as("q"),
      graft.ops.EmbeddingOps.l2Normalize(col("embedding")).as("u")))
    assert(!plan.contains("Exchange"), s"quantization shuffled:\n$plan")
  }

  test("zorderLayout: one range exchange on the z key, sort stays partition-local") {
    val o = Tables.orders(spark, sf).select(col("o_orderkey"),
      pmod(col("o_custkey"), lit(256)).as("x"),
      pmod(col("o_orderkey"), lit(256)).as("y"))
    val laid = ScaleOps.zorderLayout(o, "x", "y", partitions = 4, bits = 8)
    val simple = executedSimple(laid)
    // SortExec prints "Sort [keys], <global>, <limit>" — the layout sort
    // must be partition-local (global=false): a true full sort would mean
    // the layout op degenerated into a global orderBy.
    val sortLines = simple.linesIterator.filter(_.contains("Sort [__z")).toSeq
    assert(sortLines.nonEmpty, s"no z-key sort in plan:\n$simple")
    assert(sortLines.forall(_.contains("], false, 0")),
      s"z-order sort went global (full-sort, not layout):\n$simple")
    assert(simple.contains("Exchange rangepartitioning"),
      s"no range exchange for the layout:\n$simple")
  }

  test("chunk dedup: the keeper aggregation shuffles digests + positions, not chunk text") {
    val plan = executedFormatted(CorpusOps.dropDuplicateChunks(
      Tables.documents(spark, sf), "doc_id", "text", chunkTokens = 16))
    // the md5 grouping key prints as _groupingexpression; its exchange must
    // move (digest, position-struct) rows only — chunk text reaching this
    // exchange would ship the corpus once more for no reason
    val exchBlocks = plan.split("\n\n").filter(b =>
      b.contains("Exchange") && b.contains("hashpartitioning(_groupingexpression"))
    assert(exchBlocks.nonEmpty, s"no digest-keyed exchange found:\n$plan")
    assert(exchBlocks.forall(!_.contains("chunk_text#")),
      s"chunk text shipped through the digest exchange:\n${exchBlocks.mkString("\n\n")}")
  }

  test("time-series tier: single key exchange each; budget cap never ships text") {
    // slidingRangeStats / robustZScores: every window column rides ONE
    // hashpartitioning exchange on the key (the grading orderBy adds only
    // a rangepartitioning exchange, deliberately not counted here)
    for (name <- Seq("sliding_range_agg", "robust_zscore")) {
      val plan = executedSimple(SparkEntry.queries(name)(spark, sf))
      val n = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(n == 1, s"$name: expected 1 key exchange, got $n:\n$plan")
    }
    // sourceBudgetCap: one key exchange, and document text must be pruned
    // before it — the window needs only (id, source, n_tokens)
    val fm = executedFormatted(
      SparkEntry.queries("source_budget_cap")(spark, sf))
    val blocks = fm.split("\n\n").filter(b =>
      b.contains("Exchange") && b.contains("hashpartitioning(source"))
    assert(blocks.nonEmpty, s"no source-keyed exchange found:\n$fm")
    assert(blocks.forall(!_.contains("text#")),
      s"document text shipped through the budget-cap exchange:\n${blocks.mkString("\n\n")}")
    // interpolateGaps: the bounded grid joins broadcast (never sort-merge),
    // leaving the weekly agg + the dim-window as the only key exchanges
    val ip = executedSimple(SparkEntry.queries("interpolate_gaps")(spark, sf))
    assert(ip.contains("BroadcastHashJoin") && !ip.contains("SortMergeJoin"),
      s"interpolate_gaps grid join regressed from broadcast:\n$ip")
    val ipN = "Exchange hashpartitioning".r.findAllIn(ip).size
    assert(ipN <= 2, s"interpolate_gaps: expected <=2 key exchanges, got $ipN:\n$ip")
    // exactMode: the top-1 filter must push into WindowGroupLimit so each
    // map task forwards one candidate per key, not every (key, value) row
    val mode = executedSimple(SparkEntry.queries("mode_stats")(spark, sf))
    assert(mode.contains("WindowGroupLimit"),
      s"mode_stats top-1 did not push into WindowGroupLimit:\n$mode")
  }

  test("bloom membership probe is map-only: literal filter bits, no join, no exchange") {
    val docs = Tables.documents(spark, sf)
    val evalGrams = CorpusOps.ngramSet(
      docs.where(pmod(col("doc_id"), lit(10)) === 7), "doc_id", "text", 8)
      .select("gram").distinct()
    val bloom = BloomOps.buildBloom(evalGrams, col("gram"),
      expectedItems = 1000, fpp = 1e-4)
    // the whole point of the sketch path: the deny side rides the plan as
    // a LITERAL byte array, so probing is scan → explode → filter — the
    // exact-set path's broadcast semi join disappears entirely
    val probe = CorpusOps.ngramSet(docs, "doc_id", "text", 8)
      .where(BloomOps.mightContain(bloom, col("gram")))
    val plan = executedSimple(probe)
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
    // the only exchange allowed is ngramSet's small-input width clamp
    // (REPARTITION_BY_NUM) — the probe itself stays join-free and adds
    // no exchange of its own
    assert(factHashExchanges(plan) === 0 && !plan.contains("Join"),
      s"bloom probe should be map-only:\n$plan")
  }

  test("quality-gate truth sides: no cartesian over unbounded sides, caps pushed to scan") {
    // The four quality-gate queries deliberately run an exhaustive (or
    // broadcast) truth side next to the production LSH path. The scale
    // contract: every unkeyed join in their FINAL plans builds on a side
    // capped by an ABSOLUTE id bound — so the graded plan itself stays
    // O(corpus) at any SF — and no plan ever degenerates to a
    // CartesianProduct (the non-broadcast quadratic node: its appearance
    // would mean the capped side outgrew the broadcast threshold, i.e.
    // the cap was lost). The pushed-filter check proves the cap reaches
    // the parquet scan of the bounded side; the BNLJ count pins exactly
    // the intended unkeyed joins and no accidental extras.
    val contracts = Seq(
      // (query, capped-scan pushed filter, expected unkeyed-join count)
      ("minhash_quality", "LessThan(doc_id,10000)", 0),
      ("near_dup_jaccard", "LessThan(doc_id,10000)", 0),
      ("fuzzy_match_pairs", "LessThan(doc_id,10000)", 0),
      ("minhash_lsh_pairs", "LessThan(doc_id,10000)", 0),
      ("simhash_quality", "LessThan(doc_id,10000)", 0),
      ("near_dup_cosine", "LessThan(vec_id,10000)", 1),
      ("cosine_dedup_quality", "LessThan(vec_id,2000)", 1),
      ("embed_decontaminate", "LessThan(vec_id,2000)", 1))
    for ((name, pushedCap, nUnkeyed) <- contracts) {
      val df = executed(SparkEntry.queries(name)(spark, sf))
      val simple = simpleOf(df)
      assert(!simple.contains("CartesianProduct"),
        s"$name: cartesian product in graded plan:\n$simple")
      val bnl = "BroadcastNestedLoopJoin".r.findAllIn(simple).size
      assert(bnl == nUnkeyed,
        s"$name: expected $nUnkeyed BroadcastNestedLoopJoin, got $bnl:\n$simple")
      val pushed = df.queryExecution.explainString(FormattedMode)
        .linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
      assert(pushed.contains(pushedCap),
        s"$name: absolute cap $pushedCap not pushed to a scan:\n$pushed")
    }
  }

  test("incremental dedup: both sides reduce to digests before the anti join") {
    val docs = Tables.documents(spark, sf)
    val plan = executedFormatted(Dedup.dropExactIncremental(
      docs.where(pmod(col("doc_id"), lit(2)) === 1),
      docs.where(pmod(col("doc_id"), lit(2)) === 0), "doc_id", "text"))
    // the digest-keyed exchanges must not carry the text column: content
    // reduces to 16-byte digests map-side, so at 100 TB the anti join moves
    // ~32 bytes/doc, not documents
    val exchBlocks = plan.split("\n\n").filter(b =>
      b.contains("Exchange") && b.contains("hashpartitioning(dig"))
    assert(exchBlocks.nonEmpty, s"no digest exchange found:\n$plan")
    assert(exchBlocks.forall(!_.contains("text#")),
      s"raw text shipped through a digest exchange:\n${exchBlocks.mkString("\n\n")}")
  }

  test("mixture_temperature_draw: rates broadcast back, the draw is a map-side filter") {
    // The source-rate table is bounded (one row per source) and must
    // broadcast onto the corpus; the realized draw is the md5 bucket
    // filter applied map-side — no sort-merge exchange of corpus rows
    // against a 5-row dim, no window, no cartesian.
    val plan = executedSimple(
      SparkEntry.queries("mixture_temperature_draw")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("pack_sequences_bfd: shards fold row-locally — (id, len) in the exchange, never text, no window") {
    // Bin packing is order-dependent state, so the sequential unit is
    // the shard: docs reduce to (sort key, id, effective length) in the
    // scan projection — the shard exchange must not carry the text
    // column — and the whole deal is ONE aggregate expression per shard
    // row (no Window machinery, no per-bin join graph, no cartesian).
    val df = SparkEntry.queries("pack_sequences_bfd")(spark, sf)
    val plan = executedSimple(df)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val planF = df.queryExecution.explainString(FormattedMode)
    val exchBlocks = planF.split("\n\n").filter(_.contains("Exchange"))
    assert(exchBlocks.nonEmpty, s"no exchange found:\n$planF")
    assert(exchBlocks.forall(!_.contains("text#")),
      s"document text shipped through an exchange:\n${
        exchBlocks.filter(_.contains("text#")).mkString("\n\n")}")
  }

  test("global_topk: TakeOrderedAndProject, never a global range sort") {
    val plan = executedSimple(SparkEntry.queries("global_topk")(spark, sf))
    // orderBy+limit must compile to per-partition heap top-k (a 100 TB
    // table can never be range-shuffled just to read off 100 rows)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("rangepartitioning"), plan)
  }

  test("weighted sample is map-only: md5 draw filters at the scan, no exchange") {
    val docs = Tables.documents(spark, sf)
    val plan = executedSimple(CorpusOps.weightedSample(docs, "doc_id",
      least(lit(0.9), col("n_chars").cast("double") / 2000.0)))
    assert(!plan.contains("Exchange"), plan)
  }

  test("skyline: bucket digest broadcasts into the prune, no cartesian, no fact sort") {
    val plan = executedSimple(SparkEntry.queries("skyline_orders")(spark, sf))
    // phase 1 joins the tiny cumulative bucket table by broadcast — the
    // fact side must not sort-merge or cartesian against it
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("columnProfile: one Expand feeds one aggregate — no per-column scans") {
    val plan = executedSimple(SparkEntry.queries("column_profile")(spark, sf))
    assert("Expand".r.findAllIn(plan).size === 1, plan)
    assert("Scan ".r.findAllIn(plan).size === 1, plan)
  }

  test("jaccard exact join: all equi-joins, per-doc windows only, no cartesian") {
    val df = SetSimJoin.jaccardJoinExact(
      Tables.documents(spark, sf), "doc_id", "text", 0.9)
    val plan = executedSimple(df)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the token order is the (tf, tok) pair — no single-task global
    // window ranking the vocabulary may appear
    assert(!plan.contains("Window [") ||
      !plan.contains("windowspecdefinition()"), plan)
  }

  test("q5: customer dimension broadcasts — the orders leg never two-side shuffles") {
    // Round-5 adjudication caught this exact join drifting from broadcast
    // to a two-sided exchange (1.29 s → 2.10 s isolated): customer is
    // dimension-scale by TPC-H construction (~1.5 % of lineitem) and only
    // (c_custkey, c_nationkey) survives the projection, so orders must
    // probe a broadcast, not shuffle.
    val plan = executedSimple(
      SparkEntry.queries("q5_local_supplier_volume")(spark, sf))
    assert(!plan.linesIterator.exists(l =>
      l.contains("SortMergeJoin") && l.contains("c_custkey")),
      s"customer join regressed to sort-merge:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("keepBestPerComponent: the argmax filter pushes into WindowGroupLimit") {
    // same contract as mode_stats/knnBrute: top-1-per-component must limit
    // below the exchange, not rank every member globally
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.verifiedNearDupPairs(
      docs.where(pmod(col("doc_id"), lit(10)) === 0), "doc_id", "text", 0.8)
    val plan = executedSimple(Dedup.keepBestPerComponent(
      graft.functions.TextFunctions.withQualityColumns(
        docs.where(pmod(col("doc_id"), lit(10)) === 0), "text"),
      "doc_id", "quality", pairs))
    assert(plan.contains("WindowGroupLimit"),
      s"keep-best top-1 did not push into WindowGroupLimit:\n$plan")
  }

  test("cluster_prototypes: per-cluster top-m pushes into WindowGroupLimit") {
    // The prototype selection must not buffer whole clusters through the
    // rank sort — the rank<=m predicate pushes down so each partition
    // retains m rows per cluster during the window sort.
    val plan = executedSimple(
      SparkEntry.queries("cluster_prototypes")(spark, sf))
    assert(plan.contains("WindowGroupLimit"),
      s"prototype top-m did not push into WindowGroupLimit:\n$plan")
  }

  test("graph tier: wedge and closing joins are equi — no cartesian, no nested loop") {
    for (q <- Seq("triangle_count", "link_predict")) {
      val plan = executedSimple(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("CartesianProduct"), s"$q: $plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q: $plan")
    }
  }

  test("copurchase: equi-join on the basket key only — no cartesian, no nested loop") {
    val plan = executedSimple(SparkEntry.queries("copurchase_lift")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") ||
      // the 1-row n_baskets scalar is the only permitted nested-loop side
      "BroadcastNestedLoopJoin".r.findAllIn(plan).size === 1, plan)
  }

  test("housing_pipeline: bounded joins only, snapshot max side broadcasts") {
    // The composed lifecycle must keep the stage contracts of its parts:
    // exactly the weekly groupBy touches fact-scale data, every
    // post-aggregation join (grid densify, latest-week slice) runs on the
    // bounded weeks × dims frame, and the 1-row max week broadcasts — a
    // SortMergeJoin anywhere means a stage regressed to a two-sided
    // fact shuffle.
    val plan = executedSimple(SparkEntry.queries("housing_pipeline")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("weeklyStreaks: distinct, rank, and island stages stay on the key exchanges") {
    val plan = executedSimple(SparkEntry.queries("streaks_customer")(spark, sf))
    // (key,week) distinct + key-only window + final sort: the island
    // group-by must NOT add a fourth fact-scale exchange (its input is
    // already keyed); allow the bounded output sort
    assert("Exchange".r.findAllIn(plan).size <= 4, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("duplicatedSpans: the span explode runs exactly once (checkpointed incidence, no re-derived branch)") {
    val plan = executedSimple(
      graft.ops.CorpusOps.duplicatedSpans(Tables.documents(spark, sf),
        "doc_id", "text", n = 15))
    // the (id, digest, count) incidence materializes ONCE (the totals
    // aggregate and the join back both read the checkpoint), so the
    // returned plan contains ZERO generator nodes — the span explode
    // already ran, exactly once, at checkpoint build. A re-derived
    // groupBy branch would show a second explode; the r11 window
    // spelling held it at one but funneled every hot gram into one
    // sort partition (the excision skew finding).
    assert(!plan.contains("Generate explode"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("bm25TopK: distributed top-k heap, never a fact-scale single-partition window") {
    val plan = executedSimple(
      graft.ops.CorpusOps.bm25TopK(Tables.documents(spark, sf), "doc_id",
        "text", Seq("spark", "join", "query"), k = 20))
    // orderBy.limit compiles to per-partition heaps + a k-row driver
    // merge; the rnk window runs AFTER the limit, over k rows only
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("hybrid_search: both rank lists bound BEFORE the global fusion window") {
    val plan = executedSimple(SparkEntry.queries("hybrid_search")(spark, sf))
    // sparse leg: distributed top-k heap (limit=20); dense leg: per-query
    // rank pushed into WindowGroupLimit; and the fused rank<=10 itself
    // compiles to a third TakeOrderedAndProject — every window in the
    // plan sees at most the two k-row lists, never the corpus. (The
    // full-outer fuse of the two 20-row lists is a SortMergeJoin — full
    // outer cannot broadcast in Spark — over 40 rows, deliberately
    // unpinned.)
    assert(plan.contains("TakeOrderedAndProject(limit=20"), plan)
    assert(plan.contains("TakeOrderedAndProject(limit=10"), plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("weekly_quantiles_histogram: histogram agg + ONE keys exchange serve both windows and the final agg") {
    val plan = executedSimple(
      SparkEntry.queries("weekly_quantiles_histogram")(spark, sf))
    // exchanges: (keys, value) histogram agg, (keys) for the windows —
    // which the final group-by reuses — and the output range sort; a 4th
    // means a window or aggregation stopped sharing the keys partitioning
    assert("Exchange".r.findAllIn(plan).size <= 3, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("bucketed join: same-bucket-count tables join with ZERO exchange") {
    // The writeBucketed contract: both sides bucketed (and one sorted file
    // per bucket, via the pre-write repartition on the bucket hash), so
    // the shuffle join the planner would otherwise pick needs neither an
    // exchange nor (with the sortBy metadata usable) more than local
    // sorts. Broadcast is disabled for the pin — at the graded fixture
    // size AQE would broadcast the 25-row side and never exercise the
    // bucket path this test exists to prove.
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      ScaleOps.writeBucketed(
        Tables.orders(spark, sf).repartition(4, col("o_custkey")),
        "graft_test_orders_bkt", "o_custkey", buckets = 4)
      ScaleOps.writeBucketed(
        Tables.customer(spark, sf).repartition(4, col("c_custkey")),
        "graft_test_customer_bkt", "c_custkey", buckets = 4)
      val j = ScaleOps.bucketedJoin(spark, "graft_test_orders_bkt",
        "graft_test_customer_bkt", "o_custkey", "c_custkey")
      val plan = executedSimple(j)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
      spark.sql("DROP TABLE IF EXISTS graft_test_orders_bkt")
      spark.sql("DROP TABLE IF EXISTS graft_test_customer_bkt")
    }
  }

  test("skew-aware agg: hot key takes the salted two-phase plan, uniform key the plain one") {
    // The adaptive contract in the PLAN, not just the boolean: the hot
    // variant must actually aggregate over (key, salt) — the
    // deterministic row-hash salt derivation shows as xxhash64+pmod and
    // the plan carries two aggregate exchanges — while the uniform
    // variant must stay the plain single-exchange hash aggregate with
    // no salt machinery at all.
    val hot = executedSimple(
      SparkEntry.queries("skew_aware_agg_hot")(spark, sf))
    assert(hot.contains("xxhash64"), s"hot key must salt:\n$hot")
    val uniform = executedSimple(
      SparkEntry.queries("skew_aware_agg_uniform")(spark, sf))
    assert(!uniform.contains("xxhash64"),
      s"uniform key must not pay the salted two-phase plan:\n$uniform")
    val ex = "Exchange hashpartitioning".r.findAllIn(uniform).size
    assert(ex === 1, s"plain path is one hash exchange, got $ex:\n$uniform")
  }

  test("exact-substring excision: first-occurrence pick is a hash aggregate — no window over raw occurrences") {
    // r11's one weak component, fixed at the cause: occurrence rank and
    // count rode Window.partitionBy(digest) over RAW (doc, pos) rows —
    // one partition and ONE SORT per gram, a straggler task when a
    // corpus-wide boilerplate span (the exact content this operator
    // exists to excise) owns 10^8 occurrences at 100×. The de-skewed
    // plan carries NO window operator anywhere: the first-occurrence
    // pick is min(struct(id, pos)) + count per digest (partial-merge
    // hash aggregate, skew-immune) joined back on the digest — and the
    // boilerplate-skew graded variant proves it on a corpus where one
    // gram occurs once per document.
    Seq("exact_substr_dedup", "exact_substr_dedup_skew").foreach { q =>
      val plan = executedSimple(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("Window"),
        s"$q must not window over raw occurrences:\n$plan")
      assert(!plan.contains("row_number"),
        s"$q must not rank occurrences by sort:\n$plan")
    }
  }

  test("dup_spans: corpus totals are an aggregate joined back — no digest window") {
    // The milder sibling of the excision skew finding: the per-digest
    // total previously rode a window over the (doc, digest, count)
    // incidence — still one partition per hot gram. Same fix shape:
    // hash aggregate + join back, zero window operators in the plan.
    val plan = executedSimple(SparkEntry.queries("dup_spans")(spark, sf))
    assert(!plan.contains("Window"),
      s"dup_spans must not window over incidence rows:\n$plan")
  }

  test("corpus_prep_full: the composed chain carries no window and no cartesian") {
    // The whole governance chain (normalize → exact dedup → excision →
    // near-dup removal → MOSS-match removal → decontamination → gate →
    // split → report) must inherit the de-skewed excision shape: ZERO
    // window operators anywhere in the composed plan (the CC labels and
    // the winnow victims enter as sealed checkpoints — winnowing's own
    // per-DOCUMENT window is the blessed bounded frame and runs inside
    // the moss checkpoint; the first-occurrence pick is the hash
    // aggregate), and no cartesian product from any stage's join graph.
    val plan = executedSimple(
      SparkEntry.queries("corpus_prep_full")(spark, sf))
    assert(!plan.contains("Window"),
      s"chain must stay window-free:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("ngram_uniqueness: only digests cross the exchanges; incidence reads once") {
    // r11 finding: the gram STRING crossed three exchanges (distinct,
    // counts, join back) against the repo's own digest discipline. The
    // fix md5s the gram BEFORE the distinct and checkpoints the
    // (id, 16-B digest) incidence for its two consumers — so the
    // returned plan reads the checkpoint (zero parquet scans) and no
    // gram-text column survives into any exchange.
    val plan = executedSimple(
      SparkEntry.queries("ngram_uniqueness")(spark, sf))
    assert(!plan.contains("Scan parquet"),
      s"incidence must enter as the one checkpoint:\n$plan")
    assert(!plan.contains("gram#"),
      s"gram text must not survive past the map side:\n$plan")
  }

  test("incremental cosine: bucketed SRP manifest probes with ZERO manifest-side exchange") {
    // The cosine tier's persisted-manifest contract, same differential
    // pin as the MinHash one below: the probe join against the
    // (tbl, bkt)-bucketed manifest needs exactly one fewer exchange than
    // the identical join against a non-bucketed copy — the saved
    // exchange IS the manifest side's, the corpus-scale frame an
    // incremental batch must never re-shuffle.
    val e = Tables.embeddings(spark, sf)
    val existing = e.where(pmod(col("vec_id"), lit(2)) === 0)
    val batch = e.where(pmod(col("vec_id"), lit(2)) === 1)
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      ScaleOps.writeBucketed(
        Similarity.srpBandRows(existing, "vec_id", "embedding",
          bits = 4, tables = 24)
          .repartition(8, col("tbl"), col("bkt")),
        "graft_test_cosine_manifest", Seq("tbl", "bkt"), buckets = 8)
      Similarity.srpBandRows(existing, "vec_id", "embedding",
        bits = 4, tables = 24).write
        .mode("overwrite").saveAsTable("graft_test_cosine_plain")
      def probeJoin(manifestTable: String) =
        Similarity.srpBandRows(batch, "vec_id", "embedding",
          bits = 4, tables = 24).as("a")
          .join(spark.table(manifestTable).as("b"),
            col("a.tbl") === col("b.tbl") && col("a.bkt") === col("b.bkt"))
      val bucketed = probeJoin("graft_test_cosine_manifest")
      val planB = executedSimple(bucketed)
      val planBF = bucketed.queryExecution.explainString(FormattedMode)
      val planP = executedSimple(probeJoin("graft_test_cosine_plain"))
      assert(planBF.contains("Bucketed: true"),
        s"manifest scan must use the bucket layout:\n$planBF")
      val exB = "Exchange".r.findAllIn(planB).size
      val exP = "Exchange".r.findAllIn(planP).size
      assert(exB === exP - 1,
        s"bucketed SRP manifest should save exactly the manifest-side " +
          s"exchange (bucketed=$exB, plain=$exP):\n$planB\n--- vs ---\n$planP")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
      spark.sql("DROP TABLE IF EXISTS graft_test_cosine_manifest")
      spark.sql("DROP TABLE IF EXISTS graft_test_cosine_plain")
    }
  }

  test("incremental near-dup: bucketed band manifest joins with ZERO manifest-side exchange") {
    // The persisted-manifest contract: the manifest is written bucketed
    // by exactly the probe join's (band, bucket) key, so the batch's
    // probe reads it with no exchange above the manifest scan — at
    // 100 TB the manifest is the big side (the whole corpus's banded
    // rows) and re-shuffling it per batch would defeat the incremental
    // design. Differential pin: the identical probe join against a
    // NON-bucketed copy of the same rows needs exactly one more
    // exchange (the manifest side's). Broadcast is disabled — at the
    // fixture size AQE would broadcast the manifest and never exercise
    // the bucket path this test exists to prove.
    val docs = Tables.documents(spark, sf)
      .where(pmod(col("doc_id"), lit(10)) === 1 && col("doc_id") < 10000)
    val existing = docs.where(pmod(expr("doc_id div 10"), lit(2)) === 0)
    val batch = docs.where(pmod(expr("doc_id div 10"), lit(2)) === 1)
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      ScaleOps.writeBucketed(
        Dedup.bandManifest(existing, "doc_id", "text")
          .repartition(8, col("band"), col("bucket")),
        "graft_test_neardup_manifest", Seq("band", "bucket"), buckets = 8)
      Dedup.bandManifest(existing, "doc_id", "text").write
        .mode("overwrite").saveAsTable("graft_test_neardup_plain")
      def probeJoin(manifestTable: String) =
        Dedup.bandManifest(batch, "doc_id", "text").as("a")
          .join(spark.table(manifestTable).as("b"),
            col("a.band") === col("b.band")
              && col("a.bucket") === col("b.bucket"))
      val bucketed = probeJoin("graft_test_neardup_manifest")
      val planB = executedSimple(bucketed)
      val planBF = bucketed.queryExecution.explainString(FormattedMode)
      val planP = executedSimple(probeJoin("graft_test_neardup_plain"))
      assert(planB.contains("SortMergeJoin"), planB)
      assert(planBF.contains("Bucketed: true"),
        s"manifest scan must use the bucket layout:\n$planBF")
      val exB = "Exchange".r.findAllIn(planB).size
      val exP = "Exchange".r.findAllIn(planP).size
      assert(exB === exP - 1,
        s"bucketed manifest should save exactly the manifest-side " +
          s"exchange (bucketed=$exB, plain=$exP):\n$planB\n--- vs ---\n$planP")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
      spark.sql("DROP TABLE IF EXISTS graft_test_neardup_manifest")
      spark.sql("DROP TABLE IF EXISTS graft_test_neardup_plain")
    }
  }

  test("groupQuantilesByHistogram: one 10^7-row group — exact answers, bounded plan") {
    // The scaladoc claim made concrete: the exact tier's per-group
    // percentile buffer (WeeklyAgg.weeklyStatsCore) holds every raw value
    // of a group in one aggregation buffer — a 10^7-row group means a
    // 10^7-element array in a single task's memory, the thing that dies
    // first at 100 TB group sizes. The histogram path's state is one row
    // per DISTINCT value (1000 here, input-size-independent), its window
    // runs over those histogram rows, and the answers are still EXACT:
    // values are id % 1000 (uniform, 10^4 rows per value), so rank
    // ⌈q·n⌉ order statistics have closed forms — p50 = 499 (cum count
    // reaches 5·10^6 at value 499), p90 = 899, p99 = 989.
    val n = 10000000L
    val big = spark.range(n)
      .select(lit("g").as("k"), (col("id") % 1000).as("v"))
    val r = ScaleOps.groupQuantilesByHistogram(big, Seq(col("k")), col("v"),
      Seq(0.5, 0.9, 0.99))
    val plan = executedSimple(r)
    val row = r.collect().head
    assert(row.getAs[Long]("n") == n)
    assert(row.getAs[Long]("p50") == 499L)
    assert(row.getAs[Long]("p90") == 899L)
    assert(row.getAs[Long]("p99") == 989L)
    // the only fact-scale exchange is the histogram aggregation's; the
    // cumulative window, group total, and final agg share one (k)
    // exchange — a third would mean a stage stopped sharing it
    assert("Exchange".r.findAllIn(plan).size <= 3, plan)
  }

  test("partition_pruned_agg: the event_type predicate prunes partitions at the scan") {
    // The hive-partitioned layout's whole point: a partition-column
    // predicate must surface as a PartitionFilter (directory pruning —
    // unmatched partitions are never listed), not as a row-level
    // DataFilter the scan evaluates after reading everything.
    val plan = executedFormatted(
      SparkEntry.queries("partition_pruned_agg")(spark, sf))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("event_type")),
      s"no PartitionFilter on event_type:\n$plan")
  }

  test("bloom_pruned_join: the bloom probe filters the fact scan map-side") {
    // the probe must be a plain Filter predicate over the orders scan
    // (fused into codegen, before any join/exchange) — a might_contain
    // that only appears above the join would mean the semi-join
    // reduction never happened
    val plan = executedSimple(
      SparkEntry.queries("bloom_pruned_join")(spark, sf))
    assert(plan.contains("might_contain"), plan)
    val filterLine = plan.linesIterator
      .find(l => l.contains("Filter") && l.contains("might_contain"))
    assert(filterLine.nonEmpty, s"bloom probe is not a scan-side Filter:\n$plan")
  }

  test("winsorized_agg: the only unkeyed join is the 1-row cut-point broadcast") {
    val plan = executedSimple(SparkEntry.queries("winsorized_agg")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 2,
      s"more unkeyed joins than the quantile scalar attach allows:\n$plan")
  }

  test("selective_recompute: the delta is week-sparse, so the splice is real") {
    // The query's contract (incremental == full recompute) is only
    // meaningful if the base-aggregate passthrough branch contributes
    // rows — a delta touching every week degenerates the splice into a
    // plain full recompute. Mirror the query's fixture and check the
    // affected-week set is a strict minority of the weeks.
    val orders = Tables.orders(spark, sf)
    val yr = year(col("o_orderdate"))
    val oldSnap = orders
      .where(!(pmod(col("o_orderkey"), lit(7)) === 0 && yr === 1994))
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(5)) === 0 && yr === 1995,
          col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")))
    val newSnap = orders
      .where(!(pmod(col("o_orderkey"), lit(11)) === 0 && yr === 1996))
    val touched = graft.ops.ChangeOps.snapshotDiff(oldSnap, newSnap,
      Seq("o_orderkey"),
      Seq("o_totalprice", "o_orderstatus", "o_orderpriority"))
      .where(col("status") =!= "unchanged")
      .select("o_orderkey")
    val affected = oldSnap.join(touched, Seq("o_orderkey"), "left_semi")
      .unionByName(newSnap.join(touched, Seq("o_orderkey"), "left_semi"))
      .select(graft.ops.CoreOps.weekStart(col("o_orderdate")).as("week"))
      .distinct().count()
    val all = orders
      .select(graft.ops.CoreOps.weekStart(col("o_orderdate"))).distinct()
      .count()
    assert(affected > 0, "delta touched nothing — contract vacuous")
    assert(affected < all / 2,
      s"delta touches $affected of $all weeks — splice barely exercised")
  }

  test("nested_orders_agg: untouched struct fields prune out of the scan") {
    // The rollup reads only o_orderdate and o_totalprice inside the
    // nested struct; nested schema pruning (through the explode — the
    // GeneratorNestedColumnAliasing path) must keep o_orderkey and
    // o_orderpriority out of the parquet ReadSchema, or a 100 TB nested
    // feed pays IO for every field any array element carries.
    val df = executed(SparkEntry.queries("nested_orders_agg")(spark, sf))
    val formatted = df.queryExecution.explainString(FormattedMode)
    val read = formatted.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(read.nonEmpty, formatted)
    assert(read.contains("o_orderdate") && read.contains("o_totalprice"),
      read)
    assert(!read.contains("o_orderkey") && !read.contains("o_orderpriority"),
      s"nested pruning regressed — full structs reach the scan:\n$read")
  }

  test("charTrigramNll: histograms fuse map-side; no raw-trigram exchange") {
    val df = graft.ops.CorpusOps.charTrigramNll(Tables.documents(spark, sf),
      "doc_id", "text")
    val plan = executedSimple(df)
    // the fused TrigramCounts expression makes per-document histograms in
    // the scan projection: the only exchanges left are the charset³-
    // bounded model aggregation (which broadcasts to the probe) and the
    // per-document result rows — the raw (id, tri) instance stream never
    // becomes rows, so no exchange anywhere carries it
    assert(plan.contains("BroadcastHashJoin"), plan)
    val hashEx = factHashExchanges(plan)
    assert(hashEx <= 3, s"expected <=3 hash exchanges, got $hashEx:\n$plan")
  }

  test("auc_scores: histogram path — offsets broadcast, never a sort-merge join") {
    val plan = executedSimple(SparkEntry.queries("auc_scores")(spark, sf))
    // the U numerator folds over the score histogram's prefix sum: the
    // per-partition offsets table broadcasts back, and no fact-scale
    // global rank/sort-merge ever appears
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("embed_covariance: pair stream collapses map-side — ONE exchange, d²-bounded") {
    val plan = executedSimple(
      SparkEntry.queries("embed_covariance")(spark, sf))
    val gens = "Generate posexplode".r.findAllIn(plan).size
    assert(gens === 2, s"expected 2 posexplodes, got $gens:\n$plan")
    val hashEx = factHashExchanges(plan)
    assert(hashEx === 1, s"expected 1 hash exchange, got $hashEx:\n$plan")
    // partial aggregation BEFORE the exchange is what bounds its volume
    // to d(d+1)/2 rows per partition
    assert(plan.contains("HashAggregate"), plan)
  }

  test("vocab_coverage: one token explode; rank and sizes broadcast back") {
    val plan = executedSimple(
      SparkEntry.queries("vocab_coverage")(spark, sf))
    val gens = "Generate explode".r.findAllIn(plan).size
    assert(gens === 1, s"expected 1 explode, got $gens:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("drift family: every window is period-partitioned — no single-partition stage") {
    // the drift family's scale claim: cumulative and total windows all
    // partition by the period key, so no Exchange SinglePartition ever
    // feeds a Window (the final 1-row-per-week orderBy is TakeOrdered/
    // sort output, not a windowed stage). Covers the numeric (KS) and
    // both categorical (JSD r8, χ² r9) drift monitors.
    for (q <- Seq("ks_drift_weekly", "chisq_drift_weekly")) {
      val plan = executedFormatted(SparkEntry.queries(q)(spark, sf))
      val single = "Exchange SinglePartition".r.findAllIn(plan).size
      assert(single === 0, s"$q: expected no SinglePartition exchange:\n$plan")
    }
  }

  test("rolling_windows_skewed: dominant dim real; fact exchange splits on the id domain") {
    // Non-vacuity first (a balanced dim would make the survival claim
    // empty): the synthesized dim really concentrates >= 50 % of orders.
    val o = Tables.orders(spark, sf)
    val n = o.count()
    val dom = o.where(col("o_orderkey") % 2 === 1
      || col("o_orderpriority") === "1-URGENT").count()
    assert(dom * 2 >= n, s"dominant share only $dom of $n")
    val plan = executedSimple(
      SparkEntry.queries("rolling_windows_skewed")(spark, sf))
    // Survival shape: no order-statistics group buffer anywhere, and the
    // fact-scale exchange (innermost = printed last) is keyed on
    // (week, dim, o_orderkey) — the dominant dim splits across the id
    // domain before any (week, dim)-keyed stage — above a map-side
    // partial aggregate.
    assert(!plan.contains("ObjectHashAggregate"),
      s"skew path must not buffer groups:\n$plan")
    val fact = plan.substring(plan.lastIndexOf("Exchange hashpartitioning"))
    val keys = fact.substring(0, fact.indexOf(")") + 1)
    assert(keys.contains("o_orderkey"),
      s"fact exchange not keyed on the id domain: $keys\n$plan")
    assert(fact.contains("partial"),
      s"fact rows shuffled without map-side combine:\n$plan")
  }

  test("spearman_corr: ONE fact pass — every downstream consumer reads the checkpointed histogram") {
    // Catalyst collapses each marginal grouping straight onto the base
    // table (no exchange reuse fires), so without the joint histogram's
    // materialization the fact parquet would be scanned three times.
    // Post-fix, the assembled plan must contain ZERO file scans — all
    // three consumers read the checkpoint RDD.
    val plan = executedSimple(SparkEntry.queries("spearman_corr")(spark, sf))
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans === 0, s"expected 0 fact scans, got $scans:\n$plan")
    assert(plan.contains("ExistingRDD"),
      s"expected the checkpointed joint histogram:\n$plan")
  }

  test("bootstrap_ci_weekly: the 100× fan-out dies map-side — partials before the (week, b) exchange") {
    val plan = executedSimple(
      SparkEntry.queries("bootstrap_ci_weekly")(spark, sf))
    // exactly one replicate explode, and the exchange that receives its
    // output is keyed on (week, replicate) ABOVE a partial aggregate —
    // the proof the shuffle carries weeks×100 partials, not 100× facts
    val gens = "Generate explode".r.findAllIn(plan).size
    assert(gens === 1, s"expected 1 explode, got $gens:\n$plan")
    val fact = plan.substring(plan.lastIndexOf("Exchange hashpartitioning"))
    val keys = fact.substring(0, fact.indexOf(")") + 1)
    assert(keys.contains("b"),
      s"replicate fan-out not reduced on (week, b): $keys\n$plan")
    assert(fact.contains("partial"),
      s"fan-out shuffled without map-side combine:\n$plan")
  }

  test("abc_parts: range-exchange prefix sum; only the pid-offsets window exists") {
    val plan = executedSimple(SparkEntry.queries("abc_parts")(spark, sf))
    // the cumulative curve comes from the two-pass distributed prefix
    // sum: its range exchange runs at the checkpoint the final plan
    // reads back (ExistingRDD), plus globalRunningTotal's ONE window
    // over partition IDs (bounded by cluster size, the documented
    // exception) — no other window, so the single-partition-over-data
    // trap cannot exist in this plan
    assert(plan.contains("ExistingRDD"),
      s"expected the checkpointed range-partitioned curve:\n$plan")
    val windows = "Window \\[".r.findAllIn(plan).size
    val pidWindows = "Window \\[[^\\n]*__pid".r.findAllIn(plan).size
    assert(windows === pidWindows && windows >= 1,
      s"expected only the __pid offsets window ($pidWindows of $windows):\n$plan")
  }

  test("top_paths_events: rank window and path pivot share ONE user exchange") {
    val plan = executedSimple(
      SparkEntry.queries("top_paths_events")(spark, sf))
    val userEx = "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(userEx === 1,
      s"expected exactly 1 user-keyed exchange, got $userEx:\n$plan")
    val aliasEx = "Exchange hashpartitioning\\(__u".r.findAllIn(plan).size
    assert(aliasEx === 0,
      s"pivot re-shuffled on the aliased key instead of reusing:\n$plan")
  }

  test("rfm_segments: all three threshold frames broadcast back — scoring is map-only") {
    val plan = executedSimple(SparkEntry.queries("rfm_segments")(spark, sf))
    // 4 broadcast nested-loop (1-row cross) joins: anchor + r/f/m cuts
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj >= 4, s"expected >=4 broadcast cross joins, got $bnlj:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"threshold attach must never sort-merge:\n$plan")
  }

  test("trigram_search: index prunes before verify — one explode, broadcast pattern joins") {
    val plan = executedSimple(
      SparkEntry.queries("trigram_search")(spark, sf))
    // the per-doc distinct-trigram explode runs exactly once, and both
    // pattern-side tables (grams, arity) broadcast — the fact-scale rows
    // never wait on a shuffled join for the index probe
    val gens = "Generate explode".r.findAllIn(plan).size
    assert(gens === 1, s"expected 1 explode, got $gens:\n$plan")
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(bhj >= 2, s"expected >=2 broadcast joins, got $bhj:\n$plan")
    // the real `contains` verify runs once, against the candidate join's
    // column pair — a pattern-per-scan LIKE rescan would show one
    // Contains per pattern pushed into the file scan
    val contains = "Contains\\(".r.findAllIn(plan).size
    assert(contains === 1, s"expected 1 Contains, got $contains:\n$plan")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx <= 3, s"expected <=3 hash exchanges, got $hashEx:\n$plan")
  }

  test("epoch_shuffle: positions via range exchange, never a single-partition window") {
    // The trap this op exists to avoid: row_number() OVER (ORDER BY
    // hash) funnels the corpus through ONE task. The distributed
    // prefix sum's plan must show a range exchange and ZERO window
    // operators.
    val plan = executedSimple(
      SparkEntry.queries("epoch_shuffle")(spark, sf))
    assert(plan.contains("Exchange rangepartitioning"),
      s"expected a range exchange:\n$plan")
    // the final orderBy is the artifact sort; no Window operator may
    // appear anywhere (the pid-offset window lives on a bounded
    // partition-count frame inside globalRunningTotal — it shows as
    // Window over __pid rows; allow only that shape)
    val windows = "Window \\[".r.findAllIn(plan).toList
    assert(windows.size <= 2, s"unexpected window operators:\n$plan")
    assert(!plan.contains("row_number() windowspecdefinition(md5"),
      s"hash-ordered row_number window must not exist:\n$plan")
  }

  test("bpe_encode_stats: corpus pass is ONE broadcast join — plan depth independent of merge count") {
    // The round-10 scale fix: the previous encode chained one
    // regexp_replace per trained merge over every word OCCURRENCE —
    // fact-side plan growth linear in the merge table, unviable at a
    // production 30k-merge vocabulary. The vocabulary-scale encode
    // keeps every rewrite on the checkpointed vocab loop; the
    // corpus-scale pass is one broadcast probe of (form → n_tokens).
    // Pin both halves: zero regex rewrites anywhere in the executed
    // plan (the vocab side enters as a sealed checkpoint scan), and a
    // plan that is LINE-FOR-LINE the same size at 2 and 8 merges.
    val docs = Tables.documents(spark, sf)
    def planAt(rounds: Int) = executedSimple(
      CorpusOps.bpeEncodeStats(docs, "source", "text", rounds))
    val p2 = planAt(2)
    val p8 = planAt(8)
    Seq(p2, p8).foreach { p =>
      assert(!p.contains("regexp_replace"),
        s"no per-merge rewrite may reach the corpus pass:\n$p")
      val bhj = "BroadcastHashJoin".r.findAllIn(p).size
      assert(bhj === 1, s"expected exactly 1 broadcast join, got $bhj:\n$p")
    }
    assert(p2.linesIterator.size === p8.linesIterator.size,
      s"plan depth grew with the merge count:\n$p2\n--- vs ---\n$p8")
  }

  test("bpe_encode_ids: fact pass is two broadcast probes, plan depth independent of merge count") {
    // The id materialization keeps the stats encode's contract: zero
    // per-merge rewrites on the corpus (the vocab enters as the sealed
    // checkpoint), broadcast probes only (two on the fact side — form →
    // symbols, symbol → id — plus the merge-round attach inside the
    // vocab-bounded id-table build), and a plan that is line-for-line
    // the same size at 2 and 6 merges. The id table's row_number window
    // and its single-partition exchange run on the vocab-bounded
    // broadcast side, never the corpus.
    val docs = Tables.documents(spark, sf)
    def planAt(rounds: Int) = executedSimple(
      graft.ops.CorpusOps.bpeEncodeIds(docs, "doc_id", "text",
        graft.ops.CorpusOps.bpeTrain(docs, "text", rounds)))
    val p2 = planAt(2)
    val p6 = planAt(6)
    Seq(p2, p6).foreach { p =>
      assert(!p.contains("regexp_replace"),
        s"no per-merge rewrite may reach the corpus pass:\n$p")
      val bhj = "BroadcastHashJoin".r.findAllIn(p).size
      assert(bhj === 3, s"expected exactly 3 broadcast joins, got $bhj:\n$p")
      assert(!p.contains("SortMergeJoin"), p)
    }
    assert(p2.linesIterator.size === p6.linesIterator.size,
      s"plan depth grew with the merge count:\n$p2\n--- vs ---\n$p6")
  }

  test("knn_ivfadc_topk: candidate scoring is CELL-pruned — the LUT join keys on cell") {
    // The IVFADC contract: a candidate whose coarse cell no query
    // probes must never be scored. Structurally that means the
    // broadcast LUT join's key INCLUDES the cell column — scoring keyed
    // only on (subspace, code) would re-admit the whole corpus per
    // query (pqAdcTopK's exhaustive shape, exactly what this operator
    // exists to avoid).
    // rerank on (the graded IVFADC+R shape): the exact leg must ride as
    // broadcast probes, leaving the LUT join's cell-keyed pruning intact
    val ann = EmbeddingOps.ivfadcTopK(
      Tables.embeddings(spark, sf), "vec_id", "embedding", dim = 64,
      nlist = 8, nprobe = 3, m = 4, k = 8, iterations = 3,
      queryIds = Seq(1L, 2L, 3L), topK = 10, rerank = 50)
    val plan = executedFormatted(ann)
    // FormattedMode lists join keys; find the LUT join and demand cell
    // leads its key triple
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.matches("(?s).*Left keys \\[3\\]: \\[cell.*") ||
      plan.matches("(?s).*Left keys: \\[cell.*"),
      s"LUT join must key on (cell, subspace, code):\n$plan")
    // the exact re-rank never sort-merges: candidate set and query
    // vectors are both broadcast into the quantized frame
    assert(!plan.contains("SortMergeJoin"),
      s"re-rank leg must be broadcast probes, not a shuffled join:\n$plan")
  }

  test("embed_drift_psi: PSI runs on the one checkpointed histogram — no scan, no window") {
    // The projections are map-only and the (direction, bin) histogram is
    // bin-bounded and materialized ONCE (it feeds the totals and the
    // term join) — so the returned plan reads the checkpoint (zero
    // parquet scans) and carries no window and no rank machinery.
    val plan = executedSimple(
      SparkEntry.queries("embed_drift_psi")(spark, sf))
    assert(plan.contains("ExistingRDD"),
      s"expected the checkpointed histogram:\n$plan")
    assert(!plan.contains("Scan parquet"),
      s"PSI must not re-run the projection scans:\n$plan")
    assert(!plan.contains("Window"), plan)
  }

  test("incremental_frame_neardup: batch fingerprints enter once; manifest scan is bucketed") {
    // The batch's band rows materialize once for the manifest probe and
    // the internal self-join (the review finding: each leg re-decoded
    // and re-fingerprinted the whole odd half), and the persisted
    // manifest reads through its (band, bval) bucket layout.
    val df = SparkEntry.queries("incremental_frame_neardup")(spark, sf)
    val plan = executedSimple(df)
    val planF = df.queryExecution.explainString(FormattedMode)
    assert(plan.contains("ExistingRDD"),
      s"batch band rows must enter as the one checkpoint:\n$plan")
    assert(planF.contains("Bucketed: true"),
      s"manifest scan must use the bucket layout:\n$planF")
  }

  test("incremental_ivf_append: cells read from the stored postings, queries broadcast, work table dropped") {
    // The serving probe must join the tiny (qid × nprobe) side broadcast
    // against the posting TABLE — cells come from storage (the append
    // contract), never a re-assignment of the existing corpus, and
    // nothing in the plan may fall back to a cartesian scan. The query
    // is self-cleaning: the returned frame is the materialized
    // checkpoint, so the serving-plan assertions read the explains the
    // query captured BEFORE dropping its per-run working table — and the
    // warehouse must come back without any graft_ivf_work_* dir.
    val df = SparkEntry.queries("incremental_ivf_append")(spark, sf)
    assert(df.count() > 0)
    val plan = stripInitialPlan(
      SparkEntry.capturedPlans("incremental_ivf_append.simple"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val planF = SparkEntry.capturedPlans("incremental_ivf_append.formatted")
    assert(planF.contains("graft_ivf_work"),
      s"serving must read the grown posting table:\n$planF")
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_ivf_work")),
      "self-cleaning contract: no graft_ivf_work_* table may survive the run")
  }

  test("incremental_ivfadc_append: codes read from the stored table, LUT broadcast, work table dropped") {
    // The ADC serving probe joins the driver-built LUT (broadcast)
    // against the posting TABLE on (cell, subspace, code) — codes come
    // from storage, the existing half is never re-encoded on the serving
    // path, nothing falls back to a cartesian scan — and the per-run
    // working table self-cleans like the flat tier's.
    val df = SparkEntry.queries("incremental_ivfadc_append")(spark, sf)
    assert(df.count() > 0)
    val plan = stripInitialPlan(
      SparkEntry.capturedPlans("incremental_ivfadc_append.simple"))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val planF =
      SparkEntry.capturedPlans("incremental_ivfadc_append.formatted")
    assert(planF.contains("graft_ivfadc_work"),
      s"serving must read the grown code table:\n$planF")
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_ivfadc_work")),
      "self-cleaning contract: no graft_ivfadc_work_* table may survive")
  }

  test("nb_lang_classify: model probes broadcast, class fan-out is the bounded nested loop") {
    // The NB model is vocab×|C| bounded whatever the corpus size, so the
    // likelihood probe must be a BroadcastHashJoin and the per-document
    // class fan-out a |C|-row BroadcastNestedLoopJoin — a shuffled join
    // on either would move the fact-scale token counts once per class.
    val plan = executedSimple(
      SparkEntry.queries("nb_lang_classify")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("nb_lang_classify_hashed: model exchanges are bucket-bounded — no raw token crosses") {
    // The hashed variant's whole point is that the model side is
    // buckets×|C| bounded BY CONSTRUCTION: tokens reduce to md5 bucket
    // ids map-side (inside the project under the explode), so no
    // exchange anywhere in the plan may carry the raw token column
    // (__w0) — the structural proof that "model size is a choice, not a
    // corpus property". Probe shape matches the exact path: broadcast
    // likelihood probe, bounded |C|-row class fan-out, no cartesian.
    val df = SparkEntry.queries("nb_lang_classify_hashed")(spark, sf)
    val plan = executedSimple(df)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val planF = df.queryExecution.explainString(FormattedMode)
    val exchBlocks = planF.split("\n\n").filter(_.contains("Exchange"))
    assert(exchBlocks.nonEmpty, s"no exchange found:\n$planF")
    assert(exchBlocks.forall(!_.contains("__w0#")),
      "raw token column shipped through an exchange — the bucket hash " +
        s"must run map-side:\n${exchBlocks.filter(_.contains("__w0#")).mkString("\n\n")}")
  }

  test("dsir_select: weight table broadcasts, top-k is TakeOrdered, incidence reads once") {
    // Both feature distributions reduce to <=4096 rows and broadcast;
    // the per-(doc, bucket) incidence enters as ONE checkpoint (it feeds
    // the raw fit AND the scoring probe — without it the raw text would
    // scan twice); the global top-k must be distributed TakeOrdered,
    // never a single-partition full sort.
    val plan = executedSimple(SparkEntry.queries("dsir_select")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrdered, not a global sort:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("perplexity_buckets: thresholds broadcast back; scored frame enters as the one checkpoint") {
    // The tertile thresholds come from the per-(lang, score) HISTOGRAM
    // (bounded domain), never from ranking raw documents, and the scored
    // frame materializes once for its two consumers — so the returned
    // plan reads the checkpoint (zero parquet scans) and the threshold
    // attach is a broadcast.
    val plan = executedSimple(
      SparkEntry.queries("perplexity_buckets")(spark, sf))
    assert(!plan.contains("Scan parquet"),
      s"scored frame must enter as the one checkpoint:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("mixture_interleave / curriculum_order: positions ride the prefix sum — only bounded windows") {
    // Both orderings come from globalRunningTotal's two-pass prefix sum.
    // The only Window operators allowed are the documented bounded ones:
    // the __pid offsets window (cluster-size frame) and the
    // stratum-offset window (__n over |strata| rows) — NEVER a
    // row_number over raw corpus rows, which is the single-partition
    // trap these operators exist to avoid.
    Seq("mixture_interleave", "curriculum_order").foreach { q =>
      val plan = executedSimple(SparkEntry.queries(q)(spark, sf))
      assert(plan.contains("ExistingRDD"),
        s"$q: expected the checkpointed range-partitioned pass:\n$plan")
      val windows = "Window \\[".r.findAllIn(plan).size
      val bounded =
        "Window \\[[^\\n]*(__pid|__n)".r.findAllIn(plan).size
      assert(windows === bounded,
        s"$q: unexpected raw-row window ($bounded of $windows):\n$plan")
      assert(!plan.contains("row_number"),
        s"$q: positions must come from the prefix sum, not a rank:\n$plan")
    }
  }

  test("cluster_balanced_sample: quota rides the prefix sum — no per-cluster rank window") {
    // With k = 8 clusters a row_number window would funnel the entire
    // embedding corpus into ≤ 8 sort partitions. The quota must come off
    // globalRunningTotal's range-partitioned prefix sum; the only Window
    // allowed is over the bounded offset frames (__pid / __n).
    val plan = executedSimple(
      SparkEntry.queries("cluster_balanced_sample")(spark, sf))
    val windows = "Window \\[".r.findAllIn(plan).size
    val bounded = "Window \\[[^\\n]*(__pid|__n)".r.findAllIn(plan).size
    assert(windows === bounded,
      s"unexpected raw-row window ($bounded of $windows):\n$plan")
    assert(!plan.contains("row_number"),
      s"the quota rank must come from the prefix sum:\n$plan")
  }

  test("winnow_pairs: candidates meet on the digest — no cartesian, no gram text in exchanges") {
    // The MOSS match join is an equi-join on the fingerprint hash (the
    // LSH-bucket shape); gram text must be digested in the scan
    // projection and never partition — or ride — an exchange.
    val plan = executedSimple(SparkEntry.queries("winnow_pairs")(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    "Exchange [^\\n]*".r.findAllIn(plan).foreach { ex =>
      assert(!ex.contains("array_join"),
        s"gram text must not cross an exchange:\n$ex")
    }
  }

  test("incremental_winnow_persisted: batch fingerprints enter once; manifest reads bucketed") {
    // The batch's distinct (id, hash) rows materialize once for the
    // cross probe AND the internal self-join; the persisted manifest
    // reads through its fp_hash bucket layout.
    val df = SparkEntry.queries("incremental_winnow_persisted")(spark, sf)
    val plan = executedSimple(df)
    val planF = df.queryExecution.explainString(FormattedMode)
    assert(plan.contains("ExistingRDD"),
      s"batch fingerprints must enter as the one checkpoint:\n$plan")
    assert(planF.contains("Bucketed: true"),
      s"manifest scan must use the bucket layout:\n$planF")
  }

  test("contrastive_batches: the deal rides the prefix sum — only bounded windows") {
    val plan = executedSimple(
      SparkEntry.queries("contrastive_batches")(spark, sf))
    val windows = "Window \\[".r.findAllIn(plan).size
    val bounded = "Window \\[[^\\n]*(__pid|__n)".r.findAllIn(plan).size
    assert(windows === bounded,
      s"unexpected raw-row window ($bounded of $windows):\n$plan")
    assert(!plan.contains("row_number"),
      s"batch/slot must come from the prefix sum, not a rank:\n$plan")
  }

  test("distinct_ngram_ratio: only gram digests cross the exchange") {
    // The gram text is md5-digested in the scan projection (the repo's
    // digest discipline): no exchange may partition on — or carry — the
    // joined gram string, and no window/rank machinery belongs in what
    // is a two-level hash aggregate.
    val plan = executedSimple(
      SparkEntry.queries("distinct_ngram_ratio")(spark, sf))
    "Exchange [^\\n]*".r.findAllIn(plan).foreach { ex =>
      assert(!ex.contains("array_join"),
        s"gram text must not cross an exchange:\n$ex")
    }
    assert(!plan.contains("Window"), plan)
  }

  test("cdc_chunk_dedup: chunk text never crosses an exchange, no rank machinery") {
    // The CDC claim: boundary detection and the chunk substrings are
    // map-side scan work; the keeper aggregate and join ride the 16-byte
    // md5 digest only — no exchange may partition on or carry the chunk
    // text (or the raw document), and nothing rank- or cartesian-shaped
    // belongs in a digest group-by.
    val plan = executedSimple(
      SparkEntry.queries("cdc_chunk_dedup")(spark, sf))
    "Exchange [^\\n]*".r.findAllIn(plan).foreach { ex =>
      assert(!ex.contains("chunk_text") && !ex.contains("substr"),
        s"chunk text must not cross an exchange:\n$ex")
    }
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("embed_quantize_dims: codebook attaches as ONE broadcast row, no window/SMJ") {
    // The per-dim SQ8 claim: the corpus exchange produces only the d-row
    // codebook (posexplode min/max partial-aggs map-side), which comes
    // back as a single broadcast row — so the plan carries exactly one
    // 1-row BroadcastNestedLoopJoin and nothing rank- or merge-shaped.
    val plan = executedSimple(
      SparkEntry.queries("embed_quantize_dims")(spark, sf))
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size === 1, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("knn_sq8_topk: broadcast-only joins, rank<=k pushes into WindowGroupLimit") {
    // Code-space serving shape: corpus encodes map-side against the
    // broadcast codebook row, queries broadcast against the encoded
    // corpus, each ranking pass collapses through WindowGroupLimit
    // before any exchange, and the recall legs join k-bounded tables —
    // nothing may sort-merge or fall back to a cartesian scan.
    val plan = executedSimple(
      SparkEntry.queries("knn_sq8_topk")(spark, sf))
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the truth leg re-derives pairs: codebook ×2 (queries, corpus) +
    // the query broadcast — never more than these three unkeyed attaches
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 3, plan)
  }
}
