package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-preparation operators for training-data pipelines (north-star
  * extension tier): deterministic dataset splitting, context-window
  * packing, and TF-IDF term scoring.
  *
  * All three are engine-portable by construction (md5 buckets, integer
  * window arithmetic, 4-dp-rounded logs), so their graded queries carry
  * full DuckDB oracles rather than rows-only checks.
  */
object CorpusOps {

  /** Content-addressed split bucket in [0, buckets): the first 8 hex chars
    * of `md5(key)` as an integer, mod buckets. Stable under reshuffles,
    * re-ingestion, and engine changes — the property a train/test split
    * must have so no example silently migrates between splits across
    * pipeline runs. Pure expressions: at 100 TB this is a map-only stage.
    */
  def splitBucket(key: Column, buckets: Int = 100): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Assign each row a named split by cumulative weight over the md5
    * bucket space, e.g. `Seq("train" -> 80, "val" -> 10, "test" -> 10)`
    * with the default 100 buckets.
    */
  def assignSplit(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Int)],
                  buckets: Int = 100): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == buckets,
      s"split weights ${splits.map(_._2)} must sum to buckets=$buckets")
    val bucket = splitBucket(col(keyCol), buckets)
    val thresholds = splits.scanLeft(0)(_ + _._2).tail
    // when-chain over cumulative weights: bucket < t1 -> s1, < t2 -> s2, …
    // (the last threshold equals `buckets`, so every bucket is covered)
    val chain = splits.zip(thresholds).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), t)) =>
        Some(acc match {
          case None => when(bucket < t, name)
          case Some(c) => c.when(bucket < t, name)
        })
    }.get
    df.withColumn("split", chain)
  }

  /** Leakage-safe (group-aware) split: buckets by the CONTENT digest
    * instead of the row id, so every exact duplicate of a document lands
    * in the same split BY CONSTRUCTION — the standard guard against
    * train/test leakage through duplicated examples (id-keyed splits
    * scatter a document's copies across splits, silently inflating eval).
    * Adds a `digest` column (md5 of the content bytes) next to `split`.
    * Still map-only: digest and bucket are pure expressions, nothing
    * exchanges. Near-duplicate leakage needs the dedup tier first (drop
    * near-dups, then split); the exact-dup invariant alone is what this
    * operator guarantees.
    */
  def leakageSafeSplit(df: DataFrame, contentCol: String,
                       splits: Seq[(String, Int)],
                       buckets: Int = 100): DataFrame =
    assignSplit(
      df.withColumn("digest", md5(col(contentCol).cast("binary"))),
      "digest", splits, buckets)

  /** Deterministic content-addressed downsampling: keep a row iff its md5
    * bucket falls below `fraction` of the bucket space — the sampling
    * companion of [[assignSplit]] (same hash, so samples are reproducible
    * across runs and engines, stratify nothing, and NEST: the 10% sample
    * is a subset of the 50% sample, which makes scaling experiments
    * comparable). Map-only; the filter pushes to the scan.
    */
  def deterministicSample(df: DataFrame, keyCol: String, fraction: Double,
                          buckets: Int = 10000): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction=$fraction")
    df.where(splitBucket(col(keyCol), buckets)
      < math.round(fraction * buckets))
  }

  /** Per-row weighted (importance) sampling: keep a row with probability
    * `weight` (a [0,1] Column — e.g. a quality score), quantized to
    * 1/buckets. Same md5 bucket space as [[deterministicSample]], so the
    * draw is content-addressed: reproducible across runs, engines, and
    * partitionings, and monotone in the weight (raising a row's weight can
    * only add it to the sample, never evict it — upweighting experiments
    * stay supersets). Map-only; no RNG, no seed plumbing, no shuffle.
    */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column,
                     buckets: Int = 1000000): DataFrame =
    df.where(splitBucket(col(keyCol), buckets) <
      floor(weight * lit(buckets.toDouble)).cast("long"))

  /** Temperature-scaled source mixture — the α-smoothed multinomial the
    * multilingual/multi-source pretraining recipes sample with (mT5 §3.1,
    * XLM-R: p_i ∝ n_i^α, α < 1 upsamples the tail, α = 1 is natural
    * proportions) at α = 1/2: per-source sampling rates toward a
    * `targetFrac`·N document budget, REALIZED as the content-addressed
    * md5 draw ([[weightedSample]]'s bucket space), so the sampled set is
    * a pure function of the corpus — reproducible across engines, runs,
    * and partitionings, and monotone in the rate.
    *
    * α is FIXED at 1/2 — the sqrt smoothing — deliberately: IEEE-754
    * sqrt is CORRECTLY ROUNDED on every engine, while libm pow(x, α) is
    * only ≤1-ulp accurate and differs across platforms, which would
    * reintroduce last-ulp drift exactly at the floor(·10⁶) rate
    * quantization this op stakes its replayability on. (mT5's published
    * settings bracket 0.5; T5's multilingual ancestor used 0.5 itself.)
    *
    * Determinism discipline: the smoothed weights √n_i quantize to
    * micro-unit longs BEFORE the normalizing sum (a double sum over
    * sources would be accumulation-order noise); every rate is then a
    * fixed dag of exact-integer-valued doubles — floor(·1e6 + 0.5) to
    * the final micro-rate both engines reproduce bit-for-bit. Rates cap
    * at 1 (a tail source wanting more than it has is taken whole — the
    * standard clamp; the realized total then undershoots the budget
    * honestly rather than oversampling heads).
    *
    * Scale shape: ONE source-keyed hash aggregate (sources are bounded);
    * rates broadcast back onto rows; the draw is a map-side filter.
    *
    * @return per source: n_docs, rate_micro (the exact integer rate ×
    *         10⁶), n_sampled, sampled-id checksum
    */
  def temperatureMixture(df: DataFrame, keyCol: String, sourceCol: String,
                         targetFrac: Double = 0.5): DataFrame = {
    require(targetFrac > 0.0 && targetFrac <= 1.0,
      s"targetFrac=$targetFrac must be in (0, 1]")
    val cnt = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
    val wMicro = floor(sqrt(col("n_docs").cast("double")) * 1e6
      + lit(0.5)).cast("long")
    val tot = cnt.agg(sum(col("n_docs")).as("__n"),
      sum(wMicro).as("__z"))
    val rates = cnt.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        least(lit(1000000L), floor(
          wMicro.cast("double") / col("__z").cast("double")
            * (col("__n").cast("double") * lit(targetFrac))
            / col("n_docs").cast("double") * 1e6 + lit(0.5))
          .cast("long")).as("rate_micro"))
      .localCheckpoint(true)
    val sampled = df
      .select(col(keyCol).as("__k"), col(sourceCol).as("source"))
      .join(broadcast(rates.select(col("source"), col("rate_micro"))),
        Seq("source"))
      .where(splitBucket(col("__k"), 1000000) < col("rate_micro"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_sampled"), sum(col("__k")).as("id_sum"))
    rates.join(sampled, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("rate_micro"),
        coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
        coalesce(col("id_sum"), lit(0L)).as("id_sum"))
  }

  /** Greedy sequential context-window packing: documents are laid out in
    * `idCol` order within each shard, and each lands at byte-offset-style
    * token position `cum - n_tokens`; `pack_id` is that position divided
    * by the token budget (documents may straddle a boundary — the
    * concat-then-chunk layout LLM pretraining uses).
    *
    * Packing requires an order, and a global order is a single-partition
    * sort — so the unit of ordering is the shard (`shardCol`): shards pack
    * independently and in parallel, which is exactly how a 100 TB corpus
    * is laid out (per-source/per-language shards). Integer window
    * arithmetic only — any engine reproduces it bit-for-bit.
    */
  def packSequences(df: DataFrame, idCol: String, shardCol: String,
                    tokens: Column, budget: Int): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    df.select(col(idCol), col(shardCol).as("shard"), tokens.as("n_tokens"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      // `div`, not `/`: Column division is double, which rounds across an
      // integer boundary once the cumulative count nears 2^53/budget — a
      // real magnitude for a dominant shard of a trillion-token corpus.
      // Integral division keeps the claimed bit-for-bit integer arithmetic
      // at any scale.
      .withColumn("pack_id", expr(s"(__cum - n_tokens) div $budget"))
      .withColumn("pack_offset", (col("__cum") - col("n_tokens")) % budget)
      .drop("__cum")
  }

  /** Shared scaffold for the WHOLE-document bin-packing layouts
    * ([[packSequencesBfd]], [[packSequencesNextFit]]): collect each
    * shard's (sort key, id, effective length) list, run `foldSql` — an
    * `aggregate` higher-order expression whose state must expose an
    * `asg: array<struct<bin_id, bin_offset>>` aligned with the sorted
    * items — and explode the assignments back out.
    *
    * Scale posture (stated, not hidden): bin packing is ORDER-dependent
    * state, so the unit of sequential work is the shard — exactly
    * [[packSequences]]' argument, where shards pack independently and in
    * parallel (per-source/per-language shards at 100 TB). What gets
    * collected per shard is (8-byte id, 8-byte length) — never text —
    * in ONE hash aggregate on the shard key; the fold itself is one
    * codegen-adjacent native expression evaluated row-locally per shard.
    * A shard too large for its (id, len) list to sit in one task is a
    * sharding bug upstream (the same boundedness the window sort in
    * [[packSequences]] assumes).
    *
    * Documents longer than `budget` are truncated to `budget` for
    * placement (the dataloader convention — a doc that exceeds the
    * context window occupies exactly one full sequence).
    */
  private def packBins(df: DataFrame, idCol: String, shardCol: String,
                       tokens: Column, budget: Int, sortKey: Column,
                       foldSql: String): DataFrame = {
    // `sortKey` is evaluated on the projected frame: (idCol, shard,
    // __len — the budget-truncated effective length)
    require(budget > 0, s"budget=$budget must be positive")
    df.select(col(idCol), col(shardCol).as("shard"),
        least(tokens, lit(budget.toLong)).cast("long").as("__len"))
      .groupBy(col("shard"))
      .agg(array_sort(collect_list(struct(
        sortKey.as("srt"), col(idCol).as("id"), col("__len").as("len"))))
        .as("__items"))
      .select(col("shard"), col("__items"), expr(foldSql).as("__st"))
      .select(col("shard"), col("__items"),
        col("__st").getField("asg").as("__asg"))
      .select(col("shard"),
        explode(arrays_zip(col("__items"), col("__asg"))).as("__z"))
      .select(col("__z.__items.id").as(idCol), col("shard"),
        col("__z.__items.len").as("n_tokens"),
        col("__z.__asg.bin_id").as("bin_id"),
        col("__z.__asg.bin_offset").as("bin_offset"))
  }

  /** Best-fit-decreasing whole-document sequence packing — the loader
    * answer to the tail waste [[packReport]] makes visible on the greedy
    * concat-then-chunk layout, for consumers that need document-aligned
    * sequences (no boundary-spanning attention masks): documents sort by
    * (effective length DESC, id), and each is placed in the bin with the
    * SMALLEST remaining capacity that still fits (ties → lowest bin
    * index — encoded structurally: `array_position` returns the FIRST
    * occurrence of the minimal remainder), else opens a new bin. Johnson
    * (1973): BFD/FFD use ≤ 11/9·OPT + 6/9 bins; the graded query pairs
    * this layout with [[packSequencesNextFit]] and grades
    * `bfd_no_worse` as a measured contract.
    *
    * Deterministic integer arithmetic end to end — any engine replays
    * the deal bit-for-bit (the oracle replays it as a recursive CTE).
    *
    * @return (idCol, shard, n_tokens — effective, bin_id — 0-based,
    *         bin_offset — token start within the bin)
    */
  def packSequencesBfd(df: DataFrame, idCol: String, shardCol: String,
                       tokens: Column, budget: Int): DataFrame = {
    val b = s"cast($budget as bigint)"
    // best remainder among bins that fit; lowest index on ties via
    // array_position's first-occurrence semantics
    val best = "array_min(filter(acc.rems, r -> r >= x.len))"
    val fold =
      s"""aggregate(
         |  __items,
         |  named_struct(
         |    'rems', cast(array() as array<bigint>),
         |    'asg', cast(array() as
         |      array<struct<bin_id: bigint, bin_offset: bigint>>)),
         |  (acc, x) -> if(size(filter(acc.rems, r -> r >= x.len)) = 0,
         |    named_struct(
         |      'rems', concat(acc.rems, array($b - x.len)),
         |      'asg', concat(acc.asg, array(named_struct(
         |        'bin_id', cast(size(acc.rems) as bigint),
         |        'bin_offset', cast(0 as bigint))))),
         |    named_struct(
         |      'rems', transform(acc.rems, (r, i) ->
         |        if(cast(i as bigint) = array_position(acc.rems, $best) - 1,
         |           r - x.len, r)),
         |      'asg', concat(acc.asg, array(named_struct(
         |        'bin_id', array_position(acc.rems, $best) - 1,
         |        'bin_offset', $b - $best))))))""".stripMargin
    packBins(df, idCol, shardCol, tokens, budget,
      sortKey = -col("__len"), foldSql = fold)
  }

  /** Next-fit whole-document packing in content (id) order — the naive
    * streaming dataloader baseline [[packSequencesBfd]] is graded
    * against: one open bin; a document that doesn't fit CLOSES it and
    * opens the next (closed bins never reopen). Same output shape.
    */
  def packSequencesNextFit(df: DataFrame, idCol: String, shardCol: String,
                           tokens: Column, budget: Int): DataFrame = {
    val b = s"cast($budget as bigint)"
    val fold =
      s"""aggregate(
         |  __items,
         |  named_struct(
         |    'rem', cast(0 as bigint), 'nb', cast(0 as bigint),
         |    'asg', cast(array() as
         |      array<struct<bin_id: bigint, bin_offset: bigint>>)),
         |  (acc, x) -> if(acc.nb = 0 or acc.rem < x.len,
         |    named_struct(
         |      'rem', $b - x.len, 'nb', acc.nb + 1,
         |      'asg', concat(acc.asg, array(named_struct(
         |        'bin_id', acc.nb, 'bin_offset', cast(0 as bigint))))),
         |    named_struct(
         |      'rem', acc.rem - x.len, 'nb', acc.nb,
         |      'asg', concat(acc.asg, array(named_struct(
         |        'bin_id', acc.nb - 1,
         |        'bin_offset', $b - acc.rem))))))""".stripMargin
    packBins(df, idCol, shardCol, tokens, budget,
      sortKey = col(idCol).cast("long"), foldSql = fold)
  }

  /** Overlapping token-window chunking — the retrieval/pretraining
    * complement of [[packSequences]]: where packing concatenates documents
    * into budget-sized sequences, chunking splits each document into
    * windows of `chunkTokens` tokens advancing by `strideTokens`
    * (overlap = chunkTokens − strideTokens), the layout RAG indexing and
    * long-document training use. The last window starts at the final
    * stride position that still leaves uncovered tokens, so every token
    * lands in at least one chunk.
    *
    * Pure per-row expressions + one generator (explode of an in-plan
    * sequence) — map-only, no shuffle, linear at any scale; integer
    * arithmetic and whitespace joins only, so any engine reproduces the
    * chunk text byte-for-byte.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens >= 1 && strideTokens >= 1
      && strideTokens <= chunkTokens,
      s"need 1 <= strideTokens=$strideTokens <= chunkTokens=$chunkTokens")
    // last chunk index: ceil((n - chunk) / stride) for n > chunk, else 0 —
    // as integer arithmetic (div truncates; the numerator is only negative
    // when a single chunk suffices, where greatest(0) applies on both
    // engines regardless of trunc-vs-floor division)
    val lastChunk = greatest(lit(0L), expr(
      s"(__n - $chunkTokens + ${strideTokens - 1}) div $strideTokens"))
    val start = (col("chunk_id") * strideTokens).cast("int")
    val window = slice(col("__toks"), start + 1, lit(chunkTokens))
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .withColumn("chunk_id", explode(sequence(lit(0L), lastChunk)))
      .select(col(idCol), col("chunk_id"),
        (col("chunk_id") * strideTokens).as("token_start"),
        size(window).cast("long").as("n_chunk_tokens"),
        array_join(window, " ").as("chunk_text"))
  }

  /** Chunk-level (paragraph-style) dedup — the CCNet line-dedup shape over
    * token windows: split every document into NON-overlapping
    * `chunkTokens`-token chunks, keep globally the FIRST occurrence of each
    * distinct chunk (min (doc, chunk) position), and reassemble each
    * document from its surviving chunks in order. Documents whose every
    * chunk appeared earlier elsewhere vanish entirely.
    *
    * Scale shape: the keeper set is one hash-aggregate keyed by the chunk
    * digest (min-position struct as the value — chunk text never rides that
    * exchange beyond its digest), the semi-join brings survivors back by
    * (doc, chunk), and reassembly is one aggregation on the doc key with an
    * in-group `array_sort` (chunks per doc are bounded by doc length, so
    * the sort is row-local work, not a global sort). The chunk generator
    * feeds both join branches and is deliberately RECOMPUTED rather than
    * persisted: the re-chunk is map-side CPU, while materializing the
    * chunked corpus to cache it would cost memory/disk proportional to the
    * whole input — the wrong trade at 100 TB (and the digest-only exchange
    * contract above is what actually bounds shuffle bytes).
    */
  def dropDuplicateChunks(df: DataFrame, idCol: String, textCol: String,
                          chunkTokens: Int): DataFrame = {
    val chunks = chunkDocuments(df, idCol, textCol, chunkTokens,
      strideTokens = chunkTokens)
    val keep = chunks
      .groupBy(md5(col("chunk_text").cast("binary")).as("__dig"))
      .agg(min(struct(col(idCol), col("chunk_id"))).as("__k"))
      .select(col(s"__k.$idCol").as(idCol),
        col("__k.chunk_id").as("chunk_id"))
    chunks.join(keep, Seq(idCol, "chunk_id"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
          s => s.getField("chunk_text")), " ").as(textCol))
  }

  /** Content-defined chunking (CDC) — the SHIFT-RESISTANT complement of
    * [[chunkDocuments]]'s fixed token windows: chunk boundaries fall
    * where a fixed-width rolling hash of the trailing `window` characters
    * hits 0 mod `divisor` (the Rabin/FastCDC family; Muthitacharoen et
    * al. SOSP'01), so inserting a prefix SHIFTS every downstream byte but
    * re-derives the SAME boundaries once the window clears the edit —
    * fixed-offset chunking loses every chunk after an insertion, CDC
    * loses at most the chunks touching it. Expected chunk length ≈
    * `divisor` characters.
    *
    * The hash is a positional window polynomial (Σ_j g(c_{i−j})·33^j mod
    * 2³¹, g the Knuth-multiplicative byte mix), NOT the gear/Rabin
    * incremental recurrence: each position's value depends only on its
    * own window, so boundary detection is a per-index `filter` any
    * engine replays literally — the same positional-independence trade
    * winnowing's window scheme makes. The price is FastCDC's min-size
    * suppression (eligibility would depend on the previous boundary — a
    * sequential dependency); adjacent boundaries simply yield short
    * chunks, harmless to dedup semantics. O(n·window) map-side work per
    * document, no shuffle, no UDF.
    *
    * @return one row per chunk: (id, chunk_id, start_char 0-based,
    *         n_chars, chunk_text); chunks concatenate back to the exact
    *         source text. Null/empty documents contribute no rows.
    */
  def cdcChunks(df: DataFrame, idCol: String, textCol: String,
                window: Int = 8, divisor: Long = 32L): DataFrame = {
    require(window >= 1, s"window=$window must be positive")
    require(divisor >= 2, s"divisor=$divisor must be at least 2")
    val pows = Iterator.iterate(1L)(p => p * 33 % 2147483648L)
      .take(window).toSeq
    val terms = (0 until window).map(j =>
      s"element_at(__gv, CAST(i - $j AS INT)) * ${pows(j)}L" +
        s" % 2147483648L").mkString(" + ")
    // fanOut: the rolling-hash boundary scan below is the op's whole cost
    // and runs in the SCAN stage — on a single-row-group fixture that is
    // one task however many cores the session has (no-op at scale / on
    // derived inputs; see ScaleOps.fanOut)
    ScaleOps.fanOut(df, col(idCol))
      .where(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol), col(textCol).as("__t"),
        length(col(textCol)).cast("long").as("__n"))
      // the per-char byte mix is precomputed ONCE per row into an array
      // (element_at is O(1)); a per-position substr would re-walk the
      // UTF8String from its head every call — O(n²·window) per document,
      // measured 26 s vs ~2 s over the sf0.1 corpus. A possible trailing
      // empty string from split contributes an out-of-range element the
      // window indices never touch.
      .withColumn("__gv", expr(
        "transform(split(__t, '')," +
          " c -> (ascii(c) * 2654435761L) % 2147483648L)"))
      .withColumn("__bnd", expr(
        s"""CASE WHEN __n < $window THEN CAST(array() AS ARRAY<BIGINT>)
           |ELSE filter(sequence(CAST($window AS BIGINT), __n),
           |  i -> ($terms) % $divisor = 0) END""".stripMargin))
      // interior boundaries only (a boundary AT the end would duplicate
      // the appended n into a zero-length chunk)
      .withColumn("__bs", expr(
        "concat(array(CAST(0 AS BIGINT)), filter(__bnd, i -> i < __n)," +
          " array(__n))"))
      .withColumn("__k", explode(expr("sequence(1, size(__bs) - 1)")))
      .select(col(idCol),
        (col("__k") - 1).cast("long").as("chunk_id"),
        expr("element_at(__bs, __k)").as("start_char"),
        expr("element_at(__bs, __k + 1) - element_at(__bs, __k)")
          .as("n_chars"),
        expr("substr(__t, CAST(element_at(__bs, __k) + 1 AS INT)," +
          " CAST(element_at(__bs, __k + 1) - element_at(__bs, __k)" +
          " AS INT))").as("chunk_text"))
  }

  /** Distinct CDC chunk digests per document as (id, fp_hash) — the
    * fingerprint frame the chunk-level pair / incremental / streaming
    * tier rides. The winnowing state machinery
    * ([[incrementalWinnowPairsOnState]]) is fingerprint-agnostic, so the
    * CDC modality reuses it verbatim: only the fingerprint SELECTION
    * differs (content-defined chunk content vs windowed-min gram
    * hashes). Chunk text reduces to md5 in the scan projection — only
    * digests ever cross an exchange.
    */
  def cdcFingerprints(df: DataFrame, idCol: String, textCol: String,
                      window: Int = 8, divisor: Long = 32L): DataFrame =
    cdcChunks(df, idCol, textCol, window, divisor)
      .select(col(idCol).as("id"),
        md5(col("chunk_text").cast("binary")).as("fp_hash"))
      .distinct()

  /** Document pairs sharing CDC chunks — the MOSS match report at chunk
    * granularity ([[winnowPairs]]' cut/join discipline over
    * [[cdcChunks]] digests): candidates meet on the chunk digest (an
    * equi-join, never all-pairs), chunks present in more than
    * `maxDocFreq` documents are dropped first (boilerplate carries no
    * discriminating signal AND is the hot-key hazard), and a pair
    * survives with the count of DISTINCT shared chunk digests ≥
    * `minShared`. Because the chunking is shift-resistant, a shared run
    * keeps producing shared digests after an edit moves it — the
    * cross-document property fixed-offset chunk dedup cannot give.
    */
  def cdcChunkPairs(df: DataFrame, idCol: String, textCol: String,
                    minShared: Long = 2L,
                    maxDocFreq: Long = 50L): DataFrame = {
    require(minShared >= 1, s"minShared=$minShared must be positive")
    require(maxDocFreq >= 2, s"maxDocFreq=$maxDocFreq must allow a pair")
    // one distinct (id, hash) frame feeds the df cut AND both self-join
    // sides (rule (g))
    val fp = cdcFingerprints(df, idCol, textCol).localCheckpoint(true)
    val rare = fp.groupBy(col("fp_hash"))
      .agg(countDistinct(col("id")).as("__df"))
      .where(col("__df") <= maxDocFreq)
      .select(col("fp_hash"))
    val kept = fp.join(rare, Seq("fp_hash"))
    kept.as("a").join(kept.as("b"),
        col("a.fp_hash") === col("b.fp_hash")
          && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared_fp"))
      .where(col("shared_fp") >= minShared)
  }

  /** Distinct word n-grams per document as (id, gram) rows. The per-doc
    * dedup happens BEFORE the generator (`array_distinct` on the in-plan
    * gram array), so no shuffle is spent de-duplicating within documents —
    * the exploded output is already (id, gram)-unique. Documents shorter
    * than `n` tokens contribute no grams. Whitespace joins only, so any
    * engine rebuilds the gram strings byte-for-byte.
    */
  def ngramSet(df: DataFrame, idCol: String, textCol: String,
               n: Int): DataFrame = {
    require(n >= 1, s"n=$n must be positive")
    // fanOut: tokenize + gram explode run in the scan stage (see
    // ScaleOps.fanOut — no-op at scale / on derived inputs)
    ScaleOps.fanOut(df, col(idCol))
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__k", size(col("__toks")) - (n - 1))
      // guard BEFORE sequence(1, __k): for a too-short doc __k <= 0 and
      // sequence would count DOWN (step -1), fabricating out-of-range grams
      .where(col("__k") >= 1)
      .select(col(idCol), explode(array_distinct(expr(
        s"transform(sequence(1, __k), i -> array_join(slice(__toks, i, $n), ' '))")))
        .as("gram"))
  }

  /** Benchmark decontamination — the train/eval n-gram overlap check every
    * serious LLM data pipeline runs before training (the GPT-3/PaLM-style
    * 8-13-gram collision test): flag each training document that shares at
    * least one word n-gram with any document of the held-out set, with the
    * count of distinct shared grams as evidence.
    *
    * Scale shape: both sides reduce to (id, gram) rows with per-doc-unique
    * grams ([[ngramSet]] — no dedup shuffle), the eval side collapses to a
    * distinct gram set (map-side partial), and contamination is one
    * equi-join on the gram — a semi join, so no row explosion when a gram
    * recurs across eval docs — followed by one count per train doc. Every
    * stage is a narrow hash-partitioned exchange on (gram) or (id); at
    * 100 TB the eval side (benchmarks: thousands of docs) broadcasts and
    * the train side never shuffles at all. Grams travel as strings for
    * engine parity; a production variant can key the join on xxhash64 of
    * the gram to narrow the exchange further.
    *
    * @return one row per `train` document: (id, n_shared_ngrams,
    *         contaminated) — zero/false when clean.
    */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int): DataFrame = {
    val trainGrams = ngramSet(train, idCol, textCol, n)
    val evalGrams = ngramSet(eval, idCol, textCol, n)
      .select(col("gram")).distinct()
    val hits = trainGrams.join(evalGrams, Seq("gram"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n_shared"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n_shared"), lit(0L)).as("n_shared_ngrams"))
      .withColumn("contaminated", col("n_shared_ngrams") > 0)
  }

  /** Stratified deterministic quota sample: the first `quota` rows per
    * stratum in content-address order (`md5(key)`, key-tie-broken) — the
    * balanced-sampling companion of [[deterministicSample]]. Ordering by
    * the hash instead of the key makes the pick pseudo-random but
    * reproducible across runs, engines, and partition layouts; a stratum
    * with fewer than `quota` rows is kept whole.
    *
    * Plan shape: one exchange on the stratum + per-partition sort;
    * Spark's WindowGroupLimit pushes the rank filter below the exchange,
    * so each map task forwards at most `quota` rows per stratum rather
    * than the whole table through the shuffle.
    *
    * Output contract: the input columns PLUS `rn`, the row's 1-based
    * deterministic rank within its stratum — deliberately part of the
    * result (callers sub-sample further with `rn <= m` or audit pick
    * order), not an internal helper.
    */
  def stratifiedQuota(df: DataFrame, strataCol: String, keyCol: String,
                      quota: Int): DataFrame = {
    require(quota >= 1, s"quota=$quota must be positive")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= quota)
  }

  /** [[stratifiedQuota]] through the prefix-sum path — for FEW strata
    * over a huge corpus (the cluster-balanced-sample shape: k clusters
    * over every embedding), where the window spelling funnels the whole
    * corpus into at most |strata| sort partitions. Same pick order,
    * same output contract (input columns + `rn`), same kept set: the
    * rank is [[graft.ops.ScaleOps.globalRunningTotal]]'s two-pass
    * range-partition prefix sum ordered (stratum, md5(key), key) minus
    * broadcast per-stratum offsets — the [[mixtureInterleave]]
    * discipline; the only window left runs over the |strata|-row offset
    * frame.
    */
  def stratifiedQuotaPrefix(df: DataFrame, strataCol: String,
                            keyCol: String, quota: Int): DataFrame = {
    require(quota >= 1, s"quota=$quota must be positive")
    val base = df.withColumn("__h", md5(col(keyCol).cast("string")))
    val ranked = graft.ops.ScaleOps.globalRunningTotal(base,
      Seq(col(strataCol), col("__h"), col(keyCol)), lit(1L))
    val offs = ranked.groupBy(col(strataCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__soff", coalesce(sum(col("__n")).over(
        Window.orderBy(col(strataCol)).rowsBetween(Long.MinValue, -1)),
        lit(0L)))
      .select(col(strataCol), col("__soff"))
    ranked.join(broadcast(offs), Seq(strataCol))
      .withColumn("rn", col("cum") - col("__soff"))
      .where(col("rn") <= quota)
      .drop("__h", "cum", "__soff")
  }

  /** Target-weighted mixture waterfilling: given desired per-source mixing
    * weights and each source's AVAILABLE tokens, allocate a global token
    * budget so every source gets `weight`-proportional share capped at its
    * availability, with the shortfall of saturated (availability-bound)
    * sources redistributed proportionally over the rest — the allocation
    * a pretraining mixture planner actually needs when the recipe's
    * weights exceed what some sources hold ([[sourceBudgetCap]] applies a
    * FIXED cap; this op derives the caps from the recipe).
    *
    * Entirely integer and deterministic, so the whole solve hash-grades
    * against a DuckDB replay:
    *  - budget `B = (Σ avail · budgetShareMicro) div 10⁶`;
    *  - sources saturate in increasing `avail/weight` (water-level) order;
    *    the per-row saturation predicate is the exact cross-multiplied
    *    comparison `avail · remainingW ≤ (B − prefixAvail) · weight` over
    *    prefix sums in that order (longs only — sound while
    *    `avail · Σweights` fits 63 bits, i.e. any realistic corpus with
    *    small integer recipe weights);
    *  - unsaturated sources get `floor((B − C_sat) · w / W_unsat)` plus a
    *    largest-remainder +1 (ties to the smaller source name) so the
    *    allocations sum to B EXACTLY (when Σ avail ≥ B; a budget above
    *    total availability saturates everything and allocates all of it).
    *
    * Scale shape: the only fact-scale stage is the per-source token
    * aggregation; every window below it runs UNPARTITIONED over the
    * source-cardinality frame — bounded by the recipe's source list, the
    * same justification as the shard-manifest's partition-id window. The
    * aggregated frame is localCheckpointed once: four consumers
    * (saturation scan, scalar rollups, both output branches) must read
    * ONE copy, not re-run the corpus aggregation each.
    *
    * @param weight per-source integer weight; must be a deterministic
    *               function of the source column (it aggregates by `max`)
    * @return (source, weight, avail, alloc, saturated) — one row per source
    */
  def waterfillAllocation(df: DataFrame, sourceCol: String, tokens: Column,
                          weight: Column,
                          budgetShareMicro: Long): DataFrame = {
    require(budgetShareMicro > 0,
      s"budgetShareMicro=$budgetShareMicro must be positive")
    // Loud precondition on the aggregated weights (r8 ADVICE): weight=0
    // yields an Infinity water-level sort key and a silent zero
    // allocation, and avail=0 with weight=0 yields a NaN key whose sort
    // position differs across engines — either way the hash-grade
    // contract breaks QUIETLY. Fail like the op's other preconditions
    // instead (fires at the eager localCheckpoint below).
    val per = df.groupBy(col(sourceCol).as("source"))
      .agg(max(weight.cast("long")).as("weight"),
        sum(tokens.cast("long")).as("avail"))
      .withColumn("weight", when(col("weight").isNull || col("weight") <= 0L,
        raise_error(
        format_string("graft.CorpusOps.waterfillAllocation: source %s has" +
          " non-positive weight %d — weights must be > 0",
          col("source").cast("string"), col("weight"))).cast("long"))
        .otherwise(col("weight")))
    val tot = per.agg(sum("weight").as("__tw"), sum("avail").as("__tc"))
      .select(col("__tw"), col("__tc"),
        expr(s"(__tc * ${budgetShareMicro}L) div 1000000L").as("__b"))
    // water-level order: avail/weight ascending. The double ratio is only
    // the SORT key (IEEE division is engine-deterministic); every decision
    // below it is exact integer arithmetic, and the source tiebreak makes
    // the order total even where ratios collide.
    val ord = Window
      .orderBy((col("avail").cast("double") / col("weight")).asc,
        col("source").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val st = per.crossJoin(broadcast(tot))
      .withColumn("__pref_c", sum("avail").over(ord))
      .withColumn("__pref_w", sum("weight").over(ord))
      .withColumn("__sat",
        col("avail") * (col("__tw") - col("__pref_w"))
          <= (col("__b") - col("__pref_c")) * col("weight"))
      .localCheckpoint(true)
    val ms = st.agg(
      coalesce(max(when(col("__sat"), col("__pref_c"))), lit(0L)).as("__c_m"),
      coalesce(max(when(col("__sat"), col("__pref_w"))), lit(0L)).as("__w_sat"))
    val un = st.where(!col("__sat")).crossJoin(broadcast(ms))
      // guarded denominator: only ever 0 when the unsaturated set is
      // empty, i.e. when no row reaches this projection
      .withColumn("__den",
        when(col("__tw") === col("__w_sat"), lit(1L))
          .otherwise(col("__tw") - col("__w_sat")))
      .withColumn("__q", expr("((__b - __c_m) * weight) div __den"))
      .withColumn("__rem", expr("((__b - __c_m) * weight) % __den"))
    val rsum = un.agg(
      coalesce(sum("__q"), lit(0L)).as("__q_sum"),
      coalesce(max(col("__b") - col("__c_m")), lit(0L)).as("__pool"))
    val rw = Window.orderBy(col("__rem").desc, col("source").asc)
    val unAlloc = un.crossJoin(broadcast(rsum))
      .withColumn("__rn", row_number().over(rw))
      .select(col("source"), col("weight"), col("avail"),
        (col("__q") + when(col("__rn") <= col("__pool") - col("__q_sum"),
          lit(1L)).otherwise(lit(0L))).as("alloc"),
        lit(false).as("saturated"))
    val satAlloc = st.where(col("__sat"))
      .select(col("source"), col("weight"), col("avail"),
        col("avail").as("alloc"), lit(true).as("saturated"))
    unAlloc.unionAll(satAlloc)
  }

  /** Temperature-scaled mixture allocation (the multilingual-sampling
    * standard: target share ∝ p_i^(1/T), T > 1 upsampling low-resource
    * sources — mT5/XLM-R's recipe) with EXACT integer apportionment:
    * weights w_i = c_i^(1/T) in micro-units, base_i = ⌊budget·w_i / W⌋,
    * and the leftover seats go to the largest remainders (Hamilton's
    * method; ties totalize by source), so Σ alloc == budget EXACTLY —
    * a float-share rounding would drift off the budget by ±|sources|.
    *
    * Determinism — why T is restricted to {1, 2, 4}: those exponents
    * evaluate through IEEE sqrt alone (c, √c, √√c), and sqrt is
    * CORRECTLY ROUNDED by the IEEE 754 standard in both engines —
    * an arbitrary pow(c, 1/T) goes through libm pow, which is not, and
    * a one-ulp disagreement would flip a floored micro weight and fail
    * the hash grade. The standard smoothing range (T ∈ [1, 4]) is
    * covered; intermediate temperatures need a pre-scaled weight column
    * and [[waterfillAllocation]].
    *
    * Scale shape: ONE fact-scale hash aggregate to the per-source count
    * table; weights, apportionment, and the remainder rank all run on
    * that bounded table (the rank window orders |sources| rows).
    * Envelope (loud under ANSI): budget·w_max < 2^63 → budget·√c_max
    * below ~9.2×10¹² micro — shard the budget past that.
    *
    * @param budget total documents to allocate across sources
    * @param temperature T ∈ {1, 2, 4} (loud require)
    * @return per source: (source, n_docs, weight_micro, alloc,
    *         share 4-dp of budget)
    */
  def temperatureAllocation(df: DataFrame, sourceCol: String, budget: Long,
                            temperature: Int = 2): DataFrame = {
    import CoreOps.rnd
    require(budget > 0, s"budget=$budget must be positive")
    require(Set(1, 2, 4).contains(temperature),
      s"temperature=$temperature must be 1, 2, or 4 — only sqrt-chain" +
        " exponents are IEEE-exact across engines (see scaladoc)")
    val per = df.where(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
    val w = temperature match {
      case 1 => col("n_docs") * lit(1000000L)
      case 2 => floor(sqrt(col("n_docs").cast("double")) * 1e6 + 0.5)
        .cast("long")
      case 4 => floor(sqrt(sqrt(col("n_docs").cast("double"))) * 1e6 + 0.5)
        .cast("long")
    }
    val weighted = per.withColumn("weight_micro", w)
    val tot = weighted.agg(sum(col("weight_micro")).as("__tw"))
    val based = weighted.crossJoin(broadcast(tot))
      .withColumn("__base",
        expr(s"(${budget}L * weight_micro) div __tw"))
      .withColumn("__rem",
        expr(s"(${budget}L * weight_micro) % __tw"))
    val pool = based.agg(
      (lit(budget) - coalesce(sum(col("__base")), lit(0L))).as("__left"))
    val rw = Window.orderBy(col("__rem").desc, col("source").asc)
    based.crossJoin(broadcast(pool))
      .withColumn("__rn", row_number().over(rw))
      .select(col("source"), col("n_docs"), col("weight_micro"),
        (col("__base") + when(col("__rn") <= col("__left"), lit(1L))
          .otherwise(lit(0L))).as("alloc"))
      .withColumn("share",
        rnd(col("alloc").cast("double") / budget.toDouble))
  }

  /** Per-source token-budget cap: walk each source's documents in the same
    * content-address order as [[stratifiedQuota]] (md5(key), key) and keep
    * the longest prefix whose cumulative token count fits `budget` — the
    * per-source mixing cap a pretraining recipe applies when a source's
    * contribution is bounded in TOKENS, not documents (a 10-doc cap means
    * nothing when one doc is a book).
    *
    * Prefix-cut semantics: the running total includes every prior doc in
    * pick order, so `cum_tokens <= budget` cuts a clean prefix (token
    * counts are non-negative, the cumsum is monotone — no later smaller
    * doc can sneak back in past an overflowing one). That makes the
    * result independent of partition layout and cheap to audit:
    * `cum_tokens` ships in the output.
    *
    * Scale shape: one exchange on the source key + one sort per source —
    * the same single-window plan as [[stratifiedQuota]], carrying
    * (id, source, n_tokens) rows, never document text.
    */
  def sourceBudgetCap(df: DataFrame, sourceCol: String, keyCol: String,
                      tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget=$budget must be positive")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokens)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= budget)
  }

  /** Corpus mixture report: documents and tokens per stratum combination
    * (e.g. language × split) with each stratum's share of total tokens —
    * the table a data-mixture weighting decision reads. One hash
    * aggregation over the corpus; the corpus-total denominator re-aggregates
    * the ALREADY-AGGREGATED frame (stratum-cardinality rows, not corpus
    * rows) and joins back as a broadcast 1-row frame — same shape as
    * [[tfIdf]]'s N, and no single-partition window stage.
    */
  def mixtureStats(df: DataFrame, strataCols: Seq[String],
                   tokens: Column): DataFrame = {
    import CoreOps.rnd
    require(strataCols.nonEmpty, "mixtureStats needs at least one stratum")
    val per = df.groupBy(strataCols.map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(tokens.cast("long")).as("n_tokens"))
    val total = per.agg(sum("n_tokens").as("__total"))
    per.crossJoin(broadcast(total))
      // zero-token corpus: an undefined share must read NULL, not throw —
      // ANSI-mode double division by zero kills the job
      .withColumn("token_share",
        when(col("__total") === 0, lit(null).cast("double"))
          .otherwise(rnd(col("n_tokens").cast("double") / col("__total"))))
      .drop("__total")
  }

  /** TF-IDF over whitespace tokens: tf = raw occurrences of the term in
    * the doc, idf = ln(N / df_t) (no smoothing — every term trivially has
    * df ≥ 1). Two hash aggregations; the corpus-size scalar joins in as a
    * broadcast 1-row frame, so the fact-scale data shuffles exactly twice
    * (by (doc, term) then by term).
    */
  def tfIdf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import CoreOps.rnd
    val toks = df.select(col(idCol).as("id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"), col("tf"),
        rnd(col("tf") * log(col("n_docs").cast("double") / col("df_t")))
          .as("tf_idf"))
  }

  /** Top-k highest-scoring terms per document, ties broken by term so the
    * output is engine-stable.
    */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    val scored = tfIdf(df, idCol, textCol)
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("id").orderBy(col("tf_idf").desc, col("term"))))
      .where(col("rnk") <= k)
      .select(col("id"), col("term"), col("tf"), col("tf_idf"),
        col("rnk").cast("long").as("rnk"))
  }

  /** Word n-gram span stream WITH multiplicity — every span occurrence as
    * an (id, gram) row, in contrast to [[ngramSet]]'s per-doc-distinct set.
    * [[duplicatedSpans]] needs occurrence counts, so the per-doc dedup that
    * makes decontamination cheap would be wrong here.
    */
  private def spanStream(df: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame = {
    require(n >= 1, s"n=$n must be positive")
    ScaleOps.fanOut(df, col(idCol))
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__k", size(col("__toks")) - (n - 1))
      .where(col("__k") >= 1)
      .select(col(idCol), explode(expr(
        s"transform(sequence(1, __k), i -> array_join(slice(__toks, i, $n), ' '))"))
        .as("gram"))
  }

  /** Quality-score drift monitor — the TEXT-feature analog of
    * [[graft.ops.EmbeddingOps.embeddingDriftPsi]]: Population Stability
    * Index per stratum between two corpus snapshots, over the heuristic
    * quality score ([[TextFunctions.withQualityColumns]]) binned into 20
    * fixed-width cells. The ingest-gate dashboard row that catches "this
    * crawl snapshot changed character" from the cheap text features,
    * before any embedding or model does.
    *
    * Determinism: the 4-dp score is re-quantized to q·10⁴ BEFORE
    * binning, so the bin edge is integer arithmetic (`q10k·20 div 10⁴`,
    * capped at 19) — never a float multiply two engines must round
    * identically at a boundary. PSI terms are Laplace-smoothed and
    * micro-quantized before the per-stratum integer sum (the
    * [[graft.ops.EmbeddingOps.embeddingDriftPsi]] discipline).
    *
    * Scale shape: one fact-scale hash aggregate per side onto the
    * (stratum, 20-bin) histogram — everything downstream is
    * histogram-bounded; the joined histogram materializes once (rule
    * (g): it feeds the totals and the term join).
    *
    * @return per stratum: (strataCol, n_bins — realized, n_a, n_b,
    *         psi 4-dp); PSI < 0.1 is the conventional "stable" band
    */
  def qualityDriftPsi(a: DataFrame, b: DataFrame, textCol: String,
                      strataCol: String): DataFrame = {
    import CoreOps.rnd
    def hist(df: DataFrame, cnt: String): DataFrame =
      TextFunctions
        .withQualityColumns(df.where(col(strataCol).isNotNull), textCol)
        .select(col(strataCol).as("__s"),
          least(CoreOps.integralDiv(
            floor(col("quality") * 10000 + 0.5).cast("long") * 20, 10000L),
            lit(19L)).as("bin"))
        .groupBy(col("__s"), col("bin")).agg(count(lit(1)).as(cnt))
    val joined = hist(a, "__ca")
      .join(hist(b, "__cb"), Seq("__s", "bin"), "full_outer")
      .select(col("__s"), col("bin"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
      .localCheckpoint(true)
    val tot = joined.groupBy(col("__s"))
      .agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"),
        count(lit(1)).as("n_bins"))
    val qa = (col("__ca") + 1).cast("double") /
      (col("__na") + col("n_bins")).cast("double")
    val qb = (col("__cb") + 1).cast("double") /
      (col("__nb") + col("n_bins")).cast("double")
    joined.join(tot, Seq("__s"))
      .withColumn("__t",
        floor((qa - qb) * log(qa / qb) * 1000000 + 0.5).cast("long"))
      .groupBy(col("__s"))
      .agg(min(col("n_bins")).as("n_bins"), min(col("__na")).as("n_a"),
        min(col("__nb")).as("n_b"),
        rnd(sum(col("__t")).cast("double") / 1000000.0).as("psi"))
      .select(col("__s").as(strataCol), col("n_bins"), col("n_a"),
        col("n_b"), col("psi"))
  }

  /** Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD'03 —
    * the MOSS algorithm): per document, the word-k-gram hash stream is
    * scanned with a window of `w` consecutive hashes and each window
    * contributes its MINIMUM hash, ties to the RIGHTMOST position (the
    * paper's robust-winnowing rule); the distinct selected (hash, pos)
    * set is the document's fingerprint sketch, density ~2/(w+1).
    * Guarantee: any shared run of at least w + k − 1 words is caught by
    * at least one shared fingerprint — a POSITIONAL robustness property
    * the whole-document sketches (MinHash set resemblance, SimHash bit
    * fold) don't give, which is why plagiarism/boilerplate detectors
    * winnow instead of minhashing.
    *
    * Engine-replayable: the gram hash is md5 hex, and the tie rule is
    * encoded IN the min key — `hash ∥ lpad(10¹² − pos)` — so ONE plain
    * `min()` realizes "smallest hash, rightmost position" identically
    * on any engine (no arg_min/ties-unspecified constructs). Documents
    * with fewer than w grams winnow as a single window (their global
    * min), the standard short-document convention.
    *
    * Scale shape: grams digest in the scan projection (gram text never
    * crosses an exchange); the window scan partitions by DOCUMENT — a
    * bounded frame, one document's hash stream, never the corpus — and
    * the output is the sparse fingerprint set.
    *
    * @return distinct (idCol, fp_hash — 32-char md5 hex, fp_pos —
    *         1-based gram start of the selected occurrence)
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    require(w >= 1, s"w=$w must be positive")
    val grams = ScaleOps.fanOut(df, col(idCol))
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__k", (size(col("__toks")) - (k - 1)).cast("long"))
      .where(col("__k") >= 1)
      .select(col(idCol), col("__k"), posexplode(expr(
        s"transform(sequence(1, __k), i -> array_join(slice(__toks, i, $k), ' '))"))
        .as(Seq("__p0", "__g")))
      .select(col(idCol), col("__k"),
        (col("__p0") + 1).cast("long").as("pos"),
        md5(col("__g").cast("binary")).as("__h"))
    val key = concat(col("__h"),
      lpad((lit(1000000000000L) - col("pos")).cast("string"), 13, "0"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos")).rowsBetween(0, w - 1)
    grams
      .withColumn("__sel", min(key).over(win))
      // window STARTS only: positions past __k − (w − 1) see truncated
      // suffix windows whose minima the algorithm never selects (the
      // greatest(…, 1) keeps the single whole-document window of a
      // shorter-than-w doc)
      .where(col("pos") <= greatest(col("__k") - (w - 1), lit(1L)))
      .select(col(idCol),
        substring(col("__sel"), 1, 32).as("fp_hash"),
        (lit(1000000000000L) - substring(col("__sel"), 33, 13).cast("long"))
          .as("fp_pos"))
      .distinct()
  }

  /** Document pairs sharing winnowing fingerprints — the MOSS match
    * report: candidates meet on the fingerprint hash (an equi-join on
    * the digest, the LSH-bucket shape — never all-pairs), ubiquitous
    * fingerprints are dropped first (a hash present in more than
    * `maxDocFreq` documents is boilerplate by definition and would both
    * explode the self-join and carry no discriminating signal — the
    * MOSS "ignore over-common fingerprints" rule and this repo's
    * hot-key discipline in one), and a pair survives with the count of
    * DISTINCT shared fingerprint hashes ≥ `minShared`.
    */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
                  k: Int = 3, w: Int = 4, minShared: Long = 2L,
                  maxDocFreq: Long = 50L): DataFrame = {
    require(minShared >= 1, s"minShared=$minShared must be positive")
    require(maxDocFreq >= 2, s"maxDocFreq=$maxDocFreq must allow a pair")
    val fp = winnowFingerprints(df, idCol, textCol, k, w)
      .select(col(idCol).as("id"), col("fp_hash"))
      // distinct (id, hash): a hash selected at several positions of one
      // document is one vote, and the self-join must not multiply pairs
      .distinct()
      .localCheckpoint(true)
    val rare = fp.groupBy(col("fp_hash"))
      .agg(countDistinct(col("id")).as("__df"))
      .where(col("__df") <= maxDocFreq)
      .select(col("fp_hash"))
    val kept = fp.join(rare, Seq("fp_hash"))
    kept.as("a").join(kept.as("b"),
        col("a.fp_hash") === col("b.fp_hash")
          && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared_fp"))
      .where(col("shared_fp") >= minShared)
  }

  /** The winnowing tier's persisted-state probe — the fifth dedup
    * modality joins the incremental family: a new batch's fingerprints
    * probe the PERSISTED fingerprint manifest (bucketed on the hash for
    * the exchange-free read) instead of re-winnowing the existing
    * corpus, known pairs are read back (plain storage, only unioned),
    * and the union of known + batch-internal + cross pairs equals a
    * full run over the whole corpus.
    *
    * Semantics note (deliberate, documented): the over-common-hash cut
    * is a FROZEN blocklist computed when the state was built — the
    * production MOSS posture (the ignore-list is derived from the
    * reference corpus and applied to submissions), and the choice that
    * makes incremental == full an exact identity. [[winnowPairs]]'
    * snapshot-global `maxDocFreq` re-derives the cut per run, so a
    * growing corpus could RETIRE a hash — an anti-monotone edit no
    * append-only layout can reproduce.
    *
    * @param batchFp    [[winnowFingerprints]] of the new batch,
    *                   projected to (id, fp_hash)
    * @param manifest   persisted (id, fp_hash) rows of the existing
    *                   corpus, blocklist-free by construction
    * @param blocklist  (fp_hash) rows frozen at state build
    * @param knownPairs (id_a, id_b, shared_fp) read back from the
    *                   prior run
    */
  def incrementalWinnowPairsOnState(batchFp: DataFrame, manifest: DataFrame,
                                    blocklist: DataFrame,
                                    knownPairs: DataFrame,
                                    minShared: Long = 2L): DataFrame = {
    require(minShared >= 1, s"minShared=$minShared must be positive")
    // one distinct (id, hash) frame feeds BOTH the cross probe and the
    // internal self-join (rule (g))
    val kept = batchFp.select(col("id"), col("fp_hash")).distinct()
      .join(blocklist, Seq("fp_hash"), "left_anti")
      .localCheckpoint(true)
    val cross = kept.as("a").join(manifest.as("b"),
        col("a.fp_hash") === col("b.fp_hash"))
      .groupBy(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"))
      .agg(count(lit(1)).as("shared_fp"))
      .where(col("shared_fp") >= minShared)
    val internal = kept.as("a").join(kept.as("b"),
        col("a.fp_hash") === col("b.fp_hash") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared_fp"))
      .where(col("shared_fp") >= minShared)
    knownPairs.select(col("id_a"), col("id_b"), col("shared_fp"))
      .unionByName(internal).unionByName(cross)
  }

  /** Deterministic in-batch-negatives layout — the dataloader shape
    * contrastive retrieval/CLIP-style training actually consumes: the
    * training pairs are dealt into fixed-size batches in
    * content-addressed order (md5(id), id — the [[epochShuffle]] key),
    * so within a batch every example's B−1 neighbors are its in-batch
    * negatives, and the whole layout is a pure function of the corpus:
    * reproducible across runs, engines, and partition layouts, and
    * auditable (a given doc's batch assignment is recomputable).
    *
    * Scale shape: ONE [[graft.ops.ScaleOps.globalRunningTotal]]
    * prefix-sum pass — never a corpus-wide row_number window; batch and
    * slot are integer arithmetic off the rank. The tail batch may be
    * short (its examples simply have fewer negatives), the standard
    * drop-last-or-pad decision left to the caller.
    *
    * @return input columns + (batch_id 0.., slot 0..batchSize−1)
    */
  def contrastiveBatches(pairs: DataFrame, idCol: String,
                         batchSize: Int): DataFrame = {
    require(batchSize >= 2,
      s"batchSize=$batchSize needs at least one in-batch negative")
    val base = pairs.withColumn("__h", md5(col(idCol).cast("string")))
    graft.ops.ScaleOps.globalRunningTotal(base,
      Seq(col("__h"), col(idCol)), lit(1L))
      .withColumn("batch_id",
        CoreOps.integralDiv(col("cum") - 1, batchSize.toLong))
      .withColumn("slot", (col("cum") - 1) % batchSize)
      .drop("__h", "cum")
  }

  /** Cross-document repeated-span profile — the exact-substring-duplication
    * signal of "Deduplicating Training Data Makes Language Models Better"
    * (Lee et al. 2022), at word-n-gram granularity: for each document, how
    * many of its `n`-token spans also occur elsewhere in the corpus (any
    * other document, or again in the same one). `dup_frac` near 1.0 marks
    * boilerplate/mirror content an exact doc-level dedup cannot see because
    * the surrounding bytes differ.
    *
    * Scale shape: span occurrences collapse to (id, digest, count) rows in
    * the first hash aggregation (map-side partials; the md5 digest — never
    * span text — is what exchanges), and the corpus total per digest is a
    * second HASH AGGREGATE joined back on the digest — never a window over
    * the incidence rows: a window puts every row of a hot gram into ONE
    * partition and ONE sort, so a corpus-wide boilerplate span (license
    * header, template sentence — the exact content this signal exists to
    * flag) becomes a straggler task at 100×, while the two-phase aggregate
    * reduces it map-side and the skewed join back is AQE-splittable. The
    * incidence frame feeds both the totals aggregate and the join back, so
    * it materializes once (localCheckpoint — exchange reuse does not
    * bridge an aggregation, and a re-derivation would evaluate the span
    * generator once per branch). Documents too short to have spans
    * re-enter via a left join with an explicit NULL `dup_frac` (0/0 is
    * undefined, not 0 — and ANSI double division by zero would kill the
    * job).
    *
    * @return one row per input document:
    *         (id, n_spans, n_dup_spans, dup_frac 4-dp | NULL).
    */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame = {
    import CoreOps.rnd
    val perDoc = spanStream(df, idCol, textCol, n)
      .groupBy(col(idCol), md5(col("gram").cast("binary")).as("__gh"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val totals = perDoc.groupBy(col("__gh")).agg(sum(col("__c")).as("__tot"))
    val agg = perDoc
      .join(totals, Seq("__gh"))
      .groupBy(col(idCol))
      .agg(sum("__c").as("__n_spans"),
        sum(when(col("__tot") > 1, col("__c")).otherwise(0L)).as("__n_dup"))
    df.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("__n_dup"), lit(0L)).as("n_dup_spans"))
      .withColumn("dup_frac",
        when(col("n_spans") === 0, lit(null).cast("double"))
          .otherwise(rnd(col("n_dup_spans").cast("double") / col("n_spans"))))
  }

  /** Exact-substring dedup EXCISION — the removal half of Lee et al.
    * 2022 that [[duplicatedSpans]] only detects: every word n-gram span
    * that occurs more than once in the corpus keeps its FIRST
    * occurrence (global (doc, position) order — deterministic, no tie
    * to break) and every later occurrence marks its token range for
    * removal; a token is excised when ANY marked range covers it, so
    * overlapping duplicated spans merge naturally at position level,
    * and documents reassemble from the surviving tokens. This is the
    * sliding-window dedup a fixed-chunk pass ([[dropDuplicateChunks]])
    * cannot do: a duplicate at any offset is caught, not just at chunk
    * boundaries.
    *
    * Scale shape: span DIGESTS (never span text) cross the one
    * fact×position exchange; the first-occurrence pick is a two-phase
    * hash aggregate — `min(struct(id, pos))` + `count(*)` per digest,
    * map-side partials, skew-immune — joined back on the digest, NEVER
    * a window over raw occurrence rows: a window would put every
    * occurrence of a corpus-wide boilerplate span (the exact content
    * this operator exists to excise) into ONE partition and ONE sort —
    * a straggler task at 100× — while the join back on a hot digest is
    * AQE-splittable. The duplicated-digest side of that join carries
    * only digests with count > 1, bounded by the duplication mass. The
    * occurrence frame feeds both the aggregate and the join back, so it
    * materializes once (localCheckpoint of compact (id, pos, digest)
    * rows — a re-derivation would tokenize and explode the corpus once
    * per branch). The drop-set explode is bounded by the DUPLICATION
    * MASS (excised occurrences × n), not the corpus; reassembly buffers
    * one document's tokens per group (the [[dropDuplicateChunks]]
    * contract). Greedy position-union is the standard approximation —
    * residual duplication created by excision itself is not re-chased.
    *
    * @return per document: (id, n_tokens, n_kept, text_dedup — ""
    *         when everything was excised)
    */
  def exactSubstrDedup(df: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame = {
    require(n >= 1, s"n=$n must be positive")
    val toks = ScaleOps.fanOut(df, col(idCol)).select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    val occ = toks
      .withColumn("__k", size(col("__toks")) - (n - 1))
      .where(col("__k") >= 1)
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(1, __k), i -> " +
          s"md5(cast(array_join(slice(__toks, i, $n), ' ') as binary)))"))
        .as(Seq("__i0", "__gh")))
      .select(col(idCol), (col("__i0") + 1).cast("long").as("pos"),
        col("__gh"))
      .localCheckpoint(true)
    // struct ordering is lexicographic by field position, so
    // min(struct(id, pos)) IS the global first occurrence — the same
    // total order the excision rule demands, computed as a partial-merge
    // hash aggregate instead of a per-digest sort
    val firsts = occ
      .groupBy(col("__gh"))
      .agg(min(struct(col(idCol), col("pos"))).as("__first"),
        count(lit(1)).as("__tot"))
      .where(col("__tot") > 1)
    val excised = occ
      .join(firsts, Seq("__gh"))
      .where(col(idCol) =!= col("__first").getField(idCol)
        || col("pos") =!= col("__first").getField("pos"))
    val drops = excised.select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("__p"))
      .distinct()
    val kept = toks
      .select(col(idCol), posexplode(col("__toks")).as(Seq("__p0", "__tok")))
      .select(col(idCol), (col("__p0") + 1).cast("long").as("__p"),
        col("__tok"))
      .join(drops, Seq(idCol, "__p"), "left_anti")
    val re = kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("__n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("__p"), col("__tok")))),
          x => x.getField("__tok")), " ").as("__txt"))
    df.select(col(idCol),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(re, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("__n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("__txt"), lit("")).as("text_dedup"))
  }

  /** BM25 top-k retrieval (Lucene/Robertson formulation): score every
    * document containing at least one of `queryTerms` by
    * Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) with
    * idf(t) = ln((N − df_t + 0.5)/(df_t + 0.5) + 1), and return the top
    * `k`. The sparse-retrieval half of a RAG stack, next to the dense
    * [[graft.functions.Similarity]] tier (fuse them with
    * [[RankFusion]]-style RRF).
    *
    * Engine-portable scoring: each term's double contribution is quantized
    * to integer MICRO-UNITS (floor(x·1e6 + 0.5) as long) before the per-doc
    * sum — long addition is associative, so the score is independent of
    * partition count, merge order, and engine; ranking compares the raw
    * micro-unit sum (a long), never a double. Display value is the 4-dp
    * score.
    *
    * Scale shape: the token explode filters to `queryTerms` BEFORE any
    * exchange (a handful of terms survive out of each document), df/N/avgdl
    * are term-cardinality and 1-row broadcast frames, and the final top-k
    * is `orderBy.limit` — Spark's TakeOrderedAndProject, a per-partition
    * heap + driver merge of k rows, no global sort, no single-partition
    * window over the corpus.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import CoreOps.rnd
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    require(k >= 1, s"k=$k must be positive")
    val docs = ScaleOps.fanOut(df, col(idCol)).select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("long"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("__n_docs"),
      (sum("__dl").cast("double") / count(lit(1))).as("__avgdl"))
    val tf = docs
      .select(col(idCol), col("__dl"), explode(col("__toks")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("__dl")).as("__dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df_t"))
    val contrib = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__cu", floor(
        (log((col("__n_docs") - col("df_t") + 0.5) / (col("df_t") + 0.5) + 1)
          * (col("tf") * (k1 + 1))
          / (col("tf")
            + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl"))))
          * 1000000 + 0.5).cast("long"))
    val scored = contrib.groupBy(col(idCol))
      .agg(sum("__cu").as("__su"), count(lit(1)).as("n_terms"))
      .orderBy(col("__su").desc, col(idCol))
      .limit(k)
    scored
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("__su").desc, col(idCol))).cast("long"))
      .select(col(idCol), col("n_terms"),
        rnd(col("__su").cast("double") / 1000000).as("score"), col("rnk"))
  }

  /** Character-trigram language-model quality score (the CCNet-style
    * perplexity filter, self-trained): fit an MLE trigram model on the
    * corpus itself — P(c₃|c₁c₂) = count(c₁c₂c₃) / count(c₁c₂·) — and score
    * each document by the average negative log-likelihood of its trigrams.
    * Repetitive/templated text scores LOW (its trigrams dominate the
    * model), out-of-distribution noise scores HIGH; both tails are what a
    * pretraining quality gate trims.
    *
    * Engine-portable like [[bm25TopK]]: each trigram's −ln p is quantized
    * to micro-unit longs before the per-doc sum, so the aggregate is
    * associative and partition-layout-independent; only the final 4-dp
    * average is a double.
    *
    * Scale shape: the model is at most |charset|³ rows regardless of corpus
    * size (a few thousand here — KBs), so it BROADCASTS to the scoring
    * stream. The trigram stream collapses to per-(doc, trigram) COUNTS in
    * its first exchange, and that identical subplan feeds both the model
    * fit (a second, model-sized aggregation) and the scoring join —
    * Spark's ReuseExchange evaluates it once; scoring multiplies each
    * quantized per-gram −ln p by its multiplicity (exact long arithmetic),
    * so occurrences are never re-enumerated after the first aggregation.
    */
  def charTrigramNll(df: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    import CoreOps.rnd
    // Per-document trigram histograms are ROW-LOCAL: the fused
    // [[graft.expressions.TrigramCounts]] computes them in the scan
    // projection, so the raw trigram stream never exists as rows and the
    // old fact-scale (id, tri) exchange (every trigram INSTANCE crossed
    // the wire before counting — the pipeline's dominant shuffle)
    // disappears entirely. Only the charset³-bounded model aggregation
    // and the per-document result rows reach an exchange now.
    val td = ScaleOps.fanOut(df, col(idCol))
      .select(col(idCol), col(textCol).as("__t"))
      .select(col(idCol),
        explode(graft.expressions.TrigramCounts.trigramCounts(col("__t")))
          .as("__tc"))
      .select(col(idCol), col("__tc.tri").as("tri"), col("__tc.c").as("__c"))
    val tc = td.groupBy("tri").agg(sum("__c").as("ct"))
    // prefix totals as a window over the MODEL-sized frame — a groupBy +
    // join spelling re-evaluates the whole trigram explode under the
    // prefix branch (exchange reuse does not reach through it)
    val model = broadcast(
      tc.withColumn("cp", sum("ct").over(
          Window.partitionBy(substring(col("tri"), 1, 2))))
        .select(col("tri"), col("ct"), col("cp")))
    td.join(model, "tri")
      .withColumn("__nu", floor(
        -log(col("ct").cast("double") / col("cp")) * 1000000 + 0.5)
        .cast("long") * col("__c"))
      .groupBy(col(idCol))
      .agg(sum("__c").as("n_tri"), sum("__nu").as("__su"))
      .withColumn("avg_nll",
        rnd(col("__su").cast("double") / 1000000 / col("n_tri")))
      .select(col(idCol), col("n_tri"), col("avg_nll"))
  }

  /** First-occurrence n-gram novelty in corpus order: for each document,
    * the fraction of its DISTINCT word n-grams whose minimum document id
    * in the whole corpus is this document — i.e. grams this document
    * introduces. A curation signal for ordered/incremental ingestion:
    * novelty collapsing toward 0 means the crawl frontier is re-reading
    * what the corpus already holds.
    *
    * Scale shape: one evaluation of the per-doc-distinct gram stream
    * ([[ngramSet]]), the corpus-first id as a WINDOW keyed on the gram's
    * md5 digest (the gram text is pruned before the exchange — only
    * (id, digest) rows ship), then one per-doc aggregation. Same
    * single-generator discipline as [[duplicatedSpans]].
    *
    * @return one row per document: (id, n_grams, n_novel,
    *         novelty 4-dp | NULL for gramless docs).
    */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   n: Int): DataFrame = {
    import CoreOps.rnd
    val agg = ngramSet(df, idCol, textCol, n)
      .withColumn("__first", min(col(idCol)).over(
        Window.partitionBy(md5(col("gram").cast("binary")))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n_grams"),
        sum(when(col("__first") === col(idCol), 1L).otherwise(0L))
          .as("__n_novel"))
    df.select(col(idCol))
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("__n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty",
        when(col("n_grams") === 0, lit(null).cast("double"))
          .otherwise(rnd(col("n_novel").cast("double") / col("n_grams"))))
  }

  /** Concentration report for a weighted mixture (tokens per source):
    * stratum count, Herfindahl–Hirschman index Σ share², the largest
    * stratum's share, and the Gini coefficient — the one-row dashboard a
    * data-mixture governance check reads before training ("is one crawl
    * dominating the corpus?").
    *
    * Exact-arithmetic determinism: every statistic reduces to LONG sums
    * over per-stratum totals (Gini via its integer-numerator identity
    * G = (2·Σ rank·w − (n+1)·Σw) / (n·Σw), ranks ascending by (w, key)),
    * with exactly one double division each at the end — no
    * merge-order-dependent float accumulation anywhere. Long range bounds
    * the inputs (|w| sums squared must fit 2⁶³); at 100 TB feed weights in
    * kilotokens.
    *
    * Scale shape: one hash aggregation over the corpus; everything after
    * runs on the stratum-cardinality frame (tens to thousands of rows),
    * including the rank window.
    */
  def concentrationStats(df: DataFrame, strataCol: String,
                         weight: Column): DataFrame = {
    import CoreOps.rnd
    val s = df.groupBy(col(strataCol))
      .agg(sum(weight.cast("long")).as("__w"))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__w"), col(strataCol))).cast("long"))
    s.agg(
      count(lit(1)).as("n_strata"),
      sum(col("__w")).as("__tot"),
      sum(col("__w") * col("__w")).as("__sumsq"),
      max(col("__w")).as("__max"),
      sum(col("__rk") * col("__w")).as("__rksum"))
      .select(
        col("n_strata"),
        rnd(col("__sumsq").cast("double")
          / (col("__tot").cast("double") * col("__tot").cast("double")))
          .as("hhi"),
        rnd(col("__max").cast("double") / col("__tot")).as("top_share"),
        rnd((lit(2L) * col("__rksum")
          - (col("n_strata") + lit(1L)) * col("__tot")).cast("double")
          / (col("n_strata") * col("__tot")).cast("double")).as("gini"))
  }

  /** Per-stratum distribution-tail gate: keep the rows whose `metric`
    * percent-rank within their stratum lies in [lo, hi] — the
    * length-outlier trim a pretraining recipe applies per source (truncated
    * heads are usually boilerplate fragments, extreme tails are dumps/
    * concatenation artifacts). Rank-based rather than value-based, so the
    * gate is integer-exact and engine-portable: percent_rank is
    * (rank−1)/(n−1) over exact ints, ties share a rank and therefore move
    * through the gate together, and a single-row stratum sits at rank 0.0
    * (kept whenever lo ≤ 0).
    *
    * Scale shape: one exchange on the stratum + a partition-local sort.
    * Each stratum ranks inside one task, which is the right trade while
    * strata are sources (tens to thousands, bounded rows each); for a
    * mega-stratum that outgrows a task, gate on VALUE bounds from a KLL
    * quantile sketch instead ([[SketchOps.kllQuantileRollup]]) — rank
    * semantics at unbounded cardinality cost a global sort by definition.
    */
  def tailGate(df: DataFrame, strataCol: String, metric: Column,
               lo: Double, hi: Double): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi,
      s"tail gate [$lo, $hi] must be an ordered sub-range of [0, 1]")
    // NULLS LAST explicitly: Spark's ascending default is nulls-FIRST
    // where standard-SQL engines (the DuckDB oracle included) rank nulls
    // last — one NULL metric row would otherwise shift every rank in its
    // stratum and break cross-engine agreement at the gate boundaries
    df.withColumn("__pr", percent_rank().over(
        Window.partitionBy(col(strataCol)).orderBy(metric.asc_nulls_last)))
      .where(col("__pr") >= lo && col("__pr") <= hi)
      .drop("__pr")
  }

  /** Adjacent-token merge-pair counts — the count step of one BPE/
    * WordPiece tokenizer-training iteration at whitespace-token
    * granularity: the top-k most frequent adjacent pairs are the merge
    * candidates. Each count is over every adjacency occurrence (not
    * per-doc distinct), which is exactly the corpus statistic the merge
    * rule greedily consumes.
    *
    * Scale shape: the pair explode flows into a two-phase hash aggregate
    * (map-side partials on narrow (left, right, count) rows), and the
    * top-k is `orderBy.limit` — TakeOrderedAndProject heaps, no global
    * sort; the rank window runs over the k survivors only.
    */
  def mergePairCandidates(df: DataFrame, textCol: String,
                          k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    val counts = df
      .select(TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__k", size(col("__toks")) - 1)
      .where(col("__k") >= 1)
      .select(explode(expr(
        "transform(sequence(1, __k), i -> struct(__toks[i-1] AS left_tok, __toks[i] AS right_tok))"))
        .as("__p"))
      .select(col("__p.left_tok").as("left_tok"),
        col("__p.right_tok").as("right_tok"))
      .groupBy("left_tok", "right_tok").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("left_tok"), col("right_tok"))
      .limit(k)
    counts.withColumn("rnk", row_number().over(
      Window.orderBy(col("cnt").desc, col("left_tok"), col("right_tok")))
      .cast("long"))
  }

  /** Exact heavy hitters over the token stream: every token whose corpus
    * share is at least `minShare`. Two-phase hash-aggregate with map-side
    * partials (narrow (token, count) rows through the exchange — never
    * text), the corpus total joining back as a broadcast 1-row frame. This
    * is the exact formulation; at truly unbounded vocabularies the same
    * contract runs in bounded memory as count-min/SpaceSaving sketches, but
    * a token vocabulary is small enough (≤ a few hundred million) that the
    * exact two-agg plan is the right default even at 100 TB of text.
    */
  def heavyHitters(df: DataFrame, textCol: String,
                   minShare: Double): DataFrame = {
    import CoreOps.rnd
    val counts = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", rnd(col("cnt").cast("double") / col("total")))
      .where(col("cnt").cast("double") / col("total") >= minShare)
      .select("token", "cnt", "share")
  }

  /** Zipf's-law fit of the token frequency spectrum — OLS of ln(count)
    * on ln(rank) over the top-`k` corpus tokens: natural language sits
    * near slope −1 (Zipf 1949), and a corpus that drifts off that line is
    * the classic template/boilerplate/spam smell (machine-generated text
    * flattens the head; mass duplication steepens it). The slope is the
    * one-number corpus-health read to trend per ingest batch.
    *
    * Determinism: ranks tie-break by (count desc, token) so both engines
    * cut the identical top-k; ln runs on exact INTEGER ranks/counts and
    * quantizes to 1e-6 longs before any sum (the [[graft.ops.ChangeOps]]
    * mixtureDrift ln recipe); the OLS power sums over the k-bounded frame
    * are exact longs and slope/intercept/R² are fixed IEEE expressions
    * over them (the 1e12 quantization scale cancels inside the slope).
    *
    * Scale shape: one fact-scale hash aggregate to the token histogram;
    * the ranking window and the k-row regression run over the bounded
    * vocabulary table only (same justification as [[vocabCoverageCurve]]).
    *
    * @return one row: (n_ranks, slope, intercept_ln, r2), 4-dp
    */
  def zipfFit(df: DataFrame, textCol: String, k: Int = 200): DataFrame = {
    import CoreOps.rnd
    require(k >= 3, s"zipf fit needs k >= 3 ranks, got $k")
    val counts = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val top = counts.withColumn("rnk", row_number().over(
        Window.orderBy(col("cnt").desc, col("token"))).cast("long"))
      .where(col("rnk") <= k.toLong)
    val micro = (c: Column) =>
      floor(log(c.cast("double")) * lit(1000000.0) + lit(0.5)).cast("long")
    val s = top.select(micro(col("rnk")).as("lx"), micro(col("cnt")).as("ly"))
      .agg(count(lit(1)).as("n_ranks"),
        sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
        sum(col("lx") * col("ly")).as("sxy"),
        sum(col("lx") * col("lx")).as("sxx"),
        sum(col("ly") * col("ly")).as("syy"))
    val nD = col("n_ranks").cast("double")
    val sx = col("sx").cast("double");  val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double"); val syy = col("syy").cast("double")
    val covN  = nD * sxy - sx * sy
    val varxN = nD * sxx - sx * sx
    val varyN = nD * syy - sy * sy
    val slope = covN / varxN
    s.select(col("n_ranks"),
      when(varxN <= 0.0, lit(null).cast("double"))
        .otherwise(rnd(slope)).as("slope"),
      when(varxN <= 0.0, lit(null).cast("double"))
        .otherwise(rnd((sy - slope * sx) / nD / lit(1000000.0)))
        .as("intercept_ln"),
      when(varxN <= 0.0 || varyN <= 0.0, lit(null).cast("double"))
        .otherwise(rnd(covN * covN / (varxN * varyN))).as("r2"))
  }

  /** Vocabulary-budget coverage curve — for each candidate vocabulary
    * size V (the top-V corpus tokens by frequency) and each stratum
    * (language/source), what share of the stratum's token stream the
    * vocabulary covers and how many of its token TYPES fall out-of-vocab.
    * This is the curve a tokenizer budget decision reads: where coverage
    * plateaus is where growing the vocab stops paying, and a stratum
    * whose curve lags the corpus average is the one OOV fragmentation
    * will hurt.
    *
    * Scale shape: one fact-scale hash aggregate to (stratum, token,
    * count) — map-side partials, narrow rows, the only exchange that
    * sees input-proportional data. The global ranking window runs over
    * the BOUNDED distinct-token table (vocabularies cap out in the
    * hundreds of millions; this fixture's is tiny), the rank table
    * broadcasts back, and the candidate sizes are a broadcast
    * handful-of-rows frame, so the curve costs |strata|·|sizes| output
    * rows of aggregation, never another pass over the corpus.
    *
    * Ties rank deterministically by (count desc, token) — both engines
    * cut identical vocabularies at every V.
    */
  def vocabCoverageCurve(df: DataFrame, strataCol: String, textCol: String,
                         sizes: Seq[Int]): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ >= 1),
      s"vocab sizes $sizes must be positive")
    require(sizes.distinct.size == sizes.size,
      s"duplicate vocab sizes in $sizes would duplicate curve rows")
    val spark = df.sparkSession
    import spark.implicits._
    val byTok = df.select(col(strataCol).as("stratum"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("stratum", "token").agg(count(lit(1)).as("c"))
    val vocabRank = byTok.groupBy("token").agg(sum("c").as("cnt"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cnt").desc, col("token"))).cast("long"))
      .select("token", "rnk")
    val vs = sizes.map(_.toLong).toDF("v")
    byTok.join(broadcast(vocabRank), Seq("token"))
      .crossJoin(broadcast(vs))
      .groupBy(col("v"), col("stratum"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(when(col("rnk") <= col("v"), col("c")).otherwise(0L))
          .as("covered"),
        count(when(col("rnk") > col("v"), lit(1))).as("oov_types"))
      .withColumn("coverage",
        CoreOps.rnd(col("covered").cast("double") /
          col("n_tokens").cast("double")))
  }

  /** Pairwise source vocabulary overlap — for every source pair, the
    * Jaccard and containment of their distinct-token sets: the
    * corpus-composition read that tells a mixture designer which
    * sources are near-duplicates of each other IN AGGREGATE (doc-level
    * near-dup misses two sources that paraphrase the same domain) and
    * which small source is swallowed by a big one (containment ≈ 1).
    *
    * Scale shape: one fact-scale aggregate to the distinct (source,
    * token) incidence, sizes as a bounded rollup, then a token-keyed
    * self-join whose per-token fan-out is ≤ |sources|² — bounded,
    * because sources are a catalog, not data. Jaccard/containment are
    * one IEEE division each over exact longs.
    *
    * @return (src_a, src_b, n_a, n_b, n_common, jaccard, containment)
    *         per unordered pair (src_a < src_b), 4-dp
    */
  def sourceVocabOverlap(df: DataFrame, strataCol: String,
                         textCol: String): DataFrame = {
    import CoreOps.rnd
    val st = df.where(col(strataCol).isNotNull)
      .select(col(strataCol).as("src"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .distinct()
    val sizes = st.groupBy("src").agg(count(lit(1)).as("n"))
    val inter = st.select(col("src").as("src_a"), col("token"))
      .join(st.select(col("src").as("src_b"), col("token")), "token")
      .where(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("src").as("src_a"), col("n").as("n_a"))),
        "src_a")
      .join(broadcast(sizes.select(col("src").as("src_b"), col("n").as("n_b"))),
        "src_b")
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("n_common"),
        rnd(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
          .as("jaccard"),
        rnd(col("n_common").cast("double") /
          least(col("n_a"), col("n_b")).cast("double")).as("containment"))
  }

  /** Symmetric within-document token co-occurrence counts —
    * M[a][b] = Σ_docs count_a(doc)·count_b(doc), the AᵀA Gram of the
    * doc×token count matrix (diagonal included): the input to
    * association mining, PMI embeddings, and the dominant-direction
    * solve ([[EmbeddingOps.powerIterate]]).
    *
    * Scale shape: the double explode generates each doc's occurrence
    * pairs ROW-LOCALLY and streams them straight into a hash aggregate —
    * map-side partials reduce every partition to ≤ vocab² rows before
    * the only exchange, so shuffle volume is the matrix, not the pair
    * stream, and no doc-keyed self-join ever happens. Pairs per doc are
    * (tokens/doc)² — bounded here; production co-occurrence bounds it
    * structurally with a context WINDOW (pairs ∝ tokens·window), which
    * changes only the generator, not this plan shape.
    */
  def tokenCooccurrence(df: DataFrame, textCol: String,
                        fanKey: Option[Column] = None): DataFrame =
    // fanKey: the width clamp's repartition key. Callers with a row id
    // should pass it — keying on the TEXT hashes the full document per
    // row, and on a dedup-heavy corpus identical texts collapse onto one
    // partition, partially defeating the clamp. The text fallback keeps
    // the keyless call sites working.
    ScaleOps.fanOut(df, fanKey.getOrElse(col(textCol)))
      .select(TextFunctions.tokens(col(textCol)).as("__t"))
      .select(explode(col("__t")).as("i"), col("__t"))
      .select(col("i"), explode(col("__t")).as("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("s"))

  /** Literal-substring search over the corpus through a character-trigram
    * inverted index — "grep at 100 TB": a document can contain `pattern`
    * only if it contains EVERY trigram of the pattern, so candidates are
    * the docs whose distinct-trigram set covers the pattern's trigram set,
    * and only those few docs ever get the real `contains` check. The naive
    * spelling — `WHERE text LIKE '%p%'` per pattern — rescans every byte
    * of the corpus per pattern, is un-indexable by min/max pruning, and is
    * exactly what this operator exists to avoid.
    *
    * Scale shape: per-document distinct trigrams come from the fused
    * [[graft.expressions.TrigramCounts]] histogram (map-only — no raw
    * trigram-instance exchange), and the explode is immediately
    * semi-joined against the BROADCAST pattern-trigram table, so the only
    * fact-scale exchange carries the (doc, pattern-gram) hits — for
    * selective patterns, orders of magnitude below corpus row count. The
    * coverage count then gates on the pattern's trigram arity, survivors
    * join back to the corpus BY KEY for the verify `contains`, and text
    * never crosses an exchange (the verify join ships only candidate
    * ids). False candidates (all trigrams present but not contiguous) are
    * filtered by the verify; true matches can never be dropped — every
    * trigram of a matching substring is by definition in the document.
    *
    * Pattern trigrams slice at CODE-POINT granularity (the same SQL
    * substring counting [[graft.expressions.TrigramCounts]] implements),
    * so multi-byte text indexes identically on both sides.
    *
    * @param patterns literal substrings, each ≥ 3 code points (below
    *                 that a trigram index cannot prune; reject loudly
    *                 rather than silently full-scan)
    * @return every (pattern, doc_id) match — exact, verified, no
    *         approximation
    */
  def trigramIndexSearch(df: DataFrame, idCol: String, textCol: String,
                         patterns: Seq[String]): DataFrame = {
    require(patterns.nonEmpty, "trigramIndexSearch needs patterns")
    require(patterns.distinct.size == patterns.size,
      "duplicate patterns would duplicate their match rows")
    val spark = df.sparkSession
    import spark.implicits._
    val patGrams = patterns.flatMap { p =>
      val cps = p.codePoints().toArray
      require(cps.length >= 3,
        s"pattern '$p' is shorter than 3 code points — a trigram index" +
          " cannot prune it")
      (0 to cps.length - 3).map(i => (p, new String(cps, i, 3))).distinct
    }
    val patArity = patGrams.groupBy(_._1).view.mapValues(_.size.toLong).toSeq
    val grams = patGrams.toDF("pattern", "tri")
    val arity = patArity.toDF("pattern", "__need")
    val docTris = ScaleOps.fanOut(df, col(idCol)).select(col(idCol),
        explode(graft.expressions.TrigramCounts.trigramCounts(col(textCol)))
          .as("__tc"))
      .select(col(idCol), col("__tc.tri").as("tri"))
    val cands = docTris
      .join(broadcast(grams), Seq("tri"))
      .groupBy(col(idCol), col("pattern"))
      .agg(count(lit(1)).as("__hit"))
      .join(broadcast(arity), Seq("pattern"))
      .where(col("__hit") === col("__need"))
      .select(col(idCol), col("pattern"))
    cands
      .join(df.select(col(idCol), col(textCol)), Seq(idCol))
      .where(col(textCol).contains(col("pattern")))
      .select(col("pattern"), col(idCol))
  }

  /** Retrieval-quality eval: nDCG@k of the BM25 ranking against graded
    * term-overlap relevance, per query (Järvelin & Kekäläinen 2002 for
    * nDCG; the BM25 scorer is [[bm25TopK]]'s, generalized to a query
    * SET). Relevance of doc d for query q is the number of distinct
    * q-terms d contains (graded 0..|q|) — the deterministic proxy truth
    * a self-contained eval can compute at corpus scale; DCG@k uses the
    * BM25 order, IDCG@k the best achievable order, and their ratio is
    * the "is the ranker actually ranking?" health metric a retrieval
    * index ships with.
    *
    * Determinism: BM25 contributions micro-quantize exactly as
    * [[bm25TopK]]; both rank orders totalize ties by doc id; each DCG
    * term floor-quantizes rel/(ln(i+1)/ln 2) to micro BEFORE its exact
    * long sum; ndcg is one double division, 4-dp.
    *
    * Scale shape: ONE fact-scale explode + (query, doc, term) hash
    * aggregate feeds BOTH the scorer and the relevance labels (they are
    * the same aggregate); the two rank windows are per-query top-k —
    * rank-limit pushdown (WindowGroupLimit) keeps state k-bounded per
    * partition — and the final per-query rollup is query-count bounded.
    *
    * @param queries (query id, terms) pairs; ids must be distinct
    * @return one row per query id: (qid, n_rel — docs with ≥1 term,
    *         dcg_micro, idcg_micro, ndcg 4-dp; ndcg null when idcg = 0).
    *         A query matching NO document still gets its row: n_rel = 0,
    *         micros 0, ndcg null.
    */
  def ndcgEval(df: DataFrame, idCol: String, textCol: String,
               queries: Seq[(Long, Seq[String])], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import CoreOps.rnd
    require(k >= 1, s"k=$k must be positive")
    val scored = bm25QueryScores(df, idCol, textCol, queries, k1, b)
    val byScore = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("__su").desc, col(idCol))
    val byRel = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("rel").desc, col(idCol))
    val gain = (rk: Column) => floor(col("rel").cast("double")
      / (log(rk.cast("double") + 1.0) / log(lit(2.0)))
      * 1000000 + 0.5).cast("long")
    // The materialize-once discipline: `scored` feeds three consumers
    // (count, DCG, IDCG) — cache it so the fact-scale tf aggregate runs
    // once. Each rank filter is a direct row_number predicate so the
    // WindowGroupLimit rewrite keeps per-partition window state
    // k-bounded instead of sorting whole query groups.
    val sc = scored.localCheckpoint(true)
    // Anchor on the SUPPLIED query ids, not on the scored rows: a query
    // whose terms match no document yields zero scored rows, and the
    // "@return one row per query id" contract still owes it a row with
    // n_rel = 0 and null ndcg.
    val spark0 = df.sparkSession
    import spark0.implicits._
    val qids = queries.map(_._1).toDF("qid")
    val nRel = qids.join(
      sc.groupBy(col("qid")).agg(count(lit(1)).as("n_rel")),
      Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_rel"), lit(0L)).as("n_rel"))
    val dcgT = sc.withColumn("__rk", row_number().over(byScore).cast("long"))
      .where(col("__rk") <= k).groupBy(col("qid"))
      .agg(sum(gain(col("__rk"))).as("dcg_micro"))
    val idcgT = sc.withColumn("__rk", row_number().over(byRel).cast("long"))
      .where(col("__rk") <= k).groupBy(col("qid"))
      .agg(sum(gain(col("__rk"))).as("idcg_micro"))
    nRel.join(dcgT, Seq("qid"), "left").join(idcgT, Seq("qid"), "left")
      .select(col("qid"), col("n_rel"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"),
        coalesce(col("idcg_micro"), lit(0L)).as("idcg_micro"))
      .select(col("qid"), col("n_rel"), col("dcg_micro"), col("idcg_micro"),
        when(col("idcg_micro") === 0L, lit(null).cast("double"))
          .otherwise(rnd(col("dcg_micro").cast("double") /
            col("idcg_micro").cast("double"))).as("ndcg"))
  }

  /** Shared BM25 query-set scorer behind [[ndcgEval]] and
    * [[retrievalEval]]: per (query, doc) the micro-quantized BM25 score
    * `__su` and the graded relevance `rel` (distinct query terms the doc
    * contains). ONE fact-scale explode + (query, doc, term) hash
    * aggregate feeds both the scorer and the labels — evals over the
    * same ranking share the aggregate, not just the formula.
    */
  private def bm25QueryScores(df: DataFrame, idCol: String, textCol: String,
                              queries: Seq[(Long, Seq[String])],
                              k1: Double, b: Double): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "retrieval eval needs at least one query, each with at least one term")
    require(queries.map(_._1).distinct.size == queries.size,
      "query ids must be distinct")
    val spark = df.sparkSession
    import spark.implicits._
    val qt = queries.flatMap { case (q, ts) => ts.distinct.map((q, _)) }
      .toDF("qid", "term")
    val docs = ScaleOps.fanOut(df, col(idCol)).select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("long"))
    val stats = docs.agg(
      count(lit(1)).cast("double").as("__n_docs"),
      (sum("__dl").cast("double") / count(lit(1))).as("__avgdl"))
    val tf = docs
      .select(col(idCol), col("__dl"), explode(col("__toks")).as("term"))
      .join(broadcast(qt), Seq("term"))
      .groupBy(col("qid"), col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("__dl")).as("__dl"))
    val dfreq = tf.groupBy("qid", "term")
      .agg(count_distinct(col(idCol)).as("df_t"))
    val contrib = tf.join(broadcast(dfreq), Seq("qid", "term"))
      .crossJoin(broadcast(stats))
      .withColumn("__cu", floor(
        (log((col("__n_docs") - col("df_t") + 0.5) / (col("df_t") + 0.5) + 1)
          * (col("tf") * (k1 + 1))
          / (col("tf")
            + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl"))))
          * 1000000 + 0.5).cast("long"))
    contrib.groupBy(col("qid"), col(idCol))
      .agg(sum("__cu").as("__su"), count(lit(1)).as("rel"))
  }

  /** Binary-relevance retrieval eval: MRR@k and AP@k of the BM25 ranking
    * per query, where a doc is RELEVANT iff it contains EVERY distinct
    * term of the query (the conjunctive truth nDCG's graded overlap
    * cannot test — a ranker can score well on graded overlap while
    * burying the docs that actually satisfy the whole query). Together
    * with [[ndcgEval]] this closes the standard offline eval triple
    * (nDCG / MRR / MAP) a retrieval index ships with.
    *
    * Determinism: the ranking totalizes ties by doc id (BM25 micro
    * score desc, id asc — [[ndcgEval]]'s order exactly); each
    * reciprocal/precision term is the INTEGER rounding
    * `(2·10⁶·c + i) // (2i)` = floor(10⁶·c/i + ½), so RR and the AP
    * numerator are exact long sums — no IEEE in the accumulators at
    * all; the displayed rr/ap are single 4-dp divisions at the end.
    *
    * Scale shape: shares [[bm25QueryScores]]'s single fact-scale
    * aggregate; the rank window is per-query row_number ≤ k (the
    * WindowGroupLimit rewrite keeps per-partition state k-bounded); the
    * relevant-total R is a query-count-bounded aggregate off the same
    * materialized scores; everything after is |queries| rows.
    *
    * @param queries (query id, terms) pairs; ids must be distinct
    * @return one row per query id: (qid, n_rel — relevant docs in the
    *         whole corpus, hits_k — relevant in the top k, first_rank —
    *         rank of the first relevant in the top k, rr_micro,
    *         ap_micro, rr, ap) — first_rank/rr/ap null and micros 0
    *         when no relevant doc lands in the top k (rr) / exists (ap).
    *         A query matching NO document still gets its row (n_rel = 0).
    */
  def retrievalEval(df: DataFrame, idCol: String, textCol: String,
                    queries: Seq[(Long, Seq[String])], k: Int,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import CoreOps.rnd
    require(k >= 1, s"k=$k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val nTerms = queries.map { case (q, ts) => (q, ts.distinct.size.toLong) }
      .toDF("qid", "__nt")
    // Materialize once: the scored table feeds the per-query relevant
    // total AND the top-k rank scan (ndcgEval's discipline).
    val sc = bm25QueryScores(df, idCol, textCol, queries, k1, b)
      .join(broadcast(nTerms), Seq("qid"))
      .withColumn("__isrel", (col("rel") === col("__nt")).cast("long"))
      .localCheckpoint(true)
    // Anchor on the SUPPLIED query ids ([[ndcgEval]]'s discipline): a
    // query matching no document still owes its output row (n_rel = 0,
    // hits 0, null rr/ap) under the one-row-per-query contract.
    val qids = queries.map(_._1).toDF("qid")
    val totals = qids.join(
      sc.groupBy(col("qid")).agg(sum(col("__isrel")).as("n_rel")),
      Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_rel"), lit(0L)).as("n_rel"))
    val byScore = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("__su").desc, col(idCol))
    val byRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("__rk"))
    val top = sc
      .withColumn("__rk", row_number().over(byScore).cast("long"))
      .where(col("__rk") <= k)
      .withColumn("__cum", sum(col("__isrel")).over(byRank))
    val perQ = top.groupBy(col("qid")).agg(
      sum(col("__isrel")).as("hits_k"),
      min(when(col("__isrel") === 1L, col("__rk"))).as("first_rank"),
      coalesce(sum(when(col("__isrel") === 1L,
        CoreOps.integralDiv(lit(2000000L) * col("__cum") + col("__rk"),
          lit(2L) * col("__rk")))), lit(0L))
        .as("ap_num_micro"))
    totals.join(perQ, Seq("qid"), "left")
      .select(col("qid"), col("n_rel"),
        coalesce(col("hits_k"), lit(0L)).as("hits_k"), col("first_rank"),
        coalesce(when(col("first_rank").isNotNull,
          CoreOps.integralDiv(lit(2000000L) + col("first_rank"),
            lit(2L) * col("first_rank"))), lit(0L))
          .as("rr_micro"),
        coalesce(col("ap_num_micro"), lit(0L)).as("ap_micro"))
      .select(col("qid"), col("n_rel"), col("hits_k"), col("first_rank"),
        col("rr_micro"), col("ap_micro"),
        when(col("first_rank").isNull, lit(null).cast("double"))
          .otherwise(rnd(col("rr_micro").cast("double") / 1000000.0))
          .as("rr"),
        when(col("n_rel") === 0L, lit(null).cast("double"))
          .otherwise(rnd(col("ap_micro").cast("double")
            / (least(col("n_rel"), lit(k.toLong)) * 1000000.0))).as("ap"))
  }

  /** Inverse-cloze-task pairs (Lee, Chang & Toutanova 2019 — ORQA's
    * retriever pretraining): per document, hash-pick one chunk as the
    * pseudo-QUERY and emit the rest as its positive CONTEXT — the
    * self-supervised (query, passage) pairs a dense retriever pretrains
    * on before any labeled data exists. Chunks are fixed token windows
    * (the corpus has no sentence segmentation; real pipelines swap in a
    * segmenter, the pairing logic is unchanged); the pick is
    * content-addressed ([[splitBucket]]'s md5 idiom) so the dataset is
    * stable across engines and re-runs.
    *
    * Scale shape: pure per-row expressions — tokenize, slice, join —
    * zero exchanges; documents with fewer than two chunks drop (no
    * context to pair with).
    *
    * @return (doc id, n_chunks, q_idx — the picked chunk, query,
    *         context — the document minus the query chunk)
    */
  def ictPairs(df: DataFrame, idCol: String, textCol: String,
               chunkTokens: Int = 10): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens=$chunkTokens must be positive")
    val toks = df.select(col(idCol),
      TextFunctions.tokens(col(textCol)).as("__t"))
      .withColumn("__n", size(col("__t")).cast("long"))
      .withColumn("__nc", CoreOps.integralDiv(
        col("__n") + (chunkTokens - 1), chunkTokens.toLong))
      .where(col("__nc") >= 2L)
    val qi = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long") % col("__nc")
    toks
      .withColumn("q_idx", qi)
      .select(col(idCol), col("__nc").as("n_chunks"), col("q_idx"),
        array_join(slice(col("__t"),
          (col("q_idx") * chunkTokens + 1).cast("int"),
          lit(chunkTokens)), " ").as("query"),
        array_join(concat(
          slice(col("__t"), lit(1), (col("q_idx") * chunkTokens).cast("int")),
          slice(col("__t"),
            ((col("q_idx") + 1) * chunkTokens + 1).cast("int"),
            greatest(col("__n") - (col("q_idx") + 1) * chunkTokens, lit(0L))
              .cast("int"))), " ").as("context"))
  }

  /** Curation-funnel readout — the dataset-card row every corpus release
    * ships: how many documents survive each gate, in order, with the
    * share of raw. Stages here are the self-contained core of a
    * curation pass (non-empty → length band → exact-dedup survivor);
    * real pipelines splice their own gates in, but the SHAPE — one
    * cumulative filter chain, counted per stage in a single pass — is
    * the op. A reviewer reads attrition per stage, not just the final
    * count, which is how over-aggressive gates get caught.
    *
    * Scale shape: stage predicates are map-only; the dedup stage is the
    * standard digest-keyed keep-min (digests only cross the exchange);
    * the per-stage counts come from ONE aggregate over stage flags, not
    * one scan per stage.
    *
    * @return one row per stage in funnel order: (stage_idx, stage,
    *         n_docs, pct_of_raw 4-dp)
    */
  def curationFunnel(df: DataFrame, idCol: String, textCol: String,
                     minChars: Int = 100, maxChars: Int = 2000): DataFrame = {
    import CoreOps.rnd
    require(minChars >= 0 && maxChars >= minChars,
      s"bad length band [$minChars, $maxChars]")
    val nonempty = col(textCol).isNotNull && length(col(textCol)) > 0
    val inBand = nonempty && length(col(textCol)).between(minChars, maxChars)
    val flagAgg = df.agg(
      count(lit(1)).as("__raw"),
      sum(when(nonempty, 1L).otherwise(0L)).as("__n1"),
      sum(when(inBand, 1L).otherwise(0L)).as("__n2"))
    // dedup survivor: one kept id per exact-text digest within the band
    // — a digest-keyed aggregate (text never crosses the exchange), NOT
    // a window over a null-digest partition that would hold every
    // out-of-band row
    val dedupAgg = df.where(inBand)
      .select(md5(col(textCol)).as("__dig"))
      .groupBy(col("__dig")).agg(count(lit(1)).as("__c"))
      .agg(coalesce(count(lit(1)), lit(0L)).as("__n3"))
    val spark = df.sparkSession
    import spark.implicits._
    val stages = Seq((0L, "raw"), (1L, "nonempty"), (2L, "length_band"),
      (3L, "dedup_survivor")).toDF("stage_idx", "stage")
    stages
      .crossJoin(broadcast(flagAgg))
      .crossJoin(broadcast(dedupAgg))
      .select(col("stage_idx"), col("stage"),
        when(col("stage_idx") === 0L, col("__raw"))
          .when(col("stage_idx") === 1L, col("__n1"))
          .when(col("stage_idx") === 2L, col("__n2"))
          .otherwise(col("__n3")).as("n_docs"),
        col("__raw"))
      .select(col("stage_idx"), col("stage"), col("n_docs"),
        when(col("__raw") === 0L, lit(null).cast("double"))
          .otherwise(rnd(col("n_docs").cast("double")
            / col("__raw").cast("double"))).as("pct_of_raw"))
  }

  /** Hard-negative mining for reranker/embedding training (the DPR /
    * cross-encoder data recipe): per query, the top-ranked docs that are
    * NOT relevant — they score high on the lexical ranker while failing
    * the conjunctive truth, exactly the confusable examples a trained
    * reranker must learn to push down. Random negatives teach nothing
    * (trivially separable); these are the ones that move the model.
    *
    * Determinism: relevance and ranking are [[retrievalEval]]'s exactly
    * (BM25 micro score, ties to the smaller id; relevant = contains
    * EVERY query term); the per-query negative rank is a row_number
    * over (score desc, id) on the non-relevant slice.
    *
    * Scale shape: shares [[bm25QueryScores]]'s single fact-scale
    * aggregate; the rank<=k filter pushes into WindowGroupLimit; output
    * is |queries|·k rows.
    *
    * @return (qid, neg_rank 1..k, doc id, rel — matched terms (always
    *         < |q|), score_micro)
    */
  def hardNegatives(df: DataFrame, idCol: String, textCol: String,
                    queries: Seq[(Long, Seq[String])], k: Int,
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val nTerms = queries.map { case (q, ts) => (q, ts.distinct.size.toLong) }
      .toDF("qid", "__nt")
    val byScore = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("__su").desc, col(idCol))
    bm25QueryScores(df, idCol, textCol, queries, k1, b)
      .join(broadcast(nTerms), Seq("qid"))
      .where(col("rel") < col("__nt"))
      .withColumn("neg_rank", row_number().over(byScore).cast("long"))
      .where(col("neg_rank") <= k)
      .select(col("qid"), col("neg_rank"), col(idCol), col("rel"),
        col("__su").as("score_micro"))
  }

  /** Pseudo-relevance-feedback query expansion (Rocchio 1971 lineage;
    * the RM1-lite a self-contained retrieval stack ships): rank the
    * corpus by BM25 for the query, take the top-k feedback docs, and
    * score every non-query term they contain by feedback-tf × idf —
    * the terms that CHARACTERIZE what the query retrieves, fed back as
    * expansion candidates. Closes the retrieval loop: bm25_topk ranks,
    * ndcg/mrr grade the ranking, this IMPROVES the query.
    *
    * Determinism: the feedback cut totalizes ties like every rank here
    * (BM25 micro desc, id); score_micro = floor(f_tf·ln(N/df_t)·10⁶+½)
    * — one ln of a ratio of exact integers per term, exact long f_tf;
    * the expansion rank totalizes by (score desc, term).
    *
    * Scale shape: the ranking shares [[bm25QueryScores]]'s single
    * fact-scale aggregate; the feedback set is k docs (broadcast); the
    * candidate tf aggregate runs over the k docs' tokens only; the
    * corpus-df pass is fact-scale but candidate-filtered MAP-SIDE by a
    * broadcast of the (bounded) candidate vocabulary before its
    * aggregate — the classic two-pass PRF plan.
    *
    * @param terms the original query terms (excluded from expansion)
    * @param k     feedback depth (top-k docs)
    * @param m     expansion terms returned
    * @return top-m rows: (rk, term, f_tf — occurrences in the feedback
    *         docs, f_df — feedback docs containing it, df_t — corpus
    *         docs containing it, score_micro, score 4-dp)
    */
  def prfExpansion(df: DataFrame, idCol: String, textCol: String,
                   terms: Seq[String], k: Int = 10, m: Int = 20,
                   k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import CoreOps.rnd
    require(m >= 1, s"m=$m must be positive")
    require(k >= 1, s"k=$k must be positive")
    val scored = bm25QueryScores(df, idCol, textCol, Seq(1L -> terms), k1, b)
    val byScore = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("__su").desc, col(idCol))
    val topDocs = scored
      .withColumn("__rk", row_number().over(byScore))
      .where(col("__rk") <= k)
      .select(col(idCol))
    // Feedback-term counts: SELECT the k feedback docs BEFORE
    // tokenizing (the row filter commutes with the per-row explode) —
    // the previous spelling exploded the whole corpus's tokens and
    // joined after, paying a corpus-scale tokenize for a k-doc
    // aggregate.
    val cands = df
      .join(broadcast(topDocs), Seq(idCol))
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .where(!col("term").isin(terms.distinct: _*))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("f_tf"), count_distinct(col(idCol)).as("f_df"))
    // The corpus-df pass is the ONE genuinely fact-scale tokenize left —
    // fan it to session width (ScaleOps.fanOut: no-op at scale); the
    // candidate filter stays a map-side broadcast probe before the agg.
    val dfT = ScaleOps.fanOut(df, col(idCol))
      .select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .join(broadcast(cands.select(col("term"))), Seq("term"))
      .groupBy(col("term"))
      .agg(count_distinct(col(idCol)).as("df_t"))
    val nDocs = df.agg(count(lit(1)).as("__n"))
    val ranked = cands
      .join(broadcast(dfT), Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score_micro", floor(col("f_tf").cast("double")
        * log(col("__n").cast("double") / col("df_t").cast("double"))
        * 1000000 + 0.5).cast("long"))
    val byExp = org.apache.spark.sql.expressions.Window
      .orderBy(col("score_micro").desc, col("term"))
    ranked
      .withColumn("rk", row_number().over(byExp).cast("long"))
      .where(col("rk") <= m)
      .select(col("rk"), col("term"), col("f_tf"), col("f_df"),
        col("df_t"), col("score_micro"),
        rnd(col("score_micro").cast("double") / 1000000.0).as("score"))
  }

  /** Top-k adjacent-token collocations by pointwise mutual information
    * over the bigram distribution (Church & Hanks 1990): which word
    * pairs co-occur far beyond what their marginals predict — the
    * phrase-mining / tokenizer-merge-candidate read, and the classic
    * complement to [[weightedLogOdds]] (that contrasts SOURCES, this
    * finds PHRASES). pmi(a,b) = ln(c_ab·N / (c_a·c_b)) over bigram
    * count c_ab, left margin c_a, right margin c_b, bigram total N.
    *
    * Determinism: all four counts are exact longs; the ln argument is
    * ONE ratio of two integer products and pmi_micro = floor(ln·10⁶+½)
    * is the ordering key; ties totalize by (tok_a, tok_b). The
    * min-count floor is the standard guard against hapax pairs (PMI's
    * known rare-pair bias) and is what bounds the ranked table.
    *
    * Overflow precondition (loud): c_ab·N and c_a·c_b must stay under
    * 2⁶³ — N beyond ~3·10⁹ bigram tokens needs count scaling; the
    * raise_error guard fires rather than wrapping silently.
    *
    * Scale shape: bigram generation is a map-only slice+zip+explode (no
    * per-token self-join); ONE fact-scale hash aggregate keyed (a, b);
    * both margins and the total derive from that aggregate (vocab- and
    * vocab²-bounded — never a second pass over the corpus), margins
    * broadcast back; the global top-k window runs over the min-count-
    * filtered collocation table, bounded by the phrase vocabulary, not
    * the corpus.
    *
    * @return top-k rows: (rk, tok_a, tok_b, c_ab, c_a, c_b, pmi_micro,
    *         pmi 4-dp) ordered by rank
    */
  /** Per-stratum Shannon entropy of the token distribution — the
    * diversity read next to [[weightedLogOdds]] (what DISCRIMINATES
    * sources) and `vocab_coverage` (what OVERLAPS): a source whose
    * entropy is far below ln(vocab) is dominated by few tokens
    * (templated / boilerplate content), the mixture-curation signal
    * that per-token lists bury. H = ln N − (Σ c·ln c)/N; norm_entropy
    * = H / ln V in [0, 1].
    *
    * Determinism: N, V, and every count are exact longs; each c·ln c
    * term micro-quantizes to a long BEFORE the per-stratum sum
    * (associative, layout-independent — [[graft.ops.ChangeOps]]'s
    * mixtureDrift discipline); H and norm_entropy are single fixed
    * IEEE expressions over those exact inputs, displayed 4-dp.
    * Overflow (loud bound, documented): Σ c·ln(c)·10⁶ < 2^63 holds to
    * ~2·10¹¹ tokens per stratum; shift the quantization down a digit
    * per 100× beyond.
    *
    * Scale shape: ONE fact-scale (stratum, token) hash aggregate
    * (map-side partials); everything after is vocab-bounded.
    *
    * @return per stratum: (stratum-named col, n_tokens, vocab,
    *         entropy 4-dp, norm_entropy 4-dp — null when vocab = 1)
    */
  def tokenEntropy(df: DataFrame, strataCol: String,
                   textCol: String): DataFrame = {
    import CoreOps.rnd
    val counts = df.where(col(strataCol).isNotNull)
      .select(col(strataCol).as(strataCol),
        explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .groupBy(col(strataCol), col("__tok"))
      .agg(count(lit(1)).as("__c"))
    counts
      .groupBy(col(strataCol))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(floor(col("__c").cast("double")
          * log(col("__c").cast("double")) * 1000000 + 0.5).cast("long"))
          .as("__clnc_micro"))
      .select(col(strataCol), col("n_tokens"), col("vocab"),
        rnd(log(col("n_tokens").cast("double"))
          - col("__clnc_micro").cast("double")
            / (col("n_tokens").cast("double") * 1000000.0)).as("entropy"),
        when(col("vocab") === 1L, lit(null).cast("double"))
          .otherwise(rnd(
            (log(col("n_tokens").cast("double"))
              - col("__clnc_micro").cast("double")
                / (col("n_tokens").cast("double") * 1000000.0))
              / log(col("vocab").cast("double")))).as("norm_entropy"))
  }

  /** Top-k BPE merge candidates — step 1 of byte-pair-encoding tokenizer
    * training (Sennrich, Haddow & Birch 2016): count adjacent CHARACTER
    * pairs inside words, weighted by word frequency, and rank. The
    * character-level complement to [[pmiCollocations]] (token bigrams
    * find PHRASES; char pairs find the MERGES a subword vocabulary is
    * built from), and the op a tokenizer-training pipeline runs
    * iteratively — one graded step proves the whole loop's plan shape,
    * since every round is this same aggregate over a re-segmented
    * vocabulary.
    *
    * Determinism: all counts exact longs; ties totalize by pair string.
    *
    * Scale shape: ONE fact-scale token aggregate reduces the corpus to
    * the (word, count) vocabulary — the pair explosion (length-bounded
    * per word) runs over the VOCABULARY, not the corpus, which is the
    * actual BPE-training trick at 100 TB: re-segmentation each round
    * touches the weighted vocab table only. The global top-k window
    * runs over the pair-vocabulary-bounded count table.
    *
    * @return top-k rows: (rk, pair — 2-char string, n_forms — word-
    *         position slots in the vocabulary containing it, n —
    *         frequency-weighted adjacent-occurrence count, the standard
    *         BPE candidate statistic) ordered by rank (n desc, pair)
    */
  def bpeMergePairs(df: DataFrame, textCol: String, k: Int = 30): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    val words = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("__c"))
    val pairs = words
      .select(col("__c"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_forms"), sum(col("__c")).as("n"))
    val byN = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("pair"))
    pairs
      .withColumn("rk", row_number().over(byN).cast("long"))
      .where(col("rk") <= k)
      .select(col("rk"), col("pair"), col("n_forms"), col("n"))
  }

  /** Loud precondition for the BPE tier's delimiter-wrapped symbol
    * encoding: a word containing '(' / ')' would corrupt symbol
    * boundaries (the wrapping relies on parens never occurring INSIDE a
    * symbol), and a line terminator is skipped by the `(.)` wrapping
    * regex entirely — both would silently skew pair counts and the
    * open-delimiter token count in [[bpeEncodeStats]], identically in
    * engine and oracle, so the hash grade could never catch it. Fail
    * loudly instead of fingerprinting garbage.
    */
  private def bpeSafeWord(w: Column): Column =
    when(w.rlike("[()\\n\\r\\u0085\\u2028\\u2029]"),
      raise_error(format_string(
        "graft.CorpusOps BPE: word %s contains a delimiter paren or " +
          "line terminator — the (sym) wrapping requires paren-free " +
          "single-line words; clean the corpus first", w)).cast("string"))
      .otherwise(w)

  /** Segmented weighted vocabulary for [[bpeTrainMerges]]: the ONE
    * corpus-scale aggregate of the whole training loop. Each word
    * becomes a delimiter-wrapped symbol string — "abc" → "(a)(b)(c)" —
    * so a merge is ONE string replace: `(l)(r)` → `(lr)`, greedy
    * left-to-right non-overlapping in both engines (standard `replace`
    * semantics), with the parens making cross-symbol matches impossible
    * (symbols are letter runs; [[bpeSafeWord]] enforces that parens and
    * line terminators never occur inside one — loudly, not by
    * assumption). Checkpointed: every training round re-reads THIS
    * frame's descendants, never the corpus.
    */
  private[ops] def bpeVocabSeg(df: DataFrame, textCol: String,
                               fanKey: Option[Column] = None): DataFrame = {
    // fanKey: see tokenCooccurrence — id-keyed fan-out spreads
    // duplicate-heavy corpora and skips hashing full texts per row
    val agg = ScaleOps.fanOut(df, fanKey.getOrElse(col(textCol)))
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      // guard on the aggregated vocabulary — every distinct word is
      // checked, at vocabulary scale instead of per occurrence
      .select(regexp_replace(bpeSafeWord(col("w")), "(.)", "($1)").as("seg"),
        col("c"))
      .localCheckpoint(true)
    // Size the training frame to the VOCABULARY, not to the corpus
    // aggregate's partitioning: every one of `rounds` iterations maps
    // over this frame, so carrying the corpus-shuffle partition count
    // into the loop multiplies per-round task overhead by rounds for no
    // parallelism gain (a 30k-row vocabulary does not need 32 tasks —
    // and a 10M-form one still gets what it needs from the row bound).
    // coalesce is shuffle-free; the count reads the sealed checkpoint.
    val parts = math.max(1L, math.min(
      agg.sparkSession.sparkContext.defaultParallelism.toLong,
      agg.count() / 100000L + 1L)).toInt
    val sized = agg.coalesce(parts).localCheckpoint(true)
    unpersistCheckpoint(agg)
    sized
  }

  /** Free a superseded localCheckpoint's blocks — [[Dedup
    * .unpersistCheckpoint]], the one shared LogicalRDD-walk free
    * (`Dataset.unpersist` is a CacheManager call and a NO-OP for
    * checkpointed frames; see Dedup's scaladoc). */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    Dedup.unpersistCheckpoint(df)

  /** Adjacent-symbol pair counts over a segmented vocabulary — one
    * round's candidate statistics: unwrap the delimiters, split into
    * symbols, zip-shift into adjacent pairs, ONE vocabulary-scale hash
    * aggregate. (n — frequency-weighted occurrence count, the BPE
    * statistic; n_forms — vocabulary slots containing the pair.)
    */
  private[ops] def bpeRoundPairs(vocab: DataFrame): DataFrame = {
    val syms = vocab.select(col("c"),
      split(expr("substring(seg, 2, length(seg) - 2)"), "\\)\\(").as("__s"))
      .where(size(col("__s")) >= 2)
      .select(col("c"),
        slice(col("__s"), lit(1), size(col("__s")) - 1).as("ls"),
        slice(col("__s"), lit(2), size(col("__s")) - 1).as("rs"))
    syms
      .select(col("c"), explode(arrays_zip(col("ls"), col("rs"))).as("__p"))
      .select(col("__p.ls").as("l"), col("__p.rs").as("r"), col("c"))
      .groupBy(col("l"), col("r"))
      .agg(count(lit(1)).as("n_forms"), sum(col("c")).as("n"))
  }

  /** Iterated BPE training (Sennrich, Haddow & Birch 2016) — the loop
    * [[bpeMergePairs]] proved one step of, now run to `rounds` merges:
    * each round counts adjacent symbol pairs over the weighted
    * vocabulary, takes the argmax (n desc, then (l, r) — ties
    * totalized), applies the merge to every form, and re-counts. The
    * output IS the trained merge table a subword tokenizer ships.
    *
    * Determinism: counts are exact longs; the argmax order is total;
    * the merge application is engine-identical `replace` (greedy
    * left-to-right non-overlapping — the delimiter wrapping in
    * [[bpeVocabSeg]] is what makes one string replace implement the
    * symbol-sequence rewrite EXACTLY, "aaaa" → "(aa)(aa)").
    *
    * Scale shape — the 100 TB tokenizer-training plan: the corpus
    * collapses to the (segmented form, count) vocabulary ONCE
    * (checkpointed); every round's exchange is VOCABULARY-scale (the
    * pair hash-agg), the argmax is one driver-side 1-row action (the
    * pagerank-loop discipline), the merge is a map-only string rewrite,
    * and each round's vocab re-checkpoints eagerly with the superseded
    * generation freed — plan depth and lineage stay O(1) per round.
    * Rounds that find no pair left stop early.
    *
    * @return one row per realized merge round: (round 1.., left_sym,
    *         right_sym, merged, n_forms, n) ordered by round
    */
  def bpeTrainMerges(df: DataFrame, textCol: String, rounds: Int,
                     fanKey: Option[Column] = None): DataFrame = {
    val (merges, vocab) = bpeTrainLoop(df, textCol, rounds, fanKey)
    unpersistCheckpoint(vocab)
    merges
  }

  /** The shared training loop: returns BOTH the merge table and the
    * FINAL segmented vocabulary (checkpointed — every trained merge
    * already applied to every form). The final vocab is what makes
    * [[bpeEncodeStats]]' encode pass vocabulary-scale: the per-form
    * token count is already sitting in it, no per-merge rewrite ever
    * touches the corpus. Callers that don't consume the vocab must
    * unpersist it ([[bpeTrainMerges]] does).
    */
  private def bpeTrainLoop(df: DataFrame, textCol: String, rounds: Int,
                           fanKey: Option[Column] = None)
    : (DataFrame, DataFrame) = {
    require(rounds >= 1, s"rounds=$rounds must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // Per-round checkpoints are LAZY: round N's argmax job is what
    // materializes generation N−1's rewrite (the clusterPairs
    // single-job-per-round discipline) — an eager checkpoint would run
    // a second, redundant job per merge, and at a production merge
    // count the loop's cost is pure job overhead. A generation may
    // only be freed AFTER its successor materializes (lazy lineage
    // truncates to the checkpoint; freeing the parent first would drop
    // the only copy), hence the two-generation window.
    var vocab = bpeVocabSeg(df, textCol, fanKey)
    var prev: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long, Long)]
    var exhausted = false
    for (round <- 1 to rounds if !exhausted) {
      val top = bpeRoundPairs(vocab)
        .orderBy(col("n").desc, col("l"), col("r")).limit(1).collect()
      // `vocab` is materialized now — its parent generation is free
      // (via the RDD walk: Dataset.unpersist is a no-op on checkpoints)
      if (prev != null) { unpersistCheckpoint(prev); prev = null }
      if (top.isEmpty) exhausted = true
      else {
        val row = top.head
        val (l, r) = (row.getString(0), row.getString(1))
        merges += ((round.toLong, l, r, l + r, row.getLong(2),
          row.getLong(3)))
        val next = vocab.select(
          regexp_replace(col("seg"),
            lit(java.util.regex.Pattern.quote(s"($l)($r)")),
            lit(java.util.regex.Matcher.quoteReplacement(s"(${l + r})")))
            .as("seg"),
          col("c")).localCheckpoint(false)
        prev = vocab
        vocab = next
      }
    }
    // The final generation may still be lazy — materialize it before
    // freeing its parent, so callers hand downstream plans a sealed
    // checkpoint (bpeEncodeStats' broadcast build reads it directly).
    if (prev != null) { vocab.count(); unpersistCheckpoint(prev) }
    (merges.toSeq.toDF("round", "left_sym", "right_sym", "merged",
      "n_forms", "n"), vocab)
  }

  /** Deterministic per-epoch training order — the content-addressed
    * shuffle a distributed dataloader needs: epoch e's permutation
    * orders documents by md5("e#id") (tiebreak id), so every worker on
    * every engine derives the SAME order with no RNG state, different
    * epochs decorrelate (the hash reseeds per epoch), and position is a
    * pure function of (epoch, corpus) — resumable mid-epoch by
    * position range.
    *
    * Scale shape: positions come from [[graft.ops.ScaleOps
    * .globalRunningTotal]]'s two-pass distributed prefix sum over the
    * hash order (range exchange + partition-local sorts) — NEVER a
    * single-partition row_number, which is the trap a naive
    * "row_number() over (order by hash)" shuffle falls into at corpus
    * scale. One pass per epoch; epochs union as plan branches.
    *
    * @return (epoch 0.., id, position 1..n within the epoch)
    */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int): DataFrame = {
    require(epochs >= 1, s"epochs=$epochs must be positive")
    (0 until epochs).map(epochOrder(df, idCol, _)).reduce(_ unionAll _)
  }

  /** One epoch's permutation — the shared kernel of [[epochShuffle]]
    * and [[epochShuffleResume]].
    */
  private def epochOrder(df: DataFrame, idCol: String, e: Int): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"))
      .where(col("id").isNotNull)
    val keyed = base.select(col("id"),
      md5(concat_ws("#", lit(e.toString), col("id").cast("string")))
        .as("__h"))
    graft.ops.ScaleOps.globalRunningTotal(keyed,
      Seq(col("__h"), col("id")), lit(1L))
      .select(lit(e.toLong).as("epoch"), col("id"),
        col("cum").as("position"))
  }

  /** Mid-epoch RESUME — the scaladoc claim above made an operation:
    * because position is a pure function of (epoch, corpus), a training
    * job killed at position p−1 re-derives epoch `epoch`'s permutation
    * and takes the suffix `position >= fromPosition` — no shuffle
    * state, no RNG stream to replay, and the suffix provably equals the
    * full epoch's slice (the graded oracle replays the whole epoch and
    * slices it). Cost: the same ONE prefix-sum pass as a fresh epoch
    * (the filter applies after positions are derived — resuming costs a
    * recompute of the permutation, never a re-shuffle or re-read of the
    * already-delivered batches themselves).
    *
    * @param fromPosition 1-based position to resume AT (inclusive)
    * @return (epoch, id, position >= fromPosition) of the one epoch
    */
  def epochShuffleResume(df: DataFrame, idCol: String, epoch: Int,
                         fromPosition: Long): DataFrame = {
    require(epoch >= 0, s"epoch=$epoch must be non-negative")
    require(fromPosition >= 1,
      s"fromPosition=$fromPosition must be >= 1 (positions are 1-based)")
    epochOrder(df, idCol, epoch).where(col("position") >= fromPosition)
  }

  /** Stride-scheduled mixture interleave — the step between "per-source
    * mixture weights" and "the single deterministic stream a data loader
    * actually feeds the trainer": source s with weight w emits its i-th
    * document at virtual time (2i−1)/(2w) (classic stride scheduling),
    * and the global order sorts by that clock — so while every source
    * still has supply, each prefix of the stream holds each source
    * within ONE document of its weighted share (measured exactly 1.0 on
    * the fixture; once a source exhausts, the remainder interleaves the
    * survivors on the same clocks), with no RNG anywhere. Per-source order is content-addressed
    * (md5 of the id — the [[epochShuffle]] key), so the interleave is a
    * pure function of (corpus, weights): reproducible across runs,
    * engines, and partition layouts.
    *
    * Scale shape: virtual times are exact integers ((2i−1)·(L/w) with L
    * the weights' lcm — no float clock drift at any corpus size), and
    * BOTH ranks ride [[ScaleOps.globalRunningTotal]]'s two-pass
    * range-partition prefix sum: the per-source rank comes off ONE
    * global pass ordered (source, hash, id) minus a source-bounded
    * cumulative offset (broadcast) — never a per-source window, which
    * would funnel a dominant source into one sort partition — and the
    * final position is a second pass over the integer clock.
    *
    * @param weights (stratum, weight>0); rows whose stratum has no
    *                weight are dropped (a gate upstream decides corpus
    *                membership, not the scheduler)
    * @return (position 1.., id, stratum, vt_num — the scaled integer
    *         clock the position sorts by)
    */
  def mixtureInterleave(df: DataFrame, idCol: String, strataCol: String,
                        weights: Seq[(String, Long)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"weights must be positive: $weights")
    require(weights.map(_._1).distinct.size == weights.size,
      s"duplicate stratum in $weights")
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    // multiplyExact: coprime or large weights can push the lcm past
    // Long range, and unchecked overflow would silently corrupt every
    // stride (negative clocks reorder the whole interleave) — the
    // "exact integers at any corpus size" claim holds only if overflow
    // fails loudly instead
    val lcmAll =
      try weights.map(_._2).reduce((a, b) =>
        Math.multiplyExact(a / gcd(a, b), b))
      catch { case _: ArithmeticException =>
        throw new IllegalArgumentException(
          "mixtureInterleave: the weights' lcm overflows Long — " +
            s"express the recipe in a coarser ratio: $weights")
      }
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.map { case (s, w) => (s, lcmAll / w) }
      .toDF("__s", "__stride")
    val base = df
      .select(col(idCol).cast("long").as("id"),
        col(strataCol).as("__s"),
        md5(col(idCol).cast("string")).as("__h"))
      .join(broadcast(wdf), Seq("__s"))
    // global prefix over (stratum, hash, id); per-stratum rank = that
    // prefix minus the count of all earlier strata (stratum-bounded
    // cumulative offsets, broadcast back)
    val ranked = graft.ops.ScaleOps.globalRunningTotal(base,
      Seq(col("__s"), col("__h"), col("id")), lit(1L))
    val offs = ranked.groupBy(col("__s")).agg(count(lit(1)).as("__n"))
      .withColumn("__soff", coalesce(sum(col("__n")).over(
        Window.orderBy(col("__s")).rowsBetween(Long.MinValue, -1)),
        lit(0L)))
      .select(col("__s"), col("__soff"))
    // row-level overflow guard for the clock product (2·rank − 1)·stride:
    // rank ≤ (MaxValue/stride + 1) div 2 ⟺ the odd factor fits — spelled
    // (m − 1)/2 + 1 (identical for m ≥ 1) so the guard itself cannot
    // overflow at stride = 1 where m = MaxValue — checked
    // per row IN the plan (codegen'd comparison, no extra pass) so a
    // corpus long enough to overflow its stride fails loudly instead of
    // interleaving on wrapped-negative virtual times
    val rank = col("cum") - col("__soff")
    val clocked = ranked.join(broadcast(offs), Seq("__s"))
      .select(col("id"), col("__s"),
        when(rank <= (lit(Long.MaxValue) / col("__stride") - 1L) / 2L + 1L,
          (rank * 2 - 1) * col("__stride"))
          .otherwise(raise_error(concat(
            lit("mixtureInterleave: virtual time overflows Long at rank "),
            rank.cast("string"), lit(" x stride "),
            col("__stride").cast("string"),
            lit(" — express the recipe in a coarser ratio"))))
          .as("__vt"))
    graft.ops.ScaleOps.globalRunningTotal(clocked,
      Seq(col("__vt"), col("__s")), lit(1L))
      .select(col("cum").as("position"), col("id"),
        col("__s").as(strataCol), col("__vt").as("vt_num"))
  }

  /** Curriculum ordering: a deterministic easy-first epoch — documents
    * sort by an integer difficulty LEVEL the caller grades them into
    * (0 = easiest first), with a content-addressed shuffle inside each
    * level (the [[epochShuffle]] md5 key, so level cohorts stream in a
    * reproducible but uncorrelated order). The ordered-training
    * counterpart of [[epochShuffle]]'s uniform permutation; position is
    * a pure function of (corpus, level assignment) — resumable the same
    * way [[epochShuffleResume]] is.
    *
    * Scale shape: ONE [[ScaleOps.globalRunningTotal]] prefix-sum pass
    * ordered (level, hash, id) — never a single-partition
    * "row_number over the whole corpus" window.
    *
    * @return (position 1.., id, level)
    */
  def curriculumOrder(df: DataFrame, idCol: String,
                      levelCol: String): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("id"),
      col(levelCol).cast("long").as("__lvl"),
      md5(col(idCol).cast("string")).as("__h"))
    graft.ops.ScaleOps.globalRunningTotal(base,
      Seq(col("__lvl"), col("__h"), col("id")), lit(1L))
      .select(col("cum").as("position"), col("id"),
        col("__lvl").as(levelCol))
  }

  /** Per-document n-gram UNIQUENESS — the corpus-count companion to
    * [[ngramNovelty]]'s ordered first-occurrence read: the share of a
    * document's DISTINCT word n-grams that occur in NO other document
    * (corpus count exactly 1), order-free. Low uniqueness flags
    * boilerplate/template documents that near-dup measures under
    * threshold miss; high uniqueness marks content worth its tokens.
    *
    * Scale shape: ONE fact-scale explode to distinct (doc, digest)
    * incidence rows — the gram is md5'd BEFORE the distinct, so only
    * (id, 16-byte digest) ever crosses an exchange, never gram text
    * (the [[duplicatedSpans]] discipline; the oracle groups by the gram
    * text itself, so the hash grade doubles as a collision check) — a
    * digest-keyed hash aggregate for corpus counts, one join back on
    * the digest, and a doc-keyed rollup. The incidence frame feeds both
    * the counts aggregate and the join back, so it materializes once
    * (localCheckpoint; exchange reuse does not bridge an aggregation).
    * No gram list ever collects.
    *
    * @param n gram width in tokens; documents with fewer than n tokens
    *          emit no row
    * @return per doc: (doc id, n_grams — distinct, n_unique — corpus
    *         count 1, novelty 4-dp)
    */
  def ngramUniqueness(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3): DataFrame = {
    import CoreOps.rnd
    require(n >= 1, s"n=$n must be positive")
    val toks = df.select(col(idCol), TextFunctions.tokens(col(textCol))
      .as("__toks"))
      .where(size(col("__toks")) >= n)
    val grams = toks.select(col(idCol), explode(transform(
        sequence(lit(1), size(col("__toks")) - (n - 1)),
        i => md5(array_join(slice(col("__toks"), i, lit(n)), " ")
          .cast("binary")))).as("__gh"))
      .distinct()
      .localCheckpoint(true)
    val counts = grams.groupBy(col("__gh"))
      .agg(count(lit(1)).as("__cnt"))
    grams.join(counts, Seq("__gh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        coalesce(sum(when(col("__cnt") === 1L, 1L).otherwise(0L)), lit(0L))
          .as("n_unique"))
      .select(col(idCol), col("n_grams"), col("n_unique"),
        rnd(col("n_unique").cast("double") / col("n_grams").cast("double"))
          .as("uniqueness"))
  }

  /** Apply a trained BPE merge table to the corpus and report the
    * numbers a tokenizer decision actually reads: tokens per word and
    * the chars-per-token compression ratio, per source.
    *
    * The encode is VOCABULARY-scale, not merge-chain-scale: training's
    * final segmented vocabulary ([[bpeTrainLoop]]) already carries
    * every merge applied to every DISTINCT form, so the per-form token
    * count is one expression over it — count the open delimiters — and
    * the form itself is recovered by stripping them (symbols
    * concatenate back to the original word). The corpus-scale pass is
    * then ONE map-side broadcast join of word occurrences against that
    * (form → token count) table. A 30k-merge production vocabulary
    * costs the corpus pass exactly what an 8-merge toy one does — the
    * merge count never appears in the fact-side plan (the previous
    * formulation chained one `regexp_replace` PER MERGE over every
    * occurrence, linear plan growth that would not survive codegen at
    * real merge counts).
    *
    * Scale shape at 100 TB: train small (vocabulary-scale loop, driver
    * argmax, per-round checkpoint+free), apply wide (one broadcast
    * hash join + one source-keyed hash aggregate over the corpus).
    * Words shorter than the vocabulary's 2-char floor encode as one
    * symbol — the coalesce arm of the join.
    *
    * Lifetime note: the FINAL vocabulary generation backs the returned
    * plan's broadcast side, so it stays localCheckpoint-persisted until
    * the caller's action completes and driver GC feeds the
    * ContextCleaner — one vocabulary-scale block set per call. Callers
    * running many encodes in one JVM can free it deterministically by
    * walking the result plan's LogicalRDD leaves (the
    * Dedup.unpersistCheckpoint pattern) after their action.
    *
    * @return per source: (source, n_words, n_chars, n_tokens,
    *         tokens_per_word 4-dp, chars_per_token 4-dp)
    */
  def bpeEncodeStats(df: DataFrame, sourceCol: String, textCol: String,
                     rounds: Int): DataFrame = {
    val model = bpeTrain(df, textCol, rounds)
    // This convenience never exposes the model, and the stats pass reads
    // only the vocabulary — the frozen base alphabet (checkpointed for
    // id-table consumers) frees NOW, deterministically, instead of
    // whenever the ContextCleaner's GC sweep happens to run (the
    // lifetime spec measured exactly this: one leaked alphabet-scale
    // block set per rounds-overload call until a driver GC).
    Dedup.unpersistCheckpoint(model.baseChars)
    bpeEncodeStats(df, sourceCol, textCol, model)
  }

  /** A trained BPE tokenizer: the realized merge table and the FINAL
    * segmented vocabulary (checkpointed — every merge already applied
    * to every distinct form). Train ONCE per corpus snapshot, apply to
    * any number of encode passes ([[bpeEncodeStats]], [[bpeEncodeIds]])
    * — the 100 TB contract is train-small / apply-wide, and re-training
    * per encode would repeat the loop's per-round jobs for
    * bit-identical output. Retire the model by freeing `vocab`'s
    * checkpoint blocks with [[Dedup.unpersistCheckpoint]].
    */
  /** @param baseChars the TRAINING corpus's distinct single-character
    *                   words, frozen with the model — single-char words
    *                   never enter the length≥2 vocabulary yet need ids,
    *                   and deriving them from the ENCODE batch instead
    *                   would let a new shard's novel character silently
    *                   SHIFT every later token id (ids must be a
    *                   property of the model, not of the batch; a novel
    *                   symbol at encode time raises instead)
    */
  case class BpeModel(merges: DataFrame, vocab: DataFrame,
                      baseChars: DataFrame)

  /** Run the BPE training loop and keep BOTH halves — see [[BpeModel]].
    * [[bpeTrainMerges]] is the merges-only convenience (it frees the
    * vocabulary); this is the entry point for encode consumers. Also
    * freezes the base alphabet (see [[BpeModel.baseChars]]) — one
    * alphabet-scale distinct over the training corpus, checkpointed so
    * id-table consumers never re-scan the corpus.
    */
  def bpeTrain(df: DataFrame, textCol: String, rounds: Int,
               fanKey: Option[Column] = None): BpeModel = {
    val (merges, vocab) = bpeTrainLoop(df, textCol, rounds, fanKey)
    val baseChars = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("sym"))
      .where(length(col("sym")) === 1).distinct()
      .localCheckpoint(true)
    BpeModel(merges, vocab, baseChars)
  }

  /** [[bpeEncodeStats]] against an already-trained [[BpeModel]] — the
    * apply-wide half on its own, so several encode passes (or the
    * id-sequence materialization in [[bpeEncodeIds]]) share one
    * training run. Same contract and plan shape as the rounds overload.
    */
  def bpeEncodeStats(df: DataFrame, sourceCol: String, textCol: String,
                     model: BpeModel): DataFrame = {
    import CoreOps.rnd
    val finalVocab = model.vocab
    // (form → n_tokens) off the final vocabulary: strip the delimiters
    // to recover the word, count '(' for the surviving symbol count
    val formTokens = finalVocab.select(
      translate(col("seg"), "()", "").as("w"),
      (length(col("seg")) - length(translate(col("seg"), "(", "")))
        .cast("long").as("__vt"))
    df.where(col(sourceCol).isNotNull)
      .select(col(sourceCol).as("source"),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .where(length(col("w")) >= 1)
      // the delimiter guard must cover EVERY corpus word, not only the
      // length>=2 forms that reach the vocabulary: a single-character
      // '(' would otherwise slip through the coalesce fallback as "1
      // token" while a delimiter-wrapping oracle counts its parens —
      // a silent divergence of exactly the class the guard exists to
      // surface loudly (map-side rlike, no exchange impact)
      .select(col("source"), bpeSafeWord(col("w")).as("w"))
      .join(broadcast(formTokens), Seq("w"), "left")
      .select(col("source"), length(col("w")).cast("long").as("__chars"),
        coalesce(col("__vt"), lit(1L)).as("__toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__chars")).as("n_chars"),
        sum(col("__toks")).as("n_tokens"))
      .select(col("source"), col("n_words"), col("n_chars"), col("n_tokens"),
        rnd(col("n_tokens").cast("double") / col("n_words").cast("double"))
          .as("tokens_per_word"),
        rnd(col("n_chars").cast("double") / col("n_tokens").cast("double"))
          .as("chars_per_token"))
  }

  /** Encode the corpus to token-ID SEQUENCES — the tokenize step a
    * training pipeline actually feeds downstream ([[bpeEncodeStats]]
    * reports the numbers; this materializes the ids, so
    * [[packSequences]] packs REAL sequence lengths and a dataloader
    * reads real ids, not estimates).
    *
    * Id assignment is deterministic and engine-replayable: the symbol
    * universe is every symbol surviving in the final vocabulary plus
    * every single-character corpus word (those never enter the
    * length≥2 vocabulary and encode as themselves), ordered by (first
    * merge round that produced the symbol — 0 for base symbols, so
    * un-merged symbols come first lexicographically — then the symbol
    * itself). That is the standard "base alphabet, then merges in merge
    * order" BPE id convention, with ties impossible (the universe is
    * distinct).
    *
    * Scale shape: the id table is VOCABULARY-bounded (its row_number
    * window is the [[bpeMergePairs]] top-k contract — a bounded frame,
    * never the corpus); the corpus pass is one tokenize + two broadcast
    * hash joins (form → symbol array, symbol → id) with NO per-merge
    * fact-side work; per-document assembly buffers one document's ids
    * in its aggregation group (the [[dropDuplicateChunks]] reassembly
    * contract). The single-character distinct is one keys-only
    * aggregate producing an alphabet-sized output. Words are guarded by
    * [[bpeSafeWord]] at occurrence scope, as in the stats encode.
    *
    * @return per document with ≥1 non-empty word: (id, n_tokens,
    *         token_ids — int array in document order)
    */
  def bpeEncodeIds(df: DataFrame, idCol: String, textCol: String,
                   model: BpeModel): DataFrame = {
    val formSyms = bpeFormSyms(model)
    val ids = bpeTokenIdTable(model)
    val occ = df.select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol)))
          .as(Seq("__wp", "__w0")))
      .where(length(col("__w0")) >= 1)
      .select(col(idCol), col("__wp").cast("long").as("__wp"),
        bpeSafeWord(col("__w0")).as("w"))
    val syms = occ.join(broadcast(formSyms), Seq("w"), "left")
      .select(col(idCol), col("__wp"),
        posexplode(coalesce(col("__syms"), array(col("w"))))
          .as(Seq("__sp", "sym")))
    // a symbol outside the universe (an OOV length≥2 word encoded
    // against a model trained on a DIFFERENT corpus) fails loudly — a
    // silent inner-join drop would truncate sequences undetectably
    syms.join(broadcast(ids), Seq("sym"), "left")
      .select(col(idCol), col("__wp"), col("__sp"),
        coalesce(col("token_id"), raise_error(format_string(
          "graft.CorpusOps.bpeEncodeIds: symbol %s is not in the " +
            "model's vocabulary — the encode corpus must be covered by " +
            "the training corpus's forms plus single-character words",
          col("sym"))).cast("int")).as("token_id"))
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(
          col("__wp").as("wp"), col("__sp").cast("long").as("sp"),
          col("token_id").as("tid")))),
        x => x.getField("tid")).as("token_ids"))
      .select(col(idCol), size(col("token_ids")).cast("long").as("n_tokens"),
        col("token_ids"))
  }

  /** The model's (word → surviving symbol array) table off the final
    * segmented vocabulary — shared by [[bpeEncodeIds]]' occurrence join
    * and [[bpeTokenIdTable]]'s symbol universe. Vocabulary-bounded.
    */
  private def bpeFormSyms(model: BpeModel): DataFrame =
    model.vocab.select(
      translate(col("seg"), "()", "").as("w"),
      split(expr("substring(seg, 2, length(seg) - 2)"), "\\)\\(")
        .as("__syms"))

  /** The deterministic symbol → token-id table of a [[BpeModel]] —
    * exactly the assignment [[bpeEncodeIds]] encodes with, exposed so
    * [[bpeDecode]] inverts the SAME table (and a spec can audit it).
    * Universe: every symbol surviving in the final vocabulary plus the
    * model's FROZEN base alphabet ([[BpeModel.baseChars]]); order:
    * first producing merge round (0 for base symbols), then the symbol.
    * A pure function of the MODEL — encoding new shards can never shift
    * a shipped id (a shard with an out-of-universe symbol raises in
    * [[bpeEncodeIds]] instead). Vocabulary-bounded — the row_number
    * window runs over the bounded symbol frame, never the corpus.
    */
  def bpeTokenIdTable(model: BpeModel): DataFrame = {
    val vocabSyms = bpeFormSyms(model)
      .select(explode(col("__syms")).as("sym")).distinct()
    val charSyms = model.baseChars.select(col("sym"))
    val mergeRounds = model.merges
      .select(col("merged").as("sym"), col("round"))
      .groupBy(col("sym")).agg(min(col("round")).as("__mrnd"))
    val byRoundThenSym = org.apache.spark.sql.expressions.Window
      .orderBy(coalesce(col("__mrnd"), lit(0L)), col("sym"))
    vocabSyms.unionByName(charSyms).distinct()
      .join(mergeRounds, Seq("sym"), "left")
      .withColumn("token_id", row_number().over(byRoundThenSym).cast("int"))
      .select(col("sym"), col("token_id"))
  }

  /** Decode [[bpeEncodeIds]] output back to text — the lossless-tokenizer
    * roundtrip check (decode ∘ encode = id) a shipped tokenizer owes its
    * consumers: token ids join back to symbols through the SAME id table
    * the encode assigned from, and per-document concatenation in stream
    * order rebuilds the document. Word boundaries are not represented in
    * the flat id stream, so the reconstruction target is the document's
    * text with the split delimiter removed (tokens split on ' ':
    * `translate(text, " ", "")`).
    *
    * Scale shape: one explode of the id arrays, one broadcast join to the
    * vocabulary-bounded id table (an unknown id fails loudly — a silent
    * drop would hide exactly the corruption this check exists to catch),
    * one per-document assembly whose in-group sort is bounded by document
    * length (the [[bpeEncodeIds]] reassembly contract).
    *
    * @param encoded [[bpeEncodeIds]] output: (idCol, n_tokens, token_ids)
    * @param ids     [[bpeTokenIdTable]] of the same model
    * @return (idCol, decoded) — whitespace-free reconstructed text
    */
  def bpeDecode(encoded: DataFrame, idCol: String,
                ids: DataFrame): DataFrame =
    encoded
      .select(col(idCol), posexplode(col("token_ids"))
        .as(Seq("__p", "token_id")))
      .join(broadcast(ids), Seq("token_id"), "left")
      .select(col(idCol), col("__p"),
        coalesce(col("sym"), raise_error(format_string(
          "graft.CorpusOps.bpeDecode: token id %s is not in the model's" +
            " id table — the sequence was encoded with a different" +
            " (corpus, model)", col("token_id").cast("string"))))
          .as("sym"))
      .groupBy(col(idCol))
      .agg(concat_ws("", transform(array_sort(collect_list(struct(
          col("__p").as("p"), col("sym").as("sym")))),
        x => x.getField("sym"))).as("decoded"))

  /** Per-shard packing-efficiency report over a [[packSequences]] layout
    * — the dataset-card row for the pack step: how many budget-sized
    * training sequences the shard fills, how much of the final sequence
    * is padding (the only waste this layout produces — documents stream
    * contiguously and split across pack boundaries), and how many
    * documents span a boundary (the attention-masking consumers care
    * about). A packing regression surfaces as a readable metric here,
    * not only as a hash change in the full layout.
    *
    * Pure aggregation of the layout frame (one hash exchange on the
    * shard key, shard-bounded output):
    *  - n_packs = ⌈n_tokens / budget⌉ — exact for the contiguous stream;
    *  - tail_waste = n_packs·budget − n_tokens (padding in the last pack);
    *  - fill_ratio = n_tokens / (n_packs·budget), 4 dp;
    *  - n_spanning = documents with pack_offset + n_tokens > budget.
    */
  def packReport(packed: DataFrame, budget: Int): DataFrame = {
    import CoreOps.rnd
    require(budget > 0, s"budget=$budget must be positive")
    packed.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(when(col("pack_offset") + col("n_tokens") > budget, 1L)
          .otherwise(0L)).as("n_spanning"))
      .withColumn("n_packs",
        CoreOps.integralDiv(col("n_tokens") + (budget - 1), budget.toLong))
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("n_packs"),
        col("n_spanning"),
        (col("n_packs") * budget - col("n_tokens")).as("tail_waste"),
        rnd(col("n_tokens").cast("double")
          / (col("n_packs") * budget).cast("double")).as("fill_ratio"))
  }

  def pmiCollocations(df: DataFrame, textCol: String,
                      minCount: Long = 5L, k: Int = 30): DataFrame = {
    import CoreOps.rnd
    require(minCount >= 1, s"minCount=$minCount must be positive")
    require(k >= 1, s"k=$k must be positive")
    val toks = df
      .select(TextFunctions.tokens(col(textCol)).as("__t"))
      .where(size(col("__t")) >= 2)
      .select(
        slice(col("__t"), lit(1), size(col("__t")) - 1).as("l"),
        slice(col("__t"), lit(2), size(col("__t")) - 1).as("r"))
    val pairs = toks
      .select(explode(arrays_zip(col("l"), col("r"))).as("__p"))
      .select(col("__p.l").as("tok_a"), col("__p.r").as("tok_b"))
    // Materialize once: the bigram table feeds the total, both margins,
    // and the final attach — four consumers of the one fact-scale agg.
    val cAB = pairs.groupBy(col("tok_a"), col("tok_b"))
      .agg(count(lit(1)).as("c_ab"))
      .localCheckpoint(true)
    val tot = cAB.agg(sum(col("c_ab")).as("__n"))
    val left = cAB.groupBy(col("tok_a")).agg(sum(col("c_ab")).as("c_a"))
    val right = cAB.groupBy(col("tok_b")).agg(sum(col("c_ab")).as("c_b"))
    val guarded = cAB.where(col("c_ab") >= minCount)
      .join(broadcast(left), Seq("tok_a"))
      .join(broadcast(right), Seq("tok_b"))
      .crossJoin(broadcast(tot))
      .withColumn("__n", when(
        col("c_ab") > CoreOps.integralDiv(lit(Long.MaxValue), col("__n")) ||
          col("c_a") > CoreOps.integralDiv(lit(Long.MaxValue), col("c_b")),
        raise_error(format_string(
          "pmiCollocations: count product overflows 2^63 (c_ab=%d, N=%d," +
            " c_a=%d, c_b=%d) — scale counts down", col("c_ab"), col("__n"),
          col("c_a"), col("c_b")))).otherwise(col("__n")))
      .withColumn("pmi_micro", floor(
        log((col("c_ab") * col("__n")).cast("double")
          / (col("c_a") * col("c_b")).cast("double")) * 1000000 + 0.5)
        .cast("long"))
    val byPmi = org.apache.spark.sql.expressions.Window
      .orderBy(col("pmi_micro").desc, col("tok_a"), col("tok_b"))
    guarded
      .withColumn("rk", row_number().over(byPmi).cast("long"))
      .where(col("rk") <= k)
      .select(col("rk"), col("tok_a"), col("tok_b"), col("c_ab"),
        col("c_a"), col("c_b"), col("pmi_micro"),
        rnd(col("pmi_micro").cast("double") / 1000000.0).as("pmi"))
  }

  /** Per-token weighted log-odds with an informative Dirichlet prior —
    * Monroe, Colaresi & Quinn 2008 ("Fightin' Words"): which tokens
    * DISCRIMINATE source A from source B, with the full-corpus
    * background as the prior so rare tokens don't dominate the way raw
    * log-odds (or PMI, or tf-idf deltas) let them. δ_w = ln(odds of w
    * in A, prior-smoothed) − ln(odds in B); z_w = δ_w/√(1/(y_aw+α_w) +
    * 1/(y_bw+α_w)). The domain-signature read a mixture-curation
    * pipeline runs before re-weighting sources.
    *
    * Determinism: the prior α_w = bg_w·priorNum/priorDen is carried as
    * an exact RATIONAL — every ln argument is a ratio of two integer
    * products (y·pd + bg·pn over the matching total), so both lns and
    * the z denominator are fixed IEEE expressions over exact longs;
    * δ and z display 4-dp. Overflow: totals·priorDen < 2^63 — token
    * totals beyond ~9·10¹⁴ need a smaller priorDen (documented, the
    * histogram-family convention).
    *
    * Scale shape: the fact-scale work is ONE (source, token) hash
    * aggregate with map-side combine; everything downstream (background
    * merge, A/B join, the ln/z projection) runs on vocab-bounded
    * frames. Output is minCount-gated.
    *
    * @return one row per token with y_a + y_b ≥ minCount: (token, y_a,
    *         y_b, bg, delta 4-dp, z 4-dp), z > 0 ⇔ A-flavored
    */
  def logOddsTokens(df: DataFrame, strataCol: String, textCol: String,
                    srcA: String, srcB: String, priorNum: Long = 1L,
                    priorDen: Long = 100L, minCount: Long = 5L): DataFrame = {
    import CoreOps.rnd
    require(priorNum > 0 && priorDen > 0,
      s"prior $priorNum/$priorDen must be a positive rational")
    require(srcA != srcB, s"srcA and srcB must differ, got '$srcA' twice")
    val counts = df.where(col(strataCol).isNotNull)
      .select(col(strataCol).as("__s"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("__s"), col("token"))
      .agg(count(lit(1)).as("__c"))
    val bg = counts.groupBy(col("token"))
      .agg(sum(col("__c")).as("bg"),
        coalesce(sum(when(col("__s") === srcA, col("__c"))), lit(0L))
          .as("y_a"),
        coalesce(sum(when(col("__s") === srcB, col("__c"))), lit(0L))
          .as("y_b"))
    val tot = bg.agg(sum(col("bg")).as("__nbg"), sum(col("y_a")).as("__na"),
      sum(col("y_b")).as("__nb"))
    val pn = lit(priorNum); val pd = lit(priorDen)
    val numA = col("y_a") * pd + col("bg") * pn
    val numB = col("y_b") * pd + col("bg") * pn
    val denA = col("__na") * pd + col("__nbg") * pn - numA
    val denB = col("__nb") * pd + col("__nbg") * pn - numB
    val deltaRaw =
      log(numA.cast("double") / denA.cast("double")) -
        log(numB.cast("double") / denB.cast("double"))
    bg.where(col("y_a") + col("y_b") >= minCount)
      .crossJoin(broadcast(tot))
      .select(col("token"), col("y_a"), col("y_b"), col("bg"),
        rnd(deltaRaw).as("delta"),
        rnd(deltaRaw / sqrt(pd.cast("double") / numA.cast("double")
          + pd.cast("double") / numB.cast("double"))).as("z"))
  }

  /** Micro-unit natural log: ln quantized to 1e-6 longs, the library's
    * engine-portable fixed point for additive log-space scores (same
    * idiom as [[charTrigramNll]] / [[pmiCollocations]] — each TERM is
    * quantized, so the downstream sum is exact integer arithmetic and
    * partition-layout-independent).
    */
  private def qlog(c: Column): Column =
    floor(log(c) * 1000000 + 0.5).cast("long")

  /** Multinomial Naive Bayes text classifier, trained and applied in one
    * plan — the model-based filtering stage of a pretraining pipeline
    * (the fastText-classifier shape behind GPT-3/LLaMA "quality
    * classifier" and CCNet language-ID gates), distilled to its
    * closed-form core so the whole thing is a deterministic dataflow:
    * no SGD, no epochs, just counting.
    *
    * Model: P(c) = n_docs_c / N; P(w|c) = (count(w,c)+1) / (tokens_c+V)
    * (Laplace smoothing over the TRAIN vocabulary V). A token never seen
    * in train gets the same smoothed floor 1/(tokens_c+V) — the
    * coalesce default below covers both "unseen anywhere" and "unseen in
    * this class" uniformly. Prediction is argmax over classes of
    * log P(c) + Σ_w n_w·log P(w|c), ties broken by ascending label.
    *
    * Determinism: every log term is quantized to micro-unit longs BEFORE
    * the per-document sum ([[qlog]]), so class scores are exact integers
    * and the argmax (min of (−score, label) structs) is total-ordered —
    * no float-accumulation-order hazard between engines or partition
    * layouts.
    *
    * Scale shape: the model is vocab×|C| bounded regardless of corpus
    * size, so it BROADCASTS. The test side collapses to per-(doc, token)
    * COUNTS in its first and only fact-scale exchange, fans out by the
    * |C|-row class frame (a bounded broadcast nested loop), probes the
    * broadcast model map-side, and reduces per (doc, class) then per doc.
    * At 100 TB: one shuffle of token counts, everything else map-side.
    *
    * @return one row per test document: (id, label, pred label, is_correct
    *         0/1, best score in micro-log units)
    */
  def nbClassify(train: DataFrame, test: DataFrame, idCol: String,
                 textCol: String, labelCol: String,
                 hashBuckets: Option[Int] = None): DataFrame = {
    // The 100 TB posture: a raw web-scale vocabulary is NOT broadcastable
    // (billions of distinct tokens), so production callers hash features
    // into a bounded bucket space first — the fastText trick, and the
    // same md5 bucket [[dsirSelect]] uses — making the model size a
    // CHOICE (buckets × |C|) instead of a corpus property. The graded
    // query runs exact tokens (the fixture vocabulary is bounded and the
    // oracle replays it); the hashed path is spec-pinned deterministic
    // with measured agreement against the exact model.
    require(hashBuckets.forall(_ >= 2),
      s"hashBuckets=$hashBuckets must be >= 2")
    def feat(w: Column): Column = hashBuckets match {
      case Some(b) =>
        (conv(substring(md5(w), 1, 8), 16, 10).cast("long") % b)
          .cast("string")
      case None => w
    }
    val toks = train.where(col(labelCol).isNotNull)
      .select(col(labelCol).as("__l"),
        explode(TextFunctions.tokens(col(textCol))).as("__w0"))
      .select(col("__l"), feat(col("__w0")).as("__w"))
    // vocab×|C| bounded; materialized ONCE (rule (g)) — it feeds the
    // class totals, the vocabulary size, and the likelihood table, and
    // each re-evaluation would re-scan the whole train corpus
    val cntWC = toks.groupBy(col("__l"), col("__w"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val totC = cntWC.groupBy(col("__l")).agg(sum(col("__c")).as("__tot"))
    val vocab = cntWC.select(col("__w")).distinct()
      .agg(count(lit(1)).as("__v"))
    val priors = train.where(col(labelCol).isNotNull)
      .groupBy(col(labelCol).as("__l")).agg(count(lit(1)).as("__nd"))
      .localCheckpoint(true)
    val nDocs = priors.agg(sum(col("__nd")).as("__n"))
    // |C|-row class frame: prior, unseen-token floor, smoothing
    // denominator; checkpointed because it feeds both the likelihood
    // table and the per-document fan-out
    val classes = priors.join(totC, "__l")
      .crossJoin(nDocs).crossJoin(vocab)
      .select(col("__l"),
        qlog(col("__nd").cast("double") / col("__n").cast("double"))
          .as("__lprior"),
        qlog(lit(1.0) / (col("__tot") + col("__v")).cast("double"))
          .as("__lp0"),
        (col("__tot") + col("__v")).as("__den"))
      .localCheckpoint(true)
    val model = cntWC.join(classes.select("__l", "__den"), "__l")
      .select(col("__l"), col("__w"),
        qlog((col("__c") + 1).cast("double") / col("__den").cast("double"))
          .as("__lp"))
    // fact side: per-(doc, token) counts FIRST — the only full-scale
    // exchange — then a bounded |C|-way fan-out against broadcast frames
    val docToks = test
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol)))
        .as("__w0"))
      .select(col(idCol), feat(col("__w0")).as("__w"))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__c"))
    val scored = docToks
      .crossJoin(broadcast(classes.select("__l", "__lprior", "__lp0")))
      .join(broadcast(model), Seq("__l", "__w"), "left")
      .withColumn("__t", coalesce(col("__lp"), col("__lp0")) * col("__c"))
      .groupBy(col(idCol), col("__l"))
      .agg((min(col("__lprior")) + sum(col("__t"))).as("__score"))
    val best = scored.groupBy(col(idCol))
      .agg(min(struct((-col("__score")).as("__ns"), col("__l").as("__pl")))
        .as("__best"))
      .select(col(idCol), col("__best.__pl").as("__pred"),
        (-col("__best.__ns")).as("score_micro"))
    test.select(col(idCol), col(labelCol))
      .join(best, Seq(idCol))
      .select(col(idCol), col(labelCol),
        col("__pred").as(s"pred_$labelCol"),
        when(col(labelCol) === col("__pred"), 1L).otherwise(0L)
          .as("is_correct"),
        col("score_micro"))
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): score each raw-corpus document by how much more
    * likely its hashed n-gram bag is under a TARGET distribution than
    * under the raw distribution, and keep the top-k. The
    * domain-adaptation selection stage of a pretraining pipeline: the
    * target slice is small curated text (here a held-out corpus slice),
    * the raw side is the crawl.
    *
    * Features are word unigrams hashed into `buckets` md5 buckets (the
    * same engine-portable hex-prefix hash as [[splitBucket]]), so both
    * distributions are `buckets`-bounded whatever the corpus size.
    * Per-bucket weight w(b) = qlog((ct_target(b)+1)/(T_target+B)) −
    * qlog((ct_raw(b)+1)/(T_raw+B)) (Laplace-smoothed), a micro-unit
    * long; a document's importance is the count-weighted sum over its
    * token buckets — exact integer arithmetic end to end, ties broken
    * by ascending id.
    *
    * Scale shape: the two distribution fits are fact-scale hash
    * aggregates that REDUCE to ≤`buckets` rows; the weight table
    * broadcasts; the scoring side collapses to per-(doc, bucket) counts
    * in one exchange and probes the broadcast map-side. Top-k is
    * Spark's distributed TakeOrdered, never a single-partition sort.
    *
    * @return k rows: (rank, id, n_tokens, weight_micro, avg_logratio
    *         4-dp) ordered by rank
    */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, k: Int, buckets: Int = 4096): DataFrame = {
    import CoreOps.rnd
    require(k >= 1 && buckets >= 2, s"k=$k, buckets=$buckets out of range")
    def bucketOf(w: Column): Column =
      conv(substring(md5(w), 1, 8), 16, 10).cast("long") % buckets
    // per-(doc, bucket) counts materialize ONCE and serve both the raw
    // distribution fit and the scoring probe — one scan of the raw text
    // instead of two, the compact-incidence checkpoint idiom of
    // [[exactSubstrDedup]]
    val docBuckets = raw
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol)))
        .as("__w"))
      .select(col(idCol), bucketOf(col("__w")).as("__b"))
      .groupBy(col(idCol), col("__b")).agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val rawDist = docBuckets.groupBy(col("__b"))
      .agg(sum(col("__c")).as("__ct"))
      .localCheckpoint(true)
    val tgtDist = target
      .select(explode(TextFunctions.tokens(col(textCol))).as("__w"))
      .select(bucketOf(col("__w")).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__ct"))
      .localCheckpoint(true)
    val tTot = tgtDist.agg(sum(col("__ct")).as("__tt"))
    val rTot = rawDist.agg(sum(col("__ct")).as("__tr"))
    // every bucket that can appear in scoring appears in rawDist (the
    // scoring corpus IS the raw corpus), so a left join from the raw
    // side covers the domain; missing target mass smooths to +1
    val weights = rawDist
      .join(tgtDist.withColumnRenamed("__ct", "__ctt"), Seq("__b"), "left")
      .crossJoin(tTot).crossJoin(rTot)
      .select(col("__b"),
        (qlog((coalesce(col("__ctt"), lit(0L)) + 1).cast("double")
            / (col("__tt") + buckets).cast("double")) -
          qlog((col("__ct") + 1).cast("double")
            / (col("__tr") + buckets).cast("double"))).as("__wmic"))
    docBuckets.join(broadcast(weights), "__b")
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"),
        sum(col("__wmic") * col("__c")).as("weight_micro"))
      .orderBy(col("weight_micro").desc, col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(Window.orderBy(
        col("weight_micro").desc, col(idCol))).cast("long"))
      .select(col("rank"), col(idCol), col("n_tokens"),
        col("weight_micro"),
        rnd(col("weight_micro").cast("double") / 1000000.0
          / col("n_tokens")).as("avg_logratio"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    * document with the corpus char-trigram LM ([[charTrigramNll]]), then
    * split each language's documents into head/middle/tail tertiles by
    * score — the standard quality stratification a crawl pipeline runs
    * before choosing what to keep (head = most in-distribution).
    *
    * Tertile boundaries use the library's ⌈q·n⌉ order-statistic
    * convention on the 4-dp-quantized score: t1 = the ⌈n/3⌉-th smallest
    * score, t2 = the ⌈2n/3⌉-th; a document lands in head if score ≤ t1,
    * middle if ≤ t2, else tail. Value thresholds (not rank slices) keep
    * the assignment a pure function of (lang, score) — deterministic
    * under ties across engines.
    *
    * Scale shape: thresholds come from a per-(lang, score) HISTOGRAM —
    * the same skew-immune path as the weekly quantile tier: cumulative
    * counts run over histogram rows (bounded by the 4-dp score domain),
    * never over raw documents, so a dominant language never funnels its
    * documents into one window partition. The per-lang threshold table
    * broadcasts back onto the scored stream map-side.
    *
    * @return one row per (lang, bucket): (lang, bucket, n_docs, id_sum,
    *         avg score 4-dp) ordered by lang, bucket
    */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
                        langCol: String,
                        precomputedNll: Option[DataFrame] = None)
      : DataFrame = {
    import CoreOps.rnd
    // compact (id, lang, quantized-score) rows materialize ONCE — the
    // trigram LM fit + scoring pass feeds both the threshold histogram
    // and the bucket assignment (rule (g)); callers that already hold
    // the scores (the memoized graded family) pass them in instead of
    // re-fitting the LM
    val scored = precomputedNll
      .getOrElse(charTrigramNll(df, idCol, textCol))
      .join(df.select(col(idCol), col(langCol)), Seq(idCol))
      .select(col(idCol), col(langCol),
        floor(col("avg_nll") * 10000 + 0.5).cast("long").as("__q"))
      .localCheckpoint(true)
    val hist = scored.groupBy(col(langCol), col("__q"))
      .agg(count(lit(1)).as("__c"))
    val wCum = Window.partitionBy(col(langCol)).orderBy(col("__q"))
    val withCum = hist
      .withColumn("__cum", sum(col("__c")).over(wCum))
      .withColumn("__n", sum(col("__c")).over(
        Window.partitionBy(col(langCol))))
    val thresholds = withCum
      .groupBy(col(langCol))
      .agg(
        min(when(col("__cum") >= ceil(col("__n") / 3.0), col("__q")))
          .as("__t1"),
        min(when(col("__cum") >= ceil(col("__n") * 2.0 / 3.0), col("__q")))
          .as("__t2"))
    scored.join(broadcast(thresholds), Seq(langCol))
      .withColumn("bucket",
        when(col("__q") <= col("__t1"), "head")
          .when(col("__q") <= col("__t2"), "middle")
          .otherwise("tail"))
      .groupBy(col(langCol), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(idCol)).as("id_sum"),
        rnd(sum(col("__q")).cast("double") / 10000.0 / count(lit(1)))
          .as("avg_score"))
  }

  /** Distinct-n diversity (Li et al. 2016's distinct-n, corpus-level):
    * per language and n ∈ {2, 3}, the ratio of DISTINCT word n-grams to
    * total n-gram occurrences — the templated-content / mode-collapse
    * detector a corpus QA report carries alongside the repetition
    * signals tier: a language whose distinct-2 ratio collapses is being
    * flooded by boilerplate.
    *
    * Scale shape: ONE pass over the text (both n values generated from
    * one tokens array, exploded once), grams md5-DIGESTED before the
    * only fact-scale exchange (the repo's digest discipline — gram text
    * never ships), then per-(lang, n, digest) counts reduce to the
    * per-(lang, n) totals: sum(c) = occurrences, count(*) = distinct.
    *
    * @return one row per (lang, n): (lang, n, total_grams,
    *         distinct_grams, distinct_ratio 4-dp) ordered by lang, n
    */
  def distinctNgramRatio(df: DataFrame, textCol: String,
                         langCol: String): DataFrame = {
    import CoreOps.rnd
    // sequence(1, k) counts DOWN for k <= 0 (the [[ngramSet]] guard), so
    // generate ascending over the token positions and filter to valid
    // starts — an empty filter result is a typed empty array, keeping
    // both n values in one explode over one text scan
    def gramStructs(n: Int): Column = expr(
      s"""transform(
         |  filter(sequence(1, size(__toks)),
         |    i -> i <= size(__toks) - ${n - 1}),
         |  i -> struct(cast($n as bigint) as n,
         |    md5(cast(array_join(slice(__toks, i, $n), ' ') as binary))
         |      as gh))""".stripMargin)
    val grams = df
      .select(col(langCol), TextFunctions.tokens(col(textCol))
        .as("__toks"))
      .select(col(langCol),
        explode(concat(gramStructs(2), gramStructs(3))).as("__g"))
      .select(col(langCol), col("__g.n").as("n"), col("__g.gh").as("__gh"))
    grams.groupBy(col(langCol), col("n"), col("__gh"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(langCol), col("n"))
      .agg(sum(col("__c")).as("total_grams"),
        count(lit(1)).as("distinct_grams"))
      .withColumn("distinct_ratio",
        rnd(col("distinct_grams").cast("double") / col("total_grams")))
  }
}
