package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join with prefix filtering (the PPJoin family)
  * — every document pair whose token-set Jaccard clears a threshold, with
  * no recall loss. The exact complement to [[Dedup.minhashPairs]]: MinHash
  * trades recall for speed; this trades a candidate-join against the
  * prefix-token index for a guarantee.
  *
  * Prefix-filter theorem (rare-first consistent order): if `J(x,y) >= t`
  * then `|x∩y| >= ceil(t·|x|)`, and a set with `c` shared tokens must
  * expose one inside its first `|x| − c + 1` tokens — at most `c − 1`
  * shared tokens fit in the length-`(c−1)` suffix. The SMALLEST shared
  * token (global order) therefore sits inside BOTH prefixes of length
  * `|s| − ceil(t·|s|) + 1`, so joining on prefix tokens alone loses no
  * qualifying pair. Ordering tokens rarest-first makes those prefix tokens
  * the most selective ones — the stopword that would fan out quadratically
  * is never a join key, which is exactly the failure mode of the naive
  * token join this replaces.
  *
  * Scale shape: token exchanges only — dictionary counts (tok), prefix
  * ranking (doc), candidate join (block + prefix tok), verification via
  * two (id)-keyed joins that attach each side's token ARRAY and intersect
  * map-side (`array_intersect` is a per-row hash probe; no pair×token
  * shuffle, which on a template-heavy corpus costs more than every other
  * stage combined). No global sort, no unpartitioned window, no cartesian.
  * The token order is the value pair (tf, tok) — comparing pairs needs no
  * dictionary-wide ordinal assignment (that would be a single-task global
  * window at vocabulary scale).
  *
  * `blocking` columns (e.g. language) AND-in as equality keys on the
  * candidate join: pairs must agree on them, spurious cross-block token
  * collisions never become candidates, and the quadratic regime shrinks to
  * the largest block.
  */
object SetSimJoin {

  /** (id_a, id_b, inter, union_sz, jaccard) for every unordered pair
    * agreeing on `blocking` with exact token-set Jaccard >= `threshold`.
    * Tokens are the distinct whitespace unigrams of `textCol`
    * ([[Dedup.shingles]]); the threshold comparison runs on the UNROUNDED
    * quotient (jaccard is reported 4 dp).
    */
  def jaccardJoinExact(df: DataFrame, idCol: String, textCol: String,
                       threshold: Double,
                       blocking: Seq[String] = Nil): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold=$threshold must be in (0, 1]")
    // base is consumed THREE times (token explode + both verification
    // attaches) and prefix TWICE (both sides of the candidate self-join).
    // Left lazy, every consumer re-instantiates the whole subtree —
    // re-tokenizing the corpus three times and re-running the dictionary
    // aggregation + rank window twice (exchange reuse does not
    // canonicalize the aliased sides together; same lesson as the
    // link_predict adjacency). Two eager localCheckpoints pin each to ONE
    // computation; both frames are corpus-bounded (one row per doc / per
    // prefix token), and at 100 TB they are exactly the artifacts a
    // production run would persist between stages.
    // fanOut BEFORE the select: the tokenize pays during this checkpoint's
    // materialization, at the scan's width (ScaleOps.fanOut — no-op at
    // scale / on derived inputs)
    val base = ScaleOps.fanOut(df, col(idCol))
      .select(col(idCol).as("id") +:
        Dedup.shingles(textCol, 1).as("arr") +:
        blocking.map(col): _*)
      .withColumn("sz", size(col("arr")).cast("long"))
      .localCheckpoint(true)
    val toks = base.select(col("id") +: explode(col("arr")).as("tok") +:
      col("sz") +: blocking.map(col): _*)
    // Dictionary counts, materialized ONCE and (when vocabulary-bounded)
    // BROADCAST into the rank attach: the lazy spelling shuffled the
    // token-INSTANCE stream by token for the attach and then again by
    // document for the rank window — two fact-scale exchanges to serve a
    // vocabulary-scale table. Broadcast, the attach is map-side and the
    // window inherits the base checkpoint's id-partitioning, so the
    // prefix build's only exchange is the dictionary aggregation itself.
    // Guarded by an exact count off the checkpoint (the bloom-sizing
    // eager-contract class): past the cap the shuffled attach returns —
    // the giant-vocabulary path.
    val dict = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dictSide =
      if (dict.count() <= 2000000L) broadcast(dict) else dict

    // Rare-first rank WITHIN each document: order by the global (tf, tok)
    // pair — a per-doc window over already-joined rows, never a global
    // ordinal over the vocabulary.
    val prefix = toks.join(dictSide, "tok")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("tf").asc, col("tok").asc)))
      .where(col("rk") <=
        col("sz") - ceil(lit(threshold) * col("sz")).cast("long") + lit(1L))
      .drop("tf")
      .localCheckpoint(true)
    Dedup.unpersistCheckpoint(dict)

    // Candidates: pairs in the same block sharing a prefix token,
    // pre-pruned by the size filter (|y| must land in [t·|x|, |x|/t] or
    // Jaccard cannot reach t).
    val blockEq = blocking
      .map(b => col(s"x.$b") === col(s"y.$b"))
      .reduceOption(_ && _).getOrElse(lit(true))
    // Positional filter (the PPJoin refinement over the plain prefix
    // filter): J >= t needs overlap α = ceil(t·(|x|+|y|)/(1+t)), and a
    // candidate row matching at prefix ranks (rk_x, rk_y) — both counted
    // in the SAME global (tf, tok) order — bounds the overlap reachable
    // through that token by 1 + min(|x|−rk_x, |y|−rk_y). Lossless: the
    // order is consistent across documents, so a qualifying pair's
    // SMALLEST shared token has no shared token before it on either side,
    // its row's bound is a true overlap upper bound, and α ≤ overlap
    // keeps it. Rows for later shared tokens may be pruned — they were
    // duplicates the `distinct()` would have folded anyway. The 1e-9
    // epsilon keeps float roundup in t·(…)/(1+t) from inflating α by one
    // and over-pruning an exactly-at-threshold pair.
    val alpha = ceil(lit(threshold) * (col("x.sz") + col("y.sz")) /
      lit(1.0 + threshold) - lit(1e-9)).cast("long")
    val candidates = prefix.as("x")
      .join(prefix.as("y"),
        col("x.tok") === col("y.tok") && col("x.id") < col("y.id") &&
          blockEq &&
          col("y.sz").cast("double") >= lit(threshold) * col("x.sz") &&
          col("y.sz").cast("double") * lit(threshold) <= col("x.sz") &&
          least(col("x.sz") - col("x.rk"), col("y.sz") - col("y.rk")) +
            lit(1L) >= alpha)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()

    // Exact verification, map-side: attach both token arrays by id and
    // intersect per row; |x∪y| = |x| + |y| − |x∩y| over exact longs.
    // (r15 measurement, kept so the next optimizer doesn't re-dig: on
    // the graded dup-heavy corpus this stage verifies ~466 k candidate
    // pairs at sf0.1 — ~100× the surviving pairs, genuine near-misses
    // the prefix+size+positional filters cannot cut at t=0.95 — and the
    // per-pair exact array_intersect IS the query's dominant cost.
    // Checkpointing the candidate list to steer the build side was
    // measured 0.4 s SLOWER; the verify joins below already resolve to
    // broadcast hash joins.)
    val verified = candidates
      .join(base.select(col("id").as("id_a"), col("arr").as("__aa"),
        col("sz").as("__sa")), "id_a")
      .join(base.select(col("id").as("id_b"), col("arr").as("__ab"),
        col("sz").as("__sb")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("__aa"), col("__ab"))).cast("long"))
      .withColumn("union_sz", col("__sa") + col("__sb") - col("inter"))

    val j = col("inter").cast("double") / col("union_sz").cast("double")
    verified
      .where(j >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"), col("union_sz"),
        CoreOps.rnd(j).as("jaccard"))
  }
}
