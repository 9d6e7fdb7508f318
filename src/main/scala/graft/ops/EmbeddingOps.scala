package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-column governance for training-data pipelines (north-star
  * extension tier): L2 normalization, symmetric int8 quantization with a
  * reconstruction-error contract, and per-label corpus statistics.
  *
  * Everything here is a pure per-row array expression (map-only — no
  * shuffle, no UDF, stays inside whole-stage codegen via the higher-order
  * array functions) except the stats rollup, which is one hash-aggregate.
  *
  * Cross-engine determinism: every scalar reduction over the vector is a
  * SEQUENTIAL left fold (`aggregate(arr, 0.0, (acc, x) -> acc + ...)`),
  * which DuckDB replays exactly with `list_reduce` — element order is the
  * parquet list order in both engines, so the double-precision sums are
  * bit-identical, unlike any partition-parallel float aggregation. Row-level
  * norms destined for cross-row aggregation are quantized to integer
  * micro-units first (same rationale as [[CoreOps.moneyCents]]: long sums
  * are associative and engine-independent; double sums are not even
  * plan-shape-independent).
  *
  * Zero-dim vectors: every fold here returns its 0.0 seed on an empty
  * array (norm 0, zero-length normalized/quantized output, null scale and
  * min/max — never a crash), and the graded oracles seed their
  * `list_reduce` replays (`list_prepend(0.0, ...)`) to match — DuckDB's
  * unseeded `list_reduce` errors on an empty list, which would abort the
  * oracle instead of grading the row.
  */
object EmbeddingOps {

  /** Expression-level let-binding: evaluate `bound` ONCE per row and feed
    * the computed value to `body` as a lambda variable. Without it, a
    * scalar like the quantization scale referenced inside a per-element
    * `transform` lambda re-evaluates per ELEMENT — O(dim²) interpreted work
    * per row (measured: embed_quantize 2.3 s at sf0.1, ~30 ms let-bound).
    * A hoisted projection column cannot do this job: CollapseProject
    * re-inlines it (the same lesson as [[Dedup.minhashSignatureComposed]],
    * which pioneered this single-element-array shape).
    */
  private def bindOnce(bound: Column)(body: Column => Column): Column =
    transform(array(bound), body).getItem(0)

  /** Sum of f(x) over the vector as a sequential left fold in double
    * precision. DuckDB replay: `list_reduce(list_transform(v, f), (a,b) -> a+b)`.
    */
  private def foldSum(vec: Column, f: Column => Column): Column =
    aggregate(vec, lit(0.0), (acc, x) => acc + f(x.cast("double")))

  /** L2 norm computed in double (float elements widen losslessly). */
  def l2Norm(vec: Column): Column = sqrt(foldSum(vec, x => x * x))

  /** The vector scaled to unit L2 norm; an all-zero vector stays zero
    * (rather than dividing by zero into NaNs).
    */
  def l2Normalize(vec: Column): Column =
    bindOnce(l2Norm(vec)) { n =>
      when(n === 0.0, transform(vec, _ => lit(0.0)))
        .otherwise(transform(vec, x => x.cast("double") / n))
    }

  /** Symmetric per-vector int8 quantization scale: maxabs/127, the standard
    * absmax scheme (zero maps to zero; the extreme element maps to ±127).
    */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / lit(127.0)

  /** The quantized int8 codes. Rounding is `floor(x/scale + 0.5)` — written
    * out explicitly (not `round`) so Spark and DuckDB pin the identical
    * half-up semantics — then clamped to [-127, 127]. A zero-scale (all-zero)
    * vector quantizes to zeros.
    */
  def quantizeInt8(vec: Column): Column =
    bindOnce(int8Scale(vec)) { s =>
      when(s === 0.0, transform(vec, _ => lit(0L)))
        .otherwise(transform(vec, x =>
          greatest(lit(-127L), least(lit(127L),
            floor(x.cast("double") / s + lit(0.5)).cast("long")))))
    }

  /** Worst absolute reconstruction error `max |q*scale - x|` of the
    * quantized vector. By construction it is bounded by scale/2 (clamping
    * only ever tightens the extreme element), which callers turn into an
    * oracle-gated contract.
    */
  def dequantMaxError(vec: Column, quant: Column): Column =
    bindOnce(int8Scale(vec)) { s =>
      array_max(zip_with(quant, vec,
        (q, x) => abs(q.cast("double") * s - x.cast("double"))))
    }

  /** Per-row norm in integer micro-units for exact cross-row aggregation. */
  def normMicro(vec: Column): Column =
    floor(l2Norm(vec) * lit(1e6) + lit(0.5)).cast("long")

  /** Corpus-level PER-DIMENSION (min, max) codebook — the production
    * scalar-quantization (SQ8) posture, complementing [[quantizeInt8]]'s
    * per-vector absmax: one (min, max) pair per dimension over the WHOLE
    * corpus, so every vector shares the same 2×d-value codebook and
    * quantized vectors stay mutually comparable (distances on codes
    * approximate distances on floats — the property a per-vector scale
    * destroys, and the reason serving stacks quantize per dimension).
    *
    * Scale shape: posexplode multiplies rows ×d, but min/max partial-agg
    * map-side, so the exchange carries at most (#partitions × d) scalar
    * rows into a d-row result; no corpus row ever crosses an exchange.
    * min/max of exactly-widened floats involve no arithmetic, so the
    * codebook is bit-reproducible on any engine.
    */
  def dimCodebook(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("pos", "__x")))
      .groupBy(col("pos"))
      .agg(min(col("__x").cast("double")).as("mn"),
        max(col("__x").cast("double")).as("mx"))

  /** The codebook as ONE broadcastable row of pos-ordered arrays
    * (`__mns`, `__scs`) with sc_i = (mx_i − mn_i)/255 — the deploy
    * artifact a serving tier pins beside the embedder version. The
    * collect_list is d-bounded; array_sort on (pos, …) structs restores
    * dimension order deterministically.
    */
  def dimCodebookRow(df: DataFrame, vecCol: String): DataFrame =
    dimCodebook(df, vecCol)
      .agg(array_sort(collect_list(struct(col("pos"), col("mn"), col("mx"))))
        .as("__cb"))
      .select(
        transform(col("__cb"), c => c.getField("mn")).as("__mns"),
        transform(col("__cb"), c => (c.getField("mx") - c.getField("mn"))
          / 255.0).as("__scs"))

  /** Per-dimension affine uint8 codes against a pos-ordered codebook:
    * q_i = floor((x_i − mn_i)/sc_i + 0.5) clamped to [0, 255]; a constant
    * dimension (sc_i = 0) codes to 0 and reconstructs mn_i exactly.
    * Rounding is written out (not `round`) so Spark and DuckDB pin the
    * identical half-up semantics; every step is a single IEEE double op
    * on exactly-widened floats, so codes are bit-reproducible.
    */
  def quantizeDimsCodes(vec: Column, mns: Column, scs: Column): Column =
    transform(sequence(lit(0), size(vec) - 1), i => {
      val x = element_at(vec, i + 1).cast("double")
      val mn = element_at(mns, i + 1)
      val sc = element_at(scs, i + 1)
      when(sc === 0.0, lit(0L)).otherwise(
        greatest(lit(0L), least(lit(255L),
          floor((x - mn) / sc + lit(0.5)).cast("long"))))
    })

  /** Reconstruction contract for [[quantizeDimsCodes]]: every dimension's
    * |q_i·sc_i + mn_i − x_i| is within sc_i/2 (+ eps for the float
    * widening) — rounding can never miss by more than half a step.
    */
  def dimDequantErrOk(vec: Column, mns: Column, scs: Column): Column =
    forall(sequence(lit(0), size(vec) - 1), i => {
      val x = element_at(vec, i + 1).cast("double")
      val mn = element_at(mns, i + 1)
      val sc = element_at(scs, i + 1)
      val qi = when(sc === 0.0, lit(0L)).otherwise(
        greatest(lit(0L), least(lit(255L),
          floor((x - mn) / sc + lit(0.5)).cast("long"))))
      abs(qi.cast("double") * sc + mn - x) <= sc / lit(2.0) + lit(1e-9)
    })

  /** The graded per-vector SQ8 readout: the corpus codebook re-attaches
    * as a BROADCAST single row (the only product of the corpus exchange),
    * and each vector reports its code sum, position-weighted code
    * checksum (pins every code to its dimension), code range, and the
    * half-step reconstruction bound.
    */
  def quantizeDimsReport(df: DataFrame, idCol: String,
                         vecCol: String): DataFrame = {
    val cb = dimCodebookRow(df, vecCol)
    val q = quantizeDimsCodes(col(vecCol), col("__mns"), col("__scs"))
    df.crossJoin(broadcast(cb))
      .select(col(idCol),
        aggregate(q, lit(0L), (a, x) => a + x).as("q_sum"),
        aggregate(zip_with(q,
            sequence(lit(1L), size(col(vecCol)).cast("long")),
            (qi, i) => qi * i),
          lit(0L), (a, x) => a + x).as("q_dot"),
        array_min(q).as("q_min"), array_max(q).as("q_max"),
        dimDequantErrOk(col(vecCol), col("__mns"), col("__scs"))
          .as("err_ok"))
  }

  /** Exact top-k serving in SQ8 code space — the readout that justifies
    * [[quantizeDimsReport]]: neighbors ranked by INTEGER squared L2 over
    * the shared-codebook codes (no float in the ranking key, so the
    * ranking is bit-reproducible on any engine), with the float-space
    * exact top-k recomputed beside it and the per-query overlap graded
    * as recall@k. Unlike the LSH/IVF tiers' recall FLOORS, every ranked
    * row here hash-matches the oracle: the code distance is integer and
    * the float tie key is micro-quantized before ranking.
    *
    * Scale shape: the corpus encodes map-side against the broadcast
    * 1-row codebook; queries broadcast against it once per ranking pass,
    * and each pass collapses through WindowGroupLimit to |Q|·k rows
    * before any exchange. The |Q|×|C| pair frame is deliberately NOT
    * checkpointed — two cheap broadcast re-scans beat materializing it —
    * and the recall join runs on the two k-bounded top-k tables. The
    * float-truth pass is the AUDIT half: a production server runs only
    * the code-space pass.
    */
  def knnSq8Report(queries: DataFrame, corpus: DataFrame, idCol: String,
                   vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    val cb = dimCodebookRow(corpus, vecCol)
    def coded(d: DataFrame, id: String, q: String, v: String) =
      d.crossJoin(broadcast(cb)).select(col(idCol).as(id),
        quantizeDimsCodes(col(vecCol), col("__mns"), col("__scs")).as(q),
        col(vecCol).as(v))
    val qs = coded(queries, "qid", "qq", "qv")
    // fanOut: the broadcast cross join + per-pair code/float distances
    // below run at the corpus scan's width (ScaleOps.fanOut)
    val cs = coded(ScaleOps.fanOut(corpus, col(idCol)), "cid", "cq", "cv")
    val pairs = cs.crossJoin(broadcast(qs)).where(col("cid") =!= col("qid"))
      .select(col("qid"), col("cid"),
        aggregate(zip_with(col("qq"), col("cq"),
            (a, b) => (a - b) * (a - b)),
          lit(0L), (s, x) => s + x).as("d2"),
        floor(aggregate(zip_with(col("qv"), col("cv"),
            (a, b) => (a.cast("double") - b.cast("double"))
              * (a.cast("double") - b.cast("double"))),
          lit(0.0), (s, x) => s + x) * 1e6 + lit(0.5))
          .cast("long").as("fq2"))
    val w1 = Window.partitionBy(col("qid")).orderBy(col("d2"), col("cid"))
    val w2 = Window.partitionBy(col("qid")).orderBy(col("fq2"), col("cid"))
    // k-bounded after the group limit: safe to materialize for the two
    // downstream consumers (the readout and the recall join)
    val top = pairs.withColumn("rnk", row_number().over(w1).cast("long"))
      .where(col("rnk") <= k).select("qid", "rnk", "cid", "d2")
      .localCheckpoint(true)
    val truth = pairs.withColumn("rnk", row_number().over(w2))
      .where(col("rnk") <= k).select(col("qid"), col("cid"))
    val hits = top.select("qid", "cid")
      .join(truth, Seq("qid", "cid"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("__m"))
    val rec = top.select("qid").distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        CoreOps.rnd(coalesce(col("__m"), lit(0L)).cast("double") / k)
          .as("recall_k"))
    top.join(rec, Seq("qid"))
      .select(col("qid"), col("rnk"), col("cid"), col("d2"),
        col("recall_k"))
  }

  /** Fixed-iteration Lloyd k-means over an embedding column, EXACTLY
    * reproducible across engines and partitionings — the semantic
    * clustering step of a curation pipeline (mixture balancing, cluster
    * sampling, SemDeDup's within-cluster pass), graded by per-row hash
    * equality rather than the recall floors the MLlib-backed IVF codebook
    * ([[graft.functions.Similarity.trainCodebook]]) settles for.
    *
    * Determinism, piece by piece:
    *   - vectors land on the integer MICRO-UNIT grid first
    *     (`floor(x·10⁶ + 0.5)` per element — [[CoreOps.moneyCents]]'s
    *     discipline), so every distance is an exact long;
    *   - init is data-deterministic: the vectors of the `k` smallest ids,
    *     cluster index in id order (no RNG, no partition order);
    *   - assignment = argmin of squared distance with ties to the
    *     smallest cluster index — the lexicographic (dist, cl) order,
    *     fused into the codegen'd [[graft.expressions.NearestCentroid]]
    *     kernels (one k·dim long loop per row);
    *   - the centroid update is `sum / count` in LONGS: the sum is
    *     associative (any partitioning), and long division truncates
    *     toward zero identically in Spark and DuckDB (both verified —
    *     this is NOT floor division; -7/2 = -3 in both engines).
    *
    * Scale shape: each iteration is one map-only assignment pass over the
    * rows (the centroid table rides as a k×dim literal — k-means state is
    * optimizer-visible, never a shuffle side) plus one (cluster, dim)-keyed
    * hash aggregation with k·dim output groups; the k·dim centroid matrix
    * collects to the driver between iterations (bounded, the
    * [[graft.functions.Similarity.trainCodebook]] codebook contract). The
    * quantized input is localCheckpointed once and re-read per iteration
    * instead of re-deriving the scan `iterations`+1 times.
    *
    * A cluster that loses every member simply stops existing (the
    * aggregation emits no row for it) — deterministically in both engines.
    * Rows are assumed same-dimension as the centroids; ragged inputs
    * should be screened with [[embeddingStats]] first.
    *
    * @return (vec_id, cluster, dist) — final-iteration assignment and its
    *         exact squared distance in micro-unit² longs.
    */
  // Assignment through the fused codegen'd kernels
  // ([[graft.expressions.NearestCentroid]]): one k·dim long loop per
  // row instead of k interpreted HOF folds — bit-identical to the
  // composed array_min-over-(dist, cl)-structs form (ExtensionOpsSpec
  // pins the equality), and the assignment pass is the fact-scale cost
  // of k-means at 100 TB.
  private def assignIdCol(cents: Seq[(Long, Seq[Long])]): Column =
    graft.expressions.NearestCentroid.nearestCentroidId(col("qv"),
      typedLit(cents.map(_._2)), typedLit(cents.map(_._1)))

  private def assignDistCol(cents: Seq[(Long, Seq[Long])]): Column =
    graft.expressions.NearestCentroid.nearestCentroidDist(col("qv"),
      typedLit(cents.map(_._2)))

  /** The shared Lloyd loop behind [[kmeansAssignments]] and
    * [[pqAdcTopK]]: quantize to the micro-unit grid, init from the k
    * smallest ids, run `iterations − 1` centroid updates. Returns the
    * checkpointed quantized frame (vec_id, qv) and the FINAL centroid
    * state — exposing the codebook is what the PQ serving path needs
    * and the assignment-only API hides.
    */
  private[ops] def lloydState(df: DataFrame, idCol: String, vecCol: String,
                              k: Int, iterations: Int)
      : (DataFrame, Seq[(Long, Seq[Long])]) = {
    // Deliberately NOT fanned out (ScaleOps.checkpointFanOut): the Lloyd
    // loop is the tiny-iterative-stage pattern — `iterations` × (assign +
    // agg + collect) jobs over a narrow frame, where extra width is pure
    // task-launch overhead (measured: a 32-wide q took pq_recall 1.9 s →
    // 11.5 s through pqCodes' m independent loops).
    val q = df.select(col(idCol).as("vec_id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))
          .as("qv"))
      .localCheckpoint(true)
    (q, lloydQuantized(q, k, iterations))
  }

  /** The Lloyd loop over an ALREADY-quantized (vec_id, qv) frame — split
    * from [[lloydState]] so [[ivfadcTopK]] can train sub-quantizers on
    * integer RESIDUAL slices without a second ×1e6 quantization pass.
    * The frame is re-scanned once per iteration; callers pass a
    * checkpointed frame (or a narrow projection of one).
    */
  private[ops] def lloydQuantized(q: DataFrame, k: Int,
                                  iterations: Int): Seq[(Long, Seq[Long])] = {
    require(k >= 1, s"k=$k must be positive")
    require(iterations >= 1, s"iterations=$iterations must be positive")
    var centroids: Seq[(Long, Seq[Long])] =
      q.orderBy(col("vec_id")).limit(k).collect()
        .zipWithIndex.map { case (r, i) => (i.toLong, r.getSeq[Long](1)) }
        .toSeq
    for (_ <- 1 until iterations) {
      val assigned = q.select(col("qv"), assignIdCol(centroids).as("cl"))
      centroids = assigned
        .select(col("cl"), posexplode(col("qv")).as(Seq("i", "e")))
        .groupBy(col("cl"), col("i"))
        // `div`, not `/`: Spark's `/` is double division; `div` is the
        // integral truncating division DuckDB's `//` mirrors exactly
        .agg(expr("sum(e) div count(1)").as("c"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .groupBy(_._1).toSeq
        .map { case (cl, dims) =>
          (cl, dims.sortBy(_._2).map(_._3).toSeq) }
        .sortBy(_._1)
    }
    centroids
  }

  def kmeansAssignments(df: DataFrame, idCol: String, vecCol: String,
                        k: Int, iterations: Int): DataFrame = {
    val (q, centroids) = lloydState(df, idCol, vecCol, k, iterations)
    q.select(col("vec_id"), assignIdCol(centroids).as("cluster"),
      assignDistCol(centroids).as("dist"))
  }

  /** Per-cluster prototype selection over a [[kmeansAssignments]] result:
    * the `m` members closest to their centroid, rank 1 = most prototypical
    * (the SSL-prototypes / cluster-curation step: keep the examples that
    * DEFINE each semantic cluster, or invert the rank to drop them
    * SemDeDup-style). Ties break on the smaller id — (dist, vec_id) is a
    * total order because dist is an exact long, so the selection is as
    * deterministic as the assignment it composes.
    *
    * One (cluster)-keyed exchange; the rank-≤-m predicate pushes into
    * WindowGroupLimit, so each partition retains m rows during the sort
    * instead of buffering the cluster.
    */
  def clusterPrototypes(assignments: DataFrame, m: Int): DataFrame = {
    require(m >= 1, s"m=$m must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster"))
      .orderBy(col("dist").asc, col("vec_id").asc)
    assignments
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= m)
      .select(col("cluster"), col("rank"), col("vec_id"), col("dist"))
  }

  /** Per-label corpus statistics: count, dimension bounds (a ragged corpus
    * surfaces as min_dim != max_dim), and norm spread. The mean norm is
    * aggregated over micro-unit longs (associative → deterministic under any
    * partitioning); min/max are order-independent already.
    */
  def embeddingStats(df: DataFrame, labelCol: String,
                     vecCol: String): DataFrame = {
    import CoreOps.rnd
    df.select(col(labelCol).as("label"),
        size(col(vecCol)).cast("long").as("dim"),
        normMicro(col(vecCol)).as("norm_u"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vecs"),
        min("dim").as("min_dim"), max("dim").as("max_dim"),
        rnd(min(col("norm_u")).cast("double") / 1e6).as("norm_min"),
        rnd(max(col("norm_u")).cast("double") / 1e6).as("norm_max"),
        rnd(sum(col("norm_u")).cast("double") / count(lit(1)) / 1e6)
          .as("norm_avg"))
  }

  /** Distributed top principal direction — power iteration on the exact
    * Gram matrix: the cluster's job is the ONE fact-scale pass that
    * builds G = Σ x·xᵀ ([[covarianceMatrix]]'s exact long `sxy`, here
    * uncentered second moments — the PCA convention for embedding
    * corpora, which arrive near-centered); every iteration after that is
    * a matvec on the d²-bounded table. This is how PCA actually
    * decomposes at 100 TB: rows are seen once, the solve never touches
    * them again.
    *
    * The iteration is QUANTIZED so it replays bit-exactly on any engine
    * (the [[kmeansAssignments]]/pagerank determinism recipe applied to
    * linear algebra): v lives in 1e5-unit longs, the matvec y = G·v is
    * an exact long sum, normalization down-shifts y by 1e10 (truncation
    * toward zero — SQL `//`) so the squared norm stays in long range,
    * and the renormalized component is one fixed IEEE expression
    * (`ys / √s2 · 1e5`, floor+0.5) over exact longs — IEEE sqrt is
    * correctly rounded, so engines agree to the bit. The returned
    * `lambda` is the Rayleigh-style estimate ‖G·v‖/‖v‖ rescaled to raw
    * component units (the 1e8 divisor undoes the 4-dp input
    * quantization's squaring).
    *
    * Sign is the iteration's own (flip-invariant problem); callers
    * wanting a canonical sign can flip on the first nonzero component.
    * Overflow bounds (loud, documented): |G|·d·1e5 < 2^63 — with
    * unit-ish 4-dp-quantized components that is rows·1e8·d·1e5 < 2^63,
    * ~1.4e6 rows at d=64; beyond that shift the component quantization
    * down (G shrinks quadratically with it).
    *
    * @return one row per dimension: (i, v — 1e5-unit component of the
    *         top eigenvector estimate, lambda — 4-dp eigenvalue estimate
    *         in raw units, identical on every row)
    */
  def topEigenvector(df: DataFrame, vecCol: String,
                     iters: Int = 6): DataFrame = {
    val tri = covarianceMatrix(df, vecCol)
      .select(col("i"), col("j"), col("sxy"))
    val g = tri.unionByName(tri.where(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("sxy")))
      .select(col("i"), col("j"), col("sxy").as("s"))
    powerIterate(g, iters, shift = 10000000000L, lambdaUnit = 1.0E8)
  }

  /** The quantized power-iteration core: `iters` steps of v ← G·v /
    * ‖G·v‖ over a SYMMETRIC matrix given as (i, j, s) rows — BOTH
    * triangles, any key type, exact long entries. Every step is a join +
    * sum on the bounded matrix table; nothing here ever touches fact
    * rows (building G is the caller's one fact-scale pass).
    *
    * Engine-portable by the same discipline as the k-means/pagerank
    * tier: v lives in 1e5-unit longs; the matvec is an exact long sum;
    * normalization first integer-divides y by `shift` (truncation toward
    * zero — SQL `//`) so the squared norm stays in long range, then
    * renormalizes with one fixed IEEE expression (IEEE sqrt is correctly
    * rounded, so engines agree bit-for-bit). `shift` is the caller's
    * magnitude calibration: pick it so max|y| / shift lands near 1e8 —
    * small enough that Σ(y/shift)² < 2^63, large enough to keep
    * precision (y ≤ d·max|s|·1e5 bounds it a priori).
    *
    * For a nonnegative matrix and the all-positive init used here, every
    * iterate is nonnegative (Perron-Frobenius) — the co-occurrence
    * caller's spec asserts exactly that. Convergence is the usual
    * (λ₂/λ₁)^iters; a near-degenerate spectrum (isotropic noise) needs
    * unboundedly many steps — measure the gap before trusting few-step
    * output. `lambda` is ‖G·v‖/‖v‖ after the last step, divided by
    * `lambdaUnit` (callers undo input quantization — e.g. 1e8 for 4-dp
    * quantized components), 4-dp rounded; identical on every output row.
    *
    * @return one row per matrix key: (i, v — 1e5-unit component, lambda)
    */
  def powerIterate(g0: DataFrame, iters: Int, shift: Long,
                   lambdaUnit: Double = 1.0): DataFrame = {
    require(iters >= 1, s"iters=$iters must be positive")
    require(shift >= 1L, s"shift=$shift must be positive")
    val g = g0.select(col("i"), col("j"), col("s")).localCheckpoint(true)
    def matvec(v: DataFrame): DataFrame =
      g.join(v.select(col("i").as("j"), col("v")), Seq("j"))
        .groupBy(col("i")).agg(sum(col("s") * col("v")).as("y"))
    def shifted(y: DataFrame): DataFrame =
      y.select(col("i"), CoreOps.integralDiv(col("y"), shift).as("ys"))
    var v = g.select(col("i")).distinct()
      .select(col("i"), lit(100000L).as("v")).localCheckpoint(true)
    for (_ <- 1 to iters) {
      val ys = shifted(matvec(v))
      val s2 = ys.agg(coalesce(sum(col("ys") * col("ys")), lit(0L)).as("s2"))
      v = ys.crossJoin(broadcast(s2))
        .select(col("i"),
          when(col("s2") === 0L, lit(0L)).otherwise(
            floor(col("ys").cast("double") / sqrt(col("s2").cast("double"))
              * lit(100000.0) + lit(0.5)).cast("long")).as("v"))
        .localCheckpoint(true)
    }
    val ysF = shifted(matvec(v))
    val s2y = ysF.agg(coalesce(sum(col("ys") * col("ys")), lit(0L)).as("s2y"))
    val s2v = v.agg(coalesce(sum(col("v") * col("v")), lit(0L)).as("s2v"))
    v.crossJoin(broadcast(s2y)).crossJoin(broadcast(s2v))
      .select(col("i"), col("v"),
        when(col("s2v") === 0L, lit(null).cast("double")).otherwise(
          CoreOps.rnd(sqrt(col("s2y").cast("double")) * lit(shift.toDouble) /
            sqrt(col("s2v").cast("double")) / lit(lambdaUnit))).as("lambda"))
  }

  /** Exact upper-triangular covariance matrix of the embedding corpus —
    * the PCA / whitening / feature-correlation prerequisite: per
    * dimension pair (i ≤ j), the exact long power sums (n, Σxᵢxⱼ, Σxᵢ,
    * Σxⱼ) over 4-dp-quantized components, plus the derived covariance
    * (one fixed IEEE expression over the exact sums, so it is
    * bit-reproducible across partitionings and engines — the same
    * contract as [[StatOps.bivariateStats]], lifted from one column
    * pair to all d(d+1)/2 of them). A d×d solve (eigen/Cholesky) then
    * runs driver-side on this bounded table — the part that needed the
    * cluster is exactly these sums.
    *
    * Scale shape: the per-row pair stream (d(d+1)/2 generated values per
    * row) flows straight into a hash aggregate keyed on (i, j) — map-side
    * partials reduce every partition to at most d(d+1)/2 rows before the
    * ONLY exchange, so shuffle volume is the d²-bounded matrix × partition
    * count, independent of row count. Precondition (documented, loud):
    * |Σxᵢxⱼ| < 2^63 — with 4-dp quantization of unit-normalized
    * components that holds to ~9·10¹⁰ rows; shift the quantization down
    * a digit per 100× beyond that.
    */
  def covarianceMatrix(df: DataFrame, vecCol: String): DataFrame = {
    import CoreOps.rnd
    val q = transform(col(vecCol),
      x => floor(x.cast("double") * lit(10000.0) + lit(0.5)).cast("long"))
    val pairs = ScaleOps.fanOut(df.where(col(vecCol).isNotNull), col(vecCol))
      .select(q.as("v"))
      .select(col("v"), posexplode(col("v")).as(Seq("i", "vi")))
      .select(col("i"), col("vi"),
        posexplode(expr("slice(v, i + 1, size(v) - i)")).as(Seq("p", "vj")))
      .select(col("i").cast("long").as("i"),
        (col("i") + col("p")).cast("long").as("j"),
        col("vi"), col("vj"))
    pairs.groupBy("i", "j")
      .agg(count(lit(1)).as("n"),
        sum(col("vi") * col("vj")).as("sxy"),
        sum(col("vi")).as("sx"), sum(col("vj")).as("sy"))
      .withColumn("cov",
        rnd(((col("sxy").cast("double") / col("n").cast("double")) -
          ((col("sx").cast("double") / col("n").cast("double")) *
            (col("sy").cast("double") / col("n").cast("double")))) /
          lit(1.0E8)))
  }

  /** Product-quantization codes (Jégou, Douze & Schmid 2011): split each
    * d-dim vector into `m` contiguous subspaces and run the SAME
    * deterministic Lloyd loop as [[kmeansAssignments]] independently per
    * subspace — each vector compresses to m small codes (m·log₂k bits vs
    * d floats, the memory step that makes billion-vector ANN serving
    * possible; asymmetric distance then sums per-subspace lookup
    * tables). Every piece inherits kmeansAssignments' exactness (micro-
    * unit grid, smallest-ids init, argmin ties to the smaller code,
    * truncating integer centroid division), so the full code matrix is
    * hash-gradeable — slice-then-quantize equals quantize-then-slice
    * because the grid is elementwise.
    *
    * Scale shape: m independent assignment passes, each map-only over
    * the rows with its k×(d/m) codebook as a plan literal; per-subspace
    * codebook state is k·d/m longs on the driver (the Lloyd contract);
    * the union is a plan-level concatenation, no shuffle.
    *
    * @param dim full vector dimension (must divide by m, loudly)
    * @return (vec_id, subspace 0..m-1, code, dist — exact squared
    *         micro-unit² distance to the winning codeword)
    */
  def pqCodes(df: DataFrame, idCol: String, vecCol: String, dim: Int,
              m: Int, k: Int, iterations: Int): DataFrame = {
    require(m >= 1, s"m=$m must be positive")
    require(dim >= m && dim % m == 0,
      s"dim=$dim must be a positive multiple of m=$m")
    val sub = dim / m
    (0 until m).map { j =>
      kmeansAssignments(
        df.select(col(idCol), slice(col(vecCol), j * sub + 1, sub)
          .as(vecCol)),
        idCol, vecCol, k, iterations)
        .select(col("vec_id"), lit(j.toLong).as("subspace"),
          col("cluster").as("code"), col("dist"))
    }.reduce(_ unionAll _)
  }

  /** Deterministic sparse random projection (Achlioptas 2003 signs;
    * Johnson–Lindenstrauss lineage): project each d-dim vector to
    * `outDim` components, component k = Σ_d qv_d·s(k,d) with
    * s(k,d) ∈ {−1,+1} derived from md5("k#d") — the dimensionality-
    * reduction step before LSH/clustering when d is too wide, seeded by
    * CONTENT so both engines derive the identical sign matrix (the
    * [[graft.ops.CorpusOps.splitBucket]] discipline, lifted to a
    * matrix). No 1/√K scaling: components stay exact micro-unit longs;
    * distances scale uniformly, which is all the downstream users
    * (bucketing, top-k) observe.
    *
    * Scale shape: the outDim×d sign matrix is derived on the driver
    * (bounded) and rides as a plan literal into a map-only projection —
    * zero exchanges; the output is `outDim` exploded rows per vector so
    * the grade covers the full matrix.
    *
    * @return (vec_id, k 0..outDim-1, comp — exact long Σ qv_d·s(k,d))
    */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
                       dim: Int, outDim: Int): DataFrame = {
    require(dim >= 1, s"dim=$dim must be positive")
    require(outDim >= 1, s"outDim=$outDim must be positive")
    // md5("k#d") first hex digit's low bit — trivially replayable in SQL
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(k: Int, d: Int): Long = {
      val h = md.digest(s"$k#$d".getBytes("UTF-8"))
      if (((h(0) >> 4) & 1) == 1) 1L else -1L
    }
    val signs: Seq[Seq[Long]] =
      (0 until outDim).map(k => (0 until dim).map(d => sign(k, d)))
    val q = df.select(col(idCol).as("vec_id"),
      transform(col(vecCol),
        x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))
        .as("qv"))
    val comps = (0 until outDim).map { k =>
      struct(lit(k.toLong).as("k"),
        aggregate(zip_with(col("qv"), typedLit(signs(k)),
          (a, b) => a * b), lit(0L), (acc, x) => acc + x).as("comp"))
    }
    q.select(col("vec_id"), explode(array(comps: _*)).as("__p"))
      .select(col("vec_id"), col("__p.k").as("k"), col("__p.comp").as("comp"))
  }

  /** PQ asymmetric-distance top-k search (Jégou et al. 2011 §III-B —
    * "ADC"): the serving step [[pqCodes]]' compression exists for.
    * Per query, the exact distance to every CODEWORD goes into an
    * m×k lookup table; a candidate's approximate distance is then just
    * the SUM of m table lookups keyed by its codes — no vector math per
    * candidate, which is the entire point at billions of vectors.
    *
    * Determinism: codes and codebooks are [[lloydState]]'s (micro-unit
    * grid, smallest-ids init, truncating centroid division); each LUT
    * entry is an exact long Σ(qᵥ−cᵥ)²; the per-candidate ADC distance
    * is an exact long sum of m entries; the top-k rank totalizes by
    * (adc_dist, id).
    *
    * Scale shape: the per-subspace assignment is map-only with the
    * codebook as a plan literal; the LUT is |queries|·m·k rows built on
    * the DRIVER from codebook state (bounded by construction) and
    * broadcast; candidate scoring is ONE broadcast-join + (query,
    * candidate) hash aggregate over the code table; rank<=k pushes into
    * WindowGroupLimit.
    *
    * @param queryIds ids of the query vectors (resolved from `df`;
    *                 absent ids contribute no rows)
    * @return (qid, rank 1..topK, vec_id, adc_dist) per query — the
    *         query's own row ranks too (rank 1, distance = its own
    *         quantization residual), the honest ANN-serving readout
    */
  def pqAdcTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                m: Int, k: Int, iterations: Int, queryIds: Seq[Long],
                topK: Int): DataFrame = {
    require(m >= 1, s"m=$m must be positive")
    require(dim >= m && dim % m == 0,
      s"dim=$dim must be a positive multiple of m=$m")
    require(queryIds.nonEmpty, "pqAdcTopK needs at least one query id")
    require(topK >= 1, s"topK=$topK must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val sub = dim / m
    val perSub = (0 until m).map { j =>
      val (q, cents) = lloydState(
        df.select(col(idCol), slice(col(vecCol), j * sub + 1, sub)
          .as(vecCol)),
        idCol, vecCol, k, iterations)
      val codes = q.select(col("vec_id"), lit(j.toLong).as("subspace"),
        assignIdCol(cents).as("code"))
      val qvecs = q.where(col("vec_id").isin(queryIds: _*)).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1)))
      val lut = for ((qid, qv) <- qvecs.toSeq; (cl, cv) <- cents) yield
        (qid, j.toLong, cl,
          qv.zip(cv).map { case (a, b) => val d = a - b; d * d }.sum)
      (codes, lut)
    }
    val codes = perSub.map(_._1).reduce(_ unionAll _)
    val lut = perSub.flatMap(_._2).toDF("qid", "subspace", "code", "pd")
    val byDist = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adc_dist"), col("vec_id"))
    codes.join(broadcast(lut), Seq("subspace", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("pd")).as("adc_dist"), count(lit(1)).as("__m"))
      .where(col("__m") === m.toLong)
      .withColumn("rank", row_number().over(byDist).cast("long"))
      .where(col("rank") <= topK)
      .select(col("qid"), col("rank"), col("vec_id"), col("adc_dist"))
  }

  /** Recall@k of [[pqAdcTopK]]'s approximate ranking against the EXACT
    * L2 top-k on the same micro-unit grid — the "is the compression any
    * good" number a PQ index ships with (Jégou et al. report exactly
    * this curve). Both rankings are fully deterministic here, so recall
    * is an exact fraction the oracle reproduces digit-for-digit — a
    * strictly stronger statement than the sampled recall floors real
    * ANN benchmarks settle for.
    *
    * Scale shape: the ADC leg is [[pqAdcTopK]]'s; the exact leg
    * broadcasts the (bounded) query vectors and scores candidates
    * map-side with one zip_with/aggregate per pair, rank<=k via
    * WindowGroupLimit; the overlap join is k-bounded per query.
    *
    * The quality claim is stated IN the output: `recall_ok` gates each
    * query's recall against `floor` — a quantizer regression below the
    * floor flips the boolean and fails the hash compare even before a
    * reader looks at the fractions.
    *
    * @param floor minimum acceptable recall; rides as the recall_ok gate
    * @return per query: (qid, n_overlap, recall 4-dp, recall_ok)
    */
  def pqRecallAtK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                  m: Int, k: Int, iterations: Int, queryIds: Seq[Long],
                  topK: Int, floor: Double = 0.0): DataFrame = {
    import CoreOps.rnd
    val adc = pqAdcTopK(df, idCol, vecCol, dim, m, k, iterations,
      queryIds, topK).select(col("qid"), col("vec_id"))
    val exact = exactL2TopK(df, idCol, vecCol, queryIds, topK)
    adc.join(exact, Seq("qid", "vec_id"))
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_overlap"))
      .select(col("qid"), col("n_overlap"),
        rnd(col("n_overlap").cast("double") / topK.toDouble).as("recall"))
      .withColumn("recall_ok", col("recall") >= floor)
  }

  /** Exact L2 top-k on the micro-unit grid — the ground-truth leg the
    * PQ/IVFADC recall gates compare against: broadcast the (bounded)
    * query vectors, score every candidate map-side with one
    * zip_with/aggregate, rank (dist, id)-totalized, rank<=k via
    * WindowGroupLimit. The query's own row ranks (dist 0), matching the
    * serving legs' convention.
    */
  private def exactL2TopK(df: DataFrame, idCol: String, vecCol: String,
                          queryIds: Seq[Long], topK: Int): DataFrame = {
    val q = df.select(col(idCol).as("vec_id"),
      transform(col(vecCol),
        x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))
        .as("qv"))
    val qvecs = q.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("qv").as("__qqv"))
    val byDist = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("__d"), col("vec_id"))
    q.crossJoin(broadcast(qvecs))
      .withColumn("__d", aggregate(
        zip_with(col("qv"), col("__qqv"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x))
      .withColumn("__rk", row_number().over(byDist))
      .where(col("__rk") <= topK)
      .select(col("qid"), col("vec_id"))
  }

  private def l2(a: Seq[Long], b: Seq[Long]): Long =
    a.zip(b).map { case (x, y) => val d = x - y; d * d }.sum

  /** IVFADC top-k serving (Jégou, Douze & Schmid 2011 §III-C) — the two
    * ANN halves COMPOSED into the production billion-vector plan:
    * a coarse quantizer routes each query to its `nprobe` nearest of
    * `nlist` cells, and within probed cells candidates are scored by
    * asymmetric distance over a PRODUCT quantizer of the coarse
    * RESIDUAL (x − q1(x)) — the candidate set shrinks by the cell
    * fanout AND per-candidate cost drops to m table lookups. This is
    * what [[graft.functions.Similarity.knnIvf]] (routes but scores full
    * vectors) and [[pqAdcTopK]] (LUT-scores but scans ALL candidates)
    * each did half of.
    *
    * Determinism: coarse and sub-quantizers are [[lloydQuantized]]'s
    * (micro grid, smallest-ids init, truncating centroid division);
    * residuals are exact long subtractions; routing picks cells by
    * (exact L2, cell id); every LUT entry and ADC sum is an exact long;
    * the top-k rank totalizes by (adc_dist, id).
    *
    * Scale shape — the part that matters at 10⁹ vectors: the coarse
    * assignment and residual are map-only over the checkpointed
    * quantized frame (codebooks ride as plan literals); per-query LUTs
    * (|queries|·nprobe·m·k rows) are built on the DRIVER from bounded
    * codebook state and BROADCAST; candidate scoring joins the code
    * table on (cell, subspace, code) — a candidate whose cell no query
    * probes never matches, so the scored set is CELL-PRUNED by the join
    * key itself, never a full-corpus scan (PlanSpec pins the key);
    * rank<=topK pushes into WindowGroupLimit.
    *
    * IVFADC+R (§IV of the same paper) via `rerank`: the ADC pass keeps
    * its top-`rerank` candidates per query (R = 3-5×topK is the
    * standard setting) and those — already tiny and cell-pruned — are
    * re-scored EXACTLY against the full vectors, recovering most of the
    * recall the residual-PQ compression gave up. The exact leg is a
    * broadcast probe of the |queries|·R candidate set into the
    * quantized frame (map-side, no shuffle, never a scan): per-query
    * serving cost grows by R exact distances, not by corpus size.
    *
    * @param queryIds ids of the query vectors (resolved from `df`)
    * @param rerank 0 = plain ADC ranks (off); R ≥ topK = exact
    *               re-ranking of the ADC top-R
    * @return (qid, rank 1..topK, vec_id, adc_dist) per query — the
    *         query's own row ranks too, [[pqAdcTopK]]'s convention;
    *         adc_dist stays the compressed-domain score (what the
    *         index served), rank reflects the exact re-rank when on
    */
  def ivfadcTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                 nlist: Int, nprobe: Int, m: Int, k: Int, iterations: Int,
                 queryIds: Seq[Long], topK: Int, rerank: Int = 0): DataFrame = {
    require(m >= 1, s"m=$m must be positive")
    require(dim >= m && dim % m == 0,
      s"dim=$dim must be a positive multiple of m=$m")
    require(nlist >= 1, s"nlist=$nlist must be positive")
    require(nprobe >= 1 && nprobe <= nlist,
      s"nprobe=$nprobe must be in [1, nlist=$nlist]")
    require(queryIds.nonEmpty, "ivfadcTopK needs at least one query id")
    require(topK >= 1, s"topK=$topK must be positive")
    require(rerank == 0 || rerank >= topK,
      s"rerank=$rerank must be 0 (off) or >= topK=$topK")
    val spark = df.sparkSession
    import spark.implicits._
    val sub = dim / m
    // Coarse quantizer over FULL vectors; residual = x − q1(x), exact
    // longs on the micro grid. The map literal (not positional
    // element_at) survives coarse cells emptying out mid-Lloyd.
    val (q, coarse) = lloydState(df, idCol, vecCol, nlist, iterations)
    val coarseMap = coarse.toMap
    val r = q.select(col("vec_id"), col("qv"),
        assignIdCol(coarse).as("cell"))
      .withColumn("rv", zip_with(col("qv"),
        element_at(typedLit(coarseMap), col("cell")), (a, b) => a - b))
      .localCheckpoint(true)
    // Sub-quantizers on residual slices; the candidate's cell rides
    // with its codes so scoring can key on it.
    val perSub = (0 until m).map { j =>
      val sl = r.select(col("vec_id"), col("cell"),
        slice(col("rv"), j * sub + 1, sub).as("qv"))
      val cb = lloydQuantized(sl.select(col("vec_id"), col("qv")),
        k, iterations)
      val codes = sl.select(col("vec_id"), col("cell"),
        lit(j.toLong).as("subspace"), assignIdCol(cb).as("code"))
      (codes, cb)
    }
    // Driver-side routing + LUTs: queries × nprobe × m × k rows, all
    // from bounded state (query vectors + codebooks), broadcast.
    val qvecs = q.where(col("vec_id").isin(queryIds: _*)).collect()
      .map(row => (row.getLong(0), row.getSeq[Long](1).toSeq)).toSeq
    // Loud precondition (op-family discipline): a typo'd query id must
    // fail, not silently truncate the result to the ids that resolved.
    require(qvecs.size == queryIds.distinct.size,
      s"ivfadcTopK: query ids absent from df: " +
        s"${(queryIds.distinct.toSet -- qvecs.map(_._1)).toSeq.sorted
          .mkString(", ")}")
    val lutRows = for {
      (qid, qv) <- qvecs
      (cell, _) <- coarse.map { case (cl, cv) => (cl, l2(qv, cv)) }
        .sortBy { case (cl, dd) => (dd, cl) }.take(nprobe)
      qr = qv.zip(coarseMap(cell)).map { case (a, b) => a - b }
      j <- 0 until m
      (code, cw) <- perSub(j)._2
    } yield (qid, cell, j.toLong, code,
      l2(qr.slice(j * sub, (j + 1) * sub), cw))
    val lut = lutRows.toDF("qid", "cell", "subspace", "code", "pd")
    val codes = perSub.map(_._1).reduce(_ unionAll _)
    val byDist = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adc_dist"), col("vec_id"))
    val adc = codes.join(broadcast(lut), Seq("cell", "subspace", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("pd")).as("adc_dist"), count(lit(1)).as("__m"))
      .where(col("__m") === m.toLong)
      .withColumn("rank", row_number().over(byDist).cast("long"))
    if (rerank == 0)
      adc.where(col("rank") <= topK)
        .select(col("qid"), col("rank"), col("vec_id"), col("adc_dist"))
    else {
      // IVFADC+R: the ADC top-R candidate set (|queries|·R rows, still
      // cell-pruned) broadcasts into the quantized frame for an EXACT
      // re-score — a map-side probe keyed on the candidate ids, never a
      // corpus scan — then re-ranks on (exact L2, id)-totalized order.
      val cands = adc.where(col("rank") <= rerank)
        .select(col("qid"), col("vec_id"), col("adc_dist"))
      val qdf = qvecs.toDF("qid", "__qqv")
      val byExact = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("__ed"), col("vec_id"))
      q.join(broadcast(cands), Seq("vec_id"))
        .join(broadcast(qdf), Seq("qid"))
        .withColumn("__ed", aggregate(
          zip_with(col("qv"), col("__qqv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
        .withColumn("rank", row_number().over(byExact).cast("long"))
        .where(col("rank") <= topK)
        .select(col("qid"), col("rank"), col("vec_id"), col("adc_dist"))
    }
  }

  /** IVF cell-occupancy statistics — the balance diagnostic an inverted
    * file ships with: per coarse cell its member count and corpus
    * share, plus the imbalance factor max_cell·k/N over the k REALIZED
    * cells (1.0 = perfectly balanced; the factor multiplies worst-case
    * probe cost, since a query routed to the hot cell scans that many
    * × the fair share).
    * Skewed cells are THE operational failure of IVF at scale — probes
    * hitting a mega-cell degrade toward the full scan [[ivfadcTopK]]
    * exists to avoid — so the index build should gate on this table.
    *
    * Scale shape: [[lloydState]]'s map-only assignment (codebook as a
    * plan literal) + ONE cell-keyed hash aggregate; everything after is
    * nlist-bounded.
    *
    * @return per cell: (cell, n_members, share 4-dp, imbalance 4-dp —
    *         the global factor, repeated per row for a self-contained
    *         readout)
    */
  def ivfCellStats(df: DataFrame, idCol: String, vecCol: String,
                   nlist: Int, iterations: Int): DataFrame = {
    import CoreOps.rnd
    val (q, coarse) = lloydState(df, idCol, vecCol, nlist, iterations)
    val cells = q.select(assignIdCol(coarse).as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
    val tot = cells.agg(sum(col("n_members")).as("__n"),
      max(col("n_members")).as("__mx"),
      count(lit(1)).as("__k"))
    cells.crossJoin(broadcast(tot))
      .select(col("cell"), col("n_members"),
        rnd(col("n_members").cast("double") / col("__n").cast("double"))
          .as("share"),
        rnd(col("__mx").cast("double") * col("__k").cast("double")
          / col("__n").cast("double")).as("imbalance"))
  }

  /** Recall gate for [[ivfadcTopK]] against the exact L2 top-k — the
    * [[graft.functions.Similarity.recallVsBrute]] contract shape: the
    * oracle computes the exact top-k (n_true) and demands
    * recall_ok=TRUE, so the routed+compressed tier's quality claim is
    * hash-gated. Floors are measured per-SF minima with margin.
    *
    * @return per query: (qid, n_true, recall_ok)
    */
  def ivfadcRecall(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                   nlist: Int, nprobe: Int, m: Int, k: Int, iterations: Int,
                   queryIds: Seq[Long], topK: Int,
                   floor: Double, rerank: Int = 0): DataFrame = {
    val ann = ivfadcTopK(df, idCol, vecCol, dim, nlist, nprobe, m, k,
      iterations, queryIds, topK, rerank).select(col("qid"), col("vec_id"))
    exactL2TopK(df, idCol, vecCol, queryIds, topK)
      .join(ann.withColumn("__hit", lit(1)), Seq("qid", "vec_id"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_true"),
        (sum(coalesce(col("__hit"), lit(0))).cast("double") / count(lit(1)))
          .as("__recall"))
      .select(col("qid"), col("n_true"),
        (col("__recall") >= floor).as("recall_ok"))
  }

  /** Frozen IVFADC index state — what a production PQ service persists
    * between ingest batches: the coarse router plus the m residual
    * sub-quantizer codebooks, all on [[lloydState]]'s exact micro-unit
    * grid. The model is (nlist + m·k) centroid vectors of driver-side
    * state; token of the whole design: model size is a build-time
    * CHOICE, never a corpus property.
    */
  case class IvfadcModel(dim: Int, m: Int,
                         coarse: Seq[(Long, Seq[Long])],
                         subs: Seq[Seq[(Long, Seq[Long])]]) {
    require(m >= 1 && dim >= m && dim % m == 0,
      s"dim=$dim must be a positive multiple of m=$m")
    def sub: Int = dim / m
  }

  /** Train the frozen [[IvfadcModel]] on `df` — [[ivfadcTopK]]'s
    * training half, split out so append-time encoding and serving can
    * run against state that NEVER refits (the incremental contract:
    * codes are a property of the model, so an appended batch can't
    * shift a shipped code).
    */
  def ivfadcTrain(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                  nlist: Int, m: Int, k: Int,
                  iterations: Int): IvfadcModel = {
    require(nlist >= 1, s"nlist=$nlist must be positive")
    val (q, coarse) = lloydState(df, idCol, vecCol, nlist, iterations)
    val coarseMap = coarse.toMap
    val sub = dim / m
    val r = q.select(col("vec_id"), col("qv"),
        assignIdCol(coarse).as("cell"))
      .withColumn("rv", zip_with(col("qv"),
        element_at(typedLit(coarseMap), col("cell")), (a, b) => a - b))
      .localCheckpoint(true)
    val subs = (0 until m).map { j =>
      lloydQuantized(
        r.select(col("vec_id"), slice(col("rv"), j * sub + 1, sub)
          .as("qv")), k, iterations)
    }
    IvfadcModel(dim, m, coarse, subs)
  }

  /** Pure per-row IVFADC encoding against a FROZEN model: coarse cell,
    * residual, m sub-quantizer codes — (vec_id, cell, subspace, code).
    * This is the whole cost of appending a batch to a persisted ADC
    * index: map-only (codebooks ride as plan literals; the one
    * checkpoint materializes the residual frame for its m consumers),
    * no exchange, no visit to the existing corpus. Deterministic given
    * the model, so append == full re-encode as a set identity.
    */
  def ivfadcEncode(df: DataFrame, idCol: String, vecCol: String,
                   model: IvfadcModel): DataFrame = {
    val coarseMap = model.coarse.toMap
    val r = df.select(col(idCol).as("vec_id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))
          .as("qv"))
      .select(col("vec_id"), col("qv"),
        assignIdCol(model.coarse).as("cell"))
      .withColumn("rv", zip_with(col("qv"),
        element_at(typedLit(coarseMap), col("cell")), (a, b) => a - b))
      .localCheckpoint(true)
    (0 until model.m).map { j =>
      r.select(col("vec_id"), col("cell"),
          slice(col("rv"), j * model.sub + 1, model.sub).as("qv"))
        .select(col("vec_id"), col("cell"), lit(j.toLong).as("subspace"),
          assignIdCol(model.subs(j)).as("code"))
    }.reduce(_ unionAll _)
  }

  /** IVFADC top-k served from a STORED code table — [[ivfadcTopK]]'s
    * serving half against persisted postings: per-query LUTs built on
    * the driver from the frozen model + the (bounded) query vectors and
    * broadcast; candidates meet the LUT on (cell, subspace, code) — the
    * cell-pruned join, never a corpus scan; rank totalizes by
    * (adc_dist, vec_id). With `rerank` = R ≥ topK, the ADC top-R is
    * re-scored exactly (IVFADC+R) via a broadcast id-probe into `qdf`.
    *
    * `qdf` is the corpus vector frame: queries resolve from it by id,
    * and the +R leg reads candidate vectors from it (by id, bounded —
    * never a scan of the persisted code half).
    */
  def knnIvfadcOnCodes(qdf: DataFrame, idCol: String, vecCol: String,
                       queryIds: Seq[Long], codes: DataFrame,
                       model: IvfadcModel, nprobe: Int,
                       topK: Int, rerank: Int = 0): DataFrame = {
    require(nprobe >= 1 && nprobe <= model.coarse.size,
      s"nprobe=$nprobe must be in [1, nlist=${model.coarse.size}]")
    require(queryIds.nonEmpty, "knnIvfadcOnCodes needs at least one query")
    require(topK >= 1, s"topK=$topK must be positive")
    require(rerank == 0 || rerank >= topK,
      s"rerank=$rerank must be 0 (off) or >= topK=$topK")
    val spark = qdf.sparkSession
    import spark.implicits._
    val coarseMap = model.coarse.toMap
    val qvecs = qdf.select(col(idCol).as("vec_id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))
          .as("qv"))
      .where(col("vec_id").isin(queryIds: _*)).collect()
      .map(row => (row.getLong(0), row.getSeq[Long](1).toSeq)).toSeq
    require(qvecs.size == queryIds.distinct.size,
      s"knnIvfadcOnCodes: query ids absent from qdf: " +
        s"${(queryIds.distinct.toSet -- qvecs.map(_._1)).toSeq.sorted
          .mkString(", ")}")
    val sub = model.sub
    val lutRows = for {
      (qid, qv) <- qvecs
      (cell, _) <- model.coarse.map { case (cl, cv) => (cl, l2(qv, cv)) }
        .sortBy { case (cl, dd) => (dd, cl) }.take(nprobe)
      qr = qv.zip(coarseMap(cell)).map { case (a, b) => a - b }
      j <- 0 until model.m
      (code, cw) <- model.subs(j)
    } yield (qid, cell, j.toLong, code,
      l2(qr.slice(j * sub, (j + 1) * sub), cw))
    val lut = lutRows.toDF("qid", "cell", "subspace", "code", "pd")
    val byDist = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adc_dist"), col("vec_id"))
    val adc = codes.join(broadcast(lut), Seq("cell", "subspace", "code"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("pd")).as("adc_dist"), count(lit(1)).as("__m"))
      .where(col("__m") === model.m.toLong)
      .withColumn("rank", row_number().over(byDist).cast("long"))
    if (rerank == 0)
      adc.where(col("rank") <= topK)
        .select(col("qid"), col("rank"), col("vec_id"), col("adc_dist"))
    else {
      // IVFADC+R off the stored codes: the candidate set STILL comes
      // from the posting table (cell-pruned, |queries|·R rows); only
      // those ids are re-scored exactly — a broadcast probe into the
      // quantized corpus keyed on the candidate ids, never a scan of
      // the persisted half.
      val cands = adc.where(col("rank") <= rerank)
        .select(col("qid"), col("vec_id"), col("adc_dist"))
      val qdf2 = qvecs.toDF("qid", "__qqv")
      val corpus = qdf.select(col(idCol).as("vec_id"),
        transform(col(vecCol),
          x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))
          .as("qv"))
      val byExact = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("__ed"), col("vec_id"))
      corpus.join(broadcast(cands), Seq("vec_id"))
        .join(broadcast(qdf2), Seq("qid"))
        .withColumn("__ed", aggregate(
          zip_with(col("qv"), col("__qqv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x))
        .withColumn("rank", row_number().over(byExact).cast("long"))
        .where(col("rank") <= topK)
        .select(col("qid"), col("rank"), col("vec_id"), col("adc_dist"))
    }
  }

  /** [[ivfadcRecall]]'s contract shape for the stored-code serving path:
    * exact L2 truth over the FULL corpus, recall_ok gated at `floor`.
    */
  def ivfadcRecallOnCodes(df: DataFrame, idCol: String, vecCol: String,
                          codes: DataFrame, model: IvfadcModel,
                          nprobe: Int, queryIds: Seq[Long], topK: Int,
                          floor: Double, rerank: Int = 0): DataFrame = {
    val ann = knnIvfadcOnCodes(df, idCol, vecCol, queryIds, codes, model,
      nprobe, topK, rerank).select(col("qid"), col("vec_id"))
    exactL2TopK(df, idCol, vecCol, queryIds, topK)
      .join(ann.withColumn("__hit", lit(1)), Seq("qid", "vec_id"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_true"),
        (sum(coalesce(col("__hit"), lit(0))).cast("double") / count(lit(1)))
          .as("__recall"))
      .select(col("qid"), col("n_true"),
        (col("__recall") >= floor).as("recall_ok"))
  }

  /** Deterministic ±1 projection signs for [[embeddingDriftPsi]]: the
    * parity of the LAST hex digit of md5("p#i") — derived, not magic,
    * and trivially replayable by any engine with md5 (the oracle embeds
    * the same literals, so cross-engine agreement is literal equality).
    */
  def driftSigns(projections: Int, dims: Int): Seq[Seq[Double]] = {
    def md5Hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (0 until projections).map(p => (0 until dims).map { i =>
      if ((Integer.parseInt(md5Hex(s"$p#$i").takeRight(1), 16) & 1) == 1)
        1.0 else -1.0
    })
  }

  /** IVF serving over SQ8 codes with EVERYTHING deterministic — the
    * production FAISS IndexIVFScalarQuantizer shape, graded end to end
    * by hash equality rather than the recall floors the MLlib-codebook
    * IVF tier settles for: coarse cells come from the deterministic
    * micro-unit Lloyd loop ([[kmeansAssignments]]' machinery), queries
    * probe their `nprobe` nearest cells by exact integer
    * query-to-centroid distance (ties to the smaller cell), candidates
    * in probed cells are ranked by INTEGER squared L2 over the shared
    * per-dim SQ8 codebook codes ([[quantizeDimsCodes]]), and the brute
    * SQ8 top-k over the whole corpus rides beside it as the audit leg
    * with the per-query overlap graded as recall@k. No float ever
    * enters a ranking key, so probed cells, served neighbors, distances,
    * and recall all replay bit-for-bit on any engine.
    *
    * Scale shape: one Lloyd pass (map-only assignment + (cluster, dim)
    * aggregate per iteration), the corpus SQ8-encodes map-side against
    * the broadcast 1-row codebook, the (qid × nprobe) probe table and
    * the query codes broadcast against the cell-partitioned corpus, and
    * each ranking pass collapses through WindowGroupLimit to |Q|·k rows.
    * The brute leg is the AUDIT half — a production server runs only
    * the cell-pruned pass.
    */
  def knnIvfSq8(df: DataFrame, idCol: String, vecCol: String,
                nlist: Int, nprobe: Int, iterations: Int,
                queryIds: Seq[Long], topK: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist,
      s"need 1 <= nprobe=$nprobe <= nlist=$nlist")
    require(topK >= 1, s"topK=$topK must be positive")
    require(queryIds.nonEmpty, "queryIds must be non-empty")
    val (q, cents) = lloydState(df, idCol, vecCol, nlist, iterations)
    val assigned = q.select(col("vec_id"),
      assignIdCol(cents).as("cell"))
    val cb = dimCodebookRow(df, vecCol)
    // (vec_id, cell, SQ8 code) — consumed by the candidate leg, the
    // query side, and the brute audit leg: one materialization
    val coded = df.select(col(idCol).as("vec_id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(cb))
      .select(col("vec_id"),
        quantizeDimsCodes(col("__v"), col("__mns"), col("__scs"))
          .as("code"))
      .join(assigned, Seq("vec_id"))
      .localCheckpoint(true)
    graft.ops.Dedup.unpersistCheckpoint(q)
    // nprobe nearest cells per query by exact integer centroid distance
    val centLit = typedLit(cents.map { case (cl, cv) => (cl, cv) })
    val qMicro = df.where(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"),
        transform(col(vecCol),
          x => floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))
          .as("qv"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("__cd"), col("cell"))
    val probe = qMicro
      .select(col("qid"), explode(centLit).as("__c"), col("qv"))
      .select(col("qid"), col("__c._1").as("cell"),
        aggregate(zip_with(col("qv"), col("__c._2"),
            (a, b) => (a - b) * (a - b)),
          lit(0L), (s, x) => s + x).as("__cd"))
      .withColumn("__r", row_number().over(wProbe))
      .where(col("__r") <= nprobe)
      .select(col("qid"), col("cell"))
    val qCodes = coded.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("code").as("qcode"))
    val probeC = broadcast(probe.join(qCodes, Seq("qid")))
    def d2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (s, x) => s + x)
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("d2"), col("cid"))
    val served = coded.join(probeC, Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"), col("cell"),
        d2(col("qcode"), col("code")).as("d2"))
      .withColumn("rnk", row_number().over(wRank).cast("long"))
      .where(col("rnk") <= topK)
      .localCheckpoint(true)
    val brute = coded.crossJoin(broadcast(qCodes))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        d2(col("qcode"), col("code")).as("d2"))
      .withColumn("rnk", row_number().over(wRank))
      .where(col("rnk") <= topK)
      .select(col("qid"), col("cid"))
    val hits = served.select(col("qid"), col("cid"))
      .join(brute, Seq("qid", "cid"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("__m"))
    val rec = served.select("qid").distinct()
      .join(hits, Seq("qid"), "left")
      .select(col("qid"),
        CoreOps.rnd(coalesce(col("__m"), lit(0L)).cast("double") / topK)
          .as("recall_k"))
    served.join(rec, Seq("qid"))
      .select(col("qid"), col("rnk"), col("cid"), col("cell"),
        col("d2"), col("recall_k"))
  }

  /** Embedding-space DRIFT between two corpus snapshots — the
    * representation-health monitor a pipeline runs when the upstream
    * embedder, corpus mix, or preprocessing changes: project both sides
    * onto `projections` fixed ±1 directions ([[driftSigns]]), histogram
    * the 1-D projections (bins of `binWidth` on the 4-dp-rounded value),
    * and report the Population Stability Index per direction
    * (Laplace-smoothed over the union bin set, the standard scalar-drift
    * treatment lifted to embeddings). PSI ≈ 0 ⇒ same distribution;
    * > 0.25 is the conventional "investigate" line.
    *
    * Determinism: the projection is a SEQUENTIAL left fold over the
    * parquet list order (the object-doc contract — bit-identical in any
    * engine), rounded to 4 dp BEFORE binning; each bin's PSI term is
    * micro-quantized before the per-direction sum.
    *
    * Scale shape: map-only projection + ONE (direction, bin) hash
    * aggregate per side; everything after runs on the bin-bounded
    * histogram. Vectors not of `dims` length are excluded (zip_with
    * against the sign array would null-poison them silently otherwise).
    *
    * @return one row per direction: (p, n_bins, n_a, n_b, psi 4-dp)
    */
  def embeddingDriftPsi(a: DataFrame, b: DataFrame, vecCol: String,
                        dims: Int, projections: Int = 4,
                        binWidth: Double = 0.5): DataFrame = {
    import CoreOps.rnd
    require(dims >= 1 && projections >= 1 && binWidth > 0,
      s"dims=$dims, projections=$projections, binWidth=$binWidth")
    val signs = driftSigns(projections, dims)
    def projExpr(p: Int): Column = expr(
      s"""aggregate(zip_with($vecCol,
         |  array(${signs(p).map(s => s"${s}D").mkString(", ")}),
         |  (x, s) -> CAST(x AS DOUBLE) * s),
         |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
    def hist(df: DataFrame, cnt: String): DataFrame = df
      .where(size(col(vecCol)) === dims)
      .select(explode(array((0 until projections).map(p =>
        struct(lit(p.toLong).as("p"),
          floor(rnd(projExpr(p)) / binWidth).cast("long").as("bin"))): _*))
        .as("__pb"))
      .select(col("__pb.p").as("p"), col("__pb.bin").as("bin"))
      .groupBy(col("p"), col("bin")).agg(count(lit(1)).as(cnt))
    // the bin-bounded histogram materializes ONCE (rule (g)): it feeds
    // both the per-direction totals and the PSI term join, and left lazy
    // each consumer would re-run the two fact-scale projection scans
    val joined = hist(a, "__ca").join(hist(b, "__cb"),
        Seq("p", "bin"), "full_outer")
      .select(col("p"), col("bin"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
      .localCheckpoint(true)
    val tot = joined.groupBy(col("p"))
      .agg(sum(col("__ca")).as("__na"), sum(col("__cb")).as("__nb"),
        count(lit(1)).as("n_bins"))
    val qa = (col("__ca") + 1).cast("double") /
      (col("__na") + col("n_bins")).cast("double")
    val qb = (col("__cb") + 1).cast("double") /
      (col("__nb") + col("n_bins")).cast("double")
    joined.join(tot, Seq("p"))
      .withColumn("__t",
        floor((qa - qb) * log(qa / qb) * 1000000 + 0.5).cast("long"))
      .groupBy(col("p"))
      .agg(min(col("n_bins")).as("n_bins"), min(col("__na")).as("n_a"),
        min(col("__nb")).as("n_b"),
        rnd(sum(col("__t")).cast("double") / 1000000.0).as("psi"))
  }
}
