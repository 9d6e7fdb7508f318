package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
