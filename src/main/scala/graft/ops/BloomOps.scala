package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftExpressionBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership — the decontamination scale path for when the
  * deny side outgrows an exact broadcast set (SURVEY.md §4.3 scale tier).
  *
  * [[CorpusOps.decontaminate]] broadcasts the eval n-gram set exactly: the
  * right call while that set fits an executor. At 100 TB the deny side may
  * be a corpus itself (cross-corpus dedup manifests, URL blocklists); the
  * sketch path spends a few MB of bits for a bounded false-positive rate
  * and keeps the probe a map-only codegen'd filter — no join, no shuffle,
  * no per-executor hash set of the raw items.
  *
  * One-sided error contract: an inserted item ALWAYS probes true (no false
  * negatives — recall 1.0 is a theorem of the structure), a non-member
  * probes true with probability ~fpp. Decontamination wants exactly this
  * asymmetry: leaked eval data must never survive; over-dropping a few
  * clean documents is the cheap direction.
  *
  * Built on Spark's own runtime-filter machinery (`BloomFilterAggregate` /
  * `BloomFilterMightContain`, the pair injected by
  * `InjectRuntimeFilter`), driven through the same Column↔Expression
  * bridge as the native sketch expressions. Both sides key on
  * `xxhash64(item)` — build and probe MUST agree on the hash, which is
  * why the pairing lives in one object. The aggregate is distributed
  * (partial filters OR-merge, order-independent → deterministic bits);
  * only the finished KB-scale binary returns to the driver, the same
  * bounded-collect contract as the IVF codebook.
  */
object BloomOps {

  /** Build a bloom filter over `c`'s non-null values. Returns None for an
    * empty input (Spark's aggregate yields null there — the runtime-filter
    * convention for "nothing to filter").
    *
    * @param expectedItems sizing estimate (distinct items); the bit count
    *                      is derived for `fpp` at this cardinality
    * @param fpp           target false-positive probability per probe
    */
  def buildBloom(df: DataFrame, c: Column, expectedItems: Long,
                 fpp: Double): Option[Array[Byte]] = {
    require(expectedItems > 0, s"expectedItems=$expectedItems must be positive")
    require(fpp > 0 && fpp < 1, s"fpp=$fpp must be in (0, 1)")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    // BloomFilterAggregate SILENTLY clamps both sizing params with
    // Math.min against the runtime-filter confs (defaults: 4M items,
    // 2^26 bits ≈ 8 MB). Past the clamp the bits-per-item ratio
    // collapses and the effective fpp drifts toward 1.0 — for a
    // decontamination filter that means quietly dropping nearly every
    // clean document while this method still "succeeds". Fail loudly at
    // the boundary instead; a deployment sizing a bigger deny side must
    // raise the confs consciously, not discover the clamp in production.
    // read the SAME conf entries the aggregate clamps with — hand-copied
    // default strings would silently desync from the real clamp on a
    // Spark upgrade that changes either default
    import org.apache.spark.sql.internal.SQLConf
    val conf = SQLConf.get
    val maxItems = conf.getConf(SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_ITEMS)
    val maxBits = conf.getConf(SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_BITS)
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloom sizing (items=$expectedItems, bits=$numBits for fpp=$fpp) " +
        s"exceeds Spark's runtime-filter caps (items<=$maxItems, " +
        s"bits<=$maxBits) and would be silently clamped, voiding the fpp " +
        "contract; raise spark.sql.optimizer.runtime.bloomFilter.maxNumItems" +
        "/maxNumBits to size a filter this large")
    val agg = new BloomFilterAggregate(
      expression(xxhash64(c)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val row = df.select(column(agg).as("bf")).head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }

  /** Codegen'd membership probe against a built filter: the filter binary
    * embeds as a LITERAL (KB-scale, rides the task closure like a
    * broadcast var), so the probe is a pure per-row predicate — map-only,
    * fuses into whole-stage codegen, no join in the plan.
    */
  def mightContain(bloom: Option[Array[Byte]], c: Column): Column =
    bloom match {
      case Some(bytes) =>
        column(BloomFilterMightContain(
          Literal(bytes, BinaryType), expression(xxhash64(c))))
      case None => lit(false) // empty deny side: nothing can be a member
    }
}
