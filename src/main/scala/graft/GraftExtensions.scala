package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{CosineSimilarity, MinHashSignature, NearestCentroidDist, NearestCentroidId, SignatureAgreement, SimHash64}

/** Canonical deployment hook for the engine's native Catalyst additions:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Every session built with the conf gets the fused codegen'd expressions
  * — `cosine_sim`, `simhash64`, `minhash_signature`, `signature_agreement`,
  * `nearest_centroid_id`, `nearest_centroid_dist`
  * — as SQL functions without any per-session `register` call: the
  * SparkSessionExtensions mechanism Spark provides precisely so libraries
  * can contribute expressions, rules, and strategies declaratively. Only
  * functions are injected: the operator library deliberately stays inside
  * Catalyst's built-in plans (SURVEY §4 preference order), so there is
  * nothing a custom rule or strategy would do that the optimizer doesn't
  * already.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def literalInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal integer")
    // Integral types only: a fractional literal (minhash_signature(text, 2.5))
    // must error, not silently truncate to 2 — Number.intValue() would.
    e.eval() match {
      case i: Int => i
      case b: Byte => b.toInt
      case s: Short => s.toInt
      case l: Long =>
        require(l >= Int.MinValue && l <= Int.MaxValue,
          s"$what out of Int range: $l")
        l.toInt
      case other => throw new IllegalArgumentException(
        s"$what must be a literal integer, got: $other")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"cosine_sim expects 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1,
          s"simhash64 expects 1 argument, got ${exprs.length}")
        SimHash64(exprs.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 || exprs.length == 3,
          s"minhash_signature expects (text, k[, shingleSize]), got ${exprs.length} args")
        MinHashSignature(exprs.head, literalInt(exprs(1), "k"),
          if (exprs.length == 3) literalInt(exprs(2), "shingleSize") else 1)
      }))
    ext.injectFunction((
      FunctionIdentifier("nearest_centroid_id"),
      new ExpressionInfo(classOf[NearestCentroidId].getName,
        "nearest_centroid_id"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          s"nearest_centroid_id expects (vec, centroids, ids), got ${exprs.length} args")
        NearestCentroidId(exprs.head, exprs(1), exprs(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("nearest_centroid_dist"),
      new ExpressionInfo(classOf[NearestCentroidDist].getName,
        "nearest_centroid_dist"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"nearest_centroid_dist expects (vec, centroids), got ${exprs.length} args")
        NearestCentroidDist(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("signature_agreement"),
      new ExpressionInfo(classOf[SignatureAgreement].getName, "signature_agreement"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"signature_agreement expects 2 arguments, got ${exprs.length}")
        SignatureAgreement(exprs.head, exprs(1))
      }))
  }
}
