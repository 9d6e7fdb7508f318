package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.CosineSimilarity

/** Canonical deployment hook for the engine's native Catalyst additions:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Every session built with the conf gets `cosine_sim` (the fused
  * codegen'd [[CosineSimilarity]]) as a SQL function without any
  * per-session `register` call — the SparkSessionExtensions mechanism
  * Spark provides precisely so libraries can contribute expressions,
  * rules, and strategies declaratively. Only functions are injected
  * today: the operator library deliberately stays inside Catalyst's
  * built-in plans (SURVEY §4 preference order), so there is nothing a
  * custom rule or strategy would do that the optimizer doesn't already.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"cosine_sim expects 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs.head, exprs(1))
      }))
  }
}
