package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Count of agreeing positions between two `ARRAY<BIGINT>` MinHash
  * signatures as a native codegen'd expression.
  *
  * The composable form — `size(filter(zip_with(a, b, (x, y) -> x = y),
  * e -> e))` — walks both arrays and materializes two intermediate arrays
  * per pair; in candidate verification that sits in the inner loop over
  * millions of LSH pairs. This is one fused allocation-free loop, inside
  * whole-stage codegen. Same preference-order justification as
  * [[CosineSimilarity]]: built-ins first, a custom Expression only where
  * the built-in shape can't express the performance need.
  *
  * Agreement over the MIN of the lengths (mismatched signature widths are
  * a caller bug; positions beyond the shorter array can't agree) —
  * identical to the zip_with form, whose result length is the shorter
  * input's.
  */
case class SignatureAgreement(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var agree = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)
        && x.getLong(i) == y.getLong(i)) agree += 1
      i += 1
    }
    agree
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val agree = ctx.freshName("agree")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $agree = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)
         |      && $a.getLong($i) == $b.getLong($i)) $agree++;
         |}
         |${ev.value} = $agree;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SignatureAgreement = copy(newLeft, newRight)
}

object SignatureAgreement {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Column-API entry point. */
  def agreement(a: Column, b: Column): Column =
    column(SignatureAgreement(expression(a), expression(b)))
}
