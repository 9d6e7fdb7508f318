package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit average hash (aHash) of a 64-"pixel" window as one fused
  * codegen'd loop: pixel j is byte j of the input string, bit j is set
  * iff pixel_j · 64 > Σ pixels — the exact integer above-the-mean test,
  * no float mean anywhere.
  *
  * The composable form ([[graft.multimodal.MultimodalOps
  * .aHash64Composed]]: nested single-element-array let-bindings over
  * `transform`/`aggregate` HOFs) pays Catalyst's interpreted lambda
  * machinery 64 bits × 64 pixels per frame — measured as the whole cost
  * center of the graded perceptual-near-dup query. This is two
  * allocation-free passes over the bytes inside whole-stage codegen;
  * ExtensionOpsSpec pins bit-identity against the composed form.
  *
  * Contract: ASCII input (byte value == `ascii()` codepoint — the same
  * pinning the edit-distance tier documents); windows shorter than 64
  * bytes contribute zero pixels past their end, exactly as the composed
  * form's `ascii(substr(...)) = 0` does.
  */
case class AHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].getBytes
    val n = math.min(64, b.length)
    var sum = 0L
    var i = 0
    while (i < n) { sum += (b(i) & 0xff); i += 1 }
    var fp = 0L
    i = 0
    while (i < n) {
      if ((b(i) & 0xff) * 64L > sum) fp |= (1L << i)
      i += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bts = ctx.freshName("bts")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val fp = ctx.freshName("fp")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bts = $s.getBytes();
         |int $n = java.lang.Math.min(64, $bts.length);
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) { $sum += ($bts[$i] & 0xff); }
         |long $fp = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (($bts[$i] & 0xff) * 64L > $sum) $fp |= (1L << $i);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): AHash64 = copy(newChild)
}

object AHash64 {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Column-API entry point. */
  def ahash(window: Column): Column = column(AHash64(expression(window)))
}
