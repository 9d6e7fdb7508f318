package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character-trigram histogram: `(tri, c)` for every distinct
  * trigram of the input string with its occurrence count — SQL substring
  * semantics (code points, not UTF-16 units), bit-identical to exploding
  * `transform(sequence(1, len-2), i -> substring(t, i, 3))` and counting.
  *
  * The point is the PLAN, not the per-row arithmetic: a document's
  * trigram counts are a row-local fact, but the explode-then-groupBy
  * spelling forces a fact-scale `(id, tri)` exchange of every raw
  * trigram instance before the counts exist (2.8 M rows at sf0.1 —
  * unboundedly worse at corpus scale, where it is the dominant shuffle
  * of the trigram-LM pipeline). Fusing the count into one expression
  * makes the per-document histogram map-only; only the already-reduced
  * per-document rows and the charset³-bounded model aggregation ever
  * reach an exchange. CodegenFallback (one interpreted call per DOCUMENT
  * row, amortized over its whole text) costs far less than the exchange
  * it deletes — the inverse of the [[HashKernels]] trade, same
  * preference order: the built-in composition's plan shape, not its
  * per-element cost, is what fails at scale here.
  *
  * Single pass: code-point offsets are walked once and each trigram is a
  * byte-range slice, so a document costs O(bytes), not the O(chars²)
  * repeated `substringSQL` seeks would.
  */
case class TrigramCounts(child: Expression)
    extends UnaryExpression with CodegenFallback with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tri", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val b = u.getBytes
    // code-point start offsets (UTF8 has no surrogate pairs: one code
    // point = one SQL character, matching substring's counting)
    val nb = b.length
    var chars = 0
    var i = 0
    while (i < nb) { i += UTF8String.numBytesForFirstByte(b(i)); chars += 1 }
    if (chars < 3) new GenericArrayData(Array.empty[Any])
    else {
      val off = new Array[Int](chars + 1)
      var c = 0; i = 0
      while (i < nb) {
        off(c) = i; i += UTF8String.numBytesForFirstByte(b(i)); c += 1
      }
      off(chars) = nb
      val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
      var t = 0
      while (t <= chars - 3) {
        val s = off(t)
        val tri = UTF8String.fromBytes(b, s, off(t + 3) - s)
        val cur = m.get(tri)
        if (cur == null) m.put(tri, Array(1L)) else cur(0) += 1L
        t += 1
      }
      val out = new Array[Any](m.size)
      val it = m.entrySet().iterator()
      var j = 0
      while (it.hasNext) {
        val e = it.next()
        out(j) = InternalRow(e.getKey, e.getValue()(0))
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): TrigramCounts = copy(newChild)
}

object TrigramCounts {
  import org.apache.spark.sql.GraftExpressionBridge._

  def trigramCounts(text: Column): Column = column(TrigramCounts(expression(text)))
}
