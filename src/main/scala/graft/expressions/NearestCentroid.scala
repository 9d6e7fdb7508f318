package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused nearest-centroid kernels for the deterministic k-means tier
  * ([[graft.ops.EmbeddingOps.kmeansAssignments]]).
  *
  * The composable assignment — k `aggregate(zip_with(...))` folds wrapped
  * in structs under `array_min` — is exactly right semantically, but pays
  * Catalyst's interpreted lambda machinery k·dim times per row and
  * allocates k zipped temporaries; at 100 TB the assignment pass IS the
  * k-means runtime (it touches every row every iteration, where the
  * centroid update aggregates k·dim groups). These kernels are the one
  * k·dim loop the algorithm actually needs — allocation-free, inside
  * whole-stage codegen — same preference-order case as
  * [[CosineSimilarity]] and the [[HashKernels]] sketches.
  *
  * Arithmetic is EXACT long arithmetic on the micro-unit grid, so kernel
  * and composed form agree bit-for-bit (pinned by ExtensionOpsSpec); the
  * tie rule (equal distance → smaller cluster id) is the composed form's
  * lexicographic struct-min, made order-independent here by an explicit
  * (dist, id) comparison. Rows are assumed same-dimension as the
  * centroids (the k-means contract); a ragged row scores over the common
  * prefix instead of nulling out. An EMPTY centroid matrix yields NULL.
  */
object NearestCentroid {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Winning cluster id: `ids(argmin_c dist(vec, cents(c)))`, ties to the
    * smallest id. `cents` and `ids` must be index-aligned.
    */
  def nearestCentroidId(vec: Column, cents: Column, ids: Column): Column =
    column(NearestCentroidId(expression(vec), expression(cents),
      expression(ids)))

  /** Winning squared distance `min_c Σ_i (vec_i − cents(c)_i)²` in exact
    * micro-unit² longs.
    */
  def nearestCentroidDist(vec: Column, cents: Column): Column =
    column(NearestCentroidDist(expression(vec), expression(cents)))
}

case class NearestCentroidId(first: Expression, second: Expression,
                             third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(ArrayType(LongType)),
      ArrayType(LongType))

  override def dataType: DataType = LongType

  // an empty centroid matrix has no nearest member
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any, cs: Any, is: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cents = cs.asInstanceOf[ArrayData]
    val ids = is.asInstanceOf[ArrayData]
    val k = cents.numElements()
    // centroids/ids are index-aligned by contract; a mismatch would read
    // out-of-bounds UnsafeArrayData and return garbage ids SILENTLY (the
    // dist kernel clamps dims; ids has no analogous safe clamp) — throw.
    if (ids.numElements() != k)
      throw new IllegalArgumentException(
        s"NearestCentroidId: $k centroids but ${ids.numElements()} ids" +
          " — the two arrays must be index-aligned")
    if (k == 0) null
    else {
      var bestD = Long.MaxValue
      var bestId = Long.MaxValue
      var c = 0
      while (c < k) {
        val cv = cents.getArray(c)
        val n = math.min(vec.numElements(), cv.numElements())
        var d = 0L
        var i = 0
        while (i < n) {
          val t = vec.getLong(i) - cv.getLong(i)
          d += t * t
          i += 1
        }
        val id = ids.getLong(c)
        if (d < bestD || (d == bestD && id < bestId)) {
          bestD = d; bestId = id
        }
        c += 1
      }
      bestId
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs, is) => {
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cv = ctx.freshName("cv")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val id = ctx.freshName("id")
      val bestD = ctx.freshName("bestD")
      val bestId = ctx.freshName("bestId")
      s"""
         |int $k = $cs.numElements();
         |if ($is.numElements() != $k) {
         |  throw new IllegalArgumentException(
         |    "NearestCentroidId: " + $k + " centroids but " +
         |    $is.numElements() + " ids — the two arrays must be index-aligned");
         |}
         |if ($k == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $bestD = Long.MAX_VALUE;
         |  long $bestId = Long.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $cv = $cs.getArray($c);
         |    int $n = java.lang.Math.min($v.numElements(), $cv.numElements());
         |    long $d = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $t = $v.getLong($i) - $cv.getLong($i);
         |      $d += $t * $t;
         |    }
         |    long $id = $is.getLong($c);
         |    if ($d < $bestD || ($d == $bestD && $id < $bestId)) {
         |      $bestD = $d; $bestId = $id;
         |    }
         |  }
         |  ${ev.value} = $bestId;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): NearestCentroidId =
    copy(newFirst, newSecond, newThird)
}

case class NearestCentroidDist(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(ArrayType(LongType)))

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(v: Any, cs: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val cents = cs.asInstanceOf[ArrayData]
    val k = cents.numElements()
    if (k == 0) null
    else {
      var bestD = Long.MaxValue
      var c = 0
      while (c < k) {
        val cv = cents.getArray(c)
        val n = math.min(vec.numElements(), cv.numElements())
        var d = 0L
        var i = 0
        while (i < n) {
          val t = vec.getLong(i) - cv.getLong(i)
          d += t * t
          i += 1
        }
        if (d < bestD) bestD = d
        c += 1
      }
      bestD
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs) => {
      val k = ctx.freshName("k")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cv = ctx.freshName("cv")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val bestD = ctx.freshName("bestD")
      s"""
         |int $k = $cs.numElements();
         |if ($k == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $bestD = Long.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $cv = $cs.getArray($c);
         |    int $n = java.lang.Math.min($v.numElements(), $cv.numElements());
         |    long $d = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $t = $v.getLong($i) - $cv.getLong($i);
         |      $d += $t * $t;
         |    }
         |    if ($d < $bestD) $bestD = $d;
         |  }
         |  ${ev.value} = $bestD;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): NearestCentroidDist = copy(newLeft, newRight)
}
