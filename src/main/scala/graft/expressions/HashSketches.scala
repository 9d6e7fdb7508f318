package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass kernels behind [[SimHash64]] and [[MinHashSignature]].
  *
  * Both sketches are definable with built-in higher-order functions — and
  * were, through round 2 — but the composed forms pay Catalyst's lambda
  * machinery per BIT (SimHash folds the token-hash array 64 times) or per
  * SEED (MinHash runs k nested `transform` lambdas per row): measured 21.3 s
  * and 17.4 s at sf0.1, 35% of the whole bench. These kernels make the one
  * pass the algorithms actually need, calling the same `XXH64` primitives
  * Spark's `xxhash64` uses, so every output bit matches the composed
  * expressions (pinned by ExtensionOpsSpec).
  *
  * Kept in a standalone object (not the expression companions) so the
  * generated Java can call them as static methods unambiguously.
  */
object HashKernels {

  /** Spark's default xxhash64 seed (`XxHash64.seed`). */
  private val Seed = 42L

  /** Bit-identical to
    * `aggregate(sequence(0,63), 0L, (acc,i) -> acc | CASE WHEN
    * aggregate(transform(split(text,' '), t -> xxhash64(t)), 0L,
    * (v,h) -> v + CASE WHEN (shiftright(h,i) & 1) = 1 THEN 1 ELSE -1 END) > 0
    * THEN shiftleft(1L,i) ELSE 0L END)`: one pass over the space-split
    * tokens, updating all 64 vote counters per token hash. `split(text,' ')`
    * with Java regex semantics keeps every empty segment (leading, internal
    * runs, trailing — limit is -1), so the byte scan emits a token at every
    * space boundary including zero-length ones; 0x20 never occurs inside a
    * multi-byte UTF-8 sequence, so byte-level splitting is exact.
    */
  def simhash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        val h = XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) r |= (1L << b)
      b += 1
    }
    r
  }

  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Engine-replayable SimHash — bit-identical to
    * `graft.ops.Dedup.simhashReplayable64Composed` (pinned by
    * ExtensionOpsSpec): per space-split token (empty segments kept, as in
    * [[simhash64]]), the token hash is md5's first 8 bytes read as two
    * big-endian 32-bit halves packed `(hi << 32) | lo` — exactly the
    * `conv(substring(md5(t), 1|9, 8), 16, 10)` fold any engine with md5 +
    * string ops reproduces (the DuckDB oracle refolds it per hex digit).
    * The composed form pays two 32-bit higher-order-function folds per row
    * — the same per-bit lambda tax that made composed SimHash64 21.3 s at
    * sf0.1 — where this kernel makes the one pass the algorithm needs.
    * Votes per bit position are independent, so a single 64-bit vote over
    * the packed hash equals the composed form's two 32-bit votes.
    */
  def simhashMd5(s: UTF8String): Long = {
    val md = md5Local.get()
    val bytes = s.getBytes
    val n = bytes.length
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        val lo = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val hi = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        val h = (hi << 32) | lo
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) r |= (1L << b)
      b += 1
    }
    r
  }

  /** Bit-identical to the composed
    * `transform(sequence(0, k-1), i -> array_min(transform(shingles, t ->
    * xxhash64(i, t))))` over `array_distinct` shingles: the k chained seeds
    * are `hashInt(i, 42)` exactly as the two-argument `xxhash64(i, t)`
    * computes them, distinctness is by shingle VALUE (UTF8String equality ==
    * byte equality, matching `array_distinct`), and the running minima use
    * signed long order like `array_min`. Token mode (shingleSize <= 1)
    * splits on 0x20 keeping empty segments (see [[simhash64]]); char mode
    * takes every `substring(text, i, shingleSize)` for i in
    * 1..max(numChars-shingleSize+1, 1), the composed `sequence` bounds.
    */
  def minhashSignature(s: UTF8String, k: Int, shingleSize: Int): ArrayData = {
    val seeds = new Array[Long](k)
    var i = 0
    while (i < k) { seeds(i) = XXH64.hashInt(i, Seed); i += 1 }
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val seen = new java.util.HashSet[UTF8String]()

    def absorb(base: AnyRef, offset: Long, numBytes: Int): Unit = {
      var j = 0
      while (j < k) {
        val h = XXH64.hashUnsafeBytes(base, offset, numBytes, seeds(j))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
    }

    if (shingleSize <= 1) {
      val bytes = s.getBytes
      val n = bytes.length
      var start = 0
      var p = 0
      while (p <= n) {
        if (p == n || bytes(p) == 0x20) {
          if (seen.add(UTF8String.fromBytes(bytes, start, p - start)))
            absorb(bytes, Platform.BYTE_ARRAY_OFFSET + start, p - start)
          start = p + 1
        }
        p += 1
      }
    } else {
      val count = math.max(s.numChars() - shingleSize + 1, 1)
      var idx = 1
      while (idx <= count) {
        val sh = s.substringSQL(idx, shingleSize)
        if (seen.add(sh))
          absorb(sh.getBaseObject, sh.getBaseOffset, sh.numBytes)
        idx += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Hyperplane cap — the single definition; `Similarity.SrpMaxDim`
    * aliases it so the fused kernel and the composed reference can never
    * disagree about the supported width.
    */
  val SrpMaxDim = 512

  /** ±1 hyperplane signs, row r / dim d = sign bit of the same
    * `xxhash64(r, d)` chain the composed formulation literalizes
    * (`hashInt(d, hashInt(r, 42))`), memoized per row count.
    */
  private val srpSignCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Array[Double]]]()

  private def srpSigns(rows: Int): Array[Array[Double]] =
    srpSignCache.computeIfAbsent(rows, r =>
      Array.tabulate(r, SrpMaxDim) { (i, d) =>
        if ((XXH64.hashInt(d, XXH64.hashInt(i, Seed)) & 1L) == 1L) 1.0 else -1.0
      })

  /** Bit-identical to the composed `srpBuckets` fold: table t's bucket
    * sets bit i iff the dot product of the (cast-to-double) vector with
    * hyperplane row t·bits+i is > 0, accumulating element products left
    * to right from 0.0; an empty vector yields bucket 0 per table, and a
    * vector containing ANY null element yields all-zero buckets (the
    * composed fold's null poisons every dot product, so `when(null > 0)`
    * sets no bit — replicated here exactly). Fails loudly past
    * [[SrpMaxDim]] like the composed form's out-of-bounds sign lookup.
    */
  def srpBuckets(v: ArrayData, bits: Int, tables: Int): ArrayData = {
    val n = v.numElements()
    if (n > SrpMaxDim)
      throw new IllegalArgumentException(
        s"vector has $n dims, past the SRP hyperplane cap $SrpMaxDim")
    val signs = srpSigns(bits * tables)
    val out = new Array[Long](tables)
    var hasNull = false
    var c = 0
    while (c < n) { if (v.isNullAt(c)) hasNull = true; c += 1 }
    if (n > 0 && !hasNull) {
      var t = 0
      while (t < tables) {
        var bucket = 0L
        var i = 0
        while (i < bits) {
          val row = signs(t * bits + i)
          var dot = 0.0
          var d = 0
          while (d < n) { dot += v.getFloat(d).toDouble * row(d); d += 1 }
          if (dot > 0.0) bucket |= (1L << i)
          i += 1
        }
        out(t) = bucket
        t += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** 64-bit SimHash of a space-tokenized string as a native codegen'd
  * expression — the fused replacement for the 64-fold interpretive
  * aggregate (see [[HashKernels.simhash64]] for the exact composed form it
  * matches bit-for-bit). Same preference-order justification as
  * [[CosineSimilarity]]: built-ins first, a custom Expression only where
  * the built-in shape can't express the performance need.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HashKernels.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(newChild)
}

object SimHash64 {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Column-API entry point. */
  def simhash(text: Column): Column = column(SimHash64(expression(text)))
}

/** Engine-replayable md5-fold SimHash as a native codegen'd expression —
  * the fused form of [[HashKernels.simhashMd5]] (see there for the exact
  * composed semantics it matches bit-for-bit). Exists so the
  * oracle-replayable fingerprint can run over the FULL corpus at bench
  * scale: the composed two-half HOF fold pays Catalyst's per-bit lambda
  * machinery exactly like composed SimHash64 did (21.3 s at sf0.1).
  */
case class SimHashMd5(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HashKernels.simhashMd5(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashKernels.simhashMd5($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(newChild)
}

object SimHashMd5 {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Column-API entry point. */
  def simhash(text: Column): Column = column(SimHashMd5(expression(text)))
}

/** k-wide MinHash signature (`ARRAY<BIGINT>`) as a native codegen'd
  * expression — one pass over the distinct shingles updating all k minima
  * (see [[HashKernels.minhashSignature]] for the exact composed form it
  * matches bit-for-bit). k and shingleSize are plan-time constants, as in
  * the composed formulation where they shaped the generated SQL.
  */
case class MinHashSignature(child: Expression, k: Int, shingleSize: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k >= 1, s"k=$k must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.minhashSignature(input.asInstanceOf[UTF8String], k, shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.HashKernels.minhashSignature($c, $k, $shingleSize)")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}

object MinHashSignature {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Column-API entry point. */
  def signature(text: Column, k: Int, shingleSize: Int = 1): Column =
    column(MinHashSignature(expression(text), k, shingleSize))
}

/** All `tables` sign-random-projection buckets of an `ARRAY<FLOAT>`
  * embedding as a native codegen'd expression — the fused replacement for
  * the composed higher-order-function formulation in
  * `Similarity.srpBucketsComposed` (kept as the spec's reference): per
  * row that form pays Catalyst's lambda machinery for tables × bits ×
  * dim element lookups (4096 lambda evaluations at the graded b=4/L=16
  * over 64-dim vectors — measured 2.7 s of the sf0.1 bench once the
  * bench stopped letting Catalyst prune it). One fused triple loop over
  * the same ±1 hyperplane signs (derived from the identical
  * `xxhash64(i, d)` chain, memoized per row count) with the same
  * left-to-right double accumulation — bit-identical buckets.
  */
case class SrpBuckets(child: Expression, bits: Int, tables: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(bits >= 1 && tables >= 1, s"bits=$bits tables=$tables must be >= 1")

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(org.apache.spark.sql.types.FloatType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashKernels.srpBuckets(input.asInstanceOf[ArrayData], bits, tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.HashKernels.srpBuckets($c, $bits, $tables)")

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
}

object SrpBuckets {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Column-API entry point. */
  def buckets(vec: Column, bits: Int, tables: Int): Column =
    column(SrpBuckets(expression(vec), bits, tables))
}

/** 0-based index of the first position where two `ARRAY<BIGINT>` columns
  * agree (-1 if none) — the dedup predicate for LSH banded self-joins:
  * keeping a colliding pair only where `first_agreeing_index(bands_a,
  * bands_b) = band` emits each candidate pair exactly once, replacing a
  * full `distinct` exchange over the exploded pair stream (measured 23M
  * pre-distinct rows → 8M pairs at sf0.1: the distinct was ~70% of the
  * banded-join cost) with an in-stage codegen'd filter. Equivalent to the
  * composed `array_position(zip_with(a, b, (x, y) -> x = y), true) - 1`
  * without the per-pair boolean-array allocation.
  */
case class FirstAgreeingIndex(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
        return i
      i += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val found = ctx.freshName("found")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $found = -1;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)
         |      && $a.getLong($i) == $b.getLong($i)) { $found = $i; break; }
         |}
         |${ev.value} = $found;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FirstAgreeingIndex = copy(newLeft, newRight)
}

object FirstAgreeingIndex {
  import org.apache.spark.sql.GraftExpressionBridge._

  /** Column-API entry point. */
  def firstAgree(a: Column, b: Column): Column =
    column(FirstAgreeingIndex(expression(a), expression(b)))
}
