// Hosted under org.apache.spark.sql so the expressions can implement the
// private[sql] ExpectsInputTypes/AbstractDataType contract and wrap into
// Columns via the classic ExpressionUtils — the standard packaging for
// third-party native Catalyst expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** Native Catalyst expressions for dense-vector math over
  * `array<double>` columns.
  *
  * The built-in route (`aggregate(zip_with(...))`) runs on the
  * interpreted higher-order-function path — per-element lambda dispatch
  * and boxing, and it breaks whole-stage codegen around it. These
  * expressions generate a tight primitive loop instead (SURVEY.md §4's
  * "custom `Expression` only if benchmarks demand" — brute-force cosine
  * scoring is exactly that case: the dot product is the innermost loop of
  * an O(|Q|·|C|·d) operator).
  *
  * Null elements inside vectors are treated as 0; a null vector yields
  * null (standard null-safe semantics).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of an `array<double>` column — same codegen rationale as
  * [[VecDot]].
  */
case class VecNorm(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

/** Integer dot product of two `array<tinyint>` columns (int8-quantized
  * embeddings) — exact in long, so quantized similarity is
  * bit-reproducible across engines (no float summation order). Same
  * codegen rationale as [[VecDot]]: this is the innermost loop of
  * quantized brute-force scoring.
  */
case class VecDotI8(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.ByteType),
      ArrayType(org.apache.spark.sql.types.ByteType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "vec_dot_i8"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getByte(i).toLong * y.getByte(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((long) $a.getByte($i)) * $b.getByte($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotI8 =
    copy(left = newLeft, right = newRight)
}

/** Sum of squares of an `array<tinyint>` column, exact in long — the
  * norm input of quantized cosine. */
case class VecSumSqI8(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.ByteType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "vec_sumsq_i8"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getByte(i).toLong; s += v * v; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = (long) $a.getByte($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecSumSqI8 =
    copy(child = newChild)
}

/** Intersection size of two SORTED `array<bigint>` columns via a codegen'd
  * merge scan — the hot inner loop of set-similarity verification
  * (n-gram Jaccard over hashed shingles). The interpreted built-in
  * `array_intersect` hashes per element per pair (~20× slower here).
  * Inputs MUST be sorted ascending and duplicate-free (as produced by
  * `sort_array(transform(shingles, xxhash64))` over distinct shingles).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType),
      ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_long_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash of an `array<bigint>` token-hash column: bit j of the
  * result is set iff Σ_hashes sign(bit j) > 0. One tight 64×n loop per row
  * (the HOF formulation costs ~n×64 interpreted lambda dispatches).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val votes = new Array[Int](64)
    var k = 0
    while (k < n) {
      val h = x.getLong(k)
      var j = 0
      while (j < 64) {
        votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1); j += 1
      }
      k += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val votes = ctx.freshName("votes")
      val k = ctx.freshName("k"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[64];
         |for (int $k = 0; $k < $n; $k++) {
         |  long $h = $a.getLong($k);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $votes[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash LSH band buckets from an `array<bigint>` shingle-hash column:
  * `numBands` buckets, each combining `r` minhashes
  * `min_h mix(h, i)` (splitmix-style mix; plain wrapping long arithmetic —
  * generated Java, so no ANSI overflow checks). One k×n loop per row
  * replacing k interpreted `array_min(transform(...))` passes.
  */
case class MinHashBands(child: Expression, numBands: Int, r: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  @inline private def mix(h: Long, i: Int): Long = {
    var v = h ^ (0x9E3779B97F4A7C15L * (i + 1))
    v *= 0xBF58476D1CE4E5B9L
    v ^= v >>> 29
    v *= 0x94D049BB133111EBL
    v ^ (v >>> 32)
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var acc = 1125899906842597L
      var i = b * r
      while (i < (b + 1) * r) {
        var m = Long.MaxValue
        var k = 0
        while (k < n) {
          val v = mix(x.getLong(k), i)
          if (v < m) m = v
          k += 1
        }
        acc = acc * 31 + m
        i += 1
      }
      out(b) = acc
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val b = ctx.freshName("b"); val i = ctx.freshName("i")
      val k = ctx.freshName("k"); val m = ctx.freshName("m")
      val v = ctx.freshName("v"); val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$numBands];
         |for (int $b = 0; $b < $numBands; $b++) {
         |  long $acc = 1125899906842597L;
         |  for (int $i = $b * $r; $i < ($b + 1) * $r; $i++) {
         |    long $m = Long.MAX_VALUE;
         |    for (int $k = 0; $k < $n; $k++) {
         |      long $v = $a.getLong($k) ^ (0x9E3779B97F4A7C15L * ($i + 1));
         |      $v *= 0xBF58476D1CE4E5B9L;
         |      $v ^= $v >>> 29;
         |      $v *= 0x94D049BB133111EBL;
         |      $v ^= $v >>> 32;
         |      if ($v < $m) $m = $v;
         |    }
         |    $acc = $acc * 31L + $m;
         |  }
         |  $out[$b] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** N-gram hashes from an `array<bigint>` token-hash column: out[i] is a
  * mix of hashes i..i+n-1; inputs shorter than `n` yield one gram over
  * all tokens. Replaces `concat_ws` string-gram construction + string
  * re-hashing — the dominant interpreted cost of shingling (64-bit
  * combine collisions are negligible for dedup purposes).
  */
case class GramHash(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "n must be >= 1")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.LongType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "gram_hash"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val len = x.numElements()
    val m = math.max(len - n, 0)
    val out = new Array[Long](if (len == 0) 0 else m + 1)
    var i = 0
    while (i <= m && len > 0) {
      var acc = -7046029254386353131L
      var j = i
      val end = math.min(i + n, len)
      while (j < end) {
        acc = (acc ^ x.getLong(j)) * -5840758589994634535L
        acc ^= (acc >>> 32)
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val len = ctx.freshName("len"); val m = ctx.freshName("m")
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val acc = ctx.freshName("acc")
      val end = ctx.freshName("end")
      s"""
         |int $len = $a.numElements();
         |int $m = java.lang.Math.max($len - $n, 0);
         |long[] $out = new long[$len == 0 ? 0 : $m + 1];
         |for (int $i = 0; $i <= $m && $len > 0; $i++) {
         |  long $acc = -7046029254386353131L;
         |  int $end = java.lang.Math.min($i + $n, $len);
         |  for (int $j = $i; $j < $end; $j++) {
         |    $acc = ($acc ^ $a.getLong($j)) * -5840758589994634535L;
         |    $acc ^= ($acc >>> 32);
         |  }
         |  $out[$i] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GramHash =
    copy(child = newChild)
}

/** One-pass symmetric int8 quantization of an `array<double>` vector →
  * `struct<scale: double, q8: array<tinyint>>`. Declaratively this is
  * three stacked HOFs (`array_max(transform(abs))` for the scale, then a
  * `transform` with round/clamp per element) — and because the scale is
  * referenced inside the per-element lambda, `CollapseProject` inlines
  * the whole max-abs sub-plan into EVERY element's lambda, turning the
  * projection O(d²) with an interpreted lambda dispatch and a boxed
  * array allocation per element (measured ~1 ms/row at d = 64: the
  * entire cost of the quantization queries). This expression is the same
  * arithmetic in one generated d-element loop.
  *
  * Bit-compatibility: rounding is the exact code Spark's own `Round`
  * generates for doubles (`BigDecimal.valueOf(v).setScale(0, HALF_UP)`),
  * so results are identical to the HOF formulation — and to DuckDB's
  * ties-away-from-zero `round()` (oracle-checked).
  *
  * Null semantics: null vector → null struct; null element → null code;
  * non-null elements of a scale-0 vector (all observed values zero, or
  * empty/all-null vector) → literal 0. (The original HOF formulation
  * silently mapped null elements to −127 — `greatest(null, lit(-127))`
  * SKIPS nulls — which this expression deliberately does not replicate;
  * the differential spec pins the corrected behavior on both paths.)
  */
case class VecQuant8(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  import org.apache.spark.sql.types.{ByteType, StructField, StructType}

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q8", ArrayType(ByteType, containsNull = true), nullable = false)))
  override def prettyName: String = "vec_quant_i8"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) {
        val v = math.abs(x.getDouble(i))
        if (v > mx) mx = v
      }
      i += 1
    }
    val scale = mx / 127
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      if (x.isNullAt(i)) out(i) = null
      else if (scale == 0) out(i) = 0.toByte
      else {
        val r = java.math.BigDecimal.valueOf(x.getDouble(i) / scale)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
        out(i) = math.min(math.max(r, -127.0), 127.0).toInt.toByte
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      scale, new org.apache.spark.sql.catalyst.util.GenericArrayData(out))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val mx = ctx.freshName("mx"); val v = ctx.freshName("v")
      val scale = ctx.freshName("scale"); val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      s"""
         |int $n = $a.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $v = java.lang.Math.abs($a.getDouble($i));
         |    if ($v > $mx) $mx = $v;
         |  }
         |}
         |double $scale = $mx / 127;
         |Object[] $out = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    $out[$i] = null;
         |  } else if ($scale == 0) {
         |    $out[$i] = java.lang.Byte.valueOf((byte) 0);
         |  } else {
         |    double $r = java.math.BigDecimal.valueOf($a.getDouble($i) / $scale)
         |      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue();
         |    $out[$i] = java.lang.Byte.valueOf(
         |      (byte) (int) java.lang.Math.min(java.lang.Math.max($r, -127.0), 127.0));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ java.lang.Double.valueOf($scale),
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecQuant8 =
    copy(child = newChild)
}

/** Nearest-centroid assignment by cosine: index (0-based) of the
  * max-cosine centroid, ties to the SMALLEST index; zero-norm pairs
  * score 0.0 — bit-identical to the composed form
  * `argmax_j cosine(v, centroids(j))` it replaces.
  *
  * Why an expression and not `array_max(array(struct(cosine…)))`: the
  * composed form inlines k dot-product loops + struct construction into
  * the consuming stage's generated method. At k = 16 that pushed the
  * IVF probe-join stage past the JVM JIT's compilable-method size, so
  * the whole join loop ran in the bytecode interpreter — measured 60×
  * slower than this compact runtime loop (the centroid matrix is a
  * reference object, the generated code is k-independent; see
  * SCALING.md round 9). The same fix serves every centroid count.
  */
case class VecNearestCosine(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression with ExpectsInputTypes {
  require(centroids.nonEmpty, "need at least one centroid")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "vec_nearest_cosine"

  @transient private lazy val mat: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val cnorms: Array[Double] =
    mat.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var vn = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); vn += v * v; i += 1 }
    vn = math.sqrt(vn)
    var best = 0
    var bc = Double.NegativeInfinity
    var j = 0
    while (j < mat.length) {
      val c = mat(j)
      val m = math.min(n, c.length)
      var d = 0.0
      var k = 0
      while (k < m) { d += x.getDouble(k) * c(k); k += 1 }
      val p = vn * cnorms(j)
      val cs = if (p == 0.0) 0.0 else d / p
      if (cs > bc) { bc = cs; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val matRef = ctx.addReferenceObj("centroids", mat, "double[][]")
      val nrmRef = ctx.addReferenceObj("cnorms", cnorms, "double[]")
      val n = ctx.freshName("n")
      val vn = ctx.freshName("vn")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val m = ctx.freshName("m")
      val d = ctx.freshName("d")
      val k = ctx.freshName("k")
      val p = ctx.freshName("p")
      val cs = ctx.freshName("cs")
      val best = ctx.freshName("best")
      val bc = ctx.freshName("bc")
      val v = ctx.freshName("v") // freshName like every other local: a
      // hardcoded `v` colliding with an enclosing scope would make Janino
      // reject the stage — interpreter fallback, the failure this
      // expression exists to avoid
      s"""
         |int $n = $a.numElements();
         |double $vn = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i); $vn += $v * $v;
         |}
         |$vn = java.lang.Math.sqrt($vn);
         |int $best = 0;
         |double $bc = java.lang.Double.NEGATIVE_INFINITY;
         |for (int $j = 0; $j < $matRef.length; $j++) {
         |  double[] $c = $matRef[$j];
         |  int $m = java.lang.Math.min($n, $c.length);
         |  double $d = 0.0;
         |  for (int $k = 0; $k < $m; $k++) { $d += $a.getDouble($k) * $c[$k]; }
         |  double $p = $vn * $nrmRef[$j];
         |  double $cs = ($p == 0.0) ? 0.0 : $d / $p;
         |  if ($cs > $bc) { $bc = $cs; $best = $j; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNearestCosine =
    copy(child = newChild)
}

/** Top-`nprobe` centroid indices by cosine, best first, ties to the
  * smallest index — the probe-list companion of [[VecNearestCosine]]
  * (nprobe = 1 head ≡ its result). Evaluates on the QUERY side only
  * (tiny, broadcast), so the generated code just calls back into the
  * expression object — one virtual call per row keeps the consuming
  * stage's method small, which is the entire point (see
  * [[VecNearestCosine]]).
  */
case class VecTopCosine(child: Expression, centroids: Seq[Seq[Double]], nprobe: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(centroids.nonEmpty, "need at least one centroid")
  require(nprobe > 0, "nprobe must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "vec_top_cosine"

  @transient private lazy val mat: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val cnorms: Array[Double] =
    mat.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

  /** Selection loop shared by eval and generated code. */
  def select(x: ArrayData): Array[Int] = {
    val n = x.numElements()
    var vn = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); vn += v * v; i += 1 }
    vn = math.sqrt(vn)
    val cos = new Array[Double](mat.length)
    var j = 0
    while (j < mat.length) {
      val c = mat(j)
      val m = math.min(n, c.length)
      var d = 0.0
      var k = 0
      while (k < m) { d += x.getDouble(k) * c(k); k += 1 }
      val p = vn * cnorms(j)
      cos(j) = if (p == 0.0) 0.0 else d / p
      j += 1
    }
    val out = new Array[Int](math.min(nprobe, mat.length))
    val taken = new Array[Boolean](mat.length)
    var s = 0
    while (s < out.length) {
      var best = -1
      var jj = 0
      while (jj < mat.length) {
        if (!taken(jj) && (best < 0 || cos(jj) > cos(best))) best = jj
        jj += 1
      }
      taken(best) = true
      out(s) = best
      s += 1
    }
    out
  }

  override protected def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      select(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("topCosine", this, classOf[VecTopCosine].getName)
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $ref.select($a));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecTopCosine =
    copy(child = newChild)
}

/** Nearest-centroid assignment by exact integer squared distance over
  * `array<long>` fixed-point vectors: `struct(dist, cluster)` of the
  * argmin centroid, ties to the smallest cluster id — bit-identical to
  * the composed form (`array_min` over k inline
  * `aggregate(zip_with(...))` structs) it replaces in the integer
  * Lloyd loop. Same motivation as [[VecNearestCosine]]: the composed
  * form unrolls k interpreted higher-order-function chains per row
  * (breaking whole-stage codegen around the assignment scan); here the
  * centroid table is a reference object and the generated code is one
  * virtual call into the JIT-compiled selection loop.
  */
case class VecNearestSqLong(child: Expression, centroids: Seq[Seq[Long]])
    extends UnaryExpression with ExpectsInputTypes {
  require(centroids.nonEmpty, "need at least one centroid")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = StructType(Seq(
    StructField("dist", LongType, nullable = false),
    StructField("cluster", IntegerType, nullable = false)))
  override def prettyName: String = "vec_nearest_sq"

  @transient private lazy val mat: Array[Array[Long]] =
    centroids.map(_.toArray).toArray

  /** Selection loop shared by eval and generated code. */
  def nearest(x: ArrayData): InternalRow = {
    val n = x.numElements()
    var best = 0
    var bd = Long.MaxValue
    var j = 0
    while (j < mat.length) {
      val c = mat(j)
      val m = math.min(n, c.length)
      var d = 0L
      var w = 0
      while (w < m) {
        val t = x.getLong(w) - c(w); d += t * t; w += 1
      }
      if (d < bd) { bd = d; best = j }
      j += 1
    }
    new GenericInternalRow(Array[Any](bd, best))
  }

  override protected def nullSafeEval(a: Any): Any =
    nearest(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("nearestSq", this,
        classOf[VecNearestSqLong].getName)
      s"${ev.value} = $ref.nearest($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): VecNearestSqLong =
    copy(child = newChild)
}

/** All `m` product-quantization codes of a fixed-point `array<long>`
  * vector in ONE pass: code `s` = argmin over `codebooks(s)` of the
  * exact integer squared distance of subvector `s`, ties to the
  * smallest code — bit-identical to the per-subspace composed argmin
  * ([[graft.similarity.PqAnn]]'s original `subCode` chain, which
  * unrolled m·ksub interpreted HOF folds into the encode projection).
  */
case class VecPqCodes(child: Expression, codebooks: Seq[Seq[Seq[Long]]])
    extends UnaryExpression with ExpectsInputTypes {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebooks")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "vec_pq_codes"

  @transient private lazy val mat: Array[Array[Array[Long]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  /** Encode loop shared by eval and generated code. */
  def encode(x: ArrayData): Array[Int] = {
    val n = x.numElements()
    val out = new Array[Int](mat.length)
    var si = 0
    var off = 0
    while (si < mat.length) {
      val cb = mat(si)
      val dsub = cb(0).length
      var best = 0
      var bd = Long.MaxValue
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var d = 0L
        var w = 0
        while (w < dsub && off + w < n) {
          val t = x.getLong(off + w) - c(w); d += t * t; w += 1
        }
        if (d < bd) { bd = d; best = j }
        j += 1
      }
      out(si) = best
      off += dsub
      si += 1
    }
    out
  }

  override protected def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      encode(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("pqCodes", this, classOf[VecPqCodes].getName)
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $ref.encode($a));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecPqCodes =
    copy(child = newChild)
}

/** The full ADC lookup table of a fixed-point query vector in ONE
  * pass: `lut(s)(j)` = exact integer squared distance of subvector `s`
  * to `codebooks(s)(j)` — bit-identical to the composed m·ksub
  * `aggregate(zip_with(slice...))` chain it replaces
  * ([[graft.similarity.PqAnn.Model.lutQuantized]]'s original form). At
  * the m·ksub = 64 demo budget the composed form was tolerable; at
  * production ksub = 256 its 2048 interpreted HOF entries dominated
  * the whole search (`graft.AnnProbe`: 17.6 s vs 1.6 s at ksub = 8,
  * SLOWER than its own whole-stage-codegen-off control — the round-9
  * generated-code-size cliff on the query side). Same table-carrying
  * design as [[VecPqCodes]]: the codebook tensor rides along as a
  * reference object, the loop is one compiled method.
  */
case class VecPqLut(child: Expression, codebooks: Seq[Seq[Seq[Long]]])
    extends UnaryExpression with ExpectsInputTypes {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty), "empty codebooks")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "vec_pq_lut"

  @transient private lazy val mat: Array[Array[Array[Long]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  /** LUT loop shared by eval and generated code. Subvectors short of
    * the codebook width contribute only their present components —
    * the [[VecPqCodes]] convention (well-formed corpora are fixed-dim;
    * the trainers enforce it). */
  def lut(x: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = x.numElements()
    val out = new Array[Any](mat.length)
    var si = 0
    var off = 0
    while (si < mat.length) {
      val cb = mat(si)
      val dsub = cb(0).length
      val row = new Array[Long](cb.length)
      var j = 0
      while (j < cb.length) {
        val c = cb(j)
        var d = 0L
        var w = 0
        while (w < dsub && off + w < n) {
          val t = x.getLong(off + w) - c(w); d += t * t; w += 1
        }
        row(j) = d
        j += 1
      }
      out(si) = new org.apache.spark.sql.catalyst.util.GenericArrayData(row)
      off += dsub
      si += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any): Any =
    lut(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("pqLut", this, classOf[VecPqLut].getName)
      s"${ev.value} = $ref.lut($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): VecPqLut =
    copy(child = newChild)
}

/** Asymmetric-distance sum: `sum_i lut[i][codes[i]]` — the
  * per-candidate inner loop of PQ search. Both inputs are row data
  * (codes from the corpus side, the lookup table from the broadcast
  * query side), so this generates a tight inline loop — the composed
  * `aggregate(zip_with(codes, lut, element_at))` ran per joined pair on
  * the interpreted HOF path.
  */
case class VecAdc(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(ArrayType(LongType)))
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_adc"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val n = math.min(codes.numElements(), lut.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += lut.getArray(i).getLong(codes.getInt(i)); i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $b.getArray($i).getLong($a.getInt($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecAdc =
    copy(left = newLeft, right = newRight)
}

/** All LSH table signatures of a vector in ONE pass:
  * `result(t)` = Σ_i (1 << i) · [v · planes(t)(i) > 0] — bit-identical
  * to the composed form (numTables · numBits inline `when(vec_dot > 0)`
  * sums) it replaces; same generated-code-size rationale as
  * [[VecNearestCosine]], with the plane tensor as a reference object.
  */
case class VecLshSignatures(child: Expression, planes: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with ExpectsInputTypes {
  require(planes.nonEmpty && planes.forall(_.nonEmpty), "empty plane tables")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_lsh_signatures"

  @transient private lazy val mat: Array[Array[Array[Double]]] =
    planes.map(_.map(_.toArray).toArray).toArray

  /** Signature loop shared by eval and generated code. */
  def sign(x: ArrayData): Array[Long] = {
    val n = x.numElements()
    val out = new Array[Long](mat.length)
    var t = 0
    while (t < mat.length) {
      val tbl = mat(t)
      var sig = 0L
      var i = 0
      while (i < tbl.length) {
        val h = tbl(i)
        val m = math.min(n, h.length)
        var d = 0.0
        var k = 0
        while (k < m) { d += x.getDouble(k) * h(k); k += 1 }
        if (d > 0) sig |= 1L << i
        i += 1
      }
      out(t) = sig
      t += 1
    }
    out
  }

  override protected def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sign(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("lshSign", this,
        classOf[VecLshSignatures].getName)
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $ref.sign($a));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecLshSignatures =
    copy(child = newChild)
}

/** Dense matrix projection: `out(j) = (v · rows(j)) / scale` — the
  * whole Johnson–Lindenstrauss (or any fixed linear) projection in one
  * native pass, bit-identical to the composed per-output-dim
  * `vec_dot / scale` array it replaces. Same generated-code-size
  * rationale as [[VecNearestCosine]]: the matrix rides along as a
  * reference object instead of dimOut inline dot loops.
  */
case class VecProject(child: Expression, rows: Seq[Seq[Double]], scale: Double)
    extends UnaryExpression with ExpectsInputTypes {
  require(rows.nonEmpty, "need at least one projection row")
  require(scale != 0.0, "scale must be non-zero")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_project"

  @transient private lazy val mat: Array[Array[Double]] =
    rows.map(_.toArray).toArray

  /** Projection loop shared by eval and generated code. */
  def project(x: ArrayData): Array[Double] = {
    val n = x.numElements()
    val out = new Array[Double](mat.length)
    var j = 0
    while (j < mat.length) {
      val r = mat(j)
      val m = math.min(n, r.length)
      var d = 0.0
      var i = 0
      while (i < m) { d += x.getDouble(i) * r(i); i += 1 }
      out(j) = d / scale
      j += 1
    }
    out
  }

  override protected def nullSafeEval(a: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      project(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("vecProject", this, classOf[VecProject].getName)
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $ref.project($a));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecProject =
    copy(child = newChild)
}

/** Column-API entry points for the native vector expressions. */
object VecFunctions {

  private def expr(c: Column): Expression = ExpressionUtils.expression(c)

  def vec_dot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDot(expr(a), expr(b)))

  def vec_norm(a: Column): Column =
    ExpressionUtils.column(VecNorm(expr(a)))

  def vec_nearest_cosine(a: Column, centroids: Seq[Seq[Double]]): Column =
    ExpressionUtils.column(VecNearestCosine(expr(a), centroids))

  def vec_top_cosine(a: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    ExpressionUtils.column(VecTopCosine(expr(a), centroids, nprobe))

  def vec_nearest_sq(a: Column, centroids: Seq[Seq[Long]]): Column =
    ExpressionUtils.column(VecNearestSqLong(expr(a), centroids))

  def vec_pq_codes(a: Column, codebooks: Seq[Seq[Seq[Long]]]): Column =
    ExpressionUtils.column(VecPqCodes(expr(a), codebooks))

  def vec_pq_lut(a: Column, codebooks: Seq[Seq[Seq[Long]]]): Column =
    ExpressionUtils.column(VecPqLut(expr(a), codebooks))

  def vec_adc(codes: Column, lut: Column): Column =
    ExpressionUtils.column(VecAdc(expr(codes), expr(lut)))

  def vec_lsh_signatures(a: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    ExpressionUtils.column(VecLshSignatures(expr(a), planes))

  def vec_project(a: Column, rows: Seq[Seq[Double]], scale: Double): Column =
    ExpressionUtils.column(VecProject(expr(a), rows, scale))

  def vec_dot_i8(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDotI8(expr(a), expr(b)))

  def vec_sumsq_i8(a: Column): Column =
    ExpressionUtils.column(VecSumSqI8(expr(a)))

  def sorted_long_intersect_count(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedLongIntersectCount(expr(a), expr(b)))

  def simhash64(a: Column): Column =
    ExpressionUtils.column(SimHash64(expr(a)))

  def minhash_bands(a: Column, numBands: Int, r: Int): Column =
    ExpressionUtils.column(MinHashBands(expr(a), numBands, r))

  def gram_hash(a: Column, n: Int): Column =
    ExpressionUtils.column(GramHash(expr(a), n))

  def vec_quant_i8(a: Column): Column =
    ExpressionUtils.column(VecQuant8(expr(a)))
}
