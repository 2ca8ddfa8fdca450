package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Row-level vector kernels for the similarity family: a tight
  * primitive loop over `ArrayData` instead of the higher-order
  * `aggregate(zip_with(...))` fold (which allocates a zipped array
  * and evaluates two lambda closures per element). Summation is
  * left-to-right — the SAME order as the fold it replaces and as the
  * DuckDB `list_reduce` oracles, so results are bit-identical.
  */
object VecKernels {
  /** Null-element gate shared by every kernel: the folds these
    * kernels replace null-poison on a null element, while raw
    * `ArrayData` access would FABRICATE a value (UnsafeArrayData
    * reads 0.0 from a null slot) or NPE — neither is acceptable
    * under the fail-loud contract, so reject the row explicitly.
    */
  // checked IN the main loop of every kernel (one bit-test branch per
  // element) rather than as a separate pre-scan — a full extra pass
  // over both arrays would roughly double the memory traffic of the
  // hottest kernels (Lloyd / PQ assignment / ADC call these once per
  // (vector, centroid) pair)
  private def nullElem(name: String, i: Int): Nothing =
    throw new IllegalArgumentException(
      s"$name: null element at index $i — vector kernels require " +
        "dense arrays (the fold this replaces would null-poison; " +
        "filter or impute nulls upstream)")

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    // same boundary contract as [[sqDist]]: the zip_with fold this
    // replaces null-pads the shorter array and null-poisons, so a
    // truncated prefix-dot would FABRICATE a plausible similarity —
    // and the in-loop null gate only covers the overlapped prefix, so
    // without this require a null in the longer tail would be
    // silently accepted (ADVICE r15). Fail loud on mismatch.
    require(a.numElements() == b.numElements(),
      s"vec_dot: length mismatch ${a.numElements()} vs ${b.numElements()}")
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElem("vec_dot", i)
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  /** Pack a dense double tile into little-endian samples of the
    * declared dtype (SURVEY §7.4 BinaryType payloads; codes = sample
    * bit width: 8 Byte, 16 Int16, 32 Float32, 64 Float64). Integer
    * codes truncate like the GeoTIFF writer's `writeSample`; 64 is
    * bit-exact. ARRAY<DOUBLE> at rest is 8 bytes/pixel regardless of
    * source dtype — Int16 tiles shrink 4× in this form.
    */
  def tilePack(a: ArrayData, code: Int): Array[Byte] = {
    val n = a.numElements()
    code match {
      case 8 =>
        val out = new Array[Byte](n)
        var i = 0
        while (i < n) { out(i) = a.getDouble(i).toInt.toByte; i += 1 }
        out
      case 16 =>
        val out = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val v = a.getDouble(i).toInt.toShort
          out(i * 2) = v.toByte; out(i * 2 + 1) = (v >> 8).toByte
          i += 1
        }
        out
      case 32 =>
        val out = new Array[Byte](n * 4)
        var i = 0
        while (i < n) {
          val bits = java.lang.Float.floatToIntBits(a.getDouble(i).toFloat)
          var j = 0
          while (j < 4) { out(i * 4 + j) = (bits >>> (8 * j)).toByte; j += 1 }
          i += 1
        }
        out
      case 64 =>
        val out = new Array[Byte](n * 8)
        var i = 0
        while (i < n) {
          val bits = java.lang.Double.doubleToLongBits(a.getDouble(i))
          var j = 0
          while (j < 8) { out(i * 8 + j) = (bits >>> (8 * j)).toByte; j += 1 }
          i += 1
        }
        out
      case other => throw new IllegalArgumentException(s"tile_pack: bad dtype code $other")
    }
  }

  /** Inverse of [[tilePack]]: LE samples → doubles. Byte is unsigned
    * (TIFF convention); Int16 sign-extends.
    */
  def tileUnpack(b: Array[Byte], code: Int): ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val out: Array[Double] = code match {
      case 8 => Array.tabulate(b.length)(i => (b(i) & 0xff).toDouble)
      case 16 =>
        require(b.length % 2 == 0, "tile_unpack: odd Int16 payload")
        Array.tabulate(b.length / 2)(i =>
          (((b(i * 2 + 1) & 0xff) << 8) | (b(i * 2) & 0xff)).toShort.toDouble)
      case 32 =>
        require(b.length % 4 == 0, "tile_unpack: bad Float32 payload")
        Array.tabulate(b.length / 4) { i =>
          var bits = 0
          var j = 3
          while (j >= 0) { bits = (bits << 8) | (b(i * 4 + j) & 0xff); j -= 1 }
          java.lang.Float.intBitsToFloat(bits).toDouble
        }
      case 64 =>
        require(b.length % 8 == 0, "tile_unpack: bad Float64 payload")
        Array.tabulate(b.length / 8) { i =>
          var bits = 0L
          var j = 7
          while (j >= 0) { bits = (bits << 8) | (b(i * 8 + j) & 0xffL); j -= 1 }
          java.lang.Double.longBitsToDouble(bits)
        }
      case other => throw new IllegalArgumentException(s"tile_unpack: bad dtype code $other")
    }
    new GenericArrayData(out)
  }

  /** Squared Euclidean distance Σ (a_i − b_i)², left-to-right — the
    * SAME order and arithmetic as the `aggregate(zip_with(...))`
    * fold it replaces (each term is one subtract + one multiply, the
    * running sum adds in index order), so results are bit-identical
    * to the fold and to the DuckDB `list_reduce` oracles.
    */
  def sqDist(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    // the fold this replaces null-poisons on length mismatch; a
    // truncated distance would instead FABRICATE a plausible number
    // (and could win a top-k) — fail loud at the boundary. Same for
    // null elements (requireNoNulls): UnsafeArrayData reads 0.0 from
    // a null slot, which would silently shift the distance.
    require(a.numElements() == b.numElements(),
      s"vec_sqdist: length mismatch ${a.numElements()} vs ${b.numElements()}")
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) nullElem("vec_sqdist", i)
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    s
  }

  /** All `r` Johnson–Lindenstrauss ±1-signed components in one pass
    * (the Achlioptas projection of `Similarity.jlProject`): component
    * j folds x_i · s_{j,i} in ascending index order, with s the sign
    * of the repo LCG at (j + 101, i) — bit-equal to the higher-order
    * fold and to the oracle's `list_reduce` replay (multiplying by
    * ±1.0 is an exact sign flip).
    */
  def jlProject(a: ArrayData, r: Int, aFloat: Boolean): ArrayData = {
    require(r > 0, s"vec_jl_project: r must be positive, got $r")
    val n = a.numElements()
    var c = 0
    while (c < n) { if (a.isNullAt(c)) nullElem("vec_jl_project", c); c += 1 }
    val out = new Array[Double](r)
    var j = 0
    while (j < r) {
      var s = 0.0
      var i = 0
      while (i < n) {
        val w = if (((j.toLong + 101L) * 2654435761L + i.toLong * 40503L) % 2001L - 1000L >= 0) 1.0 else -1.0
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        s += x * w
        i += 1
      }
      out(j) = s
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** All `planes` hyperplane sign bits in one pass. The weight LCG and
    * the ascending-index summation order match the fold-based
    * `Similarity.bucketFoldCol` exactly (bit-equal buckets).
    */
  def lshBucket(a: ArrayData, planes: Int, aFloat: Boolean): Long = {
    val n = a.numElements()
    var c = 0
    while (c < n) { if (a.isNullAt(c)) nullElem("vec_lsh_bucket", c); c += 1 }
    var bucket = 0L
    var j = 0
    while (j < planes) {
      var s = 0.0
      var i = 0
      while (i < n) {
        val w = ((j.toLong * 2654435761L + i.toLong * 40503L) % 2001L - 1000L).toDouble
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        s += x * w
        i += 1
      }
      if (s >= 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }
}

/** `vec_dot(a, b)`: dot product of two numeric arrays (float or
  * double elements), as a native Catalyst expression with `doGenCode`
  * — stays inside whole-stage codegen, no per-element closure calls.
  * Contract: array elements are non-null (embedding columns).
  */
/** Shared analysis-time gate for the two-vector kernels: reject
  * anything but array<float|double> on BOTH sides (e.g. array<int>,
  * which the old casts-everything folds tolerated) so type errors
  * surface at analysis, not as a runtime IllegalArgumentException
  * mid-job (ADVICE r14).
  */
private[functions] trait TwoVectorTypeCheck { self: BinaryExpression =>
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<float|double>, array<float|double>), got ($l, $r)")
    }
}

case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with TwoVectorTypeCheck with Serializable {

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vec_dot expects array<float|double>, got $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecKernels.dot($a, $b, ${isFloat(left)}, ${isFloat(right)});")

  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(a: Expression, b: Expression): Expression =
    copy(left = a, right = b)
}

/** `vec_sqdist(a, b)`: squared Euclidean distance of two numeric
  * arrays as one codegen loop — bit-equal to the
  * `aggregate(zip_with((x−y)·(x−y)))` fold it replaces (same
  * left-to-right order; see [[VecKernels.sqDist]]).
  */
case class VecSqDist(left: Expression, right: Expression)
    extends BinaryExpression with TwoVectorTypeCheck with Serializable {

  override def dataType: DataType = DoubleType

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vec_sqdist expects array<float|double>, got $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecKernels.sqDist($a, $b, ${isFloat(left)}, ${isFloat(right)});")

  override def prettyName: String = "vec_sqdist"
  override protected def withNewChildrenInternal(a: Expression, b: Expression): Expression =
    copy(left = a, right = b)
}

/** `vec_jl_project(vec, r)`: all `r` JL ±1-signed projection
  * components in one codegen loop (vs `r` separate higher-order
  * folds); see [[VecKernels.jlProject]].
  */
case class VecJlProject(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (other, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_jl_project expects array<float|double>, got $other")
      case (_, badR) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_jl_project r must be int, got $badR")
    }

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vec_jl_project expects array<float|double>, got $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.jlProject(a.asInstanceOf[ArrayData], b.asInstanceOf[Int], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecKernels.jlProject($a, $b, $isFloat);")

  override def prettyName: String = "vec_jl_project"
  override protected def withNewChildrenInternal(a: Expression, b: Expression): Expression =
    copy(left = a, right = b)
}

/** `vec_lsh_bucket(vec, planes)`: all hyperplane sign bits in one
  * codegen loop (vs `planes` separate higher-order folds).
  */
case class VecLshBucket(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_lsh_bucket expects (array<float|double>, int), got ($l, $r)")
    }

  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"vec_lsh_bucket expects array<float|double>, got $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.lshBucket(a.asInstanceOf[ArrayData], b.asInstanceOf[Int], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecKernels.lshBucket($a, $b, $isFloat);")

  override def prettyName: String = "vec_lsh_bucket"
  override protected def withNewChildrenInternal(a: Expression, b: Expression): Expression =
    copy(left = a, right = b)
}

/** `tile_pack(data, code)`: ARRAY<DOUBLE> tile → BINARY of LE samples
  * at the dtype's width (8/16/32/64 — SURVEY §7.4's at-rest layout).
  */
case class TilePack(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (other, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tile_pack expects array<double>, got $other")
      case (_, badCode) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tile_pack dtype code must be int, got $badCode")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.tilePack(a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecKernels.tilePack($a, $b);")

  override def prettyName: String = "tile_pack"
  override protected def withNewChildrenInternal(a: Expression, b: Expression): Expression =
    copy(left = a, right = b)
}

/** `tile_unpack(bin, code)`: inverse of [[TilePack]]. */
case class TileUnpack(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.BinaryType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (other, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tile_unpack expects binary, got $other")
      case (_, badCode) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"tile_unpack dtype code must be int, got $badCode")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.tileUnpack(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecKernels.tileUnpack($a, $b);")

  override def prettyName: String = "tile_unpack"
  override protected def withNewChildrenInternal(a: Expression, b: Expression): Expression =
    copy(left = a, right = b)
}
