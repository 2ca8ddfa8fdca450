package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Row-level vector kernels for the similarity family: a tight
  * primitive loop over `ArrayData` instead of the higher-order
  * `aggregate(zip_with(...))` fold (which allocates a zipped array
  * and evaluates two lambda closures per element). Summation is
  * left-to-right — the SAME order as the fold it replaces and as the
  * DuckDB `list_reduce` oracles, so results are bit-identical.
  */
object VecKernels {
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  /** All `planes` hyperplane sign bits in one pass. The weight LCG and
    * the ascending-index summation order match the fold-based
    * `Similarity.bucketFoldCol` exactly (bit-equal buckets).
    */
  def lshBucket(a: ArrayData, planes: Int, aFloat: Boolean): Long = {
    val n = a.numElements()
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
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

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

/** `vec_lsh_bucket(vec, planes)`: all hyperplane sign bits in one
  * codegen loop (vs `planes` separate higher-order folds).
  */
case class VecLshBucket(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

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
