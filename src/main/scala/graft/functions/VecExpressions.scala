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
