package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.graftshim.TypeShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector expressions over Array[Float]/Array[Double] columns.
  *
  * Semantics are EXACTLY a left-to-right double fold (each element
  * cast to double, accumulated in order) — bit-identical to the
  * composable `aggregate(zip_with(...))` formulation and to a DuckDB
  * `list_reduce` oracle — but codegen'd: the higher-order-function
  * chain is CodegenFallback (interpreted, allocation per element) and
  * dominated every vector-heavy profile (SURVEY.md §5).
  */
object VecExprs {

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }


  /** Left-to-right Σ a_i·b_i in double precision. Static so generated
    * code can call it directly. */
  def dotCompute(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    // guard the shorter side: reading past an UnsafeArrayData's end is
    // silent garbage, not an error
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    // analysis-time enforcement: array<float>|array<double> only
    override def inputTypes = TypeShim.vecPair
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"
    private def aF: Boolean = isFloatArray(left.dataType)
    private def bF: Boolean = isFloatArray(right.dataType)
    override def nullSafeEval(a: Any, b: Any): Any =
      dotCompute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.plans.VecExprs.dotCompute($a, $b, $aF, $bF);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  case class L2Norm(child: Expression) extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = TypeShim.vecOne
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_norm"
    private def aF: Boolean = isFloatArray(child.dataType)
    override def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      math.sqrt(dotCompute(arr, arr, aF, aF))
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = java.lang.Math.sqrt(graft.plans.VecExprs.dotCompute($a, $a, $aF, $aF));")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Element-wise a_i·b_i in double precision (truncates to the
    * shorter side, same guard as dotCompute). Static so generated
    * code calls it directly. */
  def elemProductCompute(a: ArrayData, b: ArrayData,
      aF: Boolean, bF: Boolean): ArrayData = {
    val n = math.min(a.numElements(), b.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      out(i) = x * y
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Codegen element-wise product — the pairwise-feature hot path
    * (q43/q64 build |pairs|×dim product vectors; the zip_with
    * formulation is CodegenFallback with per-element allocation). */
  case class ElemProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = TypeShim.vecPair
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "vec_elem_product"
    private def aF: Boolean = isFloatArray(left.dataType)
    private def bF: Boolean = isFloatArray(right.dataType)
    override def nullSafeEval(a: Any, b: Any): Any =
      elemProductCompute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], aF, bF)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.plans.VecExprs.elemProductCompute($a, $b, $aF, $bF);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  def dot(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  def norm(a: Column): Column =
    ColumnShim.column(L2Norm(ColumnShim.expression(a)))

  def elemProduct(a: Column, b: Column): Column =
    ColumnShim.column(ElemProduct(ColumnShim.expression(a), ColumnShim.expression(b)))
}
