package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{ColumnShim, TypeShim}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Row-local hyperplane-LSH bucket codes for the embedding near-dup
  * family (q34 / q100).
  *
  * The composable form was one `VecExprs.DotProduct` per plane with
  * the plane as a 64-double array LITERAL — 72 planes × 64 dims ≈
  * 4.6k literal nodes per query, the same literal-tree pathology the
  * PQ ADC table hit in round 3 (driver-side analysis cost per run,
  * and codegen that re-materializes the constants per expression).
  * Here the whole plane table rides as ONE codegen reference object
  * and each embedding computes all table codes in a single tight
  * loop over its dimensions.
  *
  * Bit semantics are IDENTICAL to the replaced form: table t's code
  * sets bit j iff dot(v, planes[t·b+j]) > 0, with the dot the same
  * left-to-right double fold as VecExprs (DedupSpec's planted-twin
  * and driver-union-find asserts pin this).
  */
object PlaneExprs {

  /** All `nTables` bucket codes of `v`. Static so generated code
    * calls it directly. */
  def planeCompute(v: ArrayData, planes: Array[Array[Double]],
      nTables: Int, bitsPerTable: Int, isF: Boolean): ArrayData = {
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      var code = 0
      var j = 0
      while (j < bitsPerTable) {
        val p = planes(t * bitsPerTable + j)
        val dim = math.min(v.numElements(), p.length)
        var acc = 0.0
        var d = 0
        while (d < dim) {
          val x = if (isF) v.getFloat(d).toDouble else v.getDouble(d)
          acc += x * p(d)
          d += 1
        }
        if (acc > 0) code |= 1 << j
        j += 1
      }
      out(t) = code
      t += 1
    }
    new GenericArrayData(out)
  }

  case class PlaneCodes(child: Expression, planes: Array[Array[Double]],
      nTables: Int, bitsPerTable: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = TypeShim.vecOne
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "plane_codes"
    private def aF: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(a: Any): Any =
      planeCompute(a.asInstanceOf[ArrayData], planes, nTables, bitsPerTable, aF)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val pref = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.PlaneExprs.planeCompute($c, $pref, $nTables, $bitsPerTable, $aF);")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def planeCodes(v: Column, planes: Array[Array[Double]],
      nTables: Int, bitsPerTable: Int): Column =
    ColumnShim.column(PlaneCodes(ColumnShim.expression(v), planes, nTables, bitsPerTable))
}
