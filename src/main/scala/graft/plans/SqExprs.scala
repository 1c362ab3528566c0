package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{ColumnShim, TypeShim}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Row-local int8 SCALAR QUANTIZATION (SQ8) for the ANN family
  * (q116) — the standard 4× embedding compression of a large-scale
  * vector serving layout (each float32 dimension becomes one uint8
  * code against per-dimension [min, max] corpus bounds; cf. Faiss
  * ScalarQuantizer / Lucene's int8 HNSW vectors).
  *
  * `dequant` computes quantize-then-reconstruct in ONE codegen pass:
  * code_i = floor((x_i − min_i) / (max_i − min_i) · 255 + 0.5),
  * x̂_i   = min_i + code_i · (max_i − min_i) / 255
  * so its output is bit-identical to storing the uint8 codes and
  * dequantizing at read time — a serving layout persisting
  * `codes: array<tinyint>` reconstructs exactly this array. The
  * per-dim bounds are a dim-sized driver scalar and ride into the
  * generated code as a reference object (never a literal expression
  * tree, never a UDF closure — the CellExprs/PqExprs pattern), so
  * corpus encoding is a narrow map stage at any scale.
  *
  * IEEE evaluation order matches the DuckDB oracle token-for-token
  * (mn + ((floor(((x−mn)/(mx−mn))·255 + 0.5) · (mx−mn)) / 255)); a
  * constant dimension (mx == mn) reconstructs as mn. Inputs outside
  * the training bounds are NOT clamped: q116 quantizes the same
  * corpus the bounds came from, where (x−mn)/(mx−mn) ∈ [0,1] by
  * construction.
  */
object SqExprs {

  /** Reconstructed (quantize-then-dequantize) vector. Static so
    * generated code calls it directly. */
  def dequantCompute(v: ArrayData, mins: Array[Double], maxs: Array[Double],
      isF: Boolean): ArrayData = {
    val n = math.min(v.numElements(), mins.length)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      val mn = mins(i)
      val mx = maxs(i)
      out(i) =
        if (mx == mn) mn
        else {
          val code = math.floor(((x - mn) / (mx - mn)) * 255.0 + 0.5)
          mn + (code * (mx - mn)) / 255.0
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  case class Dequant(child: Expression, mins: Array[Double],
      maxs: Array[Double])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = TypeShim.vecOne
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "sq8_dequant"
    private def aF: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(a: Any): Any =
      dequantCompute(a.asInstanceOf[ArrayData], mins, maxs, aF)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mnref = ctx.addReferenceObj("sqMins", mins, "double[]")
      val mxref = ctx.addReferenceObj("sqMaxs", maxs, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.SqExprs.dequantCompute($c, $mnref, $mxref, $aF);")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def dequant(v: Column, mins: Array[Double], maxs: Array[Double]): Column =
    ColumnShim.column(Dequant(ColumnShim.expression(v), mins, maxs))

  // ---- quantization-error energy (q221's distortion kernel) --------

  /** Σ_i (x̂_i − x_i)² in index order, then the lever-(w) portable
    * quantizer floor(e²·scale + 0.5) → int64 — quantize, reconstruct,
    * and measure in ONE pass (the error never materializes a second
    * corpus-width array). Every step is a correctly-rounded IEEE op
    * on values both engines derive identically, so the int64 is
    * bit-identical cross-engine and SUMS EXACTLY downstream
    * (partition-order-independent — the reason the energy leaves
    * this kernel as an integer, not a double). */
  def err2qCompute(v: ArrayData, mins: Array[Double], maxs: Array[Double],
      scale: Long, isF: Boolean): Long = {
    val n = math.min(v.numElements(), mins.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      val mn = mins(i)
      val mx = maxs(i)
      val dq =
        if (mx == mn) mn
        else {
          val code = math.floor(((x - mn) / (mx - mn)) * 255.0 + 0.5)
          mn + (code * (mx - mn)) / 255.0
        }
      val e = dq - x
      acc += e * e
      i += 1
    }
    math.floor(acc * scale.toDouble + 0.5).toLong
  }

  case class SqErr2Q(child: Expression, mins: Array[Double],
      maxs: Array[Double], scale: Long)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = TypeShim.vecOne
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def prettyName: String = "sq8_err2q"
    private def aF: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(a: Any): Any =
      err2qCompute(a.asInstanceOf[ArrayData], mins, maxs, scale, aF)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mnref = ctx.addReferenceObj("sqMins", mins, "double[]")
      val mxref = ctx.addReferenceObj("sqMaxs", maxs, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.SqExprs.err2qCompute($c, $mnref, $mxref, ${scale}L, $aF);")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def err2q(v: Column, mins: Array[Double], maxs: Array[Double],
      scale: Long): Column =
    ColumnShim.column(SqErr2Q(ColumnShim.expression(v), mins, maxs, scale))
}
