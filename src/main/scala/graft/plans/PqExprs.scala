package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{ColumnShim, TypeShim}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native product-quantization kernels for the ANN scale path
  * (q67 knnPq / q69 knnIvfPq).
  *
  * Why expressions and not composition: the composable forms were the
  * two dominant costs of the PQ queries measured at sf0.1 —
  * (a) corpus encoding as 8 chained KMeansModel.transform calls
  * (8 model-UDF projections re-analyzed per run), and (b) the
  * per-query ADC lookup table as a literal-built expression tree of
  * ~10k nodes (8×16 quadratic sums), which cost ~2 s of DRIVER-side
  * analysis/optimization per execution — far more than the 1.2 s the
  * stages actually ran. Each kernel here is ONE expression node with
  * the codebook centroids attached as a codegen reference object, so
  * the corpus encode is a single codegen'd tight loop (the shape an
  * 8-byte-per-vector scan needs at 100 TB) and the plan stays small.
  *
  * Distance semantics: exact Σ(x−c)² accumulated left-to-right in
  * double, ties broken by the LOWEST centroid index (strict <).
  * (MLlib's predict uses the norm-based fastSquaredDistance
  * shortcut, which can differ by ULPs near ties; the PQ queries are
  * threshold-checked rows-only, and every candidate is re-ranked by
  * exact cosine, so assignment ULP flips cannot change correctness.)
  */
object PqExprs {

  /** [subspace][centroid][dim] codebook centroids. */
  type Centroids = Array[Array[Array[Double]]]

  private def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Per-subspace nearest-centroid codes of a full vector. Static so
    * generated code calls it directly. */
  def codesCompute(v: ArrayData, cents: Centroids, isF: Boolean): ArrayData = {
    val m = cents.length
    val out = new Array[Any](m)
    var j = 0
    var base = 0
    while (j < m) {
      val cj = cents(j)
      val subDim = cj(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cj.length) {
        val cc = cj(c)
        var acc = 0.0
        var d = 0
        while (d < subDim) {
          val x = (if (isF) v.getFloat(base + d).toDouble
                   else v.getDouble(base + d)) - cc(d)
          acc += x * x
          d += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(j) = best
      base += subDim
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Per-query ADC lookup table: ||q_j − c||² for every subspace ×
    * centroid, as array<array<double>>. */
  def adcCompute(q: ArrayData, cents: Centroids, isF: Boolean): ArrayData = {
    val m = cents.length
    val rows = new Array[Any](m)
    var j = 0
    var base = 0
    while (j < m) {
      val cj = cents(j)
      val subDim = cj(0).length
      val row = new Array[Any](cj.length)
      var c = 0
      while (c < cj.length) {
        val cc = cj(c)
        var acc = 0.0
        var d = 0
        while (d < subDim) {
          val x = (if (isF) q.getFloat(base + d).toDouble
                   else q.getDouble(base + d)) - cc(d)
          acc += x * x
          d += 1
        }
        row(c) = acc
        c += 1
      }
      rows(j) = new GenericArrayData(row)
      base += subDim
      j += 1
    }
    new GenericArrayData(rows)
  }

  case class PqCodes(child: Expression, centroids: Centroids)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = TypeShim.vecOne
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "pq_codes"
    private def aF: Boolean = isFloatArray(child.dataType)
    override def nullSafeEval(a: Any): Any =
      codesCompute(a.asInstanceOf[ArrayData], centroids, aF)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqCentroids", centroids, "double[][][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.PqExprs.codesCompute($c, $ref, $aF);")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  case class PqAdcTable(child: Expression, centroids: Centroids)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = TypeShim.vecOne
    override def dataType: DataType =
      ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
    override def prettyName: String = "pq_adc_table"
    private def aF: Boolean = isFloatArray(child.dataType)
    override def nullSafeEval(a: Any): Any =
      adcCompute(a.asInstanceOf[ArrayData], centroids, aF)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqCentroids", centroids, "double[][][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.PqExprs.adcCompute($c, $ref, $aF);")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def codes(v: Column, cents: Centroids): Column =
    ColumnShim.column(PqCodes(ColumnShim.expression(v), cents))
  def adcTable(q: Column, cents: Centroids): Column =
    ColumnShim.column(PqAdcTable(ColumnShim.expression(q), cents))

  // ---- PQ quantization-error energy (q225's distortion kernel) -----

  /** Σ_j min_c ‖v_j − c‖² — the per-subspace nearest-centroid
    * distance [[codesCompute]] already minimizes, ACCUMULATED as the
    * vector's PQ reconstruction-error energy (encoding a vector and
    * measuring its error are the same loop), then the lever-(w)
    * portable quantizer floor(e²·scale + 0.5) → int64 so downstream
    * sums are exact and partition-order-independent (the SqExprs
    * .err2qCompute discipline on the trained-quantizer side). */
  def err2qCompute(v: ArrayData, cents: Centroids, scale: Long,
      isF: Boolean): Long = {
    val m = cents.length
    var acc = 0.0
    var j = 0
    var base = 0
    while (j < m) {
      val cj = cents(j)
      val subDim = cj(0).length
      var bestD = Double.MaxValue
      var c = 0
      while (c < cj.length) {
        val cc = cj(c)
        var sd = 0.0
        var d = 0
        while (d < subDim) {
          val x = (if (isF) v.getFloat(base + d).toDouble
                   else v.getDouble(base + d)) - cc(d)
          sd += x * x
          d += 1
        }
        if (sd < bestD) bestD = sd
        c += 1
      }
      acc += bestD
      base += subDim
      j += 1
    }
    math.floor(acc * scale.toDouble + 0.5).toLong
  }

  case class PqErr2Q(child: Expression, centroids: Centroids, scale: Long)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = TypeShim.vecOne
    override def dataType: DataType = org.apache.spark.sql.types.LongType
    override def prettyName: String = "pq_err2q"
    private def aF: Boolean = isFloatArray(child.dataType)
    override def nullSafeEval(a: Any): Any =
      err2qCompute(a.asInstanceOf[ArrayData], centroids, scale, aF)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqCentroids", centroids, "double[][][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.PqExprs.err2qCompute($c, $ref, ${scale}L, $aF);")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def err2q(v: Column, cents: Centroids, scale: Long): Column =
    ColumnShim.column(PqErr2Q(ColumnShim.expression(v), cents, scale))
}
