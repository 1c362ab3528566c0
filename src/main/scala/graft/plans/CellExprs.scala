package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{ColumnShim, TypeShim}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Row-local coarse-quantizer cell assignment for the IVF family
  * (q41 knnIvf / q69 knnIvfPq).
  *
  * The composable form was `crossJoin(broadcast(centroids))` (16 rows
  * per vector) followed by a `row_number` window partitioned by
  * vec_id — and that window SHUFFLES the 16×corpus frame by vec_id.
  * Assigning a vector to its nearest cells needs no data movement at
  * all: the centroid table is driver-sized, so it rides into this
  * expression as a codegen reference object and each vector computes
  * its top-`keep` cells in one tight loop — the corpus cell
  * assignment becomes a narrow map stage at any scale.
  *
  * Semantics match the replaced formulation exactly: similarity =
  * left-to-right double dot / (‖v‖·‖c‖) (VecExprs fold order), cells
  * ranked by (similarity DESC, cent_id ASC); zero-norm vectors rank
  * a cell only via the 0-similarity path (ratio's null-on-zero
  * becomes similarity −∞ here, which can only matter for all-zero
  * vectors that have no meaningful cell anyway).
  */
object CellExprs {

  /** Top-`keep` centroid ids of `v` by cosine, descending. Static so
    * generated code calls it directly. */
  def nearestCompute(v: ArrayData, cents: Array[Array[Double]],
      cnorms: Array[Double], keep: Int, isF: Boolean): ArrayData = {
    val dim = math.min(v.numElements(), if (cents.length > 0) cents(0).length else 0)
    var vsq = 0.0
    var i = 0
    while (i < dim) {
      val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      vsq += x * x
      i += 1
    }
    val vnorm = math.sqrt(vsq)
    val n = math.min(keep, cents.length)
    val topSim = new Array[Double](n)
    val topId = new Array[Int](n)
    java.util.Arrays.fill(topSim, Double.NegativeInfinity)
    java.util.Arrays.fill(topId, Int.MaxValue)
    var c = 0
    while (c < cents.length) {
      val cc = cents(c)
      var acc = 0.0
      var d = 0
      while (d < dim) {
        val x = if (isF) v.getFloat(d).toDouble else v.getDouble(d)
        acc += x * cc(d)
        d += 1
      }
      val denom = vnorm * cnorms(c)
      val sim = if (denom != 0.0) acc / denom else Double.NegativeInfinity
      // insertion keeping (sim DESC, id ASC): iterating ids ascending,
      // a tie never displaces the earlier id (strict >)
      var pos = n
      while (pos > 0 && sim > topSim(pos - 1)) pos -= 1
      if (pos < n) {
        var k = n - 1
        while (k > pos) { topSim(k) = topSim(k - 1); topId(k) = topId(k - 1); k -= 1 }
        topSim(pos) = sim
        topId(pos) = c
      }
      c += 1
    }
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = topId(i); i += 1 }
    new GenericArrayData(out)
  }

  case class NearestCells(child: Expression, cents: Array[Array[Double]],
      cnorms: Array[Double], keep: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = TypeShim.vecOne
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "nearest_cells"
    private def aF: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(a: Any): Any =
      nearestCompute(a.asInstanceOf[ArrayData], cents, cnorms, keep, aF)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cref = ctx.addReferenceObj("cellCentroids", cents, "double[][]")
      val nref = ctx.addReferenceObj("cellNorms", cnorms, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.CellExprs.nearestCompute($c, $cref, $nref, $keep, $aF);")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def nearestCells(v: Column, cents: Array[Array[Double]], keep: Int): Column = {
    val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    ColumnShim.column(NearestCells(ColumnShim.expression(v), cents, norms, keep))
  }

  // ---- max-cosine-vs-fixed-set (q218's leak gate kernel) -----------

  /** Max ROUNDED cosine of `v` against a fixed bounded probe set,
    * with the argmax probe id ((cosine DESC, id ASC) — q216's
    * struct-max tie-break on the SAME round(·,6) values, replicated
    * here as BigDecimal HALF_UP, which is what Spark's round() does).
    * Probes ride in as codegen reference objects (the bloom/centroid
    * discipline: never literal expression trees, never UDF
    * closures), so the gate is one tight row-local loop — per-row
    * latency on a stream, a narrow map stage in batch. Returns
    * struct(sim, pid); all-null/zero-norm inputs yield sim = −∞. */
  def maxCosCompute(v: ArrayData, ids: Array[Long],
      probes: Array[Array[Double]], pnorms: Array[Double],
      isF: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val dim = math.min(v.numElements(),
      if (probes.length > 0) probes(0).length else 0)
    // the input norm runs over ALL components (only the dot is
    // truncated to the shared prefix) — the declarative chain this
    // kernel must stay bit-identical to (VecFns.norm in
    // knnLabeledCteSql) norms the full vector, so a dimension
    // mismatch shows up as a parity-visible shorter cosine instead
    // of silently renormalizing the prefix (round-7 ADVICE item)
    var vsq = 0.0
    var i = 0
    while (i < v.numElements()) {
      val x = if (isF) v.getFloat(i).toDouble else v.getDouble(i)
      vsq += x * x
      i += 1
    }
    val vnorm = math.sqrt(vsq)
    var bestSim = Double.NegativeInfinity
    var bestId = Long.MaxValue
    var c = 0
    while (c < probes.length) {
      val p = probes(c)
      var acc = 0.0
      var d = 0
      while (d < dim) {
        val x = if (isF) v.getFloat(d).toDouble else v.getDouble(d)
        acc += x * p(d)
        d += 1
      }
      val denom = vnorm * pnorms(c)
      val sim =
        if (denom != 0.0)
          java.math.BigDecimal.valueOf(acc / denom)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        else Double.NegativeInfinity
      // strict > keeps the smaller id on rounded ties (ids ascend)
      if (sim > bestSim) { bestSim = sim; bestId = ids(c) }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestSim, bestId))
  }

  case class MaxCosine(child: Expression, ids: Array[Long],
      probes: Array[Array[Double]], pnorms: Array[Double])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = TypeShim.vecOne
    override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("sim",
        org.apache.spark.sql.types.DoubleType, nullable = false),
      org.apache.spark.sql.types.StructField("pid",
        org.apache.spark.sql.types.LongType, nullable = false)))
    override def prettyName: String = "max_cosine"
    private def aF: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def nullSafeEval(a: Any): Any =
      maxCosCompute(a.asInstanceOf[ArrayData], ids, probes, pnorms, aF)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val iref = ctx.addReferenceObj("probeIds", ids, "long[]")
      val pref = ctx.addReferenceObj("probeVecs", probes, "double[][]")
      val nref = ctx.addReferenceObj("probeNorms", pnorms, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.CellExprs.maxCosCompute($c, $iref, $pref, $nref, $aF);")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Column entry point; probe norms use the same left-to-right
    * Σx² fold as VecExprs/VecFns.norm so the chain is bit-identical
    * to the declarative cosine. */
  def maxCosine(v: Column, ids: Array[Long],
      probes: Array[Array[Double]]): Column = {
    val norms = probes.map { p =>
      var s = 0.0
      var i = 0
      while (i < p.length) { s += p(i) * p(i); i += 1 }
      math.sqrt(s)
    }
    ColumnShim.column(MaxCosine(ColumnShim.expression(v), ids, probes, norms))
  }
}
