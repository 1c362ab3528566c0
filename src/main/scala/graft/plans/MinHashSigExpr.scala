package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.{ColumnShim, TypeShim}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Row-local K-min MinHash signature of a shingle array, as one
  * native expression (q71's streaming dedup-at-ingest path).
  *
  * Hash family — IDENTICAL to the batch q32 pipeline (DedupSpec
  * asserts signature equality against the grouped-min formulation):
  * base = pmod(xxhash64(shingle), p) (Spark's xxhash64 = XXH64 with
  * seed 42 over the UTF-8 bytes), derived_i = pmod(base·(2i+1) + i·c,
  * p), sig_i = min over shingles. The earlier composable form (64
  * `transform` lambdas per row) was interpreted and measured ~100×
  * slower than this loop as a corpus scan; per arriving stream event
  * either is fine, but codegen costs nothing there either.
  *
  * Empty shingle arrays yield a signature of Long.MaxValue entries
  * (the identity of min) — deterministic, never null. */
object MinHashSigExpr {

  /** Static so generated code calls it directly. */
  def compute(shingles: ArrayData, k: Int, p: Long, c: Long): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        val x = java.lang.Math.floorMod(h, p) // == Spark pmod for p > 0
        var j = 0
        while (j < k) {
          val y = java.lang.Math.floorMod(x * (2L * j + 1L) + j * c, p)
          if (y < mins(j)) mins(j) = y
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](k)
    i = 0
    while (i < k) { out(i) = mins(i); i += 1 }
    new GenericArrayData(out)
  }

  case class MinHashSig(child: Expression, k: Int, p: Long, c: Long)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = TypeShim.stringArrayOne
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"
    override def nullSafeEval(a: Any): Any =
      compute(a.asInstanceOf[ArrayData], k, p, c)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.plans.MinHashSigExpr.compute($s, $k, ${p}L, ${c}L);")
    override protected def withNewChildInternal(c2: Expression) = copy(child = c2)
  }

  def apply(shingles: Column, k: Int, p: Long, c: Long): Column =
    ColumnShim.column(MinHashSig(ColumnShim.expression(shingles), k, p, c))
}
