package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Ordered-pair explosion of a posting array — the inverted-index
  * "posting list → candidate pairs" step as ONE codegen kernel.
  *
  * The composable form (nested `transform` + `slice` lambdas) is
  * interpreted (CodegenFallback) and allocates a lambda frame per
  * element; it runs once per DISTINCT SHINGLE of the corpus in the
  * q31 chain, which makes it the last interpreted loop on that hot
  * path (CLAUDE.md perf rules). Here the (id, weight) posting rows
  * pair up in a tight quadratic loop over the (df-capped, so
  * bounded) posting array.
  *
  * Pair order matches the replaced lambdas exactly: (i, j) for i<j
  * in array order — DedupSpec's q31 oracle hash pins this.
  */
object PairExprs {

  /** All ordered pairs of an array<struct<id: long, w: long>>. Static
    * so generated code calls it directly. */
  def pairsCompute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val rows = new Array[InternalRow](n)
    var i = 0
    while (i < n) { rows(i) = arr.getStruct(i, 2); i += 1 }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      val a = rows(i)
      val aid = a.getLong(0); val aw = a.getLong(1)
      var j = i + 1
      while (j < n) {
        val b = rows(j)
        out(k) = new GenericInternalRow(
          Array[Any](aid, aw, b.getLong(0), b.getLong(1)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  private val inStruct = StructType(Seq(
    StructField("id", LongType), StructField("w", LongType)))
  private val outStruct = StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("na", LongType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("nb", LongType, nullable = false)))

  case class PostingPairs(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(inStruct))
    override def dataType: DataType = ArrayType(outStruct, containsNull = false)
    override def prettyName: String = "posting_pairs"
    override def nullSafeEval(a: Any): Any =
      pairsCompute(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.PairExprs.pairsCompute($c);")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def postingPairs(arr: Column): Column =
    ColumnShim.column(PostingPairs(ColumnShim.expression(arr)))
}
