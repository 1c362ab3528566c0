package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{ColumnShim, TypeShim}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership test as a native codegen Expression — the
  * map-side prefilter of the batch-vs-store dedup pattern (q99): the
  * bounded filter rides into generated code as a reference object
  * (same pattern as the centroid tables in CellExprs), so the probe
  * stays inside WholeStageCodegen and prunes BEFORE any shuffle.
  *
  * Bloom guarantees no false negatives, so a prefilter can only
  * remove rows the exact join would reject anyway — downstream
  * results are bit-identical with or without it (that is what lets
  * q99 stay on the DuckDB oracle gate while using a probabilistic
  * structure the oracle cannot express).
  */
object BloomExprs {

  case class BloomMightContain(child: Expression, bloom: BloomFilter)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = TypeShim.longOne
    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_might_contain"

    override def nullSafeEval(input: Any): Any =
      bloom.mightContainLong(input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val bref = ctx.addReferenceObj("bloom", bloom,
          classOf[BloomFilter].getName)
        s"${ev.value} = $bref.mightContainLong($c);"
      })

    override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
      copy(child = newChild)
  }

  def mightContain(c: Column, bloom: BloomFilter): Column =
    ColumnShim.column(BloomMightContain(ColumnShim.expression(c), bloom))
}
