package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unordered skip-gram co-occurrence pairs of a token array, as a
  * native Catalyst Expression: for every position i and every offset
  * 1..window, emit `least(a,b) || ' ' || greatest(a,b)` for
  * (a, b) = (tokens[i], tokens[i+offset]) — every occurrence, in
  * order (the counting unit for PMI collocation statistics, word2vec
  * SGNS-style windows).
  *
  * Row-local pair generation is the scale rule (CLAUDE.md: never
  * self-join the corpus on position); the higher-order-function
  * formulation (flatten ∘ transform ∘ slice) would run interpreted,
  * so like [[WordNGrams]] this does one tight JVM loop per row and
  * stays codegen-compatible via a static `compute` forwarder.
  */
case class SkipGramPairs(child: Expression, window: Int) extends UnaryExpression with ExpectsInputTypes {
  require(window >= 1, s"skipgram_pairs: window must be >= 1, got $window")
  override def inputTypes = org.apache.spark.sql.graftshim.TypeShim.stringArrayOne
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "skipgram_pairs"

  override def nullSafeEval(input: Any): Any =
    SkipGramPairs.compute(input.asInstanceOf[ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SkipGramPairs.compute($c, $window);")

  override protected def withNewChildInternal(newChild: Expression): SkipGramPairs =
    copy(child = newChild)
}

object SkipGramPairs {
  def apply(c: Column, window: Int): Column =
    ColumnShim.column(SkipGramPairs(ColumnShim.expression(c), window))

  private val Space = UTF8String.fromString(" ")

  /** Static entry shared by interpreted eval and generated code.
    * Pair order inside the string is lexicographic (UTF8String binary
    * compare == DuckDB's least/greatest on VARCHAR). */
  def compute(tokens: ArrayData, window: Int): ArrayData = {
    val len = tokens.numElements()
    val out = new mutable.ArrayBuffer[Any](math.max(0, len * window))
    var i = 0
    while (i < len) {
      val a = tokens.getUTF8String(i)
      var j = 1
      while (j <= window && i + j < len) {
        val b = tokens.getUTF8String(i + j)
        // null tokens are skipped (declared element type is non-null)
        if (a != null && b != null) {
          val (lo, hi) = if (a.compareTo(b) <= 0) (a, b) else (b, a)
          out += UTF8String.concat(lo, Space, hi)
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
