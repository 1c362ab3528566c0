package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a token array, as a native Catalyst
  * Expression — distinct shingles (set semantics, the dedup unit) by
  * default, or every occurrence in order (`distinct = false`, the
  * counting unit for repetition metrics).
  *
  * The composable formulation (transform + slice + concat_ws) is a
  * higher-order-function chain, which Spark evaluates interpreted
  * (CodegenFallback) — measured ~25 µs/doc on the synthetic corpus,
  * the single hottest step of every shingle-based dedup. This
  * expression does one tight JVM loop per row and stays codegen-
  * compatible via a static `compute` forwarder, cutting shingle
  * construction cost ~5× (see SURVEY.md §5).
  */
case class WordNGrams(child: Expression, n: Int, distinct: Boolean = true) extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"word_ngrams: n must be >= 1, got $n")
  override def inputTypes = org.apache.spark.sql.graftshim.TypeShim.stringArrayOne
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordNGrams.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordNGrams.compute($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  /** Column-level entry points: word_ngrams(tokens, n[, distinct]). */
  def apply(c: Column, n: Int): Column = apply(c, n, distinct = true)
  def apply(c: Column, n: Int, distinct: Boolean): Column =
    ColumnShim.column(WordNGrams(ColumnShim.expression(c), n, distinct))

  private val Space = UTF8String.fromString(" ")

  /** Static entry shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val seen: mutable.Growable[UTF8String] with Iterable[UTF8String] =
      if (distinct) new mutable.LinkedHashSet[UTF8String]
      else new mutable.ArrayBuffer[UTF8String]
    var i = 0
    while (i <= len - n) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      var hasNull = false
      while (j < n) {
        if (j > 0) parts(2 * j - 1) = Space
        val tok = tokens.getUTF8String(i + j)
        if (tok == null) hasNull = true
        parts(2 * j) = tok
        j += 1
      }
      // windows containing null tokens are skipped (the declared
      // element type is non-null)
      if (!hasNull) seen += UTF8String.concat(parts: _*)
      i += 1
    }
    new GenericArrayData(seen.toArray[Any])
  }
}
