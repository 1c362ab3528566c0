package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local repetition battery (Gopher §A1.1, Rae et al. 2021 Table
  * A1 — the axis q73 covered only for top-2-grams): per doc, in ONE
  * codegen pass over the token array + normalized text,
  *
  *   - duplicate-LINE occurrence stats (non-empty '\n' segments),
  *   - duplicate-PARAGRAPH stats ('\n\n' segments),
  *   - top-n-gram occurrence count for n ∈ {2,3,4},
  *   - duplicate-n-gram occurrence mass for n ∈ {5..10},
  *
  * all as EXACT long counts (22-slot array) — shares are computed
  * declaratively as single IEEE divisions of exact longs (lever (c)),
  * so the whole battery sits on the DuckDB oracle gate (lever (ii):
  * the oracle's per-n UNNEST chains value-check this kernel). Grams
  * are exact strings joined by ' ' (tokens are '\s+' splits, so the
  * join is unambiguous — the same gram text the oracle builds with
  * `toks[i] || ' ' || ...`); counting uses exact string keys, never
  * a lossy hash. Everything is doc-local: no explode, no shuffle —
  * the 9 per-n corpus explosions this replaces each shuffled the
  * gram stream.
  */
object RepExprs {

  /** Slot layout of the returned array. */
  val NLines = 0; val DupLines = 1; val NParas = 2; val DupParas = 3
  // top-gram slots: (topC, nGrams) per n ∈ {2,3,4} → 4..9
  // dup-gram slots: (dupC, nGrams) per n ∈ {5..10} → 10..21
  val Slots = 22

  private def dupStats(parts: Array[String]): (Long, Long) = {
    val m = new java.util.HashMap[String, Long]()
    var n = 0L
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.nonEmpty) { n += 1; m.merge(p, 1L, _ + _) }
      i += 1
    }
    var dup = 0L
    m.forEach((_, c) => if (c > 1) dup += c)
    (n, dup)
  }

  /** (top count, dup mass, total) of word n-grams. */
  private def gramStats(words: Array[String], n: Int): (Long, Long, Long) = {
    val total = math.max(words.length - n + 1, 0)
    if (total == 0) return (0L, 0L, 0L)
    val m = new java.util.HashMap[String, Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      m.merge(sb.toString, 1L, _ + _)
      i += 1
    }
    var top = 0L
    var dup = 0L
    m.forEach((_, c) => { if (c > top) top = c; if (c > 1) dup += c })
    (top, dup, total.toLong)
  }

  /** Static so generated code calls it directly. */
  def repCompute(toks: ArrayData, text: UTF8String): ArrayData = {
    val out = new Array[Long](Slots)
    val s = text.toString
    val (nl, dl) = dupStats(s.split("\n", -1))
    val (np, dp) = dupStats(s.split("\n\n", -1))
    out(NLines) = nl; out(DupLines) = dl
    out(NParas) = np; out(DupParas) = dp
    val words = new Array[String](toks.numElements())
    var i = 0
    while (i < words.length) {
      words(i) = toks.getUTF8String(i).toString
      i += 1
    }
    var slot = 4
    var n = 2
    while (n <= 4) {
      val (top, _, tot) = gramStats(words, n)
      out(slot) = top; out(slot + 1) = tot
      slot += 2; n += 1
    }
    n = 5
    while (n <= 10) {
      val (_, dup, tot) = gramStats(words, n)
      out(slot) = dup; out(slot + 1) = tot
      slot += 2; n += 1
    }
    new GenericArrayData(out)
  }

  case class RepStats(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(StringType), StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "rep_stats"
    override def nullSafeEval(t: Any, s: Any): Any =
      repCompute(t.asInstanceOf[ArrayData], s.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (t, s) =>
        s"${ev.value} = graft.plans.RepExprs.repCompute($t, $s);")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  def repStats(toks: Column, text: Column): Column =
    ColumnShim.column(RepStats(ColumnShim.expression(toks), ColumnShim.expression(text)))
}
