package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType}

/** ORACLE-MIRRORABLE 64-bit SimHash (round 7, the q93 promotion
  * lever applied to the q33 family): [[SimHash64]]'s FNV-1a token
  * hash multiplies mod 2^64, which no engine-portable SQL fragment
  * can replay without HUGEINT gymnastics — so q33 stays rows-only.
  * This variant builds each token's 64 bits from TWO 32-bit
  * polynomial byte folds (base 31 for the high half, base 37 for the
  * low half), both mod 2^32: every intermediate fits int64
  * ((2^32−1)·37 + 255 < 2^38), so a DuckDB `list_reduce` replays the
  * fold EXACTLY and the whole signature — votes, signs, bit pattern —
  * is value-checkable cross-engine (the oracle keys on the 64-char
  * bitstring, lever (o): hash ↔ pattern is a bijection).
  *
  * Same Charikar vote construction as [[SimHash64]] otherwise; the
  * whole loop is one codegen call per row (the 100 TB rule).
  */
case class PolySimHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = org.apache.spark.sql.graftshim.TypeShim.stringArrayOne
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_simhash64"

  override def nullSafeEval(input: Any): Any =
    PolySimHash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PolySimHash.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): PolySimHash =
    copy(child = newChild)
}

object PolySimHash {
  def apply(c: Column): Column =
    ColumnShim.column(PolySimHash(ColumnShim.expression(c)))

  /** The two fold bases and the half-width modulus — the q199 oracle
    * fragments are GENERATED from these (single source of truth; the
    * 31 is deliberately NOT RollingHash.Mod's family — different
    * modulus, different constant owner, lever (s)). */
  val BaseHi = 31L
  val BaseLo = 37L
  val HalfMod = 1L << 32

  /** 32-bit polynomial byte fold — mirrored by the oracle's
    * list_reduce over codepoints (byte == codepoint on ASCII). */
  private def fold32(bytes: Array[Byte], base: Long): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * base + (bytes(i) & 0xffL)) % HalfMod
      i += 1
    }
    h
  }

  /** Static entry shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      val tok = tokens.getUTF8String(i)
      if (tok != null) {
        val bytes = tok.getBytes
        val hi = fold32(bytes, BaseHi)
        val lo = fold32(bytes, BaseLo)
        var j = 0
        while (j < 32) {
          if (((lo >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          if (((hi >>> j) & 1L) == 1L) votes(j + 32) += 1 else votes(j + 32) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
