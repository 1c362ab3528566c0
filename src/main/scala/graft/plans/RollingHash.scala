package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling-hash document fingerprint (Karp–Rabin over the
  * UTF-8 bytes): fp = Σ fp·31 + byte (mod 1e9+7).
  *
  * Re-expression of a document-fingerprinting pipeline op (the
  * reference dedups documents driver-side; see
  * /root/reference/redshells/data/data_frame_utils.py:31 keep-first
  * semantics). A native Catalyst Expression with codegen keeps it
  * inside WholeStageCodegen — no UDF serialization per row, which is
  * what you want hashing 100 TB of text.
  *
  * The modulus keeps the accumulator in [0, 1e9+7) so the same value
  * is computable in engines with checked 64-bit overflow (DuckDB
  * oracle parity).
  */
case class RollingHash(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = org.apache.spark.sql.graftshim.TypeShim.stringOne
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var fp = 0L
    var i = 0
    while (i < bytes.length) {
      fp = (fp * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val fp = ctx.freshName("fp")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $fp = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $fp = ($fp * 31 + ($bytes[$i] & 0xff)) % 1000000007L;
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** The poly-31 modulus — the ONE constant every cross-engine hash
    * fragment (q26/q87/q93/q175/q176 oracles) interpolates. Same
    * value as the sampling prime by coincidence of good primes;
    * semantically distinct (a sampling-family change must never
    * rewrite hash oracles, and vice versa). */
  val Mod = 1000000007L

  /** Column-level entry point: rolling_hash(text). */
  def apply(c: Column): Column =
    ColumnShim.column(RollingHash(ColumnShim.expression(c)))
}
