package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernels for the ingest path.
  *
  * Spark ships no normalization function, and a pipeline that skips
  * it dedups "café" ≠ "café" forever after (CCNet/Dolma both
  * normalize before anything else). Both kernels are native codegen
  * Expressions (the CLAUDE.md hot-path rule — no UDF serialization
  * while normalizing 100 TB of text).
  *
  * [[CodepointHash]] exists because [[RollingHash]] folds UTF-8
  * BYTES while every DuckDB oracle fragment folds CODEPOINTS
  * (`ord` over `string_split(s, '')`); the two agree on ASCII — all
  * prior corpora — but split on any non-ASCII char, which unicode
  * normalization is ABOUT. Codepoint folding is the cross-engine-
  * mirrorable form.
  */
object NfcExprs {

  /** Static so generated code calls it directly. ASCII fast path:
    * pure-ASCII text is already NFC (combining marks start at
    * U+0300), so the common case — this runs on EVERY tokenize since
    * it fronts the shared normText/tokens defs — is one byte scan
    * with zero allocation, no String round-trip. */
  def nfc(s: UTF8String): UTF8String =
    if (s.isFullAscii) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  def cpHash(s: UTF8String): Long = {
    var fp = 0L
    val it = s.toString.codePoints().iterator()
    while (it.hasNext) {
      fp = (fp * 31 + it.nextInt()) % RollingHash.Mod
    }
    fp
  }

  /** NFC normalization (java.text.Normalizer — the JDK's Unicode
    * implementation; DuckDB's `nfc_normalize` implements the same
    * UAX#15 mapping, spec'd + oracle-verified on planted text). */
  case class NfcNormalize(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = org.apache.spark.sql.graftshim.TypeShim.stringOne
    override def dataType: DataType = StringType
    override def prettyName: String = "nfc_normalize"
    override def nullSafeEval(input: Any): Any =
      nfc(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.NfcExprs.nfc($c);")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Poly-31 fold over CODEPOINTS (mod [[RollingHash.Mod]]) — the
    * exact Spark mirror of the oracle `list_reduce`/`ord` fragment
    * at any codepoint, not just ASCII. */
  case class CodepointHash(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = org.apache.spark.sql.graftshim.TypeShim.stringOne
    override def dataType: DataType = LongType
    override def prettyName: String = "codepoint_hash"
    override def nullSafeEval(input: Any): Any =
      cpHash(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.NfcExprs.cpHash($c);")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def nfcNormalize(c: Column): Column =
    ColumnShim.column(NfcNormalize(ColumnShim.expression(c)))
  def codepointHash(c: Column): Column =
    ColumnShim.column(CodepointHash(ColumnShim.expression(c)))
}
