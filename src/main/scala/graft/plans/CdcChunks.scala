package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Content-defined chunking (CDC) of a token array — the LBFS /
  * restic / borg segmentation idea at token granularity: a token
  * whose poly-31 hash ≡ rem (mod mod) is an ANCHOR and closes the
  * current chunk, so chunk boundaries are decided by CONTENT, not
  * position. Insert or delete a token and only the chunks touching
  * the edit change — every boundary after the edit re-synchronizes,
  * which is exactly what fixed-window chunking (q77/q81) cannot do
  * and why storage dedup systems use CDC.
  *
  * One row-local pass per doc: the anchor test and the running chunk
  * fingerprint (poly-31 over the space-joined chunk text — the q26
  * family, so the oracle reproduces it byte-for-byte) are computed in
  * a single tight loop inside WholeStageCodegen. The reference dedups
  * driver-side (redshells/data/data_frame_utils.py:31); at 100 TB
  * this kernel is the map side of chunk-level dedup with zero
  * shuffle before the fingerprint aggregation.
  */
object CdcChunks {

  // THE poly-31 base-hash modulus — the same constant every CDC
  // oracle fragment interpolates (cdcChunkCteSql); referencing the
  // owning family instead of holding a private copy keeps kernel and
  // oracle incapable of drifting (shared-rule discipline).
  private val M = RollingHash.Mod

  /** Static so generated code calls it directly (PairExprs pattern).
    * Output rows: (chunk_idx, n_tok, fp) per chunk, in order. */
  def chunksCompute(arr: ArrayData, mod: Long, rem: Long): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var chunkIdx = 0L
    var nTok = 0L
    var fp = 0L
    var i = 0
    while (i < n) {
      val bytes = arr.getUTF8String(i).getBytes
      var th = 0L
      var b = 0
      while (b < bytes.length) { th = (th * 31 + (bytes(b) & 0xff)) % M; b += 1 }
      if (nTok > 0) fp = (fp * 31 + 32) % M // ' ' separator
      b = 0
      while (b < bytes.length) { fp = (fp * 31 + (bytes(b) & 0xff)) % M; b += 1 }
      nTok += 1
      if (th % mod == rem) { // anchor closes the chunk
        out += new GenericInternalRow(Array[Any](chunkIdx, nTok, fp))
        chunkIdx += 1; nTok = 0L; fp = 0L
      }
      i += 1
    }
    if (nTok > 0) out += new GenericInternalRow(Array[Any](chunkIdx, nTok, fp))
    new GenericArrayData(out.toArray)
  }

  private val outStruct = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("n_tok", LongType, nullable = false),
    StructField("fp", LongType, nullable = false)))

  case class CdcChunksExpr(child: Expression, mod: Long, rem: Long)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(outStruct, containsNull = false)
    override def prettyName: String = "cdc_chunks"
    override def nullSafeEval(a: Any): Any =
      chunksCompute(a.asInstanceOf[ArrayData], mod, rem)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.CdcChunks.chunksCompute($c, ${mod}L, ${rem}L);")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def apply(toks: Column, mod: Long, rem: Long): Column =
    ColumnShim.column(CdcChunksExpr(ColumnShim.expression(toks), mod, rem))

  // --- byte-level variant (true Rabin-window CDC over binary) ------

  /** Sliding-window Rabin CDC over a BYTE payload: the anchor test
    * hashes the last `window` bytes at every position (constant-time
    * slide: h ← h·31 + b_in − b_out·31^w, all mod p), so a boundary
    * depends only on a w-byte neighborhood — the storage-dedup
    * segmentation proper (LBFS §3.1), byte-exact against an oracle
    * that recomputes each window hash from the char slice (ASCII
    * payloads: byte == codepoint, the q87 precedent). A position
    * is an anchor only once the window is full (pos ≥ w). */
  def bytesCompute(payload: Array[Byte], window: Int, mod: Long,
      rem: Long): ArrayData = {
    val n = payload.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    var pw = 1L // 31^window mod M
    var k = 0
    while (k < window) { pw = (pw * 31) % M; k += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var chunkIdx = 0L
    var nBytes = 0L
    var fp = 0L
    var wh = 0L // rolling hash of the trailing `window` bytes
    var i = 0
    while (i < n) {
      val b = payload(i) & 0xff
      wh = (wh * 31 + b) % M
      if (i >= window) {
        val outB = payload(i - window) & 0xff
        wh = ((wh - (outB * pw) % M) % M + M) % M
      }
      fp = (fp * 31 + b) % M
      nBytes += 1
      if (i + 1 >= window && wh % mod == rem) { // anchor closes the chunk
        out += new GenericInternalRow(Array[Any](chunkIdx, nBytes, fp))
        chunkIdx += 1; nBytes = 0L; fp = 0L
      }
      i += 1
    }
    if (nBytes > 0) out += new GenericInternalRow(Array[Any](chunkIdx, nBytes, fp))
    new GenericArrayData(out.toArray)
  }

  case class CdcBytesExpr(child: Expression, window: Int, mod: Long, rem: Long)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(BinaryType)
    override def dataType: DataType = ArrayType(outStruct, containsNull = false)
    override def prettyName: String = "cdc_bytes"
    override def nullSafeEval(a: Any): Any =
      bytesCompute(a.asInstanceOf[Array[Byte]], window, mod, rem)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.plans.CdcChunks.bytesCompute($c, $window, ${mod}L, ${rem}L);")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  def bytes(payload: Column, window: Int, mod: Long, rem: Long): Column =
    ColumnShim.column(CdcBytesExpr(ColumnShim.expression(payload), window, mod, rem))
}
