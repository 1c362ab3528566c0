package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over Array[Float] embedding columns.
  *
  * All folds run in element order (`aggregate` over `zip_with`), so
  * the result is a deterministic double — bit-identical to any other
  * engine folding the same list left-to-right (DuckDB oracle parity),
  * and independent of Spark partitioning.
  */
object VecFns {

  /** Dot product in double precision, element-ordered accumulation
    * (native codegen Expression — see graft.plans.VecExprs). */
  def dot(a: Column, b: Column): Column = graft.plans.VecExprs.dot(a, b)

  def norm(a: Column): Column = graft.plans.VecExprs.norm(a)

  /** Cosine similarity; null (not an ANSI divide-by-zero error) for
    * zero vectors. */
  def cosine(a: Column, b: Column): Column =
    ratio(dot(a, b), norm(a) * norm(b))

  /** num/denom, null when denom is 0 — Spark 4 runs ANSI mode by
    * default, where double division by zero throws. */
  def ratio(num: Column, denom: Column): Column =
    when(denom =!= 0.0, num / denom)

  /** Quantized squared magnitude per dimension support: round(v·1e6)
    * as long — integer arithmetic downstream is exact and
    * order-independent. */
  def quantize(v: Column): Column = round(v.cast("double") * 1e6).cast("long")
}
