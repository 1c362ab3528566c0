package graft.plans

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregator: keeps the k best (score desc, id asc)
  * entries per group with partial merge.
  *
  * This is the scale-correct physical shape for "top-k neighbors per
  * query": a window `row_number` materializes and SORTS every
  * candidate row per key after the shuffle, whereas a bounded
  * aggregation buffer does map-side partial top-k, so the shuffle
  * carries at most k rows per (partition × key) and nothing is ever
  * globally sorted. At 100 TB with millions of candidates per query
  * vector this is the difference between a bounded-memory single
  * pass and a spill-heavy sort.
  *
  * Mirrors the reference's per-word top-k selection
  * (/root/reference/redshells/app/word_item_similarity/
  * calculate_word_item_similarity.py:48 argsort[-size:]) as a
  * distributed aggregate.
  */
object TopKByKey {

  case class Entry(id: Long, score: Double)

  /** Buffer: fixed-capacity list kept sorted worst-first for O(k)
    * bounded insert; tiny k makes the linear ops cheap and the
    * Encoder-friendly representation keeps partial buffers columnar.
    */
  case class TopKAgg(k: Int) extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    // total order (java.lang.Double.compare): transitive even with
    // NaN scores, so sorting never throws and results are
    // deterministic regardless of row encounter order
    private def better(a: Entry, b: Entry): Boolean = {
      val c = java.lang.Double.compare(a.score, b.score)
      c > 0 || (c == 0 && a.id < b.id)
    }

    override def zero: List[Entry] = Nil

    /** Buffer kept sorted worst-first; O(k) linear insertion. */
    private def insert(buf: List[Entry], e: Entry): List[Entry] = buf match {
      case head :: tail if better(e, head) => head :: insert(tail, e)
      case _ => e :: buf
    }

    override def reduce(buf: List[Entry], e: Entry): List[Entry] = {
      if (buf.sizeIs >= k) {
        if (better(e, buf.head)) insert(buf.tail, e) else buf
      } else insert(buf, e)
    }

    override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      b.foldLeft(a)(reduce)

    override def finish(buf: List[Entry]): Seq[Entry] = buf.reverse

    override def bufferEncoder: Encoder[List[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()

    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Column form: top_k(struct(id, score)) → array<struct<id,score>>
    * ordered best-first. */
  def topK(k: Int)(id: Column, score: Column): Column = {
    val agg = udaf(TopKAgg(k), Encoders.product[Entry])
    agg(id, score)
  }

  /** CUT-THEN-RANK scale guard for global "top-K by (score desc,
    * tie asc)" selections (the lever-(h) sibling for EXACT string
    * tie-breaks, where the heap's id-hash tie order can't replicate
    * the declarative one): compute the K-th-best score with the
    * bounded per-partition heap as a BROADCAST SCALAR (no driver
    * action, no global sort), then return the input filtered to the
    * rows that can possibly rank ≤ K — score ≥ that cut. The caller
    * applies the EXACT rank window on the survivor set, which is K +
    * boundary-tie rows instead of the whole table, so the
    * single-task window stops being the scale bottleneck while the
    * selected set (and the oracle's plain-window statement) is
    * value-identical. Fewer than K rows → cut = −∞ (everything
    * survives, the window sees what it always saw). */
  def cutTop(df: org.apache.spark.sql.DataFrame, score: Column,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val cut = df.agg(topK(k)(lit(0L), score.cast("double")).as("t"))
      .select(when(size(col("t")) >= k,
        element_at(col("t"), k).getField("score"))
        .otherwise(lit(Double.NegativeInfinity)).as("cut_score"))
    df.crossJoin(broadcast(cut))
      .filter(score.cast("double") >= col("cut_score"))
      .drop("cut_score")
  }
}
