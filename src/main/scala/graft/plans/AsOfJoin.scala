package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftshim.ColumnShim

/** As-of join as a first-class operator: for every left row, attach
  * the LATEST right row with the same key and time ≤ the left time
  * (or nulls if none) — the temporal-join primitive (market data,
  * "state as of event time").
  *
  * Why a custom operator instead of composition: the union+window
  * form (FrameOps.asofJoin, kept as the oracle) must null-pad BOTH
  * schemas into one relation before the window pass — at 100 TB with
  * wide tables that doubles the shuffled bytes. This exec declares
  * `ClusteredDistribution` + per-partition `(key, time)` ordering, so
  * Catalyst plans ONE hash shuffle + sort per side, and the merge is
  * a streaming per-partition pass holding exactly one retained right
  * row — no padding, no buffering.
  *
  * Wired through the full extension stack: logical node → planner
  * Strategy (GraftExtensions) → physical exec; user API is
  * `AsOfJoin(leftDf, rightDf, ...)`.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides clustered on the key, UNPINNED partition count —
    * exactly what SortMergeJoinExec declares. zipPartitions needs the
    * two sides at the same parallelism with identical partition
    * boundaries; that co-partitioning is the planner's job
    * (EnsureRequirements shuffles both sides to a common
    * HashPartitioning, and AQE's coalescing either rewrites the
    * joint group with shared boundaries or is rejected by
    * ValidateRequirements), not this exec's. Round 1 pinned
    * `requiredNumPartitions = numShufflePartitions` out of caution;
    * that blocked AQE from coalescing tiny post-shuffle partitions
    * and forced 32 sort tasks on KB-sized data. doExecute still
    * hard-asserts equal partition counts, so a planner regression
    * fails loudly instead of zipping mismatched partitions. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    // rightTie makes equal-(key,time) resolution deterministic: the
    // retained row is the max-tie row, matching the window oracle
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTie, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  /** Rows stay hash-partitioned by the left key — advertising it lets
    * Catalyst skip a re-shuffle for downstream groupBy/join on that
    * key. */
  override def outputPartitioning = left.outputPartitioning

  /** Ordinal of an attribute expression in a schema. The user API
    * only ever passes Attributes, so the merge loop can read key/time
    * as raw getLong(ordinal) — no per-row projection allocation. */
  private def ordinalOf(e: Expression, schema: Seq[Attribute]): Int = e match {
    case a: Attribute =>
      val i = schema.indexWhere(_.exprId == a.exprId)
      require(i >= 0, s"attribute $a not found in child output")
      i
    case other =>
      throw new IllegalStateException(s"as-of join key/time must be a column, got $other")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = ordinalOf(leftKey, left.output)
    val lTimeOrd = ordinalOf(leftTime, left.output)
    val rKeyOrd = ordinalOf(rightKey, right.output)
    val rTimeOrd = ordinalOf(rightTime, right.output)
    val rSchemaLen = right.output.length
    val out = output
    val lRdd = left.execute()
    val rRdd = right.execute()
    require(lRdd.getNumPartitions == rRdd.getNumPartitions,
      "as-of join children must be co-partitioned, got " +
        s"${lRdd.getNumPartitions} vs ${rRdd.getNumPartitions}")
    lRdd.zipPartitions(rRdd) { (lIt, rIt) =>
      val result = UnsafeProjection.create(out, out)
      val nullRight = new GenericInternalRow(rSchemaLen)
      val joined = new JoinedRow

      // streaming merge: both sides sorted by (key, time)
      val rBuf = rIt.buffered
      var heldKey: Long = 0L
      var heldHasKey = false
      var held: InternalRow = null // latest right row for heldKey so far

      def rightKeyOf(r: InternalRow): Long = r.getLong(rKeyOrd)
      def rightTimeOf(r: InternalRow): Long = r.getLong(rTimeOrd)

      lIt.map { lRow =>
        val k = lRow.getLong(lKeyOrd)
        val t = lRow.getLong(lTimeOrd)
        // drop right rows for keys before k
        while (rBuf.hasNext && rightKeyOf(rBuf.head) < k) {
          rBuf.next(); heldHasKey = false
        }
        if (!heldHasKey || heldKey != k) { held = null; heldKey = k; heldHasKey = true }
        // advance through right rows of key k with time <= t
        while (rBuf.hasNext && rightKeyOf(rBuf.head) == k && rightTimeOf(rBuf.head) <= t) {
          held = rBuf.next().copy()
        }
        result(joined(lRow, if (held != null) held else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {
  /** User API: asOfJoin(left, right) ON left[keyCol] == right[keyCol]
    * taking the latest right row with right[timeCol] <= left[timeCol].
    * Key and time columns must be LongType (epoch style) on both
    * sides. Requires AsOfJoinStrategy (GraftExtensions) on the
    * session. */
  def apply(spark: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTie: String = null): DataFrame = {
    val lPlan = ColumnShim.analyzed(left)
    val rPlan = ColumnShim.analyzed(right)
    def attr(p: LogicalPlan, name: String): Attribute = {
      val a = p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name"))
      // the exec reads keys/times as raw longs; narrower types would
      // be read with the wrong byte stride (silently wrong joins)
      require(a.dataType == org.apache.spark.sql.types.LongType,
        s"as-of join column $name must be LongType, got ${a.dataType}")
      a
    }
    val tie = attr(rPlan, if (rightTie == null) rightTime else rightTie)
    ColumnShim.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime), tie))
  }
}
