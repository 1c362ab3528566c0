package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTest {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sf: String = "/root/testdata/sf0.001"
}

class FrameOpsSpec extends AnyFunSuite {
  import SparkTest._

  test("every declared query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries entry: $missing")
  }

  test("pricing summary aggregates correctly") {
    val rows = operators.FrameOps.pricingSummary(spark, sf).collect()
    assert(rows.length >= 4)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val li = Tables.lineitem(spark, sf)
    import org.apache.spark.sql.functions._
    val expected = li.filter(col("l_shipdate") <= lit("2000-12-31 00:00:00").cast("timestamp")).count()
    assert(total == expected)
  }

  test("train/test split is deterministic and complete") {
    val rows = operators.FrameOps.trainTestSplit(spark, sf).collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == Tables.orders(spark, sf).count())
  }

  test("native session_window agrees with the lag+cumsum rule user for user") {
    // q10 and q131 implement the SAME split boundary (gap > 1800 s)
    // through different operators — their per-user session and event
    // counts must be identical
    val lagRule = operators.FrameOps.sessionize(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Number]("n_sessions").longValue,
        r.getAs[Number]("n_events").longValue))).toMap
    val native = operators.FrameOps.sessionWindow(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Number]("n_sessions").longValue,
        r.getAs[Number]("n_events").longValue))).toMap
    assert(lagRule.keySet == native.keySet)
    lagRule.foreach { case (u, v) => assert(native(u) == v, s"user $u") }
  }

  test("sessionize: session count never exceeds event count") {
    val rows = operators.FrameOps.sessionize(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sessions") <= r.getAs[Long]("n_events"))
    }
  }

  test("median sketch tracks the exact per-group median within 1%") {
    val exact = operators.FrameOps.medianByGroup(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val approx = operators.FrameOps.medianSketch(spark, sf).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val (exactMedian, n) = exact(r.getString(0))
      assert(r.getLong(2) == n)
      val relErr = math.abs(r.getDouble(1) - exactMedian) / exactMedian
      assert(relErr <= 0.01,
        s"${r.getString(0)}: approx ${r.getDouble(1)} vs exact $exactMedian (err $relErr)")
    }
  }

  test("filter+project plan pushes filters into the parquet scan") {
    val plan = operators.FrameOps.filterProject(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("p_size"),
      s"expected parquet pushdown in plan:\n$plan")
  }
}
