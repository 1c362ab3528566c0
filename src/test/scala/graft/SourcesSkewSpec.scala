package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{FrameOps, Skew}
import graft.sources.Sources

class SourcesSkewSpec extends AnyFunSuite {
  import SparkTest._

  test("bucketed join plans without a shuffle on the bucketed key") {
    val df = Sources.bucketedJoin(spark, sf)
    val joinPlan = df.queryExecution.executedPlan.toString
    // the join itself must not re-exchange the bucketed relations:
    // the only Exchange allowed is the final small groupBy
    val joinSection = joinPlan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin"), joinPlan)
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"), joinPlan)
    assert(!joinSection.contains("Exchange hashpartitioning(o_orderkey"), joinPlan)
    // and results must match the plain join
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus")).collect().toSeq
    assert(df.collect().toSeq == expected)
  }

  test("partitioned sink: filtered read prunes to matching partitions") {
    import org.apache.spark.sql.functions._
    Sources.partitionedSink(spark, sf) // the write happens eagerly here
    val base = Sources.stagingDir("part", sf)
    // assert pruning on the PRODUCT read path, not a hand-built query
    val product = Sources.partitionedRead(spark, base)
    val plan = product.queryExecution.executedPlan.toString
    assert(plan.contains("IN (click,purchase)") &&
      plan.contains("PartitionFilters: [event_type"), plan)
    assert(plan.contains("PushedFilters: []"), plan)
  }

  test("stream-stream click->purchase join matches the batch join") {
    import org.apache.spark.sql.functions._
    val staged = java.nio.file.Files.createTempDirectory("graft_ssj")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      staged.resolve("events.parquet"))
    val q = graft.streaming.StreamOps.clickPurchaseJoin(spark, staged.toString)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_test")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssj_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val ev = Tables.events(spark, sf)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("purchase_id"))
      val batch = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("p_ts") >= col("click_ts") &&
          col("p_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("user_id"), col("click_id"), col("purchase_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("salted join matches the plain join result") {
    val fact = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"), col("l_linenumber"))
    val dim = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val salted = Skew.saltedJoin(fact, dim, "l_orderkey", col("l_linenumber"), 4)
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus")).collect().toSeq
    val plain = fact.join(dim, Seq("l_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus")).collect().toSeq
    assert(salted == plain)
  }

  test("sketch distinct counts are within 10% of exact") {
    val exact = FrameOps.distinctExact(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    FrameOps.distinctSketch(spark, sf).collect().foreach { r =>
      val (eo, ep) = exact(r.getString(0))
      assert(math.abs(r.getLong(1) - eo).toDouble / eo <= 0.1)
      assert(math.abs(r.getLong(2) - ep).toDouble / ep <= 0.1)
    }
  }

  test("asof join: every user's events are counted once") {
    val out = FrameOps.asofJoin(spark, sf)
    val n = out.agg(sum("n_events")).head.getLong(0)
    assert(n == Tables.events(spark, sf).count())
  }
}
