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
