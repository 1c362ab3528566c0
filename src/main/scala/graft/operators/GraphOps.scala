package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the interaction graph — the item-graph
  * counterpart of the reference's similarity apps (a PageRank over
  * the co-click graph is the classic "item importance" prior next to
  * calculate_similarity_with_matrix_factorization.py's pairwise
  * scores; q35/q100's connected components are the clustering
  * counterpart).
  */
object GraphOps {

  /** PageRank iteration count / damping / per-step rounding scale.
    * The q145 oracle SQL is GENERATED from these constants
    * (SparkEntry.pagerankSql) — one source of truth, the engines
    * cannot drift. */
  private[graft] val PrIters = 10
  private[graft] val PrScale = 9
  private[graft] val PrSupport = 2

  /** q145: PAGERANK over the co-click item graph (support ≥
    * [[PrSupport]] pairs, symmetrized), [[PrIters]] synchronous
    * iterations at damping 0.85 — an ORACLE-GATED iterative graph
    * algorithm, computed in FIXED-POINT integer arithmetic: ranks
    * live in 10^-[[PrScale]] units as longs, contributions are floor
    * divisions rank div deg, the damping update is
    * (10^PrScale·0.15) div N + (85·S) div 100 — every operation is
    * exact integer math, so the result is bit-identical across
    * engines AND across cluster sizes (integer sums are associative;
    * no per-iteration float rounding whose HALF_UP-vs-multiply
    * boundary semantics can diverge — a float formulation was
    * measured to disagree in the last digit exactly at the pr/2
    * half-boundary that every degree-2 node manufactures). The
    * presentation double divides the exact scaled long by 10^9 —
    * one correctly-rounded IEEE division, identical everywhere.
    * Scale shape: each iteration is one equi-join of the rank table
    * onto the (src-degree-annotated) edge list + one partial-agg
    * shuffle on dst — the standard distributed PageRank; edges and
    * degrees are persisted once (bounded: the co-click pair list),
    * and N is a single driver scalar (the documented bounded-collect
    * pattern). The reference computes item importance single-node
    * from numpy similarity matrices; this plan never materializes
    * anything denser than the edge list. */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val unit = math.pow(10, PrScale).toLong // 10^9 fixed-point units
    val pairs = WordItemApp.coClickPairs(spark, dir)
      .filter(col("support") >= PrSupport)
      .select(col("item_a").as("src"), col("item_b").as("dst"))
    val sym = pairs.unionByName(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist()
    val edges = sym.join(deg, Seq("src")).persist()
    val n = deg.count() // one bounded driver scalar (item vocabulary)
    var ranks = deg.select(col("src").as("item"),
      lit(unit / n).as("r")) // floor(10^9 / N), exact
    for (_ <- 1 to PrIters) {
      val contribs = edges.join(ranks, col("src") === col("item"))
        .select(col("dst"), expr("r div deg").as("c"))
      ranks = contribs.groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
        .select(col("dst").as("item"),
          (lit((unit * 15L / 100L) / n) + expr("(85 * s) div 100")).as("r"))
    }
    ranks
      .select(col("item"), col("r").as("pr_scaled"),
        (col("r").cast("double") / lit(unit.toDouble)).as("pr"))
      .orderBy(col("item"))
  }
}
