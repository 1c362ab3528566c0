package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.VecFns

/** Similarity-search operator block over the `embeddings` table — the
  * Spark-native re-expression of the reference's word↔item similarity
  * search (/root/reference/redshells/app/word_item_similarity/
  * calculate_word_item_similarity.py: dot-product prequery → top-k)
  * and dimension reduction (dimension_reduction_model.py: top-n dims
  * by Σv²).
  */
object SimilaritySearch {

  /** Brute-force cosine top-k: the small query set is broadcast
    * against the corpus (map-side nested loop — the corpus is
    * streamed once, never shuffled). Top-k selection uses the bounded
    * TopKByKey aggregator (graft.plans.TopKByKey): map-side partial
    * top-k heaps mean the shuffle carries ≤ k rows per partition per
    * query and nothing is globally sorted — the window-row_number
    * formulation would shuffle and sort EVERY candidate row per
    * query. Norms are computed once per side, not per pair. This is
    * the exact baseline ANN variants are measured against. */
  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VecFns.norm(col("embedding")).as("nrm"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"))
    val scored = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(
        VecFns.ratio(VecFns.dot(col("embedding"), col("qv")),
          col("nrm") * col("qnrm")), 6))
    topKSelect(scored, 5)
  }

  /** Shared bounded top-k selection + rank materialization. */
  private[operators] def topKSelect(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.plans.TopKByKey.topK(k)(col("vec_id"), col("cosine")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .toDF("query_id", "pos", "e")
      .select(col("query_id"), col("e.id").as("neighbor_id"),
        col("e.score").as("cosine"), (col("pos") + 1).cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))

  /** IVF ANN with TRAINED coarse quantizer: MLlib KMeans (k=16,
    * seed-fixed) learns the cell centroids; every corpus vector is
    * assigned to its nearest cell, queries probe their 2 nearest
    * cells, and only in-cell candidates get the exact cosine. At
    * 100 TB the cell id becomes the shuffle/bucket key and each query
    * touches ~2/16 of the corpus; the centroid table is broadcast.
    * Approximate → rows-only; recall vs knnBrute asserted in
    * DedupSpec. */
  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VecFns.norm(col("embedding")).as("nrm"))
    val km = new KMeans().setK(16).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("feat")
      .fit(emb.select(array_to_vector(col("embedding")).as("feat")))
    val cents = km.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray) }
      .toDF("cent_id", "cv")
      .withColumn("cnrm", VecFns.norm(col("cv")))

    def nearestCells(df: DataFrame, keep: Int): DataFrame =
      df.crossJoin(broadcast(cents))
        .withColumn("csim",
          VecFns.ratio(VecFns.dot(col("embedding"), col("cv")),
            col("nrm") * col("cnrm")))
        .withColumn("crank", row_number().over(
          Window.partitionBy(col("vec_id"))
            .orderBy(col("csim").desc, col("cent_id"))))
        .filter(col("crank") <= keep)
        .drop("cv", "cnrm", "csim", "crank")

    val corpusCells = nearestCells(emb, keep = 1)
    val queryCells = nearestCells(emb.filter(col("vec_id") < 10), keep = 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"), col("cent_id"))
    val scored = corpusCells.join(queryCells, Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(
        VecFns.ratio(VecFns.dot(col("embedding"), col("qv")),
          col("nrm") * col("qnrm")), 6))
    topKSelect(scored, 5)
  }

  /** DimensionReductionModel.fit (dimension_reduction_model.py:21):
    * per-dimension importance = Σ v². Values are quantized to 1e-6 so
    * the aggregation is exact integer math — order-independent under
    * any partitioning (and engine-portable). posexplode keeps the
    * shuffle key space at |dims|, with map-side partial sums. */
  def dimReduction(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding")))
      .toDF("dim", "v")
      .select(col("dim").cast("long").as("dim"), VecFns.quantize(col("v")).as("q"))
      .groupBy(col("dim"))
      .agg(sum(col("q") * col("q")).as("importance"))
      .orderBy(col("importance").desc, col("dim"))
      .limit(16)
}
