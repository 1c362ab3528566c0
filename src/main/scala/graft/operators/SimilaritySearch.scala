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
    * streamed once, never shuffled), then one shuffle on query_id for
    * the top-k window. Norms are computed once per side, not per
    * pair. This is the exact baseline ANN variants are measured
    * against. */
  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VecFns.norm(col("embedding")).as("nrm"))
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"))
    emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(
        VecFns.dot(col("embedding"), col("qv")) / (col("nrm") * col("qnrm")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-style ANN: coarse quantization to the nearest of 16 seed
    * centroids (broadcast), probing the 2 nearest cells per query.
    * Only in-cell candidates get the exact cosine — at 100 TB the
    * cell id becomes the shuffle/bucket key and each query touches
    * 2/16 of the corpus. Approximate → rows-only; recall vs knnBrute
    * asserted in SimilaritySpec. */
  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VecFns.norm(col("embedding")).as("nrm"))
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"),
        col("nrm").as("cnrm"))

    def nearestCells(df: DataFrame, keep: Int): DataFrame =
      df.crossJoin(broadcast(cents))
        .withColumn("csim",
          VecFns.dot(col("embedding"), col("cv")) / (col("nrm") * col("cnrm")))
        .withColumn("crank", row_number().over(
          Window.partitionBy(col("vec_id"))
            .orderBy(col("csim").desc, col("cent_id"))))
        .filter(col("crank") <= keep)
        .drop("cv", "cnrm", "csim", "crank")

    val corpusCells = nearestCells(emb, keep = 1)
    val queryCells = nearestCells(emb.filter(col("vec_id") < 10), keep = 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"), col("cent_id"))
    corpusCells.join(queryCells, Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(
        VecFns.dot(col("embedding"), col("qv")) / (col("nrm") * col("qnrm")), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("cosine"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
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
