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

  /** PQ codebook registry (see knnPq): index artifacts keyed by
    * (session, corpus dir). */
  private val pqCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Seq[org.apache.spark.ml.clustering.KMeansModel]]

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
    * assigned to its nearest cell, queries probe their `nprobe`
    * nearest cells, and only in-cell candidates get the exact cosine.
    * At 100 TB the cell id becomes the shuffle/bucket key and each
    * query touches ~nprobe/16 of the corpus; the centroid table is
    * broadcast. nprobe is the recall/cost knob: probing more cells
    * only ADDS candidates, and a brute-top-k member in the candidate
    * set always survives the exact re-rank, so recall vs brute is
    * provably non-decreasing in nprobe (asserted in DedupSpec).
    * Approximate → rows-only; recall vs knnBrute asserted in
    * DedupSpec. */
  def knnIvf(spark: SparkSession, dir: String, nprobe: Int = 2): DataFrame = {
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
    val queryCells = nearestCells(emb.filter(col("vec_id") < 10), keep = nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"), col("cent_id"))
    val scored = corpusCells.join(queryCells, Seq("cent_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(
        VecFns.ratio(VecFns.dot(col("embedding"), col("qv")),
          col("nrm") * col("qnrm")), 6))
    topKSelect(scored, 5)
  }

  /** Product-quantization ANN (the Faiss-style scale path beyond IVF,
    * and the deeper-ANN item from SURVEY §7): the 64-dim space is
    * split into 8 subspaces of 8 dims; a seed-fixed KMeans codebook
    * (k=16) is trained per subspace and every corpus vector is
    * encoded as 8 small codes — at 100 TB the corpus scan reads
    * 8 bytes + id per vector instead of 256 bytes of floats
    * (32× less I/O), and the codebooks (8×16×8 doubles) broadcast
    * anywhere. Queries score candidates by ADC (asymmetric distance:
    * per-query 8×16 lookup table, codes never decoded), keep a
    * bounded candidate set per query via TopKByKey, then re-rank just
    * those candidates with the exact cosine. Composes with IVF
    * (knnIvf) by scanning only the probed cells' codes; kept flat
    * here so the PQ recall is measured on its own.
    * Approximate → rows-only; planted-twin recall asserted in
    * DedupSpec. */
  def knnPq(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val m = 8          // subspaces
    val subDim = 8     // dims per subspace
    val k = 16         // codebook size per subspace
    val nCandidates = 50
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        VecFns.norm(col("embedding")).as("nrm"))
    // Per-subspace codebooks: a per-(session, corpus) index artifact —
    // trained once and reused by every query against the index, like
    // the w2v/ALS registries (the models hold only driver-side
    // centroid arrays). Trained on a deterministic 1/4 sample
    // (standard PQ practice — codebooks need a sample, not the
    // corpus) collapsed to 2 partitions, with random init (kmeans||
    // costs ~5 extra distributed rounds per fit; the exact re-rank
    // absorbs codebook quality) and bounded iters. The 8 fits are
    // independent seed-fixed jobs dominated by per-job scheduling on
    // the tiny sample, so they are submitted CONCURRENTLY (the same
    // trick as MLlib tuning's `parallelism`).
    val codebooks = SimilaritySearch.pqCache.getOrElseUpdate((spark, dir), {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val trainSample = emb.filter(pmod(col("vec_id"), lit(4)) === 0)
        .select((0 until m).map(j => array_to_vector(
          slice(col("embedding"), j * subDim + 1, subDim)).as(s"sub_$j")): _*)
        .repartition(2).persist()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(m)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      try Await.result(Future.sequence((0 until m).map { j =>
        Future(new KMeans().setK(k).setSeed(42L + j).setMaxIter(6)
          .setInitMode("random")
          .setFeaturesCol(s"sub_$j").setPredictionCol(s"code_$j")
          .fit(trainSample))
      }), Duration.Inf)
      finally { pool.shutdown(); trainSample.unpersist(blocking = false) }
    })
    // encode the corpus: 8 chained narrow transforms, no shuffle
    val encoded = codebooks.zipWithIndex.foldLeft(
        emb.withColumns((0 until m).map(j => s"sub_$j" ->
          array_to_vector(slice(col("embedding"), j * subDim + 1, subDim))).toMap)) {
      case (df, (km, _)) => km.transform(df)
    }.select(col("vec_id") +: (0 until m).map(j => col(s"code_$j")): _*)
    // per-query ADC tables: ||q_j - c||² for each subspace × centroid.
    // The query set is the small side by contract (probes); the table
    // column is m×k doubles per query — broadcast with the queries.
    val centroids: Array[Array[Array[Double]]] =
      codebooks.map(_.clusterCenters.map(_.toArray)).toArray
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("nrm").as("qnrm"))
    val adcTable = array((0 until m).map { j =>
      array((0 until k).map { c =>
        val cent = centroids(j)(c)
        // Σ_d (q_d − cent_d)²  — left-to-right fold over the subspace
        (0 until subDim).map { d =>
          val q = element_at(col("qv"), j * subDim + d + 1).cast("double")
          (q - lit(cent(d))) * (q - lit(cent(d)))
        }.reduce(_ + _)
      }: _*)
    }: _*)
    val q = queries.withColumn("adc", adcTable)
    // ADC scan: approx dist = Σ_j table[j][code_j]; bounded top-N per
    // query (negated: TopKByKey keeps the BEST=highest score)
    val scored = encoded.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("neg_adc", -(0 until m).map(j =>
        element_at(element_at(col("adc"), j + 1), col(s"code_$j") + 1))
        .reduce(_ + _))
    val cand = scored.groupBy(col("query_id"))
      .agg(graft.plans.TopKByKey.topK(nCandidates)(col("vec_id"), col("neg_adc")).as("top"))
      .select(col("query_id"), explode(col("top.id")).as("vec_id"))
    // exact re-rank of the bounded candidate set only
    val exact = cand
      .join(emb, Seq("vec_id"))
      .join(queries, Seq("query_id"))
      .withColumn("cosine", round(
        VecFns.ratio(VecFns.dot(col("embedding"), col("qv")),
          col("nrm") * col("qnrm")), 6))
    topKSelect(exact, 5)
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
