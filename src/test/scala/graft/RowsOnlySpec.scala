package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.MlOps

/** Invariant checks for the rows-only (non-oracle) queries not
  * already covered by a dedicated spec — the driver only smoke-checks
  * rows>0 for these, so the semantic guarantees live here.
  */
class RowsOnlySpec extends AnyFunSuite {
  import SparkTest._

  test("pairwise similarity eval is a consistent single summary row") {
    val r = MlOps.pairwiseSimilarity(spark, sf).head
    assert(r.getAs[Long]("n_test") > 0)
    assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_test"))
  }

  test("q204 ivf recall curve: monotone in nprobe, exhaustive level is exact") {
    import graft.operators.SimilaritySearch
    val rows = SimilaritySearch.ivfRecallCurve(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq ==
      SimilaritySearch.RecallProbes.map(_.toLong))
    val recalls = rows.map(_.getAs[Double]("recall_at_5")).toSeq
    val scanned = rows.map(_.getAs[Double]("avg_candidates")).toSeq
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
    // probing more cells only ADDS candidates -> both curves monotone
    assert(recalls == recalls.sorted, s"recall not monotone: $recalls")
    assert(scanned == scanned.sorted, s"scanned not monotone: $scanned")
    // nprobe == ivfCells probes EVERY cell: the candidate set is the
    // whole corpus, the scoring chain is q40's, so recall is exactly 1
    assert(recalls.last == 1.0, s"exhaustive level recall ${recalls.last}")
    // and the shallow level must actually be cheaper than exhaustive
    assert(scanned.head < scanned.last)
  }

  test("doc embeddings: one summary per doc, norms non-negative") {
    val out = MlOps.docEmbedding(spark, sf)
    assert(out.count() == Tables.documents(spark, sf).count())
    assert(out.filter(col("l2_norm") < 0).count() == 0)
    assert(out.select("n_dims").distinct().head.getLong(0) == 16L)
  }

  test("similarity filter keeps a strict non-empty subset with bounded cosine") {
    val out = MlOps.filterBySimilarity(spark, sf)
    val n = out.count()
    assert(n > 0 && n < Tables.documents(spark, sf).count())
    assert(out.filter(col("best_sim") > 1.000001 || col("best_sim") < -1.000001).count() == 0)
  }

  test("fm regression emits a positive rmse over the full test split") {
    val r = MlOps.fmRegression(spark, sf).head
    val expected = Tables.embeddings(spark, sf)
      .filter(pmod(col("vec_id"), lit(5)) === 0).count()
    assert(r.getAs[Long]("n_test") == expected)
    assert(r.getAs[Double]("rmse") > 0.0)
  }

  test("cv tuning reports one accuracy in [0,1] per grid candidate") {
    val rows = MlOps.cvTuning(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
    }
  }

  test("binary classification covers the split with binary labels and a valid AUC") {
    val rows = MlOps.binaryClassify(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("label")).toSet.subsetOf(Set(0L, 1L)))
    val expected = Tables.embeddings(spark, sf)
      .filter(pmod(col("vec_id"), lit(5)) === 0).count()
    assert(rows.map(_.getAs[Long]("n_test")).sum == expected)
    // calculate_auc counterpart: one AUC for the test split, in [0,1]
    val aucs = rows.map(_.getAs[Double]("auc")).distinct
    assert(aucs.length == 1 && aucs.head >= 0.0 && aucs.head <= 1.0)
  }

  test("q222 quality classifier: separable seed set, AUC and accuracy bounds") {
    val rows = MlOps.qualityClassifier(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(0L, 1L), "both classes in the holdout")
    val n = rows.map(_.getLong(1)).sum
    val correct = rows.map(_.getLong(2)).sum
    assert(n > 0)
    // q215's labels are two verified quality axes agreeing vs rule
    // failures — the signal features must separate them well
    assert(correct.toDouble / n >= 0.8, s"holdout accuracy $correct/$n")
    rows.foreach(r => assert(r.getDouble(3) >= 0.9, s"AUC ${r.getDouble(3)}"))
    // warm path serves the identical collected rows
    val again = MlOps.qualityClassifier(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q223 learned admission: margins replayed driver-side, confusion exact") {
    val m = MlOps.qualityModel(spark, sf)
    val w = m.coefficients.toArray
    val perDoc = Tables.documents(spark, sf)
      .select(Seq(col("doc_id"), col("source")) ++
        graft.operators.TextOps.gopherSignalCols: _*)
      .select(Seq(col("doc_id"), col("source"), col("n_words"),
        col("mean_wlen"), col("ttr")) ++
        graft.operators.TextOps.gopherRuleCols: _*)
      .join(graft.operators.CorpusOps.docNll(spark, sf)
        .select(col("doc_id"),
          round(col("doc_nll").cast("double"), 6).as("doc_nll")), Seq("doc_id"))
      .withColumn("pass", graft.operators.TextOps.gopherPass)
      .collect()
    val expect = perDoc.groupBy(_.getString(1)).map { case (s, g) =>
      val stats = g.map { r =>
        val margin = w(0) * r.getLong(2).toDouble + w(1) * r.getDouble(3) +
          w(2) * r.getDouble(4) + w(3) * r.getDouble(9) + m.intercept
        (r.getBoolean(10), margin > 0.0)
      }
      s -> ((g.length.toLong, stats.count(_._1).toLong,
        stats.count(_._2).toLong, stats.count(x => x._1 == x._2).toLong))
    }
    val rows = MlOps.learnedAdmission(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == expect.keySet)
    rows.foreach { r =>
      val (n, p, l, a) = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((n, p, l, a)), s"${r.getString(0)} confusion")
      assert(r.getDouble(5) == a.toDouble / n.toDouble)
    }
    // the learned rule both admits and rejects somewhere, and the
    // two gates genuinely disagree on part of the corpus (that
    // disagreement IS the migration review surface)
    val totN = rows.map(_.getLong(1)).sum
    val totL = rows.map(_.getLong(3)).sum
    val totA = rows.map(_.getLong(4)).sum
    assert(totL > 0L && totL < totN)
    assert(totA < totN && totA > totN / 2)
  }

  test("lda doc topics: one dominant topic per doc with weight in (0,1]") {
    val out = MlOps.ldaDocTopics(spark, sf)
    assert(out.count() == Tables.documents(spark, sf).count())
    assert(out.filter(col("topic") < 0 || col("topic") > 4).count() == 0)
    assert(out.filter(col("weight") <= 0 || col("weight") > 1).count() == 0)
  }
}
