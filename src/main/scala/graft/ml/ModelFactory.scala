package graft.ml

import org.apache.spark.ml.Estimator
import org.apache.spark.ml.classification.{FMClassifier, GBTClassifier, LogisticRegression, RandomForestClassifier}
import org.apache.spark.ml.param.ParamMap

/** Prediction-model factory — re-expression of the reference's
  * factory/prediction_model_factory.py (name → sklearn estimator,
  * used by train_clasification_model.py / train_binary_clasification_
  * model.py) against MLlib estimators. The reference's XGBoost /
  * LightGBM entries map to MLlib's gradient-boosted trees; the
  * optuna search-space registry (optuna_param_factory.py) maps to the
  * ParamGridBuilder grids used in MlOps.cvTuning.
  */
object ModelFactory {

  /** name → fresh estimator, seed-fixed, features/label pre-wired. */
  def create(name: String): Estimator[_] = name match {
    case "logistic_regression" =>
      new LogisticRegression().setMaxIter(50).setRegParam(0.01)
    case "random_forest" =>
      new RandomForestClassifier().setNumTrees(20).setSeed(42L)
    case "gbt" => // reference: XGBClassifier / LGBMClassifier
      new GBTClassifier().setMaxIter(10).setSeed(42L)
    case "fm" =>
      new FMClassifier().setFactorSize(4).setMaxIter(20).setSeed(42L)
    case other =>
      throw new IllegalArgumentException(s"unknown model: $other")
  }

  val names: Seq[String] = Seq("logistic_regression", "random_forest", "gbt", "fm")

  /** Apply reference-style kwargs as a ParamMap by parameter name. */
  def withParams(est: Estimator[_], params: Map[String, Any]): Estimator[_] = {
    val pm = params.foldLeft(ParamMap.empty) { case (acc, (k, v)) =>
      acc.put(est.getParam(k).asInstanceOf[org.apache.spark.ml.param.Param[Any]], v)
    }
    est.copy(pm).asInstanceOf[Estimator[_]]
  }
}
