package graft.ml

import org.apache.spark.ml.Model
import org.apache.spark.ml.util.MLWritable

/** Validation-loss early stopping with model checkpoint/restore — the
  * Spark counterpart of the reference's EarlyStopping
  * (/root/reference/redshells/contrib/model/early_stopping.py:13).
  * Same contract as `does_stop(value, session)` there: on a round
  * whose validation value fails to improve the best by `threshold`
  * (relative), the best checkpoint is restored, a try is consumed and
  * the learning rate decays by `decaySpeed`; once tries are exhausted
  * training stops. On an improving round the model is checkpointed
  * (really written via MLWritable — the tf.train.Saver role) and the
  * best value advances.
  *
  * The checkpoint path should be durable storage at scale (the
  * reference writes model.ckpt next to the task output); `reader`
  * re-materializes the persisted best model for the caller.
  */
class EarlyStopping[M <: Model[M] with MLWritable](
    tryCount: Int = 1,
    initialLearningRate: Double = 0.0,
    decaySpeed: Double = 2.0,
    threshold: Double = 0.001,
    savePath: Option[String] = None,
    reader: String => M = (_: String) =>
      throw new IllegalStateException("no reader configured")) {

  private var lastValue = Double.MaxValue
  private var tries = tryCount
  private var rate = initialLearningRate
  private var best: Option[M] = None

  def learningRate: Double = rate

  /** The model to continue training from after the last doesStop
    * call: on a plateau round this is the checkpoint re-read from
    * storage (the reference's mid-training `saver.restore`,
    * early_stopping.py:31); on an improving round it is the model
    * just checkpointed. MLlib estimators fit from scratch each
    * round, so a caller that warm-starts must do so explicitly from
    * this model. */
  def bestModel: Option[M] = best

  /** true → stop training. Mirrors early_stopping.py:26-40,
    * including NOT advancing lastValue on a failed round and
    * restoring the best checkpoint on every failed round. */
  def doesStop(value: Double, model: M): Boolean = {
    if (savePath.isEmpty) return false
    if (lastValue * (1.0 - threshold) < value) {
      best = Some(reader(savePath.get)) // saver.restore on plateau
      tries -= 1
      if (tries <= 0) return true
      rate /= decaySpeed
      false
    } else {
      lastValue = value
      model.write.overwrite().save(savePath.get)
      best = Some(model)
      false
    }
  }

  /** The checkpointed best model (terminal saver.restore). */
  def restore(): M = best.getOrElse(reader(savePath.getOrElse(
    throw new IllegalStateException("early stopping has no save path"))))
}
