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

  def learningRate: Double = rate

  /** true → stop training. Mirrors early_stopping.py:26-40 exactly,
    * including NOT advancing lastValue on a failed round. */
  def doesStop(value: Double, model: M): Boolean = {
    if (savePath.isEmpty) return false
    if (lastValue * (1.0 - threshold) < value) {
      tries -= 1
      if (tries <= 0) return true
      rate /= decaySpeed
      false
    } else {
      lastValue = value
      model.write.overwrite().save(savePath.get)
      false
    }
  }

  /** Restore the checkpointed best model (saver.restore). */
  def restore(): M = reader(savePath.getOrElse(
    throw new IllegalStateException("early stopping has no save path")))
}
