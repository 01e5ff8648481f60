package org.apache.spark.ml

import org.apache.spark.ml.util.HasTrainingSummary

/** Package-placed shim over `private[ml]` members (same pattern as
  * org.apache.spark.sql.GraftBridge for sql internals).
  *
  * `dropTrainingSummary`: a fitted model's training summary
  * (HasTrainingSummary.trainingSummary) holds the SparkSession it was
  * trained with. When `transform` later serializes the model into a task
  * closure (ProbabilisticClassificationModel builds its prediction UDFs
  * over `this`), that session rides along — and the session's
  * ObservationManager is not java-serializable once observe() has
  * registered metrics on it, so an unrelated `Dataset.observe` elsewhere
  * in the JVM turns model.transform into "Task not serializable"
  * (reproduced: ObserveSpec + PipelinesSpec in one suite run). The
  * summary is a driver-side convenience; dropping it before transform
  * removes the session from the closure graph entirely. Spark exposes no
  * public clear — the setter is private[ml], hence this bridge.
  */
object GraftMlBridge {
  def dropTrainingSummary(model: HasTrainingSummary[_]): Unit =
    model.trainingSummary = None
}
