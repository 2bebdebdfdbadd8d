package org.apache.spark.ml

import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.ml.linalg.Vector

/** Bridge into Spark ML's `private[spark]` model constructors — needed to
  * build a standard, MLWritable `LogisticRegressionModel` from closed-form
  * coefficients (graft's difference-of-means probe trains with one
  * aggregation pass, no iterative estimator). Constructing the stock model
  * class keeps persistence, loading, and `transform` identical to the
  * LBFGS-trained path. The sibling of `sql.GraftColumnBridge` — the only
  * two files in the repo outside the `graft` namespace.
  */
object GraftMlBridge {
  def logisticModel(uid: String, coefficients: Vector,
                    intercept: Double): LogisticRegressionModel =
    new LogisticRegressionModel(uid, coefficients, intercept)
}
