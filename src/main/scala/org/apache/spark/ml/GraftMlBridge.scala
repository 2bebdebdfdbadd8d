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

  /** Stock LinearSVCModel from externally-computed (w, b): rawPrediction =
    * [-m, m] with m = w·x + b — used by the one-class SVM, whose decision
    * score w·z(x) − ρ is exactly this margin form. (The constructor is
    * `private[classification]`, hence the sub-package bridge.) */
  def svcModel(uid: String, coefficients: Vector,
               intercept: Double): classification.LinearSVCModel =
    classification.GraftSvcBridge.svcModel(uid, coefficients, intercept)
}

package classification {
  private[ml] object GraftSvcBridge {
    def svcModel(uid: String, coefficients: Vector,
                 intercept: Double): LinearSVCModel =
      new LinearSVCModel(uid, coefficients, intercept)
  }
}
