package graft.ml

import graft.SparkTestBase
import graft.spec._
import graft.runner.LocalSparkRunner
import org.apache.spark.ml.linalg.Vectors

/** Kernel-approximation probes: RFF ≈ RBF kernel, Nyström exactness at
  * m = n, nonlinear separation a linear probe cannot achieve, and store
  * round-trips through the runner.
  */
class KernelSpec extends SparkTestBase {

  import spark.implicits._

  test("RFF inner products approximate the RBF kernel") {
    val rng = new scala.util.Random(3)
    val dim = 8; val gamma = 1.0 / dim
    def z(x: Array[Double], d: Int): Array[Double] = {
      val (w, b) = KernelApprox.rffWeights(42L, d, dim, gamma)
      Array.tabulate(d) { i =>
        math.sqrt(2.0 / d) * math.cos(
          b(i) + w(i).zip(x).map { case (a, c) => a * c }.sum)
      }
    }
    val errs = (0 until 50).map { _ =>
      val x = Array.fill(dim)(rng.nextDouble() * 2 - 1)
      val y = Array.fill(dim)(rng.nextDouble() * 2 - 1)
      val exact = KernelApprox.rbf(x, y, gamma)
      val approx = z(x, 4096).zip(z(y, 4096)).map { case (a, b) => a * b }.sum
      math.abs(exact - approx)
    }
    val meanErr = errs.sum / errs.size
    assert(meanErr < 0.03, s"mean |k - z·z| = $meanErr at D=4096")
    // and the map is deterministic across calls (memoized per params)
    val x0 = Array.fill(dim)(0.5)
    assert(z(x0, 64).toSeq == z(x0, 64).toSeq)
  }

  test("Nystroem with m = n reproduces the kernel exactly") {
    val rng = new scala.util.Random(5)
    val rows = (0 until 20).map(i =>
      (i.toLong, Vectors.dense(Array.fill(4)(rng.nextDouble()))))
      .toDF("id", "features")
    val model = new NystroemEstimator().setNComponents(20).setGamma(0.5)
      .setInputCol("features").setOutputCol("z").fit(rows)
    val zs = model.transform(rows).select("id", "z").collect()
      .map(r => r.getLong(0) -> r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray)
      .toMap
    val vs = rows.collect().map(r =>
      r.getLong(0) -> r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray).toMap
    // z(x)·z(y) == k(x,y) when the landmark set is the whole dataset
    for (i <- 0L until 20L; j <- i until 20L) {
      val exact = KernelApprox.rbf(vs(i), vs(j), 0.5)
      val approx = zs(i).zip(zs(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(exact - approx) < 1e-8,
        s"pair ($i,$j): exact $exact vs nystroem $approx")
    }
  }

  /** Concentric circles: radius < 1 → positive, radius > 2 → negative.
    * No linear separator exists (the classes surround each other). */
  private def circles(n: Int): LoadInlineJsonDatasetOp = {
    val rng = new scala.util.Random(11)
    val rows = (0 until n).map { i =>
      val pos = i % 2 == 0
      val r = if (pos) rng.nextDouble() * 0.8 else 2.0 + rng.nextDouble() * 0.8
      val t = rng.nextDouble() * 2 * math.Pi
      (Seq(r * math.cos(t), r * math.sin(t)), if (pos) "in" else "out")
    }
    LoadInlineJsonDatasetOp(Map(
      "xy" -> rows.map(_._1), "label" -> rows.map(_._2)))
  }

  private def accuracyOf(modelType: String, extra: Map[String, Any] = Map.empty): Double = {
    val r = new LocalSparkRunner(spark, newStoreDir())
    val ds = circles(400)
    val x = SelectVectorColumnOp(ds, "xy")
    val cat = SelectCategoricalColumnOp(ds, "label")
    val pos = CategoryToBooleanOp(cat, Some(Seq("in")))
    val neg = CategoryToBooleanOp(cat, Some(Seq("out")))
    val model = TrainClassifierOp(modelType, x, pos, neg,
      params = Map("max_iter" -> 50L) ++ extra)
    val eval = ClassifierEvaluationOp(ClassifierPredictOp(model, x), pos, neg)
    r.toJson(eval).asInstanceOf[JObj]("splits").asInstanceOf[JObj]("all")
      .asInstanceOf[JObj]("accuracy").asInstanceOf[JDouble].value
  }

  test("RBF probes separate concentric circles where the linear probe fails") {
    // the evaluation picks the accuracy-maximizing threshold, which lifts
    // even a hopeless linear direction above 0.5 — but not much further
    val linear = accuracyOf("linear_svc")
    assert(linear < 0.8, s"linear svc should fail on circles, got $linear")
    val rbf = accuracyOf("rbf_svc", Map("gamma" -> 1.0))
    assert(rbf > 0.95, s"rbf_svc accuracy $rbf")
    assert(rbf > linear + 0.15, s"kernel lift: rbf $rbf vs linear $linear")
    val nys = accuracyOf("sgd_nystroem",
      Map("nystroem_params" -> Map("n_components" -> 64L, "gamma" -> 1.0)))
    assert(nys > 0.95, s"sgd_nystroem accuracy $nys")
  }

  test("calibrated rbf probe yields probabilities in [0,1] and store round-trips") {
    val store = newStoreDir()
    val r = new LocalSparkRunner(spark, store)
    val ds = circles(200)
    val x = SelectVectorColumnOp(ds, "xy")
    val cat = SelectCategoricalColumnOp(ds, "label")
    val pos = CategoryToBooleanOp(cat, Some(Seq("in")))
    val neg = CategoryToBooleanOp(cat, Some(Seq("out")))
    val model = TrainClassifierOp("calibrated_rbf_nusvm", x, pos, neg,
      params = Map("max_iter" -> 50L, "gamma" -> 1.0))
    val scores = r.toValues(ClassifierPredictOp(model, x))
      .map(_.asInstanceOf[Double])
    assert(scores.forall(s => s >= 0.0 && s <= 1.0),
      "calibrated scores must be probabilities")
    // a FRESH runner on the same store must RELOAD the persisted
    // PipelineModel (RFF stage + LR stage): scoring a slice the first
    // runner never scored can't be served from a cached predict result
    val r2 = new LocalSparkRunner(spark, store)
    val xHead = SelectVectorColumnOp(TakeRowsOp(ds, numRows = Some(50L)), "xy")
    val headScores = r2.toValues(ClassifierPredictOp(model, xHead))
      .map(_.asInstanceOf[Double])
    assert(headScores == scores.take(50),
      "reloaded model must reproduce the original scores")
  }

  test("one-class SVM: unsupervised fit scores planted outliers below inliers") {
    val r = new LocalSparkRunner(spark, newStoreDir())
    // 180 inliers in a tight cluster around (1,1,1); 20 far-away outliers
    val rng = new scala.util.Random(17)
    val rows = (0 until 180).map { _ =>
      (Seq(1.0 + rng.nextGaussian() * 0.05, 1.0 + rng.nextGaussian() * 0.05,
        1.0 + rng.nextGaussian() * 0.05), "in")
    } ++ (0 until 20).map { _ =>
      (Seq(rng.nextDouble() * 8 - 4, rng.nextDouble() * 8 - 4,
        rng.nextDouble() * 8 - 4), "out")
    }
    val ds = LoadInlineJsonDatasetOp(Map(
      "xy" -> rows.map(_._1), "label" -> rows.map(_._2)))
    val x = SelectVectorColumnOp(ds, "xy")
    val cat = SelectCategoricalColumnOp(ds, "label")
    val pos = CategoryToBooleanOp(cat, Some(Seq("in")))
    val neg = CategoryToBooleanOp(cat, Some(Seq("out")))
    // labels are PASSED (harness contract) but the fit ignores them —
    // outlierness must emerge from the data alone
    val model = TrainClassifierOp("sgd_nystroem_one_class_svm", x, pos, neg,
      params = Map("nu" -> 0.15, "n_components" -> 64L, "gamma" -> 0.5))
    val scores = r.toValues(ClassifierPredictOp(model, x))
      .map(_.asInstanceOf[Double])
    val inMean = scores.take(180).sum / 180
    val outMean = scores.drop(180).sum / 20
    assert(inMean > outMean,
      s"inlier mean score $inMean must exceed outlier mean $outMean")
    // ranking quality: a large majority of outliers sit in the bottom 15%
    val cut = scores.sorted.apply((scores.size * 0.15).toInt)
    val outliersFlagged = scores.drop(180).count(_ <= cut)
    assert(outliersFlagged >= 15, s"only $outliersFlagged/20 outliers in bottom 15%")
  }
}
