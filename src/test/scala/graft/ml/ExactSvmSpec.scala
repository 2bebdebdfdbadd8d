package graft.ml

import graft.SparkTestBase
import org.apache.spark.ml.linalg.{Vector, Vectors}

/** Exact kernel SVM (SMO): analytic max-margin recovery, KKT optimality,
  * kernel separation a linear probe cannot achieve, determinism across
  * input orders, the registry routing contract, and model persistence. */
class ExactSvmSpec extends SparkTestBase {

  import spark.implicits._

  private val linK = ExactSvm.kernel("linear", -1.0, 3, 1.0)

  test("linear kernel recovers the analytic max-margin separator") {
    // two points, one per class: the max-margin hyperplane is the
    // perpendicular bisector; for x+=(1,1), x-=(−1,−1): w = (1/2, 1/2),
    // b = 0, f(x) = (x1+x2)/2, and both points sit exactly on the margin
    val xs = Array(Array(1.0, 1.0), Array(-1.0, -1.0))
    val y = Array(1, -1)
    val sol = ExactSvm.solve(xs, y, c = 10.0, linK, eps = 1e-9)
    def f(x: Array[Double]): Double =
      sol.b + xs.indices.map(j => y(j) * sol.alpha(j) * linK(xs(j), x)).sum
    assert(math.abs(f(xs(0)) - 1.0) < 1e-6, s"f(x+) = ${f(xs(0))}")
    assert(math.abs(f(xs(1)) + 1.0) < 1e-6, s"f(x-) = ${f(xs(1))}")
    assert(math.abs(sol.b) < 1e-6)
    // dual: α+ = α− = ‖w‖²/... = 1/4 each (w = Σ αᵢyᵢxᵢ = α·(2,2) = (1/2,1/2))
    assert(math.abs(sol.alpha(0) - 0.25) < 1e-6, sol.alpha.toSeq.toString)
    assert(math.abs(sol.alpha(1) - 0.25) < 1e-6)
  }

  test("box constraint binds: C caps every alpha and margin violators hit it") {
    // overlapping classes on a line force slack; all alphas must stay ≤ C
    val xs = Array(Array(0.0), Array(1.0), Array(0.4), Array(0.6))
    val y = Array(-1, 1, 1, -1) // the middle two are on the wrong side
    val c = 0.7
    val sol = ExactSvm.solve(xs, y, c, linK, eps = 1e-9)
    assert(sol.alpha.forall(a => a >= -1e-12 && a <= c + 1e-12))
    assert(ExactSvm.kktResidual(xs, y, c, linK, sol) < 1e-6)
    // Σ yᵢαᵢ = 0 is preserved exactly by every SMO pair update
    val bal = xs.indices.map(i => y(i) * sol.alpha(i)).sum
    assert(math.abs(bal) < 1e-12, s"dual balance $bal")
  }

  test("RBF solve satisfies KKT on a nonseparable cloud") {
    val rng = new scala.util.Random(7)
    val xs = Array.fill(120)(Array.fill(3)(rng.nextDouble() * 2 - 1))
    val y = Array.tabulate(120)(i =>
      if (xs(i).sum + rng.nextGaussian() * 0.4 > 0) 1 else -1)
    if (!y.contains(1) || !y.contains(-1)) fail("degenerate fixture")
    val k = ExactSvm.kernel("rbf", 0.5, 3, 1.0)
    val sol = ExactSvm.solve(xs, y, c = 1.0, k, eps = 1e-4)
    assert(sol.gap < 1e-4, s"did not converge: gap ${sol.gap} after ${sol.iters}")
    // eps bounds the KKT violation up to the gap scale
    assert(ExactSvm.kktResidual(xs, y, 1.0, k, sol) < 1e-3)
  }

  test("solver is a pure function of the ordered rows") {
    val rng = new scala.util.Random(11)
    val xs = Array.fill(60)(Array.fill(4)(rng.nextDouble()))
    val y = Array.tabulate(60)(i => if (i % 3 == 0) 1 else -1)
    val k = ExactSvm.kernel("rbf", 1.0, 3, 1.0)
    val a = ExactSvm.solve(xs, y, 1.0, k)
    val b = ExactSvm.solve(xs, y, 1.0, k)
    assert(a.alpha.toSeq == b.alpha.toSeq && a.b == b.b && a.iters == b.iters)
  }

  private def circlesDf(n: Int, seed: Int) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map { i =>
      val pos = i % 2 == 0
      val r = if (pos) rng.nextDouble() * 0.8 else 2.0 + rng.nextDouble() * 0.8
      val t = rng.nextDouble() * 2 * math.Pi
      (i.toLong, Vectors.dense(r * math.cos(t), r * math.sin(t)),
        if (pos) 1.0 else 0.0)
    }.toDF("id", "features", "label")
  }

  test("estimator separates concentric circles exactly (RBF) and persists") {
    val df = circlesDf(200, 13)
    val est = new ExactSvmClassifier().setGamma(1.0).setC(10.0)
      .setFeaturesCol("features").setLabelCol("label")
    val model = est.fit(df)
    assert(model.numSupportVectors > 0)
    def accuracy(m: ExactSvmModel): Double = {
      val scored = m.transform(df)
        .select($"label", $"rawPrediction").collect()
      scored.count { r =>
        val f = r.getAs[Vector](1)(1)
        (f > 0) == (r.getDouble(0) > 0.5)
      }.toDouble / scored.length
    }
    val acc = accuracy(model)
    assert(acc == 1.0, s"exact RBF SVM should nail circles, got $acc")
    // persistence round-trip (the store path saves PipelineModels whose
    // stages must re-read)
    val dir = java.nio.file.Files.createTempDirectory("exactsvm").toString
    model.write.overwrite().save(dir)
    val back = ExactSvmModel.load(dir)
    assert(accuracy(back) == 1.0)
    assert(back.numSupportVectors == model.numSupportVectors)
  }

  test("fitted model is independent of input partitioning and row order") {
    val df = circlesDf(80, 17)
    val est = new ExactSvmClassifier().setGamma(1.0).setC(5.0)
      .setFeaturesCol("features").setLabelCol("label")
    val m1 = est.fit(df.repartition(1))
    val m2 = est.fit(df.repartition(16).sortWithinPartitions($"id".desc))
    val s1 = m1.transform(df).select($"id", $"rawPrediction").collect()
      .map(r => r.getLong(0) -> r.getAs[Vector](1)(1)).toMap
    val s2 = m2.transform(df).select($"id", $"rawPrediction").collect()
      .map(r => r.getLong(0) -> r.getAs[Vector](1)(1)).toMap
    assert(s1 == s2, "scores must be bit-identical across partitionings")
  }

  test("row cap errors clearly and points at the RFF path") {
    val df = circlesDf(30, 19)
    val est = new ExactSvmClassifier().setMaxRows(10)
      .setFeaturesCol("features").setLabelCol("label")
    val e = intercept[IllegalArgumentException](est.fit(df))
    assert(e.getMessage.contains("rff_dim"))
  }

  test("registry: rbf_svc routes exact by default, RFF when rff_dim given") {
    val exact = ClassifierRegistry.create("rbf_svc", Map("C" -> 2.0))
    assert(exact.isInstanceOf[ExactSvmClassifier])
    val rff = ClassifierRegistry.create("rbf_svc", Map("rff_dim" -> 64L))
    assert(rff.isInstanceOf[KernelClassifier])
  }

  test("nu-SVM: the nu-property brackets margin errors and support vectors") {
    // overlapping 1-D classes: errors are unavoidable, so ν's two-sided
    // bound (Schölkopf 2000, Prop. 5: #margin-errors/n ≤ ν ≤ #SVs/n) binds
    val rng = new scala.util.Random(29)
    val xs = Array.fill(200)(Array(rng.nextGaussian()))
    val y = Array.tabulate(200)(i =>
      if (xs(i)(0) + rng.nextGaussian() * 0.8 > 0) 1 else -1)
    val k = ExactSvm.kernel("rbf", 1.0, 3, 1.0)
    val nu = 0.3
    val sol = ExactSvm.solveNu(xs, y, nu, k, eps = 1e-5)
    val n = xs.length
    val nSv = sol.signedDuals.count(_ != 0.0)
    // margin errors = duals at the (scaled) upper bound effC
    val nBound = sol.signedDuals.count(d =>
      math.abs(d) >= sol.effC * (1 - 1e-6))
    assert(nBound.toDouble / n <= nu + 0.02,
      s"margin-error fraction ${nBound.toDouble / n} exceeds nu=$nu")
    assert(nSv.toDouble / n >= nu - 0.02,
      s"SV fraction ${nSv.toDouble / n} below nu=$nu")
  }

  test("nu-SVM separates circles exactly and satisfies scaled KKT") {
    val df = circlesDf(160, 31)
    val est = new ExactSvmClassifier().setSvmMode("nu").setNu(0.2)
      .setGamma(1.0).setEps(1e-5)
      .setFeaturesCol("features").setLabelCol("label")
    val model = est.fit(df)
    val scored = model.transform(df).select($"label", $"rawPrediction").collect()
    val acc = scored.count { r =>
      (r.getAs[Vector](1)(1) > 0) == (r.getDouble(0) > 0.5)
    }.toDouble / scored.length
    assert(acc == 1.0, s"exact nu-SVM should nail circles, got $acc")
    // scaled solution satisfies the C-SVM KKT form with C = effC = 1/r
    val rows = df.collect()
    val xs = rows.map(_.getAs[Vector](1).toArray)
    val ys = rows.map(r => if (r.getDouble(2) > 0.5) 1 else -1)
    assert(model.kktResidual(xs, ys) < 0.05)
  }

  test("infeasible nu errors like sklearn (2·min class fraction bound)") {
    val xs = Array.fill(20)(Array(1.0))
    val y = Array.tabulate(20)(i => if (i < 2) 1 else -1) // min frac 0.1
    val e = intercept[IllegalArgumentException](
      ExactSvm.solveNu(xs, y, 0.5, ExactSvm.kernel("linear", -1, 3, 1)))
    assert(e.getMessage.contains("infeasible"))
  }

  test("Platt calibration: probabilities ordered by decision value, both classes") {
    val df = circlesDf(160, 37)
    val model = new ExactSvmClassifier().setSvmMode("nu").setNu(0.2)
      .setGamma(1.0).setCalibrate(true)
      .setFeaturesCol("features").setLabelCol("label").fit(df)
    val out = model.transform(df)
      .select($"label", $"rawPrediction", $"probability").collect()
    val probs = out.map(r => (r.getDouble(0), r.getAs[Vector](1)(1),
      r.getAs[Vector](2)(1)))
    assert(probs.forall { case (_, _, p) => p >= 0 && p <= 1 })
    // monotone in f: sigmoid slope A < 0 in Platt's form ⇒ larger decision
    // value, larger probability
    val sorted = probs.sortBy(_._2)
    assert(sorted.zip(sorted.tail).forall { case ((_, _, p1), (_, _, p2)) =>
      p2 >= p1 - 1e-12 })
    val posMean = probs.filter(_._1 > 0.5).map(_._3).sum /
      probs.count(_._1 > 0.5)
    val negMean = probs.filter(_._1 < 0.5).map(_._3).sum /
      probs.count(_._1 < 0.5)
    assert(posMean > 0.9 && negMean < 0.1,
      s"calibrated separation: pos $posMean vs neg $negMean")
    // persistence keeps the sigmoid
    val dir = java.nio.file.Files.createTempDirectory("nusvm").toString
    model.write.overwrite().save(dir)
    val back = ExactSvmModel.load(dir)
    val p2 = back.transform(df).select($"probability").head().getAs[Vector](0)
    assert(p2(0) >= 0 && p2(1) >= 0)
  }

  test("registry: nusvm names route exact by default and emit probability") {
    assert(ClassifierRegistry.create("rbf_nusvm", Map("nu" -> 0.3))
      .isInstanceOf[ExactSvmClassifier])
    assert(ClassifierRegistry.create("calibrated_rbf_nusvm", Map.empty)
      .isInstanceOf[ExactSvmClassifier])
    assert(ClassifierRegistry.create("rbf_nusvm", Map("rff_dim" -> 64L))
      .isInstanceOf[KernelClassifier])
  }

  test("poly and linear kernels are available through params") {
    val df = circlesDf(60, 23)
    // poly degree 2 separates circles too (r² is a degree-2 monomial)
    val m = new ExactSvmClassifier().setKernelName("poly").setDegree(2)
      .setGamma(1.0).setC(10.0)
      .setFeaturesCol("features").setLabelCol("label").fit(df)
    val acc = m.transform(df).select($"label", $"rawPrediction").collect()
      .count { r =>
        (r.getAs[Vector](1)(1) > 0) == (r.getDouble(0) > 0.5)
      }.toDouble / 60
    assert(acc > 0.95, s"poly-2 accuracy $acc")
  }
}
