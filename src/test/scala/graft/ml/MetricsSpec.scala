package graft.ml

import graft.SparkTestBase
import graft.spec._
import graft.runner.LocalSparkRunner

/** Evaluation metric math locked against hand-computed values (identical to
  * sklearn's roc_auc_score / average_precision_score on the same fixture):
  * scores [.9,.8,.7,.6], labels [1,0,1,0] → AUC .75, AP 5/6.
  * No classifier involved: the score column is selected straight off the
  * dataset, so the whole report is deterministic.
  */
class MetricsSpec extends SparkTestBase {

  private def report(threshold: Option[Double]): JObj = {
    val r = new LocalSparkRunner(spark, newStoreDir())
    val ds = LoadInlineJsonDatasetOp(Map(
      "s" -> Seq(0.9, 0.8, 0.7, 0.6),
      "cls" -> Seq("p", "n", "p", "n")))
    val score = SelectScoreColumnOp(ds, "s")
    val cls = SelectCategoricalColumnOp(ds, "cls")
    val pos = CategoryToBooleanOp(cls, Some(Seq("p")))
    val neg = CategoryToBooleanOp(cls, None, Some(Seq("p")))
    val ev = ClassifierEvaluationOp(score, pos, neg, scoreThreshold = threshold)
    r.toJson(ev).asInstanceOf[JObj]("splits").asInstanceOf[JObj]("all")
      .asInstanceOf[JObj]
  }

  private def d(o: JObj, k: String): Double = o(k).asInstanceOf[JDouble].value
  private def l(o: JObj, k: String): Long = o(k).asInstanceOf[JLong].value

  test("ROC-AUC and AP match the closed-form values") {
    val rep = report(None)
    assert(l(rep, "count") == 4 && l(rep, "n_true") == 2 && l(rep, "n_false") == 2)
    assert(math.abs(d(rep, "roc_auc") - 0.75) < 1e-12)
    assert(math.abs(d(rep, "average_precision") - 5.0 / 6.0) < 1e-12)
    assert(math.abs(d(rep, "avg_score") - 0.75) < 1e-12)
  }

  test("precision@recall grid takes max precision at or above the target recall") {
    val par = report(None)("precision_at_recall").asInstanceOf[JObj]
    // recall 0.5 achieved at rank 1 with precision 1.0
    assert(par("0.5") == JDouble(1.0))
    // full recall only at rank 3 → precision 2/3
    assert(math.abs(par("0.99").asInstanceOf[JDouble].value - 2.0 / 3.0) < 1e-12)
  }

  test("accuracy-maximizing threshold sweep") {
    val rep = report(None)
    assert(math.abs(d(rep, "accuracy") - 0.75) < 1e-12)
    assert(d(rep, "score_threshold") == 0.9) // first threshold reaching max acc
    val conf = rep("confusion").asInstanceOf[JObj]
    assert(l(conf, "tp") == 1 && l(conf, "fp") == 0 &&
      l(conf, "fn") == 1 && l(conf, "tn") == 2)
  }

  test("fixed-threshold confusion matrix") {
    val rep = report(Some(0.75))
    assert(d(rep, "score_threshold") == 0.75)
    assert(math.abs(d(rep, "accuracy") - 0.5) < 1e-12)
    val conf = rep("confusion").asInstanceOf[JObj]
    assert(l(conf, "tp") == 1 && l(conf, "fp") == 1 &&
      l(conf, "fn") == 1 && l(conf, "tn") == 1)
    // F1 = 2·0.5·0.5/(0.5+0.5)
    assert(math.abs(d(rep, "f1") - 0.5) < 1e-12)
  }

  test("curve binning caps driver collect past MaxCurvePoints (scale guard)") {
    // 12k distinct scores > MaxCurvePoints (10k) → the fixed-grid binning
    // path runs; a perfectly separable labeling keeps the expected metrics
    // essentially exact under binning (only boundary bins can mix classes)
    val n = Probes.MaxCurvePoints + 2000
    val r = new LocalSparkRunner(spark, newStoreDir())
    val ds = LoadInlineJsonDatasetOp(Map(
      "s" -> (0 until n).map(i => i.toDouble / n),
      "cls" -> (0 until n).map(i => if (i >= n / 2) "p" else "n")))
    val cls = SelectCategoricalColumnOp(ds, "cls")
    val ev = ClassifierEvaluationOp(SelectScoreColumnOp(ds, "s"),
      CategoryToBooleanOp(cls, Some(Seq("p"))),
      CategoryToBooleanOp(cls, None, Some(Seq("p"))))
    val rep = r.toJson(ev).asInstanceOf[JObj]("splits").asInstanceOf[JObj]("all")
      .asInstanceOf[JObj]
    assert(l(rep, "count") == n)
    assert(l(rep, "n_true") == n / 2) // totals come from eligible, not the curve
    assert(d(rep, "roc_auc") > 0.999)
    assert(d(rep, "accuracy") > 0.999)
  }

  test("degenerate split: no negatives → warning, AUC null") {
    val r = new LocalSparkRunner(spark, newStoreDir())
    val ds = LoadInlineJsonDatasetOp(Map(
      "s" -> Seq(0.9, 0.8), "cls" -> Seq("p", "p")))
    val cls = SelectCategoricalColumnOp(ds, "cls")
    val ev = ClassifierEvaluationOp(SelectScoreColumnOp(ds, "s"),
      CategoryToBooleanOp(cls, Some(Seq("p"))),
      CategoryToBooleanOp(cls, None, Some(Seq("p"))))
    val rep = r.toJson(ev).asInstanceOf[JObj]("splits").asInstanceOf[JObj]("all")
      .asInstanceOf[JObj]
    assert(rep("roc_auc") == JNull)
    val JArr(warnings) = rep("warnings"): @unchecked
    assert(warnings.exists(_.asInstanceOf[JString].value.contains("no negative")))
  }
}
