package graft.ml

import graft.SparkTestBase
import graft.spec._
import graft.runner.LocalSparkRunner
import org.apache.spark.sql.functions._

/** Multiclass probe chain: exact nearest-centroid arithmetic
  * (hand-computable fixture), the spec-layer train→predict→evaluate chain
  * for several registry names on separable 3-class data, custom-stage store
  * round-trips, metric hand-checks, determinism across partitionings, and
  * the trained-language-ID quality gate (trained beats the stopword
  * heuristic on a multilingual fixture with held-out labels). */
class MulticlassSpec extends SparkTestBase {

  import Multiclass.CentroidFit

  private def newRunner() = new LocalSparkRunner(spark, newStoreDir())

  /** 3 well-separated class clusters in 4-d: center c has +2 at coordinate
    * c (scaled to 0.2 to stay under maxAbsInput=1), noise ±0.05. */
  private def clustered(n: Int): LoadInlineJsonDatasetOp = {
    val rng = new scala.util.Random(7)
    val labs = Seq("alpha", "beta", "gamma")
    val rows = (0 until n).map { i =>
      val c = i % 3
      val v = Seq.tabulate(4)(d =>
        (if (d == c) 0.2 else 0.0) + (rng.nextDouble() - 0.5) * 0.1)
      (v, labs(c))
    }
    LoadInlineJsonDatasetOp(Map(
      "emb" -> rows.map(_._1), "cls" -> rows.map(_._2)))
  }

  private def chain(modelType: String,
                    params: Map[String, Any] = Map.empty) = {
    val ds = clustered(300)
    val x = SelectVectorColumnOp(ds, "emb")
    val cls = SelectCategoricalColumnOp(ds, "cls")
    val split = AssignTrainTestSplitOp(ds, testSize = Some(0.25))
    val isTrain = CategoryToBooleanOp(split, Some(Seq("train")))
    val model = TrainMulticlassClassifierOp(modelType, x, cls,
      Some(isTrain), params = params)
    val pred = MulticlassPredictOp(model, x)
    val eval = MulticlassEvaluationOp(pred, cls, Some(split))
    (ds, model, pred, eval)
  }

  private def testAccuracy(eval: MulticlassEvaluationOp,
                           r: LocalSparkRunner): Double = {
    val splits = r.toJson(eval).asInstanceOf[JObj]("splits").asInstanceOf[JObj]
    val JDouble(acc) = splits("test").asInstanceOf[JObj]("accuracy"): @unchecked
    acc
  }

  test("nearest_centroid exact arithmetic on a hand-computable fixture") {
    import spark.implicits._
    // class a rows: (0.5, 0.1), (0.3, 0.3) → sums q=(800000,400000), n=2 →
    // qm=(400000,200000); class b rows: (-0.2, 0.6), (-0.4, 0.8) →
    // qm=(-300000,700000)
    val df = Seq(
      (0L, Seq(0.5, 0.1), "a"), (1L, Seq(0.3, 0.3), "a"),
      (2L, Seq(-0.2, 0.6), "b"), (3L, Seq(-0.4, 0.8), "b"))
      .toDF("id", "v", "lab")
    val fit = Multiclass.fitCentroidsExact(df, col("v"), col("lab"))
    assert(fit.labels.toSeq == Seq("a", "b"))
    assert(fit.qm.map(_.toSeq).toSeq ==
      Seq(Seq(400000L, 200000L), Seq(-300000L, 700000L)))
    // row 0 score_a = (500000·400000 + 100000·200000 − (400000² + 200000²)/2)/1e12
    //              = (2.2e11 − 1e11)/1e12 = 0.12
    // row 0 score_b = (−1.5e11 + 0.7e11 − (0.9e11+4.9e11)/2)/1e12 = −0.37
    val rows = Multiclass.scoresExact(df, col("id"), col("v"), fit)
      .orderBy("id", "label").collect()
    assert(rows.length == 8)
    val r0 = rows.filter(_.getLong(0) == 0L)
    assert(r0.map(r => (r.getString(1), r.getDouble(2))).toSeq ==
      Seq(("a", 0.12), ("b", -0.37)))
    assert(r0.forall(_.getString(3) == "a"))
    val preds = Multiclass.predictExact(df, col("id"), col("v"), fit)
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(preds == Seq("a", "a", "b", "b"))
  }

  test("scoresExact is invariant under repartitioning and row order") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val df = (0 until 200).map(i =>
      (i.toLong, Seq.fill(8)(rng.nextDouble() * 2 - 1), s"c${i % 4}"))
      .toDF("id", "v", "lab")
    val fit = Multiclass.fitCentroidsExact(df, col("v"), col("lab"))
    val a = Multiclass.scoresExact(df, col("id"), col("v"), fit)
      .orderBy("id", "label").collect()
    val fit2 = Multiclass.fitCentroidsExact(
      df.repartition(13, col("lab")).orderBy(col("id").desc), col("v"), col("lab"))
    assert(fit2.qm.map(_.toSeq).toSeq == fit.qm.map(_.toSeq).toSeq)
    val b = Multiclass.scoresExact(df.repartition(7), col("id"), col("v"), fit2)
      .orderBy("id", "label").collect()
    a.zip(b).foreach { case (x, y) => assert(x == y) } // bit-exact equality
  }

  test("maxAbsInput violation is a hard error, not silent wrap") {
    import spark.implicits._
    val df = Seq((0L, Seq(0.5, 0.1), "a"), (1L, Seq(-0.2, 0.6), "b"),
      (2L, Seq(1.5, 0.0), "a")).toDF("id", "v", "lab")
    val fitOk = Multiclass.fitCentroidsExact(
      df.filter(col("id") < 2), col("v"), col("lab"))
    val e = intercept[Exception] {
      Multiclass.predictExact(df, col("id"), col("v"), fitOk).collect()
    }
    assert(e.getMessage != null)
  }

  test("nearest_centroid spec chain: train → predict → evaluate, store round-trip") {
    val store = newStoreDir()
    val r = new LocalSparkRunner(spark, store)
    val (_, model, pred, eval) = chain("nearest_centroid")
    assert(testAccuracy(eval, r) > 0.95)
    assert(r.isDone(model) && r.isDone(pred))
    // the custom QuantizedCentroidModel stage reloads via PipelineModel.load
    val r2 = new LocalSparkRunner(spark, store)
    assert(r2.hasResult(model))
    val v1 = r.toValues(pred).map(_.asInstanceOf[String])
    val v2 = new LocalSparkRunner(spark, store).toValues(pred)
      .map(_.asInstanceOf[String])
    assert(v1 == v2)
    // prediction is a categorical column: flows into is_in masks
    val mask = CategoryToBooleanOp(pred, Some(Seq("alpha")))
    val kept = r.toValues(mask).map(_.asInstanceOf[Boolean])
    assert(kept.count(identity) > 50)
  }

  test("softmax and one_vs_rest_svc learn the 3-class clusters") {
    val r = newRunner()
    for (mt <- Seq("softmax", "one_vs_rest_svc")) {
      val (_, _, _, eval) = chain(mt, Map("max_iter" -> 30L))
      assert(testAccuracy(eval, r) > 0.9, s"$mt test accuracy")
    }
  }

  test("random_forest and naive_bayes train multiclass") {
    val r = newRunner()
    for (mt <- Seq("random_forest", "naive_bayes")) {
      val (_, _, _, eval) = chain(mt, Map("n_estimators" -> 20L))
      assert(testAccuracy(eval, r) > 0.8, s"$mt test accuracy")
    }
  }

  test("evaluate: hand-checked confusion, per-class metrics, macro-F1") {
    val r = newRunner()
    // gt:   a a a b b c
    // pred: a a b b b a
    val ds = LoadInlineJsonDatasetOp(Map(
      "gt" -> Seq("a", "a", "a", "b", "b", "c"),
      "pred" -> Seq("a", "a", "b", "b", "b", "a")))
    val eval = MulticlassEvaluationOp(
      SelectCategoricalColumnOp(ds, "pred"), SelectCategoricalColumnOp(ds, "gt"))
    val all = r.toJson(eval).asInstanceOf[JObj]("splits")
      .asInstanceOf[JObj]("all").asInstanceOf[JObj]
    assert(all("count") == JLong(6))
    assert(all("accuracy") == JDouble(4.0 / 6.0))
    val classes = all("classes").asInstanceOf[JObj]
    val a = classes("a").asInstanceOf[JObj]
    assert(a("tp") == JLong(2) && a("fp") == JLong(1) && a("fn") == JLong(1))
    assert(a("precision") == JDouble(2.0 / 3.0) && a("recall") == JDouble(2.0 / 3.0))
    val c = classes("c").asInstanceOf[JObj]
    assert(c("tp") == JLong(0) && c("fn") == JLong(1))
    assert(c("recall") == JDouble(0.0) && c("precision") == JNull)
    assert(c("f1") == JNull)
    // macro-F1 over gt-present classes: f1_a = 2/3, f1_b = 4/5, f1_c = 0
    val JDouble(macroF1) = all("macro_f1"): @unchecked
    assert(math.abs(macroF1 - (2.0 / 3.0 + 0.8 + 0.0) / 3.0) < 1e-12)
    val conf = all("confusion").asInstanceOf[JArr].items
    assert(conf.length == 4) // (a,a) (a,b) (b,b) (c,a)
  }

  test("trained language ID beats the stopword heuristic on a multilingual fixture") {
    import spark.implicits._
    // six languages, two of which (it, pt) the heuristic does not know at
    // all, and function words deliberately outside its stopword lists —
    // the trained classifier learns the vocabulary from labels instead
    val vocab = Map(
      "en" -> Seq("house", "water", "bright", "morning", "window", "garden"),
      "de" -> Seq("haus", "wasser", "hell", "morgen", "fenster", "garten"),
      "fr" -> Seq("maison", "eau", "clair", "matin", "fenetre", "jardin"),
      "es" -> Seq("casa", "agua", "claro", "manana", "ventana", "jardin2"),
      "it" -> Seq("casa2", "acqua", "chiaro", "mattina", "finestra", "giardino"),
      "pt" -> Seq("casa3", "agua2", "claro2", "manha", "janela", "jardim"))
    val langs = vocab.keys.toSeq.sorted
    val rng = new scala.util.Random(3)
    // (i/2) so both parities see every language — the fit is on even ids
    val docs = (0 until 600).map { i =>
      val lang = langs((i / 2) % langs.length)
      val ws = Seq.fill(12)(vocab(lang)(rng.nextInt(6)))
      (i.toLong, ws.mkString(" "), lang)
    }.toDF("doc_id", "text", "lang")
    val trained = graft.ext.TextAnalysis.langIdTrained(
      docs, "doc_id", "text", "lang", fitFilter = col("doc_id") % 2 === 0)
    val heldOut = docs.filter(col("doc_id") % 2 === 1)
      .join(trained, Seq("doc_id"))
    val n = heldOut.count()
    val trainedAcc = heldOut.filter(col("pred_label") === col("lang"))
      .count().toDouble / n
    val heurAcc = docs.filter(col("doc_id") % 2 === 1)
      .select(col("lang"),
        graft.ext.TextAnalysis.langId(col("text")).as("h"))
      .filter(col("h") === col("lang")).count().toDouble / n
    assert(trainedAcc > 0.99, s"trained accuracy $trainedAcc")
    assert(trainedAcc > heurAcc + 0.5,
      s"trained ($trainedAcc) must clearly beat the heuristic ($heurAcc)")
  }

  test("out-of-bound FIT features are rejected when the fitted centroid breaks the bound") {
    import spark.implicits._
    // fit inputs have no raise_error guard; the exactness contract is
    // enforced on the FITTED matrix instead — a class whose features sit
    // past maxAbs produces a centroid cell past round(maxAbs·1e6) and the
    // fit must fail loudly rather than advertise bit-replayable scores
    // whose integer bound is broken
    val df = Seq((0L, Seq(1.5, 0.0), "a"), (1L, Seq(1.7, 0.0), "a"),
      (2L, Seq(-0.2, 0.6), "b"), (3L, Seq(-0.4, 0.8), "b"))
      .toDF("id", "v", "lab")
    val e = intercept[IllegalArgumentException] {
      Multiclass.fitCentroidsExact(df, col("v"), col("lab"))
    }
    assert(e.getMessage.contains("exceeds maxAbsInput"))
    // widening the bound makes the same data legal
    val fit = Multiclass.fitCentroidsExact(df, col("v"), col("lab"),
      maxAbsInput = 2.0)
    assert(fit.qm(0)(0) == 1600000L)
  }

  test("nearest_centroid + standardize is rejected at train time unless max_abs is widened") {
    val r = newRunner()
    val ds = clustered(60)
    val x = SelectVectorColumnOp(ds, "emb")
    val cls = SelectCategoricalColumnOp(ds, "cls")
    val bad = TrainMulticlassClassifierOp("nearest_centroid", x, cls,
      preprocessing = "standardize")
    val e = intercept[Exception] { r.materialize(bad) }
    assert(e.getMessage.contains("standardize"),
      s"expected the standardize rejection, got: ${e.getMessage}")
    // an explicit max_abs > 1 sized for z-scores opts in to the combination
    val ok = TrainMulticlassClassifierOp("nearest_centroid", x, cls,
      preprocessing = "standardize", params = Map("max_abs" -> 16.0))
    r.materialize(ok)
    assert(r.isDone(ok))
  }

  test("evaluate surfaces null predictions as the <null> sentinel, not a phantom class") {
    val r = newRunner()
    val ds = LoadInlineJsonDatasetOp(Map(
      "gt" -> Seq("a", "a", "b"),
      "pred" -> Seq("a", null, "b")))
    val eval = MulticlassEvaluationOp(
      SelectCategoricalColumnOp(ds, "pred"), SelectCategoricalColumnOp(ds, "gt"))
    val all = r.toJson(eval).asInstanceOf[JObj]("splits")
      .asInstanceOf[JObj]("all").asInstanceOf[JObj]
    val classes = all("classes").asInstanceOf[JObj]
    assert(classes.fields.contains("<null>"), s"classes: ${classes.fields.keys}")
    assert(!classes.fields.contains(""))
    val nul = classes("<null>").asInstanceOf[JObj]
    // never ground truth: support 0, one false positive, no macro-F1 term
    assert(nul("support") == JLong(0) && nul("fp") == JLong(1))
    val JDouble(macroF1) = all("macro_f1"): @unchecked
    // macro over {a, b}: f1_a = 2·(1·0.5)/(1+0.5) = 2/3, f1_b = 1
    assert(math.abs(macroF1 - (2.0 / 3.0 + 1.0) / 2.0) < 1e-12)
  }
}
