package graft.ml

import org.apache.spark.ml.{Estimator, Model, Pipeline, PipelineStage, Transformer}
import org.apache.spark.ml.classification._
import org.apache.spark.ml.feature.{IndexToString, Normalizer, StandardScaler}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.param.{DoubleParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import scala.collection.immutable.ListMap

import graft.spec._
import graft.runner.LocalSparkRunner

/** Multiclass probe chain — the capability the reference's binary-only
  * probes (`probe_implementations.py:197` asserts exactly two classes;
  * SURVEY §1.2 lists multi-class labels as unsupported) cannot express,
  * and the one a real curation pipeline needs first: documents classify
  * into LANGUAGES, domains, and quality tiers, not booleans.
  *
  * Three pieces:
  *  - [[MulticlassRegistry]] — string-keyed estimator factories behind the
  *    same registry convention as the binary [[ClassifierRegistry]]:
  *    softmax (multinomial LR), one-vs-rest wrappers, trees, gaussian NB,
  *    and `nearest_centroid` (below).
  *  - [[NearestCentroidClassifier]] / [[QuantizedCentroidModel]] — the
  *    QUANTIZED-EXACT member: per-class centroids in 1e-6 integer
  *    arithmetic, scored as `x·μ_c − ‖μ_c‖²/2` (the argmin-distance /
  *    argmax-margin form of nearest-class-mean) with every partial sum an
  *    integer below 2⁵³ — so train AND predict are bit-reproducible across
  *    engines and the gate queries hash-match in DuckDB. This is the
  *    multiclass sibling of [[DiffOfMeansClassifier]] and trains in ONE
  *    distributed aggregation pass — the probe you can fit on 100 TB.
  *  - [[Multiclass]] — runner entry points (train/predict/evaluate for the
  *    spec ops) and the direct exact fit/score API the oracle queries use.
  *
  * Scale shape: training aggregates (class, dim) integer sums — one
  * explode + one groupBy whose cardinality is classes × dim regardless of
  * corpus size; the fitted model collapses to plan literals, so scoring is
  * a map-only pass (no join, no shuffle); evaluation is one
  * (split, gt, pred) groupBy whose cardinality is bounded by splits ×
  * classes², collected driver-side under an explicit cap.
  */
object MulticlassRegistry {

  type Factory = Map[String, Any] => Estimator[_ <: Model[_]]

  private val registry = scala.collection.mutable.LinkedHashMap.empty[String, Factory]

  def register(name: String)(f: Factory): Unit = registry(name) = f

  def names: Seq[String] = registry.keys.toSeq

  def create(name: String, params: Map[String, Any]): Estimator[_] =
    registry.getOrElse(name, throw new IllegalArgumentException(
      s"unknown multiclass model_type '$name'. Registered: ${names.mkString(", ")}"))
      .apply(params)

  private def dblP(params: Map[String, Any], key: String, default: Double): Double =
    params.get(key).map {
      case d: Double => d; case l: Long => l.toDouble; case i: Int => i.toDouble
      case o => throw new IllegalArgumentException(s"param $key: bad value $o")
    }.getOrElse(default)
  private def intP(params: Map[String, Any], key: String, default: Int): Int =
    params.get(key).map {
      case l: Long => l.toInt; case i: Int => i
      case o => throw new IllegalArgumentException(s"param $key: bad value $o")
    }.getOrElse(default)

  // softmax regression — Spark ML LogisticRegression IS multinomial when
  // the label has > 2 values; pin the family so a 2-class fit stays in the
  // same parameterization as any other k
  register("softmax") { p =>
    new LogisticRegression().setFamily("multinomial")
      .setMaxIter(intP(p, "max_iter", 100))
      .setRegParam(dblP(p, "reg_param", 0.0))
      .setTol(dblP(p, "tol", 1e-6))
  }
  // one-vs-rest lifts any binary margin learner to k classes (k parallel
  // binary fits; prediction = max raw margin)
  register("one_vs_rest_svc") { p =>
    new OneVsRest().setClassifier(new LinearSVC()
      .setMaxIter(intP(p, "max_iter", 100))
      .setRegParam(dblP(p, "reg_param", 0.01)))
  }
  register("one_vs_rest_logistic") { p =>
    new OneVsRest().setClassifier(new LogisticRegression()
      .setMaxIter(intP(p, "max_iter", 100))
      .setRegParam(dblP(p, "reg_param", 0.0)))
  }
  register("random_forest") { p =>
    new RandomForestClassifier()
      .setNumTrees(intP(p, "n_estimators", 100))
      .setMaxDepth(intP(p, "max_depth", 5))
      .setSeed(intP(p, "random_state", 42).toLong)
  }
  register("decision_tree") { p =>
    new DecisionTreeClassifier()
      .setMaxDepth(intP(p, "max_depth", 5))
      .setSeed(intP(p, "random_state", 42).toLong)
  }
  register("naive_bayes") { _ =>
    new NaiveBayes().setModelType("gaussian")
  }
  // the closed-form exact member — one aggregation pass, hash-replayable
  register("nearest_centroid") { p =>
    new NearestCentroidClassifier()
      .setMaxAbsInput(dblP(p, "max_abs", 1.0))
  }
}

/** Nearest-class-mean model in quantized-exact arithmetic. Inputs quantize
  * to 1e-6 (hard error past `maxAbsInput` — the exactness contract is a
  * precondition, not a comment), centroids are integer 1e-6 units, and
  * `score_c = (Σ qx·qm_c − ½Σ qm_c²) / 1e12` — every partial sum an
  * integer (or half-integer) far below 2⁵³, so the double accumulation is
  * exact in any order and the whole predict path replays bit-for-bit in
  * SQL. Prediction = argmax score, first-max-wins (ties → smallest class
  * index, the engine-wide tie-break).
  *
  * State lives entirely in Params (the centroid matrix as canonical JSON —
  * classes × dim longs, the model IS small), so the stock
  * `DefaultParamsWritable` machinery persists it and
  * `PipelineModel.load` restores it through the same store round-trip as
  * any Spark ML stage. Scoring compiles to Column expressions over plan
  * literals: map-only, no join, no shuffle — the 100 TB inference shape.
  */
class QuantizedCentroidModel(override val uid: String)
    extends Model[QuantizedCentroidModel] with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("qcentroid"))

  final val featuresCol: Param[String] =
    new Param[String](this, "featuresCol", "features column (ML vector)")
  final val centroidsJson: Param[String] =
    new Param[String](this, "centroidsJson",
      "classes x dim quantized (1e-6 units) centroid matrix, row-major JSON")
  final val maxAbsInput: DoubleParam =
    new DoubleParam(this, "maxAbsInput",
      "hard bound on |feature| accepted at score time (exactness contract)")
  setDefault(featuresCol -> "features", maxAbsInput -> 1.0)

  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setCentroidsJson(v: String): this.type = set(centroidsJson, v)
  def setMaxAbsInput(v: Double): this.type = set(maxAbsInput, v)

  /** Parsed centroid matrix (bounded: classes × dim longs). */
  lazy val centroids: Array[Array[Long]] = Json.parse($(centroidsJson)) match {
    case JArr(rows) => rows.map {
      case JArr(xs) => xs.map {
        case JLong(v) => v
        case o => throw new IllegalArgumentException(s"bad centroid cell $o")
      }.toArray
      case o => throw new IllegalArgumentException(s"bad centroid row $o")
    }.toArray
    case o => throw new IllegalArgumentException(s"bad centroid matrix $o")
  }

  def numClasses: Int = centroids.length

  /** Exact per-class score array for a VECTOR features column. */
  def scoresCol(features: Column): Column =
    QuantizedCentroidModel.exactScores(
      vector_to_array(features), centroids, $(maxAbsInput))

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    df.withColumn("__scores", scoresCol(col($(featuresCol))))
      .withColumn("prediction",
        (array_position(col("__scores"), array_max(col("__scores"))) - 1)
          .cast("double"))
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(featuresCol)),
      s"missing features column ${$(featuresCol)}")
    QuantizedCentroidModel.outputSchema(schema)
  }

  override def copy(extra: ParamMap): QuantizedCentroidModel = defaultCopy(extra)
}

object QuantizedCentroidModel extends DefaultParamsReadable[QuantizedCentroidModel] {

  /** transform() appends these two columns; declared so downstream Pipeline
    * stages (IndexToString) validate during `Pipeline.fit`'s schema pass. */
  private[ml] def outputSchema(schema: StructType): StructType = {
    import org.apache.spark.sql.types._
    schema
      .add(StructField("__scores", ArrayType(DoubleType, containsNull = false)))
      .add(StructField("prediction", DoubleType))
  }

  /** `score_c = (Σᵢ qxᵢ·qm_cᵢ − ½Σᵢ qm_cᵢ²) / 1e12` over an array<double>
    * column, as pure Column expressions (codegen'd dot kernel, centroid
    * rows as plan literals). Shared by the model and the direct exact API
    * so both compute THE SAME expression tree. */
  private[ml] def exactScores(arr: Column, qm: Array[Array[Long]],
                              maxAbs: Double): Column = {
    val qx = transform(arr, x =>
      when(abs(x) > maxAbs, raise_error(concat(
        lit(s"nearest_centroid: |feature| exceeds maxAbsInput=$maxAbs " +
          "(quantized-exact contract): "), x.cast("string"))))
        .otherwise(round(x.cast("double") * 1e6)))
    array(qm.map { qmc =>
      // ½Σ qm² is a driver-side exact sum: each term ≤ (maxAbs·1e6)², the
      // total below 2⁵³ by the fit-time bound, so the running double sum
      // is integer-exact in any order; the /2 is dyadic
      var ss = 0.0
      var i = 0
      while (i < qmc.length) { ss += qmc(i).toDouble * qmc(i); i += 1 }
      // ONE array literal per centroid (not dim scattered lit() nodes):
      // k-means re-plans this expression every Lloyd pass, and analysis +
      // codegen of k×dim CreateArray children dominated small-data fits
      val qmLit = typedlit(qmc.map(_.toDouble).toSeq)
      (graft.ext.VectorKernels.dot(qx, qmLit) - lit(ss / 2.0)) / 1e12
    }: _*)
  }
}

/** One-pass estimator for [[QuantizedCentroidModel]]: per-(class, dim)
  * integer sums (order-independent, overflow-safe to ~9e12 rows per
  * class), centroid cell = `round(sum/count)` computed BY Spark's round —
  * the same half-up the SQL replay uses. Expects the double class-index
  * label column the multiclass train plumbing produces (0..k−1). */
class NearestCentroidClassifier(override val uid: String)
    extends Estimator[QuantizedCentroidModel] {

  def this() = this(Identifiable.randomUID("ncentroid"))

  final val featuresCol: Param[String] =
    new Param[String](this, "featuresCol", "features column (ML vector)")
  final val labelCol: Param[String] =
    new Param[String](this, "labelCol", "class-index label column (0..k-1)")
  final val maxAbsInput: DoubleParam =
    new DoubleParam(this, "maxAbsInput", "hard bound on |feature|")
  setDefault(featuresCol -> "features", labelCol -> "label", maxAbsInput -> 1.0)

  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setMaxAbsInput(v: Double): this.type = set(maxAbsInput, v)

  override def fit(ds: Dataset[_]): QuantizedCentroidModel = {
    val mx = $(maxAbsInput)
    val qm = Multiclass.fitQuantizedMatrix(
      ds.toDF().select(col($(labelCol)).cast("int").as("__c"),
        vector_to_array(col($(featuresCol))).as("__xs")), mx)
    val model = new QuantizedCentroidModel(uid + "-model")
      .setFeaturesCol($(featuresCol))
      .setMaxAbsInput(mx)
      .setCentroidsJson(Json.render(JArr(qm.map(row =>
        JArr(row.map(v => JLong(v): JValue).toVector): JValue).toVector)))
    model.setParent(this)
    model
  }

  override def copy(extra: ParamMap): NearestCentroidClassifier = defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(featuresCol)),
      s"missing features column ${$(featuresCol)}")
    QuantizedCentroidModel.outputSchema(schema)
  }
}

/** Train / predict / evaluate for MULTICLASS probes (the spec ops
  * `TrainMulticlassClassifierOp` / `MulticlassPredictOp` /
  * `MulticlassEvaluationOp`) plus the direct exact fit/score API the
  * hash-gated queries and the trained language-ID use. */
object Multiclass {

  private val RowIdx = graft.ops.ColumnOps.RowIdx

  /** Cap on distinct class labels (the label table broadcasts). */
  val MaxClasses = 10000
  /** Cap on collected (split, gt, pred) confusion cells. */
  val MaxConfusionCells = 100000

  /** Exact per-class quantized centroids: labels sorted (the deterministic
    * class indexing every engine can replay), matrix of `round(sum/count)`
    * 1e-6-unit longs. */
  final case class CentroidFit(labels: Array[String], qm: Array[Array[Long]],
                               maxAbsInput: Double)

  /** One-pass (class, dim) integer aggregation over (`__c` int, `__xs`
    * array<double>) rows; enforces the 2⁵³ exactness bound. */
  private[ml] def fitQuantizedMatrix(prepared: DataFrame,
                                     maxAbs: Double): Array[Array[Long]] = {
    val agg = prepared
      .select(col("__c"), posexplode(col("__xs")))
      .select(col("__c"), col("pos"),
        round(col("col").cast("double") * 1e6).cast("long").as("__q"))
      .groupBy(col("__c"), col("pos"))
      .agg(round(sum(col("__q")).cast("double") / count(lit(1)))
        .cast("long").as("__qm"))
      .collect()
    require(agg.nonEmpty, "nearest_centroid: no training rows")
    val k = agg.iterator.map(_.getInt(0)).max + 1
    val dim = agg.iterator.map(_.getInt(1)).max + 1
    require(agg.length == k * dim,
      s"nearest_centroid: incomplete class x dim grid (got ${agg.length} " +
        s"cells for k=$k dim=$dim — every class index 0..${k - 1} needs rows)")
    val qm = Array.ofDim[Long](k, dim)
    agg.foreach(r => qm(r.getInt(0))(r.getInt(1)) = r.getLong(2))
    // exactness bound: |qx| ≤ maxAbs·1e6 (raise_error-enforced at score
    // time), |qm| ≤ maxAbs·1e6 (a rounded mean of such), so every dot
    // partial sum ≤ (maxAbs·1e6)²·dim — require it under 2⁵³
    val bound = (maxAbs * 1e6) * (maxAbs * 1e6) * dim
    require(bound < (1L << 53).toDouble,
      f"quantized centroid dot may exceed 2^53 ($bound%.3g): inputs larger " +
        f"than maxAbsInput=$maxAbs or dimension too high for exact scoring")
    requireCentroidBound(qm, maxAbs)
    qm
  }

  /** Fit inputs are NOT raise_error-guarded (only score inputs are), so an
    * out-of-bound training feature would silently produce centroid cells
    * past maxAbs·1e6 and break the 2⁵³ dot bound the scorer's exactness
    * proof rests on. Enforce the |qm| ≤ round(maxAbs·1e6) invariant on the
    * fitted matrix itself — driver-side, classes × dim cells, cheap. */
  private[ml] def requireCentroidBound(qm: Array[Array[Long]],
                                       maxAbs: Double): Unit = {
    val cap = math.round(maxAbs * 1e6)
    qm.iterator.zipWithIndex.foreach { case (row, c) =>
      row.iterator.zipWithIndex.foreach { case (v, d) =>
        require(math.abs(v) <= cap,
          s"nearest_centroid: fitted centroid cell (class=$c, dim=$d) = $v " +
            s"exceeds maxAbsInput=$maxAbs in 1e-6 units ($cap) — training " +
            "features are out of the quantized-exact bound; raise max_abs " +
            "or scale the inputs")
      }
    }
  }

  /** Fit exact centroids directly from (vector, string-label) columns —
    * the oracle-query / language-ID entry point. Null labels are excluded
    * (unlabeled rows can't vote).
    *
    * ONE corpus pass: the (label, dim) aggregation is computed once and
    * persisted (its output is classes × dim rows — metadata), and both the
    * class-cardinality guard and the centroid collect read that tiny
    * aggregate — no separate label-distinct scan of the corpus. */
  def fitCentroidsExact(df: DataFrame, vec: Column, label: Column,
                        maxAbsInput: Double = 1.0): CentroidFit = {
    val agg = df
      .select(label.cast("string").as("__lab"), vec.cast("array<double>").as("__xs"))
      .filter(col("__lab").isNotNull)
      .select(col("__lab"), posexplode(col("__xs")))
      .select(col("__lab"), col("pos"),
        round(col("col").cast("double") * 1e6).cast("long").as("__q"))
      .groupBy(col("__lab"), col("pos"))
      .agg(round(sum(col("__q")).cast("double") / count(lit(1)))
        .cast("long").as("__qm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val k = agg.select(col("__lab")).distinct().count()
      require(k >= 2, "multiclass fit needs >= 2 distinct labels")
      require(k <= MaxClasses,
        s"more than $MaxClasses distinct labels — not a classification label")
      val rows = agg.collect()
      val labels = rows.map(_.getString(0)).distinct.sorted
      val dims = rows.iterator.map(_.getInt(1)).max + 1
      require(rows.length == labels.length * dims,
        s"incomplete class x dim grid (${rows.length} cells for " +
          s"k=${labels.length} dim=$dims)")
      val index = labels.zipWithIndex.toMap
      val qm = Array.ofDim[Long](labels.length, dims)
      rows.foreach(r => qm(index(r.getString(0)))(r.getInt(1)) = r.getLong(2))
      val bound = (maxAbsInput * 1e6) * (maxAbsInput * 1e6) * dims
      require(bound < (1L << 53).toDouble,
        f"quantized centroid dot may exceed 2^53 ($bound%.3g): inputs " +
          f"larger than maxAbsInput=$maxAbsInput or dimension too high")
      requireCentroidBound(qm, maxAbsInput)
      CentroidFit(labels, qm, maxAbsInput)
    } finally agg.unpersist()
  }

  private def scoresArr(vec: Column, fit: CentroidFit): Column =
    QuantizedCentroidModel.exactScores(
      vec.cast("array<double>"), fit.qm, fit.maxAbsInput)

  private def predCol(scores: Column, fit: CentroidFit): Column =
    element_at(typedlit(fit.labels.toSeq),
      array_position(scores, array_max(scores)).cast("int"))

  /** Long-format exact scores: one row per (id, class) —
    * `(id, label, score, pred_label)` — the hash-comparable shape (every
    * score an exact quotient of integer arithmetic, the argmax first-max
    * deterministic). Map-only over plan literals: no join, no shuffle. */
  def scoresExact(df: DataFrame, idCol: Column, vec: Column,
                  fit: CentroidFit): DataFrame = {
    val s = df.select(idCol.as("id"), scoresArr(vec, fit).as("__s"))
      .withColumn("pred_label", predCol(col("__s"), fit))
    s.select(col("id"), posexplode(col("__s")), col("pred_label"))
      .select(col("id"),
        element_at(typedlit(fit.labels.toSeq), col("pos").cast("int") + 1)
          .as("label"),
        col("col").as("score"), col("pred_label"))
  }

  /** Argmax class only: `(id, pred_label)`. */
  def predictExact(df: DataFrame, idCol: Column, vec: Column,
                   fit: CentroidFit): DataFrame =
    df.select(idCol.as("id"), scoresArr(vec, fit).as("__s"))
      .select(col("id"), predCol(col("__s"), fit).as("pred_label"))

  // ---------------- runner entry points (spec ops) ----------------

  /** Assemble (features, class-index label) and fit the registry estimator;
    * the returned PipelineModel ends with an [[IndexToString]] stage mapping
    * `prediction` back to the ORIGINAL string labels (sorted order = class
    * index — deterministic, engine-replayable), so the store round-trip
    * carries the label vocabulary inside the model. */
  def train(r: LocalSparkRunner, op: TrainMulticlassClassifierOp): Transformer = {
    val x = r.toFrame(op.x).select(col(RowIdx), col(r.ValueCol).as("__x"))
    val lab = r.toFrame(op.labels)
      .select(col(RowIdx), col(r.ValueCol).cast("string").as("__lab"))
    var rows = x.join(lab, RowIdx)
    op.trainDomain.foreach { d =>
      rows = rows.join(
        r.toFrame(d).select(col(RowIdx), col(r.ValueCol).as("__dom")), RowIdx)
        .filter(col("__dom")).drop("__dom")
    }
    val withLab = rows.filter(col("__lab").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE validation pass yields the label vocabulary AND the row count
      // (the binary train path's merged-validation lesson): per-label
      // counts are a k-row collect off the persisted training frame
      val labCounts = withLab.groupBy(col("__lab"))
        .agg(count(lit(1)).as("__cn"))
        .limit(MaxClasses + 1).collect()
        .map(r0 => r0.getString(0) -> r0.getLong(1))
      require(labCounts.length >= 2,
        "multiclass training needs >= 2 distinct labels")
      require(labCounts.length <= MaxClasses,
        s"more than $MaxClasses distinct labels — not a classification label")
      val labels = labCounts.map(_._1).sorted
      val spark = r.spark
      import spark.implicits._
      val idx = broadcast(labels.zipWithIndex
        .map { case (l, i) => (l, i.toDouble) }.toSeq.toDF("__lab", "label"))
      val labeledWide = withLab.join(idx, "__lab")
        .select(col(RowIdx),
          array_to_vector(col("__x").cast("array<double>")).as("__feat"),
          col("label"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // same data-sized partitioning trim as the binary train path: an
        // iterative fit launches a task per partition per iteration
        val n = labCounts.map(_._2).sum
        require(n > 0, "no multiclass training rows (labels ∩ domain empty)")
        val rowsPerPartition = 100000L
        val np = labeledWide.rdd.getNumPartitions.toLong
        val targetParts = math.max(1L, math.min(np, n / rowsPerPartition + 1)).toInt
        val labeled = labeledWide.coalesce(targetParts)

        // standardize emits z-scores that routinely exceed the quantized-
        // exact scorer's default |feature| ≤ max_abs bound, so the
        // combination would only surface as a confusing per-row
        // raise_error at predict time — reject it at train time unless the
        // caller explicitly widened max_abs past the default
        require(op.modelType != "nearest_centroid" ||
          op.preprocessing != "standardize" ||
          op.params.get("max_abs").exists {
            case d: Double => d > 1.0; case l: Long => l > 1L; case i: Int => i > 1
            case _ => false
          },
          "nearest_centroid with preprocessing=standardize: z-scores exceed " +
            "the default max_abs=1.0 exactness bound at predict time — use " +
            "preprocessing=none/normalize, or pass an explicit max_abs > 1 " +
            "(e.g. 16.0) sized to the expected z-score range")
        val stages = scala.collection.mutable.ListBuffer.empty[PipelineStage]
        val featCol = op.preprocessing match {
          case "none" => "__feat"
          case "standardize" =>
            stages += new StandardScaler().setInputCol("__feat")
              .setOutputCol("__scaled").setWithMean(true).setWithStd(true)
            "__scaled"
          case "normalize" =>
            stages += new Normalizer().setInputCol("__feat")
              .setOutputCol("__scaled").setP(2.0)
            "__scaled"
        }
        val est = MulticlassRegistry.create(op.modelType, op.params)
        est.getClass.getMethod("setFeaturesCol", classOf[String]).invoke(est, featCol)
        est.getClass.getMethod("setLabelCol", classOf[String]).invoke(est, "label")
        stages += est.asInstanceOf[PipelineStage]
        stages += new IndexToString().setInputCol("prediction")
          .setOutputCol("__pred_label").setLabels(labels)
        new Pipeline().setStages(stages.toArray).fit(labeled)
      } finally labeledWide.unpersist()
    } finally withLab.unpersist()
  }

  /** Predicted class label per row (a CATEGORICAL column). */
  def predict(r: LocalSparkRunner, op: MulticlassPredictOp): DataFrame = {
    val model = r.toModel(op.model)
    val x = r.toFrame(op.x).select(col(RowIdx),
      array_to_vector(col(r.ValueCol).cast("array<double>")).as("__feat"))
    model.transform(x).select(col(RowIdx), col("__pred_label").as(r.ValueCol))
  }

  /** Per-split multiclass report: accuracy, per-class
    * precision/recall/F1/support, macro-F1 (over ground-truth-present
    * classes), and the full confusion matrix. One (split, gt, pred)
    * groupBy — cardinality ≤ splits × classes², collected under
    * [[MaxConfusionCells]]. All metrics derive from integer counts by
    * single divisions: deterministic, hash-comparable. */
  def evaluate(r: LocalSparkRunner, op: MulticlassEvaluationOp): JValue = {
    val pred = r.toFrame(op.predicted)
      .select(col(RowIdx), col(r.ValueCol).cast("string").as("__pred"))
    val gt = r.toFrame(op.gtLabels)
      .select(col(RowIdx), col(r.ValueCol).cast("string").as("__gt"))
    var rows = pred.join(gt, RowIdx)
    op.predictDomain.foreach { d =>
      rows = rows.join(
        r.toFrame(d).select(col(RowIdx), col(r.ValueCol).as("__dom")), RowIdx)
        .filter(col("__dom")).drop("__dom")
    }
    rows = op.split match {
      case Some(s) =>
        rows.join(r.toFrame(s)
          .select(col(RowIdx), col(r.ValueCol).cast("string").as("__split")), RowIdx)
      case None => rows.withColumn("__split", lit("all"))
    }
    val cells = rows.filter(col("__gt").isNotNull)
      .groupBy(col("__split"), col("__gt"), col("__pred"))
      .agg(count(lit(1)).as("__n"))
      .limit(MaxConfusionCells + 1)
      .collect()
    require(cells.length <= MaxConfusionCells,
      s"confusion matrix exceeds $MaxConfusionCells cells — labels are " +
        "not a bounded class vocabulary")

    val bySplit = cells.groupBy(_.getString(0))
    val splits = bySplit.keys.toSeq.sorted.map { sp =>
      // NULL predictions (rows the model declined / predict-domain gaps
      // joined as missing) surface as an explicit "<null>" class in the
      // confusion matrix and per-class rows rather than being silently
      // folded into a phantom ""-labeled class; "<null>" never has
      // ground-truth support, so it contributes fp counts and a confusion
      // row but no macro-F1 term (support-0 rule below)
      val cs = bySplit(sp).map(r0 =>
        (r0.getString(1), Option(r0.getString(2)).getOrElse("<null>"), r0.getLong(3)))
      val n = cs.map(_._3).sum
      val correct = cs.collect { case (g, p, c) if g == p => c }.sum
      val classes = cs.flatMap(c => Seq(c._1, c._2)).distinct.sorted
      val perClass = classes.map { cl =>
        val tp = cs.collect { case (g, p, c) if g == cl && p == cl => c }.sum
        val fp = cs.collect { case (g, p, c) if g != cl && p == cl => c }.sum
        val fn = cs.collect { case (g, p, c) if g == cl && p != cl => c }.sum
        val support = tp + fn
        val precision = if (tp + fp > 0) JDouble(tp.toDouble / (tp + fp)) else JNull
        val recall = if (support > 0) JDouble(tp.toDouble / support) else JNull
        val f1 = (precision, recall) match {
          case (JDouble(p), JDouble(rr)) if p + rr > 0 =>
            JDouble(2 * p * rr / (p + rr))
          case (JDouble(_), JDouble(_)) => JDouble(0.0)
          case _ => JNull
        }
        cl -> (support, tp, fp, fn, precision, recall, f1)
      }
      // macro-F1 over classes PRESENT in the ground truth (support > 0):
      // predicted-only phantom classes contribute a confusion row but not
      // a macro term
      val f1s = perClass.collect {
        case (_, (support, _, _, _, _, _, JDouble(f))) if support > 0 => f
        case (_, (support, _, _, _, _, _, JNull)) if support > 0 => 0.0
      }
      val macroF1 = if (f1s.nonEmpty) JDouble(f1s.sum / f1s.length) else JNull
      val classObjs = perClass.map { case (cl, (support, tp, fp, fn, p, rr, f)) =>
        cl -> (JObj(
          "support" -> JLong(support), "tp" -> JLong(tp),
          "fp" -> JLong(fp), "fn" -> JLong(fn),
          "precision" -> p, "recall" -> rr, "f1" -> f): JValue)
      }
      val confusion = cs.sortBy(c => (c._1, c._2)).map { case (g, p, c) =>
        JObj("gt" -> JString(g), "pred" -> JString(p), "n" -> JLong(c)): JValue
      }
      sp -> (JObj(
        "count" -> JLong(n),
        "accuracy" -> (if (n > 0) JDouble(correct.toDouble / n) else JNull),
        "macro_f1" -> macroF1,
        "classes" -> JObj(ListMap(classObjs: _*)),
        "confusion" -> JArr(confusion.toVector)): JValue)
    }
    JObj("splits" -> JObj(ListMap(splits: _*)))
  }
}
