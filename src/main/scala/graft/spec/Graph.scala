package graft.spec

import scala.collection.immutable.ListMap

final class UUIDMismatchException(val expected: String, val actual: OpSpec)
  extends RuntimeException(
    s"""UUID mismatch on reserialized node:
       |  expected: $expected
       |  actual:   ${actual.uuid}
       |  canonical: ${actual.canonicalJsonForUuid}
       |The definition of ${actual.typeName} has changed since the graph was
       |serialized (fields added/removed, defaults changed, canonical-JSON
       |drift).""".stripMargin)

/** Graph (de)serialization — the on-disk format of the reference
  * (`op_spec.py:701-735`):
  *
  * {{{
  * {"outputs": ["Uuid_...", ...],
  *  "nodes": {"Uuid_...": {"type": "ClassName", ...fields, deps as uuids}}}
  * }}}
  *
  * Deserialization re-verifies every node's UUID (drift → hard error with a
  * diff, reference `op_spec.py:142-155, 811-818`), detects cycles
  * (`op_spec.py:787-789`) and rejects unreachable nodes (`op_spec.py:823-826`).
  */
object Graph {

  def serialize(outputs: OpSpec*): JObj = {
    val nodes = scala.collection.mutable.LinkedHashMap.empty[String, JValue]
    def visit(op: OpSpec): Unit = if (!nodes.contains(op.uuid)) {
      nodes(op.uuid) = op.toJson
      op.children.foreach(visit)
    }
    outputs.foreach(visit)
    JObj(
      "outputs" -> JArr(outputs.map(o => JString(o.uuid): JValue).toVector),
      "nodes" -> JObj(ListMap(nodes.toSeq: _*)))
  }

  def serializeToString(outputs: OpSpec*): String =
    Json.renderPretty(serialize(outputs: _*))

  def deserialize(data: JValue): Seq[OpSpec] = {
    val obj = data match {
      case o: JObj => o
      case other => throw new IllegalArgumentException(s"graph must be an object, got $other")
    }
    val nodesData: Map[String, JObj] = obj.get("nodes") match {
      case Some(JObj(fields)) => fields.map {
        case (k, o: JObj) => (k, o)
        case (k, other) => throw new IllegalArgumentException(s"node $k must be an object, got $other")
      }
      case _ => Map.empty
    }
    val outputs: Seq[String] = obj.get("outputs") match {
      case Some(JArr(items)) => items.map {
        case JString(s) => s
        case other => throw new IllegalArgumentException(s"output uuid must be a string, got $other")
      }
      case _ => Seq.empty
    }

    val built = scala.collection.mutable.HashMap.empty[String, OpSpec]
    val inProgress = scala.collection.mutable.HashSet.empty[String]

    def construct(uuid: String): OpSpec = built.getOrElse(uuid, {
      if (inProgress(uuid))
        throw new IllegalArgumentException(s"Cycle detected in graph at node $uuid")
      inProgress += uuid
      val node = nodesData.getOrElse(uuid,
        throw new IllegalArgumentException(s"Node with UUID $uuid not found in graph data"))
      val tpe = node("type") match {
        case JString(s) => s
        case other => throw new IllegalArgumentException(s"bad type field $other")
      }
      val dec = OpRegistry.decoderFor(tpe).getOrElse(
        throw new IllegalArgumentException(
          s"Class with name $tpe not found in OpSpec registry"))
      val op = dec(node, construct)
      if (op.uuid != uuid) throw new UUIDMismatchException(uuid, op)
      inProgress -= uuid
      built(uuid) = op
      op
    })

    val result = outputs.map(construct)
    if (built.size != nodesData.size) {
      val unreachable = nodesData.keySet -- built.keySet
      throw new IllegalArgumentException(
        s"Unreachable nodes in graph: ${unreachable.toSeq.sorted.mkString(", ")}")
    }
    result
  }

  def deserializeString(s: String): Seq[OpSpec] = deserialize(Json.parse(s))

  /** Dependency query with field paths (reference
    * `graph_transformations.get_dependencies`, `graph_transformations.py:
    * 39-74`): every dependency reachable from the roots — excluding the
    * roots themselves — with the FIELD PATH it was found under (field name,
    * then seq index / sorted map key for nested containers). `recursive =
    * false` stops at direct children (reference depth ≤ 1); `typeFilter`
    * prunes both the result AND the descent, like the reference's
    * `filter_type` isinstance gate. First-visit wins for both path and
    * dedup, in deterministic field order.
    */
  def dependencies(roots: Seq[OpSpec], recursive: Boolean = true,
                   typeFilter: OpSpec => Boolean = _ => true)
    : Seq[(OpSpec, Seq[Any])] = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    val traversed = scala.collection.mutable.HashSet.empty[String]
    val results = scala.collection.mutable.ListBuffer.empty[(OpSpec, Seq[Any])]
    def collectWithPath(v: Any, path: Seq[Any]): Seq[(OpSpec, Seq[Any])] =
      v match {
        case op: OpSpec => Seq((op, path))
        case Some(x) => collectWithPath(x, path)
        case m: scala.collection.Map[_, _] =>
          m.toSeq.sortBy(_._1.toString).flatMap { case (k, x) =>
            collectWithPath(x, path :+ k.toString)
          }
        case xs: Iterable[_] => xs.toSeq.zipWithIndex.flatMap { case (x, i) =>
          collectWithPath(x, path :+ i)
        }
        case _ => Seq.empty
      }
    def visit(op: OpSpec, depth: Int, path: Seq[Any]): Unit = {
      if (!recursive && depth > 1) return
      if (!typeFilter(op)) return
      // descend each node's fields ONCE: a diamond-shaped DAG re-reached
      // through another path contributes nothing new below it (first-visit
      // wins for both dedup and paths), and without this gate traversal is
      // O(paths) — exponential on deep shared lineages
      if (traversed.add(op.uuid)) {
        op.fieldPairs.foreach { case (name, v) =>
          collectWithPath(v, path :+ name).foreach { case (child, p) =>
            visit(child, depth + 1, p)
          }
        }
      }
      if (depth > 0 && seen.add(op.uuid)) results += ((op, path))
    }
    roots.foreach(visit(_, 0, Seq.empty))
    results.toList
  }

  /** The subset of `roots` that other roots depend on, directly or
    * transitively (reference `get_dependencies` inter-root usage,
    * `tests/test_graph_transformations.py:593-690`) — useful for ordering
    * multi-output materialization. */
  def interRootDependencies(roots: Seq[OpSpec]): Seq[OpSpec] = {
    val rootIds = roots.map(_.uuid).toSet
    val depIds = dependencies(roots).map(_._1.uuid).toSet
    roots.filter(r => rootIds.contains(r.uuid) && depIds.contains(r.uuid))
  }

  /** Multi-root substitution (reference `graph_transformations.py:112-160`):
    * rewrite several output roots against the same substitution set with a
    * SHARED memo, so sub-DAGs shared between roots stay reference-identical
    * after the rewrite. */
  def substitute(roots: Seq[OpSpec],
                 substitutions: Seq[(OpSpec, OpSpec)]): Seq[OpSpec] = {
    val byUuid = substitutions.map { case (t, r) => t.uuid -> r }.toMap
    val memo = scala.collection.mutable.HashMap.empty[String, OpSpec]
    def go(op: OpSpec): OpSpec =
      memo.getOrElseUpdate(op.uuid,
        byUuid.getOrElse(op.uuid, {
          val rewritten = op.mapChildren(go)
          byUuid.getOrElse(rewritten.uuid, rewritten)
        }))
    roots.map(go)
  }
}

/** Per-op JSON decoders: the deserialization half of the spec layer. Explicit
  * registration doubles as the extension point for user-defined ops (the
  * reference finds classes by a subclass-tree name search,
  * `op_spec.py:738-766`; a registry is the idiomatic JVM equivalent).
  */
object OpRegistry {

  type Resolve = String => OpSpec
  type Decoder = (JObj, Resolve) => OpSpec

  // ---------- field decode helpers ----------

  private def bad(n: String, v: JValue, want: String): Nothing =
    throw new IllegalArgumentException(s"field '$n': expected $want, got $v")

  def str(o: JObj, n: String): String =
    o(n) match { case JString(s) => s; case v => bad(n, v, "string") }
  def lng(o: JObj, n: String): Long = o(n) match {
    case JLong(l) => l
    case JDouble(d) if d.isWhole => d.toLong
    case v => bad(n, v, "integer")
  }
  def dbl(o: JObj, n: String): Double = o(n) match {
    case JDouble(d) => d; case JLong(l) => l.toDouble; case v => bad(n, v, "number")
  }
  def bool(o: JObj, n: String): Boolean =
    o(n) match { case JBool(b) => b; case v => bad(n, v, "boolean") }
  def optStr(o: JObj, n: String): Option[String] = o.get(n) match {
    case None | Some(JNull) => None
    case Some(JString(s)) => Some(s)
    case Some(v) => bad(n, v, "string or null")
  }
  def optLng(o: JObj, n: String): Option[Long] = o.get(n) match {
    case None | Some(JNull) => None
    case Some(JLong(l)) => Some(l)
    case Some(v) => bad(n, v, "integer or null")
  }
  def optDbl(o: JObj, n: String): Option[Double] = o.get(n) match {
    case None | Some(JNull) => None
    case Some(JDouble(d)) => Some(d)
    case Some(JLong(l)) => Some(l.toDouble)
    case Some(v) => bad(n, v, "number or null")
  }
  def optAnyNum(o: JObj, n: String): Option[Any] = o.get(n) match {
    case None | Some(JNull) => None
    case Some(JLong(l)) => Some(l)
    case Some(JDouble(d)) => Some(d)
    case Some(v) => bad(n, v, "number or null")
  }
  def optStrSeq(o: JObj, n: String): Option[Seq[String]] = o.get(n) match {
    case None | Some(JNull) => None
    case Some(JArr(items)) => Some(items.map {
      case JString(s) => s; case v => bad(n, v, "string")
    })
    case Some(v) => bad(n, v, "array or null")
  }
  def anySeq(o: JObj, n: String): Seq[Any] = o(n) match {
    case JArr(items) => items.map(Json.toScala)
    case v => bad(n, v, "array")
  }
  def strSeq(o: JObj, n: String): Seq[String] = o(n) match {
    case JArr(items) => items.map {
      case JString(s) => s
      case v => bad(n, v, "string")
    }
    case v => bad(n, v, "array")
  }
  def strSeqSeq(o: JObj, n: String): Seq[Seq[String]] = o(n) match {
    case JArr(items) => items.map {
      case JArr(inner) => inner.map {
        case JString(s) => s
        case v => bad(n, v, "string")
      }: Seq[String]
      case v => bad(n, v, "array")
    }
    case v => bad(n, v, "array")
  }
  def lngSeq(o: JObj, n: String): Seq[Long] = o(n) match {
    case JArr(items) => items.map {
      case JLong(l) => l
      case JDouble(d) if d.isWhole => d.toLong
      case v => bad(n, v, "integer")
    }
    case v => bad(n, v, "array")
  }
  def anyMap(o: JObj, n: String): Map[String, Any] = o(n) match {
    case JObj(fields) => fields.map { case (k, v) => (k, Json.toScala(v)) }.toMap
    case v => bad(n, v, "object")
  }
  def optAnyMap(o: JObj, n: String): Option[Map[String, Any]] = o.get(n) match {
    case None | Some(JNull) => None
    case Some(JObj(fields)) =>
      Some(fields.map { case (k, v) => (k, Json.toScala(v)) }.toMap)
    case Some(v) => bad(n, v, "object or null")
  }
  def dblMap(o: JObj, n: String): Map[String, Double] = o(n) match {
    case JObj(fields) => fields.map {
      case (k, JDouble(d)) => (k, d)
      case (k, JLong(l)) => (k, l.toDouble)
      case (k, v) => bad(s"$n.$k", v, "number")
    }.toMap
    case v => bad(n, v, "object")
  }
  def colSeqMap(o: JObj, n: String): Map[String, Seq[Any]] = o(n) match {
    case JObj(fields) => fields.map {
      case (k, JArr(items)) => (k, items.map(Json.toScala): Seq[Any])
      case (k, v) => bad(s"$n.$k", v, "array")
    }.toMap
    case v => bad(n, v, "object")
  }
  def op[T <: OpSpec](o: JObj, n: String, r: Resolve): T =
    (o(n) match {
      case JString(u) => r(u)
      case v => bad(n, v, "uuid string")
    }).asInstanceOf[T]
  def optOp[T <: OpSpec](o: JObj, n: String, r: Resolve): Option[T] = o.get(n) match {
    case None | Some(JNull) => None
    case Some(JString(u)) => Some(r(u).asInstanceOf[T])
    case Some(v) => bad(n, v, "uuid string or null")
  }
  def opSeq(o: JObj, n: String, r: Resolve): Seq[OpSpec] = o(n) match {
    case JArr(items) => items.map {
      case JString(u) => r(u); case v => bad(n, v, "uuid string")
    }
    case v => bad(n, v, "array")
  }
  def opMap[T <: OpSpec](o: JObj, n: String, r: Resolve): Map[String, T] = o(n) match {
    case JObj(fields) => fields.map {
      case (k, JString(u)) => (k, r(u).asInstanceOf[T])
      case (k, v) => bad(s"$n.$k", v, "uuid string")
    }.toMap
    case v => bad(n, v, "object")
  }

  // ---------- the registry ----------

  // user-registered decoders for CUSTOM op types (the deserialization half
  // of the reference's extension story — a custom op needs this plus a
  // runner implementation, LocalSparkRunner.registerImplementation)
  private val custom =
    scala.collection.concurrent.TrieMap.empty[String, Decoder]

  /** Register a decoder for a custom op type. Registrations shadow
    * built-ins of the same name (latest wins). */
  def register(typeName: String)(d: Decoder): Unit = custom(typeName) = d

  def decoderFor(typeName: String): Option[Decoder] =
    custom.get(typeName).orElse(decoders.get(typeName))

  val decoders: Map[String, Decoder] = Map(
    "LoadLocalParquetDatasetOp" -> ((o, _) =>
      LoadLocalParquetDatasetOp(str(o, "content_hash"), str(o, "file_path"))),
    "LoadInlineJsonDatasetOp" -> ((o, _) =>
      LoadInlineJsonDatasetOp(colSeqMap(o, "data"))),
    "LoadLocalJsonlDatasetOp" -> ((o, _) =>
      LoadLocalJsonlDatasetOp(str(o, "content_hash"), str(o, "file_path"))),
    "LoadLocalCsvDatasetOp" -> ((o, _) =>
      LoadLocalCsvDatasetOp(str(o, "content_hash"), str(o, "file_path"),
        bool(o, "header"))),
    "SelectTextColumnOp" -> ((o, r) =>
      SelectTextColumnOp(op[DatasetType](o, "dataset", r), str(o, "column_name"))),
    "SelectVectorColumnOp" -> ((o, r) =>
      SelectVectorColumnOp(op[DatasetType](o, "dataset", r), str(o, "column_name"))),
    "SelectCategoricalColumnOp" -> ((o, r) =>
      SelectCategoricalColumnOp(op[DatasetType](o, "dataset", r), str(o, "column_name"))),
    "SelectBooleanColumnOp" -> ((o, r) =>
      SelectBooleanColumnOp(op[DatasetType](o, "dataset", r), str(o, "column_name"))),
    "SelectScoreColumnOp" -> ((o, r) =>
      SelectScoreColumnOp(op[DatasetType](o, "dataset", r), str(o, "column_name"))),
    "SelectTrainTestSplitColumnOp" -> ((o, r) =>
      SelectTrainTestSplitColumnOp(op[DatasetType](o, "dataset", r), str(o, "column_name"))),
    "SelectJSONColumnOp" -> ((o, r) =>
      SelectJSONColumnOp(op[DatasetType](o, "dataset", r), str(o, "column_name"))),
    "SelectConversationColumnOp" -> ((o, r) =>
      SelectConversationColumnOp(op[DatasetType](o, "dataset", r), str(o, "column_name"))),
    "TakeRowsOp" -> ((o, r) =>
      TakeRowsOp(op[DatasetType](o, "dataset", r), lng(o, "skip"), lng(o, "offset"),
        optLng(o, "num_rows"))),
    "MaskRowsOp" -> ((o, r) =>
      MaskRowsOp(op[DatasetType](o, "dataset", r), op[BooleanColumnType](o, "mask", r))),
    "CategoryToBooleanOp" -> ((o, r) =>
      CategoryToBooleanOp(op[ColumnType](o, "input_category", r),
        optStrSeq(o, "true_values"), optStrSeq(o, "false_values"))),
    "BooleanLogicOp" -> ((o, r) =>
      BooleanLogicOp(str(o, "operation"), op[BooleanColumnType](o, "left", r),
        op[BooleanColumnType](o, "right", r))),
    "ParseJSONColumnOp" -> ((o, r) =>
      ParseJSONColumnOp(op[TextColumnType](o, "text", r))),
    "VectorToScalarOp" -> ((o, r) =>
      VectorToScalarOp(op[VectorColumnType](o, "input", r), lng(o, "col_index"))),
    "PairwiseArithmeticOp" -> ((o, r) =>
      PairwiseArithmeticOp(str(o, "operation"), op[ScoreColumnType](o, "left", r),
        op[ScoreColumnType](o, "right", r))),
    "JinjaTemplatizeOp" -> ((o, r) =>
      JinjaTemplatizeOp(str(o, "template"), opMap[ColumnType](o, "context", r),
        anyMap(o, "constants"), optLng(o, "max_length"))),
    "AssignTrainTestSplitOp" -> ((o, r) =>
      AssignTrainTestSplitOp(op[DatasetType](o, "dataset", r),
        optAnyNum(o, "test_size"), optAnyNum(o, "train_size"), lng(o, "random_state"))),
    "AssignRowIDOp" -> ((o, r) =>
      AssignRowIDOp(op[DatasetType](o, "dataset", r))),
    "TrainClassifierOp" -> ((o, r) =>
      TrainClassifierOp(str(o, "model_type"), op[VectorColumnType](o, "x", r),
        op[BooleanColumnType](o, "positives", r),
        op[BooleanColumnType](o, "negatives", r),
        optOp[BooleanColumnType](o, "train_domain", r),
        str(o, "preprocessing"), anyMap(o, "params"))),
    "ClassifierPredictOp" -> ((o, r) =>
      ClassifierPredictOp(op[ClassifierType](o, "model", r),
        op[VectorColumnType](o, "x", r))),
    "ClassifierEvaluationOp" -> ((o, r) =>
      ClassifierEvaluationOp(op[ScoreColumnType](o, "score", r),
        op[BooleanColumnType](o, "gt_positives", r),
        op[BooleanColumnType](o, "gt_negatives", r),
        optOp[ColumnType](o, "split", r),
        optOp[BooleanColumnType](o, "predict_domain", r),
        optDbl(o, "score_threshold"))),
    "TrainMulticlassClassifierOp" -> ((o, r) =>
      TrainMulticlassClassifierOp(str(o, "model_type"),
        op[VectorColumnType](o, "x", r),
        op[CategoricalColumnType](o, "labels", r),
        optOp[BooleanColumnType](o, "train_domain", r),
        str(o, "preprocessing"), anyMap(o, "params"))),
    "MulticlassPredictOp" -> ((o, r) =>
      MulticlassPredictOp(op[ClassifierType](o, "model", r),
        op[VectorColumnType](o, "x", r))),
    "MulticlassEvaluationOp" -> ((o, r) =>
      MulticlassEvaluationOp(op[CategoricalColumnType](o, "predicted", r),
        op[CategoricalColumnType](o, "gt_labels", r),
        optOp[ColumnType](o, "split", r),
        optOp[BooleanColumnType](o, "predict_domain", r))),
    "HashedTfEmbeddingOp" -> ((o, r) =>
      HashedTfEmbeddingOp(op[TextColumnType](o, "text", r),
        lng(o, "dim"), lng(o, "scale_bits"))),
    "LLMLayerActivationsOp" -> ((o, r) =>
      LLMLayerActivationsOp(str(o, "model_name"), op[ColumnType](o, "text", r),
        lng(o, "layer_num"), str(o, "token_mode"), lng(o, "batch_size"),
        optLng(o, "max_length"), optStr(o, "dtype"), str(o, "device"),
        bool(o, "torch_compile"), bool(o, "apply_chat_template"))),
    "LLMLogitScoresOp" -> ((o, r) =>
      LLMLogitScoresOp(str(o, "model_name"), op[TextColumnType](o, "text", r),
        anySeq(o, "logit_token_ids"), lng(o, "batch_size"),
        bool(o, "apply_chat_template"), optStr(o, "dtype"), str(o, "device"),
        optLng(o, "max_length"), bool(o, "torch_compile"),
        optStr(o, "append_to_chat_template"))),
    "LLMGenerateTextOp" -> ((o, r) =>
      LLMGenerateTextOp(str(o, "model_name"), op[TextColumnType](o, "prompt", r),
        lng(o, "max_tokens"))),
    "UMAPVizOp" -> ((o, r) =>
      UMAPVizOp(op[VectorColumnType](o, "input_embedding", r),
        lng(o, "n_neighbors"), lng(o, "n_epochs"), lng(o, "random_state"),
        str(o, "metric"), optAnyMap(o, "metric_kwds"),
        str(o, "output_metric"), optAnyMap(o, "output_metric_kwds"),
        dbl(o, "learning_rate"), dbl(o, "min_dist"), dbl(o, "spread"),
        dbl(o, "set_op_mix_ratio"), dbl(o, "local_connectivity"),
        dbl(o, "repulsion_strength"), lng(o, "negative_sample_rate"),
        dbl(o, "transform_queue_size"), bool(o, "angular_rp_forest"),
        lng(o, "target_n_neighbors"), str(o, "target_metric"),
        optAnyMap(o, "target_metric_kwds"), dbl(o, "target_weight"),
        lng(o, "transform_seed"), str(o, "transform_mode"),
        bool(o, "force_approximation_algorithm"), bool(o, "unique"),
        bool(o, "densmap"), dbl(o, "dens_lambda"), dbl(o, "dens_frac"),
        dbl(o, "dens_var_shift"), bool(o, "output_dens"),
        optDbl(o, "disconnection_distance"))),
    "SpectralVizOp" -> ((o, r) =>
      SpectralVizOp(op[VectorColumnType](o, "input_embedding", r),
        lng(o, "k"), lng(o, "iters"))),
    "UmapLayoutOp" -> ((o, r) =>
      UmapLayoutOp(op[VectorColumnType](o, "input_embedding", r),
        lng(o, "k"), lng(o, "iters"), lng(o, "negatives"), str(o, "init"))),
    "KMeansClusterOp" -> ((o, r) =>
      KMeansClusterOp(op[VectorColumnType](o, "vectors", r),
        lngSeq(o, "centroid_ids"), lng(o, "iters"))),
    "PrototypeDropOp" -> ((o, r) =>
      PrototypeDropOp(op[VectorColumnType](o, "vectors", r),
        lngSeq(o, "centroid_ids"), lng(o, "iters"),
        lng(o, "drop_num"), lng(o, "drop_den"))),
    "CorpusStatsOp" -> ((o, r) =>
      CorpusStatsOp(op[CategoricalColumnType](o, "group", r),
        op[TextColumnType](o, "text", r), lng(o, "k"))),
    "CmsWordCountsOp" -> ((o, r) =>
      CmsWordCountsOp(op[TextColumnType](o, "text", r),
        lng(o, "depth"), lng(o, "width"), lng(o, "top_n"))),
    "BloomMembershipOp" -> ((o, r) =>
      BloomMembershipOp(op[TextColumnType](o, "value", r),
        op[TextColumnType](o, "reference", r),
        lng(o, "num_hashes"), lng(o, "num_bits"))),
    "EpochShardOp" -> ((o, r) =>
      EpochShardOp(op[DatasetType](o, "dataset", r),
        lng(o, "epoch"), lng(o, "num_shards"))),
    "ChunkTextOp" -> ((o, r) =>
      ChunkTextOp(op[TextColumnType](o, "text", r),
        lng(o, "size"), lng(o, "overlap"))),
    "KeepBestPerClusterOp" -> ((o, r) =>
      KeepBestPerClusterOp(op[ScoreColumnType](o, "priority", r),
        op[DatasetType](o, "pairs", r))),
    "TokenBudgetKeepOp" -> ((o, r) =>
      TokenBudgetKeepOp(op[CategoricalColumnType](o, "group", r),
        op[ScoreColumnType](o, "priority", r),
        op[ScoreColumnType](o, "tokens", r), lng(o, "budget"))),
    "GroupedOp" -> ((o, r) => GroupedOp(opSeq(o, "ops", r))),
    "RedactPIIColumnOp" -> ((o, r) =>
      RedactPIIColumnOp(op[TextColumnType](o, "text", r))),
    "DropExactDuplicatesOp" -> ((o, r) =>
      DropExactDuplicatesOp(op[DatasetType](o, "dataset", r),
        op[TextColumnType](o, "text", r))),
    "ContaminationFlagOp" -> ((o, r) =>
      ContaminationFlagOp(op[TextColumnType](o, "text", r),
        op[TextColumnType](o, "benchmark", r), lng(o, "n"),
        lng(o, "min_overlap"))),
    "StratifiedSampleOp" -> ((o, r) =>
      StratifiedSampleOp(op[DatasetType](o, "dataset", r),
        op[CategoricalColumnType](o, "stratum", r), dbl(o, "frac"),
        str(o, "salt"))),
    "MixtureSampleOp" -> ((o, r) =>
      MixtureSampleOp(op[DatasetType](o, "dataset", r),
        op[CategoricalColumnType](o, "stratum", r), dblMap(o, "fracs"),
        dbl(o, "default_frac"), str(o, "salt"))),
    "PackSequencesOp" -> ((o, r) =>
      PackSequencesOp(op[ColumnType](o, "tokens", r), lng(o, "seq_len"))),
    "TokenCountOp" -> ((o, r) =>
      TokenCountOp(op[TextColumnType](o, "text", r))),
    "QualityScoreOp" -> ((o, r) =>
      QualityScoreOp(op[TextColumnType](o, "text", r))),
    "LanguageIdOp" -> ((o, r) =>
      LanguageIdOp(op[TextColumnType](o, "text", r))),
    "FingerprintOp" -> ((o, r) =>
      FingerprintOp(op[TextColumnType](o, "text", r))),
    "GopherKeepOp" -> ((o, r) =>
      GopherKeepOp(op[TextColumnType](o, "text", r),
        lng(o, "min_words"), lng(o, "max_words"), dbl(o, "min_mean_word_len"),
        dbl(o, "max_mean_word_len"), dbl(o, "min_unique_frac"))),
    "LmPerplexityOp" -> ((o, r) =>
      LmPerplexityOp(op[TextColumnType](o, "text", r),
        op[TextColumnType](o, "fit_text", r))),
    "DsirSelectOp" -> ((o, r) =>
      DsirSelectOp(op[TextColumnType](o, "text", r),
        op[TextColumnType](o, "target_text", r),
        lng(o, "m"), lng(o, "k"), dbl(o, "alpha"))),
    "TemperatureSampleOp" -> ((o, r) =>
      TemperatureSampleOp(op[DatasetType](o, "dataset", r),
        op[CategoricalColumnType](o, "stratum", r),
        dbl(o, "alpha"), dbl(o, "frac"), str(o, "salt"))),
    "CcnetBucketsOp" -> ((o, r) =>
      CcnetBucketsOp(op[TextColumnType](o, "text", r),
        op[CategoricalColumnType](o, "lang", r),
        op[TextColumnType](o, "fit_text", r))),
    "DedupSpansOp" -> ((o, r) =>
      DedupSpansOp(op[TextColumnType](o, "text", r), lng(o, "k"))),
    "Bm25RankOp" -> ((o, r) =>
      Bm25RankOp(op[TextColumnType](o, "text", r), strSeq(o, "terms"),
        lng(o, "k"), dbl(o, "k1"), dbl(o, "b"))),
    "Bm25RankManyOp" -> ((o, r) =>
      Bm25RankManyOp(op[TextColumnType](o, "text", r),
        strSeqSeq(o, "queries"), lng(o, "k"), dbl(o, "k1"), dbl(o, "b"))),
    "RrfFuseOp" -> ((o, r) =>
      RrfFuseOp(op[DatasetType](o, "sparse", r),
        op[DatasetType](o, "dense", r),
        str(o, "sparse_id"), str(o, "dense_id"),
        lng(o, "rrf_k"), lng(o, "n"))),
    "MinHashNearDupPairsOp" -> ((o, r) =>
      MinHashNearDupPairsOp(op[TextColumnType](o, "text", r),
        lng(o, "shingle_n"), lng(o, "num_perms"), lng(o, "num_bands"),
        dbl(o, "threshold"))),
    "SimHashNearDupPairsOp" -> ((o, r) =>
      SimHashNearDupPairsOp(op[TextColumnType](o, "text", r),
        lng(o, "max_hamming"), lng(o, "max_bucket"))),
    "CosineNearDupPairsOp" -> ((o, r) =>
      CosineNearDupPairsOp(op[VectorColumnType](o, "vectors", r),
        lng(o, "dim"), lng(o, "n_bands"), lng(o, "planes_per_band"),
        dbl(o, "threshold"), lng(o, "max_bucket"))),
    "SemanticDedupOp" -> ((o, r) =>
      SemanticDedupOp(op[VectorColumnType](o, "vectors", r),
        lngSeq(o, "centroid_ids"), dbl(o, "threshold"), lng(o, "max_cell"),
        lng(o, "split_fanout"), lng(o, "max_split_depth"))),
    "DropNearDuplicatesOp" -> ((o, r) =>
      DropNearDuplicatesOp(op[DatasetType](o, "dataset", r),
        op[DatasetType](o, "pairs", r))),
    "AnnBruteTopKOp" -> ((o, r) =>
      AnnBruteTopKOp(op[VectorColumnType](o, "corpus", r),
        op[VectorColumnType](o, "queries", r), lng(o, "k"))),
    "IvfPqTopKOp" -> ((o, r) =>
      IvfPqTopKOp(op[VectorColumnType](o, "corpus", r),
        op[VectorColumnType](o, "queries", r),
        lngSeq(o, "centroid_ids"), lngSeq(o, "codebook_ids"),
        lng(o, "k"), lng(o, "m"), lng(o, "nprobe"), lng(o, "rerank"))),
    "SelectBinaryColumnOp" -> ((o, r) =>
      SelectBinaryColumnOp(op[DatasetType](o, "dataset", r),
        str(o, "column_name"))),
    "ImageMetaOp" -> ((o, r) =>
      ImageMetaOp(op[BinaryColumnType](o, "image", r))),
    "ImageResizeOp" -> ((o, r) =>
      ImageResizeOp(op[BinaryColumnType](o, "image", r), lng(o, "max_side"))),
    "ImageEmbedOp" -> ((o, r) =>
      ImageEmbedOp(op[BinaryColumnType](o, "image", r), lng(o, "grid"))),
    "AudioMetaOp" -> ((o, r) =>
      AudioMetaOp(op[BinaryColumnType](o, "audio", r))),
    "ExplodeFramesOp" -> ((o, r) =>
      ExplodeFramesOp(op[BinaryColumnType](o, "video", r))),
    "TrainBpeTokenizerOp" -> ((o, r) =>
      TrainBpeTokenizerOp(op[TextColumnType](o, "text", r),
        lng(o, "num_merges"))),
    "BpeTokenizeOp" -> ((o, r) =>
      BpeTokenizeOp(op[TokenizerType](o, "tokenizer", r),
        op[TextColumnType](o, "text", r))),
    "TrainUnigramTokenizerOp" -> ((o, r) =>
      TrainUnigramTokenizerOp(op[TextColumnType](o, "text", r),
        lng(o, "seed_multi"), lng(o, "rounds"), lng(o, "piece_len"))),
    "UnigramTokenizeOp" -> ((o, r) =>
      UnigramTokenizeOp(op[TokenizerType](o, "tokenizer", r),
        op[TextColumnType](o, "text", r)))
  )
}
