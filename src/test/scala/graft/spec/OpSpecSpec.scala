package graft.spec

import org.scalatest.funsuite.AnyFunSuite

/** Spec-layer semantics: content-addressed identity, Merkle recursion,
  * ExcludeFromUUID, subs, graph serde error modes. Mirrors the *concept* of
  * the reference's golden-UUID suite (`tests/test_graph.py:32-54`): the
  * golden hashes below freeze OUR canonical JSON — any accidental drift in
  * serialization breaks these tests by design.
  */
class OpSpecSpec extends AnyFunSuite {

  private def ds = LoadLocalParquetDatasetOp(
    contentHash = "abc123", filePath = "/data/foo.parquet")
  private def textCol = SelectTextColumnOp(ds, "text")
  private def catCol = SelectCategoricalColumnOp(ds, "label")

  // ---------------- uuid basics ----------------

  test("uuid is deterministic and class-prefixed") {
    assert(ds.uuid == LoadLocalParquetDatasetOp("abc123", "/data/foo.parquet").uuid)
    assert(ds.uuid.startsWith("LoadLocalParquetDatasetOp_"))
    assert(ds.uuidHash.matches("[0-9a-f]{64}"))
  }

  test("identical structure => identical uuid; different params => different uuid") {
    assert(textCol.uuid == SelectTextColumnOp(ds, "text").uuid)
    assert(textCol.uuid != SelectTextColumnOp(ds, "other").uuid)
  }

  test("uuid is Merkle-recursive through children") {
    val ds2 = LoadLocalParquetDatasetOp("DIFFERENT", "/data/foo.parquet")
    assert(SelectTextColumnOp(ds2, "text").uuid != textCol.uuid)
  }

  test("ExcludeFromUUID: same content at a different path is the same op") {
    val moved = LoadLocalParquetDatasetOp("abc123", "/elsewhere/bar.parquet")
    assert(moved.uuid == ds.uuid)
    // ...but the path IS serialized in graph form
    assert(moved.toJson("file_path") == JString("/elsewhere/bar.parquet"))
  }

  test("golden uuids (canonical-JSON freeze)") {
    // If these change, the canonical serialization changed — that breaks
    // every existing store. Regenerate ONLY on an intentional format bump.
    assert(ds.canonicalJsonForUuid ==
      """{"content_hash":"abc123","type":"LoadLocalParquetDatasetOp"}""")
    assert(ds.uuid ==
      "LoadLocalParquetDatasetOp_" + OpSpec.sha256(
        """{"content_hash":"abc123","type":"LoadLocalParquetDatasetOp"}"""))
    val tc = textCol
    assert(tc.canonicalJsonForUuid ==
      s"""{"column_name":"text","dataset":"${ds.uuid}","type":"SelectTextColumnOp"}""")
    // a frozen literal golden — recomputed hashes must never drift
    assert(ds.uuid ==
      "LoadLocalParquetDatasetOp_e290d9eebee8b501ce6c0b6c4dea9832e3a2b778cf8f3cf9e4f66aa71fc2fe23")
  }

  test("ephemeral marker matches reference inventory") {
    assert(textCol.isEphemeral)
    assert(TakeRowsOp(ds).isEphemeral)
    assert(MaskRowsOp(ds, CategoryToBooleanOp(catCol, Some(Seq("a")))).isEphemeral)
    // loads are ephemeral in THIS engine (content-addressed file/spec IS the
    // result — persisting would copy the input; see Ops.scala scaladoc)
    assert(ds.isEphemeral)
    assert(!AssignTrainTestSplitOp(ds).isEphemeral)
    assert(!JinjaTemplatizeOp("{{x}}", Map("x" -> textCol)).isEphemeral)
  }

  // ---------------- field/dependency introspection ----------------

  test("children and parameters split correctly") {
    val take = TakeRowsOp(ds, skip = 2L, offset = 1L, numRows = Some(10L))
    assert(take.children == Seq(ds))
    assert(take.parameters == scala.collection.immutable.ListMap(
      "skip" -> 2L, "offset" -> 1L, "num_rows" -> Some(10L)))
  }

  test("children found inside Option, Map and Seq fields") {
    val mask = CategoryToBooleanOp(catCol, Some(Seq("x")))
    val train = TrainClassifierOp("logistic_regression",
      SelectVectorColumnOp(ds, "emb"), mask, mask, trainDomain = Some(mask))
    assert(train.children.count(_ == mask) == 3)

    val tmpl = JinjaTemplatizeOp("{{a}}{{b}}",
      Map("a" -> textCol, "b" -> catCol))
    assert(tmpl.children.toSet == Set[OpSpec](textCol, catCol))

    val grouped = GroupedOp(Seq(ds, textCol))
    assert(grouped.children == Seq(ds, textCol))
  }

  test("allDependencies is transitive and deduplicated") {
    val boolCol = CategoryToBooleanOp(catCol, Some(Seq("keep")))
    val masked = MaskRowsOp(ds, boolCol)
    val deps = masked.allDependencies
    assert(deps.contains(ds))
    assert(deps.contains(boolCol))
    assert(deps.contains(catCol))
    assert(deps.map(_.uuid).distinct.length == deps.length)
  }

  // ---------------- subs ----------------

  test("subsFields: change a parameter on one node") {
    val take = TakeRowsOp(ds, skip = 1L)
    val changed = take.subsFields("skip" -> 7L).asInstanceOf[TakeRowsOp]
    assert(changed.skip == 7L)
    assert(changed.dataset == ds)
    assert(changed.uuid != take.uuid)
  }

  test("subsFields rejects unknown fields") {
    val e = intercept[IllegalArgumentException](ds.subsFields("nope" -> 1))
    assert(e.getMessage.contains("Invalid field name"))
  }

  test("subs: replace a node deep in the graph, preserving sharing") {
    val mask = CategoryToBooleanOp(catCol, Some(Seq("keep")))
    val masked = MaskRowsOp(ds, mask)
    val take = TakeRowsOp(masked, numRows = Some(5L))

    val newDs = LoadLocalParquetDatasetOp("other-hash", "/data/other.parquet")
    val swapped = take.subs(ds, newDs).asInstanceOf[TakeRowsOp]
    val newMasked = swapped.dataset.asInstanceOf[MaskRowsOp]
    assert(newMasked.dataset == newDs)
    // the mask's upstream dataset was also rewritten (same original node)
    val newMask = newMasked.mask.asInstanceOf[CategoryToBooleanOp]
    assert(newMask.inputCategory.asInstanceOf[SelectCategoricalColumnOp].dataset == newDs)
    // graph-wide: old uuid gone
    assert(!swapped.allDependencies.exists(_.uuid == ds.uuid))
  }

  test("subs(target, field changes): reference train→test substitution shape") {
    // the signature feature: rebuild a whole pipeline with one upstream
    // field changed (reference docstring example, op_spec.py:430-470)
    val acts = LLMLayerActivationsOp("fake:d8", textCol, layerNum = 5L)
    val viz = UMAPVizOp(acts)
    val swapped = viz.subs(acts, "model_name" -> "fake:d16", "layer_num" -> 6L)
      .asInstanceOf[UMAPVizOp]
    val newActs = swapped.inputEmbedding.asInstanceOf[LLMLayerActivationsOp]
    assert(newActs.modelName == "fake:d16")
    assert(newActs.layerNum == 6L)
    assert(newActs.text == textCol) // rest of the graph untouched
    assert(swapped.uuid != viz.uuid)
    // and changing the dataset deep under everything
    val ds2 = viz.subs(ds, "content_hash" -> "other").asInstanceOf[UMAPVizOp]
    assert(ds2.allDependencies.collect {
      case l: LoadLocalParquetDatasetOp => l.contentHash
    } == Seq("other"))
  }

  test("subs on an unrelated target is a no-op preserving uuid") {
    val unrelated = LoadLocalParquetDatasetOp("zzz", "/tmp/z.parquet")
    val take = TakeRowsOp(ds)
    assert(take.subs(unrelated, ds).uuid == take.uuid)
  }

  test("subsAll applies a target even when its own descendant is also a target") {
    // regression: a bottom-up rewrite changes a node's uuid before the rule
    // sees it, silently skipping the outer substitution
    val take = TakeRowsOp(ds, numRows = Some(1L))
    val root = MaskRowsOp(take, CategoryToBooleanOp(catCol, Some(Seq("k"))))
    val ds2 = LoadLocalParquetDatasetOp("zz", "/tmp/zz.parquet")
    val take2 = TakeRowsOp(ds2, numRows = Some(99L))
    val out = root.subsAll(Seq(ds -> ds2, take -> take2)).asInstanceOf[MaskRowsOp]
    assert(out.dataset == take2) // outer target applied, not skipped
    // untargeted sibling subtree still had ds rewritten
    assert(out.mask.asInstanceOf[CategoryToBooleanOp]
      .inputCategory.asInstanceOf[SelectCategoricalColumnOp].dataset == ds2)
  }

  test("multi-root substitution keeps shared sub-DAGs identical") {
    val mask = CategoryToBooleanOp(catCol, Some(Seq("keep")))
    val masked = MaskRowsOp(ds, mask)
    val a = TakeRowsOp(masked, numRows = Some(1L))
    val b = AssignRowIDOp(masked)
    val newDs = LoadLocalParquetDatasetOp("other", "/data/o.parquet")
    val Seq(a2, b2) = Graph.substitute(Seq(a, b), Seq(ds -> newDs))
    val am = a2.asInstanceOf[TakeRowsOp].dataset
    val bm = b2.asInstanceOf[AssignRowIDOp].dataset
    assert(am.uuid == bm.uuid)
    assert(am.asInstanceOf[AnyRef] eq bm.asInstanceOf[AnyRef]) // shared memo ⇒ same instance
    assert(!a2.allDependencies.exists(_.uuid == ds.uuid))
    assert(a2.allDependencies.exists(_.uuid == newDs.uuid))
  }

  // ---------------- canonical JSON details ----------------

  test("canonical JSON: sorted keys, compact, typed numbers") {
    val split = AssignTrainTestSplitOp(ds, testSize = Some(0.25), randomState = 7L)
    val js = split.canonicalJsonForUuid
    assert(js.contains("\"test_size\":0.25"))
    assert(js.contains("\"train_size\":null"))
    assert(js.contains("\"random_state\":7"))
    // int-count flavor hashes differently from float-proportion flavor
    val intSplit = AssignTrainTestSplitOp(ds, testSize = Some(25L), randomState = 7L)
    assert(intSplit.uuid != split.uuid)
    // sorted keys
    val keys = "\"([a-z_]+)\":".r.findAllMatchIn(js).map(_.group(1)).toSeq
    assert(keys == keys.sorted)
  }

  test("CategoryToBooleanOp.build normalizes value sets for stable hashing") {
    val a = CategoryToBooleanOp.build(catCol, Some(Seq("b", "a", "b")), None)
    val b = CategoryToBooleanOp.build(catCol, Some(Seq("a", "b")), None)
    assert(a.uuid == b.uuid)
  }

  test("JinjaTemplatizeOp rejects context/constant key collisions") {
    val e = intercept[IllegalArgumentException](
      JinjaTemplatizeOp("{{x}}", Map("x" -> textCol), Map("x" -> "const")))
    assert(e.getMessage.contains("collision"))
  }

  test("LLM ops exclude engine knobs from uuid but keep semantics fields") {
    val a = LLMLayerActivationsOp("fake:test", textCol, layerNum = -1L,
      batchSize = 8L, device = "cpu")
    val b = LLMLayerActivationsOp("fake:test", textCol, layerNum = -1L,
      batchSize = 64L, device = "auto")
    assert(a.uuid == b.uuid)
    val c = LLMLayerActivationsOp("fake:test", textCol, layerNum = -2L,
      batchSize = 8L, device = "cpu")
    assert(c.uuid != a.uuid)
  }

  // ---------------- graph serde ----------------

  test("graph round-trips through serialize/deserialize") {
    val mask = CategoryToBooleanOp(catCol, Some(Seq("keep")))
    val take = TakeRowsOp(MaskRowsOp(ds, mask), numRows = Some(5L))
    val json = Graph.serializeToString(take)
    val Seq(back) = Graph.deserializeString(json)
    assert(back == take)
    assert(back.uuid == take.uuid)
  }

  test("round-trip preserves excluded-from-uuid fields") {
    val Seq(back) = Graph.deserialize(Graph.serialize(ds))
    assert(back.asInstanceOf[LoadLocalParquetDatasetOp].filePath == ds.filePath)
  }

  test("round-trip of every op family") {
    val vec = SelectVectorColumnOp(ds, "emb")
    val pos = CategoryToBooleanOp(catCol, Some(Seq("p")))
    val neg = CategoryToBooleanOp(catCol, None, Some(Seq("p")))
    val split = AssignTrainTestSplitOp(ds, Some(0.25))
    val domain = CategoryToBooleanOp(split, Some(Seq("train")))
    val model = TrainClassifierOp("logistic_regression", vec, pos, neg,
      Some(domain), "standardize", Map("max_iter" -> 50L, "reg" -> 0.1))
    val score = ClassifierPredictOp(model, vec)
    val eval = ClassifierEvaluationOp(score, pos, neg, Some(split), None, Some(0.5))
    val acts = LLMLayerActivationsOp("fake:d16", textCol, -1L)
    val logits = LLMLogitScoresOp("fake:d16", textCol, Seq("yes", "no", 42L))
    val gen = LLMGenerateTextOp("fake:d16", textCol)
    val umap = UMAPVizOp(acts)
    val inline = LoadInlineJsonDatasetOp(Map(
      "x" -> Seq(1L, 2L, 3L), "y" -> Seq("a", "b", "c")))
    val arith = PairwiseArithmeticOp("+",
      VectorToScalarOp(vec, 0L), VectorToScalarOp(vec, 1L))
    val tmpl = JinjaTemplatizeOp("{{t}} {{k}}", Map("t" -> textCol),
      Map("k" -> 9L), Some(80L))
    val parsed = ParseJSONColumnOp(textCol)
    val logic = BooleanLogicOp("and", pos, neg)
    val rid = AssignRowIDOp(ds)
    val sem = SemanticDedupOp(vec, Seq(0L, 1L, 7L), threshold = 0.8,
      maxCell = 500L)
    val pq = IvfPqTopKOp(vec, vec, 0L to 3L, 0L to 7L, k = 5L, m = 4L,
      nprobe = 2L, rerank = 20L)
    val htf = HashedTfEmbeddingOp(textCol, dim = 32L, scaleBits = 10L)
    val mcModel = TrainMulticlassClassifierOp("nearest_centroid", htf, catCol,
      Some(domain), "none", Map("max_abs" -> 1.0))
    val mcEval = MulticlassEvaluationOp(MulticlassPredictOp(mcModel, htf),
      catCol, Some(split), Some(domain))
    val proto = PrototypeDropOp(vec, Seq(0L, 3L), iters = 2L,
      dropNum = 1L, dropDen = 5L)
    val rrf = RrfFuseOp(Bm25RankOp(textCol, Seq("x", "y"), 20L),
      AnnBruteTopKOp(htf, htf, 20L), "id", "corpus_id", 60L, 10L)
    val many = Bm25RankManyOp(textCol, Seq(Seq("x", "y"), Seq("z")), 5L)
    val ulay = UmapLayoutOp(vec, k = 3L, iters = 5L, negatives = 2L,
      init = "random")
    val group = GroupedOp(Seq(eval, umap, gen, inline, arith, tmpl, parsed,
      logic, rid, sem, pq, mcEval, proto, rrf, many, ulay,
      SelectBooleanColumnOp(ds, "b"),
      SelectScoreColumnOp(ds, "s"), SelectJSONColumnOp(ds, "j"),
      SelectConversationColumnOp(ds, "c"),
      SelectTrainTestSplitColumnOp(ds, "sp"), logits))
    val Seq(back) = Graph.deserialize(Graph.serialize(group))
    assert(back == group)
    assert(back.uuid == group.uuid)
  }

  test("deserialize rejects missing nodes") {
    val json = Graph.serialize(textCol) match {
      case JObj(fields) => JObj(fields.map {
        case ("nodes", JObj(nodes)) => ("nodes", JObj(nodes.filter(_._1 != ds.uuid)))
        case kv => kv
      })
    }
    val e = intercept[IllegalArgumentException](Graph.deserialize(json))
    assert(e.getMessage.contains("not found"))
  }

  test("deserialize rejects unreachable nodes") {
    val stray = LoadLocalParquetDatasetOp("stray", "/tmp/stray.parquet")
    val json = Graph.serialize(textCol) match {
      case JObj(fields) => JObj(fields.map {
        case ("nodes", JObj(nodes)) =>
          ("nodes", JObj(nodes + (stray.uuid -> stray.toJson)))
        case kv => kv
      })
    }
    val e = intercept[IllegalArgumentException](Graph.deserialize(json))
    assert(e.getMessage.contains("Unreachable"))
  }

  test("deserialize re-verifies uuids and fails on drift") {
    val json = Graph.serialize(ds) match {
      case JObj(fields) => JObj(fields.map {
        case ("nodes", JObj(nodes)) => ("nodes", JObj(nodes.map {
          case (u, o: JObj) if u == ds.uuid =>
            (u, JObj(o.fields.map {
              case ("content_hash", _) => ("content_hash", JString("TAMPERED"))
              case kv => kv
            }))
          case kv => kv
        }))
        case kv => kv
      })
    }
    intercept[UUIDMismatchException](Graph.deserialize(json))
  }

  test("deserialize detects cycles") {
    // hand-craft: node A (MaskRowsOp) whose mask points back at A
    val selfUuid = "MaskRowsOp_0000000000000000000000000000000000000000000000000000000000000000"
    val json = JObj(
      "outputs" -> JArr(Vector(JString(selfUuid))),
      "nodes" -> JObj(selfUuid -> JObj(
        "type" -> JString("MaskRowsOp"),
        "dataset" -> JString(selfUuid),
        "mask" -> JString(selfUuid))))
    val e = intercept[IllegalArgumentException](Graph.deserialize(json))
    assert(e.getMessage.contains("Cycle"))
  }

  test("multi-output serialization shares nodes") {
    val a = TakeRowsOp(ds, numRows = Some(1L))
    val b = TakeRowsOp(ds, numRows = Some(2L))
    val g = Graph.serialize(a, b)
    val nNodes = g("nodes").asInstanceOf[JObj].fields.size
    assert(nNodes == 3) // ds shared between a and b
    val outs = Graph.deserialize(g)
    assert(outs == Seq(a, b))
  }

  // ---------------- pseudocode / diff ----------------

  test("toCode renders a topological pseudocode listing") {
    val take = TakeRowsOp(MaskRowsOp(ds, CategoryToBooleanOp(catCol, Some(Seq("k")))),
      numRows = Some(5L))
    val code = take.toCode()
    assert(code.startsWith(s"# Graph for ${take.uuid}"))
    // dataset statement appears before its consumers
    assert(code.indexOf("loadlocalparquetdatasetop_") <
      code.indexOf("maskrowsop_"))
    assert(code.contains("num_rows=5"))
  }

  test("diff highlights changed nodes only") {
    val a = TakeRowsOp(ds, numRows = Some(5L))
    val b = TakeRowsOp(ds, numRows = Some(9L))
    val d = a.diff(b)
    assert(d.linesIterator.exists(l => l.startsWith("- ") && l.contains("num_rows=5")))
    assert(d.linesIterator.exists(l => l.startsWith("+ ") && l.contains("num_rows=9")))
    assert(d.linesIterator.exists(l => l.startsWith("  ") && l.contains("content_hash")))
  }

  // ---------------- JSON module ----------------

  test("Json canonical rendering and parsing round-trip") {
    val v = JObj(
      "b" -> JArr(Vector(JLong(1), JDouble(2.5), JNull, JBool(true))),
      "a" -> JString("x\"y\n"))
    val rendered = Json.render(v)
    assert(rendered.startsWith("{\"a\":")) // sorted keys
    assert(Json.render(Json.parse(rendered)) == rendered)
    assert(Json.parse("""{"x": 1e3}""") == JObj("x" -> JDouble(1000.0)))
    intercept[IllegalArgumentException](Json.parse("{\"a\":}"))
    intercept[IllegalArgumentException](Json.parse("[1,2"))
    intercept[IllegalArgumentException](Json.parse("[1] trailing"))
  }
}
