package graft.spec

import org.scalatest.funsuite.AnyFunSuite

import graft.spec.Fluent._

/** Fluent API builds the same specs (= same UUIDs) as explicit construction
  * — mirrors the reference's `types.py` constructors. */
class FluentSpec extends AnyFunSuite {

  private val ds: DatasetType = LoadLocalParquetDatasetOp("h", "/tmp/x.parquet")

  test("column selectors") {
    assert(ds.colText("t") == SelectTextColumnOp(ds, "t"))
    assert(ds.colVector("v") == SelectVectorColumnOp(ds, "v"))
    assert(ds.colCategorical("c") == SelectCategoricalColumnOp(ds, "c"))
    assert(ds.colBoolean("b") == SelectBooleanColumnOp(ds, "b"))
    assert(ds.colScore("s") == SelectScoreColumnOp(ds, "s"))
    assert(ds.colJson("j") == SelectJSONColumnOp(ds, "j"))
  }

  test("multimodal builders chain over binary columns") {
    val img = ds.colBinary("img")
    assert(img == SelectBinaryColumnOp(ds, "img"))
    assert(img.imageMeta == ImageMetaOp(img))
    assert(img.resize(64L).imageEmbed() == ImageEmbedOp(ImageResizeOp(img, 64L), 2L))
    assert(ds.colBinary("audio").audioMeta == AudioMetaOp(SelectBinaryColumnOp(ds, "audio")))
  }

  test("membership and split helpers normalize value sets") {
    val c = ds.colCategorical("lang")
    assert(c.isIn("en", "de") == CategoryToBooleanOp(c, Some(Seq("de", "en"))))
    assert(c.notIn("zh") == CategoryToBooleanOp(c, None, Some(Seq("zh"))))
    val sp = ds.assignTrainTestSplit(testSize = Some(0.25))
    assert(sp.isTrain == CategoryToBooleanOp(sp, Some(Seq("train"))))
    assert(sp.isTest.uuid != sp.isTrain.uuid)
  }

  test("boolean and arithmetic operators") {
    val a = ds.colBoolean("a"); val b = ds.colBoolean("b")
    assert((a && b) == BooleanLogicOp("and", a, b))
    assert((a || b) == BooleanLogicOp("or", a, b))
    assert((a ^ b) == BooleanLogicOp("xor", a, b))
    assert((!a) == BooleanLogicOp("not", a, a))
    val x = ds.colScore("x"); val y = ds.colScore("y")
    assert((x + y) == PairwiseArithmeticOp("+", x, y))
    assert((x / y) == PairwiseArithmeticOp("/", x, y))
  }

  test("full probe chain reads like the reference workflow") {
    val emb = ds.colVector("emb")
    val lang = ds.colCategorical("lang")
    val split = ds.assignTrainTestSplit(testSize = Some(0.25))
    val model = emb.trainClassifier(
      positives = lang.isIn("en"),
      negatives = lang.notIn("en"),
      trainDomain = Some(split.isTrain),
      preprocessing = "standardize")
    val eval = model.predict(emb).evaluate(
      gtPositives = lang.isIn("en"),
      gtNegatives = lang.notIn("en"),
      split = Some(split))
    // structurally identical to explicit construction → same uuid
    val explicit = ClassifierEvaluationOp(
      ClassifierPredictOp(
        TrainClassifierOp("logistic_regression", emb,
          CategoryToBooleanOp(lang, Some(Seq("en"))),
          CategoryToBooleanOp(lang, None, Some(Seq("en"))),
          Some(CategoryToBooleanOp(split, Some(Seq("train")))),
          "standardize"), emb),
      CategoryToBooleanOp(lang, Some(Seq("en"))),
      CategoryToBooleanOp(lang, None, Some(Seq("en"))),
      Some(split))
    assert(eval.uuid == explicit.uuid)
    // and the whole graph round-trips
    assert(Graph.deserialize(Graph.serialize(eval)) == Seq(eval))
  }

  test("take/mask/templatize/llm builders") {
    assert(ds.takeRows(skip = 2L, numRows = Some(5L)) ==
      TakeRowsOp(ds, 2L, 0L, Some(5L)))
    val mask = ds.colBoolean("keep")
    assert(ds.maskRows(mask) == MaskRowsOp(ds, mask))
    val t = ds.colText("txt")
    val tpl = t.templatize("Q: {{text}}")
    assert(tpl == JinjaTemplatizeOp("Q: {{text}}", Map("text" -> t)))
    assert(t.llmLayerActivations("fake:d8", -1L) ==
      LLMLayerActivationsOp("fake:d8", t, -1L))
    assert(t.parseJson == ParseJSONColumnOp(t))
    assert(ds.colVector("v").umapViz() == UMAPVizOp(ds.colVector("v")))
    // beyond-reference sugar: signals, dedup, ANN
    assert(t.tokenCount == TokenCountOp(t))
    assert(t.qualityScore == QualityScoreOp(t))
    assert(t.languageId == LanguageIdOp(t))
    assert(t.fingerprint == FingerprintOp(t))
    assert(t.gopherKeep(minWords = 10L) == GopherKeepOp(t, minWords = 10L))
    assert(t.minhashNearDupPairs(threshold = 0.7) ==
      MinHashNearDupPairsOp(t, threshold = 0.7))
    val pairs = t.minhashNearDupPairs()
    assert(ds.dropNearDuplicates(pairs) == DropNearDuplicatesOp(ds, pairs))
    assert(ds.colScore("sc").keepBestPerCluster(pairs) ==
      KeepBestPerClusterOp(ds.colScore("sc"), pairs))
    val v = ds.colVector("v")
    assert(v.annTopK(v, k = 7L) == AnnBruteTopKOp(v, v, 7L))
    assert(v.semanticDedup(Seq(0L, 3L), threshold = 0.9) ==
      SemanticDedupOp(v, Seq(0L, 3L), 0.9))
    assert(v.ivfPqTopK(v, 0L to 1L, 0L to 3L, k = 5L, m = 4L) ==
      IvfPqTopKOp(v, v, 0L to 1L, 0L to 3L, 5L, 4L))
    assert(t.lmPerplexity == LmPerplexityOp(t, t))
    assert(t.dedupSpans(k = 6L) == DedupSpansOp(t, 6L))
    assert(t.bm25(Seq("x", "y"), k = 3L) == Bm25RankOp(t, Seq("x", "y"), 3L))
    assert(t.bm25Many(Seq(Seq("x", "y"), Seq("z")), k = 3L) ==
      Bm25RankManyOp(t, Seq(Seq("x", "y"), Seq("z")), 3L))
    assert(v.prototypeDrop(Seq(0L, 3L), dropNum = 1L, dropDen = 5L) ==
      PrototypeDropOp(v, Seq(0L, 3L), 4L, 1L, 5L))
    assert(t.bm25(Seq("x")).rrfFuse(v.annTopK(v), n = 7L) ==
      RrfFuseOp(Bm25RankOp(t, Seq("x")), AnnBruteTopKOp(v, v),
        "id", "corpus_id", 60L, 7L))
    val ref = TakeRowsOp(ds, 2L).colText("t")
    assert(t.lmPerplexity(fitOn = ref) == LmPerplexityOp(t, ref))
    assert(t.dsirSelect(ref, k = 50L) == DsirSelectOp(t, ref, k = 50L))
    val lang = ds.colCategorical("lang")
    assert(t.ccnetBuckets(lang, fitOn = ref) == CcnetBucketsOp(t, lang, ref))
    assert(t.hashedTfEmbedding(dim = 32L, scaleBits = 10L) ==
      HashedTfEmbeddingOp(t, 32L, 10L))
    val htf = t.hashedTfEmbedding()
    val mc = htf.trainMulticlass(lang, modelType = "nearest_centroid")
    assert(mc == TrainMulticlassClassifierOp("nearest_centroid", htf, lang))
    assert(mc.predictMulticlass(htf) == MulticlassPredictOp(mc, htf))
    assert(mc.predictMulticlass(htf).evaluateMulticlass(lang) ==
      MulticlassEvaluationOp(MulticlassPredictOp(mc, htf), lang))
    val pr = ds.colScore("nc")
    assert(lang.tokenBudgetKeep(pr, t.tokenCount, 5000L) ==
      TokenBudgetKeepOp(lang, pr, TokenCountOp(t), 5000L))
    assert(lang.corpusStats(t, k = 32L) == CorpusStatsOp(lang, t, 32L))
    assert(t.cmsWordCounts(depth = 3L, width = 64L, topN = 10L) ==
      CmsWordCountsOp(t, 3L, 64L, 10L))
    assert(t.bloomMember(ref, numHashes = 4L, numBits = 128L) ==
      BloomMembershipOp(t, ref, 4L, 128L))
    assert(t.chunkText(size = 64L, overlap = 16L) ==
      ChunkTextOp(t, 64L, 16L))
  }
}
