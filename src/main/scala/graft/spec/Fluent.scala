package graft.spec

/** The typed fluent graph-building API — the Scala rendering of the
  * reference's `types.py` surface (col_text/col_vector/... constructors
  * `types.py:25-104`, mask/take `types.py:173-226`, is_in/not_in
  * `types.py:563-586`, split helpers `types.py:649-709`, boolean dunders
  * `types.py:785-807`, arithmetic `types.py:752-775`, classifier chain
  * `types.py:259-376`, LLM ops `types.py:416-542`).
  *
  * Graph construction only — nothing executes until a runner materializes.
  * Scala operators replace the Python dunders: `&& || ^ unary_!` on boolean
  * columns, `+ - * /` on score columns.
  *
  * {{{
  * import graft.spec.Fluent._
  * val probe = ds.colVector("emb").trainClassifier(
  *   positives = ds.colCategorical("lang").isIn("en"),
  *   negatives = ds.colCategorical("lang").notIn("en"),
  *   trainDomain = Some(ds.assignTrainTestSplit(testSize = Some(0.25)).isTrain))
  * }}}
  */
object Fluent {

  implicit class DatasetBuilders(private val ds: DatasetType) extends AnyVal {
    def colText(name: String): SelectTextColumnOp = SelectTextColumnOp(ds, name)
    def colVector(name: String): SelectVectorColumnOp = SelectVectorColumnOp(ds, name)
    def colCategorical(name: String): SelectCategoricalColumnOp =
      SelectCategoricalColumnOp(ds, name)
    def colBoolean(name: String): SelectBooleanColumnOp = SelectBooleanColumnOp(ds, name)
    def colScore(name: String): SelectScoreColumnOp = SelectScoreColumnOp(ds, name)
    def colTrainTestSplit(name: String): SelectTrainTestSplitColumnOp =
      SelectTrainTestSplitColumnOp(ds, name)
    def colJson(name: String): SelectJSONColumnOp = SelectJSONColumnOp(ds, name)
    def colConversation(name: String): SelectConversationColumnOp =
      SelectConversationColumnOp(ds, name)
    /** beyond reference: opaque media payloads (multimodal entry point) */
    def colBinary(name: String): SelectBinaryColumnOp = SelectBinaryColumnOp(ds, name)

    def takeRows(skip: Long = 1L, offset: Long = 0L,
                 numRows: Option[Long] = None): TakeRowsOp =
      TakeRowsOp(ds, skip, offset, numRows)
    def maskRows(mask: BooleanColumnType): MaskRowsOp = MaskRowsOp(ds, mask)
    def assignRowId: AssignRowIDOp = AssignRowIDOp(ds)
    def assignTrainTestSplit(testSize: Option[Any] = None,
                             trainSize: Option[Any] = None,
                             randomState: Long = 19190115L): AssignTrainTestSplitOp =
      AssignTrainTestSplitOp(ds, testSize, trainSize, randomState)
    /** beyond reference: keep one representative per near-dup cluster */
    def dropNearDuplicates(pairs: DatasetType): DropNearDuplicatesOp =
      DropNearDuplicatesOp(ds, pairs)
    /** beyond reference: RRF-fuse this ranked list (sparse side) with a
      * dense one into one hybrid top-n */
    def rrfFuse(dense: DatasetType, sparseId: String = "id",
                denseId: String = "corpus_id", rrfK: Long = 60L,
                n: Long = 10L): RrfFuseOp =
      RrfFuseOp(ds, dense, sparseId, denseId, rrfK, n)
  }

  implicit class CategoricalBuilders(private val c: ColumnType) extends AnyVal {
    /** `is_in` (reference `types.py:563-575`): membership → boolean. */
    def isIn(values: String*): CategoryToBooleanOp =
      CategoryToBooleanOp.build(c, Some(values), None)
    /** `is_in` with an explicit false-universe (validated at materialize). */
    def isIn(trueValues: Seq[String], falseValues: Seq[String]): CategoryToBooleanOp =
      CategoryToBooleanOp.build(c, Some(trueValues), Some(falseValues))
    /** `not_in` (reference `types.py:577-586`). */
    def notIn(values: String*): CategoryToBooleanOp =
      CategoryToBooleanOp.build(c, None, Some(values))
  }

  implicit class CategoricalColumnBuilders(private val c: CategoricalColumnType)
      extends AnyVal {
    /** beyond reference: per-group token-budget keep verdicts (this column
      * is the group key) */
    def tokenBudgetKeep(priority: ScoreColumnType, tokens: ScoreColumnType,
                        budget: Long): TokenBudgetKeepOp =
      TokenBudgetKeepOp(c, priority, tokens, budget)
    /** beyond reference: per-group data card — totals + KMV distinct
      * estimate (this column is the group key) */
    def corpusStats(text: TextColumnType, k: Long = 64L): CorpusStatsOp =
      CorpusStatsOp(c, text, k)
  }

  implicit class SplitBuilders(private val s: TrainTestSplitColumnType) extends AnyVal {
    /** reference `types.py:690-709` */
    def isTrain: CategoryToBooleanOp = CategoryToBooleanOp.build(s, Some(Seq("train")), None)
    def isTest: CategoryToBooleanOp = CategoryToBooleanOp.build(s, Some(Seq("test")), None)
  }

  implicit class BooleanOps(private val b: BooleanColumnType) extends AnyVal {
    def &&(other: BooleanColumnType): BooleanLogicOp = BooleanLogicOp("and", b, other)
    def ||(other: BooleanColumnType): BooleanLogicOp = BooleanLogicOp("or", b, other)
    def ^(other: BooleanColumnType): BooleanLogicOp = BooleanLogicOp("xor", b, other)
    def unary_! : BooleanLogicOp = BooleanLogicOp("not", b, b)
  }

  implicit class ScoreOps(private val s: ScoreColumnType) extends AnyVal {
    def +(other: ScoreColumnType): PairwiseArithmeticOp = PairwiseArithmeticOp("+", s, other)
    def -(other: ScoreColumnType): PairwiseArithmeticOp = PairwiseArithmeticOp("-", s, other)
    def *(other: ScoreColumnType): PairwiseArithmeticOp = PairwiseArithmeticOp("*", s, other)
    def /(other: ScoreColumnType): PairwiseArithmeticOp = PairwiseArithmeticOp("/", s, other)
    /** beyond reference: keep the max-priority member of each near-dup
      * cluster (this column is the priority) */
    def keepBestPerCluster(pairs: DatasetType): KeepBestPerClusterOp =
      KeepBestPerClusterOp(s, pairs)
  }

  implicit class TokenizerBuilders(private val t: TextColumnType) extends AnyVal {
    /** train a content-addressed BPE tokenizer on this column's corpus */
    def trainBpeTokenizer(numMerges: Long = 64L): TrainBpeTokenizerOp =
      TrainBpeTokenizerOp(t, numMerges)
    /** tokenize with a learned tokenizer artifact */
    def bpeTokenize(tokenizer: TokenizerType): BpeTokenizeOp =
      BpeTokenizeOp(tokenizer, t)
    /** train a content-addressed unigram-LM (SentencePiece-family)
      * tokenizer on this column's corpus */
    def trainUnigramTokenizer(seedMulti: Long = 40L, rounds: Long = 2L,
                              pieceLen: Long = 4L): TrainUnigramTokenizerOp =
      TrainUnigramTokenizerOp(t, seedMulti, rounds, pieceLen)
    /** tokenize with a learned unigram artifact */
    def unigramTokenize(tokenizer: TokenizerType): UnigramTokenizeOp =
      UnigramTokenizeOp(tokenizer, t)
    /** beyond reference: Count-Min word-frequency card of this corpus */
    def cmsWordCounts(depth: Long = 4L, width: Long = 128L,
                      topN: Long = 20L): CmsWordCountsOp =
      CmsWordCountsOp(t, depth, width, topN)
    /** beyond reference: Bloom membership of this column's values in
      * `reference`'s value set (no false negatives, tunable FP rate) */
    def bloomMember(reference: TextColumnType, numHashes: Long = 3L,
                    numBits: Long = 16384L): BloomMembershipOp =
      BloomMembershipOp(t, reference, numHashes, numBits)
    /** beyond reference: overlapping word-window RAG chunks */
    def chunkText(size: Long = 256L, overlap: Long = 32L): ChunkTextOp =
      ChunkTextOp(t, size, overlap)
  }

  implicit class BinaryBuilders(private val b: BinaryColumnType) extends AnyVal {
    /** real `javax.imageio` decode → (row_idx, width, height, format) */
    def imageMeta: ImageMetaOp = ImageMetaOp(b)
    /** true bilinear fit-within resample → binary column (chainable) */
    def resize(maxSide: Long): ImageResizeOp = ImageResizeOp(b, maxSide)
    /** grid×grid pixel-sample embedding → VECTOR column */
    def imageEmbed(grid: Long = 2L): ImageEmbedOp = ImageEmbedOp(b, grid)
    /** RIFF/WAVE parse → (row_idx, rate, channels, samples, duration, rms, peak) */
    def audioMeta: AudioMetaOp = AudioMetaOp(b)
    /** frame-stream column → one row per frame (fresh positional identity) */
    def explodeFrames: ExplodeFramesOp = ExplodeFramesOp(b)
  }

  implicit class VectorBuilders(private val v: VectorColumnType) extends AnyVal {
    def toScalar(colIndex: Long = 0L): VectorToScalarOp = VectorToScalarOp(v, colIndex)
    /** reference `types.py:259-305` */
    def trainClassifier(positives: BooleanColumnType,
                        negatives: BooleanColumnType,
                        trainDomain: Option[BooleanColumnType] = None,
                        modelType: String = "logistic_regression",
                        preprocessing: String = "none",
                        params: Map[String, Any] = Map.empty): TrainClassifierOp =
      TrainClassifierOp(modelType, v, positives, negatives, trainDomain,
        preprocessing, params)
    /** beyond reference (its probes are binary-only): multiclass probe
      * over a categorical label column */
    def trainMulticlass(labels: CategoricalColumnType,
                        trainDomain: Option[BooleanColumnType] = None,
                        modelType: String = "softmax",
                        preprocessing: String = "none",
                        params: Map[String, Any] = Map.empty)
    : TrainMulticlassClassifierOp =
      TrainMulticlassClassifierOp(modelType, v, labels, trainDomain,
        preprocessing, params)
    /** reference `types.py:307-334` */
    def umapViz(nNeighbors: Long = 15L, nEpochs: Long = 200L,
                randomState: Long = 42L): UMAPVizOp =
      UMAPVizOp(v, nNeighbors, nEpochs, randomState)
    /** beyond reference: Laplacian-eigenmaps spectral 2-D layout */
    def spectralViz(k: Long = 8L, iters: Long = 8L): SpectralVizOp =
      SpectralVizOp(v, k, iters)
    /** beyond reference: REAL UMAP force layout (quantized-exact) */
    def umapLayout(k: Long = 8L, iters: Long = 30L, negatives: Long = 4L,
                   init: String = "spectral"): UmapLayoutOp =
      UmapLayoutOp(v, k, iters, negatives, init)
    /** beyond reference: exact k-means cluster id, centroids = row
      * indices */
    def kmeansCluster(centroidIds: Seq[Long], iters: Long = 4L): KMeansClusterOp =
      KMeansClusterOp(v, centroidIds, iters)
    /** beyond reference: D4 prototype-drop keep verdicts (drop the
      * dropNum/dropDen closest-to-centroid fraction per k-means cell) */
    def prototypeDrop(centroidIds: Seq[Long], iters: Long = 4L,
                      dropNum: Long = 1L, dropDen: Long = 4L): PrototypeDropOp =
      PrototypeDropOp(v, centroidIds, iters, dropNum, dropDen)
    /** beyond reference: brute-force cosine top-k against this corpus */
    def annTopK(queries: VectorColumnType, k: Long = 10L): AnnBruteTopKOp =
      AnnBruteTopKOp(v, queries, k)
    /** beyond reference: SemDeDup semantic dedup verdicts, centroids =
      * row indices */
    def semanticDedup(centroidIds: Seq[Long], threshold: Double = 0.95,
                      maxCell: Long = 10000L): SemanticDedupOp =
      SemanticDedupOp(v, centroidIds, threshold, maxCell)
    /** beyond reference: IVF-PQ approximate top-k against this corpus,
      * centroids/codewords = row indices */
    def ivfPqTopK(queries: VectorColumnType, centroidIds: Seq[Long],
                  codebookIds: Seq[Long], k: Long = 10L, m: Long = 8L,
                  nprobe: Long = 2L, rerank: Long = 0L): IvfPqTopKOp =
      IvfPqTopKOp(v, queries, centroidIds, codebookIds, k, m, nprobe, rerank)
  }

  implicit class TextBuilders(private val t: TextColumnType) extends AnyVal {
    def parseJson: ParseJSONColumnOp = ParseJSONColumnOp(t)
    /** reference `types.py:134-172` */
    def templatize(template: String,
                   context: Map[String, ColumnType] = Map.empty,
                   constants: Map[String, Any] = Map.empty,
                   maxLength: Option[Long] = None,
                   selfKey: String = "text"): JinjaTemplatizeOp =
      JinjaTemplatizeOp(template, context + (selfKey -> t), constants, maxLength)
    /** reference `types.py:416-499` */
    def llmLayerActivations(modelName: String, layerNum: Long,
                            tokenMode: String = "last",
                            batchSize: Long = 32L): LLMLayerActivationsOp =
      LLMLayerActivationsOp(modelName, t, layerNum, tokenMode, batchSize)
    /** reference `types.py:501-542` */
    def llmLogitScores(modelName: String, tokens: Seq[Any],
                       batchSize: Long = 32L): LLMLogitScoresOp =
      LLMLogitScoresOp(modelName, t, tokens, batchSize)
    def llmGenerate(modelName: String, maxTokens: Long = 100L): LLMGenerateTextOp =
      LLMGenerateTextOp(modelName, t, maxTokens)
    /** beyond reference: LSH near-duplicate pairs over this text column */
    def minhashNearDupPairs(shingleN: Long = 3L, numPerms: Long = 64L,
                            numBands: Long = 16L,
                            threshold: Double = 0.8): MinHashNearDupPairsOp =
      MinHashNearDupPairsOp(t, shingleN, numPerms, numBands, threshold)
    /** beyond reference: row-local curation signals (all ephemeral) */
    def tokenCount: TokenCountOp = TokenCountOp(t)
    def qualityScore: QualityScoreOp = QualityScoreOp(t)
    def languageId: LanguageIdOp = LanguageIdOp(t)
    def fingerprint: FingerprintOp = FingerprintOp(t)
    def gopherKeep(minWords: Long = 50L, maxWords: Long = 100000L,
                   minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                   minUniqueFrac: Double = 0.2): GopherKeepOp =
      GopherKeepOp(t, minWords, maxWords, minMeanWordLen, maxMeanWordLen,
        minUniqueFrac)
    /** beyond reference: bigram stupid-backoff SELF-perplexity of this
      * column (model fit on the column itself) */
    def lmPerplexity: LmPerplexityOp = LmPerplexityOp(t, t)
    /** beyond reference: perplexity of this column scored against a model
      * fit on `fitOn` (the external-reference-model form) */
    def lmPerplexity(fitOn: TextColumnType): LmPerplexityOp =
      LmPerplexityOp(t, fitOn)
    /** beyond reference: CCNet head/middle/tail perplexity tiers per
      * language-key value, against a reference model fit on `fitOn` */
    def ccnetBuckets(lang: CategoricalColumnType,
                     fitOn: TextColumnType): CcnetBucketsOp =
      CcnetBucketsOp(t, lang, fitOn)
    /** beyond reference: DSIR top-k selection against a target column */
    def dsirSelect(target: TextColumnType, m: Long = 4096L, k: Long = 100L,
                   alpha: Double = 1.0): DsirSelectOp =
      DsirSelectOp(t, target, m, k, alpha)
    /** beyond reference: ExactSubstr span dedup (stride-1 k-word windows) */
    def dedupSpans(k: Long = 8L): DedupSpansOp = DedupSpansOp(t, k)
    /** beyond reference: BM25 top-k retrieval for literal query terms */
    def bm25(terms: Seq[String], k: Long = 10L, k1: Double = 1.2,
             b: Double = 0.75): Bm25RankOp = Bm25RankOp(t, terms, k, k1, b)
    /** beyond reference: batch BM25 — N term-list queries, one corpus
      * pass; query_id = position */
    def bm25Many(queries: Seq[Seq[String]], k: Long = 10L, k1: Double = 1.2,
                 b: Double = 0.75): Bm25RankManyOp =
      Bm25RankManyOp(t, queries, k, k1, b)
    /** beyond reference: hashing-trick document embedding — the spec
      * layer's text→vector bridge (scaleBits: divide counts by 2^bits) */
    def hashedTfEmbedding(dim: Long = 64L,
                          scaleBits: Long = 0L): HashedTfEmbeddingOp =
      HashedTfEmbeddingOp(t, dim, scaleBits)
  }

  implicit class ClassifierBuilders(private val m: ClassifierType) extends AnyVal {
    /** reference `types.py:364-376` */
    def predict(x: VectorColumnType): ClassifierPredictOp = ClassifierPredictOp(m, x)
    /** beyond reference: multiclass predicted-label column */
    def predictMulticlass(x: VectorColumnType): MulticlassPredictOp =
      MulticlassPredictOp(m, x)
  }

  implicit class MulticlassPredictionBuilders(private val p: CategoricalColumnType) {
    /** beyond reference: multiclass report against categorical ground truth */
    def evaluateMulticlass(gtLabels: CategoricalColumnType,
                           split: Option[ColumnType] = None,
                           predictDomain: Option[BooleanColumnType] = None)
    : MulticlassEvaluationOp =
      MulticlassEvaluationOp(p, gtLabels, split, predictDomain)
  }

  implicit class ScorePredictionBuilders(private val s: ScoreColumnType) extends AnyVal {
    /** reference `types.py:719-750` */
    def evaluate(gtPositives: BooleanColumnType,
                 gtNegatives: BooleanColumnType,
                 split: Option[ColumnType] = None,
                 predictDomain: Option[BooleanColumnType] = None,
                 scoreThreshold: Option[Double] = None): ClassifierEvaluationOp =
      ClassifierEvaluationOp(s, gtPositives, gtNegatives, split, predictDomain,
        scoreThreshold)
  }
}
