package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-based n-gram language-model perplexity — the CCNet-style quality
  * signal a pretraining pipeline uses to rank/filter documents (Wenzek et
  * al. 2020 score web text with a KenLM model; Brants et al. 2007's "Stupid
  * Backoff" is the standard count-only smoothing at corpus scale). Beyond
  * the reference's surface.
  *
  * The model is a bigram LM with stupid backoff:
  *
  *   p(w | v) = c(v,w) / c(v)                    if c(v,w) > 0
  *            = [[Backoff]] * c(w) / total       otherwise
  *
  * and a per-document score sum_i ln p(w_i | w_{i-1}) with a BOS marker in
  * front of every document (so the first word conditions on `<s>`; c(<s>)
  * is the number of non-empty fit documents).
  *
  * == Determinism (the oracle gate) ==
  * Each per-token ln is quantized to integer MICRO-NATS
  * (`round(logp*1e6)` as BIGINT) BEFORE the per-document sum, so the sum
  * is an integer aggregation — order-free across partitions and
  * bit-identical in any engine. Each quantized term is the result of a
  * single correctly-rounded double division (+ one multiply on the backoff
  * arm) followed by one `ln`, so the only cross-engine wiggle is the last
  * ulp of `ln`/`exp`, absorbed by the 1e-6 quantum and the final
  * `round(ppl, 6)`.
  *
  * == 100 TB design ==
  * Fit: tokens/bigram pairs are produced MAP-SIDE from each document's word
  * array (no window, no per-doc shuffle); the only shuffles key on words /
  * word pairs (partial aggregation applies). Score: three equi-joins of the
  * exploded (prev, cur) stream against the count tables — Catalyst
  * broadcasts them when small (our corpora vocabularies) and sort-merge
  * joins at web-corpus vocabulary scale — then one groupBy on the doc id
  * (uniform key). The corpus-total token count travels as a broadcast
  * 1-row frame, never a driver scalar, so the whole pipeline stays lazy.
  */
object LangModel {

  /** Micro-nat quantum for per-token log-probs. */
  val Quant: Double = 1e6

  /** Stupid-backoff discount (Brants et al. 2007 use 0.4). */
  val Backoff: Double = 0.4

  /** BOS marker: a token containing a space can never collide with a word
    * produced by whitespace tokenization. */
  val Bos = "<s bos>"

  /** Fitted count model. `unigrams` = (w, cu) including one [[Bos]] row
    * counting non-empty documents; `bigrams` = (v, w, cb); `total` =
    * 1-row (total_tokens) frame, cross-joined (broadcast) into scoring. */
  final case class BigramLm(unigrams: DataFrame, bigrams: DataFrame,
                            total: DataFrame)

  /** (pos, prev, cur) triples of one document's word array, BOS-prefixed —
    * pure expression, evaluated map-side. */
  private def pairTriples(textCol: Column): Column =
    Corpus.bindArray(Corpus.words(textCol)) { ws =>
      // sequence(0, -1) DESCENDS in Spark — guard the empty-document case
      // explicitly (same pattern as Corpus.wordNgrams)
      when(size(ws) === 0,
          array().cast("array<struct<pos:int,prev:string,cur:string>>"))
        .otherwise(transform(sequence(lit(0), size(ws) - 1), i =>
          struct(i.as("pos"),
            when(i === 0, lit(Bos)).otherwise(element_at(ws, i)).as("prev"),
            element_at(ws, i + 1).as("cur"))))
    }

  /** The bigram SUFFICIENT STATISTIC: (v, w, cnt) pair counts. The whole
    * model derives from this table ([[fromPairCounts]]), and it merges by
    * plain count addition — the sum monoid the streaming LM sink folds
    * ([[graft.streaming.Streaming.lmScoreToSink]]). */
  def pairCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(pairTriples(col(textCol))).as("t"))
      .select(col("t.prev").as("v"), col("t.cur").as("w"))
      .groupBy(col("v"), col("w")).agg(count(lit(1)).as("cnt"))

  /** Rebuild the scoring model from a (v, w, cnt) pair-count table —
    * identical to [[fit]] on the originating corpus (unigram, BOS, and
    * total counts are all linear in the pair counts). */
  def fromPairCounts(pairs: DataFrame): BigramLm = {
    val uni = pairs.groupBy(col("w")).agg(sum(col("cnt")).as("cu"))
      .unionByName(pairs.filter(col("v") === Bos)
        .agg(sum(col("cnt")).as("cu")).select(lit(Bos).as("w"),
          coalesce(col("cu"), lit(0L)).as("cu")))
    val bi = pairs.select(col("v"), col("w"), col("cnt").as("cb"))
    val tot = pairs.agg(coalesce(sum(col("cnt")), lit(0L)).as("total_tokens"))
    BigramLm(uni, bi, tot)
  }

  /** Fit the bigram model on `docs(textCol)`. Empty documents contribute
    * nothing (no BOS count either) — mirrored by the oracle. */
  def fit(docs: DataFrame, textCol: String): BigramLm = {
    val pairs = docs
      .select(explode(pairTriples(col(textCol))).as("t"))
      .select(col("t.prev").as("v"), col("t.cur").as("w"))
    // c(w) over real words; c(<s>) = number of non-empty docs = count of
    // rows whose prev is BOS (exactly one per non-empty doc).
    val uni = pairs.groupBy(col("w")).agg(count(lit(1)).as("cu"))
      .unionByName(pairs.filter(col("v") === Bos)
        .agg(count(lit(1)).as("cu")).select(lit(Bos).as("w"), col("cu")))
    val bi = pairs.groupBy(col("v"), col("w")).agg(count(lit(1)).as("cb"))
    val tot = pairs.agg(count(lit(1)).as("total_tokens"))
    BigramLm(uni, bi, tot)
  }

  /** Per-token quantized log-prob: BIGINT micro-nats. Single-division
    * arithmetic, pinned shape `ln(cb/cv)` / `ln(0.4*(cu/total))` — the
    * DuckDB replay writes the identical expression tree. OOV words (absent
    * from an externally fitted model) floor at count 1. */
  private def qlogp(cb: Column, cv: Column, cu: Column, total: Column): Column = {
    val p = when(cb.isNotNull && cv.isNotNull,
        log(cb.cast("double") / cv.cast("double")))
      .otherwise(log(lit(Backoff) *
        (coalesce(cu, lit(1L)).cast("double") / total.cast("double"))))
    round(p * Quant).cast("long")
  }

  /** Score `docs` against `lm`: one row per input document —
    * (id, n_tokens, logp_u6, ppl) where `logp_u6` is the integer micro-nat
    * sum (the exact, hash-stable field) and
    * `ppl = round(exp(-(logp_u6/1e6)/n_tokens), 6)`. Empty documents keep a
    * row with n_tokens = 0 and NULL ppl. */
  def score(docs: DataFrame, idCol: String, textCol: String,
            lm: BigramLm): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(pairTriples(col(textCol))).as("t"))
      .select(col(idCol), col("t.pos").as("pos"),
        col("t.prev").as("prev"), col("t.cur").as("cur"))
    val uniV = lm.unigrams.select(col("w").as("prev"), col("cu").as("cv"))
    val uniW = lm.unigrams.select(col("w").as("cur"), col("cu").as("cu"))
    val bi = lm.bigrams.select(col("v").as("prev"), col("w").as("cur"),
      col("cb"))
    val scored = toks
      .join(bi, Seq("prev", "cur"), "left")
      .join(uniV, Seq("prev"), "left")
      .join(uniW, Seq("cur"), "left")
      .crossJoin(broadcast(lm.total))
      .select(col(idCol),
        qlogp(col("cb"), col("cv"), col("cu"), col("total_tokens"))
          .as("qlp"))
    val perDoc = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("qlp")).as("logp_u6"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("logp_u6"), lit(0L)).as("logp_u6"),
        when(col("n_tokens").isNotNull,
          round(exp(-(col("logp_u6").cast("double") / Quant) /
            col("n_tokens").cast("double")), 6)).as("ppl"))
  }

  /** Self-perplexity: fit on the corpus, score the corpus. The standard
    * "how typical is this document of the collection" quality signal when
    * no external reference model is available. */
  def perplexity(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    score(docs, idCol, textCol, fit(docs, textCol))

  /** CCNet-style perplexity buckets (Wenzek et al. 2020, arXiv:1911.00359
    * — the canonical web-corpus quality tiering): score every document
    * against a REFERENCE model `lm` (CCNet fits it on target-domain text),
    * then split each language's documents into equal thirds by perplexity
    * rank — `head` (most target-like), `middle`, `tail`. Output one row per
    * input: (id, lang, n_tokens, logp_u6, ppl, bucket).
    *
    * Deterministic: rank order is (ppl, id) with unscoreable documents
    * (n_tokens = 0, NULL ppl) sorted to +∞ — they land in `tail`, the
    * honest verdict for an empty document; bucket = ⌊3·rank/count⌋ per
    * language, so the thirds are exact up to integer rounding and every
    * engine replays them bit-for-bit.
    *
    * Scale shape: scoring is the [[score]] plan (count-table joins); the
    * per-language ranking is the GLOBAL two-phase rank over
    * (lang, ppl, id) — no `Window.partitionBy(lang)`, so a corpus that is
    * 90% one language (every real web crawl) cannot serialize into one
    * task. Within-language ranks are recovered from the global rank by a
    * broadcast join of per-language (first-rank, count) aggregates —
    * #languages rows, metadata-scale. */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String,
                   langCol: String, lm: BigramLm): DataFrame = {
    val RowIdx = graft.ops.ColumnOps.RowIdx
    val scored = score(docs, idCol, textCol, lm)
    // private id alias: withRowIdxByKey writes the engine's __row_idx
    // column, which IS the id column when the spec layer calls this
    // evaluate the scoring pipeline ONCE: the two-phase rank reads its
    // input 3+ times (bounds count, seeded sample, the rank shuffle) and
    // the bucket join below reads the ranked frame twice more — without
    // this, the LM count-table joins re-execute per read (measured 9.3 s →
    // 3.4 s at sf0.1 with the checkpoint). Blocks hold only the narrow
    // (id, lang, counts, ppl) projection — no text — and are released when
    // the returned frame is unreferenced.
    val joined = docs
      .select(col(idCol).as("__ccnet_id"), col(langCol).cast("string").as("lang"))
      .join(scored.withColumnRenamed(idCol, "__ccnet_id"), Seq("__ccnet_id"))
      .select(col("__ccnet_id"), col("lang"), col("n_tokens"),
        col("logp_u6"), col("ppl"))
      .localCheckpoint(true)
    val key = coalesce(col("ppl"), lit(Double.PositiveInfinity))
    val ranked = graft.ops.ColumnOps.withRowIdxByKey(
      joined, col("lang"), key, col("__ccnet_id"))
    val perLang = ranked.groupBy(col("lang"))
      .agg(min(col(RowIdx)).as("__first"), count(lit(1)).as("__cnt"))
    ranked.join(broadcast(perLang), "lang")
      .withColumn("__r", col(RowIdx) - col("__first"))
      .withColumn("bucket",
        element_at(typedlit(Seq("head", "middle", "tail")),
          (floor(col("__r") * 3 / col("__cnt")) + 1).cast("int")))
      .select(col("__ccnet_id").as(idCol), col("lang"), col("n_tokens"),
        col("logp_u6"), col("ppl"), col("bucket"))
  }

  // ---------------- trigram order ----------------

  /** Fitted trigram model. Every table derives from ONE (prev2, prev, cur)
    * triple stream — numerators and denominators count the same events, so
    * conditionals are well-normalized at every backoff order:
    * `tri` (u,v,w,c3), `biCtx` (u,v,c2c), `bi` (v,w,c2), `uniCtx` (v,c1c),
    * `uni` (w,c1), `total` 1-row. */
  final case class TrigramLm(tri: DataFrame, biCtx: DataFrame, bi: DataFrame,
                             uniCtx: DataFrame, uni: DataFrame,
                             total: DataFrame)

  /** (pos, prev2, prev, cur) with TWO BOS markers in front — pure
    * expression, map-side. */
  private def tripleQuads(textCol: Column): Column =
    Corpus.bindArray(Corpus.words(textCol)) { ws =>
      when(size(ws) === 0,
          array().cast("array<struct<pos:int,prev2:string,prev:string,cur:string>>"))
        .otherwise(transform(sequence(lit(0), size(ws) - 1), i =>
          struct(i.as("pos"),
            when(i <= 1, lit(Bos)).otherwise(element_at(ws, i - 1)).as("prev2"),
            when(i === 0, lit(Bos)).otherwise(element_at(ws, i)).as("prev"),
            element_at(ws, i + 1).as("cur"))))
    }

  /** Fit the trigram stupid-backoff model on `docs(textCol)`. */
  def fit3(docs: DataFrame, textCol: String): TrigramLm = {
    val t = docs.select(explode(tripleQuads(col(textCol))).as("t"))
      .select(col("t.prev2").as("u"), col("t.prev").as("v"),
        col("t.cur").as("w"))
    TrigramLm(
      tri = t.groupBy(col("u"), col("v"), col("w"))
        .agg(count(lit(1)).as("c3")),
      biCtx = t.groupBy(col("u"), col("v")).agg(count(lit(1)).as("c2c")),
      bi = t.groupBy(col("v"), col("w")).agg(count(lit(1)).as("c2")),
      uniCtx = t.groupBy(col("v")).agg(count(lit(1)).as("c1c")),
      uni = t.groupBy(col("w")).agg(count(lit(1)).as("c1")),
      total = t.agg(count(lit(1)).as("total_tokens")))
  }

  /** Per-token quantized log-prob, stupid-backoff chain
    * tri → bi (×0.4) → uni (×0.4×0.4, OOV floor 1). Pinned single-division
    * arithmetic per arm; the DuckDB replay writes the identical tree. */
  private def qlogp3(c3: Column, c2c: Column, c2: Column, c1c: Column,
                     c1: Column, total: Column): Column = {
    val p = when(c3.isNotNull && c2c.isNotNull,
        log(c3.cast("double") / c2c.cast("double")))
      .when(c2.isNotNull && c1c.isNotNull,
        log(lit(Backoff) * (c2.cast("double") / c1c.cast("double"))))
      .otherwise(log(lit(Backoff) * lit(Backoff) *
        (coalesce(c1, lit(1L)).cast("double") / total.cast("double"))))
    round(p * Quant).cast("long")
  }

  /** Score `docs` against a [[TrigramLm]]: same output contract as
    * [[score]] — (id, n_tokens, logp_u6, ppl). */
  def score3(docs: DataFrame, idCol: String, textCol: String,
             lm: TrigramLm): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(tripleQuads(col(textCol))).as("t"))
      .select(col(idCol), col("t.prev2").as("u"), col("t.prev").as("v"),
        col("t.cur").as("w"))
    val scored = toks
      .join(lm.tri, Seq("u", "v", "w"), "left")
      .join(lm.biCtx, Seq("u", "v"), "left")
      .join(lm.bi, Seq("v", "w"), "left")
      .join(lm.uniCtx, Seq("v"), "left")
      .join(lm.uni, Seq("w"), "left")
      .crossJoin(broadcast(lm.total))
      .select(col(idCol),
        qlogp3(col("c3"), col("c2c"), col("c2"), col("c1c"), col("c1"),
          col("total_tokens")).as("qlp"))
    val perDoc = scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("qlp")).as("logp_u6"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("logp_u6"), lit(0L)).as("logp_u6"),
        when(col("n_tokens").isNotNull,
          round(exp(-(col("logp_u6").cast("double") / Quant) /
            col("n_tokens").cast("double")), 6)).as("ppl"))
  }
}
