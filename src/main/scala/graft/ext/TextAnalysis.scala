package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines — beyond
  * the reference's surface (north star in /root/repo/BASELINE.json). All are
  * pure narrow transformations: per-row Column expressions (whole-stage
  * codegen, no shuffle), so they scale linearly with input splits at 100 TB.
  */
object TextAnalysis {

  /** RE2-equivalent whitespace class. Java regex `\s` additionally matches
    * vertical tab (\x0B), which DuckDB's RE2 `\s` does not — oracle-replayed
    * normalizations must use this explicit class so both engines agree. */
  val Ws = "[ \\t\\n\\f\\r]"
  /** Compiled `Ws+` for JVM-side tokenization that must match
    * [[graft.ext.Corpus.words]] exactly. */
  val WsPlus: java.util.regex.Pattern = java.util.regex.Pattern.compile(Ws + "+")

  /** Whitespace token count; empty/blank text → 0. Pure built-ins. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), Ws + "+")))

  /** Exact PHRASE occurrence count: how many times the word sequence
    * `phrase` appears contiguously in the text's whitespace tokens
    * ([[graft.ext.Corpus.words]] tokenization). Map-side — one scan with
    * zero shuffle at any corpus size (compose with a filter to restrict
    * BM25/RRF retrieval to phrase-matching documents). A primitive UDF
    * over the words array, the hashed-TF lesson: the expression form
    * (`filter(sequence(0, n−p), i -> element_at(ws, i+j) === …)`)
    * re-evaluates the words SPLIT inside the lambda per window position —
    * no common-subexpression elimination across lambda bodies — and
    * measured 12× slower (6.5 s → 0.5 s at sf0.1). Overlapping
    * occurrences each count ("a a a" contains "a a" twice); text shorter
    * than the phrase (or null) counts 0. */
  def phraseCount(text: Column, phrase: Seq[String]): Column = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val p = phrase.toArray
    val f = udf { ws: scala.collection.Seq[String] =>
      if (ws == null || ws.length < p.length) 0L
      else {
        var c = 0L
        var i = 0
        val last = ws.length - p.length
        while (i <= last) {
          var j = 0
          while (j < p.length && ws(i + j) == p(j)) j += 1
          if (j == p.length) c += 1
          i += 1
        }
        c
      }
    }
    f(Corpus.words(text))
  }

  /** BPE-ish subword count: split on case/digit transitions as well as
    * whitespace — an approximation of byte-pair token counts without a
    * vocab. Implemented by inserting spaces at transitions then counting
    * whitespace tokens (RE2-compatible: no lookbehind, so the same logic is
    * expressible in the DuckDB oracle).
    */
  def subwordCount(text: Column): Column = {
    val norm = regexp_replace(
      regexp_replace(
        regexp_replace(text, "([a-zA-Z])([0-9])", "$1 $2"),
        "([0-9])([a-zA-Z])", "$1 $2"),
      "([a-z])([A-Z])", "$1 $2")
    tokenCount(norm)
  }

  /** Quality-score feature struct: cheap per-row signals used for corpus
    * filtering (C4/Gopher-style heuristics, all expressible as codegen'd
    * expressions).
    */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val t = text
    val nChars = length(t)
    val nTokens = tokenCount(t)
    val nUpper = length(regexp_replace(t, "[^A-Z]", ""))
    val nDigit = length(regexp_replace(t, "[^0-9]", ""))
    val nPunct = length(regexp_replace(t, "[^.,;:!?]", ""))
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTokens,
      "mean_token_len" ->
        when(nTokens > 0, (nChars - (nTokens - 1)).cast("double") / nTokens)
          .otherwise(lit(0.0)),
      "upper_ratio" -> when(nChars > 0, nUpper.cast("double") / nChars).otherwise(lit(0.0)),
      "digit_ratio" -> when(nChars > 0, nDigit.cast("double") / nChars).otherwise(lit(0.0)),
      "punct_ratio" -> when(nChars > 0, nPunct.cast("double") / nChars).otherwise(lit(0.0))
    )
  }

  /** Composite quality score in [0,1]: penalize extreme length, high
    * digit/punct density, and very short docs. Deterministic, heuristic. */
  def qualityScore(text: Column): Column = {
    val feats = qualityFeatures(text).toMap
    val lenOk = when(feats("n_tokens").between(5, 100000), lit(1.0)).otherwise(lit(0.3))
    val digitPenalty = lit(1.0) - least(feats("digit_ratio") * 2.0, lit(1.0))
    val punctPenalty = lit(1.0) - least(feats("punct_ratio") * 4.0, lit(1.0))
    round(lenOk * digitPenalty * punctPenalty, 6)
  }

  /** Stopword lists for the n-gram/stopword language-ID heuristic.
    * Small per-language function-word sets (public knowledge). */
  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "des", "dans", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "en", "por")
  )

  /** Language-ID heuristic: CJK codepoint detection for zh, else the
    * language whose stopword list overlaps the document's tokens most
    * (multiset counts — frequency matters); tie → first language in sorted
    * order; none → "und".
    *
    * The membership scan is a row-local UDF over a static token→langs hash
    * map: one O(1) lookup per token, replacing the expression-tree form
    * (per-token `isin` chains = |langs|×|stopwords| string comparisons per
    * token — measured ~40% of the query at sf0.1). The regex tokenization
    * stays a codegen'd built-in; semantics and the DuckDB oracle are
    * unchanged.
    */
  private val sortedLangs: Array[String] = stopwords.keys.toArray.sorted
  private val tokenLangs: Map[String, Array[Int]] =
    sortedLangs.zipWithIndex.flatMap { case (lang, i) =>
      stopwords(lang).map(w => w -> i)
    }.groupBy(_._1).map { case (w, ps) => w -> ps.map(_._2) }
  private val langPickUdf = udf { toks: scala.collection.Seq[String] =>
    val counts = new Array[Int](sortedLangs.length)
    if (toks != null) for (t <- toks; ls <- tokenLangs.get(t); l <- ls)
      counts(l) += 1
    var best = 0
    for (c <- counts) if (c > best) best = c
    if (best == 0) "und"
    else sortedLangs(counts.indexOf(best)) // first sorted lang on tie
  }

  def langId(text: Column): Column = {
    val toks = split(lower(text), "[^\\p{L}]+")
    val hasCjk = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", "")) > 0
    when(hasCjk, lit("zh")).otherwise(langPickUdf(toks))
  }

  /** Document fingerprint, oracle-verifiable flavor: md5 over normalized
    * text (lowercase, collapsed whitespace). Stable across engines. */
  /** Per-document TF-IDF top terms — the one text operator here that NEEDS
    * shuffles, shaped for them:
    *
    *   1. explode to (doc, term), partial-aggregate to (doc, term, tf) —
    *      map-side combine absorbs within-doc repetition before the shuffle;
    *   2. document frequency = distinct-doc count per term — second shuffle
    *      carries only (term, df) pairs;
    *   3. idf joined back (AQE broadcasts when the vocabulary is small);
    *   4. per-doc top-k via a window PARTITIONED by doc.
    *
    * Ranking is by (tf desc, term asc) — integer-deterministic, so the
    * result is hash-comparable across engines; `tfidf = tf · ln((N+1)/(df+1))`
    * (smoothed) rides along rounded to 6 dp as the informational score.
    * Tokens are lowercased [a-z0-9]+ runs, ≥ `minTermLen` chars.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int = 5,
                    minTermLen: Int = 3,
                    numDocs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = df
      .select(col(idCol).as("doc_id"),
        explode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
          t => length(t) >= minTermLen)).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // N enters the idf as a plan literal, so without a caller-supplied
    // count this runs ONE EAGER distinct-count job at construction time —
    // pass `numDocs` in pipelines that already know the corpus size
    val n = numDocs.getOrElse(df.select(col(idCol)).distinct().count())
    val idf = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df_count"))
      .select(col("term"),
        log((lit(n) + 1.0) / (col("df_count") + 1.0)).as("idf"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("term").asc)
    tf.join(idf, "term")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"),
        round(col("tf") * col("idf"), 6).as("tfidf"))
  }

  /** Model-free document embedding by the hashing trick (Weinberger et al.
    * 2009): each word hashes to a bucket in [0, dim) with a ±1 sign drawn
    * from an independent bit of the same hash (the signed estimator keeps
    * collision noise zero-mean), and the embedding is the signed bucket
    * count vector — INTEGER-valued floats, so every downstream cosine is
    * exact-dot arithmetic and the whole construction replays in SQL. The
    * bridge from text into the ANN/semantic-dedup family when no neural
    * encoder is available (or as the cheap first-pass filter before one):
    * pure map-side expression, zero shuffle, zero model artifact.
    *
    * The word hash is [[Dsir.md5Bucket60]] (the cross-engine md5-prefix
    * primitive): bucket = low bits mod dim, sign = bit 59 — disjoint bit
    * ranges for any dim < 2^59. */
  def hashedTfEmbedding(text: Column, dim: Int): Column = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    // one primitive pass over the words (the repetitionSignals precedent) —
    // the expression form (`transform(range(dim), d -> aggregate(...))`)
    // was O(dim·words) boxed lambdas per row and dominated q_quality_probe.
    val f = udf { s: String => hashedTfVector(s, dim) }
    f(text)
  }

  /** The raw JVM function under [[hashedTfEmbedding]] — shared verbatim by
    * the in-process [[graft.llm.MlpProvider]] so model inputs and SQL
    * oracles agree bit for bit. Bit-equality with the md5Bucket60 SQL
    * primitive is pinned by HashEmbedSpec's independent reimplementation
    * test: the top 60 bits of the digest's first 8 bytes ARE the
    * 15-hex-char prefix. */
  def hashedTfVector(s: String, dim: Int): Array[Float] = {
    if (s == null) null
    else {
      val v = new Array[Float](dim)
      val md = java.security.MessageDigest.getInstance("MD5")
      TextAnalysis.WsPlus.split(s).foreach { w =>
        if (w.nonEmpty) {
          val d = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var h = 0L
          var i = 0
          while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
          h = h >>> 4 // 64 big-endian bits -> the leading 60 (15 hex chars)
          v((h % dim).toInt) += (1L - ((h >>> 59) & 1L) * 2L).toFloat
        }
      }
      v
    }
  }

  /** TRAINED language ID — fastText's architecture with zero neural model:
    * hashed-TF bag-of-words features ([[hashedTfEmbedding]], scaled by the
    * dyadic /1024 to stay inside the quantized-exact 2⁵³ contract) scored
    * by the exact nearest-class-mean probe
    * ([[graft.ml.Multiclass.fitCentroidsExact]]). That is literally the
    * fastText supervised shape (Joulin et al. 2016: averaged hashed n-gram
    * embeddings → linear classifier) — and unlike the 6-language stopword
    * heuristic [[langId]], it learns WHATEVER label vocabulary the training
    * rows carry, so domains, quality tiers, and unseen languages all work.
    * Fit rows = `fitFilter`; every row of `docs` is scored. Returns
    * `(id, pred_label)`. Both passes are map-only over plan literals after
    * one (class × dim)-bounded training aggregation — the 100 TB shape.
    * The whole train→predict pipeline is hash-replayable in SQL (the
    * q_lang_id_trained oracle replays it end to end); held-out accuracy
    * beating the stopword heuristic on a multilingual fixture is gated in
    * MulticlassSpec. */
  def langIdTrained(docs: DataFrame, idCol: String, textCol: String,
                    labelCol: String, fitFilter: Column,
                    dim: Int = 64): DataFrame = {
    val emb = docs.select(col(idCol), col(labelCol),
      transform(hashedTfEmbedding(col(textCol), dim), x => x / 1024.0)
        .as("__emb"))
    val fit = graft.ml.Multiclass.fitCentroidsExact(
      emb.filter(fitFilter), col("__emb"), col(labelCol))
    graft.ml.Multiclass.predictExact(emb, col(idCol), col("__emb"), fit)
      .withColumnRenamed("id", idCol)
  }

  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), Ws + "+", " "))

  /** Document fingerprint, rolling-hash flavor: 64-bit polynomial rolling
    * hash of the normalized text (base 1000003, mod 2^64 via Long
    * overflow) — the classic Rabin-Karp shape; implemented as a Scala UDF
    * (row-local, no shuffle impact).
    */
  def rollingHash(s: String): Long = {
    var h = 1469598103934665603L // FNV offset basis
    // oracle-exact normalization: RE2-equivalent whitespace class (Java \s
    // would also eat \x0B, DuckDB's \s would not), collapse FIRST, then
    // strip SPACES only (SQL trim semantics; JVM trim strips all chars
    // <= U+0020, which would diverge on control chars at the edges)
    val collapsed = s.toLowerCase(java.util.Locale.ROOT)
      .replaceAll(Ws + "+", " ")
    val norm = collapsed.replaceAll("^ +| +$", "")
    var i = 0
    while (i < norm.length) { h = h * 1000003L + norm.charAt(i); i += 1 }
    h
  }
  val rollingHashUdf = udf(rollingHash _)
}
