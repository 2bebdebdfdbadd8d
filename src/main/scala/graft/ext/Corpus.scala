package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-level training-data curation operators — the decisions a 100 TB
  * pretraining pipeline makes BETWEEN raw scans and tokenization: benchmark
  * contamination detection, intra-corpus segment dedup, PII redaction,
  * Gopher-style quality gating, and exact stratified sampling.
  *
  * Beyond the reference's surface (north star in /root/repo/BASELINE.json).
  * Design rules shared by every operator here:
  *  - per-row feature extraction is pure `Column` expressions (whole-stage
  *    codegen, zero shuffle);
  *  - corpus-wide steps shuffle HASHES or WORD N-GRAMS, never documents;
  *  - the only full-document shuffle is the final reassembly groupBy in
  *    [[dedupSegments]], keyed by doc id (uniform, no skew).
  */
object Corpus {

  /** Word tokens: split on runs of RE2-safe whitespace ([[TextAnalysis.Ws]]
    * — `\s` differs between Java and RE2, and these results are
    * oracle-replayed in DuckDB), then zero-length tokens dropped. Spark's
    * `split` keeps the empty strings that leading/trailing separators
    * produce (and `trim` strips only spaces, not tabs/newlines), while the
    * DuckDB oracles all apply `list_filter(length > 0)` — filtering here
    * keeps both engines' word lists identical on whitespace-edged text.
    * Blank text → empty array.
    */
  def words(text: Column): Column =
    filter(split(text, TextAnalysis.Ws + "+"), w => length(w) > 0)

  /** All word n-grams of `text` joined by single spaces, in order; fewer
    * than `n` words → empty array. Pure expression — the explode/shuffle
    * decision stays with the caller.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val ws = words(text)
    val m = size(ws) - (n - 1)
    when(m <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), m - 1),
        i => concat_ws(" ", slice(ws, i + 1, lit(n)))))
  }

  /** Benchmark-contamination check (the n-gram-overlap test run before
    * training: does a candidate document share any word n-gram with an
    * evaluation benchmark?). Returns one row per `train` document:
    * `(<idCol>, n_overlap_grams, is_contaminated)` where `n_overlap_grams`
    * counts DISTINCT shared n-grams and `is_contaminated` is
    * `n_overlap_grams >= minOverlap`.
    *
    * 100 TB shape: benchmarks are small by construction (10³–10⁶ examples),
    * so the distinct benchmark-gram set is broadcast and the training side
    * never shuffles full documents — only its (id, gram) pairs, which the
    * per-doc distinct + map-side-combined count keep bounded. Pass
    * `broadcastBench = false` if the benchmark side is genuinely large
    * (falls back to a hash join on the gram).
    */
  def contamination(train: DataFrame, bench: DataFrame,
                    textCol: String, idCol: String, n: Int,
                    minOverlap: Long = 1L,
                    broadcastBench: Boolean = true): DataFrame = {
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    // shuffle/broadcast 64-bit gram hashes, never gram strings: the
    // broadcast side is 8 bytes/gram and the train-side distinct+join
    // shuffles (id, long). A hash collision flags one extra gram as shared
    // (P ≈ n²/2⁶⁴ per doc) — the standard trade in production overlap
    // checks; the strings themselves never leave their partitions.
    val bg0 = bench
      .select(explode(wordNgrams(col(textCol), n)).as("__gs"))
      .select(xxhash64(col("__gs")).as("__g")).distinct()
    val bg = if (broadcastBench) broadcast(bg0) else bg0
    val overlaps = train
      .select(col(idCol),
        explode(wordNgrams(col(textCol), n)).as("__gs"))
      .select(col(idCol), xxhash64(col("__gs")).as("__g"))
      .distinct() // count each shared gram once per doc
      .join(bg, "__g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap_grams"))
    train.select(col(idCol))
      .join(overlaps, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap_grams"), lit(0L)).as("n_overlap_grams"),
        (coalesce(col("n_overlap_grams"), lit(0L)) >= minOverlap)
          .as("is_contaminated"))
  }

  /** Corpus-wide segment-level dedup (the "remove repeated boilerplate
    * paragraphs" pass — Lee et al. 2022 "Deduplicating Training Data Makes
    * Language Models Better" applies it at the substring level; this is the
    * aligned-segment formulation): split every document into consecutive
    * `k`-word segments, keep only the FIRST occurrence of each distinct
    * segment corpus-wide (first = minimum `(doc id, segment index)`,
    * deterministic), and reassemble each document from its surviving
    * segments in order. Documents whose every segment was seen earlier
    * come back as the empty string — rows are never dropped.
    *
    * Output: `(<idCol>, dedup_text)`.
    *
    * 100 TB shape: the first-occurrence choice is a groupBy-min on the
    * segment's 64-bit content hash (map-side combine; the shuffle carries
    * each distinct 8-byte hash once per partition, not each occurrence of
    * the text), the winner check is an equi-join on that hash, and
    * reassembly shuffles each surviving segment exactly once keyed by
    * uniform doc id — the only shuffle that carries text, and the output
    * needs that text. A hash collision merges two distinct segments
    * (P ≈ n²/2⁶⁴ — the trade every production dedup makes). Nothing is ever
    * quadratic in corpus size and no driver-side state exists. A repeated
    * mega-segment (site boilerplate duplicated 10⁹×) is one groupBy key —
    * partial aggregation absorbs it; the join side is AQE-skew-split
    * territory, keep AQE on.
    */
  def dedupSegments(docs: DataFrame, textCol: String, idCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ws = words(col(textCol))
    val nseg = ceil(size(ws).cast("double") / k).cast("int")
    val segs = when(size(ws) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nseg - 1),
        i => concat_ws(" ", slice(ws, i * k + 1, lit(k)))))
    val exploded = docs
      .select(col(idCol), posexplode(segs).as(Seq("__seg_idx", "__seg")))
    // The dedup DECISION runs on a 64-bit content hash of the segment (what
    // production dedup shuffles — Lee et al. use hashes too): the groupBy
    // key and join key are 8 bytes, and segment text crosses the wire only
    // where the output needs it (the reassembly shuffle). min(struct) =
    // lexicographic (id, idx) minimum — deterministic first occurrence
    // without a window over the whole corpus.
    val hashed = exploded.withColumn("__h", xxhash64(col("__seg")))
    val firstOcc = hashed.groupBy(col("__h"))
      .agg(min(struct(col(idCol), col("__seg_idx"))).as("__first"))
    val kept = hashed.join(firstOcc, "__h")
      .filter(struct(col(idCol), col("__seg_idx")) === col("__first"))
    val reassembled = kept.groupBy(col(idCol))
      .agg(concat_ws(" ", transform(
        array_sort(collect_list(struct(col("__seg_idx"), col("__seg")))),
        s => s.getField("__seg"))).as("dedup_text"))
    docs.select(col(idCol))
      .join(reassembled, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("dedup_text"), lit("")).as("dedup_text"))
  }

  /** PII redaction: emails → `<EMAIL>`, IPv4 literals → `<IP>`,
    * international-format phone numbers → `<PHONE>`. Patterns are
    * RE2-compatible (no lookaround/backrefs) so the exact transformation is
    * replayable in the DuckDB oracle, and codegen'd `regexp_replace` keeps
    * this a pure narrow map at 100 TB. Order matters: emails first (an
    * address can embed digit runs), then IPs (dotted digits would otherwise
    * be half-eaten by the phone pattern), phones last.
    */
  def redactPII(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val phone = "\\+[0-9][0-9-]{6,14}[0-9]"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "<EMAIL>"),
        ipv4, "<IP>"),
      phone, "<PHONE>")
  }

  /** Gopher-style quality gate (Rae et al. 2021, table A1 — the
    * document-level heuristics, restated as pure expressions): per-rule
    * booleans plus the conjunction `keep`. Word-soup corpora tune the
    * bounds; the SHAPE (each rule independently reported so a pipeline can
    * ablate them) is the point.
    */
  def gopherRules(text: Column,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                  minUniqueFrac: Double = 0.2,
                  stopwords: Seq[String] = Seq("the", "a", "of", "to", "and"))
      : Seq[(String, Column)] = {
    val ws = words(text)
    val nWords = size(ws)
    // mean over the words themselves (not chars/count — separators don't
    // distort it when texts are multi-space or newline separated)
    val meanLen = when(nWords > 0,
      aggregate(ws, lit(0L), (acc, w) => acc + length(w)).cast("double") / nWords)
      .otherwise(lit(0.0))
    val uniqueFrac = when(nWords > 0,
      size(array_distinct(ws)).cast("double") / nWords).otherwise(lit(0.0))
    val hasStop = arrays_overlap(ws, array(stopwords.map(lit): _*))
    val okCount = nWords >= minWords && nWords <= maxWords
    val okMean = meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen
    val okUnique = uniqueFrac >= minUniqueFrac
    Seq(
      "n_words" -> nWords.cast("long"),
      "mean_word_len" -> meanLen,
      "unique_frac" -> uniqueFrac,
      "ok_word_count" -> okCount,
      "ok_mean_word_len" -> okMean,
      "ok_unique_frac" -> okUnique,
      "ok_stopword" -> hasStop,
      "keep" -> (okCount && okMean && okUnique && hasStop))
  }

  /** Exact stratified sample: per stratum, keep exactly
    * `floor(frac * stratum size)` rows, chosen by ranking on
    * `md5(<salt>:<id>)` — deterministic, seedable via `salt`, and
    * replayable bit-for-bit in any engine with md5 (the DuckDB oracle).
    *
    * The rank is a window partitioned by stratum: the shuffle is one
    * hash-partition on the stratum key. Strata in curation pipelines are
    * coarse (language × source: thousands of groups), so per-stratum sort
    * fits executors until a single stratum outgrows a partition — at that
    * point switch to the two-phase rank used by `AssignTrainTestSplitOp`
    * (per-partition count + offset join). The exact-count contract is the
    * same either way.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       frac: Double, salt: String = "graft"): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac must be in [0,1], got $frac")
    val rankKey = md5(concat_ws(":", lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(col(stratumCol)).orderBy(rankKey, col(idCol))
    val cw = Window.partitionBy(col(stratumCol))
    df.withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col("__rk") <= floor(col("__n") * frac))
      .drop("__rk", "__n")
  }
}
