package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer induction (Kudo, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates", ACL 2018 — the SentencePiece `unigram` model), the OTHER
  * major tokenizer family next to [[Bpe]]: instead of greedy pair merges,
  * a vocabulary of candidate pieces is scored by a unigram language model
  * and each word is segmented by VITERBI decoding; EM alternates
  * segmentation (E) and piece-frequency re-estimation (M), and pieces the
  * decoder never uses fall out of the vocabulary (the pruning step).
  *
  * Engine-shaped choices, each a published simplification:
  *   - Viterbi-EM (hard EM): the E-step keeps only the BEST segmentation
  *     per word rather than the full forward-backward lattice — Kudo §3.2
  *     notes the l-best approximation; l = 1 makes every step integer-
  *     replayable.
  *   - Scores are INTEGER MICRO-NATS: s(p) = round(1e6·ln(cnt_p/total)) —
  *     the [[LangModel]] quantization discipline, so DP compares exact
  *     int64 sums and ties break deterministically (smallest start index,
  *     i.e. the longest final piece).
  *   - Single-character pieces are permanent (SentencePiece's required
  *     character coverage) with +1 smoothing, so every word always has a
  *     segmentation and no ln(0) appears.
  *
  * 100 TB shape (the [[Bpe]] contract): the corpus collapses to the
  * UNIQUE-WORD frequency table in ONE shuffle; seeding is a bounded
  * substring aggregation over that table; each EM round is one row-local
  * Viterbi map (vocabulary rides as a broadcast of ≤ seedMulti+|alphabet|
  * entries) plus one vocabulary-bounded count aggregate collected to the
  * driver. Nothing corpus-sized ever reaches the driver.
  *
  * The q_unigram_train / q_unigram_encode DuckDB oracles replay EVERYTHING
  * bit-for-bit: the seed substring counts, the top-`seedMulti` selection,
  * the micro-nat scores, and every EM round's per-word DP (a recursive CTE
  * carrying the dp/backpointer lists, argmax packed into one int64 so
  * MAX() is the deterministic tie-broken selection).
  */
object Unigram {

  /** Micro-nat quantum ([[LangModel.Quant]] discipline). */
  val Quant = 1e6

  /** Max piece length considered (seed substrings and DP window). */
  val DefaultPieceLen = 4

  /** Multi-character seed pieces kept (top by count, ties by piece). */
  val DefaultSeedMulti = 40

  /** Viterbi-EM rounds. */
  val DefaultRounds = 2

  /** Final (piece → micro-nat score) table from (piece, cnt) rows. */
  private def mkScores(vocab: Seq[(String, Long)]): Map[String, Long] = {
    val total = vocab.map(_._2).sum
    vocab.map { case (p, c) =>
      // HALF_UP (away from zero), matching the DuckDB round() and the
      // LangModel quantization discipline — math.round would round a
      // negative half-tie toward +infinity instead
      p -> java.math.BigDecimal
        .valueOf(1e6 * math.log(c.toDouble / total.toDouble))
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    }.toMap
  }

  /** Viterbi segmentation of one word under integer micro-nat scores.
    * dp(i) = max over j ∈ [i−pieceLen, i) with word[j..i) ∈ vocab of
    * dp(j) + s(piece); ties keep the SMALLEST j (scanned ascending,
    * strict improvement) — the oracle's packed-argmax order. */
  def viterbi(word: String, scores: Map[String, Long],
              pieceLen: Int = DefaultPieceLen): Seq[String] = {
    val L = word.length
    require(L < 1000, s"word too long for the tokenizer DP: $L chars")
    if (L == 0) return Seq.empty
    val NegInf = Long.MinValue / 4
    val dp = Array.fill(L + 1)(NegInf)
    val bp = new Array[Int](L + 1)
    dp(0) = 0L
    var i = 1
    while (i <= L) {
      var bestV = NegInf; var bestJ = -1
      var j = math.max(0, i - pieceLen)
      while (j < i) {
        if (dp(j) > NegInf) scores.get(word.substring(j, i)).foreach { s =>
          val v = dp(j) + s
          if (v > bestV) { bestV = v; bestJ = j }
        }
        j += 1
      }
      require(bestJ >= 0,
        s"no vocabulary piece covers position $i of '$word' — single " +
          "characters must stay in the vocabulary")
      dp(i) = bestV; bp(i) = bestJ
      i += 1
    }
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var p = L
    while (p > 0) { val j = bp(p); word.substring(j, p) +=: out; p = j }
    out.toList
  }

  /** All substring occurrences (length 1..pieceLen) of the unique-word
    * table, weighted by word count — the seed statistic (SentencePiece
    * seeds from suffix-array substrings; this is the same count over the
    * bounded-length window). */
  def seedCounts(words: DataFrame, pieceLen: Int = DefaultPieceLen): DataFrame = {
    val subs = udf { w: String =>
      for {
        i <- 0 until w.length
        l <- 1 to math.min(pieceLen, w.length - i)
      } yield w.substring(i, i + l)
    }
    words.select(explode(subs(col("word"))).as("piece"), col("cnt"))
      .groupBy("piece").agg(sum(col("cnt")).as("cnt"))
  }

  /** Fitted tokenizer: final (piece, cnt, score_u6) rows. */
  final case class Fit(vocab: Seq[(String, Long)]) {
    lazy val scores: Map[String, Long] = mkScores(vocab)
  }

  /** Train over a text column. Returns the fit; see [[trainTable]] for the
    * gate-query DataFrame form. */
  def train(df: DataFrame, textCol: String,
            seedMulti: Int = DefaultSeedMulti,
            rounds: Int = DefaultRounds,
            pieceLen: Int = DefaultPieceLen): Fit = {
    val words = Bpe.wordCounts(df, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try trainFromWordCounts(words, seedMulti, rounds, pieceLen)
    finally words.unpersist()
  }

  /** [[train]] over a precomputed (word, cnt) table — callers that already
    * hold the unique-word table (or train several tokenizer families on
    * the same corpus, q_tok_compare) skip the corpus scan + shuffle. The
    * caller owns `words`' persistence (seeding + every EM round re-reads
    * it). */
  def trainFromWordCounts(words: DataFrame,
            seedMulti: Int = DefaultSeedMulti,
            rounds: Int = DefaultRounds,
            pieceLen: Int = DefaultPieceLen): Fit = {
    require(rounds >= 0 && seedMulti >= 0 && pieceLen >= 1)
    val spark = words.sparkSession
    locally {
      val seeds = seedCounts(words, pieceLen)
      // chars: every length-1 substring, kept permanently; multi: the top
      // seedMulti by (cnt desc, piece asc) — a total order, so the seed
      // vocabulary is a pure function of the corpus
      val chars = seeds.filter(length(col("piece")) === 1)
        .orderBy(col("piece")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      val multi0 = seeds.filter(length(col("piece")) > 1)
        .orderBy(col("cnt").desc, col("piece")).limit(seedMulti).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      var vocab: Seq[(String, Long)] = chars ++ multi0
      var multiSet: Set[String] = multi0.map(_._1).toSet
      var r = 0
      while (r < rounds) {
        val sc = spark.sparkContext.broadcast(mkScores(vocab))
        val segUdf = udf { w: String => viterbi(w, sc.value, pieceLen) }
        val counts = words
          .select(explode(segUdf(col("word"))).as("piece"), col("cnt"))
          .groupBy("piece").agg(sum(col("cnt")).as("cnt"))
          .collect().map(rr => rr.getString(0) -> rr.getLong(1)).toMap
        // M-step + prune: chars stay with +1 smoothing; multi pieces the
        // decoder used keep their new counts, unused ones fall out
        vocab = chars.map { case (c, _) => (c, counts.getOrElse(c, 0L) + 1L) } ++
          multiSet.toSeq.sorted.flatMap(p => counts.get(p).map(p -> _))
        multiSet = vocab.collect { case (p, _) if p.length > 1 => p }.toSet
        r += 1
      }
      Fit(vocab)
    }
  }

  /** Gate form: final vocabulary as (piece, cnt, score_u6). */
  def trainTable(df: DataFrame, textCol: String,
                 seedMulti: Int = DefaultSeedMulti,
                 rounds: Int = DefaultRounds,
                 pieceLen: Int = DefaultPieceLen): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fit = train(df, textCol, seedMulti, rounds, pieceLen)
    fit.vocab.map { case (p, c) => (p, c, fit.scores(p)) }
      .toDF("piece", "cnt", "score_u6")
  }

  /** Tokenize a text column with a learned fit: array<string> of pieces,
    * words segmented independently in order (the [[Bpe.tokenizeColumn]]
    * contract — the bounded vocabulary rides the task closure). Null or
    * empty text yields an empty array. */
  def tokenizeColumn(text: org.apache.spark.sql.Column, fit: Fit,
                     pieceLen: Int = DefaultPieceLen): org.apache.spark.sql.Column = {
    val scores = fit.scores
    val f = udf { words: Seq[String] =>
      if (words == null) Seq.empty[String]
      else words.flatMap(w => viterbi(w, scores, pieceLen))
    }
    f(filter(split(trim(text), "\\s+"), w => length(w) > 0))
  }

  /** Segment every unique word of a corpus under a fit: (word, cnt,
    * n_pieces, seg) with pieces 0x1F-joined — the encode gate. */
  def encodeWords(df: DataFrame, textCol: String, fit: Fit,
                  pieceLen: Int = DefaultPieceLen): DataFrame = {
    val spark = df.sparkSession
    val sc = spark.sparkContext.broadcast(fit.scores)
    val segUdf = udf { w: String =>
      val ps = viterbi(w, sc.value, pieceLen)
      (ps.length, ps.mkString("\u001f"))
    }
    Bpe.wordCounts(df, textCol)
      .select(col("word"), col("cnt"), segUdf(col("word")).as("s"))
      .select(col("word"), col("cnt"),
        col("s._1").cast("long").as("n_pieces"), col("s._2").as("seg"))
  }
}
