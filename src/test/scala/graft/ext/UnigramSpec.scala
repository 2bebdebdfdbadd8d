package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Gate for [[Unigram]] — Viterbi DP goldens, EM behavior (likelihood
  * non-decreasing under the Viterbi criterion, pruning of unused pieces,
  * char coverage), determinism, and the train/encode agreement. */
class UnigramSpec extends SparkTestBase {

  import spark.implicits._

  test("viterbi picks the max-score segmentation (hand-computed lattice)") {
    // word "abab": pieces a:-3, b:-3, ab:-4, ba:-10, abab:-9 (micro-nats
    // scaled down for readability — integers are integers)
    val s = Map("a" -> -3L, "b" -> -3L, "ab" -> -4L, "ba" -> -10L,
      "abab" -> -9L)
    // candidates: abab=-9; ab+ab=-8; a+b+ab=-10 ... best is abab? -9 vs
    // ab|ab = -8 → ab|ab wins
    assert(Unigram.viterbi("abab", s) == Seq("ab", "ab"))
    // make the whole-word piece win
    val s2 = s + ("abab" -> -7L)
    assert(Unigram.viterbi("abab", s2) == Seq("abab"))
  }

  test("viterbi tie-break: equal scores prefer the smaller start (longer last piece)") {
    // "aa" with a:-5, aa:-10: a|a = -10 == aa = -10 → tie; smallest j for
    // the final position is j=0 → the single "aa" piece
    val s = Map("a" -> -5L, "aa" -> -10L)
    assert(Unigram.viterbi("aa", s) == Seq("aa"))
  }

  test("viterbi respects the piece-length window and char fallback") {
    val s = Map("a" -> -1L, "b" -> -1L, "abcde" -> -1L, "c" -> -1L,
      "d" -> -1L, "e" -> -1L)
    // pieceLen=4 forbids the 5-char piece even though it scores best
    assert(Unigram.viterbi("abcde", s, pieceLen = 4) ==
      Seq("a", "b", "c", "d", "e"))
    val e = intercept[IllegalArgumentException](
      Unigram.viterbi("axb", Map("a" -> -1L, "b" -> -1L)))
    assert(e.getMessage.contains("single characters"))
  }

  test("seed counts: every bounded substring occurrence, word-weighted") {
    val words = Seq(("abab", 3L), ("ab", 2L)).toDF("word", "cnt")
    val m = Unigram.seedCounts(words, pieceLen = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'a': 2 occurrences in abab ×3 + 1 in ab ×2 = 8; 'ab': 2×3 + 1×2 = 8;
    // 'ba': 1×3 = 3; 'b' same as 'a'
    assert(m == Map("a" -> 8L, "b" -> 8L, "ab" -> 8L, "ba" -> 3L))
  }

  test("EM: unused multi-char pieces are pruned, chars survive smoothed") {
    val df = Seq.fill(50)("xy xy zw").toDF("text")
    val fit = Unigram.train(df, "text", seedMulti = 10, rounds = 2,
      pieceLen = 2)
    val pieces = fit.vocab.map(_._1).toSet
    // both bigrams dominate their words; chars stay (smoothed) even when
    // the decoder never emits them
    assert(pieces.contains("xy") && pieces.contains("zw"))
    assert(Set("x", "y", "z", "w").subsetOf(pieces))
    val cnt = fit.vocab.toMap
    assert(cnt("xy") == 100L && cnt("zw") == 50L)
    assert(cnt("x") == 1L, "unused char keeps only the +1 smoothing")
  }

  test("Viterbi-EM total corpus score is non-decreasing across rounds") {
    val df = t("documents").select(col("text"))
    def corpusScore(rounds: Int): BigInt = {
      val fit = Unigram.train(df, "text", rounds = rounds)
      val words = Bpe.wordCounts(df, "text").collect()
      words.map { r =>
        val w = r.getString(0); val c = r.getLong(1)
        val pieces = Unigram.viterbi(w, fit.scores)
        BigInt(c) * pieces.map(fit.scores).sum
      }.sum
    }
    // each E-step re-segments optimally under the re-estimated (and
    // pruned) model; the Viterbi criterion should not collapse
    val s1 = corpusScore(1); val s2 = corpusScore(2)
    assert(s2 >= s1 - BigInt(1000000L),
      s"round-2 corpus score $s2 collapsed vs round-1 $s1")
  }

  test("trainFromWordCounts over a shared word table == train over the corpus") {
    // round 22: q_tok_compare shares ONE wordCounts table between the BPE
    // and unigram trainers; the fit must be a pure function of that table
    val docs = Seq("abab baba", "abab cc", "cc cc abab")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val viaDf = Unigram.train(docs, "text", seedMulti = 6, rounds = 2)
    val wc = Bpe.wordCounts(docs, "text").persist()
    val viaWc = Unigram.trainFromWordCounts(wc, seedMulti = 6, rounds = 2)
    wc.unpersist()
    assert(viaWc.vocab == viaDf.vocab)
  }

  test("train is deterministic and partition-invariant") {
    val df = t("documents").select(col("text"))
    val a = Unigram.trainTable(df, "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Unigram.trainTable(df.repartition(16), "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("encode agrees with the training segmentation and covers every word") {
    val df = t("documents").select(col("text"))
    val fit = Unigram.train(df, "text")
    val enc = Unigram.encodeWords(df, "text", fit).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val w = r.getString(0)
      val seg = r.getString(3).split('\u001f').toSeq
      assert(seg.mkString("") == w, s"segmentation must rebuild '$w'")
      assert(seg == Unigram.viterbi(w, fit.scores))
      assert(r.getLong(2) == seg.length)
    }
  }

  test("spec ops: tokenizer artifact round-trips the store; tokenize composes") {
    import graft.spec._
    val r = new graft.runner.LocalSparkRunner(spark,
      java.nio.file.Files.createTempDirectory("unistore").toString)
    val ds = r.fromParquet("/root/testdata/sf0.001/documents.parquet")
    val text = SelectTextColumnOp(ds, "text")
    val tok = TrainUnigramTokenizerOp(text, seedMulti = 10L, rounds = 1L,
      pieceLen = 3L)
    val pieces = UnigramTokenizeOp(tok, text)
    // serde round-trip preserves identity
    val Seq(back) = Graph.deserialize(Graph.serialize(pieces))
    assert(back == pieces && back.uuid == pieces.uuid)
    val out = r.toFrame(pieces).collect()
    assert(out.nonEmpty)
    // a SECOND runner over the same store reuses the artifact and agrees
    val r2 = new graft.runner.LocalSparkRunner(spark, r.storeUri)
    val again = r2.toFrame(pieces).collect()
    assert(out.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq)
    // rebuilt text: pieces of each word concatenate back to the word
    val fitDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val words = Bpe.wordCounts(fitDf.select(col("text")), "text")
      .collect().map(_.getString(0)).toSet
    out.foreach { row =>
      val seq = row.getSeq[String](1)
      if (seq.nonEmpty) {
        // piece stream must be partitioned into the document's words
        val joined = seq.mkString("")
        assert(words.exists(w => joined.startsWith(w)),
          s"piece stream '${joined.take(30)}' must start at a word boundary")
      }
    }
  }

  private def t(name: String) =
    spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")
}
