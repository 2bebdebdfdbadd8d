package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Corpus curation operators: contamination, segment dedup, PII redaction,
  * Gopher rules, stratified sampling — hand-computed goldens throughout.
  */
class CorpusSpec extends SparkTestBase {

  import spark.implicits._

  test("wordNgrams: order, joining, short-text empties") {
    val df = Seq((0L, "a b c d"), (1L, "a b"), (2L, ""), (3L, "  x  y  z "))
      .toDF("id", "text")
    val got = df.select($"id", Corpus.wordNgrams($"text", 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(0L) == Seq("a b c", "b c d"))
    assert(got(1L) == Seq.empty) // fewer than n words
    assert(got(2L) == Seq.empty)
    assert(got(3L) == Seq("x y z")) // trim + run-collapsing split
  }

  test("words: tab/newline-edged text yields no empty tokens") {
    // Spark's trim strips only spaces; split keeps edge empties — both
    // must be invisible to callers (the DuckDB oracles list_filter them)
    val df = Seq((0L, "\ta b\t"), (1L, "\n x \n"), (2L, ""), (3L, " \t\n "))
      .toDF("id", "text")
    val got = df.select($"id", Corpus.words($"text").as("w"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(0L) == Seq("a", "b"))
    assert(got(1L) == Seq("x"))
    assert(got(2L) == Seq.empty)
    assert(got(3L) == Seq.empty)
  }

  test("contamination: distinct-gram counting, threshold, clean docs zero") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val train = Seq(
      (0L, "alpha beta gamma delta epsilon"), // grams "alpha beta","beta gamma","gamma delta" shared
      (1L, "zeta eta theta"),                 // clean
      (2L, "alpha beta alpha beta gamma"))    // "alpha beta" twice but counted once; "beta gamma" once
      .toDF("doc_id", "text")
    val got = Corpus.contamination(train, bench, "text", "doc_id", n = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((0L, 3L, true), (1L, 0L, false), (2L, 2L, true)))
    val strict = Corpus.contamination(train, bench, "text", "doc_id",
        n = 2, minOverlap = 3L)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    assert(strict.map(_._3) == Seq(true, false, false))
  }

  test("contamination: shuffle-join fallback agrees with broadcast") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val train = Seq((0L, "alpha beta gamma"), (1L, "zeta eta"))
      .toDF("doc_id", "text")
    val a = Corpus.contamination(train, bench, "text", "doc_id", n = 2)
      .orderBy("doc_id").collect().toSeq
    val b = Corpus.contamination(train, bench, "text", "doc_id", n = 2,
      broadcastBench = false).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("packSequences: offsets, sequence ranges, zero-token docs") {
    // tokens: 3, 0, 5, 4 → offsets 0, 3, 3, 8; seqLen=4 →
    // doc0 spans seq 0 (tokens 0-2), doc2 spans seqs 0-1 (tokens 3-7),
    // doc3 spans seqs 2-2 (tokens 8-11); doc1 empty
    val docs = Seq(
      (0L, "a b c"), (1L, ""), (2L, "d e f g h"), (3L, "i j k l"))
      .toDF("doc_id", "text")
    val got = Corpus.packSequences(docs, "doc_id",
        size(Corpus.words($"text")), seqLen = 4L,
        graft.ops.ColumnOps.rangeBucket(docs, $"doc_id", 4.0))
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "token_offset", "first_seq", "last_seq",
        "n_seqs")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      (0L, 3L, 0L, 0L, 0L, 1L),
      (1L, 0L, 3L, -1L, -1L, 0L),
      (2L, 5L, 3L, 0L, 1L, 2L),
      (3L, 4L, 8L, 2L, 2L, 1L)))
  }

  test("packSequences: offsets invariant to bucket count / partition layout") {
    val docs = (0L until 200L).map(i => (i, ("w " * (i % 7).toInt).trim))
      .toDF("doc_id", "text").repartition(13)
    def run(buckets: Double) = Corpus.packSequences(docs, "doc_id",
        size(Corpus.words($"text")), seqLen = 8L,
        graft.ops.ColumnOps.rangeBucket(docs, $"doc_id", buckets))
      .orderBy("doc_id").collect().toSeq
    assert(run(200.0) == run(3.0))
  }

  test("mixtureSample: exact floor counts per stratum, default frac") {
    val docs = (0L until 100L).map(i =>
      (i, if (i < 40) "en" else if (i < 70) "zh" else "de"))
      .toDF("doc_id", "lang")
    val got = Corpus.mixtureSample(docs, "lang", "doc_id",
        fracs = Map("en" -> 0.5, "zh" -> 1.0), defaultFrac = 0.25)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(got == Map("en" -> 20L, "zh" -> 30L, "de" -> 7L))
    // deterministic: same seed → identical rows
    val a = Corpus.mixtureSample(docs, "lang", "doc_id",
      Map("en" -> 0.5), defaultFrac = 0.1).orderBy("doc_id").collect().toSeq
    val b = Corpus.mixtureSample(docs, "lang", "doc_id",
      Map("en" -> 0.5), defaultFrac = 0.1).orderBy("doc_id").collect().toSeq
    assert(a == b)
    // frac 0 default drops unlisted strata entirely
    val onlyEn = Corpus.mixtureSample(docs, "lang", "doc_id",
      Map("en" -> 1.0)).select("lang").distinct().as[String].collect().toSeq
    assert(onlyEn == Seq("en"))
  }

  test("repetitionSignals: dup lines and top 2-gram run counting") {
    val docs = Seq(
      (0L, "a b\na b\nc d"),        // 3 lines, 1 dup; grams: "a b","b a"? no — per line? grams run over the WHOLE text
      (1L, "x y x y x y"),          // grams: x y, y x, x y, y x, x y → top "x y" ×3 of 5
      (2L, ""),                     // empty
      (3L, "unique words only here"))
      .toDF("doc_id", "text")
    val sig = Corpus.repetitionSignals($"text")
    val got = docs.select($"doc_id" +: sig.map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // doc0: lines [a b, a b, c d] → 3 lines, dup 1/3; text "a b\na b\nc d"
    //   words a,b,a,b,c,d → 2-grams: ab,ba,ab,bc,cd → top "a b" ×2
    assert(got(0) == (0L, 3L, 1.0 / 3, 2L))
    assert(got(1)._2 == 1L && got(1)._3 == 0.0 && got(1)._4 == 3L)
    assert(got(2) == (2L, 0L, 0.0, 0L))
    assert(got(3)._4 == 1L)
  }

  test("dedupSegments: first occurrence wins, order kept, rows never dropped") {
    // k=2 segments: doc0 = [a b][c d]; doc1 = [c d][e f] (c d repeated);
    // doc2 = [a b][c d] (everything repeated → empty); doc3 odd tail [g]
    val docs = Seq(
      (0L, "a b c d"),
      (1L, "c d e f"),
      (2L, "a b c d"),
      (3L, "g"))
      .toDF("doc_id", "text")
    val got = Corpus.dedupSegments(docs, "text", "doc_id", k = 2)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, "a b c d"),
      (1L, "e f"),
      (2L, ""),
      (3L, "g")))
  }

  test("dedupSegments: within-doc repetition collapses to first") {
    val docs = Seq((0L, "x y x y x y")).toDF("doc_id", "text")
    val got = Corpus.dedupSegments(docs, "text", "doc_id", k = 2)
      .as[(Long, String)].collect().head
    assert(got == (0L -> "x y"))
  }

  test("redactPII: email, ip, phone; ordering prevents half-eaten IPs") {
    val df = Seq(
      (0L, "write to alice.smith+x@mail.example.org today"),
      (1L, "server at 192.168.0.1 port 80"),
      (2L, "call +1-555-0199 now"),
      (3L, "mixed bob@x.io 10.0.0.7 +44-20-7946-0958"),
      (4L, "clean text, no pii at all"))
      .toDF("id", "text")
    val got = df.select($"id", Corpus.redactPII($"text").as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(0L) == "write to <EMAIL> today")
    assert(got(1L) == "server at <IP> port 80")
    assert(got(2L) == "call <PHONE> now")
    assert(got(3L) == "mixed <EMAIL> <IP> <PHONE>")
    assert(got(4L) == "clean text, no pii at all")
  }

  test("gopherRules: each rule flips independently; keep is the conjunction") {
    val df = Seq(
      (0L, "the quick brown fox jumps over a lazy dog again"), // all pass
      (1L, "the fox"),                                          // word count
      (2L, "the aa bb cc dd ee ff gg hh ii"),                   // mean len < 3
      (3L, "the the the the the the the the the the"),          // unique frac
      (4L, "quick brown fox jumps over lazy dog runs far fast")) // no stopword
      .toDF("id", "text")
    val cols = Corpus.gopherRules($"text", minWords = 5, maxWords = 20,
      minMeanWordLen = 2.5, maxMeanWordLen = 10.0, minUniqueFrac = 0.5)
    val out = df.select($"id" +: cols.map { case (n, c) => c.as(n) }: _*)
      .orderBy("id").collect()
    def b(r: org.apache.spark.sql.Row, n: String) =
      r.getBoolean(r.fieldIndex(n))
    assert(b(out(0), "keep"))
    assert(!b(out(1), "ok_word_count") && !b(out(1), "keep"))
    assert(!b(out(2), "ok_mean_word_len") && !b(out(2), "keep"))
    assert(!b(out(3), "ok_unique_frac") && !b(out(3), "keep"))
    assert(!b(out(4), "ok_stopword") && !b(out(4), "keep"))
    // golden arithmetic: doc0 has 10 words, 38 letters → mean 3.8
    val r0 = out(0)
    assert(r0.getLong(r0.fieldIndex("n_words")) == 10L)
    assert(math.abs(r0.getDouble(r0.fieldIndex("mean_word_len")) - 3.8) < 1e-9)
  }

  test("stratifiedSample: exact floor(frac*n) per stratum, deterministic") {
    val df = (0L until 100L).map(i => (i, if (i < 60) "en" else "fr"))
      .toDF("id", "lang")
    val s1 = Corpus.stratifiedSample(df, "lang", "id", frac = 0.25)
    val counts = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("en" -> 15L, "fr" -> 10L)) // floor(0.25*60), floor(0.25*40)
    // deterministic: same call → same ids
    val s2 = Corpus.stratifiedSample(df, "lang", "id", frac = 0.25)
    assert(s1.orderBy("id").collect().toSeq == s2.orderBy("id").collect().toSeq)
    // different salt → (almost surely) different selection, same counts
    val s3 = Corpus.stratifiedSample(df, "lang", "id", frac = 0.25, salt = "other")
    assert(s3.count() == 25L)
    assert(s3.orderBy("id").collect().toSeq != s1.orderBy("id").collect().toSeq)
    // frac edge cases
    assert(Corpus.stratifiedSample(df, "lang", "id", 0.0).count() == 0L)
    assert(Corpus.stratifiedSample(df, "lang", "id", 1.0).count() == 100L)
  }

  test("temperatureSample: hand-checked quotas, α=1 identity, α=0 uniform") {
    // 16 'a' rows vs 4 'b' rows: at α=0.5, frac=1 → T=20, wq=(4e6, 2e6),
    // W=6e6 → quota_a = min(16, ⌊20·4e6/6e6⌋=13) = 13, quota_b = min(4, 6)
    // = 4: the high-resource stratum trims, the small one keeps everything
    val df = (0L until 20L).map(i => (i, if (i < 16) "a" else "b"))
      .toDF("id", "lang")
    val s = Corpus.temperatureSample(df, "lang", "id", alpha = 0.5, frac = 1.0)
    val counts = s.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(counts == Map("a" -> 13L, "b" -> 4L))
    // α=1, frac=1: quotas equal stratum sizes — the identity sample
    assert(Corpus.temperatureSample(df, "lang", "id", alpha = 1.0).count() == 20L)
    // α=0: uniform weights — T·(1/2) each, capped at the stratum size
    val u = Corpus.temperatureSample(df, "lang", "id", alpha = 0.0, frac = 1.0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(u == Map("a" -> 10L, "b" -> 4L))
    // deterministic, and the kept rows are each stratum's md5-rank smallest
    // (same machinery as stratifiedSample — cross-checked at matched count)
    val s2 = Corpus.temperatureSample(df, "lang", "id", alpha = 0.5, frac = 1.0)
    assert(s.orderBy("id").collect().toSeq == s2.orderBy("id").collect().toSeq)
    val bRows = s.filter(col("lang") === "b").select("id").as[Long].collect().toSet
    val bAll = Corpus.stratifiedSample(df.filter(col("lang") === "b"),
      "lang", "id", frac = 1.0).select("id").as[Long].collect().toSet
    assert(bRows == bAll)
  }

  test("mega-stratum two-phase rank samples the identical rows") {
    // one dominant stratum (the regime the subBuckets switch exists for)
    // plus a small one; the two-phase rank must pick EXACTLY the same rows
    // as the per-stratum window — same md5 total order, different plan
    val df = (0L until 500L).map(i => (i, if (i < 450) "web" else "wiki"))
      .toDF("id", "lang")
    val direct = Corpus.stratifiedSample(df, "lang", "id", frac = 0.3)
      .orderBy("id").collect().toSeq
    val twoPhase = Corpus.stratifiedSample(df, "lang", "id", frac = 0.3,
      subBuckets = 8).orderBy("id").collect().toSeq
    assert(twoPhase == direct)
    // no single-partition window in the two-phase plan: every window spec
    // partitions by (stratum, sub-bucket), so a mega-stratum spreads
    val plan = Corpus.stratifiedSample(df, "lang", "id", frac = 0.3,
      subBuckets = 8).queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty &&
      windows.forall(_.partitionSpec.length >= 2),
      s"expected all windows keyed by (stratum, sub-bucket): " +
        windows.map(_.partitionSpec.length).mkString(","))
    // mixtureSample goes through the same core
    val mixDirect = Corpus.mixtureSample(df, "lang", "id",
      Map("web" -> 0.1, "wiki" -> 0.9)).orderBy("id").collect().toSeq
    val mixTwoPhase = Corpus.mixtureSample(df, "lang", "id",
      Map("web" -> 0.1, "wiki" -> 0.9), subBuckets = 8)
      .orderBy("id").collect().toSeq
    assert(mixTwoPhase == mixDirect)
  }

  test("dedupSpans: copied passage drops at ANY alignment, first stays") {
    // doc 0: original; doc 1: the same 10 words behind a 3-word prefix —
    // stride-k segments would miss this alignment, sliding windows don't
    val passage = (0 until 10).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (0L, passage),
      (1L, s"pre1 pre2 pre3 $passage"),
      (2L, "totally different words avoiding any shared window here"))
      .toDF("doc_id", "text")
    val out = Corpus.dedupSpans(docs, "text", "doc_id", k = 4)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) === passage, "first occurrence untouched")
    assert(out(0).getLong(2) === 0L)
    assert(out(1).getString(1) === "pre1 pre2 pre3",
      "only the copied suffix drops")
    assert(out(1).getLong(2) === 10L)
    assert(out(2).getLong(2) === 0L)
  }

  test("dedupSpans: within-doc repetition keeps the first copy only") {
    val docs = Seq((7L, "a1 a2 a3 a4 x y a1 a2 a3 a4")).toDF("doc_id", "text")
    val out = Corpus.dedupSpans(docs, "text", "doc_id", k = 4).collect()(0)
    assert(out.getString(1) === "a1 a2 a3 a4 x y")
    assert(out.getLong(2) === 4L)
  }

  test("dedupSpans: docs shorter than k pass through normalized") {
    val docs = Seq((1L, " a  b "), (2L, "")).toDF("doc_id", "text")
    val out = Corpus.dedupSpans(docs, "text", "doc_id", k = 4)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) === "a b" && out(0).getLong(2) === 0L)
    assert(out(1).getString(1) === "" && out(1).getLong(2) === 0L)
  }

  test("dedupSpans: merge-scan reassembly ≡ per-token exists form " +
    "(adversarial shapes)") {
    // The O(tokens + starts) two-pointer reassembly replaced the
    // O(tokens × duplicate-starts) expression filter (VERDICT r13 — a
    // fully-duplicated long doc made it O(tokens²) inside ONE row). Pin
    // bit-equality on the shapes that stress the pointer logic: a long doc
    // that is entirely duplicated windows (starts ≈ tokens, one merged
    // interval), scattered non-adjacent spans (many disjoint intervals),
    // overlapping plants at every alignment, and seeded random corpora.
    val k = 4
    val rnd = new scala.util.Random(41)
    val vocab = (0 until 12).map(i => s"w$i")
    val randDoc = (len: Int) =>
      Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val base = (0 until 40).map(i => s"b$i").mkString(" ")
    val docs = (Seq(
      (0L, base),
      (1L, base), // full copy: every window duplicated, starts ≈ tokens
      (2L, s"u1 u2 u3 $base u4 u5"), // shifted full copy inside filler
      (3L, (0 until 40).map(i => s"b${i / 2 * 2}").mkString(" ")), // self-repeats
      (4L, "")) ++
      (5L until 25L).map(i => (i, randDoc(30 + rnd.nextInt(40)))))
      .toDF("doc_id", "text")
    val got = Corpus.dedupSpans(docs, "text", "doc_id", k)
      .orderBy("doc_id").collect().toSeq
    // independent reimplementation: the pre-r14 expression form, verbatim
    val winHashes = Corpus.bindArray(Corpus.words(col("text"))) { ws =>
      when(size(ws) < k, array().cast("array<bigint>"))
        .otherwise(transform(sequence(lit(0), size(ws) - k),
          i => xxhash64(slice(ws, i + 1, lit(k)))))
    }
    val occ = docs.select(col("doc_id"), posexplode(winHashes).as(Seq("__pos", "__h")))
    val firstOcc = occ.groupBy(col("__h"))
      .agg(min(struct(col("doc_id"), col("__pos"))).as("__first"))
    val dupStarts = occ.join(firstOcc, Seq("__h"))
      .filter(col("__first") =!= struct(col("doc_id"), col("__pos")))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("__pos"))).as("__starts"))
    val want = docs.join(dupStarts, Seq("doc_id"), "left")
      .select(col("doc_id"), Corpus.bindArray(Corpus.words(col("text"))) { ws =>
        val kept = when(col("__starts").isNull, ws)
          .otherwise(filter(ws, (_, p) =>
            !exists(col("__starts"), s => s <= p && p < s + k)))
        struct(concat_ws(" ", kept).as("dedup_text"),
          (size(ws) - size(kept)).cast("long").as("n_dropped_tokens"))
      }.as("__o"))
      .select(col("doc_id"), col("__o.dedup_text"), col("__o.n_dropped_tokens"))
      .orderBy("doc_id").collect().toSeq
    assert(got == want)
    // and the targeted shapes really exercised what they claim
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(1) === "" && byId(1L).getLong(2) === 40L,
      "full copy drops entirely")
    assert(byId(2L).getString(1) === "u1 u2 u3 u4 u5",
      "shifted copy drops, filler survives")
  }

  test("tokenBudgetKeep: prefix semantics, boundary fill, per-group budgets") {
    // group A priority order (prio desc, id): a1(40) a2(35) a3(30) a4(25);
    // tokens 500, 400, 150, 10 — budget 1050: a1 cum 500 keep, a2 cum 900
    // keep, a3 cum 1050 keep (EXACT fill kept), a4 cum 1060 drop — and a4
    // is NOT backfilled even though 10 tokens "would fit" after dropping
    // nothing (prefix, not knapsack). group B fits entirely.
    val df = Seq(
      (1L, "A", 40.0, 500L), (2L, "A", 35.0, 400L),
      (3L, "A", 30.0, 150L), (4L, "A", 25.0, 10L),
      (5L, "B", 9.0, 600L), (6L, "B", 8.0, 400L))
      .toDF("id", "g", "prio", "tok")
    val out = Corpus.tokenBudgetKeep(df, "g", "id", "prio", "tok", 1050L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, 500L, true), (2L, 900L, true), (3L, 1050L, true),
      (4L, 1060L, false), (5L, 600L, true), (6L, 1000L, true)))
    val kept = Corpus.tokenBudgetSelect(df, "g", "id", "prio", "tok", 1050L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 2L, 3L, 5L, 6L))
  }

  test("tokenBudgetKeep: priority ties break by id; null priorities sort last") {
    val df = Seq(
      (10L, "A", Some(5.0), 60L), (11L, "A", Some(5.0), 60L),
      (12L, "A", None: Option[Double], 1L))
      .toDF("id", "g", "prio", "tok")
    val out = Corpus.tokenBudgetKeep(df, "g", "id", "prio", "tok", 100L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getBoolean(5)))
    // id 10 first (tie-break), cum 60 keep; id 11 cum 120 drop; the null-
    // priority row sorts LAST (cum 121) and cannot displace scored rows
    assert(out.toSeq == Seq((10L, true), (11L, false), (12L, false)))
  }

  test("tokenBudgetKeep: mega-group two-phase form equals the window form") {
    // includes a NULL group (g = None) — a real group in the window form,
    // so the two-phase offset fold-back must null-safe-match it too
    val rng = new scala.util.Random(41)
    val df = (0 until 500).map(i => (i.toLong,
      if (i % 7 == 0) None else Some(s"g${i % 3}"),
      rng.nextDouble() * 100, (rng.nextInt(50) + 1).toLong))
      .toDF("id", "g", "prio", "tok")
    val a = Corpus.tokenBudgetKeep(df, "g", "id", "prio", "tok", 1000L)
      .select("id", "cum_tokens", "keep").orderBy("id").collect().map(_.toSeq)
    val b = Corpus.tokenBudgetKeep(df, "g", "id", "prio", "tok", 1000L,
        subBuckets = 4)
      .select("id", "cum_tokens", "keep").orderBy("id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
    assert(a.exists(r => r(2) == false) && a.exists(r => r(2) == true))
  }

  test("chunkWords: window math, short/empty/null docs, overlap coverage") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 words
      (2L, "a b c"),                                  // n <= overlap → 1 chunk
      (3L, ""),                                       // empty → no rows
      (4L, null.asInstanceOf[String]),                // null → no rows
      (5L, (1 to 4).map(i => s"x$i").mkString(" "))   // n == size → 1 chunk
    ).toDF("id", "text")
    val out = Corpus.chunkWords(docs, "id", "text", size = 4, overlap = 3)
      .as[(Long, Long, String, Long)].collect().toSeq.sorted
    // doc 1: stride 1 → ceil((10-3)/1)=7 chunks, windows of 4 (last 3
    // shorter), every consecutive pair overlaps by 3
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2) == (0L until 7L))
    assert(d1.head._3 == "w1 w2 w3 w4" && d1.head._4 == 4L)
    assert(d1.last._3 == "w7 w8 w9 w10" && d1.last._4 == 4L)
    assert(out.filter(_._1 == 2L) == Seq((2L, 0L, "a b c", 3L)))
    assert(!out.exists(r => r._1 == 3L || r._1 == 4L))
    assert(out.filter(_._1 == 5L) == Seq((5L, 0L, "x1 x2 x3 x4", 4L)))
    // stride-2 coverage: concatenating each chunk's NEW words (last
    // stride of each window plus chunk 0's full window) rebuilds the doc
    val s2 = Corpus.chunkWords(docs.filter(col("id") === 1L), "id", "text",
        size = 4, overlap = 2)
      .orderBy("chunk_idx").as[(Long, Long, String, Long)].collect()
    val rebuilt = s2.head._3.split(" ").toSeq ++
      s2.tail.toSeq.flatMap(c => c._3.split(" ").drop(2).toSeq)
    assert(rebuilt == (1 to 10).map(i => s"w$i"))
  }

  test("dropDuplicatedLines: verdicts, rebuild order, empty/null docs") {
    val boiler = "COOKIE BANNER"
    val docs = Seq(
      (1L, s"alpha\n$boiler\nbeta"),
      (2L, s"$boiler\ngamma\n\ndelta"),     // empty line is structural
      (3L, s"$boiler\n $boiler "),          // all lines boilerplate (trimmed)
      (4L, ""),                             // empty text
      (5L, null.asInstanceOf[String]),      // null text
      (6L, s"epsilon\n$boiler")
    ).toDF("id", "text")
    // boiler occurs 5x (> 2); every other line once
    val out = Corpus.dropDuplicatedLines(docs, "id", "text", maxCopies = 2)
      .as[(Long, String, Long)].collect()
      .map { case (k, v, n) => k -> (v, n) }.toMap
    assert(out(1L) == ("alpha\nbeta", 1L))
    assert(out(2L) == ("gamma\n\ndelta", 1L)) // empty line survives in place
    assert(out(3L) == ("", 2L))               // trimmed match drops both
    assert(out(4L) == ("", 0L))
    assert(out(5L) == ("", 0L))
    assert(out(6L) == ("epsilon", 1L))
    // below the threshold nothing drops
    val loose = Corpus.dropDuplicatedLines(docs, "id", "text", maxCopies = 5)
      .as[(Long, String, Long)].collect()
    assert(loose.forall(_._3 == 0L))
  }

  test("snapshotDiff: added/removed/changed/unchanged incl. null texts") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"),
      (4L, null.asInstanceOf[String]), (5L, null.asInstanceOf[String]),
      (6L, "f")).toDF("id", "text")
    val nw = Seq((1L, "a"),                        // unchanged
      (2L, "B"),                                   // changed
      // 3 removed
      (4L, null.asInstanceOf[String]),             // null == null: unchanged
      (5L, "now-set"),                             // null -> text: changed
      (6L, null.asInstanceOf[String]),             // text -> null: changed
      (7L, "new")).toDF("id", "text")              // added
    val got = Corpus.snapshotDiff(old, nw, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "changed", 6L -> "changed", 7L -> "added"))
  }

  test("epochShards: dense per-shard positions, partition-invariant, epochs decorrelate") {
    val ids = (0L until 400L).toDF("id")
    val out = Corpus.epochShards(ids, "id", epoch = 1L, numShards = 8)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSeq
    // a permutation into shards: every id exactly once, shards in range,
    // positions dense 0..n-1 within each shard
    assert(out.map(_._1).sorted == (0L until 400L))
    assert(out.forall(r => r._2 >= 0 && r._2 < 8))
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (0L until rows.size.toLong)) }
    // pure function of (id set, epoch, numShards): partitioning never
    // changes the layout
    val re = Corpus.epochShards(ids.repartition(13), "id", 1L, 8)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSeq
    assert(out.toSet == re.toSet)
    // a different epoch re-salts: same ids, different order (overlap of
    // the two epochs' (shard, pos) cells is chance-level, not identity)
    val e2 = Corpus.epochShards(ids, "id", 2L, 8)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toSeq
    assert(e2.toSet != out.toSet)
    assert(e2.map(_._1).sorted == (0L until 400L))
  }

  test("groupAwareSplit: whole groups per side, exact count, seeded") {
    import spark.implicits._
    // 10 groups × uneven row counts: the split must be by GROUP, exact
    // ceil(num·G/den) groups test, independent of row multiplicity
    val rows = for (g <- 0 until 10; i <- 0 to g) yield (s"site$g", g * 100 + i)
    val df = rows.toDF("src", "id")
    val out = Corpus.groupAwareSplit(df, "src", 3L, 10L)
    val byGroup = out.collect().map(r => (r.getString(0), r.getBoolean(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSeq).toMap
    assert(byGroup.size == 10)
    assert(byGroup.values.forall(_.length == 1), "a group straddled the split")
    assert(byGroup.count(_._2.head) == 3, "exactly ceil(3·10/10) = 3 test groups")
    // row counts preserved; partition-invariant; seed changes the draw
    assert(out.count() == rows.length)
    val re = Corpus.groupAwareSplit(df.repartition(16), "src", 3L, 10L)
      .collect().map(r => (r.getInt(1), r.getBoolean(2))).sortBy(_._1).toSeq
    assert(re == out.collect().map(r => (r.getInt(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq)
    val other = Corpus.groupAwareSplit(df, "src", 3L, 10L, seed = 7L)
      .select(col("src"), col("is_test")).distinct()
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(other != byGroup.view.mapValues(_.head).toMap,
      "a different seed should redraw the test set")
    // degenerate fractions
    assert(Corpus.groupAwareSplit(df, "src", 0L, 3L)
      .filter(col("is_test")).count() == 0)
    assert(Corpus.groupAwareSplit(df, "src", 3L, 3L)
      .filter(!col("is_test")).count() == 0)
  }

  test("lengthBucketBatches: shapes, pad accounting, beats arrival order") {
    import spark.implicits._
    // lengths 1..200 in shuffled arrival order: bucketing by 16 groups
    // near-equal lengths; arrival-order batches mix 1s with 200s
    val rng = new scala.util.Random(41)
    val rows = rng.shuffle((1 to 200).toList).zipWithIndex
      .map { case (len, i) => (i.toLong, len.toLong) }
    val df = rows.toDF("id", "n")
    val out = Corpus.lengthBucketBatches(df, "id", col("n"),
      bucketWidth = 16L, batchSize = 8)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.length == 200)
    // every doc in its length bucket; batch_max really is the batch max;
    // pad = batch_max − n; positions dense within each batch
    got.foreach { case (_, n, b, _, _, bm, pad) =>
      assert(b == n / 16)
      assert(pad == bm - n && pad >= 0)
    }
    val byBatch = got.groupBy(t => (t._3, t._4))
    byBatch.foreach { case ((_, _), g) =>
      assert(g.map(_._5).sorted.toSeq == (0L until g.length))
      assert(g.map(_._6).distinct.length == 1)
      assert(g.map(_._2).max == g.head._6)
      assert(g.length <= 8)
    }
    // the point of the op: bucketed pad strictly beats arrival order here
    val bucketPad = got.map(_._7).sum
    val naivePad = rows.sortBy(_._1).map(_._2).grouped(8)
      .map(g => g.map(g.max - _).sum).sum
    assert(bucketPad < naivePad / 4,
      s"bucketed pad $bucketPad vs arrival-order $naivePad")
    // deterministic across partitionings
    val re = Corpus.lengthBucketBatches(df.repartition(16), "id", col("n"),
      16L, 8).collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(re.sortBy(_._1).toSeq ==
      got.map(t => (t._1, t._4, t._5)).sortBy(_._1).toSeq)
  }
}
