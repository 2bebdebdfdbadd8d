package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** BM25 ranking ([[Bm25]]): retrieval direction (term-dense docs first,
  * rare terms weighted over common ones), absent-term docs score zero, and
  * deterministic tie-breaks. */
class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  test("docs dense in the query term rank first; absent-term docs score 0") {
    val docs = Seq(
      (1L, "apple apple apple pear"),
      (2L, "apple pear plum quince"),
      (3L, "pear plum quince fig"),
      (4L, "apple apple pear plum")).toDF("doc_id", "text")
    val out = Bm25.rank(docs, "doc_id", "text", Seq("apple"), k = 4)
      .collect()
    assert(out.map(_.getLong(1)).take(3).toSeq === Seq(1L, 4L, 2L),
      "rank must follow tf under equal length")
    assert(out(3).getLong(1) === 3L && out(3).getLong(2) === 0L,
      "doc without the term scores exactly 0")
  }

  test("a rarer term outweighs a common one at equal tf") {
    // 'rare' in 1 of 10 docs, 'common' in all 10
    val docs = ((1L to 9L).map(i => (i, "common filler words here")) :+
      (10L, "common rare filler here")).toDF("doc_id", "text")
    val out = Bm25.rank(docs, "doc_id", "text", Seq("rare", "common"), k = 10)
      .collect()
    assert(out.head.getLong(1) === 10L, "the doc holding the rare term wins")
    // remaining docs tie exactly → rank resolves by doc_id ascending
    assert(out.tail.map(_.getLong(1)).toSeq === (1L to 9L).toSeq)
    assert(out.tail.map(_.getLong(2)).distinct.length === 1)
  }

  test("longer docs are penalized at equal tf (length normalization)") {
    val docs = Seq(
      (1L, "term one two"),
      (2L, "term one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val out = Bm25.rank(docs, "doc_id", "text", Seq("term"), k = 2).collect()
    assert(out.head.getLong(1) === 1L)
    assert(out.head.getLong(2) > out(1).getLong(2))
  }

  test("duplicate query terms count twice, like the per-term fold they sum") {
    // each duplicate contributes its own term in the score fold — the
    // one-pass tf must hand BOTH indices the same count
    val docs = Seq((1L, "apple pear"), (2L, "pear plum")).toDF("doc_id", "text")
    val once = Bm25.rank(docs, "doc_id", "text", Seq("apple"), k = 2).collect()
    val twice = Bm25.rank(docs, "doc_id", "text", Seq("apple", "apple"), k = 2)
      .collect()
    assert(twice.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      once.map(r => (r.getLong(1), r.getLong(2) * 2)).toSeq)
  }

  test("degenerate corpus (all documents empty) raises, never scores 0") {
    // avgdl = 0 would make dl/avgdl NaN and round(NaN·1e6)::long silently
    // 0 — the guard turns that into a hard error (ADVICE r13)
    val docs = Seq((1L, ""), (2L, "  ")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Bm25.rank(docs, "doc_id", "text", Seq("apple"), k = 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("degenerate corpus")))
    // an EMPTY corpus (0 rows) yields an empty result, not an error
    val empty = docs.filter($"doc_id" < 0L)
    assert(Bm25.rank(empty, "doc_id", "text", Seq("apple"), k = 1).count() === 0L)
  }

  test("rankMany: each query's batch result equals its solo rank run") {
    val docs = Seq(
      (1L, "apple apple pear plum"),
      (2L, "apple pear plum quince"),
      (3L, "pear plum quince fig"),
      (4L, "fig quince plum apple")).toDF("doc_id", "text")
    val queries = Seq(
      0L -> Seq("apple", "pear"),
      1L -> Seq("pear", "apple"), // reversed fold order
      2L -> Seq("fig"))
    val batch = Bm25.rankMany(docs, "doc_id", "text", queries, k = 4)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getLong(1))
          .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      }
    queries.foreach { case (qid, ts) =>
      val solo = Bm25.rank(docs, "doc_id", "text", ts, k = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(batch(qid) === solo, s"query $qid diverged from the solo run")
    }
  }

  test("stored index probe equals the corpus scan, bit for bit") {
    val rng = new scala.util.Random(17)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (1L to 60L).map(i =>
      (i, Seq.fill(3 + rng.nextInt(9))(vocab(rng.nextInt(vocab.length)))
        .mkString(" "))).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("bm25-idx-").toString
    Bm25.buildIndex(docs, "doc_id", "text", idx, numBuckets = 8)
    val terms = Seq("alpha", "gamma", "alpha") // duplicate fold included
    // every doc draws from the vocab, so >> 10 docs match: scan == index
    val scan = Bm25.rank(docs, "doc_id", "text", terms, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val probe = Bm25.topKIndexed(spark, idx, terms, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(probe === scan)
  }

  test("the index probe prunes to the query terms' bucket directories") {
    val docs = (1L to 40L).map(i =>
      (i, s"w${i % 7} w${i % 5} shared")).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("bm25-idx2-").toString
    Bm25.buildIndex(docs, "doc_id", "text", idx, numBuckets = 16)
    val buckets = new java.io.File(s"$idx/postings_v0").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(buckets > 2, s"fixture too small to show pruning ($buckets dirs)")
    val probe = Bm25.topKIndexed(spark, idx, Seq("shared"), k = 5)
    val scans = probe.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty, "no file scan in probe plan")
    // one term → exactly one bucket directory planned
    assert(scans.map(_.selectedPartitions.partitionCount).min == 1,
      s"probe planned ${scans.map(_.selectedPartitions.partitionCount).toSeq}" +
        s" partitions over $buckets bucket dirs, want a 1")
  }

  test("an indexed term absent from the corpus scores like the scan") {
    val docs = Seq((1L, "apple pear"), (2L, "pear plum")).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("bm25-idx3-").toString
    Bm25.buildIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    val scan = Bm25.rank(docs, "doc_id", "text", Seq("apple", "missing"), 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val probe = Bm25.topKIndexed(spark, idx, Seq("apple", "missing"), 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    // doc 2 matches no positive term in the probe (pear unqueried): the
    // scan ranks it at score 0, the index returns matched docs only
    assert(scan === Seq((1L, scan.head._2), (2L, 0L)))
    assert(probe === scan.filter(_._2 > 0L))
  }

  test("positional index answers phrase queries like the corpus scan") {
    val docs = Seq(
      (1L, "a b c a b"),   // two "a b"
      (2L, "a a a"),       // overlapping "a a"
      (3L, "b a c"),       // both terms present, never contiguous
      (4L, "x y z"),
      (5L, "c a b")        // match at the end
    ).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("bm25-pos-").toString
    Bm25.buildIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    def scan(phrase: Seq[String]) = docs
      .select(col("doc_id"),
        TextAnalysis.phraseCount(col("text"), phrase).as("n"))
      .filter(col("n") > 0L).orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    def probe(phrase: Seq[String]) = Bm25
      .phraseCountIndexed(spark, idx, phrase).orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    for (p <- Seq(Seq("a", "b"), Seq("a", "a"), Seq("a", "b", "c"),
        Seq("a"), Seq("missing", "b")))
      assert(probe(p) === scan(p), s"phrase $p diverged from the scan")
    // doc 3 has both terms but no contiguous run: excluded by both forms
    assert(!scan(Seq("a", "b")).exists(_._1 == 3L))
  }

  test("incremental append equals a full rebuild, probe for probe") {
    val rng = new scala.util.Random(23)
    val vocab = Seq("ein", "zwei", "drei", "vier", "fuenf")
    val all = (1L to 50L).map(i =>
      (i, Seq.fill(2 + rng.nextInt(7))(vocab(rng.nextInt(vocab.length)))
        .mkString(" ")))
    val full = all.toDF("doc_id", "text")
    val head = all.filter(_._1 <= 20).toDF("doc_id", "text")
    val tail = all.filter(_._1 > 20).toDF("doc_id", "text")
    val idxFull = java.nio.file.Files.createTempDirectory("bm25-full-").toString
    val idxIncr = java.nio.file.Files.createTempDirectory("bm25-incr-").toString
    Bm25.buildIndex(full, "doc_id", "text", idxFull, numBuckets = 8)
    Bm25.buildIndex(head, "doc_id", "text", idxIncr, numBuckets = 8)
    // two appends: the df merge must compose, not just apply once
    Bm25.appendToIndex(tail.filter($"doc_id" <= 35), "doc_id", "text", idxIncr)
    Bm25.appendToIndex(tail.filter($"doc_id" > 35), "doc_id", "text", idxIncr)
    val terms = Seq("ein", "drei")
    def probe(p: String) = Bm25.topKIndexed(spark, p, terms, k = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(probe(idxIncr) === probe(idxFull))
    // …and both equal the corpus scan on the matched prefix
    val scan = Bm25.rank(full, "doc_id", "text", terms, k = 12).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .filter(_._3 > 0L)
    assert(probe(idxFull).take(scan.length) === scan)
  }

  test("compaction shrinks postings files and changes no probe answer") {
    val rng = new scala.util.Random(31)
    val vocab = Seq("uno", "dos", "tres", "cuatro")
    val all = (1L to 48L).map(i =>
      (i, Seq.fill(2 + rng.nextInt(6))(vocab(rng.nextInt(vocab.length)))
        .mkString(" ")))
    val idx = java.nio.file.Files.createTempDirectory("bm25-cpt-").toString
    Bm25.buildIndex(all.filter(_._1 <= 12).toDF("doc_id", "text"),
      "doc_id", "text", idx, numBuckets = 4)
    // many micro-appends: each leaves one more file per touched bucket
    for (lo <- Seq(13L, 22L, 31L, 40L))
      Bm25.appendToIndex(
        all.filter(t => t._1 >= lo && t._1 < lo + 9).toDF("doc_id", "text"),
        "doc_id", "text", idx)
    def parquetFiles(dir: String): Int = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(idx))
      try s.iterator().asScala.count(p =>
        p.toString.contains(dir) && p.toString.endsWith(".parquet"))
      finally s.close()
    }
    def probes() = (
      Bm25.topKIndexed(spark, idx, Seq("uno", "tres"), k = 15).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq,
      Bm25.phraseCountIndexed(spark, idx, Seq("dos", "dos"))
        .orderBy(col("doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq)
    val before = probes()
    // four appends → four delta segments beside the base
    val deltasBefore = new java.io.File(idx).listFiles()
      .count(_.getName.startsWith("postings_d"))
    assert(deltasBefore === 4, s"expected 4 delta segments, $deltasBefore")
    val filesBefore = parquetFiles("postings_")
    Bm25.compactIndex(spark, idx)
    val filesAfter = parquetFiles("postings_v1")
    assert(filesAfter < filesBefore,
      s"compaction did not shrink: $filesBefore -> $filesAfter files")
    assert(probes() === before, "compaction changed a probe answer")
    // superseded versions are pruned down to current + previous
    val dirs = new java.io.File(idx).listFiles().map(_.getName).toSet
    assert(dirs.contains("postings_v1") && dirs.contains("postings_v0"))
    // the folded-in segments are retired from stats; the orphan sweep of
    // the NEXT compaction removes them from disk (one writer cycle later)
    Bm25.appendToIndex(all.filter(_._1 == 1L)
      .map { case (i, t) => (i + 1000L, t) }.toDF("doc_id", "text"),
      "doc_id", "text", idx)
    val afterAppend = probes()
    Bm25.compactIndex(spark, idx) // -> v2
    val remaining = new java.io.File(idx).listFiles().map(_.getName)
      .filter(_.startsWith("postings_d")).toSet
    // only the segment retired by THIS compaction may linger; the four
    // retired by the previous one are gone (monotone counter: the 5th
    // append was postings_d4 — d0..d3 are never reused)
    assert(remaining.subsetOf(Set("postings_d4")),
      s"stale delta segments not swept: $remaining")
    // base versions prune down to current + previous
    Bm25.compactIndex(spark, idx) // -> v3, prunes v0 and v1
    val dirs2 = new java.io.File(idx).listFiles().map(_.getName).toSet
    assert(dirs2.contains("postings_v3") && dirs2.contains("postings_v2")
      && !dirs2.contains("postings_v1") && !dirs2.contains("postings_v0"))
    assert(probes() === afterAppend,
      "compaction changed a probe answer after the extra append")
  }

  test("long append history collapses to one file per bucket on compaction") {
    // 20 micro-batch appends fragment the store into ≥ 20 postings files;
    // compaction must fold the WHOLE history back to ≤ numBuckets files in
    // the new version (one per non-empty bucket — the layout min/max
    // skipping needs), with every probe answer unchanged.
    val docs = (0 until 48).map(i =>
      (i.toLong, s"w$i alpha beta w${i % 7}")).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("bm25-hist-").toString
    Bm25.buildIndex(docs.filter($"doc_id" < 8), "doc_id", "text", idx,
      numBuckets = 4)
    (0 until 20).foreach { i =>
      Bm25.appendToIndex(docs.filter($"doc_id" >= 8 + i * 2 &&
        $"doc_id" < 8 + (i + 1) * 2), "doc_id", "text", idx, tag = s"h$i")
    }
    def files(substr: String): Long = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(idx))
      try s.iterator().asScala.count(p =>
        p.toString.contains(substr) && p.toString.endsWith(".parquet"))
      finally s.close()
    }
    def probe() = Bm25.topKIndexed(spark, idx, Seq("alpha", "w3"), k = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(files("postings_") >= 21L,
      s"expected >= 21 fragmented files, got ${files("postings_")}")
    val before = probe()
    Bm25.compactIndex(spark, idx)
    // current version after the first compaction of a v0 base is v1
    assert(files("postings_v1") <= 4L,
      s"compacted version carries ${files("postings_v1")} files, want <= 4")
    assert(probe() === before, "compaction changed a probe answer")
  }

  test("batch phrase probe equals each phrase's own indexed count") {
    val docs = Seq(
      (1L, "a b c a b"), (2L, "a a a"), (3L, "b a c"),
      (4L, "x y z"), (5L, "c a b")).toDF("doc_id", "text")
    val idx = java.nio.file.Files.createTempDirectory("bm25-mph-").toString
    Bm25.buildIndex(docs, "doc_id", "text", idx, numBuckets = 4)
    val phrases = Seq(0L -> Seq("a", "b"), 1L -> Seq("a", "a"),
      2L -> Seq("a", "b", "c"), 3L -> Seq("a"), 4L -> Seq("missing", "b"))
    val batch = Bm25.phraseCountManyIndexed(spark, idx, phrases)
      .orderBy(col("phrase_id"), col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val solo = phrases.flatMap { case (pid, p) =>
      Bm25.phraseCountIndexed(spark, idx, p).orderBy(col("doc_id"))
        .collect().map(r => (pid, r.getLong(0), r.getLong(1))).toSeq
    }
    assert(batch === solo)
    intercept[IllegalArgumentException] {
      Bm25.phraseCountManyIndexed(spark, idx, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Bm25.phraseCountManyIndexed(spark, idx,
        Seq(0L -> Seq("a"), 0L -> Seq("b")))
    }
    intercept[IllegalArgumentException] {
      Bm25.phraseCountManyIndexed(spark, idx, Seq(0L -> Seq.empty))
    }
  }

  test("rankMany validates ids, empty queries, and empty term lists") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Bm25.rankMany(docs, "doc_id", "text", Seq.empty, k = 1)
    }
    intercept[IllegalArgumentException] {
      Bm25.rankMany(docs, "doc_id", "text",
        Seq(0L -> Seq("a"), 0L -> Seq("b")), k = 1)
    }
    intercept[IllegalArgumentException] {
      Bm25.rankMany(docs, "doc_id", "text", Seq(0L -> Seq.empty), k = 1)
    }
  }

  test("Bm25IndexHandle: handle-threaded append/compact/probe equals the " +
       "path forms bit for bit") {
    // round 21: the ingest sink threads ONE handle through the per-batch
    // append/compact/probe loop (cached stats row + per-dir bucket
    // listings — the per-batch pointer re-reads removed); this pins the
    // handle path's results against the per-call path forms on identical
    // stores, including cache currency across the handle's own mutations.
    val rng = new scala.util.Random(41)
    val vocab = Seq("alfa", "beta", "gamma", "delta")
    val all = (1L to 40L).map(i =>
      (i, Seq.fill(2 + rng.nextInt(6))(vocab(rng.nextInt(vocab.length)))
        .mkString(" ")))
    val head = all.filter(_._1 <= 15).toDF("doc_id", "text")
    val b0 = all.filter(t => t._1 > 15 && t._1 <= 28).toDF("doc_id", "text")
    val b1 = all.filter(_._1 > 28).toDF("doc_id", "text")
    val terms = Seq("alfa", "gamma")
    def probe(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    val pIdx = java.nio.file.Files.createTempDirectory("bm25-h-p-").toString
    Bm25.buildIndex(head, "doc_id", "text", pIdx, numBuckets = 4)
    Bm25.appendToIndex(b0, "doc_id", "text", pIdx, tag = "b0")
    Bm25.compactIndex(spark, pIdx)
    Bm25.appendToIndex(b1, "doc_id", "text", pIdx, tag = "b1")
    val pGot = probe(Bm25.topKIndexed(spark, pIdx, terms, k = 10))

    val hIdx = java.nio.file.Files.createTempDirectory("bm25-h-h-").toString
    Bm25.buildIndex(head, "doc_id", "text", hIdx, numBuckets = 4)
    val h = Bm25.openIndex(spark, hIdx)
    // warm the listing cache before the mutations: the handle must keep
    // it current through its own append (df version flip) and compaction
    probe(Bm25.topKIndexed(h, terms, k = 10, k1 = 1.2, b = 0.75))
    Bm25.appendToIndex(h, b0, "doc_id", "text", tag = "b0")
    Bm25.compactIndex(h)
    Bm25.appendToIndex(h, b1, "doc_id", "text", tag = "b1")
    val hGot = probe(Bm25.topKIndexed(h, terms, k = 10, k1 = 1.2, b = 0.75))
    assert(hGot === pGot, "BM25 handle probe diverged from path form")
    // replay detection still works through the cached stats row
    Bm25.appendToIndex(h, b1, "doc_id", "text", tag = "b1")
    assert(h.deltaSegments === Bm25.deltaSegmentCount(spark, hIdx),
      "cached stats drifted from the committed pointer")
  }
}
