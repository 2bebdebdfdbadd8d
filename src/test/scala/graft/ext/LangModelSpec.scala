package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bigram stupid-backoff LM ([[LangModel]]): hand-checked probabilities on a
  * tiny corpus, the quality-signal direction (repetitive/typical text scores
  * lower perplexity than shuffled gibberish), and the external-model OOV
  * path. */
class LangModelSpec extends SparkTestBase {
  import spark.implicits._

  test("bigram probabilities hand-checked on a 3-doc corpus") {
    // corpus: "a b" "a b" "a c" — c(<s>)=3, c(<s>,a)=3, c(a,b)=2, c(a,c)=1
    // c(a)=3, c(b)=2, c(c)=1, total tokens = 6
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = LangModel.perplexity(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: ln p(a|<s>) + ln p(b|a) = ln(3/3) + ln(2/3)
    val lp1 = math.round(math.log(1.0) * 1e6) + math.round(math.log(2.0 / 3.0) * 1e6)
    assert(out(0).getLong(2) === lp1)
    assert(out(0).getLong(1) === 2L)
    val expPpl1 = BigDecimal(math.exp(-(lp1 / 1e6) / 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0).getDouble(3) === expPpl1)
    // doc 3: ln p(a|<s>) + ln p(c|a) = 0 + ln(1/3)
    val lp3 = math.round(math.log(1.0 / 3.0) * 1e6)
    assert(out(2).getLong(2) === lp3)
  }

  test("empty documents keep a row with n_tokens=0 and NULL ppl") {
    val docs = Seq((1L, "x y"), (2L, ""), (3L, " \t ")).toDF("doc_id", "text")
    val out = LangModel.perplexity(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    assert(out(1).getLong(1) === 0L && out(1).isNullAt(3))
    assert(out(2).getLong(1) === 0L && out(2).isNullAt(3))
  }

  test("typical text scores lower perplexity than gibberish") {
    // 40 docs of a common phrase + 1 doc of words the LM never pairs
    val common = (1L to 40L).map(i => (i, "the quick brown fox jumps"))
    val odd = Seq((99L, "zxq wvu tsr qpo nml"))
    val docs = (common ++ odd).toDF("doc_id", "text")
    val ppl = LangModel.perplexity(docs, "doc_id", "text")
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    assert(ppl(1L) < ppl(99L),
      s"common=${ppl(1L)} should beat gibberish=${ppl(99L)}")
  }

  test("external model: OOV words floor at count 1 via the backoff arm") {
    val fitDocs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val lm = LangModel.fit(fitDocs, "text")
    val out = LangModel.score(Seq((7L, "zz")).toDF("doc_id", "text"),
      "doc_id", "text", lm).collect()
    // <s>,zz unseen → backoff: ln(0.4 * 1/4) (c(zz) floored at 1, total=4)
    val exp = math.round(math.log(0.4 * (1.0 / 4.0)) * 1e6)
    assert(out(0).getLong(2) === exp)
  }

  test("trigram: deterministic corpus self-scores ppl 1; backoff arms hand-checked") {
    val fit = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val lm3 = LangModel.fit3(fit, "text")
    // self-fit on a deterministic corpus: every conditional is 1 → ppl 1.0
    val self = LangModel.score3(fit, "doc_id", "text", lm3).collect()
    assert(self.forall(_.getLong(2) === 0L))
    assert(self.forall(_.getDouble(3) === 1.0))
    // "b c": (B,B,b) unseen tri+bi → uni arm c1(b)=2/6; (B,b,c) unseen tri,
    // seen bi (b,c)=2 over c1c(b)=2 → bi arm ln(0.4*(2/2))
    val bc = LangModel.score3(Seq((9L, "b c")).toDF("doc_id", "text"),
      "doc_id", "text", lm3).collect()(0)
    val exp = math.round(math.log(0.4 * 0.4 * (2.0 / 6.0)) * 1e6) +
      math.round(math.log(0.4 * (2.0 / 2.0)) * 1e6)
    assert(bc.getLong(2) === exp)
    // OOV floors at count 1 through the double-backoff arm
    val xx = LangModel.score3(Seq((8L, "a b x")).toDF("doc_id", "text"),
      "doc_id", "text", lm3).collect()(0)
    val expX = math.round(math.log(0.4 * 0.4 * (1.0 / 6.0)) * 1e6)
    assert(xx.getLong(2) === expX)
  }

  test("trigram scores structured text sharper than bigram") {
    // corpus where the bigram (b,·) is ambiguous but the trigram resolves
    // it: "a b c" and "x b y" — after (·,b), the bigram sees {c,y} 50/50,
    // the trigram knows the continuation exactly
    val docs = ((1L to 10L).map(i => (i, "a b c")) ++
      (11L to 20L).map(i => (i, "x b y"))).toDF("doc_id", "text")
    val p2 = LangModel.perplexity(docs, "doc_id", "text")
      .agg(max("ppl")).collect()(0).getDouble(0)
    val p3Rows = LangModel.score3(docs, "doc_id", "text",
      LangModel.fit3(docs, "text")).collect()
    val p3 = p3Rows.map(_.getDouble(3)).max
    assert(p3 < p2, s"trigram max ppl $p3 must beat bigram $p2")
    // only the first token stays ambiguous (a-vs-x, 50/50) — the trigram
    // resolves the (·,b) continuation the bigram can't: ppl = 2^(1/3)
    val expected = BigDecimal(math.exp(
      -(math.round(math.log(0.5) * 1e6) / 1e6) / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(p3Rows.forall(_.getDouble(3) === expected))
  }

  test("fit subset + score all matches self-fit on the fitted half") {
    val docs = Seq((0L, "m n m"), (2L, "m n o"), (1L, "m zzz")).toDF("doc_id", "text")
    val lm = LangModel.fit(docs.filter(col("doc_id") % 2 === 0), "text")
    val scored = LangModel.score(docs, "doc_id", "text", lm)
      .orderBy("doc_id").collect()
    assert(scored.length === 3)
    // the unseen bigram (m,zzz) in doc 1 must take the backoff arm with the
    // OOV floor — strictly worse than any seen bigram's probability
    val seenWorst = math.log(1.0 / 2.0) // worst seen conditional: c(n,o)/c(n)
    assert(scored(1).getLong(2) < math.round(seenWorst * 1e6))
  }

  test("ccnet buckets: exact thirds per lang, head beats tail, empty → tail") {
    // reference = repeated target-like text; per lang: 4 target-like docs,
    // 2 gibberish docs, 1 empty doc (7 per lang → thirds of 3/2/2)
    val mk = (lang: String, base: Long) =>
      (0L until 4L).map(i => (base + i, s"the cat sat on the mat $i", lang)) ++
        Seq((base + 4L, "zz qq vv ww pp kk", lang),
          (base + 5L, "xx yy uu tt rr ss", lang),
          (base + 6L, "", lang))
    val docs = (mk("en", 0L) ++ mk("de", 100L)).toDF("doc_id", "text", "lang")
    val lm = LangModel.fit(docs.filter(col("doc_id") % 100 < 4), "text")
    val out = LangModel.ccnetBuckets(docs, "doc_id", "text", "lang", lm)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(5)))
    assert(out.length == 14)
    for (lang <- Seq("en", "de")) {
      val byBucket = out.filter(_._2 == lang).groupBy(_._3)
        .view.mapValues(_.map(_._1).toSet).toMap
      // floor(3r/7) → sizes 3, 2, 2
      assert(byBucket("head").size == 3 && byBucket("middle").size == 2 &&
        byBucket("tail").size == 2, s"$lang sizes: $byBucket")
      // target-like docs fill the head; the empty doc lands in tail
      val base = if (lang == "en") 0L else 100L
      assert(byBucket("head").subsetOf((0L until 4L).map(base + _).toSet))
      assert(byBucket("tail").contains(base + 6L))
    }
    // deterministic under repartitioning and input order
    val out2 = LangModel.ccnetBuckets(
        docs.repartition(7).orderBy(col("doc_id").desc),
        "doc_id", "text", "lang", lm)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(5)))
    assert(out.sortBy(_._1).toSeq == out2.sortBy(_._1).toSeq)
  }
}
