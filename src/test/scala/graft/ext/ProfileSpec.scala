package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** KMV distinct-sketch goldens: exactness below k, set semantics (order /
  * partitioning / duplication invariance), agreement with a brute-force
  * k-smallest-distinct reference, and estimator accuracy at realistic
  * cardinalities.
  */
class ProfileSpec extends SparkTestBase {

  import spark.implicits._

  test("kmv insert/merge equals brute-force k smallest distinct hashes") {
    // seeded values with heavy duplication; reference = sort distinct, take k
    val rng = new scala.util.Random(7)
    val vals = Seq.fill(3000)(s"v${rng.nextInt(400)}")
    val k = 32
    val hashed = vals.toDF("v")
      .select(Profile.valueHash60(col("v")).as("h"))
    val expected = hashed.distinct().as[Long].collect().sorted.take(k).toSeq
    val sketch = vals.toDF("v").repartition(13)
      .agg(Profile.kmvAgg(Profile.valueHash60(col("v")), k))
      .head().getSeq[Long](0)
    assert(sketch == expected)
  }

  test("exact below k: a small group reports its true distinct count") {
    val df = (Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq("c", "d"))
      .map(v => ("g", v)).toDF("g", "v")
    val out = Profile.distinctEstimate(df, "g", "v", k = 64)
      .select("n_rows", "est_distinct").as[(Long, Long)].head()
    assert(out == ((82L, 4L)))
  }

  test("null values are skipped, matching count(DISTINCT) semantics") {
    // a corpus with null text must not crash the primitive-Long encoder
    // (ADVICE r15) and must count distinct NON-null values
    val df = Seq(("g", "a"), ("g", null), ("g", "b"), ("g", null),
      ("g", "a")).toDF("g", "v")
    val out = Profile.distinctEstimate(df, "g", "v", k = 16)
      .select("n_rows", "est_distinct").as[(Long, Long)].head()
    assert(out == ((5L, 2L))) // n_rows counts all rows; distinct skips nulls
    // all-null group: empty sketch, estimate 0
    val allNull = Seq(("g", null: String), ("g", null: String)).toDF("g", "v")
    val z = Profile.distinctEstimate(allNull, "g", "v", k = 16)
      .select("est_distinct").as[Long].head()
    assert(z == 0L)
  }

  test("sketch is a pure function of the value set: partitioning and dup invariance") {
    val base = (0 until 500).map(i => ("g", s"x$i")).toDF("g", "v")
    val dup = base.union(base).union(base).repartition(17)
    val a = Profile.distinctEstimate(base, "g", "v", 16)
      .select("est_distinct").as[Long].head()
    val b = Profile.distinctEstimate(dup, "g", "v", 16)
      .select("est_distinct").as[Long].head()
    assert(a == b)
  }

  test("estimator accuracy: within the ~2/sqrt(k) KMV band at k=256") {
    val n = 5000
    val df = (0 until n).map(i => ("g", s"doc-$i")).toDF("g", "v")
    val est = Profile.distinctEstimate(df, "g", "v", 256)
      .select("est_distinct").as[Long].head()
    // KMV relative error concentrates around 1/sqrt(k-1) ≈ 6.3%; allow 4σ
    assert(math.abs(est - n).toDouble / n < 0.25, s"est=$est for n=$n")
  }

  test("lengthQuantiles: exact rank-pick goldens, per group") {
    // group A lengths sorted: 1,2,2,3,10 (n=5): p50 → rank ⌈2.5⌉=3 → 2;
    // p90 → rank ⌈4.5⌉=5 → 10; p100 → rank 5 → 10.
    // group B: single doc of 7 → every quantile is 7.
    val docs = Seq(
      ("A", "w"), ("A", "w w"), ("A", "w w"), ("A", "w w w"),
      ("A", (1 to 10).map(_ => "t").mkString(" ")),
      ("B", "a b c d e f g")).toDF("g", "text")
    val out = Profile.lengthQuantiles(docs, "g", "text", Seq(0.5, 0.9, 1.0))
      .orderBy("g")
      .select("g", "n_docs", "p50", "p90", "p100")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("A", 5L, 2L, 10L, 10L), ("B", 1L, 7L, 7L, 7L)))
    // partition invariance: the two-phase rank is order-free
    val re = Profile.lengthQuantiles(docs.repartition(7), "g", "text",
        Seq(0.5, 0.9, 1.0))
      .orderBy("g").select("g", "n_docs", "p50", "p90", "p100")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(re == out)
  }

  test("topValues: exact per-group frequency rank, ties by value") {
    val df = (Seq.fill(5)(("g1", "a")) ++ Seq.fill(3)(("g1", "b")) ++
      Seq.fill(3)(("g1", "c")) ++ Seq.fill(1)(("g1", "d")) ++
      Seq.fill(2)(("g2", "z"))).toDF("g", "v")
    val out = Profile.topValues(df, "g", "v", 2)
      .orderBy("g", "rank")
      .select("g", "v", "cnt", "rank")
      .as[(String, String, Long, Long)].collect().toSeq
    // g1: a(5) first; b and c tie at 3 → b by value order; d cut at n=2
    assert(out == Seq(("g1", "a", 5L, 1L), ("g1", "b", 3L, 2L),
      ("g2", "z", 2L, 1L)))
  }

  test("corpusReport: exact totals + distinct estimate in one pass") {
    val docs = Seq(
      ("s1", "alpha beta"), ("s1", "alpha beta"), ("s1", "gamma"),
      ("s2", "one two three")).toDF("source", "text")
    val out = Profile.corpusReport(docs, "source", "text", k = 8)
      .orderBy("source")
      .select("source", "n_docs", "n_tokens", "n_chars", "est_distinct_texts")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("s1", 3L, 5L, 25L, 2L), // "alpha beta" duplicated → 2 distinct
      ("s2", 1L, 3L, 13L, 1L)))
  }

  test("cms: one-sided overestimate, exact at collision-free width") {
    val rng = new scala.util.Random(11)
    val vals = Seq.fill(4000)(s"w${rng.nextInt(300)}")
    val df = vals.toDF("v")
    val exact = vals.groupBy(identity).map { case (v, o) =>
      v -> o.size.toLong }
    val items = exact.keys.toSeq.toDF("v")
    // tight width → collisions → est >= exact everywhere, > somewhere
    val skTight = Profile.cmsSketch(df, "v", depth = 4, width = 16)
    val estTight = Profile.cmsEstimate(skTight, items, "v", 4, 16)
      .as[(String, Long)].collect().toMap
    assert(exact.forall { case (v, c) => estTight(v) >= c })
    assert(exact.exists { case (v, c) => estTight(v) > c })
    // huge width → no collisions in practice at 300 distinct → exact
    val skWide = Profile.cmsSketch(df, "v", depth = 4, width = 1 << 20)
    val estWide = Profile.cmsEstimate(skWide, items, "v", 4, 1 << 20)
      .as[(String, Long)].collect().toMap
    assert(estWide == exact)
  }

  test("cms: partitioning-invariant, null-skipping, absent item bounded") {
    val vals = Seq("a", "a", "b", null, "c", null, "a")
    val a = Profile.cmsSketch(vals.toDF("v"), "v", 3, 8)
      .as[(Int, Long, Long)].collect().toSet
    val b = Profile.cmsSketch(vals.toDF("v").repartition(7), "v", 3, 8)
      .as[(Int, Long, Long)].collect().toSet
    assert(a == b)
    // total mass = depth × non-null occurrences
    assert(a.toSeq.map(_._3).sum == 3L * 5L)
    // an item never inserted reports only collision mass (possibly 0) —
    // never negative, and 0 at a width where its buckets are empty
    val est = Profile.cmsEstimate(
      Profile.cmsSketch(vals.toDF("v"), "v", 3, 1 << 16),
      Seq("zzz").toDF("v"), "v", 3, 1 << 16)
      .as[(String, Long)].head()
    assert(est == ("zzz", 0L))
  }

  test("cms: probe joins the BROADCAST sketch (no sort-merge shuffle)") {
    val df = Seq.tabulate(2000)(i => s"v${i % 97}").toDF("v")
    val sk = Profile.cmsSketch(df, "v", 4, 64)
    val items = (0 until 97).map(i => s"v$i").toDF("v")
    val est = Profile.cmsEstimate(sk, items, "v", 4, 64)
    val plan = est.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe should broadcast the bounded sketch:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"probe sort-merge joins:\n$plan")
  }

  test("cms: streaming fold equals the batch sketch (sum monoid)") {
    // the monoid law the streaming twin relies on: sketch(A ∪ B) =
    // sketch(A) + sketch(B) counter-wise
    val xs = Seq.tabulate(500)(i => s"t${i % 37}").toDF("v")
    val ys = Seq.tabulate(300)(i => s"t${i % 23}").toDF("v")
    def m(df: org.apache.spark.sql.DataFrame) =
      Profile.cmsSketch(df, "v", 4, 32).as[(Int, Long, Long)]
        .collect().map { case (r, bk, c) => (r, bk) -> c }.toMap
    val whole = m(xs.union(ys))
    val folded = (m(xs).toSeq ++ m(ys).toSeq)
      .groupBy(_._1).map { case (k, kvs) => k -> kvs.map(_._2).sum }
    assert(whole == folded)
  }
}
