package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** [[Mixing]] (DoReMi-shape domain reweighting): hand-computed
  * one-round fixture, rounds=0 uniform, mass conservation up to the
  * deterministic floor leak, excess monotonicity, partitioning
  * invariance, and argument validation. */
class MixingSpec extends SparkTestBase {
  import spark.implicits._

  // two domains: "a" has zero excess (proxy <= ref), "b" exactly 2 nats
  private def fixture = Seq(
    ("a", 1000000L, 2000000L), ("a", 3000000L, 2000000L), // mean 2e6 = ref
    ("b", 5000000L, 3000000L), ("b", 5000000L, 3000000L)  // excess 2e6
  ).toDF("dom", "p", "r")

  private def weights(df: org.apache.spark.sql.DataFrame, rounds: Int) =
    Mixing.domainWeights(df, "dom", "p", "r", rounds,
        etaU6 = 100000L, smoothU6 = 100000L)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("one round matches the hand-computed integer arithmetic") {
    // w0 = 500000 each; u_a = 5e11, u_b = 500000·1200000 = 6e11;
    // s = 1.1e12; w_a = (9e5·5e11)//1.1e12 + 50000 = 409090 + 50000;
    // w_b = (9e5·6e11)//1.1e12 + 50000 = 490909 + 50000
    assert(weights(fixture, 1) === Seq(
      ("a", 2L, 0L, 459090L), ("b", 2L, 2000000L, 540909L)))
  }

  test("rounds=0 is the uniform mixture; excess already computed") {
    assert(weights(fixture, 0) === Seq(
      ("a", 2L, 0L, 500000L), ("b", 2L, 2000000L, 500000L)))
  }

  test("mass conserved up to the floor leak; excess domain grows monotonically") {
    val byRounds = (0 to 6).map(t => weights(fixture, t))
    for (ws <- byRounds) {
      val total = ws.map(_._4).sum
      assert(total <= Mixing.Quant && total > Mixing.Quant - 100L,
        s"mass leaked beyond micro-units: $total")
    }
    val bWeights = byRounds.map(_.find(_._1 == "b").get._4)
    assert(bWeights == bWeights.sorted,
      s"excess domain's weight must be non-decreasing: $bWeights")
    // smoothing floors the losing domain above c/k
    assert(byRounds.last.find(_._1 == "a").get._4 >= 100000L / 2)
  }

  test("weights are invariant to partitioning and row order") {
    val big = (0 until 400).map { i =>
      (s"d${i % 5}", (1000000L + i * 3571L) % 7000000L,
        (500000L + i * 911L) % 6000000L)
    }.toDF("dom", "p", "r")
    val a = weights(big, 4)
    val b = weights(big.repartition(17).orderBy(col("p")), 4)
    assert(a === b)
  }

  test("argument validation and empty corpus") {
    intercept[IllegalArgumentException] {
      Mixing.domainWeights(fixture, "dom", "p", "r", rounds = -1)
    }
    intercept[IllegalArgumentException] {
      Mixing.domainWeights(fixture, "dom", "p", "r", 1,
        smoothU6 = 2000000L)
    }
    intercept[IllegalArgumentException] {
      Mixing.domainWeights(fixture.filter(lit(false)), "dom", "p", "r", 1)
    }
  }

  test("null domain rows are excluded, not an NPE (documented contract)") {
    val withNull = fixture.union(Seq((null: String, 9000000L, 1000000L),
      (null: String, 9000000L, 1000000L)).toDF("dom", "p", "r"))
    // the unlabeled rows vanish: identical output to the clean fixture
    assert(weights(withNull, 1) === weights(fixture, 1))
    // and an ALL-null corpus is the empty-corpus error, not a crash
    intercept[IllegalArgumentException] {
      Mixing.domainWeights(
        Seq((null: String, 1L, 1L)).toDF("dom", "p", "r"), "dom", "p", "r", 1)
    }
  }
}
