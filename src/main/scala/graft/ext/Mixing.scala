package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Domain-mixture reweighting for pretraining data — the DoReMi shape
  * (Xie et al. 2023, "DoReMi: Optimizing Data Mixtures Speeds Up Language
  * Model Pretraining", arXiv:2305.10429): domains whose PROXY-model loss
  * exceeds a REFERENCE-model loss are under-learned, so their sampling
  * weight is pushed up by a multiplicative-weights ascent on the excess
  * loss; the output distribution is the corpus's training mixture.
  *
  * The update here is the LINEARIZED multiplicative-weights rule
  * `w ← w·(1 + η·excess)` (the standard small-η Hedge linearization,
  * Arora, Hazan & Kale 2012, "The Multiplicative Weights Update Method")
  * rather than DoReMi's `exp(η·excess)`: for the small per-round steps
  * the mixture computation uses they agree to first order, and the
  * linear form keeps EVERY operation in integer arithmetic — no
  * transcendental whose last-ulp could differ between engines — so the
  * whole iteration replays bit-for-bit in SQL (HUGEINT `//` chains, the
  * [[PageRank]] discipline).
  *
  * == Determinism ==
  * Per-domain mean losses are integer floor divisions of micro-nat sums;
  * each round is `u_d = w_d·(1e6 + (η_u6·excess_u6) ⌊/⌋ 1e6)`,
  * `w'_d = ((1e6 − smooth_u6)·u_d) ⌊/⌋ Σu + smooth_u6 ⌊/⌋ k` — the
  * normalizing Σu is an exact integer sum (order-free), the products run
  * in BigInt/HUGEINT, and weights re-quantize to micro-units every
  * round, so cross-round state is integral. The floors leak ≤ k+1
  * micro-units of mass per round — weights are a SAMPLING signal and the
  * leak is deterministic.
  *
  * == 100 TB design ==
  * ONE corpus aggregation (map-side combinable integer sums per domain)
  * produces the k-row excess table; the T-round iteration is driver
  * arithmetic over k domains — metadata, like a centroid matrix. The
  * loss columns are whatever the pipeline has: [[LangModel.score]]
  * micro-nat perplexities, LLM logit scores, or cheap length statistics;
  * the operator never looks at text.
  */
object Mixing {

  /** Micro-unit quantum: weights sum to ≈ Quant. */
  val Quant: Long = 1000000L

  /** Per-domain mean excess losses: `(domain, n_docs, excess_u6)` with
    * `excess_u6 = max(0, sumProxy ⌊/⌋ n − sumRef ⌊/⌋ n)` in micro-nats.
    * One map-side-combinable aggregation; output is k rows.
    *
    * Rows with a NULL domain are EXCLUDED: an unlabeled document belongs
    * to no mixture component, and a null group would otherwise flow into
    * [[domainWeights]]'s k-way weight vector as a phantom domain (and NPE
    * the sort). Real corpora do carry null labels; dropping them here is
    * the documented contract, not an accident of the aggregation. */
  def domainExcess(docs: DataFrame, domainCol: String,
                   proxyLossU6: String, refLossU6: String): DataFrame =
    docs.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(proxyLossU6).cast("long")).as("__sp"),
        sum(col(refLossU6).cast("long")).as("__sr"))
      .select(col("domain"), col("n_docs"),
        greatest(lit(0L),
          expr("__sp div n_docs") - expr("__sr div n_docs"))
          .as("excess_u6"))

  /** Mixture weights after `rounds` multiplicative-weights rounds:
    * `(domain, n_docs, excess_u6, weight_u6)`, weights in micro-units
    * summing to ≈ [[Quant]]. `etaU6` is the step size η in micro-units
    * (100000 = 0.1); `smoothU6` the uniform-smoothing mass c (DoReMi's
    * `(1−c)·α + c·u`). Domains iterate in SORTED order and k comes from
    * the data — everything a SQL replay re-derives. */
  def domainWeights(docs: DataFrame, domainCol: String,
                    proxyLossU6: String, refLossU6: String,
                    rounds: Int, etaU6: Long = 100000L,
                    smoothU6: Long = 100000L): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    require(etaU6 >= 0L, s"etaU6 must be >= 0, got $etaU6")
    require(smoothU6 >= 0L && smoothU6 <= Quant,
      s"smoothU6 must be in [0, $Quant], got $smoothU6")
    val spark = docs.sparkSession
    val ex = domainExcess(docs, domainCol, proxyLossU6, refLossU6)
      .collect().map(r => (r.get(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1.toString)
    require(ex.nonEmpty, "domainWeights: empty corpus")
    val k = ex.length
    val excess = ex.map(_._3)
    // the whole round runs in BigInt (k-bounded driver arithmetic, so
    // cost-free) — no product can overflow at any η/loss scale, and the
    // replay is DuckDB HUGEINT `//` verbatim
    var w = Array.fill(k)(BigInt(Quant / k))
    for (_ <- 0 until rounds) {
      val u = Array.tabulate(k)(d =>
        w(d) * (BigInt(Quant) + (BigInt(etaU6) * excess(d)) / Quant))
      val s = u.sum
      w = Array.tabulate(k)(d =>
        (BigInt(Quant - smoothU6) * u(d)) / s + smoothU6 / k)
    }
    import spark.implicits._
    val wDf = ex.zip(w).map { case ((dom, n, e), wt) =>
      (dom.toString, n, e, wt.toLong)
    }.toSeq.toDF("domain", "n_docs", "excess_u6", "weight_u6")
    // preserve the domain column's runtime type via a join-free cast back
    val domType = docs.schema(domainCol).dataType
    wDf.select(col("domain").cast(domType).as("domain"),
      col("n_docs"), col("excess_u6"), col("weight_u6"))
  }
}
