package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, ORACLE-REPLAYABLE PCA(2): the UMAPVizOp stand-in's
  * numerical core (reference `viz_ops.py:10-52` runs umap-learn; SURVEY
  * §2.7 trades that for PCA — this round the PCA itself is made exactly
  * reproducible so the 2-D embedding can be hash-checked by a DuckDB
  * replay, the engine's last structurally-unfalsifiable result).
  *
  * Why Spark ML's `PCA` can't be oracled: its covariance accumulates IEEE
  * doubles in partition order (bit-nondeterministic across partitionings)
  * and its eigensolver (LAPACK/Breeze) is not replayable in SQL. This
  * implementation removes both obstacles:
  *
  *   1. Inputs quantize to integers (`round(x*1000)` — the same HALF_UP
  *      both engines implement), and the second-moment matrix accumulates
  *      in LONG arithmetic — exact, therefore ORDER-INDEPENDENT: any
  *      partitioning, any aggregation tree, same bits. The scaled
  *      covariance `A = n·M − S·Sᵀ` (covariance × n², a positive multiple —
  *      eigenvectors unchanged) is integer-exact in BigInt and converts to
  *      double losslessly while |A| < 2⁵³ (holds through ~10⁹ rows at unit-
  *      norm embeddings; beyond that the correctly-rounded conversion is
  *      still deterministic, merely no longer integer-exact).
  *   2. The eigensolve is a FIXED-ITERATION power method (no convergence
  *      test — a data-dependent stopping rule would have to be replayed
  *      too), using only IEEE +,−,×,÷,sqrt — every one of which is
  *      correctly rounded by both the JVM and DuckDB — in a pinned
  *      association order: every sum is the left fold `reduceLeft(+)`,
  *      exactly DuckDB's `list_reduce(.., (x,y)->x+y)`. Convergence quality
  *      is irrelevant to the ORACLE (both engines run the same process and
  *      agree bit-for-bit regardless); PCA quality is asserted separately
  *      in ProbeSpec.
  *
  * Scale shape: one exact-aggregation pass over the data (tree-reduced,
  * O(d²) state per partition), O(d³ + Iters·d²) driver math on a d×d
  * matrix, one scoring pass — no shuffle of row data at all.
  */
object ExactPca {

  /** Input quantization: 1e-3 — coordinates of a 2-D viz embedding are
    * scale-arbitrary, reproducibility is what matters. */
  val Quant = 1000

  /** |quantized value| bound: |x| ≤ 32 after quantization headroom. Keeps
    * per-row products ≤ ~1e9, so a single partition would need > 9·10⁹ rows
    * to overflow a Long partial sum. */
  val MaxAbsQ = 32000L

  /** Fixed power-method iteration count (both engines run exactly this
    * many). 200 drives |λ₂/λ₁|ᵏ below double precision for any spectral
    * gap ≥ ~16%; closer eigenvalues converge less — equally, in both
    * engines. */
  val Iters = 200

  /** Quantization as a SPARK expression (shared by fit and score paths):
    * `transform(vec, e -> round(e*1000) :: long)` — HALF_UP, the rounding
    * DuckDB's `round` also implements. */
  def quantize(vec: Column): Column =
    transform(vec.cast("array<double>"), e => round(e * Quant).cast("long"))

  /** Left fold matching DuckDB `list_reduce(terms, (x,y) -> x+y)` — NO
    * initial element: the fold starts FROM terms(0). Every sum in this
    * object goes through here so the association order is pinned in one
    * place. */
  private def foldSum(terms: Array[Double]): Double = {
    var acc = terms(0)
    var i = 1
    while (i < terms.length) { acc += terms(i); i += 1 }
    acc
  }

  private def matvec(a: Array[Array[Double]], v: Array[Double]): Array[Double] =
    Array.tabulate(v.length)(i =>
      foldSum(Array.tabulate(v.length)(j => a(i)(j) * v(j))))

  private def normalize(w: Array[Double]): Array[Double] = {
    val norm = math.sqrt(foldSum(w.map(t => t * t)))
    w.map(_ / norm)
  }

  /** Sign canonicalization: the power method's limit is sign-indeterminate,
    * so pin it — first nonzero component positive. (This was the whole
    * reason q_umap_viz could not be hash-compared before.) */
  private def canonicalSign(v: Array[Double]): Array[Double] =
    if (v.find(_ != 0.0).exists(_ < 0)) v.map(x => -x) else v

  /** (sign-canonical eigenvector, Rayleigh eigenvalue) after exactly
    * [[Iters]] iterations from the all-ones start. */
  def powerIterate(a: Array[Array[Double]]): (Array[Double], Double) = {
    var v = Array.fill(a.length)(1.0)
    var k = 0
    while (k < Iters) { v = normalize(matvec(a, v)); k += 1 }
    val av = matvec(a, v)
    val lam = foldSum(Array.tabulate(a.length)(i => v(i) * av(i)))
    (canonicalSign(v), lam)
  }

  /** Top-2 directions: power-iterate, deflate `A − λ₁v₁v₁ᵀ`, iterate again.
    * Deflation uses the CANONICAL v₁ (sign-invariant bitwise anyway:
    * (−x)(−y) = xy exactly in IEEE). */
  def top2(a: Array[Array[Double]]): (Array[Double], Array[Double]) = {
    val (v1, lam1) = powerIterate(a)
    val a2 = Array.tabulate(a.length, a.length)((i, j) =>
      a(i)(j) - lam1 * v1(i) * v1(j))
    val (v2, _) = powerIterate(a2)
    (v1, v2)
  }

  /** Exact integer moments of a quantized-vector column, one tree-reduced
    * pass: (n, S[d], upper-triangular M packed row-major). Long sums are
    * exact ⇒ order-independent ⇒ the SAME BITS from any partitioning — the
    * property Summarizer-based covariance lacks. */
  def moments(df: DataFrame, qxCol: String): (Long, Array[Long], Array[Long]) = {
    import df.sparkSession.implicits._
    val rows = df.select(col(qxCol)).as[Seq[Long]].rdd
    val maxAbsQ = MaxAbsQ // local capture: the closure must not drag ExactPca$ in
    // (n, S, M) allocated lazily per partition (d discovered from the data)
    val zero: (Long, Array[Long], Array[Long]) = (0L, null, null)
    def seqOp(acc: (Long, Array[Long], Array[Long]), q: Seq[Long]) = {
      val d = q.length
      val (n0, s0, m0) = acc
      val s = if (s0 != null) s0 else new Array[Long](d)
      val m = if (m0 != null) m0 else new Array[Long](d * (d + 1) / 2)
      require(s.length == d, s"ragged vector column: ${s.length} vs $d dims")
      val qa = q.toArray
      var i = 0
      var idx = 0
      while (i < d) {
        val qi = qa(i)
        require(math.abs(qi) <= maxAbsQ,
          s"|quantized value| $qi exceeds $maxAbsQ: input out of exact range")
        s(i) += qi
        var j = i
        while (j < d) { m(idx) += qi * qa(j); j += 1; idx += 1 }
        i += 1
      }
      (n0 + 1, s, m)
    }
    def combOp(a: (Long, Array[Long], Array[Long]),
               b: (Long, Array[Long], Array[Long])) = (a, b) match {
      case ((0L, _, _), y) => y
      case (x, (0L, _, _)) => x
      case ((na, sa, ma), (nb, sb, mb)) =>
        var i = 0
        while (i < sa.length) { sa(i) += sb(i); i += 1 }
        i = 0
        while (i < ma.length) { ma(i) += mb(i); i += 1 }
        (na + nb, sa, ma)
    }
    val (n, s, m) = rows.treeAggregate(zero)(seqOp, combOp)
    require(n > 0, "exact PCA needs at least one row")
    (n, s, m)
  }

  /** `A = n·M − S·Sᵀ` (full symmetric d×d as doubles) from the packed
    * moments — BigInt products, correctly-rounded conversion (lossless
    * while |entry| < 2⁵³, true at fixture scales). */
  def scaledCovariance(n: Long, s: Array[Long], m: Array[Long]): Array[Array[Double]] = {
    val d = s.length
    val upper = Array.ofDim[Double](d, d)
    var i = 0
    var idx = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val a = (BigInt(n) * m(idx) - BigInt(s(i)) * s(j)).doubleValue
        upper(i)(j) = a
        upper(j)(i) = a
        j += 1
        idx += 1
      }
      i += 1
    }
    upper
  }

  /** Project a quantized-vector column onto two fixed directions with the
    * pinned fold order: value = [Σ qxⱼ·v1ⱼ, Σ qxⱼ·v2ⱼ], each the left fold
    * DuckDB replays (inlined — the executor-side closure must capture only
    * the two weight arrays, not this object). */
  def projectUdf(v1: Array[Double], v2: Array[Double]) =
    udf { qx: Seq[Long] =>
      def dot(v: Array[Double]): Double = {
        var acc = qx(0) * v(0) // left fold, first term as init (= list_reduce)
        var j = 1
        while (j < v.length) { acc += qx(j) * v(j); j += 1 }
        acc
      }
      Array(dot(v1), dot(v2))
    }
}
