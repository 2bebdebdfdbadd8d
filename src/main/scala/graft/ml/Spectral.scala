package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Laplacian-eigenmaps 2-D embedding (Belkin & Niyogi 2003)
  * — a REAL manifold layout, closing the gap the ExactPca stand-in leaves
  * (PCA is linear; it cannot separate classes whose means coincide —
  * SpectralSpec pins exactly that case with the antipodal-cap XOR fixture,
  * where the engine's own exact linear probe sits at chance and the
  * spectral plane classifies perfectly).
  *
  * Pipeline: symmetric unweighted kNN graph (the paper's "simple-minded"
  * binary weights — deterministic, no bandwidth parameter) → the two
  * smallest NON-TRIVIAL eigenvectors of the combinatorial Laplacian
  * L = D − A, found as the LARGEST eigenvectors of the integer matrix
  * M = cI − L = (c − dᵢ)I + A with c = 2·max-degree — the Gershgorin
  * bound on λmax(L), so M is PSD and its top eigenspace is EXACTLY L's
  * bottom (c = Δ would leave λ(M) ∈ [−Δ, Δ] and the iteration mixing
  * divergent oscillatory modes — caught by SpectralSpec's tightness gate)
  * — by fixed-count JOINT orthogonal iteration: both components advance
  * through one shared SpMV per step, each step centering both (deflating
  * the trivial all-ones eigenvector) and deflating the second component
  * against the CURRENT first via an integer micro-quantized ratio (see
  * [[iterate]]).
  *
  * DETERMINISM CONTRACT (the engine-wide quantized-exact discipline): the
  * iterate is an INTEGER vector (|x| ≤ 1e6); one SpMV step is pure integer
  * arithmetic; every global reduction (mean, projection, squared norm) is
  * an EXACT integer sum (decimal(38) aggregation — order-independent at
  * any partitioning); the only non-integer steps are correctly-rounded
  * IEEE primitives on identical operands (one cast-to-double of an exact
  * integer, one divide, one sqrt, one multiply, one half-up round per
  * element/iteration). Every engine replays the run bit-for-bit — the
  * q_spectral oracle re-executes all iterations in a DuckDB recursive CTE,
  * exactly like the ExactPca oracle. Like ExactPca, the spec is "exactly
  * `iters` iterations from the md5-seeded start", not "converged":
  * replayability over adaptivity.
  *
  * Scale shape: kNN here is brute-force (the gate form; swap
  * [[graft.ext.Similarity.ivfTopK]] for the 100 TB path — the iteration is
  * agnostic to how edges were found). Each iteration is one edge-keyed
  * join + aggregate (the SpMV — shuffles n·k edge rows) plus two
  * metadata-size scalar aggregates, the ConnectedComponents cost class
  * with a FIXED bound instead of a log one; per-iteration state is
  * checkpointed so lineage stays O(1). Driver state: a handful of BigInt
  * scalars per iteration.
  */
object Spectral {

  /** Quantization scale of the iterate (|x| ≤ Quant). */
  val Quant = 1e6

  /** Gate-form defaults, shared with the q_spectral DuckDB oracle so the
    * constants can never drift between engine and replay. */
  val DefaultK = 8
  val DefaultIters = 8

  /** Driver-local solve thresholds: below both, the iteration runs in
    * driver arrays instead of `iters` rounds of near-empty Spark stages —
    * the same broadcast-when-small judgment Spark itself applies to join
    * sides, and BIT-IDENTICAL by construction (identical integer ops and
    * correctly-rounded IEEE primitives on identical operands; pinned by
    * SpectralSpec's forced-distributed equality test). 20k nodes × deg
    * ≤ 1500 caps the collected edge list at ~30M rows worst case but
    * [[LocalSolveMaxEdges]] cuts far earlier; gate graphs are ≤ 1k nodes,
    * real corpora route to the distributed path untouched. */
  val LocalSolveMaxNodes = 20000L
  val LocalSolveMaxEdges = 1000000L

  /** Symmetrized unweighted kNN edges (src, dst), both directions, no
    * self-loops: neighbors = the non-self rows of each node's top-(k+1)
    * ranks by ROUNDED cosine (6 decimals, [[graft.ext.Similarity]]'s output
    * precision), ties broken by corpus id. Ranking on the rounded value —
    * unlike [[graft.ext.Similarity.bruteForceTopK]]'s full-precision rank —
    * is the replayability choice: two engines whose dot products differ in
    * the last ulp still agree on the 6-decimal grid (the q_ann oracle
    * precedent), and a single flipped edge would otherwise cascade through
    * every power-iteration step. Brute-force O(n²) pairs is the GATE form;
    * at 100 TB swap [[graft.ext.Similarity.ivfTopK]] for the candidate
    * generation — the iteration below is agnostic to how edges were found. */
  def knnEdges(emb: DataFrame, idCol: String, vecCol: String,
               k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val q = broadcast(emb.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("__qv"),
      graft.ext.Similarity.norm(col(vecCol)).as("__qn")))
    val cRaw = emb.select(col(idCol).cast("long").as("corpus_id"),
      col(vecCol).as("__cv"),
      graft.ext.Similarity.norm(col(vecCol)).as("__cn"))
    // the O(n²) pair stream inherits the CORPUS side's partitioning: a
    // single-file scan would run the whole crossJoin in one task (measured
    // 3× the wall at n=2000) — spread it when the scan is narrower than
    // the cluster
    val par = emb.sparkSession.sparkContext.defaultParallelism
    val c = if (cRaw.rdd.getNumPartitions < par) cRaw.repartition(par)
            else cRaw
    val scored = c.crossJoin(q).withColumn("__cos6",
      round(when(col("__qn") * col("__cn") > 0,
        graft.ext.VectorKernels.dot(col("__qv"), col("__cv"))
          / (col("__qn") * col("__cn"))).otherwise(lit(0.0)), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("__cos6").desc, col("corpus_id").asc)
    val nn = scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k + 1)
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id").as("src"), col("corpus_id").as("dst"))
    nn.union(nn.select(col("dst").as("src"), col("src").as("dst"))).distinct()
  }

  /** md5-seeded deterministic start vector component for node `id`:
    * uniform integer in [−Quant, Quant] from the engine's cross-engine
    * 60-bit md5 prefix — never orthogonal to the target eigenvectors in
    * practice, and exactly replayable. */
  private def seedX(id: Column): Column =
    (graft.ext.Dsir.md5Bucket60(concat(lit("spectral:"), id.cast("string")))
      % (2L * Quant.toLong + 1L)) - Quant.toLong

  private def toBig(r: org.apache.spark.sql.Row, i: Int): BigInt =
    if (r.isNullAt(i)) BigInt(0)
    else BigInt(r.getDecimal(i).toBigInteger)

  /** Half-up (away from zero) rounding — the SQL `round` semantics shared
    * by Spark and DuckDB. `math.round` is floor(x+0.5), which disagrees on
    * negative halves (round(−2.5): −2 vs −3) — a silent replay mismatch. */
  private def roundHalfUp(d: Double): Long =
    java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  private def bigDouble(b: BigInt): Double =
    new java.math.BigDecimal(b.bigInteger).doubleValue

  /** Per-step driver scalars from the five exact moments — ONE shared
    * implementation for the distributed and local paths, so the two can
    * never diverge: means, deflation ratio (micro-quantized), and the two
    * normalization constants. */
  private def stepScalars(s1: BigInt, s11: BigInt, s2: BigInt, s22: BigInt,
                          s12: BigInt, n: Long): (Long, Long, Long, Double, Double) = {
    val m1 = roundHalfUp(bigDouble(s1) / n)
    val m2 = roundHalfUp(bigDouble(s2) / n)
    val den = s11 - 2 * BigInt(m1) * s1 + BigInt(n) * BigInt(m1) * BigInt(m1)
    require(den > 0,
      "spectral iterate collapsed to zero (degenerate graph + seed)")
    val num = s12 - BigInt(m1) * s2 - BigInt(m2) * s1 +
      BigInt(n) * BigInt(m1) * BigInt(m2)
    val rq = roundHalfUp(bigDouble(num) / bigDouble(den) * 1e6)
    require(math.abs(rq) <= 100000000L,
      s"spectral deflation ratio out of range (rq=$rq): components " +
        "collinear — degenerate graph + seed")
    val szz2 = BigInt(1000000000000L) *
      (s22 - 2 * BigInt(m2) * s2 + BigInt(n) * BigInt(m2) * BigInt(m2)) -
      2 * BigInt(1000000L) * BigInt(rq) * num +
      BigInt(rq) * BigInt(rq) * den
    require(szz2 > 0,
      "second spectral component collapsed (x2 parallel to x1)")
    (m1, m2, rq, math.sqrt(bigDouble(den)), math.sqrt(bigDouble(szz2)))
  }

  /** JOINT orthogonal iteration: both components advance through ONE SpMV
    * join and ONE moments aggregate per step — half the corpus passes of
    * two sequential power runs (the 100 TB win; each step is one linear
    * pass whatever the scale) and a single action per step locally.
    *
    * Per step, from state (id, deg, x1, x2):
    *  1. y1 = (c−d)·x1 + Σ_N x1,  y2 likewise — integer SpMV, one join.
    *  2. ONE exact aggregate: Σy1, Σy1², Σy2, Σy2², Σy1y2 (decimal(38):
    *     order-independent; per-element products stay in int64 by the
    *     c < 3000 bound).
    *  3. driver (BigInt): means m1, m2 = round(Σy/n); z1 = y1 − m1 with
    *     ‖z1‖² = Σy1² − 2m1Σy1 + nm1² from moments; deflation ratio
    *     r = (y2−m2)·z1 / ‖z1‖² with numerator Σy1y2 − m1Σy2 − m2Σy1
    *     + nm1m2, MICRO-QUANTIZED to rq = round(r·1e6) so the deflated
    *     z2 = 1e6·(y2−m2) − rq·z1 is PURE INTEGER (no per-element
    *     rounding) and ‖z2‖² = 1e12·‖y2−m2‖² − 2e6·rq·num + rq²·‖z1‖² is
    *     again exact moments — no second aggregate.
    *  4. x1' = round(z1/‖z1‖·Q), x2' = round(z2/‖z2‖·Q) — one
    *     correctly-rounded divide/sqrt/multiply/half-up-round per element,
    *     identical in any engine.
    * Deflating x2 against the CURRENT x1 each step (not a finished v2) is
    * classical orthogonal iteration — same limit space, better mixing. */
  private def iterate(edges: DataFrame, state0: DataFrame, c: Long,
                      n: Long, iters: Int): DataFrame = {
    var state = state0
    var it = 0
    while (it < iters) {
      // ONE shuffle per step: the self term (c−d)·x rides the SAME
      // aggregation as the neighbor contributions (edges carry the
      // destination's degree as `ddeg`, so y re-emerges with its degree
      // via first() — constant within each group), replacing the
      // join-then-join-back shape's second exchange
      val fromNbrs = edges
        .join(state.select(col("id").as("src"),
          col("x1").as("__s1"), col("x2").as("__s2")), "src")
        .select(col("dst").as("id"), col("ddeg").as("deg"),
          col("__s1"), col("__s2"))
      val self = state.select(col("id"), col("deg"),
        ((lit(c) - col("deg")) * col("x1")).as("__s1"),
        ((lit(c) - col("deg")) * col("x2")).as("__s2"))
      // LAZY checkpoint: materializes inside the moments job; the
      // next-state map below reads the cache — one job per step
      val y = fromNbrs.union(self)
        .groupBy(col("id"))
        .agg(first(col("deg")).as("deg"),
          sum(col("__s1")).as("__y1"), sum(col("__s2")).as("__y2"))
        .localCheckpoint(false)
      val mo = y.agg(
        sum(col("__y1").cast("decimal(38,0)")).as("s1"),
        sum((col("__y1") * col("__y1")).cast("decimal(38,0)")).as("s11"),
        sum(col("__y2").cast("decimal(38,0)")).as("s2"),
        sum((col("__y2") * col("__y2")).cast("decimal(38,0)")).as("s22"),
        sum((col("__y1") * col("__y2")).cast("decimal(38,0)")).as("s12"))
        .head()
      val (m1, m2, rq, norm1, norm2) = stepScalars(
        toBig(mo, 0), toBig(mo, 1), toBig(mo, 2), toBig(mo, 3), toBig(mo, 4), n)
      val z1 = col("__y1") - lit(m1)
      val z2 = (col("__y2") - lit(m2)) * lit(1000000L) - lit(rq) * z1
      state = y
        .withColumn("x1", round(z1 / norm1 * Quant).cast("long"))
        .withColumn("x2", round(z2 / norm2 * Quant).cast("long"))
        .drop("__y1", "__y2")
        .localCheckpoint(false)
      it += 1
    }
    state
  }

  /** JVM twin of [[graft.ext.Dsir.md5Bucket60]] (15-hex-char prefix as a
    * non-negative long) for the local solve's seed. */
  private def md5Bucket60Local(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private def seedXLocal(id: Long): Long =
    md5Bucket60Local(s"spectral:$id") % (2L * Quant.toLong + 1L) - Quant.toLong

  /** Driver-local exact solve — the SAME algorithm in driver arrays:
    * identical integer SpMV, identical exact moments (BigInt), identical
    * [[stepScalars]], identical correctly-rounded per-element IEEE ops —
    * so the output is bit-identical to the distributed path (pinned by
    * SpectralSpec). Returns None when the input violates the contract the
    * distributed join enforces structurally (an edge endpoint outside the
    * node set) — the caller falls back rather than silently diverging. */
  private def solveLocal(es: Array[(Long, Long)], nodeIds: Array[Long],
                         iters: Int): Option[Array[(Long, Double, Double)]] = {
    val degMap = new java.util.HashMap[Long, Int]()
    es.foreach { case (_, d) => degMap.merge(d, 1, (a: Int, b: Int) => a + b) }
    // state = nodes ∩ deg (the distributed inner join), ascending id for
    // the canonical-sign scan
    val ids = nodeIds.filter(degMap.containsKey(_)).sorted
    val n = ids.length
    if (n < 3) return None // distributed path raises the proper error
    val pos = new java.util.HashMap[Long, Int](n * 2)
    var i = 0
    while (i < n) { pos.put(ids(i), i); i += 1 }
    val srcI = new Array[Int](es.length)
    val dstI = new Array[Int](es.length)
    i = 0
    while (i < es.length) {
      val s = pos.getOrDefault(es(i)._1, -1)
      val d = pos.getOrDefault(es(i)._2, -1)
      if (s < 0 || d < 0) return None // out-of-contract edge: fall back
      srcI(i) = s; dstI(i) = d; i += 1
    }
    val deg = ids.map(degMap.get(_).toLong)
    val c = 2L * deg.max
    require(c < 3000L,
      s"max kNN degree ${c / 2} too high for the integer SpMV bound — a " +
        "hub node is in nearly every top-k list; reduce k or dedup first")
    var x1 = ids.map(seedXLocal)
    var x2 = ids.map(id => seedXLocal(id + 1000000007L))
    var it = 0
    while (it < iters) {
      val y1 = new Array[Long](n); val y2 = new Array[Long](n)
      var j = 0
      while (j < n) {
        y1(j) = (c - deg(j)) * x1(j); y2(j) = (c - deg(j)) * x2(j); j += 1
      }
      j = 0
      while (j < es.length) {
        y1(dstI(j)) += x1(srcI(j)); y2(dstI(j)) += x2(srcI(j)); j += 1
      }
      var l1 = 0L; var l2 = 0L
      var s11 = BigInt(0); var s22 = BigInt(0); var s12 = BigInt(0)
      j = 0
      while (j < n) {
        l1 += y1(j); l2 += y2(j) // Σ|y| ≤ n·c·Quant < 2⁶³ at the caps
        s11 += BigInt(y1(j)) * BigInt(y1(j))
        s22 += BigInt(y2(j)) * BigInt(y2(j))
        s12 += BigInt(y1(j)) * BigInt(y2(j))
        j += 1
      }
      val (m1, m2, rq, norm1, norm2) =
        stepScalars(BigInt(l1), s11, BigInt(l2), s22, s12, n)
      val n1 = new Array[Long](n); val n2 = new Array[Long](n)
      j = 0
      while (j < n) {
        val z1 = y1(j) - m1
        val z2 = (y2(j) - m2) * 1000000L - rq * z1
        n1(j) = roundHalfUp(z1.toDouble / norm1 * Quant)
        n2(j) = roundHalfUp(z2.toDouble / norm2 * Quant)
        j += 1
      }
      x1 = n1; x2 = n2; it += 1
    }
    // canonical sign: first nonzero in ascending-id order positive
    def canon(x: Array[Long]): Array[Long] = {
      val f = x.find(_ != 0L)
      if (f.exists(_ < 0L)) x.map(-_) else x
    }
    val c1 = canon(x1); val c2 = canon(x2)
    Some(Array.tabulate(n)(j =>
      (ids(j), c1(j).toDouble / Quant, c2(j).toDouble / Quant)))
  }

  /** Canonical sign: first nonzero component in id order positive —
    * eigenvector sign is arbitrary; pin it so the result hash-compares.
    * Both components in ONE aggregate (`min_by` skips the null keys the
    * `when` leaves on zero entries → the value at the smallest nonzero
    * id). */
  private def canonicalize2(state: DataFrame): DataFrame = {
    val r = state.agg(
      min_by(col("x1"), when(col("x1") =!= 0L, col("id"))).as("f1"),
      min_by(col("x2"), when(col("x2") =!= 0L, col("id"))).as("f2")).head()
    val flip1 = !r.isNullAt(0) && r.getLong(0) < 0
    val flip2 = !r.isNullAt(1) && r.getLong(1) < 0
    state
      .withColumn("x1", if (flip1) -col("x1") else col("x1"))
      .withColumn("x2", if (flip2) -col("x2") else col("x2"))
  }

  /** 2-D spectral embedding of a vector column: one row per input —
    * `(id, e1, e2)` where (e1, e2) are the Fiedler-vector pair scaled back
    * to [−1, 1] (iterate / Quant — a dyadic-free exact division by 1e6 is
    * a single correctly-rounded op, replayed identically). */
  def embed2d(emb: DataFrame, idCol: String, vecCol: String,
              k: Int = DefaultK, iters: Int = DefaultIters): DataFrame =
    embed2dFromEdges(knnEdges(emb, idCol, vecCol, k),
      emb.select(col(idCol).cast("long").as("id")), iters)

  /** Iteration entry with INJECTED candidate edges — the 100 TB path pairs
    * this with LSH/IVF-generated neighbor pairs instead of the O(n²)
    * brute-force [[knnEdges]]; the iteration is agnostic to how edges were
    * found. Contract: `edges` has long (src, dst) columns, is SYMMETRIC,
    * self-loop-free, and covers every node of `nodes` (an `id` column)
    * with degree ≥ 1. */
  def embed2dFromEdges(edges: DataFrame, nodes: DataFrame,
                       iters: Int = DefaultIters,
                       localSolveMaxNodes: Long = LocalSolveMaxNodes): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    var eSel: DataFrame = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    // small-graph fast path: `iters` rounds of near-empty distributed
    // stages are pure scheduler overhead below the thresholds — solve in
    // driver arrays (bit-identical; see solveLocal) and skip every
    // checkpoint/job of the distributed plan. The edge plan is
    // checkpointed BEFORE the take() probe, so a fallthrough (oversize or
    // out-of-contract input) reuses the materialized edges instead of
    // recomputing the (possibly O(n²)) upstream plan.
    if (localSolveMaxNodes > 0 &&
        nodes.agg(count(lit(1))).head().getLong(0) <= localSolveMaxNodes) {
      eSel = eSel.localCheckpoint(true)
      val es = eSel.take(LocalSolveMaxEdges.toInt + 1)
      if (es.length <= LocalSolveMaxEdges) {
        val ids = nodes.select(col("id").cast("long")).collect()
          .map(_.getLong(0))
        val solved =
          solveLocal(es.map(r => (r.getLong(0), r.getLong(1))), ids, iters)
        if (solved.isDefined) {
          val spark = edges.sparkSession
          import spark.implicits._
          return solved.get.toSeq.toDF("id", "e1", "e2")
        }
      }
    }
    // partition the edge list by src ONCE: every step's SpMV joins state
    // on id = src, so the pre-partitioning is reused across all `iters`
    // passes (and a 1-partition edge checkpoint would serialize every
    // step — measured 3× the wall). defaultParallelism ≈ cluster cores.
    val e0 = eSel
      .repartition(edges.sparkSession.sparkContext.defaultParallelism,
        col("src"))
      .localCheckpoint(true)
    val deg = e0.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("deg"))
    // each edge carries its DESTINATION's degree so the per-step
    // aggregation can re-emit (id, deg) without a second join; restore
    // the src partitioning the per-step state join keys on
    val e = e0
      .join(deg.select(col("id").as("dst"), col("deg").as("ddeg")), "dst")
      .select(col("src"), col("dst"), col("ddeg"))
      .repartition(edges.sparkSession.sparkContext.defaultParallelism,
        col("src"))
      .localCheckpoint(true)
    val base = nodes.select(col("id").cast("long").as("id"))
      .join(deg, Seq("id"), "inner") // symmetric edges → every node present
      .withColumn("x1", seedX(col("id")))
      .withColumn("x2", seedX(col("id") + 1000000007L))
      .localCheckpoint(true)
    val stats = base.agg(max(col("deg")), count(lit(1))).head()
    val c = 2L * stats.getLong(0) // Gershgorin: λmax(L) ≤ 2Δ → M = cI−L PSD
    val n = stats.getLong(1)
    require(n >= 3, s"spectral embedding needs >= 3 rows, got $n")
    // long-arithmetic bound: |y| ≤ c·Quant and the exact sums square it in
    // int64 before the decimal cast — keep (c·Quant)² under 2⁶³
    require(c < 3000L,
      s"max kNN degree ${c / 2} too high for the integer SpMV bound — a " +
        "hub node is in nearly every top-k list; reduce k or dedup first")
    // contract enforcement (one setup job): every edge endpoint must be an
    // embedded node — a dst outside `nodes` would otherwise inject phantom
    // rows into the per-step aggregation (the moments divide by n =
    // |nodes ∩ deg|), and a src outside would silently drop contributions.
    // solveLocal bails to here on the same violation; the error is the
    // single behavior for both paths.
    val strays = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .join(base.select(col("id")), Seq("id"), "left_anti")
    require(strays.isEmpty,
      "edges reference ids outside the node set — the edge contract " +
        "(symmetric, self-loop-free, endpoints ⊆ nodes) is violated; " +
        "filter the candidate pairs to the embedded node set first")

    // size the iteration's partitioning to the GRAPH, not the session: a
    // small graph over the session's default width pays `iters` rounds of
    // near-empty-stage scheduling (the dominant cost at gate scale), a
    // huge one needs width — ~50k nodes per partition, bounded above
    val ip = math.max(1L, math.min(n / 50000L + 1L, 20000L)).toInt
    val eIt =
      if (ip * 2 < e.rdd.getNumPartitions)
        e.repartition(ip, col("src")).localCheckpoint(true)
      else e
    val baseIt =
      if (ip * 2 < base.rdd.getNumPartitions)
        base.repartition(ip, col("id")).localCheckpoint(true)
      else base

    val fin = canonicalize2(iterate(eIt, baseIt, c, n, iters))
    fin.select(col("id"),
      (col("x1").cast("double") / Quant).as("e1"),
      (col("x2").cast("double") / Quant).as("e2"))
  }
}
