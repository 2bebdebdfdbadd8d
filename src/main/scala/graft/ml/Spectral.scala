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
  * — by fixed-iteration power iteration with continuous centering
  * (deflates the trivial all-ones eigenvector) and, for the second
  * component, continuous deflation against the first.
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
  val DefaultIters = 12

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
    val c = emb.select(col(idCol).cast("long").as("corpus_id"),
      col(vecCol).as("__cv"),
      graft.ext.Similarity.norm(col(vecCol)).as("__cn"))
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

  /** One power-iteration pass of `iters` steps over the integer iterate.
    * `state` columns: (id, deg, x [, v2]); `svRef`/`svvRef` are Σv₂ and
    * Σv₂² when deflating. Returns the final iterate column frame
    * (id, deg, x [, v2]). */
  private def bigDouble(b: BigInt): Double =
    new java.math.BigDecimal(b.bigInteger).doubleValue

  private def iterate(edges: DataFrame, state0: DataFrame, c: Long, n: Long,
                      iters: Int, deflate: Boolean,
                      sv: BigInt, svv: BigInt): DataFrame = {
    var state = state0
    var it = 0
    while (it < iters) {
      // SpMV: y_i = (c − d_i)·x_i + Σ_{j ∈ N(i)} x_j — all integer
      val nbr = edges
        .join(state.select(col("id").as("src"), col("x").as("__xs")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("__xs")).as("__ns"))
      // LAZY checkpoint: materializes with the first aggregate's job (one
      // job covers join + cache), and the next-state map below reads the
      // cache — the per-iteration job count is 1 (2 when deflating), not 4
      val y = state.join(nbr, Seq("id"), "left")
        .withColumn("__y",
          (lit(c) - col("deg")) * col("x") + coalesce(col("__ns"), lit(0L)))
        .drop("x", "__ns")
        .localCheckpoint(false)
      // exact global sums (decimal(38): order-independent integer sums)
      val agg1 = y.agg(
        sum(col("__y").cast("decimal(38,0)")).as("sy"),
        sum((if (deflate) col("__y") * col("v2") else col("__y") * col("__y"))
          .cast("decimal(38,0)")).as("s2"))
        .head()
      val syB = toBig(agg1, 0)
      // centering constant: m = round(Σy / n) — one exact-int cast + one
      // correctly-rounded divide + half-up round, identical in any engine
      val m = roundHalfUp(bigDouble(syB) / n)
      val (zCol, szz) =
        if (deflate) {
          // deflation r = (y−m)·v₂ / v₂·v₂ = (Σy·v₂ − m·Σv₂) / Σv₂²
          val num = toBig(agg1, 1) - BigInt(m) * sv
          val r = bigDouble(num) / bigDouble(svv)
          // the per-element round(r·v₂) makes Σz² irreducible to moments —
          // one extra exact aggregate over the cached y
          val zc = col("__y") - lit(m) - round(lit(r) * col("v2")).cast("long")
          (zc, toBig(y.agg(sum((zc * zc).cast("decimal(38,0)"))).head(), 0))
        } else {
          // Σ(y−m)² = Σy² − 2mΣy + n·m² — exact integer identity: the
          // centered norm needs NO second pass
          val zc = col("__y") - lit(m)
          (zc, toBig(agg1, 1) - 2 * BigInt(m) * syB +
            BigInt(n) * BigInt(m) * BigInt(m))
        }
      require(szz > 0,
        "spectral iterate collapsed to zero (degenerate graph + seed)")
      val norm = math.sqrt(bigDouble(szz))
      state = y
        .withColumn("x", round(zCol / norm * Quant).cast("long"))
        .drop("__y")
        .localCheckpoint(false)
      it += 1
    }
    state
  }

  /** Canonical sign: first nonzero component in id order positive —
    * eigenvector sign is arbitrary; pin it so the result hash-compares. */
  private def canonicalize(state: DataFrame, xCol: String): DataFrame = {
    val firstNonZero = state.filter(col(xCol) =!= 0L)
      .orderBy(col("id")).select(col(xCol)).limit(1).collect()
    val flip = firstNonZero.nonEmpty && firstNonZero(0).getLong(0) < 0
    if (flip) state.withColumn(xCol, -col(xCol)) else state
  }

  /** 2-D spectral embedding of a vector column: one row per input —
    * `(id, e1, e2)` where (e1, e2) are the Fiedler-vector pair scaled back
    * to [−1, 1] (iterate / Quant — a dyadic-free exact division by 1e6 is
    * a single correctly-rounded op, replayed identically). */
  def embed2d(emb: DataFrame, idCol: String, vecCol: String,
              k: Int = DefaultK, iters: Int = DefaultIters): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val edges = knnEdges(emb, idCol, vecCol, k).localCheckpoint(true)
    val deg = edges.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("deg"))
    val base = emb.select(col(idCol).cast("long").as("id"))
      .join(deg, Seq("id"), "inner") // every node has ≥ k out-edges → present
      .withColumn("x", seedX(col("id")))
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

    val v2state = canonicalize(
      iterate(edges, base, c, n, iters, deflate = false, BigInt(0), BigInt(0)),
      "x")
    val v2 = v2state.select(col("id"), col("deg"), col("x").as("v2"))
      .localCheckpoint(true)
    val vAgg = v2.agg(
      sum(col("v2").cast("decimal(38,0)")).as("sv"),
      sum((col("v2") * col("v2")).cast("decimal(38,0)")).as("svv")).head()
    val (sv, svv) = (toBig(vAgg, 0), toBig(vAgg, 1))
    require(svv > 0, "first spectral component is zero")

    val v3state = canonicalize(
      iterate(edges, v2.withColumn("x", seedX(col("id") + 1000000007L)),
        c, n, iters, deflate = true, sv, svv),
      "x")
    v2.join(v3state.select(col("id"), col("x").as("v3")), "id")
      .select(col("id"),
        (col("v2").cast("double") / Quant).as("e1"),
        (col("v3").cast("double") / Quant).as("e2"))
  }
}
