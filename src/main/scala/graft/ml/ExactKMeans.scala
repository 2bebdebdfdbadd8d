package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantized-exact distributed k-means (Lloyd's algorithm) over a vector
  * column — deterministic, bit-replayable clustering. The pieces:
  *
  *  - INIT: centroids are CORPUS MEMBERS at caller-given row ids (the
  *    [[graft.spec.SemanticDedupOp]] falsifiability contract — explicit
  *    member ids instead of a seed-dependent sampler), quantized to 1e-6
  *    integer units.
  *  - ASSIGN: nearest centroid by squared distance, computed as the integer
  *    argmax of `qx·qm_c − ‖qm_c‖²/2` (the ‖qx‖² term is constant per row
  *    and drops out of the argmin) — EXACTLY
  *    [[QuantizedCentroidModel.exactScores]]'s arithmetic, every partial
  *    sum an integer below 2⁵³, ties first-max (smallest cell id).
  *  - UPDATE: per-(cell, dim) integer mean `round(sum/count)` — the same
  *    half-up round the SQL replay uses. EMPTY cells KEEP their previous
  *    centroid (deterministic, and replayable as a LEFT-join coalesce).
  *
  * Every step replays bit-for-bit in DuckDB (the q_kmeans oracle unrolls
  * all iterations), unlike Spark ML KMeans whose result depends on seed,
  * partitioning, and float summation order.
  *
  * Scale shape: per iteration ONE corpus pass — assignment is map-only
  * over k×dim plan literals (no join, no shuffle), the update shuffles
  * only (cell, dim) integer partials (k × dim × partitions rows — metadata
  * regardless of corpus size); driver state is the k×dim centroid matrix.
  * This is the 100 TB clustering shape a curation pipeline needs for
  * cluster-balanced sampling, domain discovery, and honest
  * [[graft.ext.Dedup.semanticDedup]] / IVF centroids without giving up
  * SQL replay.
  */
object ExactKMeans {

  /** Fitted model: `qm(cell)(dim)` in 1e-6 units, plus the score-time
    * input bound. */
  final case class Fit(qm: Array[Array[Long]], maxAbsInput: Double) {
    def k: Int = qm.length
  }

  /** Quantized member vectors at `ids`, cell index = position in `ids`
    * (caller-controlled, externally replayable). Hard error on a missing
    * id or an out-of-bound member. */
  def centroidsByIds(df: DataFrame, idCol: String, vecCol: String,
                     ids: Seq[Long], maxAbs: Double = 1.0): Array[Array[Long]] = {
    require(ids.nonEmpty, "centroid ids must be non-empty")
    require(ids.distinct.length == ids.length, s"duplicate centroid ids: $ids")
    val rows = df
      .filter(col(idCol).cast("long").isin(ids: _*))
      .select(col(idCol).cast("long").as("__id"),
        transform(col(vecCol), x => round(x.cast("double") * 1e6).cast("long"))
          .as("__q"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Long](1).toArray)
      .toMap
    val missing = ids.filterNot(rows.contains)
    require(missing.isEmpty, s"centroid ids not found in corpus: $missing")
    val qm = ids.map(rows).toArray
    Multiclass.requireCentroidBound(qm, maxAbs)
    qm
  }

  private def scoresCol(vec: Column, qm: Array[Array[Long]],
                        maxAbs: Double): Column =
    QuantizedCentroidModel.exactScores(vec.cast("array<double>"), qm, maxAbs)

  /** Spark's `round` / DuckDB `round` half-up semantics on the driver
    * (BigDecimal shortest-repr, HALF_UP — see
    * [[graft.ml.Spectral]]'s roundHalfUp note). */
  private def roundHalfUp(d: Double): Long =
    java.math.BigDecimal.valueOf(d)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** Lloyd iterations from explicit member init. `iters = 0` is pure
    * member-centroid assignment (the SemDeDup regime).
    *
    * The update is a grouped per-dimension LONG SUM over the quantized
    * array: the cell argmax and the quantized vector evaluate ONCE per
    * row in a child projection (an explode-then-group form re-shuffles
    * once per exploded DIMENSION — measured 64× slower at dim=64; the
    * Aggregate's `element_at` reads reference the PROJECTED array
    * attribute, so the k-dot scoring never re-evaluates), and the
    * shuffle carries only k × dim partial longs per partition —
    * metadata at any corpus size. Integer sums are EXACT by type
    * (round 20: the previous `Summarizer.sum` is mean-based internally
    * and drifted integer sums by ~1 ulp, flipping round-half centroid
    * updates against the exact SQL replay at some corpus sizes); the
    * per-cell `count·maxAbs·1e6` long-overflow bound is enforced per
    * pass. */
  def fit(df: DataFrame, idCol: String, vecCol: String, initIds: Seq[Long],
          iters: Int, maxAbs: Double = 1.0): Fit = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    var qm = centroidsByIds(df, idCol, vecCol, initIds, maxAbs)
    val dim = qm.head.length
    val cap = math.round(maxAbs * 1e6)
    var it = 0
    while (it < iters) {
      val s = scoresCol(col(vecCol), qm, maxAbs)
      val qx = transform(col(vecCol).cast("array<double>"),
        x => round(x * 1e6).cast("long"))
      val sumCols = (0 until dim).map(d =>
        sum(element_at(col("__qx"), d + 1)).as(s"__s$d"))
      val agg = df
        .select((array_position(s, array_max(s)) - 1).cast("int").as("__cell"),
          qx.as("__qx"))
        .groupBy(col("__cell"))
        .agg(count(lit(1)).as("__n"), sumCols: _*)
        .collect()
      val next = qm.map(_.clone()) // empty cells carry their previous value
      agg.foreach { r =>
        val cell = r.getInt(0)
        val cnt = r.getLong(1)
        require(cnt.toDouble * cap < Long.MaxValue.toDouble,
          s"cell $cell has $cnt members: the exact-sum bound " +
            s"count*maxAbs*1e6 < 2^63 is violated — raise the quantum or " +
            "shard the corpus")
        var d = 0
        while (d < dim) {
          // exact long sum -> ONE double division -> half-up: the same
          // two roundings, in the same order, as the SQL replay
          next(cell)(d) = roundHalfUp(r.getLong(2 + d).toDouble / cnt)
          d += 1
        }
      }
      qm = next
      it += 1
    }
    Fit(qm, maxAbs)
  }

  /** Final assignment: `(id, cell, score)` — cell = argmax cell index
    * (first-max), score = the winning `qx·qm − ‖qm‖²/2` quotient (exact
    * integer arithmetic, one division). Map-only over plan literals. */
  def assign(df: DataFrame, idCol: Column, vec: Column, fit: Fit): DataFrame = {
    val s = scoresCol(vec, fit.qm, fit.maxAbsInput)
    df.select(idCol.as("id"), s.as("__s"))
      .select(col("id"),
        (array_position(col("__s"), array_max(col("__s"))) - 1)
          .cast("int").as("cell"),
        array_max(col("__s")).as("score"))
  }

  /** Assignment carrying the EXACT squared distance: `(id, cell, d2)` —
    * `d2 = Σ_d (qx_d − qm_d)²` in squared 1e-6 units, a pure LONG
    * integer (each term ≤ (2·maxAbs·1e6)², the sum far below 2⁶³ for any
    * real dim). The cell is the first argmin of d2 — provably the same
    * cell as [[assign]]'s score argmax up to double-rounding of the score
    * quotient, but comparisons here never leave integer arithmetic, so
    * WITHIN-cell orderings (the [[graft.ext.Diversify]] prototypicality
    * rank) are collapse-free and replay as integer SQL. Map-only over
    * k×dim plan literals, like [[assign]]. */
  /** EXACT pruned assignment — identical `(id, cell, d2)` to
    * [[assignByDistance]] at any k (equality is test-pinned, including
    * the first-min tie-break), but per-row cost O((g + probed)·dim)
    * instead of O(k·dim): the k centroids are grouped driver-side into
    * g ≈ √k balls (center + max-member radius), and for a row x the
    * triangle inequality d(x,m) ≥ d(x,c_j) − r_j skips every group whose
    * lower bound already exceeds the best exact distance found — a
    * PRUNING rule, never an approximation (the bound comparison is done
    * with an integer-safe slack, so float sqrt error can only UNDER-prune).
    * This is the D4 large-k regime ([[graft.ext.Diversify]] routes k ≥
    * its threshold here): at k = 10⁴ the dense form is ~10⁴ plan literals
    * per row — past codegen limits and 30–50× this path's work. One
    * mapPartitions-free UDF pass, no join, no shuffle; driver state is
    * the same k×dim matrix the dense form already broadcasts as literals.
    */
  def assignByDistancePruned(df: DataFrame, idCol: Column, vec: Column,
                             fit: Fit): DataFrame = {
    val qm = fit.qm
    val maxAbs = fit.maxAbsInput
    require(qm.nonEmpty, "assignByDistancePruned: empty centroid set")
    val dim = qm(0).length
    val g = math.max(1, math.ceil(math.sqrt(qm.length.toDouble)).toInt)
    val (centers, members, r2) = groupCentroids(qm, g)
    val assignUdf = udf { v: scala.collection.Seq[Double] =>
      if (v == null) null
      else {
        require(v.length == dim,
          s"ExactKMeans: vector length ${v.length} != centroid dim $dim")
        val q = new Array[Long](dim)
        var i = 0
        while (i < dim) {
          val x = v(i)
          if (math.abs(x) > maxAbs) throw new IllegalArgumentException(
            s"ExactKMeans: |feature| exceeds maxAbsInput=$maxAbs " +
              s"(quantized-exact contract): $x")
          q(i) = roundHalfUp(x * 1e6)
          i += 1
        }
        def d2To(m: Array[Long]): Long = {
          var s = 0L; var d = 0
          while (d < dim) { val t = q(d) - m(d); s += t * t; d += 1 }
          s
        }
        val dxc = centers.map(d2To)
        // nearest-group-first visit order maximizes early pruning
        val order = centers.indices.sortBy(dxc(_))
        var best = Long.MaxValue
        var bestIdx = -1
        for (j <- order) {
          // prune group j iff sqrt(dxc) − sqrt(r2) > sqrt(best), i.e.
          // dxc > best + r2 + 2·sqrt(best·r2); the +4.0 slack covers the
          // double sqrt's rounding (operands ≤ 2⁵³), making the prune
          // strictly conservative over the exact integer inequality
          val skip = best != Long.MaxValue &&
            dxc(j).toDouble >
              best.toDouble + r2(j).toDouble +
                2.0 * math.sqrt(best.toDouble * r2(j).toDouble) + 4.0
          if (!skip) {
            for (ci <- members(j)) {
              val d2 = d2To(qm(ci))
              if (d2 < best || (d2 == best && ci < bestIdx)) {
                best = d2; bestIdx = ci
              }
            }
          }
        }
        (bestIdx, best)
      }
    }
    df.select(idCol.as("id"), assignUdf(vec.cast("array<double>")).as("__a"))
      .select(col("id"), col("__a._1").as("cell"), col("__a._2").as("d2"))
  }

  /** Driver-side Lloyd grouping of the centroid matrix into `g` balls:
    * (group centers, member centroid indices per group, squared radius
    * per group). Deterministic: evenly-strided member seeds, 5 integer
    * Lloyd rounds with first-min ties and half-up rounded means, empty
    * groups keep their center. Cost O(k·g·dim·rounds) driver flops —
    * trivial next to one executor task at the k this serves. */
  private def groupCentroids(qm: Array[Array[Long]], g: Int)
      : (Array[Array[Long]], Array[Array[Int]], Array[Long]) = {
    val k = qm.length
    val dim = qm(0).length
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var d = 0
      while (d < dim) { val t = a(d) - b(d); s += t * t; d += 1 }
      s
    }
    var centers = Array.tabulate(math.min(g, k))(i =>
      qm((i.toLong * k / g).toInt).clone())
    var assign = new Array[Int](k)
    for (_ <- 0 until 5) {
      var c = 0
      while (c < k) {
        var best = Long.MaxValue; var bi = 0; var j = 0
        while (j < centers.length) {
          val dd = d2(qm(c), centers(j))
          if (dd < best) { best = dd; bi = j }
          j += 1
        }
        assign(c) = bi
        c += 1
      }
      centers = centers.indices.map { j =>
        val mem = (0 until k).filter(assign(_) == j)
        if (mem.isEmpty) centers(j)
        else Array.tabulate(dim) { d =>
          roundHalfUp(mem.map(ci => qm(ci)(d).toDouble).sum / mem.length)
        }
      }.toArray
    }
    val members = centers.indices
      .map(j => (0 until k).filter(assign(_) == j).toArray).toArray
    val r2 = centers.indices.map { j =>
      if (members(j).isEmpty) 0L
      else members(j).map(ci => d2(qm(ci), centers(j))).max
    }.toArray
    (centers, members, r2)
  }

  def assignByDistance(df: DataFrame, idCol: Column, vec: Column,
                       fit: Fit): DataFrame = {
    val maxAbs = fit.maxAbsInput
    val qx = transform(vec.cast("array<double>"), x =>
      when(abs(x) > maxAbs, raise_error(concat(
        lit(s"ExactKMeans: |feature| exceeds maxAbsInput=$maxAbs " +
          "(quantized-exact contract): "), x.cast("string"))))
        .otherwise(round(x * 1e6)))
    // d2_c = ‖qx‖² − 2·qx·qm_c + ‖qm_c‖² — every term an INTEGER-valued
    // double below 2⁵³ (dim·(2·maxAbs·1e6)² ≈ 2.6e14 at dim 64), so the
    // doubles ARE the integers and the final long cast is exact. The
    // per-cell work is one codegen'd dot against an array literal — a
    // zip_with/aggregate form allocates an intermediate array per CELL
    // per ROW and measured 23× slower at k=1600 (the D4 regime where k
    // grows with the corpus: 803 → 34 s at the 100× ScaleProbe decade).
    // ‖qx‖² and the quantized vector are NAMED columns: one evaluation
    // per row, not per cell.
    val d2s = array(fit.qm.map { qmc =>
      var ss = 0.0 // exact driver-side Σqm² (each term ≤ (maxAbs·1e6)²)
      var i = 0
      while (i < qmc.length) { ss += qmc(i).toDouble * qmc(i); i += 1 }
      val qmLit = typedlit(qmc.map(_.toDouble).toSeq)
      (col("__qq") - lit(2.0) * graft.ext.VectorKernels.dot(col("__qx"), qmLit)
        + lit(ss)).cast("long")
    }: _*)
    df.select(idCol.as("id"), qx.as("__qx"))
      .withColumn("__qq",
        aggregate(col("__qx"), lit(0.0), (a, x) => a + x * x))
      .select(col("id"), d2s.as("__d"))
      .select(col("id"),
        (array_position(col("__d"), array_min(col("__d"))) - 1)
          .cast("int").as("cell"),
        array_min(col("__d")).as("d2"))
  }
}
