package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009,
  * "Reciprocal Rank Fusion outperforms Condorcet and individual rank
  * learning methods"): fuse a SPARSE ranked list (e.g. [[Bm25.rank]]) with
  * a DENSE one (e.g. [[Similarity.bruteForceTopK]] over
  * [[TextAnalysis.hashedTfEmbedding]] vectors) by
  * `score(d) = Σ_lists 1/(rrfK + rank_list(d))` — the standard first stage
  * of a modern retrieval stack, and the piece that turns the engine's
  * independent BM25 and ANN families into one hybrid search.
  *
  * == Determinism ==
  * Each input contributes `1/(rrfK + rank)` — two IEEE double divisions
  * summed in a FIXED order (sparse first, then dense; a document absent
  * from a list contributes exactly 0.0). The fused score is quantized to
  * pico-units (`round(score·1e12)` — max 2/(rrfK+1) ≈ 0.033, so the
  * integer stays tiny) and ordering is (quantized DESC, id ASC): the whole
  * computation replays bit-for-bit in SQL from the same two ranked lists.
  *
  * == 100 TB design ==
  * The inputs are top-K lists — K rows each, BOUNDED regardless of corpus
  * size; the heavy lifting (corpus-wide scoring) happened upstream in the
  * map-side BM25 / brute-cosine passes with TakeOrdered cuts. The fusion
  * itself is a K-row full-outer join + a K-row sort: metadata. (The final
  * `row_number` window is global but runs over the ≤ n fused survivors —
  * same bounded shape as [[Bm25.rank]]'s output ranking. Multi-query
  * fusion would partition every step by `query_id`; the single-query form
  * is the gate shape.)
  */
object Retrieval {

  /** Pico-unit quantum for fused-score ranking. */
  val Quant: Double = 1e12

  /** Fuse two ranked lists `(idCol, rank)` into the top-`n` hybrid result
    * `(rank, <idCol>, rrf_u12, sparse_rank, dense_rank)` — `rrf_u12` the
    * pico-quantized RRF score, per-list ranks NULL where the document was
    * outside that list's top-K. */
  def rrfFuse(sparse: DataFrame, dense: DataFrame, idCol: String,
              rrfK: Int, n: Int): DataFrame = {
    require(rrfK >= 0, s"rrfK must be >= 0, got $rrfK")
    require(n >= 1, s"n must be >= 1, got $n")
    val a = sparse.select(col(idCol).as("__id"),
      col("rank").cast("long").as("sparse_rank"))
    val b = dense.select(col(idCol).as("__id"),
      col("rank").cast("long").as("dense_rank"))
    // both sides are top-K lists — bounded — so the join is trivially
    // broadcastable; `using`-join coalesces the id across the full outer
    val j = a.join(b, Seq("__id"), "full_outer")
    def contrib(r: Column): Column = coalesce(
      lit(1.0) / (lit(rrfK).cast("double") + r.cast("double")), lit(0.0))
    // FIXED addition order: sparse + dense — mirrored in the oracle
    val fused = contrib(col("sparse_rank")) + contrib(col("dense_rank"))
    val top = j
      .withColumn("rrf_u12", round(fused * Quant).cast("long"))
      .orderBy(col("rrf_u12").desc, col("__id"))
      .limit(n)
    top.select(
      row_number().over(Window.orderBy(col("rrf_u12").desc, col("__id")))
        .cast("long").as("rank"),
      col("__id").as(idCol), col("rrf_u12"),
      col("sparse_rank"), col("dense_rank"))
  }

  /** BATCH fusion: per-query RRF over two multi-query ranked lists
    * `(queryCol, idCol, rank)` — the serving shape that pairs with
    * [[Bm25.rankMany]] and the multi-query [[Similarity.bruteForceTopK]].
    * Result `(<queryCol>, rank, <idCol>, rrf_u12, sparse_rank,
    * dense_rank)`, top-`n` per query.
    *
    * Same arithmetic as [[rrfFuse]] (one definition of the contribution,
    * fixed sparse-then-dense order); every window is PARTITIONED by the
    * query — with per-query lists bounded at K the join carries
    * ≤ |queries|·2K rows and the rank window is the two-phase
    * WindowGroupLimit cut, so nothing scales with the corpus. */
  def rrfFusePerQuery(sparse: DataFrame, dense: DataFrame,
                      queryCol: String, idCol: String,
                      rrfK: Int, n: Int): DataFrame = {
    require(rrfK >= 0, s"rrfK must be >= 0, got $rrfK")
    require(n >= 1, s"n must be >= 1, got $n")
    val a = sparse.select(col(queryCol).cast("long").as("__qid"),
      col(idCol).as("__id"), col("rank").cast("long").as("sparse_rank"))
    val b = dense.select(col(queryCol).cast("long").as("__qid"),
      col(idCol).as("__id"), col("rank").cast("long").as("dense_rank"))
    val j = a.join(b, Seq("__qid", "__id"), "full_outer")
    def contrib(r: Column): Column = coalesce(
      lit(1.0) / (lit(rrfK).cast("double") + r.cast("double")), lit(0.0))
    val fused = contrib(col("sparse_rank")) + contrib(col("dense_rank"))
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("rrf_u12").desc, col("__id"))
    j.withColumn("rrf_u12", round(fused * Quant).cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
      .select(col("__qid").as(queryCol), col("rank"), col("__id").as(idCol),
        col("rrf_u12"), col("sparse_rank"), col("dense_rank"))
  }

  /** DCG discount weights for ranks 1..k in integer micro-units:
    * `round(1e6 / log2(rank+1))`. Computed ONCE driver-side and embedded
    * as plan literals, so no engine (Spark or an external SQL replay)
    * evaluates a transcendental at query time — the discipline that
    * keeps ranking metrics exact-integer and cross-engine hashable. */
  def dcgWeightsU6(k: Int): Seq[Long] =
    (1 to k).map(r => math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))

  /** Ranking-quality metrics — MRR and nDCG@k of a ranked list against
    * per-document integer relevance gains: the measurement that gates a
    * ranking change (BM25 tuning, hybrid fusion weights, a new ANN
    * nprobe) before it ships.
    *
    * Output is ONE row `(k, n_rel, dcg_u6, idcg_u6, ndcg_u6, mrr_u6)`,
    * all exact integers: per-rank DCG contributions are
    * `gain · dcgWeightsU6(rank)` (integer products), nDCG and MRR use
    * integer floor division in micro-units. `idcg_u6` is computed from
    * the corpus-wide ideal top-k gains (collected — k rows by
    * construction).
    *
    * == 100 TB design ==
    * The retrieved leg is bounded by k. The gains frame is corpus-sized
    * but flows through exactly one TakeOrdered top-k (ideal) and one
    * broadcast-sized join against the k retrieved ids — no corpus
    * shuffle. Per-query cost = the upstream ranking probe + one narrow
    * top-k; a full eval harness maps this over a bounded query sample.
    */
  def rankingMetrics(topk: DataFrame, rankCol: String, idCol: String,
                     gains: DataFrame, gainIdCol: String, gainCol: String,
                     k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val ws = dcgWeightsU6(k)
    val g = gains.select(col(gainIdCol).as(idCol),
      col(gainCol).cast("long").as("__gain"))
    val weightCol = element_at(array(ws.map(lit): _*),
      col(rankCol).cast("int"))
    val scored = topk.filter(col(rankCol) <= k).join(g, idCol)
      .select(
        (col("__gain") * weightCol).as("__contrib"),
        col("__gain"),
        when(col("__gain") > 0, col(rankCol).cast("long")).as("__rel_rank"))
    val idealGains = g.orderBy(col("__gain").desc, col(idCol)).limit(k)
      .select(col("__gain")).collect().map(_.getLong(0))
    val idcg = idealGains.zip(ws).map { case (a, b) => a * b }.sum
    scored.agg(
        coalesce(sum(col("__contrib")), lit(0L)).as("dcg_u6"),
        min(col("__rel_rank")).as("__first_rel"),
        coalesce(sum(when(col("__gain") > 0, 1L).otherwise(0L)), lit(0L))
          .as("n_rel"))
      .select(lit(k.toLong).as("k"), col("n_rel"), col("dcg_u6"),
        lit(idcg).as("idcg_u6"),
        when(lit(idcg) > 0, expr(s"dcg_u6 * 1000000 div $idcg"))
          .otherwise(lit(0L)).as("ndcg_u6"),
        when(col("__first_rel").isNull, lit(0L))
          .otherwise(expr("1000000 div __first_rel")).as("mrr_u6"))
  }

  /** GROUPED form of [[rankingMetrics]] — per-query MRR and nDCG@k over a
    * multi-query ranked list `(queryCol, rankCol, idCol)` against
    * per-query relevance gains `(gainQueryCol, gainIdCol, gainCol)`: the
    * shape a real relevance sweep runs (every query of the eval set
    * scored in one plan, e.g. over [[rrfFusePerQuery]] output).
    *
    * One row PER QUERY of the ranked input:
    * `(<queryCol>, k, n_rel, dcg_u6, idcg_u6, ndcg_u6, mrr_u6)` — same
    * exact-integer arithmetic as the single-query form (shared
    * [[dcgWeightsU6]] plan literals, micro-unit floor division). A query
    * whose retrieved docs match no gains row still gets its row
    * (all-zero metrics); `idcg_u6` comes from that query's own ideal
    * top-k gains.
    *
    * == 100 TB design ==
    * Every step is partitioned by the query: the retrieved leg is
    * |queries|·k rows by construction; the gains frame (the judged qrels
    * set — orders of magnitude smaller than the corpus) flows through one
    * per-query WindowGroupLimit top-k (the ideal leg) and one join
    * against the bounded retrieved leg. Nothing is collected and nothing
    * scales with the corpus — the corpus-sized work happened upstream in
    * the ranking probes. */
  def rankingMetricsPerQuery(topk: DataFrame, queryCol: String,
                             rankCol: String, idCol: String,
                             gains: DataFrame, gainQueryCol: String,
                             gainIdCol: String, gainCol: String,
                             k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    val warr = array(dcgWeightsU6(k).map(lit): _*)
    val g = gains.select(col(gainQueryCol).cast("long").as("__qid"),
      col(gainIdCol).as("__id"), col(gainCol).cast("long").as("__gain"))
    val tk = topk.select(col(queryCol).cast("long").as("__qid"),
      col(idCol).as("__id"), col(rankCol).cast("long").as("__rank"))
      .filter(col("__rank") <= k)
    val scored = tk.join(g, Seq("__qid", "__id"))
      .groupBy(col("__qid"))
      .agg(
        coalesce(sum(col("__gain") * element_at(warr,
          col("__rank").cast("int"))), lit(0L)).as("dcg_u6"),
        min(when(col("__gain") > 0, col("__rank"))).as("__first_rel"),
        coalesce(sum(when(col("__gain") > 0, 1L).otherwise(0L)), lit(0L))
          .as("n_rel"))
    // ideal leg: each query's own top-k gains — a per-query
    // WindowGroupLimit over the qrels frame (zero-gain rows contribute 0
    // to the ideal sum exactly as in the single-query collect)
    val iw = Window.partitionBy(col("__qid"))
      .orderBy(col("__gain").desc, col("__id"))
    val ideal = g.withColumn("__irk", row_number().over(iw))
      .filter(col("__irk") <= k)
      .groupBy(col("__qid"))
      .agg(coalesce(sum(col("__gain") * element_at(warr, col("__irk"))),
        lit(0L)).as("idcg_u6"))
    // one output row per DISTINCT query of the ranked input, even when
    // nothing retrieved was judged (all-zero metrics) — the eval-harness
    // contract: a query never silently drops from the sweep
    tk.select(col("__qid")).distinct()
      .join(scored, Seq("__qid"), "left")
      .join(ideal, Seq("__qid"), "left")
      .select(col("__qid").as(queryCol), lit(k.toLong).as("k"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("dcg_u6"), lit(0L)).as("dcg_u6"),
        coalesce(col("idcg_u6"), lit(0L)).as("idcg_u6"),
        when(coalesce(col("idcg_u6"), lit(0L)) > 0,
          expr("dcg_u6 * 1000000 div idcg_u6"))
          .otherwise(lit(0L)).as("ndcg_u6"),
        when(col("__first_rel").isNull, lit(0L))
          .otherwise(expr("1000000 div __first_rel")).as("mrr_u6"))
  }
}
