package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantized-exact PageRank (Page et al. 1999) over an edge list — graph
  * centrality as a deterministic, SQL-replayable signal. In a curation
  * pipeline this ranks near-duplicate cluster members by how CENTRAL they
  * are in the similarity graph (the canonical-version heuristic: the most
  * linked-to variant of a boilerplate family is the best representative),
  * and at crawl scale the same operator scores domain/link authority.
  *
  * == Determinism ==
  * Ranks live in PER-NODE integer micro-units (`pr_u6`; uniform rank =
  * 1e6 per node, Σ ≈ n·1e6 — the "×n" normalization of the standard
  * PageRank vector). Every step is integer FLOOR arithmetic:
  * `pr'(v) = ((dampDen−dampNum)·1e6) ⌊/⌋ dampDen
  *           + (dampNum · Σ_{u→v} (pr(u) ⌊/⌋ outdeg(u))) ⌊/⌋ dampDen` —
  * no float summation anywhere, so the result is independent of
  * partitioning and replays in SQL as `//` chains (the oracle unrolls
  * every iteration, the [[graft.ml.ExactKMeans]] pattern). The floor
  * divisions leak ≤ 1 micro-unit per term — PageRank is a RANKING signal
  * and the leak is deterministic, not a correctness hazard.
  *
  * The per-node quantum is the SCALE choice: a total-mass quantum (Σ =
  * 1e6) floors every node's share to ZERO once n ≳ 10⁶ — the ScaleProbe
  * decade caught exactly that collapse at the 10× graph — whereas
  * per-node units stay integral to n ≈ 10¹² (hub accumulation Σ-bounded
  * below 2⁶³) with n never appearing in the update at all.
  *
  * == 100 TB design ==
  * Per iteration: ONE edge⋈rank join (shuffle keyed on the node id — edge
  * rows carry their precomputed out-degree, so no second join) and ONE
  * sum aggregation; state is `(id, long)` per node. The rank frame is
  * LAZILY localCheckpoint'ed per iteration so lineage stays O(1) deep
  * over any iteration count while materialization rides the caller's
  * one action — no per-iteration scheduling job (round 21; the
  * connected-components lesson, both halves). Dangling
  * nodes (out-degree 0 in a DIRECTED input) contribute nothing — their
  * mass leaks, which is fine for ranking; symmetric (undirected) inputs
  * have none.
  */
object PageRank {

  /** Micro-unit quantum PER NODE: uniform rank = Quant, total ≈ n·Quant. */
  val Quant: Long = 1000000L

  /** Ranks for every node incident to an edge: `(id, pr_u6)`. Pass BOTH
    * directions of an undirected graph. */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
            dampNum: Long = 85L, dampDen: Long = 100L): DataFrame =
    iterate(edges, srcCol, dstCol, None, iters, dampNum, dampDen)

  /** PERSONALIZED PageRank (random walk with restart): the teleport mass
    * returns only to the `seeds` set — seed nodes init at Quant and
    * receive the per-step base, every other node inits at 0 and earns
    * rank only through in-links — so `pr_u6` measures graph PROXIMITY TO
    * THE SEEDS, not global centrality. The curation use: propagate a
    * trust/quality signal from a vetted document set through the
    * similarity graph (label propagation's ranking cousin), or score
    * crawl pages by closeness to known-good domains. Identical integer
    * arithmetic and per-iteration plan shape as [[ranks]]; seeds not
    * present in the graph are ignored (they have no edges to walk). */
  def personalizedRanks(edges: DataFrame, srcCol: String, dstCol: String,
                        seeds: DataFrame, seedCol: String, iters: Int,
                        dampNum: Long = 85L,
                        dampDen: Long = 100L): DataFrame =
    iterate(edges, srcCol, dstCol,
      Some(seeds.select(col(seedCol).cast("long").as("id")).distinct()),
      iters, dampNum, dampDen)

  private def iterate(edges: DataFrame, srcCol: String, dstCol: String,
                      seeds: Option[DataFrame], iters: Int,
                      dampNum: Long, dampDen: Long): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampDen >= 1L, s"dampDen must be >= 1, got $dampDen")
    require(dampNum >= 0L && dampNum <= dampDen,
      s"dampNum must be in [0, dampDen], got $dampNum/$dampDen")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodesPlain = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
    // the seed flag rides the (bounded, checkpointed) node frame so the
    // per-iteration join shape is IDENTICAL to the global form
    val nodes = (seeds match {
      case Some(sd) => nodesPlain
        .join(sd.withColumn("__seed", lit(true)), Seq("id"), "left")
        .select(col("id"), coalesce(col("__seed"), lit(false)).as("__seed"))
      case None => nodesPlain.withColumn("__seed", lit(true))
    }).localCheckpoint(true)
    require(!nodes.isEmpty, "PageRank: empty graph")
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    // static per-edge degree: joined once, carried through every iteration
    val eDeg = e.join(outdeg, "src").localCheckpoint(true)
    val base = ((dampDen - dampNum) * Quant) / dampDen
    var pr = nodes.select(col("id"),
      when(col("__seed"), lit(Quant)).otherwise(lit(0L)).as("pr_u6"))
    var it = 0
    while (it < iters) {
      val sums = eDeg
        .join(pr.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"),
          expr("pr_u6 div __deg").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__s"))
      // LAZY checkpoint (round 21, the connected-components lesson): the
      // plan is truncated to a leaf immediately, but materialization
      // waits for the caller's one action — an EAGER checkpoint here ran
      // one scheduling job PER ITERATION for identical values (the loop
      // has no per-iteration action of its own; each level is cached on
      // first use, so the final action still computes every level once)
      pr = nodes.join(sums, Seq("id"), "left")
        .select(col("id"),
          (when(col("__seed"), lit(base)).otherwise(lit(0L)) +
            expr(s"($dampNum * coalesce(__s, 0L)) div $dampDen"))
            .as("pr_u6"))
        .localCheckpoint(false)
      it += 1
    }
    pr
  }
}
