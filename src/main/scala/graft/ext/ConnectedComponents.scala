package graft.ext

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the clustering step
  * a production dedup pipeline runs AFTER candidate generation: LSH emits
  * near-duplicate PAIRS, but "keep one copy per duplicate group" needs the
  * transitive closure of those pairs (A~B, B~C ⇒ {A,B,C} one cluster even
  * when A~C was never emitted).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the standard
  * shuffle-bounded formulation. Each round is two groupBy-min + two
  * equi-joins on node id; the edge set contracts toward disjoint stars whose
  * centers are the component minima, converging in O(log² n) rounds worst
  * case and ~log n in practice. No driver-side state: edges never leave the
  * cluster, per-round cost is O(|E|) shuffle bytes.
  *
  * 100 TB notes:
  *  - The hot key is a giant component's center (its degree approaches the
  *    component size as stars contract). The groupBy side is safe (partial
  *    aggregation combines map-side); the join side is exactly the shape
  *    AQE's skew-join split handles — keep AQE on.
  *  - Lineage is truncated every round (`checkpoint` when a checkpoint dir
  *    is configured, else `localCheckpoint`) — without this the iterated
  *    plan re-analysis is quadratic and executor-loss recovery replays the
  *    whole history. On a real cluster set `spark.sparkContext
  *    .setCheckpointDir` so truncation is fault-tolerant.
  *  - Convergence is verified structurally (set equality via a single
  *    cardinality + containment aggregation), not assumed from an
  *    iteration budget.
  */
object ConnectedComponents {

  /** Component labels for every node that appears in `edges`:
    * `(id, cluster_id)` with `cluster_id` = the minimum node id of the
    * component. Nodes with no edges don't appear (the caller unions
    * singletons back — see [[Dedup.duplicateClusters]]).
    *
    * Edge direction and duplicates are irrelevant; self-loops are ignored.
    * Node ids must be orderable (long ids here).
    */
  def labels(edges: DataFrame, srcCol: String, dstCol: String,
             maxIter: Int = 30): DataFrame = {
    val spark = edges.sparkSession
    // LAZY checkpoint: each round's convergence aggregation is the action
    // that materializes the round's edge set, so truncation costs no
    // separate job (eager checkpointing ran one extra evaluation per round)
    def truncate(d: DataFrame): DataFrame =
      if (spark.sparkContext.getCheckpointDir.isDefined) d.checkpoint(false)
      else d.localCheckpoint(false)

    // canonical simple undirected edges: (hi > lo), deduped
    var e = truncate(edges
      .select(greatest(col(srcCol), col(dstCol)).as("hi"),
        least(col(srcCol), col(dstCol)).as("lo"))
      .filter(col("hi") =!= col("lo") && col("hi").isNotNull)
      .distinct())
    var eCount = e.count()

    var iter = 0
    var converged = eCount == 0L
    while (!converged && iter < maxIter) {
      // ---- large-star: every neighbor v > u attaches to min(N(u) ∪ {u}).
      // Each undirected edge is processed from its SMALLER endpoint u, so
      // the emitted (v, m(u)) always has m(u) <= u < v — canonical form is
      // preserved without re-sorting.
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val minsL = sym.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val afterLarge = sym.join(minsL, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo"))
        .distinct()

      // ---- small-star: u and all smaller neighbors attach to
      // m = min(N<(u) ∪ {u}) = min(lo) — all strictly below u.
      val minsS = afterLarge.groupBy("hi").agg(min(col("lo")).as("m"))
      val afterSmall = afterLarge.join(minsS, "hi")
        .select(col("lo").as("hi"), col("m").as("lo"))
        .union(minsS.select(col("hi"), col("m").as("lo")))
        .filter(col("hi") =!= col("lo"))
        .distinct()

      val e2 = truncate(afterSmall)
      // sound set-equality in ONE job: |e2| == |e| and e2 ⊆ e (both sides
      // are distinct, so equal cardinality + containment ⇔ equality). The
      // containment count rides the same aggregation as the cardinality —
      // previously a separate count() + except().isEmpty cost two jobs per
      // round on the most expensive bench query.
      val stats = e2
        .join(e.withColumn("__old", lit(1)), Seq("hi", "lo"), "left_outer")
        .agg(count(lit(1)).as("n"),
          count(when(col("__old").isNull, 1)).as("novel"))
        .head()
      val c2 = stats.getLong(0)
      converged = c2 == eCount && stats.getLong(1) == 0L
      e = e2; eCount = c2; iter += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")

    // converged ⇒ disjoint stars: lo is the component min for every edge
    e.select(col("hi").as("id"), col("lo").as("cluster_id"))
      .union(e.select(col("lo").as("id"), col("lo").as("cluster_id")))
      .groupBy("id").agg(min(col("cluster_id")).as("cluster_id"))
  }
}
