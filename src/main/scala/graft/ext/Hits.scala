package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantized-exact HITS (Kleinberg 1999) over a DIRECTED edge list — the
  * hub/authority split PageRank's single score can't express: a page that
  * LINKS TO many good sources (hub) versus a page many good hubs LINK TO
  * (authority). In a curation pipeline the directed near-dup graph
  * (smaller id → larger id, i.e. "original → later copy") separates
  * much-copied originals (hubs under that orientation) from heavy copiers;
  * on crawl link graphs it is the classic directory-vs-content split.
  *
  * == Determinism ==
  * Scores live in integer micro-units normalized to `max = Quant` per
  * side per iteration:
  * `a_raw(v) = Σ_{u→v} h(u)`, `a(v) = (a_raw(v)·Quant) ⌊/⌋ max(a_raw)`,
  * then `h_raw(v) = Σ_{v→w} a(w)`, same normalization — all integer
  * floor arithmetic, partitioning-independent, unrolled and replayed by
  * the SQL oracle (the [[PageRank]] pattern; max-normalization instead of
  * damping). Overflow bound: `raw ≤ maxdeg·Quant` and the normalization
  * multiplies by Quant, so the arithmetic stays in-long for
  * maxdeg ≲ 9·10⁶ — in-degrees beyond that should be rescaled upstream.
  *
  * == 100 TB design ==
  * Per iteration: two edge⋈score joins + two sum aggregations (each
  * shuffles keyed on a node id) + two ONE-ROW max aggregates broadcast
  * back in-plan (no driver collect); score state is `(id, long)`;
  * lineage truncated per iteration via localCheckpoint (the
  * connected-components lesson).
  */
object Hits {

  /** Micro-unit quantum: each side's max score per iteration. */
  val Quant: Long = 1000000L

  /** Hub + authority scores for every node incident to an edge:
    * `(id, hub_u6, auth_u6)`. `edges` is DIRECTED (u → v endorses v). */
  def scores(edges: DataFrame, srcCol: String, dstCol: String,
             iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    require(!nodes.isEmpty, "Hits.scores: empty graph")
    def normalized(raw: DataFrame, out: String): DataFrame = {
      val m = raw.agg(max(col("__s")).as("__m"))
      // LAZY checkpoint (round 21, the connected-components lesson): plan
      // truncation is immediate, materialization rides the caller's one
      // action — the previous EAGER form scheduled one job per side per
      // iteration for identical values (each level caches on first use)
      nodes.join(raw, Seq("id"), "left")
        .crossJoin(broadcast(m))
        .select(col("id"),
          expr(s"(coalesce(__s, 0L) * ${Quant}L) div __m").as(out))
        .localCheckpoint(false)
    }
    var h = nodes.withColumn("h_u6", lit(Quant))
    var a = nodes.withColumn("a_u6", lit(Quant))
    var it = 0
    while (it < iters) {
      a = normalized(
        e.join(h.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id")).agg(sum(col("h_u6")).as("__s")),
        "a_u6")
      h = normalized(
        e.join(a.withColumnRenamed("id", "dst"), "dst")
          .groupBy(col("src").as("id")).agg(sum(col("a_u6")).as("__s")),
        "h_u6")
      it += 1
    }
    h.join(a, "id").select(col("id"), col("h_u6").as("hub_u6"),
      col("a_u6").as("auth_u6"))
  }
}
