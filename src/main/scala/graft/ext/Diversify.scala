package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ml.ExactKMeans

/** D4-style diversity selection over an embedding column (Tirumala et al.
  * 2023, "D4: Improving LLM Pretraining via Document De-Duplication and
  * Diversification", arXiv:2308.12284): after near-duplicates are gone,
  * cluster the corpus and DROP the most PROTOTYPICAL fraction of every
  * cluster — the members closest to their centroid — keeping the diverse
  * tail, which the paper shows carries most of the marginal pretraining
  * signal. The complement of [[Dedup.semanticDedup]]: SemDeDup removes
  * points too close to EACH OTHER, prototype-drop removes points too close
  * to the CLUSTER CENTER.
  *
  * == Determinism ==
  * Clustering is [[ExactKMeans]]; prototypicality is the EXACT integer
  * squared distance `d2 = Σ(qx − qm)²` from
  * [[ExactKMeans.assignByDistance]] — NOT the assignment score
  * `qx·qm − ‖qm‖²/2`, whose dropped `‖qx‖²` term is constant per row
  * (fine for the cross-cell argmax) but varies ACROSS rows, so it ranks a
  * cell by projection onto the centroid, not by closeness. Within a cell,
  * rank 1 = smallest d2 (most prototypical), ties broken by id ASC; the
  * drop count is the integer `floor(cellSize · dropNum / dropDen)` —
  * every comparison stays in integer arithmetic and replays bit-for-bit
  * in SQL on top of the unrolled k-means oracle.
  *
  * == 100 TB design ==
  * One assignment pass (map-only over k×dim plan literals — no join, no
  * shuffle), then ONE shuffle by cell for the per-cell rank window
  * (parallel across cells, never a global window) and a k-row count
  * aggregate broadcast back. Per-cell partitions hold ~n/k rows — D4's
  * regime is k in the thousands (√n-ish), which keeps cells partition-
  * sized; a pathological mega-cell is the same skew the semanticDedup
  * overflow-splitting handles upstream (split the cell, then drop). Driver
  * state is the k×dim centroid matrix only.
  */
object Diversify {

  /** k at or above which assignment routes to
    * [[ExactKMeans.assignByDistancePruned]] (bit-identical output —
    * test-pinned): the dense form's k plan literals per row pass codegen
    * limits and O(k·dim)/row work around this point, while the pruned
    * form is O(√k·dim)/row. Below it, the codegen'd dense form wins. */
  val PrunedAssignMinK: Int = 4096

  /** Per-row keep verdicts: `(id, kept)` for EVERY input row — `kept` is
    * false for the `floor(cellSize·dropNum/dropDen)` most-prototypical
    * members of each k-means cell. Compose with a row mask to realize the
    * cut (the [[graft.spec.PrototypeDropOp]] shape). */
  def prototypeKeepFlags(df: DataFrame, idCol: String, vecCol: String,
                         fit: ExactKMeans.Fit,
                         dropNum: Long, dropDen: Long): DataFrame =
    rankedWithVerdict(df, idCol, vecCol, fit, dropNum, dropDen)
      .select(col("id"), col("kept"))

  /** Survivors only: `(id, cell, rnk, d2)` — `rnk` the within-cell
    * prototypicality rank (1 = closest to the centroid; survivors start
    * after the dropped prefix), `d2` the exact integer squared distance
    * in squared 1e-6 units. */
  def prototypeDrop(df: DataFrame, idCol: String, vecCol: String,
                    fit: ExactKMeans.Fit,
                    dropNum: Long, dropDen: Long): DataFrame =
    rankedWithVerdict(df, idCol, vecCol, fit, dropNum, dropDen)
      .filter(col("kept"))
      .select(col("id"), col("cell"), col("rnk"), col("d2"))

  private def rankedWithVerdict(df: DataFrame, idCol: String, vecCol: String,
                                fit: ExactKMeans.Fit,
                                dropNum: Long, dropDen: Long): DataFrame = {
    require(dropDen >= 1L, s"dropDen must be >= 1, got $dropDen")
    require(dropNum >= 0L && dropNum <= dropDen,
      s"dropNum must be in [0, dropDen], got $dropNum/$dropDen")
    val assigned =
      if (fit.k >= PrunedAssignMinK)
        ExactKMeans.assignByDistancePruned(df, col(idCol).cast("long"),
          col(vecCol), fit)
      else ExactKMeans.assignByDistance(df, col(idCol).cast("long"),
        col(vecCol), fit)
    // per-cell rank AND per-cell count over the SAME partitioning: both
    // windows are PARTITIONED by cell (parallel, never a single-partition
    // global window) and share one exchange + one corpus scan — a
    // groupBy-count + broadcast-join form re-reads the corpus for a k-row
    // aggregate
    val byCell = Window.partitionBy(col("cell"))
    val ranked = assigned
      .withColumn("rnk",
        row_number().over(byCell.orderBy(col("d2"), col("id"))).cast("long"))
      .withColumn("__cnt", count(lit(1)).over(byCell))
    // integral floor division — exact for the non-negative operands here,
    // replayable as DuckDB's `//`; count·dropNum stays far below 2^63
    ranked
      .withColumn("kept", col("rnk") > expr(s"(__cnt * $dropNum) div $dropDen"))
      .select(col("id"), col("cell"), col("rnk"), col("d2"), col("kept"))
  }
}
