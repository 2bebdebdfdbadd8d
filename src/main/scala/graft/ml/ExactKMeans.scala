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

  /** Lloyd iterations from explicit member init. `iters = 0` is pure
    * member-centroid assignment (the SemDeDup regime). */
  def fit(df: DataFrame, idCol: String, vecCol: String, initIds: Seq[Long],
          iters: Int, maxAbs: Double = 1.0): Fit = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    var qm = centroidsByIds(df, idCol, vecCol, initIds, maxAbs)
    var it = 0
    while (it < iters) {
      val s = scoresCol(col(vecCol), qm, maxAbs)
      // one corpus pass: map-side cell argmax + the (cell, dim) integer
      // grid aggregation; the collect is k×dim rows — metadata
      val agg = df
        .select((array_position(s, array_max(s)) - 1).cast("int").as("__cell"),
          posexplode(col(vecCol).cast("array<double>")))
        .select(col("__cell"), col("pos"),
          round(col("col").cast("double") * 1e6).cast("long").as("__q"))
        .groupBy(col("__cell"), col("pos"))
        .agg(round(sum(col("__q")).cast("double") / count(lit(1)))
          .cast("long").as("__qm"))
        .collect()
      val next = qm.map(_.clone()) // empty cells carry their previous value
      agg.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getLong(2))
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
}
