package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a broadcast nested-loop of the
  * (small) query set against the corpus, per-row dot products with
  * `zip_with`/`aggregate` (codegen'd higher-order functions, no UDF in the
  * hot path), then a per-query top-k window.
  *
  * Scale path: IVF — corpus pre-partitioned into nlist cells by nearest
  * centroid; a query probes only nprobe cells, so the scan is
  * (nprobe/nlist) of the data and the cell assignment is a broadcast join
  * against the tiny centroid table. At 100 TB the corpus would additionally
  * be *stored* partitioned by cell id (partition pruning at the source).
  */
object Similarity {

  /** dot(a,b) with doubles, sequential over elements — deterministic.
    * Backed by the native codegen'd [[VectorKernels.dot]] (a primitive loop
    * in the whole-stage-codegen body); the earlier
    * `aggregate(zip_with(...))` higher-order form evaluated boxed lambdas
    * per element. For non-null, equal-length inputs — every embedding
    * column in this engine, asserted at select — results are bit-equal;
    * for degenerate inputs the contracts DIFFER: the kernel skips null
    * elements and stops at the shorter length where the HOF form returned
    * null (see [[VectorKernels]] scaladoc).
    */
  def dot(a: Column, b: Column): Column = VectorKernels.dot(a, b)

  def norm(a: Column): Column = sqrt(VectorKernels.dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors. `queries` must be small (it is broadcast).
    * Norms are computed ONCE per side before the cross join (at 100 TB the
    * corpus-side norm would be a stored column), so each pair costs one
    * fused zip_with+aggregate dot product — not the 3 norm recomputations
    * of the naive form. Output: (query_id, corpus_id, cosine, rank).
    */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int): DataFrame = {
    val q = broadcast(queries.select(col(queryId).as("query_id"),
      col(queryVec).as("__qv"), norm(col(queryVec)).as("__qn")))
    val c = corpus.select(col(corpusId).as("corpus_id"),
      col(corpusVec).as("__cv"), norm(col(corpusVec)).as("__cn"))
    val scored = c.crossJoin(q)
      .withColumn("cosine", when(col("__qn") * col("__cn") > 0,
        dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
        .otherwise(lit(0.0)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), round(col("cosine"), 6).as("cosine"),
        col("rank"))
  }

  /** Deterministic centroid selection for IVF without iterative k-means:
    * pick nlist corpus vectors by hash of id (stable "k-means||-lite" —
    * random projection seeds). Good enough for uniform data; skewed
    * embedding distributions should use [[kmeansCentroids]].
    */
  def pickCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                    nlist: Int): Array[(Int, Seq[Float])] = {
    val picked = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("h", xxhash64(col("id")))
      .orderBy("h").limit(nlist)
      .collect()
    picked.zipWithIndex.map { case (r, i) => (i, r.getAs[scala.collection.Seq[Float]]("v").toSeq) }
  }

  /** KMeans-fitted centroids (distributed Spark ML Lloyd iterations) — the
    * production IVF path: balanced cells follow the actual embedding
    * distribution, so nprobe recall holds under skew. The centroid table is
    * always tiny (nlist rows) regardless of corpus size.
    */
  def kmeansCentroids(corpus: DataFrame, vecCol: String, nlist: Int,
                      maxIter: Int = 5, seed: Long = 42L): Array[(Int, Seq[Float])] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val feats = corpus.select(
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nlist).setMaxIter(maxIter).setSeed(seed)
      .fit(feats)
    model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat).toSeq)
    }
  }

  /** IVF top-k: assign corpus rows to nearest centroid (broadcast centroid
    * table), probe the nprobe nearest cells per query.
    */
  def ivfTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, nlist: Int = 16, nprobe: Int = 4,
              kmeansIters: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    val cents =
      if (kmeansIters > 0) kmeansCentroids(corpus, corpusVec, nlist, kmeansIters)
      else pickCentroids(corpus, corpusId, corpusVec, nlist)
    val bc = spark.sparkContext.broadcast(cents)

    val assignUdf = udf { v: scala.collection.Seq[Float] =>
      var best = 0; var bestD = Double.MinValue
      for ((cid, cv) <- bc.value) {
        var dp = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < v.length) {
          dp += v(i).toDouble * cv(i); na += v(i).toDouble * v(i); nb += cv(i).toDouble * cv(i)
          i += 1
        }
        val cos = if (na > 0 && nb > 0) dp / math.sqrt(na * nb) else 0.0
        if (cos > bestD) { bestD = cos; best = cid }
      }
      best
    }
    val probeUdf = udf { v: scala.collection.Seq[Float] =>
      bc.value.map { case (cid, cv) =>
        var dp = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < v.length) {
          dp += v(i).toDouble * cv(i); na += v(i).toDouble * v(i); nb += cv(i).toDouble * cv(i)
          i += 1
        }
        (cid, if (na > 0 && nb > 0) dp / math.sqrt(na * nb) else 0.0)
      }.sortBy(-_._2).take(nprobe).map(_._1)
    }

    val c = corpus.select(col(corpusId).as("corpus_id"),
        col(corpusVec).as("__cv"), norm(col(corpusVec)).as("__cn"))
      .withColumn("cell", assignUdf(col("__cv")))
    val q = broadcast(queries.select(col(queryId).as("query_id"),
        col(queryVec).as("__qv"), norm(col(queryVec)).as("__qn"))
      .withColumn("cell", explode(probeUdf(col("__qv")))))
    val scored = c.join(q, Seq("cell"))
      .withColumn("cosine", when(col("__qn") * col("__cn") > 0,
        dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
        .otherwise(lit(0.0)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), round(col("cosine"), 6).as("cosine"),
        col("rank"))
  }
}
