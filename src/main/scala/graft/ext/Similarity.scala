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
  * against the tiny centroid table. At 100 TB the corpus is additionally
  * *stored* partitioned by cell id ([[buildIvfIndex]]), so a probe prunes
  * unprobed cells at the SOURCE ([[ivfTopKIndexed]]) — directories never
  * listed, files never opened.
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

  /** Deterministic centroids taken from EXPLICIT corpus member ids (cell id
    * = position in `ids`). Unlike [[pickCentroids]]' hash draw, this choice
    * is replayable by any engine that can read the corpus — it is what lets
    * an external oracle reproduce the full IVF result bit-for-bit.
    */
  def centroidsByIds(corpus: DataFrame, idCol: String, vecCol: String,
                     ids: Seq[Long]): Array[(Int, Seq[Float])] = {
    val byId = corpus
      .filter(col(idCol).cast("long").isin(ids.map(Long.box): _*))
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]]("v").toSeq)
      .toMap
    ids.zipWithIndex.map { case (id, i) =>
      (i, byId.getOrElse(id,
        throw new NoSuchElementException(s"centroid id $id not in corpus")))
    }.toArray
  }

  /** Centroid table unpacked for the hot assignment loop: ids, primitive
    * vectors, and the squared norms PRECOMPUTED ONCE (the naive per-row
    * form re-accumulated every centroid's norm for every row — at
    * rows × nlist that dominates assignment). All hoists are bit-exact:
    * each sum runs over the same elements in the same order as before,
    * only earlier and once. */
  private final class CentArrays(cents: Array[(Int, Seq[Float])])
      extends Serializable {
    val ids: Array[Int] = cents.map(_._1)
    val vecs: Array[Array[Float]] = cents.map(_._2.toArray)
    val norms2: Array[Double] = vecs.map { cv =>
      var nb = 0.0; var i = 0
      while (i < cv.length) { nb += cv(i).toDouble * cv(i); i += 1 }
      nb
    }

    /** cos(v, centroid j) with the per-row squared norm `na` hoisted. */
    def cos(va: Array[Float], na: Double, j: Int): Double = {
      val cv = vecs(j)
      var dp = 0.0; var i = 0
      while (i < va.length) { dp += va(i).toDouble * cv(i); i += 1 }
      if (na > 0 && norms2(j) > 0) dp / math.sqrt(na * norms2(j)) else 0.0
    }

    def norm2(v: scala.collection.Seq[Float]): Double = {
      var na = 0.0; var i = 0
      while (i < v.length) { na += v(i).toDouble * v(i); i += 1 }
      na
    }

    /** Nearest-centroid cell id, first-max-wins (ties → smaller index —
      * identical tie-break to the original tuple iteration). */
    def bestCell(v: scala.collection.Seq[Float]): Int = {
      val va = v.toArray
      val na = norm2(va)
      var best = 0; var bestD = Double.MinValue
      var j = 0
      while (j < vecs.length) {
        val c = cos(va, na, j)
        if (c > bestD) { bestD = c; best = ids(j) }
        j += 1
      }
      best
    }

    def probe(v: scala.collection.Seq[Float], nprobe: Int): Seq[Int] = {
      val va = v.toArray
      val na = norm2(va)
      ids.indices.map(j => (ids(j), cos(va, na, j)))
        .sortBy(-_._2).take(nprobe).map(_._1)
    }
  }



  /** (id, vector, cell) for every corpus row — nearest-centroid assignment
    * against a broadcast centroid table (first-max-wins, ties → smaller
    * cell id). The shared front half of IVF search and semantic dedup:
    * the centroid table is nlist rows regardless of corpus size, so the
    * assignment is a map-only pass — no shuffle.
    */
  def assignCells(corpus: DataFrame, idCol: String, vecCol: String,
                  centroids: Array[(Int, Seq[Float])]): DataFrame = {
    // broadcast the UNPACKED table (primitive vectors + precomputed norms):
    // the per-row loop is rows × nlist dot products and must not re-box or
    // re-accumulate centroid norms per row
    val bc = corpus.sparkSession.sparkContext.broadcast(new CentArrays(centroids))
    val assignUdf = udf { v: scala.collection.Seq[Float] => bc.value.bestCell(v) }
    corpus.select(col(idCol).as("id"), col(vecCol).as("__v"))
      .withColumn("cell", assignUdf(col("__v")))
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
    val bc = spark.sparkContext.broadcast(new CentArrays(cents))
    val probeUdf = udf { v: scala.collection.Seq[Float] =>
      bc.value.probe(v, nprobe)
    }

    val c = assignCells(corpus, corpusId, corpusVec, cents)
      .select(col("id").as("corpus_id"), col("__v").as("__cv"),
        norm(col("__v")).as("__cn"), col("cell"))
    val q = broadcast(queries.select(col(queryId).as("query_id"),
        col(queryVec).as("__qv"), norm(col(queryVec)).as("__qn"))
      .withColumn("cell", explode(probeUdf(col("__qv")))))
    topK(c.join(q, Seq("cell")), k)
  }

  private def topK(pairs: DataFrame, k: Int): DataFrame = {
    val scored = pairs
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

  // ---------------- stored-bucketed IVF (the 100 TB refinement) ----------------

  /** Build an ON-DISK IVF index: the corpus is written as parquet
    * PARTITIONED BY cell id — `<path>/corpus/cell=N/…` — with the vector
    * norm precomputed as a stored column, and the centroid table stored
    * alongside at `<path>/centroids`. A probe then reads only its probed
    * cells' DIRECTORIES (Catalyst partition pruning at the source), so scan
    * IO is (|probed cells| / nlist) of the corpus instead of a full pass —
    * the difference between touching 100 TB and touching 12 TB per query
    * batch. Storage is one extra corpus copy; cells are hash-balanced for
    * [[pickCentroids]]/[[centroidsByIds]] draws and distribution-balanced
    * for [[kmeansCentroids]].
    */
  def buildIvfIndex(corpus: DataFrame, corpusId: String, corpusVec: String,
                    centroids: Array[(Int, Seq[Float])], path: String): Unit = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(new CentArrays(centroids))
    val assignUdf = udf { v: scala.collection.Seq[Float] => bc.value.bestCell(v) }
    corpus.select(col(corpusId).as("corpus_id"), col(corpusVec).as("vec"))
      .withColumn("vnorm", norm(col("vec")))
      .withColumn("cell", assignUdf(col("vec")))
      // co-locate each cell before the partitioned write: without this,
      // partitionBy emits (writing tasks × cells) files — at nlist in the
      // tens of thousands that is millions of KB-sized parquet files, a
      // listing/open cost that defeats the pruning the index exists for.
      // One cell-keyed shuffle at build time buys ~one file per cell.
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/corpus")
    import spark.implicits._
    centroids.toSeq.map { case (cid, v) => (cid, v) }
      .toDF("cent_id", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Probe a [[buildIvfIndex]] index with partition pruning: the union of
    * the queries' probed cells becomes a LITERAL `cell IN (…)` predicate,
    * which Catalyst resolves against the `cell=N` directory layout at plan
    * time — unprobed cells are never listed, opened, or read. `queries`
    * must be small (its probe set is collected on the driver and the query
    * side of the join is broadcast — same contract as [[bruteForceTopK]]).
    */
  def ivfTopKIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int, nprobe: Int): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getAs[Int]("cent_id"),
        r.getAs[scala.collection.Seq[Float]]("centroid").toSeq))
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(new CentArrays(cents))
    val probeUdf = udf { v: scala.collection.Seq[Float] =>
      bc.value.probe(v, nprobe)
    }
    val q = queries.select(col(queryId).as("query_id"),
        col(queryVec).as("__qv"), norm(col(queryVec)).as("__qn"))
      .withColumn("cell", explode(probeUdf(col("__qv"))))
    // driver-side: the probed-cell union must be a literal for source-level
    // pruning; bounded by nlist (tiny) regardless of query count
    val cells = q.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).sorted
    val c = prunedCorpusScan(spark, path, cells)
    topK(c.join(broadcast(q), Seq("cell")), k)
  }

  /** The pruned corpus scan of [[ivfTopKIndexed]], exposed so callers (and
    * tests) can inspect the plan: `cell` is a partition column, so the
    * `isin` filter appears as a PartitionFilter and only the matching
    * `cell=N` directories are listed. */
  def prunedCorpusScan(spark: org.apache.spark.sql.SparkSession, path: String,
                       cells: Seq[Int]): DataFrame =
    spark.read.parquet(s"$path/corpus")
      .filter(col("cell").isin(cells.map(Int.box): _*))
      .select(col("cell"), col("corpus_id"), col("vec").as("__cv"),
        col("vnorm").as("__cn"))
}
