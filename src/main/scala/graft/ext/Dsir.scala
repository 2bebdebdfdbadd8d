package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every raw document by how much more likely its hashed-n-gram bag is
  * under a TARGET corpus distribution than under the RAW corpus
  * distribution, then keep the top-k (deterministic) or Gumbel-top-k
  * (seeded sampling without replacement). The standard scale recipe for
  * "make my 100 TB crawl look like Wikipedia". Beyond the reference's
  * surface.
  *
  * Features are hashed unigrams + bigrams in `m` buckets. The bucket hash
  * is md5-based — `conv(substr(md5(gram),1,15),16,10) % m` — because both
  * engines expose the identical primitive (DuckDB:
  * `CAST('0x'||substr(md5(g),1,15) AS BIGINT)`), so the oracle replays the
  * bucketing exactly, collisions included (collisions are semantics here,
  * not noise: DSIR's bag-of-hashed-ngrams model is DEFINED over buckets).
  *
  * == Determinism ==
  * Per-bucket log-likelihood-ratios quantize to integer micro-nats; a
  * document's importance weight is the SUM of its occurrences' quantized
  * ratios — order-free integer aggregation, bit-replayable. Gumbel noise
  * derives from md5(seed, id) uniforms, so sampling is a pure function of
  * (data, seed).
  *
  * == 100 TB design ==
  * Feature extraction is map-side (gram strings never shuffle; only
  * (bucket, count) pairs do, partial-aggregated, bounded by m). The fitted
  * ratio table is EXACTLY m rows — broadcast territory for any practical m
  * (2^20 buckets = 8 MB of longs). Scoring = one broadcast join on the
  * exploded bucket stream + one uniform groupBy(doc). Selection is a
  * TakeOrdered (no global sort materialization).
  */
object Dsir {

  /** Micro-nat quantum for per-bucket log-ratios. */
  val Quant: Double = 1e6

  /** 60-bit md5 prefix as a non-negative long (same value as DuckDB's
    * `CAST('0x'||substr(md5(c),1,15) AS BIGINT)`). */
  def md5Bucket60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Hashed feature stream of one document: unigram and bigram buckets in
    * [0, m), one element PER OCCURRENCE (multiplicity is signal). Pure
    * expression, map-side; empty/one-word docs degrade gracefully. */
  def hashedFeatures(text: Column, m: Int): Column = {
    require(m > 0, s"m must be positive, got $m")
    Corpus.bindArray(Corpus.words(text)) { ws =>
      val uni = transform(ws, w => md5Bucket60(w) % m)
      val bi = when(size(ws) < 2, array().cast("array<bigint>"))
        .otherwise(transform(sequence(lit(0), size(ws) - 2),
          i => md5Bucket60(concat_ws(" ",
            element_at(ws, i + 1), element_at(ws, i + 2))) % m))
      concat(uni, bi)
    }
  }

  private def bucketCounts(docs: DataFrame, textCol: String, m: Int): DataFrame =
    docs.select(explode(hashedFeatures(col(textCol), m)).as("f"))
      // the explicit isNotNull (vacuous — buckets are never null) keeps this
      // subtree canonically IDENTICAL to the join-side copy, which gets the
      // same filter injected by join-key null-filtering: with both branches
      // equal, AQE reuses ONE exchange for the ratio join and the total
      .filter(col("f").isNotNull)
      .groupBy(col("f")).agg(count(lit(1)).as("c"))

  /** Fit the per-bucket quantized log-likelihood-ratio table: EXACTLY m
    * rows (f, qllr), add-`alpha` smoothed —
    * `qllr = round((ln((ct+a)/(T+a*m)) - ln((cq+a)/(Q+a*m))) * 1e6)`.
    * Buckets unseen in both corpora get the constant smoothing ratio, so
    * scoring joins are total (no OOV arm). */
  def fitLogRatios(spark: SparkSession, target: DataFrame, raw: DataFrame,
                   textCol: String, m: Int, alpha: Double = 1.0): DataFrame = {
    // totals derive from the count tables (m-bounded) — each corpus is
    // tokenized and shuffled exactly ONCE
    val ct = bucketCounts(target, textCol, m)
      .withColumnRenamed("c", "ct")
    val cq = bucketCounts(raw, textCol, m)
      .withColumnRenamed("c", "cq")
    val tt = ct.agg(coalesce(sum(col("ct")), lit(0L)).as("tt"))
    val tq = cq.agg(coalesce(sum(col("cq")), lit(0L)).as("tq"))
    val am = alpha * m
    spark.range(m).select(col("id").as("f"))
      .join(ct, Seq("f"), "left")
      .join(cq, Seq("f"), "left")
      .crossJoin(broadcast(tt))
      .crossJoin(broadcast(tq))
      .select(col("f"),
        round((
          log((coalesce(col("ct"), lit(0L)).cast("double") + alpha) /
            (col("tt").cast("double") + am)) -
          log((coalesce(col("cq"), lit(0L)).cast("double") + alpha) /
            (col("tq").cast("double") + am))
        ) * Quant).cast("long").as("qllr"))
  }

  /** Importance weight per document: (id, n_feats, w_u6) where `w_u6` is
    * the integer micro-nat sum of the document's per-occurrence bucket
    * ratios. Docs with no features keep a row at weight 0. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        ratios: DataFrame, m: Int): DataFrame = {
    // force the broadcast only while the m-row table is unambiguously
    // broadcast-sized (2^22 longs ≈ 64 MB); beyond that leave the join
    // strategy to Catalyst rather than pinning an OOM
    val r = if (m <= (1 << 22)) broadcast(ratios) else ratios
    val feats = docs
      .select(col(idCol), explode(hashedFeatures(col(textCol), m)).as("f"))
      .join(r, Seq("f"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("qllr")).as("w_u6"))
    docs.select(col(idCol)).join(feats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("w_u6"), lit(0L)).as("w_u6"))
  }

  /** Deterministic selection: top-k by (weight desc, id asc) with a 1-based
    * rank. Runs as a TakeOrdered, never a full sort. */
  def selectTopK(weights: DataFrame, idCol: String, k: Int): DataFrame =
    weights.orderBy(col("w_u6").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("n_feats"), col("w_u6"))

  /** 52-bit md5 prefix (13 hex chars): < 2^53, so its double image and the
    * (x+0.5)/2^52 uniform below are EXACT — no rounding edge anywhere. */
  def md5Uniform52(c: Column): Column =
    (conv(substring(md5(c), 1, 13), 16, 10).cast("long").cast("double")
      + 0.5) / math.pow(2.0, 52)

  /** Gumbel-top-k: sampling without replacement proportional to
    * exp(w/1e6 / temperature) — the DSIR paper's selection rule — made a
    * pure function of (data, seed): the Gumbel uniform is the exact 52-bit
    * md5 of `seed:id` scaled into (0,1). Key g = w/1e6/T + (-ln(-ln u)),
    * quantized back to micro-nats for a hash-stable ordering. */
  def gumbelTopK(weights: DataFrame, idCol: String, k: Int, seed: Long,
                 temperature: Double = 1.0): DataFrame = {
    require(temperature > 0, s"temperature must be positive, got $temperature")
    val u = md5Uniform52(concat_ws(":", lit(seed), col(idCol)))
    val g = round(((col("w_u6").cast("double") / Quant) / temperature +
      -log(-log(u))) * Quant).cast("long")
    weights.withColumn("g_u6", g)
      .orderBy(col("g_u6").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("n_feats"), col("w_u6"), col("g_u6"))
  }
}
