package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, designed
  * shuffle-minimal for 100 TB:
  *
  *  - exact: one hash-aggregate over a 16-byte digest (not the full text) —
  *    the shuffle moves digests + ids, not documents.
  *  - MinHash+LSH: signatures are computed *row-locally* (no explode-join of
  *    shingles across the cluster); only the (band, bucket) keys shuffle —
  *    64 longs per doc regardless of document size.
  *  - SimHash: row-local 64-bit sketch; near-dup = small hamming distance
  *    within LSH buckets of bit-blocks.
  *  - n-gram Jaccard: exact verification restricted to LSH candidate pairs
  *    (never all-pairs).
  */
object Dedup {

  // ---------- exact ----------

  /** Exact dedup: keep the minimum-id row per distinct normalized text.
    * GroupBy on md5 digest: map-side partial agg + one shuffle of
    * (digest, id) pairs.
    */
  def exactDuplicateGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** The deduplicated dataset itself: the min-id representative per text. */
  def dropExactDuplicates(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // ---------- shingling ----------

  /** Word n-gram shingles as a deduped array — pure built-ins, row-local:
    * split → slide via sequence+transform → distinct.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val words = filter(split(lower(text), "[^\\p{L}\\p{N}]+"), w => length(w) > 0)
    val count = size(words)
    val grams = when(count >= n,
      transform(sequence(lit(0), count - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
      .otherwise(when(count > 0, array(concat_ws(" ", words))).otherwise(array()))
    array_distinct(grams)
  }

  // ---------- MinHash ----------

  private def hash64(seed: Int, s: String): Long = {
    // xxhash-free deterministic 64-bit mix (avalanche over FNV), pure JVM —
    // stable across Spark versions, row-local.
    var h = 1469598103934665603L ^ (seed * 0x9E3779B97F4A7C15L)
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * 1099511628211L; i += 1 }
    h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
    h
  }

  /** MinHash signature (numPerms longs) from a shingle array — row-local
    * Scala UDF: O(|shingles| * numPerms) per row, zero shuffle.
    */
  def minhashSignatureUdf(numPerms: Int) = udf { shingles: scala.collection.Seq[String] =>
    if (shingles == null || shingles.isEmpty) Array.fill(numPerms)(Long.MaxValue)
    else Array.tabulate(numPerms) { p =>
      var m = Long.MaxValue
      for (s <- shingles) { val h = hash64(p, s); if (h < m) m = h }
      m
    }
  }

  /** LSH band keys: signature → numBands hashes of rowsPerBand-slices.
    * Docs sharing any band key are candidate near-duplicates.
    */
  def bandKeysUdf(numBands: Int, rowsPerBand: Int) = udf { sig: scala.collection.Seq[Long] =>
    Array.tabulate(numBands) { b =>
      var h = 1469598103934665603L ^ b
      var i = b * rowsPerBand
      val end = math.min(i + rowsPerBand, sig.length)
      while (i < end) { h = (h ^ sig(i)) * 1099511628211L; i += 1 }
      h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
      (h & 0x7FFFFFFFFFFFFFFFL) | (b.toLong << 56) // band id folded in
    }
  }

  /** Candidate near-duplicate pairs via MinHash LSH.
    * Pipeline: row-local (shingles → signature → band keys) → explode band
    * keys (numBands rows/doc of fixed width) → self-join within buckets →
    * distinct pairs. The only shuffle is on the band-key groupBy; skewed
    * mega-buckets (boilerplate docs) are truncated at `maxBucket` with the
    * drop logged, the standard guard at scale.
    */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        shingleN: Int = 3, numPerms: Int = 64,
                        numBands: Int = 16, maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = numPerms / numBands
    val sigs = df.select(
        col(idCol).as("doc_id"),
        minhashSignatureUdf(numPerms)(wordShingles(col(textCol), shingleN)).as("sig"))
      .withColumn("band_key", explode(bandKeysUdf(numBands, rowsPerBand)(col("sig"))))
    val buckets = sigs.groupBy("band_key")
      .agg(slice(sort_array(collect_list(col("doc_id"))), 1, maxBucket).as("ids"))
      .filter(size(col("ids")) > 1)
    // pair expansion inside each bucket (i<j), then global distinct
    buckets.select(explode(pairCombinations(col("ids"))).as("p"))
      .select(col("p._1").as("id_a"), col("p._2").as("id_b"))
      .distinct()
  }

  private def pairCombinations(ids: Column): Column = {
    // flatten( transform(ids, (x,i) -> transform(slice(ids, i+2, n), y -> (x,y)) ) )
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + 2, size(ids)), y => struct(x.as("_1"), y.as("_2")))))
  }

  /** Exact n-gram Jaccard for candidate pairs: join shingle sets back and
    * compute |∩|/|∪| with built-ins. `candidates` has (id_a, id_b).
    */
  def jaccardVerify(df: DataFrame, textCol: String, idCol: String,
                    candidates: DataFrame, shingleN: Int = 3,
                    threshold: Double = 0.8): DataFrame = {
    val sh = df.select(col(idCol).as("jid"),
      wordShingles(col(textCol), shingleN).as("sh"))
    candidates
      .join(sh.withColumnRenamed("jid", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("jid", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", when(col("uni") > 0,
        col("inter").cast("double") / col("uni")).otherwise(lit(0.0)))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Full MinHash near-dup pipeline: candidates → exact-Jaccard verify. */
  def minhashNearDuplicates(df: DataFrame, textCol: String, idCol: String,
                            shingleN: Int = 3, numPerms: Int = 64,
                            numBands: Int = 16, threshold: Double = 0.8): DataFrame =
    jaccardVerify(df, textCol, idCol,
      minhashCandidates(df, textCol, idCol, shingleN, numPerms, numBands),
      shingleN, threshold)

  // ---------- SimHash ----------

  /** 64-bit SimHash from the token multiset — row-local UDF (single pass
    * over tokens, no shuffle).
    */
  val simhashUdf = udf { tokens: scala.collection.Seq[String] =>
    val acc = new Array[Int](64)
    if (tokens != null) for (t <- tokens) {
      val h = hash64(0, t)
      var b = 0
      while (b < 64) { if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def simhash(text: Column): Column =
    simhashUdf(filter(split(lower(text), "[^\\p{L}\\p{N}]+"), w => length(w) > 0))

  /** SimHash near-dup candidates: block the 64-bit sketch into 4 16-bit
    * bands (docs within hamming distance 3 share ≥1 exact band); verify
    * with exact hamming via bit_count(xor).
    */
  def simhashNearDuplicates(df: DataFrame, textCol: String, idCol: String,
                            maxHamming: Int = 3): DataFrame = {
    val s = df.select(col(idCol).as("doc_id"), simhash(col(textCol)).as("sh"))
    val banded = s.withColumn("band", explode(array((0 until 4).map(b =>
      struct(lit(b).as("b"), shiftright(col("sh"), b * 16).bitwiseAND(0xFFFFL).as("v"))): _*)))
    val a = banded.select(col("doc_id").as("id_a"), col("sh").as("sh_a"), col("band"))
    val b = banded.select(col("doc_id").as("id_b"), col("sh").as("sh_b"), col("band"))
    a.join(b, Seq("band")).filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming").distinct()
  }

  // ---------- embedding cosine near-dup ----------

  /** Embedding-cosine near-duplicates via random-hyperplane LSH: row-local
    * sign-sketch (deterministic pseudo-random planes from hash64), bucket
    * join on sketch prefix, exact cosine verify inside buckets.
    */
  def cosineNearDuplicates(df: DataFrame, vecCol: String, idCol: String,
                           dim: Int, nPlanes: Int = 16,
                           threshold: Double = 0.95): DataFrame = {
    val sketch = udf { v: scala.collection.Seq[Float] =>
      var out = 0L
      var p = 0
      while (p < nPlanes) {
        var dot = 0.0
        var i = 0
        while (i < v.length) {
          // deterministic plane component in [-1,1): hash of (plane, dim idx)
          val h = hash64(p, i.toString)
          dot += v(i) * (h.toDouble / Long.MaxValue)
          i += 1
        }
        if (dot > 0) out |= (1L << p)
        p += 1
      }
      out
    }
    val s = df.select(col(idCol).as("doc_id"), col(vecCol).as("v"))
      .withColumn("sk", sketch(col("v")))
    val a = s.select(col("doc_id").as("id_a"), col("v").as("v_a"), col("sk"))
    val b = s.select(col("doc_id").as("id_b"), col("v").as("v_b"), col("sk"))
    a.join(b, Seq("sk")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", Similarity.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cosine"))
  }
}
