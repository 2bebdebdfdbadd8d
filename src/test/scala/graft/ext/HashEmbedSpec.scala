package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hashed-TF embeddings ([[TextAnalysis.hashedTfEmbedding]]): integer
  * exactness against a JVM-side reimplementation, retrieval behavior
  * through the shared ANN path, and zero-vector safety. */
class HashEmbedSpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 16

  /** Independent reimplementation of the bucket/sign math (md5 60-bit
    * prefix; bucket = h mod dim, sign = bit 59). */
  private def refEmbed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    text.split("[ \t\n\f\r]+").filter(_.nonEmpty).foreach { w =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md.substring(0, 15), 16)
      val s = if (((h >>> 59) & 1L) == 0L) 1f else -1f
      v((h % dim).toInt) += s
    }
    v
  }

  test("embedding equals the independent md5 bucket/sign reimplementation") {
    val texts = Seq("alpha beta gamma", "beta beta beta", "", "  ",
      "one two three four five six seven")
    val out = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        TextAnalysis.hashedTfEmbedding(col("text"), dim).as("v"))
      .orderBy("id").collect()
      .map(_.getAs[scala.collection.Seq[Float]]("v").toArray)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(out(i).toSeq === refEmbed(t).toSeq, s"text '$t'")
    }
  }

  test("identical docs retrieve each other at cosine 1; disjoint vocab near 0") {
    val docs = Seq(
      (0L, "spark shuffle partition join"),
      (1L, "spark shuffle partition join"),
      (2L, "zebra quokka wombat lemur")).toDF("doc_id", "text")
    val emb = docs.select(col("doc_id"),
      TextAnalysis.hashedTfEmbedding(col("text"), 64).as("v"))
    val top = Similarity.bruteForceTopK(emb, "doc_id", "v",
      emb.filter(col("doc_id") === 0L), "doc_id", "v", k = 3)
      .orderBy("rank").collect()
    assert(top.take(2).map(_.getAs[Long]("corpus_id")).toSet === Set(0L, 1L))
    assert(top(0).getAs[Double]("cosine") === 1.0)
    assert(top(1).getAs[Double]("cosine") === 1.0)
    assert(math.abs(top(2).getAs[Double]("cosine")) < 0.5,
      "disjoint-vocabulary doc must be far")
  }

  test("hashed-TF + diff-of-means probe separates held-out styles") {
    // the fastText-shape quality classifier (q_quality_probe): train on
    // labeled docs of two word distributions, assert the integer-exact
    // scores separate HELD-OUT docs of each style
    val styleA = Seq("the", "quick", "brown", "fox", "jumps", "over")
    val styleB = Seq("zzq", "wvx", "ppl", "krm", "jjt", "bbn")
    def doc(style: Seq[String], seed: Int) =
      (0 until 12).map(i => style((seed * 7 + i * 3) % style.length))
        .mkString(" ")
    val train = (0 until 30).map(i =>
      (i.toLong, doc(if (i % 2 == 0) styleA else styleB, i), i % 2 == 0))
    val test_ = (100 until 110).map(i =>
      (i.toLong, doc(if (i % 2 == 0) styleA else styleB, i), i % 2 == 0))
    val all = (train ++ test_).toDF("id", "text", "is_a")
    val emb = all.select(col("id"), col("is_a"),
      transform(TextAnalysis.hashedTfEmbedding(col("text"), 64),
        x => x / lit(1024.0f)).as("emb"))
    val scores = graft.ml.DiffOfMeans.scoresExact(
      emb, col("id"), col("emb"), col("is_a"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val heldA = test_.filter(_._3).map(t => scores(t._1))
    val heldB = test_.filterNot(_._3).map(t => scores(t._1))
    assert(heldA.min > heldB.max,
      s"style-A held-out scores ${heldA.toList} must exceed ${heldB.toList}")
  }

  test("empty text embeds to the zero vector and scores cosine 0 safely") {
    val docs = Seq((0L, "some words"), (1L, "")).toDF("doc_id", "text")
    val emb = docs.select(col("doc_id"),
      TextAnalysis.hashedTfEmbedding(col("text"), dim).as("v"))
    assert(emb.filter(col("doc_id") === 1L).collect()(0)
      .getAs[scala.collection.Seq[Float]]("v").forall(_ == 0f))
    val top = Similarity.bruteForceTopK(emb, "doc_id", "v",
      emb.filter(col("doc_id") === 1L), "doc_id", "v", k = 2).collect()
    assert(top.forall(_.getAs[Double]("cosine") == 0.0))
  }
}
