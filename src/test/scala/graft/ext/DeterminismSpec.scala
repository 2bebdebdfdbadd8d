package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The order-freeness claims behind the integer-quantization design,
  * proven on the engine itself: LM log-prob sums, DSIR weights, and BM25
  * rankings must be BIT-IDENTICAL under any input row order and any
  * partitioning — that is what makes them hash-comparable at arbitrary
  * cluster parallelism, not just on one local plan. */
class DeterminismSpec extends SparkTestBase {
  import spark.implicits._

  // seeded pseudo-random corpus: ~10-word docs over a 40-word vocabulary
  private def corpus(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val len = 3 + rnd.nextInt(12)
      (i.toLong, Seq.fill(len)(s"w${rnd.nextInt(40)}").mkString(" "),
        if (rnd.nextBoolean()) "en" else "xx")
    }
  }

  private def variants(rows: Seq[(Long, String, String)]) = Seq(
    rows.toDF("doc_id", "text", "lang").repartition(1),
    rows.reverse.toDF("doc_id", "text", "lang").repartition(7),
    new scala.util.Random(99).shuffle(rows)
      .toDF("doc_id", "text", "lang").repartition(3))

  test("LM scores are bit-identical across row orders and partitionings") {
    val rows = corpus(300, seed = 5)
    val outs = variants(rows).map { df =>
      LangModel.perplexity(df, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
        .sortBy(_._1).toSeq
    }
    assert(outs(0) == outs(1) && outs(0) == outs(2))
  }

  test("trigram LM scores are bit-identical across row orders and partitionings") {
    val rows = corpus(300, seed = 7)
    val outs = variants(rows).map { df =>
      LangModel.score3(df, "doc_id", "text",
          LangModel.fit3(df.filter($"doc_id" % 2 === 0), "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))
        .sortBy(_._1).toSeq
    }
    assert(outs(0) == outs(1) && outs(0) == outs(2))
  }

  test("DSIR weights are bit-identical across row orders and partitionings") {
    val rows = corpus(300, seed = 11)
    val outs = variants(rows).map { df =>
      val ratios = Dsir.fitLogRatios(spark,
        df.filter($"lang" === "en"), df, "text", m = 128)
      Dsir.importanceWeights(df, "doc_id", "text", ratios, 128)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    }
    assert(outs(0) == outs(1) && outs(0) == outs(2))
  }

  test("BM25 top-k is identical across row orders and partitionings") {
    val rows = corpus(300, seed = 23)
    val outs = variants(rows).map { df =>
      Bm25.rank(df, "doc_id", "text", Seq("w1", "w7", "w39"), k = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }
    assert(outs(0) == outs(1) && outs(0) == outs(2))
  }
}
