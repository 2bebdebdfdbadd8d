package graft.runner

import graft.SparkTestBase
import graft.ext.Multimodal
import graft.ops.ColumnOps
import graft.spec._
import org.apache.spark.sql.functions._

/** Spec-layer multimodal ops: binary columns as first-class content-addressed
  * graph citizens — select, real-codec decode/resize/embed/audio-parse, and
  * composition with the rest of the op family (embed → ANN).
  */
class MultimodalOpsSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val store =
    java.nio.file.Files.createTempDirectory("graft-mmops-store-").toString
  private lazy val runner = new LocalSparkRunner(spark, store)

  /** Fixture parquet with (doc_id, img: binary quad PNG, audio: binary WAV),
    * one file in doc_id order. */
  private lazy val fixturePath: String = {
    val path = java.nio.file.Files
      .createTempDirectory("graft-mmops-fixture-").toString + "/media"
    val ids = (0L until 24L).toDF("doc_id")
    Multimodal.synthQuadImages(ids, "doc_id")
      .join(Multimodal.synthWavs(ids, "doc_id"), "doc_id")
      .join(Multimodal.synthFrameStreams(ids, "doc_id"), "doc_id")
      .orderBy("doc_id").coalesce(1)
      .write.mode("overwrite").parquet(path)
    path
  }

  private lazy val ds = runner.fromParquet(fixturePath)
  private lazy val img = SelectBinaryColumnOp(ds, "img")

  test("SelectBinaryColumnOp validates dtype") {
    val bad = SelectBinaryColumnOp(ds, "doc_id")
    val e = intercept[IllegalArgumentException] { runner.toFrame(bad) }
    assert(e.getMessage.contains("binary"))
  }

  test("ImageMetaOp really decodes payload dims through the store") {
    val rows = runner.toFrame(ImageMetaOp(img))
      .orderBy(ColumnOps.RowIdx).collect()
    assert(rows.length == 24)
    rows.foreach { r =>
      val idx = r.getAs[Long](ColumnOps.RowIdx) // file order == doc_id order
      assert(r.getAs[Int]("width") == Multimodal.imgW(idx))
      assert(r.getAs[Int]("height") == Multimodal.imgH(idx))
      assert(r.getAs[String]("format") == "png")
    }
  }

  test("ImageResizeOp emits a chainable binary column; embed of resize matches quad colors") {
    val emb = ImageEmbedOp(ImageResizeOp(img, maxSide = 64L), grid = 2L)
    val rows = runner.toFrame(emb).orderBy(ColumnOps.RowIdx).collect()
    rows.foreach { r =>
      val idx = r.getAs[Long](ColumnOps.RowIdx)
      val got = r.getSeq[Double](r.fieldIndex("value"))
      val want = (0 until 4).map { q =>
        val c = Multimodal.quadRgb(idx, q)
        (((c >> 16) & 0xff) + ((c >> 8) & 0xff) + (c & 0xff)) / 765.0
      }
      assert(got == want, s"idx=$idx")
    }
  }

  test("AudioMetaOp parses the WAV column with exact statistics") {
    val rows = runner.toFrame(AudioMetaOp(SelectBinaryColumnOp(ds, "audio")))
      .orderBy(ColumnOps.RowIdx).collect()
    rows.foreach { r =>
      val idx = r.getAs[Long](ColumnOps.RowIdx)
      assert(r.getAs[Int]("sample_rate") == Multimodal.wavRate(idx))
      assert(r.getAs[Long]("n_samples") == Multimodal.wavSamples(idx).toLong)
      assert(r.getAs[Double]("rms") == Multimodal.wavAmp(idx).toDouble)
    }
  }

  test("ImageEmbedOp is a vector column: flows into AnnBruteTopKOp") {
    val emb = ImageEmbedOp(img, grid = 2L)
    val queries = ImageEmbedOp(
      SelectBinaryColumnOp(TakeRowsOp(ds, numRows = Some(2L)), "img"), grid = 2L)
    val top = runner.toFrame(AnnBruteTopKOp(emb, queries, k = 3L))
      .orderBy(col("query_id"), col("rank")).collect()
    assert(top.length == 6)
    // each query's nearest corpus member is itself at cosine 1.0
    Seq(0L, 1L).foreach { q =>
      val self = top.find(r => r.getAs[Long]("query_id") == q
        && r.getAs[Int]("rank") == 1).get
      assert(self.getAs[Long]("corpus_id") == q)
      assert(self.getAs[Any]("cosine").toString.toDouble == 1.0)
    }
  }

  test("ExplodeFramesOp multiplies rows under a fresh positional identity") {
    val frames = ExplodeFramesOp(SelectBinaryColumnOp(ds, "video"))
    val rows = runner.toFrame(frames).orderBy(ColumnOps.RowIdx).collect()
    val expected = (0L until 24L).map(Multimodal.frameCount(_).toLong).sum
    assert(rows.length == expected)
    // row_idx is a contiguous 0-based permutation in (parent, frame) order
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long](ColumnOps.RowIdx) == i.toLong)
    }
    val sorted = rows.map(r => (r.getAs[Long]("parent_idx"), r.getAs[Long]("frame_idx")))
    assert(sorted.sameElements(sorted.sorted))
  }

  test("exploded frames re-enter the image family: per-frame ImageMetaOp") {
    val frames = ExplodeFramesOp(SelectBinaryColumnOp(ds, "video"))
    val meta = ImageMetaOp(SelectBinaryColumnOp(frames, "frame"))
    val parents = runner.toFrame(frames)
      .select(col(ColumnOps.RowIdx), col("parent_idx"))
    val rows = parents.join(runner.toFrame(meta), ColumnOps.RowIdx)
      .orderBy(ColumnOps.RowIdx).collect()
    rows.foreach { r =>
      val parent = r.getAs[Long]("parent_idx") // fixture order == id
      assert(r.getAs[Int]("width") == Multimodal.frameW(parent))
      assert(r.getAs[Int]("height") == Multimodal.frameH(parent))
      assert(r.getAs[String]("format") == "png")
    }
  }

  test("multimodal ops round-trip through graph serialize/deserialize") {
    val chain = ImageEmbedOp(ImageResizeOp(img, maxSide = 64L), grid = 2L)
    val audio = AudioMetaOp(SelectBinaryColumnOp(ds, "audio"))
    Seq[OpSpec](chain, ImageMetaOp(img), audio).foreach { op =>
      val back = Graph.deserialize(Graph.serialize(op))
      assert(back.exists(_.uuid == op.uuid),
        s"uuid lost through round trip for ${op.typeName}")
    }
  }

  test("materialized multimodal results rehydrate by uuid") {
    val meta = ImageMetaOp(img)
    runner.toFrame(meta).count()
    val back = runner.uuidToOp(meta.uuid)
    assert(back == meta)
  }
}
