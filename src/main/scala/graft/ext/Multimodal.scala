package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata. The Spark-side plumbing — schemas, partition-preserving
  * `mapPartitions` batching, metadata structs — is real and tested; the
  * decode kernels are DETERMINISTIC STUBS (this container has no image/audio
  * codecs): metadata derives from the md5 of the bytes, so results are
  * reproducible and SQL-oracle-checkable. A production deployment swaps
  * `decodeImageMetaBatch` for a real codec call (JNI/ONNX/HTTP); nothing
  * else changes.
  *
  * Scale notes: all ops are narrow (per-partition, no shuffle); batching
  * bounds peak memory per task; binary columns stream through the
  * vectorized parquet reader without driver involvement.
  */
object Multimodal {

  private def md5hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes).map("%02x".format(_)).mkString

  /** STUB image decode — deterministic fake dimensions/format from content
    * hash (a real impl calls an image codec here; batch signature stays). */
  def decodeImageMetaBatch(images: Seq[Array[Byte]]): Seq[(Int, Int, String)] =
    images.map { bytes =>
      val h = md5hex(bytes)
      val w = 16 + Integer.parseInt(h.substring(0, 4), 16) % 1008
      val ht = 16 + Integer.parseInt(h.substring(4, 8), 16) % 1008
      val fmt = Seq("jpeg", "png", "webp")(Integer.parseInt(h.substring(8, 10), 16) % 3)
      (w, ht, fmt)
    }

  /** Attach decoded image metadata to a binary column via batched
    * mapPartitions. `idCol` rides along so no join is needed afterwards. */
  def withImageMeta(df: DataFrame, idCol: String, binCol: String,
                    batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("format", StringType, nullable = false)))
    val out = df.select(col(idCol).cast("long"), col(binCol).cast("binary")).rdd
      .mapPartitions { it =>
        it.map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
          .grouped(batchSize)
          .flatMap { batch =>
            val metas = decodeImageMetaBatch(batch.map(_._2))
            require(metas.length == batch.length,
              s"decoder returned ${metas.length} results for a batch of ${batch.length}")
            batch.map(_._1).zip(metas)
          }
      }
      .map { case (id, (w, h, f)) => Row(id, w, h, f) }
    spark.createDataFrame(out, schema)
  }

  /** STUB resize: target dimensions from a fit-within box preserving aspect
    * ratio (pure integer math over the decoded metadata — this part is real;
    * the pixel resampling a codec would do is the stub). Emits the resized
    * payload's fingerprint so downstream dedup can run on resized identity. */
  def withResizedMeta(meta: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide).cast("double") / col("width"),
      lit(maxSide).cast("double") / col("height"),
      lit(1.0))
    meta
      .withColumn("resized_w", greatest(floor(col("width") * scale).cast("long"), lit(1L)))
      .withColumn("resized_h", greatest(floor(col("height") * scale).cast("long"), lit(1L)))
  }

  /** STUB feature extraction: a d-dim embedding per binary payload, derived
    * from content hashes (a real impl runs a vision encoder over the decoded
    * image inside the same batched mapPartitions shape as
    * [[withImageMeta]]). Values are exact doubles — int(md5(payload ++
    * ":i")[0:8], 16) / 2^31 - 1 — so the column is oracle-checkable and
    * flows straight into the ANN/dedup operators. */
  def imageEmbeddingBatch(images: Seq[Array[Byte]], dim: Int): Seq[Seq[Double]] =
    images.map { bytes =>
      (0 until dim).map { i =>
        val keyed = bytes ++ s":$i".getBytes("UTF-8")
        java.lang.Long.parseLong(md5hex(keyed).substring(0, 8), 16) / 2147483648.0 - 1.0
      }
    }

  def withImageEmbedding(df: DataFrame, idCol: String, binCol: String,
                         dim: Int = 8, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("embedding", ArrayType(DoubleType), nullable = false)))
    val out = df.select(col(idCol).cast("long"), col(binCol).cast("binary")).rdd
      .mapPartitions { it =>
        it.map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
          .grouped(batchSize)
          .flatMap { batch =>
            val vecs = imageEmbeddingBatch(batch.map(_._2), dim)
            require(vecs.length == batch.length,
              s"encoder returned ${vecs.length} results for a batch of ${batch.length}")
            batch.map(_._1).zip(vecs)
          }
      }
      .map { case (id, vec) => Row(id, vec) }
    spark.createDataFrame(out, schema)
  }

  /** Video-style frame sampling — pure expressions (codegen'd, no UDF):
    * frame count at a fixed frame size plus the fingerprint of the first
    * frame. Frames are fixed-size chunks of the payload (character chunks
    * for the text stand-in payload, so the md5 is engine-portable; a real
    * byte payload would chunk bytes identically). A real decoder would emit
    * one row per sampled frame; the schema/arity logic is identical. */
  def frameStats(payload: Column, frameChars: Int): Seq[(String, Column)] = Seq(
    "n_bytes" -> octet_length(payload).cast("long"),
    "n_frames" -> ceil(length(payload).cast("double") / frameChars).cast("long"),
    "first_frame_md5" -> md5(substring(payload, 1, frameChars).cast("binary")))

  /** Audio-style fixed-rate windowing: window count plus the fingerprint of
    * the first window — again: real DSP would replace the kernel, not the
    * plumbing. */
  def audioWindowStats(payload: Column, windowChars: Int): Seq[(String, Column)] = Seq(
    "n_windows" -> ceil(length(payload).cast("double") / windowChars).cast("long"),
    "first_window_md5" -> md5(substring(payload, 1, windowChars).cast("binary")))
}
