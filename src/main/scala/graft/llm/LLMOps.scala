package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.spec._
import graft.runner.LocalSparkRunner

/** LLM op implementations: `mapPartitions` over text rows, batched to
  * `batchSize`, provider resolved from the model-name scheme. The provider
  * call happens on executors — at cluster scale each partition drives its
  * own inference backend connection (reference runs single-process batches,
  * `model_registry_implementations.py:245-407`).
  */
object LLMOps {

  private val RowIdx = graft.ops.ColumnOps.RowIdx

  /** (row_idx, text) pairs batched through the provider, preserving order
    * within partitions (row idx travels with its text). */
  private def mapBatches(df: DataFrame, valueCol: String, batchSize: Int)(
      f: (Iterator[Seq[String]]) => Iterator[Seq[Array[Double]]]): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField(RowIdx, LongType, nullable = false),
      StructField(valueCol, ArrayType(DoubleType), nullable = false)))
    val out = df.select(col(RowIdx), col(valueCol).cast("string")).rdd
      .mapPartitions { it =>
        val pairs = it.map(r => (r.getLong(0), r.getString(1)))
        pairs.grouped(math.max(batchSize, 1)).flatMap { batch =>
          val vecs = f(Iterator.single(batch.map(_._2))).next()
          // a short provider response must be a hard error, not a silent
          // row drop that gets persisted content-addressed forever
          require(vecs.length == batch.length,
            s"provider returned ${vecs.length} results for a batch of ${batch.length}")
          batch.map(_._1).zip(vecs)
        }
      }
      .map { case (idx, vec) => Row(idx, vec.toSeq) }
    spark.createDataFrame(out, schema)
  }

  /** Conversation/JSON columns render to a canonical string before hashing/
    * posting (the reference applies a chat template; a provider-side
    * concern). */
  private def textFrame(r: LocalSparkRunner, op: ColumnType): DataFrame =
    r.toFrame(op).select(col(RowIdx), col(r.ValueCol).cast("string").as(r.ValueCol))

  def layerActivations(r: LocalSparkRunner, op: LLMLayerActivationsOp): DataFrame = {
    val (provider, _) = ModelRegistry.get(op.modelName)
    mapBatches(textFrame(r, op.text.asInstanceOf[ColumnType]), r.ValueCol,
      op.batchSize.toInt)(
      texts => provider.layerActivations(texts, op.layerNum, op.tokenMode))
  }

  def logitScores(r: LocalSparkRunner, op: LLMLogitScoresOp): DataFrame = {
    val (provider, _) = ModelRegistry.get(op.modelName)
    val tokens = op.logitTokenIds
    mapBatches(textFrame(r, op.text), r.ValueCol, op.batchSize.toInt)(
      texts => provider.logitScores(texts, tokens))
  }

  def generateText(r: LocalSparkRunner, op: LLMGenerateTextOp): DataFrame = {
    val (provider, _) = ModelRegistry.get(op.modelName)
    val df = textFrame(r, op.prompt)
    val spark = df.sparkSession
    val maxTokens = op.maxTokens
    val schema = StructType(Seq(
      StructField(RowIdx, LongType, nullable = false),
      StructField(r.ValueCol, StringType, nullable = false)))
    val out = df.rdd.mapPartitions { it =>
      val pairs = it.map(r0 => (r0.getLong(0), r0.getString(1)))
      pairs.grouped(64).flatMap { batch =>
        val gens = provider.generate(Iterator.single(batch.map(_._2)), maxTokens).next()
        require(gens.length == batch.length,
          s"provider returned ${gens.length} generations for a batch of ${batch.length}")
        batch.map(_._1).zip(gens)
      }
    }.map { case (idx, s) => Row(idx, s) }
    spark.createDataFrame(out, schema)
  }
}
