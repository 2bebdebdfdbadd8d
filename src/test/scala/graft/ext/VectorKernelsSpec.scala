package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The native dot-product kernel vs the HOF form it replaced: bit-equal on
  * float and double arrays, in both codegen and interpreted paths.
  */
class VectorKernelsSpec extends SparkTestBase {

  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("bit-equal to the higher-order form on float arrays") {
    val rng = new scala.util.Random(3)
    val df = (0 until 50).map { _ =>
      (Seq.fill(64)(rng.nextFloat() * 2 - 1), Seq.fill(64)(rng.nextFloat() * 2 - 1))
    }.toDF("a", "b")
    val rows = df.select(
      VectorKernels.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"native ${r.getDouble(0)} != hof ${r.getDouble(1)}"))
  }

  test("double arrays and norm round-trip") {
    val df = Seq((Seq(3.0, 4.0), Seq(1.0, 2.0))).toDF("a", "b")
    val r = df.select(
      VectorKernels.dot(col("a"), col("b")),
      Similarity.norm(col("a"))).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
  }

  test("interpreted path (codegen off) agrees") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(2.0f, 0.5f, -1.0f))).toDF("a", "b")
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(df.select(VectorKernels.dot(col("a"), col("b"))).head().getDouble(0) == 0.0)
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("type mismatch is rejected at analysis") {
    val df = Seq((Seq("x"), Seq(1.0))).toDF("a", "b")
    intercept[Exception] {
      df.select(VectorKernels.dot(col("a"), col("b"))).head()
    }
  }
}
