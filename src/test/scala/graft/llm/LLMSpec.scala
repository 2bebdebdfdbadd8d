package graft.llm

import graft.SparkTestBase
import graft.spec._
import graft.runner.LocalSparkRunner

class LLMSpec extends SparkTestBase {

  private def newRunner() = new LocalSparkRunner(spark, newStoreDir())

  private def ds = LoadInlineJsonDatasetOp(Map(
    "text" -> Seq("hello world", "goodbye", "hello world", "")))

  test("scheme registry resolves and rejects like the reference") {
    val (p, rest) = ModelRegistry.get("fake:d8")
    assert(p.isInstanceOf[FakeProvider])
    assert(rest == "d8")
    assert(p.asInstanceOf[FakeProvider].dim == 8)
    intercept[IllegalArgumentException](ModelRegistry.get("noscheme"))
    intercept[IllegalArgumentException](ModelRegistry.get("bogus:model"))
  }

  test("fake activations: deterministic, layer- and mode-sensitive, right shape") {
    val r = newRunner()
    val text = SelectTextColumnOp(ds, "text")
    val a1 = LLMLayerActivationsOp("fake:d8", text, layerNum = -1L, batchSize = 2L)
    val v1 = r.toValues(a1).map(_.asInstanceOf[scala.collection.Seq[Double]])
    assert(v1.length == 4)
    assert(v1.forall(_.length == 8))
    assert(v1.forall(_.forall(x => x >= -1.0 && x < 1.0)))
    // identical text → identical vector (rows 0 and 2)
    assert(v1(0) == v1(2))
    // determinism across materializations (fresh store)
    val v1b = newRunner().toValues(a1).map(_.asInstanceOf[scala.collection.Seq[Double]])
    assert(v1 == v1b)
    // layer and token-mode change the output
    val v2 = r.toValues(LLMLayerActivationsOp("fake:d8", text, -2L, batchSize = 2L))
      .map(_.asInstanceOf[scala.collection.Seq[Double]])
    assert(v1 != v2)
    val v3 = r.toValues(LLMLayerActivationsOp("fake:d8", text, -1L,
      tokenMode = "mean", batchSize = 2L))
      .map(_.asInstanceOf[scala.collection.Seq[Double]])
    assert(v1 != v3)
  }

  test("activations persist content-addressed; engine knobs don't refragment the store") {
    val store = newStoreDir()
    val r = new LocalSparkRunner(spark, store)
    val text = SelectTextColumnOp(ds, "text")
    val small = LLMLayerActivationsOp("fake:d8", text, -1L, batchSize = 2L)
    val large = LLMLayerActivationsOp("fake:d8", text, -1L, batchSize = 999L,
      device = "cpu")
    r.materialize(small)
    // same uuid → the big-batch variant is already done (cache hit)
    assert(large.uuid == small.uuid)
    assert(new LocalSparkRunner(spark, store).hasResult(large))
  }

  test("logit scores: one value per requested token, string or int ids") {
    val r = newRunner()
    val text = SelectTextColumnOp(ds, "text")
    val op = LLMLogitScoresOp("fake:d8", text, Seq("yes", "no", 42L))
    val vals = r.toValues(op).map(_.asInstanceOf[scala.collection.Seq[Double]])
    assert(vals.forall(_.length == 3))
    // different token list → different scores
    val op2 = LLMLogitScoresOp("fake:d8", text, Seq("yes", "maybe", 42L))
    val vals2 = r.toValues(op2).map(_.asInstanceOf[scala.collection.Seq[Double]])
    assert(vals != vals2)
    assert(vals.map(_.head) == vals2.map(_.head)) // shared first token agrees
  }

  test("generate: deterministic fake generations") {
    val r = newRunner()
    val text = SelectTextColumnOp(ds, "text")
    val gen = LLMGenerateTextOp("fake:d8", text, maxTokens = 10L)
    val out = r.toValues(gen).map(_.asInstanceOf[String])
    assert(out.forall(_.startsWith("gen:")))
    assert(out(0) == out(2))
    assert(out(0) != out(1))
  }

  test("conversation input renders to canonical text before hashing") {
    val r = newRunner()
    val conv = LoadInlineJsonDatasetOp(Map(
      "c" -> Seq("""[{"role":"user","content":"hi"}]""")))
    val acts = LLMLayerActivationsOp("fake:d4",
      ParseJSONColumnOp(SelectTextColumnOp(conv, "c")), -1L)
    assert(r.toValues(acts).length == 1)
  }

  test("fake provider hash arithmetic matches its spec (SQL-replicable)") {
    val p = FakeProvider(4)
    // md5("x|‑1|last|0")[0:8] parsed as hex → /2^31 - 1
    val v = p.value("abc")
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("abc".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = java.lang.Long.parseLong(md5.take(8), 16) / 2147483648.0 - 1.0
    assert(v == expected)
  }
}
