package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** In-process MLP provider: forward-pass arithmetic against hand-computed
  * values, layer semantics, head logits, greedy decoding, JSON round-trip,
  * registry resolution. No SparkSession needed — the provider is plain JVM
  * (that is the point).
  */
class MlpProviderSpec extends AnyFunSuite {

  // dim_in=4; layer1: 4->2 ReLU; layer2 (head): 2->2 affine
  private def tiny = new MlpProvider(
    dimIn = 4,
    weights = Array(
      Array(Array(1.0, 0.0, -1.0, 0.0), Array(0.0, 2.0, 0.0, 0.0)),
      Array(Array(1.0, 1.0), Array(0.0, -1.0))),
    biases = Array(Array(0.5, -0.5), Array(0.0, 1.0)),
    vocab = Seq("a" -> Array(1.0, 0.0), "b" -> Array(0.0, 1.0)))

  test("forward pass matches hand computation, layer by layer") {
    // hashedTfVector is word-hash-dependent; bypass it by feeding the
    // EMPTY text (all-zero features) so the arithmetic is pure bias flow
    val l1 = tiny.forward("", 1)
    assert(l1.toSeq == Seq(0.5, 0.0)) // relu(0.5), relu(-0.5)
    val l2 = tiny.forward("", 2)
    // head (no relu): [0.5+0.0, 1.0-0.0] = [0.5, 1.0]
    assert(l2.toSeq == Seq(0.5, 1.0))
  }

  test("real text flows the hashed-TF features of TextAnalysis verbatim") {
    val x = graft.ext.TextAnalysis.hashedTfVector("spark merge window", 4)
    val expectL1 = {
      val pre0 = 0.5 + 1.0 * x(0) - 1.0 * x(2)
      val pre1 = -0.5 + 2.0 * x(1)
      Seq(math.max(0.0, pre0), math.max(0.0, pre1))
    }
    assert(tiny.forward("spark merge window", 1).toSeq == expectL1)
  }

  test("layer bounds are a hard error") {
    intercept[IllegalArgumentException](tiny.forward("x", 0))
    intercept[IllegalArgumentException](tiny.forward("x", 3))
  }

  test("logits = head dot vocab vectors; unknown token is a hard error") {
    val Seq(logits) =
      tiny.logitScores(Iterator(Seq("")), Seq("a", "b")).next()
    assert(logits.toSeq == Seq(0.5, 1.0))
    intercept[NoSuchElementException](
      tiny.logitScores(Iterator(Seq("")), Seq("zz")).next())
  }

  test("greedy generate is deterministic and re-encodes the grown prompt") {
    val Seq(g1) = tiny.generate(Iterator(Seq("seed")), 3).next()
    val Seq(g2) = tiny.generate(Iterator(Seq("seed")), 3).next()
    assert(g1 == g2)
    assert(g1.split(" ").length == 3)
    assert(g1.split(" ").forall(Set("a", "b")))
  }

  test("generate edge cases: zero budget, empty vocab, null prompt") {
    // maxTokens=0: nothing generated, empty continuation (not an
    // out-of-bounds substring)
    assert(tiny.generate(Iterator(Seq("seed")), 0).next() == Seq(""))
    assert(tiny.generate(Iterator(Seq(null)), 0).next() == Seq(""))
    // a headless model cannot decode — loud error, not the literal "null"
    val headless = new MlpProvider(4,
      Array(Array(Array(1.0, 0.0, -1.0, 0.0), Array(0.0, 2.0, 0.0, 0.0))),
      Array(Array(0.5, -0.5)), vocab = Seq.empty)
    intercept[IllegalArgumentException] {
      headless.generate(Iterator(Seq("seed")), 2).next()
    }
    // but a zero budget never needs the head, even headless
    assert(headless.generate(Iterator(Seq("seed")), 0).next() == Seq(""))
  }

  test("JSON round-trip and registry resolution") {
    val json = """{"dim_in": 4,
      "layers": [
        {"w": [[1.0,0.0,-1.0,0.0],[0.0,2.0,0.0,0.0]], "b": [0.5,-0.5]},
        {"w": [[1.0,1.0],[0.0,-1.0]], "b": [0.0,1.0]}],
      "vocab": {"a": [1.0,0.0], "b": [0.0,1.0]}}"""
    val f = java.nio.file.Files.createTempFile("mlp-", ".json")
    java.nio.file.Files.writeString(f, json)
    val (p, rest) = ModelRegistry.get(s"mlp:$f")
    assert(rest == f.toString)
    val mp = p.asInstanceOf[MlpProvider]
    assert(mp.forward("", 2).toSeq == tiny.forward("", 2).toSeq)
    assert(mp.forward("some words here", 2).toSeq
      == tiny.forward("some words here", 2).toSeq)
  }

  test("shape validation rejects inconsistent layers") {
    intercept[IllegalArgumentException] {
      new MlpProvider(4,
        Array(Array(Array(1.0, 2.0))), // in-dim 2 != 4
        Array(Array(0.0)), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      new MlpProvider(2,
        Array(Array(Array(1.0, 2.0))),
        Array(Array(0.0, 1.0)), Seq.empty) // bias len 2 != out 1
    }
  }
}
