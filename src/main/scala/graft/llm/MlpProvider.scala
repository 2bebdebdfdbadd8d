package graft.llm

/** IN-PROCESS inference provider — the JVM answer to the reference's
  * in-process `hf:`/`tl:` torch providers
  * (`/root/reference/src/krnel/graph/runners/local_runner/
  * model_registry_implementations.py:81-407`): model weights load ONCE on
  * the driver, ship to executors inside the task closure, and every
  * forward pass runs in the executor JVM — no HTTP hop, no external
  * server, inference throughput scales with partitions exactly like any
  * other map-side operator.
  *
  * The documented public-knowledge path for arbitrary architectures is
  * ONNX Runtime's Java API; its jar cannot resolve in this zero-egress
  * container, so the shipped provider executes the architecture that CAN
  * be complete in pure JVM: a feature-hashing MLP text encoder —
  * fastText-shaped (Joulin et al. 2016: hashed bag-of-words → dense
  * layers), the same input primitive as
  * [[graft.ext.TextAnalysis.hashedTfEmbedding]] so inputs are
  * SQL-replayable bit for bit. The weight format is a plain JSON file
  * (trivially exportable from any training framework):
  *
  * {{{
  * {"dim_in": 16,
  *  "layers": [{"w": [[...out×in...]], "b": [...out...]}, ...],
  *  "vocab":  {"yes": [...dim_out...], "no": [...]}}
  * }}}
  *
  * Forward pass: `x0 = hashedTf(text, dim_in)`;
  * `x_l = relu(W_l · x_{l-1} + b_l)` for every layer except the LAST,
  * which is affine only (the embedding head). ReLU (not tanh/sigmoid) is
  * deliberate: with dyadic-rational weights every product and sum is
  * exact in IEEE double, so activations hash-match an external SQL replay
  * — the quantized-exact discipline applied to neural inference.
  *
  * Provider surface:
  *  - `layerActivations(layerNum, _)`: the activation vector AFTER layer
  *    `layerNum` (1-based) — REAL intermediate layers, unlike the
  *    last-layer-only HTTP embedding providers; `tokenMode` is accepted
  *    but immaterial (bag-of-words input has one pooled position).
  *  - `logitScores(tokens)`: final embedding · vocab[token] per token.
  *  - `generate(prompts, maxTokens)`: greedy argmax over the vocab head,
  *    re-encoding the grown prompt each step (ties → lexicographically
  *    smaller token) — deterministic, closure-free decoding.
  *
  * Scale shape: the provider object (weights included) serializes into
  * the `mapPartitions` closure — fine for the MB-scale heads this format
  * targets; a GB-scale model would ride a broadcast instead, which is a
  * one-line change at the call site and deliberately NOT defaulted (most
  * probes/heads are small, and broadcast registration has its own
  * lifecycle cost).
  */
final class MlpProvider(val dimIn: Int,
                        val weights: Array[Array[Array[Double]]],
                        val biases: Array[Array[Double]],
                        val vocab: Seq[(String, Array[Double])])
    extends ModelProvider {

  require(dimIn >= 1, s"dim_in must be >= 1, got $dimIn")
  require(weights.length >= 1, "need at least one layer")
  require(weights.length == biases.length,
    s"${weights.length} weight matrices vs ${biases.length} bias vectors")
  locally { // shape check: layer l maps dims(l) -> dims(l+1)
    var d = dimIn
    for (l <- weights.indices) {
      require(weights(l).nonEmpty && weights(l).forall(_.length == d),
        s"layer $l expects input dim $d")
      require(biases(l).length == weights(l).length,
        s"layer $l bias length ${biases(l).length} != out ${weights(l).length}")
      d = weights(l).length
    }
    require(vocab.forall(_._2.length == d),
      s"vocab vectors must have the final dim $d")
  }

  private val vocabMap: Map[String, Array[Double]] = vocab.toMap

  def nLayers: Int = weights.length

  /** Forward to (and including) layer `upTo` (1-based) — the single-text
    * entry point (callers embedding a column wrap it in a UDF or go
    * through `LLMLayerActivationsOp`, which batches via the provider
    * iterator surface). */
  def forward(text: String, upTo: Int): Array[Double] = {
    require(upTo >= 1 && upTo <= nLayers,
      s"layerNum must be in [1, $nLayers], got $upTo")
    var x = graft.ext.TextAnalysis.hashedTfVector(
      if (text == null) "" else text, dimIn).map(_.toDouble)
    var l = 0
    while (l < upTo) {
      val w = weights(l); val b = biases(l)
      val out = new Array[Double](w.length)
      var j = 0
      while (j < w.length) {
        var acc = b(j)
        val row = w(j)
        var i = 0
        while (i < row.length) { acc += row(i) * x(i); i += 1 }
        // ReLU on every layer except the final embedding head
        out(j) = if (l < nLayers - 1 && acc < 0.0) 0.0 else acc
        j += 1
      }
      x = out
      l += 1
    }
    x
  }

  override def layerActivations(texts: Iterator[Seq[String]], layerNum: Long,
                                tokenMode: String): Iterator[Seq[Array[Double]]] =
    texts.map(_.map(t => forward(t, layerNum.toInt)))

  private def logit(emb: Array[Double], token: String): Double = {
    val v = vocabMap.getOrElse(token, throw new NoSuchElementException(
      s"token '$token' not in the model head (${vocab.map(_._1).mkString(", ")})"))
    var acc = 0.0; var i = 0
    while (i < v.length) { acc += v(i) * emb(i); i += 1 }
    acc
  }

  override def logitScores(texts: Iterator[Seq[String]],
                           tokens: Seq[Any]): Iterator[Seq[Array[Double]]] =
    texts.map(_.map { t =>
      val emb = forward(t, nLayers)
      tokens.map(tok => logit(emb, String.valueOf(tok))).toArray
    })

  override def generate(prompts: Iterator[Seq[String]],
                        maxTokens: Long): Iterator[Seq[String]] =
    prompts.map(_.map { p =>
      // nothing to decode → nothing generated (the substring arithmetic
      // below assumes at least one appended token); decoding at all
      // needs a head to argmax over
      if (maxTokens <= 0L) ""
      else {
      require(vocab.nonEmpty,
        "generate: model has no vocab head — nothing to decode with")
      val sb = new StringBuilder(if (p == null) "" else p)
      var k = 0L
      while (k < maxTokens) {
        val emb = forward(sb.toString, nLayers)
        // greedy argmax; ties -> lexicographically smaller token (vocab
        // iterated in sorted order, strict > keeps the first max)
        var best: String = null; var bestV = Double.NegativeInfinity
        for ((tok, _) <- vocabSorted) {
          val v = logit(emb, tok)
          if (v > bestV) { bestV = v; best = tok }
        }
        sb.append(' ').append(best)
        k += 1
      }
      sb.toString.substring(if (p == null) 1 else p.length + 1)
      }
    })

  private val vocabSorted: Seq[(String, Array[Double])] = vocab.sortBy(_._1)
}

object MlpProvider {

  /** Load from the JSON weight file (see class doc for the format). */
  def fromJson(path: String): MlpProvider = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(new java.io.File(path))
    require(root.has("dim_in") && root.has("layers"),
      s"$path: expected {dim_in, layers[, vocab]}")
    val dimIn = root.get("dim_in").asInt()
    def arr1(n: com.fasterxml.jackson.databind.JsonNode): Array[Double] = {
      val out = new Array[Double](n.size())
      var i = 0
      while (i < out.length) { out(i) = n.get(i).asDouble(); i += 1 }
      out
    }
    def arr2(n: com.fasterxml.jackson.databind.JsonNode): Array[Array[Double]] =
      (0 until n.size()).map(i => arr1(n.get(i))).toArray
    val layers = root.get("layers")
    val ws = (0 until layers.size()).map(l => arr2(layers.get(l).get("w"))).toArray
    val bs = (0 until layers.size()).map(l => arr1(layers.get(l).get("b"))).toArray
    val vocab =
      if (!root.has("vocab")) Seq.empty[(String, Array[Double])]
      else {
        val v = root.get("vocab")
        val names = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Double])]
        val it = v.fieldNames()
        while (it.hasNext) { val k = it.next(); names += k -> arr1(v.get(k)) }
        names.toSeq.sortBy(_._1) // field order is not identity; pin it
      }
    new MlpProvider(dimIn, ws, bs, vocab)
  }
}
