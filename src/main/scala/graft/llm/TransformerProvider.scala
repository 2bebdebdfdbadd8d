package graft.llm

/** IN-PROCESS TRANSFORMER inference — the round-18 narrowing of the one
  * remaining provider gap (the reference's in-process `hf:`/`tl:` torch
  * transformers, `/root/reference/src/krnel/graph/runners/local_runner/
  * model_registry_implementations.py:81-407`): a single-layer,
  * single-head causal-attention text encoder executed entirely in the
  * executor JVM — REAL attention over token positions, residual
  * connections, LayerNorm, and a position-wise FFN, not a bag-of-words
  * pool. The ONNX Runtime Java path for arbitrary checkpoints stays
  * blocked by the zero-egress container; this provider executes the
  * transformer computation that CAN be complete in pure JVM, with weights
  * from a plain JSON file (trivially exportable from any framework).
  *
  * == The exactness discipline (what makes this oracle-able) ==
  * Every step is either EXACT in IEEE double or CORRECTLY ROUNDED with a
  * FIXED operand order, so an external SQL replay (DuckDB) reproduces
  * every activation bit for bit:
  *
  *  - Token embeddings are 4-bit nibbles of the replayable 60-bit md5
  *    hash, scaled by 1/16 — exact dyadic rationals; positional encodings
  *    and all weight matrices are dyadic (n/16) too, so the q/k/v
  *    projections and q·k scores are EXACT (every product and sum stays
  *    inside the 52-bit mantissa).
  *  - Attention uses an INTEGER-SOFTMAX: score = floor(16 · q·k) (exact →
  *    floor is deterministic, no round-half ambiguity), row-max
  *    subtraction in integers, and weights 2^(s−max) built by
  *    `Math.scalb` — exact powers of two (no `exp`, no `pow`; the SQL
  *    twin indexes a literal table of the same 61 values). The weighted
  *    value sums and the single normalizing division are correctly
  *    rounded with a fixed j-ascending fold — deterministic on both
  *    engines.
  *  - LayerNorm divides by dim (a power of two — exact) and uses IEEE
  *    `sqrt` (correctly rounded everywhere); the FFN's ReLU is written as
  *    `if (v < 0) 0 else v` and replayed as the identical CASE (not
  *    `greatest`, which would normalize −0.0).
  *  - Absent positions (text shorter than `maxLen`) contribute EXACT
  *    zeros to every masked sum, so one unrolled expression serves every
  *    length; mean-pooling divides by the real token count.
  *
  * Provider surface (the [[ModelProvider]] contract):
  *  - `layerActivations(1, mode)` = the post-attention LayerNorm state,
  *    `layerActivations(2, mode)` = the post-FFN residual state — REAL
  *    intermediate layers. `tokenMode` is honored: "mean" pools over
  *    positions, "last" returns the final real position's vector (the
  *    two modes the reference's torch providers serve).
  *  - `logitScores(tokens)` = pooled final state · vocab[token].
  *  - `generate(prompts, max)`: greedy argmax over the vocab head,
  *    re-encoding the grown prompt each step (ties → lexicographically
  *    smaller token).
  *
  * Scale shape: identical to [[MlpProvider]] — weights ride the task
  * closure (KB-scale here; a broadcast is the one-line variant for big
  * heads), inference is map-side, throughput scales with partitions.
  */
final class TransformerProvider(val dim: Int, val maxLen: Int,
                                val wq: Array[Array[Double]],
                                val wk: Array[Array[Double]],
                                val wv: Array[Array[Double]],
                                val w1: Array[Array[Double]],
                                val b1: Array[Double],
                                val w2: Array[Array[Double]],
                                val b2: Array[Double],
                                val vocab: Seq[(String, Array[Double])])
    extends ModelProvider {

  require(dim >= 1, s"dim must be >= 1, got $dim")
  require(maxLen >= 1, s"max_len must be >= 1, got $maxLen")
  private def reqMat(m: Array[Array[Double]], name: String): Unit =
    require(m.length == dim && m.forall(_.length == dim),
      s"$name must be $dim x $dim")
  reqMat(wq, "wq"); reqMat(wk, "wk"); reqMat(wv, "wv")
  reqMat(w1, "w1"); reqMat(w2, "w2")
  require(b1.length == dim && b2.length == dim, "biases must have length dim")
  require(vocab.forall(_._2.length == dim),
    s"vocab vectors must have the final dim $dim")

  private val vocabMap: Map[String, Array[Double]] = vocab.toMap
  private val vocabSorted: Seq[(String, Array[Double])] = vocab.sortBy(_._1)

  def nLayers: Int = 2

  /** 60-bit md5 prefix of the token — the engine-wide replayable string
    * hash (DuckDB: `CAST('0x'||substr(md5(t),1,15) AS BIGINT)`). */
  private def hash60(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Deterministic positional encoding (dyadic): p(i,k) =
    * (((5i + 3k + 1) mod 9) − 4) / 16. */
  private def pos(i: Int, k: Int): Double =
    (((5 * i + 3 * k + 1) % 9) - 4) / 16.0

  private def matVec(w: Array[Array[Double]], x: Array[Double]): Array[Double] = {
    val out = new Array[Double](dim)
    var r = 0
    while (r < dim) {
      var acc = 0.0; val row = w(r); var c = 0
      while (c < dim) { acc += row(c) * x(c); c += 1 }
      out(r) = acc; r += 1
    }
    out
  }

  /** Full forward pass: (post-attention-LayerNorm states, post-FFN
    * states, n real tokens). Positions ≥ n carry zeros and are masked
    * out of attention and pooling exactly like the SQL twin. */
  private[llm] def states(text: String): (Array[Array[Double]], Array[Array[Double]], Int) = {
    val toks = (if (text == null) "" else text)
      .split("[ \t\n\f\r]+").filter(_.nonEmpty).take(maxLen)
    val n = toks.length
    // x_i = nibble embedding of hash60(token) + positional encoding
    val x = Array.tabulate(maxLen) { i =>
      if (i >= n) new Array[Double](dim)
      else {
        val h = hash60(toks(i))
        Array.tabulate(dim)(k =>
          (((h >>> (4 * (k % 15))) & 0xFL) - 8L) / 16.0 + pos(i, k))
      }
    }
    val q = x.map(matVec(wq, _))
    val k = x.map(matVec(wk, _))
    val v = x.map(matVec(wv, _))
    // integer-softmax causal attention: s_ij = floor(16 q_i k_j) (exact),
    // weights 2^(s - rowmax) via scalb (exact powers of two), masked
    // positions contribute exact zeros; ONE division per output component
    val ln = new Array[Array[Double]](maxLen)
    val y = new Array[Array[Double]](maxLen)
    var i = 0
    while (i < maxLen) {
      if (i >= n) { ln(i) = new Array[Double](dim); y(i) = new Array[Double](dim) }
      else {
        val s = new Array[Long](maxLen)
        var mx = Long.MinValue
        var j = 0
        while (j <= i) {
          var dp = 0.0; var d = 0
          while (d < dim) { dp += q(i)(d) * k(j)(d); d += 1 }
          s(j) = math.floor(16.0 * dp).toLong
          if (s(j) > mx) mx = s(j)
          j += 1
        }
        val e = new Array[Double](maxLen)
        j = 0
        while (j <= i) {
          val ex = math.max(s(j) - mx, -60L)
          e(j) = Math.scalb(1.0, ex.toInt)
          j += 1
        }
        var sS = 0.0
        j = 0
        while (j < maxLen) { sS += e(j); j += 1 }
        val z = new Array[Double](dim)
        var d = 0
        while (d < dim) {
          var num = 0.0
          j = 0
          while (j < maxLen) { num += e(j) * v(j)(d); j += 1 }
          z(d) = x(i)(d) + num / sS
          d += 1
        }
        // LayerNorm: /dim is a power-of-two division (exact), sqrt is
        // IEEE-correctly-rounded on both engines; eps = 2^-16
        var mu = 0.0
        d = 0
        while (d < dim) { mu += z(d); d += 1 }
        mu = mu / dim
        var va = 0.0
        d = 0
        while (d < dim) { val t = z(d) - mu; va += t * t; d += 1 }
        va = va / dim
        val sd = math.sqrt(va + 0.0000152587890625)
        val lni = Array.tabulate(dim)(d => (z(d) - mu) / sd)
        ln(i) = lni
        // position-wise FFN + residual; ReLU spelled to preserve -0.0
        val f = new Array[Double](dim)
        var c = 0
        while (c < dim) {
          var acc = b1(c); var kk = 0
          while (kk < dim) { acc += w1(c)(kk) * lni(kk); kk += 1 }
          f(c) = if (acc < 0.0) 0.0 else acc
          c += 1
        }
        val yi = new Array[Double](dim)
        d = 0
        while (d < dim) {
          var acc = b2(d); var cc = 0
          while (cc < dim) { acc += w2(d)(cc) * f(cc); cc += 1 }
          yi(d) = lni(d) + acc
          d += 1
        }
        y(i) = yi
      }
      i += 1
    }
    (ln, y, n)
  }

  /** Pooled state at `layerNum` (1 = post-attention LayerNorm, 2 =
    * post-FFN residual) under `tokenMode` ("mean" | "last"). Empty text →
    * the zero vector (nothing to pool). */
  def pooled(text: String, layerNum: Int, tokenMode: String): Array[Double] = {
    require(layerNum >= 1 && layerNum <= nLayers,
      s"layerNum must be in [1, $nLayers], got $layerNum")
    require(tokenMode == "mean" || tokenMode == "last",
      s"tokenMode must be 'mean' or 'last', got '$tokenMode'")
    val (ln, y, n) = states(text)
    val st = if (layerNum == 1) ln else y
    if (n == 0) new Array[Double](dim)
    else if (tokenMode == "last") st(n - 1)
    else {
      val out = new Array[Double](dim)
      var d = 0
      while (d < dim) {
        // zero-padded fold over ALL maxLen positions (absent states are
        // exact zero vectors) — the same fold the SQL twin unrolls, so
        // even a −0.0 partial sum normalizes identically on both engines
        var acc = 0.0; var i = 0
        while (i < maxLen) { acc += st(i)(d); i += 1 }
        out(d) = acc / n
        d += 1
      }
      out
    }
  }

  override def layerActivations(texts: Iterator[Seq[String]], layerNum: Long,
                                tokenMode: String): Iterator[Seq[Array[Double]]] =
    texts.map(_.map(t => pooled(t, layerNum.toInt, tokenMode)))

  private def logit(emb: Array[Double], token: String): Double = {
    val vv = vocabMap.getOrElse(token, throw new NoSuchElementException(
      s"token '$token' not in the model head (${vocab.map(_._1).mkString(", ")})"))
    var acc = 0.0; var i = 0
    while (i < vv.length) { acc += vv(i) * emb(i); i += 1 }
    acc
  }

  override def logitScores(texts: Iterator[Seq[String]],
                           tokens: Seq[Any]): Iterator[Seq[Array[Double]]] =
    texts.map(_.map { t =>
      val emb = pooled(t, nLayers, "mean")
      tokens.map(tok => logit(emb, String.valueOf(tok))).toArray
    })

  override def generate(prompts: Iterator[Seq[String]],
                        maxTokens: Long): Iterator[Seq[String]] =
    prompts.map(_.map { p =>
      if (maxTokens <= 0L) ""
      else {
        require(vocab.nonEmpty,
          "generate: model has no vocab head — nothing to decode with")
        val sb = new StringBuilder(if (p == null) "" else p)
        var k = 0L
        while (k < maxTokens) {
          val emb = pooled(sb.toString, nLayers, "mean")
          var best: String = null
          var bestL = Double.NegativeInfinity
          for ((tok, _) <- vocabSorted) {
            val l = logit(emb, tok)
            if (l > bestL) { bestL = l; best = tok }
          }
          sb.append(' ').append(best)
          k += 1
        }
        sb.toString.substring(if (p == null) 1 else p.length + 1)
      }
    })
}

object TransformerProvider {

  /** Load from a JSON weight file:
    * {{{
    * {"dim": 8, "max_len": 8,
    *  "wq": [[..dim x dim..]], "wk": [[..]], "wv": [[..]],
    *  "w1": [[..]], "b1": [..], "w2": [[..]], "b2": [..],
    *  "vocab": {"yes": [..dim..], "no": [..]}}
    * }}} */
  def fromJson(path: String): TransformerProvider = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(new java.io.File(path))
    for (f <- Seq("dim", "max_len", "wq", "wk", "wv", "w1", "b1", "w2", "b2"))
      require(root.has(f), s"$path: missing field '$f'")
    def arr1(n: com.fasterxml.jackson.databind.JsonNode): Array[Double] = {
      val out = new Array[Double](n.size())
      var i = 0
      while (i < out.length) { out(i) = n.get(i).asDouble(); i += 1 }
      out
    }
    def arr2(n: com.fasterxml.jackson.databind.JsonNode): Array[Array[Double]] =
      (0 until n.size()).map(i => arr1(n.get(i))).toArray
    val vocab =
      if (!root.has("vocab")) Seq.empty[(String, Array[Double])]
      else {
        val v = root.get("vocab")
        val names = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Double])]
        val it = v.fieldNames()
        while (it.hasNext) { val k = it.next(); names += k -> arr1(v.get(k)) }
        names.toSeq.sortBy(_._1) // field order is not identity; pin it
      }
    new TransformerProvider(root.get("dim").asInt(),
      root.get("max_len").asInt(),
      arr2(root.get("wq")), arr2(root.get("wk")), arr2(root.get("wv")),
      arr2(root.get("w1")), arr1(root.get("b1")),
      arr2(root.get("w2")), arr1(root.get("b2")), vocab)
  }
}
