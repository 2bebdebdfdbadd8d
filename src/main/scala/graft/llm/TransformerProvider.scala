package graft.llm

/** One transformer block's weights: H-head causal attention (full
  * `dim × dim` q/k/v projections whose output components are split into
  * `heads` contiguous slices) followed by residual + LayerNorm and a
  * position-wise FFN with its own residual. `heads` must divide the
  * model dim; `heads = 1` is exactly the round-18 single-head block.
  *
  * Optional pieces of the REAL checkpoint architecture (absent = the
  * round-18 block, bit-for-bit):
  *  - `wo` — the attention OUTPUT projection: the per-head mix is
  *    multiplied by a `dim × dim` matrix before the residual add
  *    (absent ⇒ identity, the concat-of-heads shortcut);
  *  - `lnG`/`lnB` — learned LayerNorm scale γ and bias β applied as
  *    `(z−μ)/σ · γ_d + β_d` (absent ⇒ γ=1, β=0).
  *
  * Round 20 — the PRE-LN block variant (`preLn = true`), the GPT-2 /
  * TransformerLens architecture shape (reference:
  * `model_registry_implementations.py:81-407` serves exactly such
  * checkpoints):
  *  - LayerNorm moves BEFORE each sublayer: h1 = LN1(x) feeds the q/k/v
  *    projections (γ/β = `lnG`/`lnB`), the attention output adds onto
  *    the RAW residual stream `z = x + wo·att(h1)`, then h2 = LN2(z)
  *    (γ/β = `ln2G`/`ln2B`) feeds the FFN whose output adds onto z:
  *    `y = z + FFN(h2)` — the residual stream is never normalized.
  *  - `act` picks the FFN nonlinearity: `"relu"` (default, the post-LN
  *    fixture function) or `"gelu"` — the tanh-approximation GELU
  *    rendered in the pinned-rounding discipline (see
  *    [[TransformerProvider.tanhA]]).
  *  - the FFN may be RECTANGULAR (the real 4×dim hidden): `w1` is
  *    `hid × dim`, `b1` length `hid`, `w2` is `dim × hid`, with
  *    `hid = b1.length` free.
  * `ln2G`/`ln2B` are meaningful only when `preLn` (the post-LN block has
  * a single norm). */
final case class TfBlock(heads: Int,
                         wq: Array[Array[Double]],
                         wk: Array[Array[Double]],
                         wv: Array[Array[Double]],
                         w1: Array[Array[Double]],
                         b1: Array[Double],
                         w2: Array[Array[Double]],
                         b2: Array[Double],
                         wo: Option[Array[Array[Double]]] = None,
                         lnG: Option[Array[Double]] = None,
                         lnB: Option[Array[Double]] = None,
                         preLn: Boolean = false,
                         ln2G: Option[Array[Double]] = None,
                         ln2B: Option[Array[Double]] = None,
                         act: String = "relu",
                         softmax: String = "int")

/** IN-PROCESS TRANSFORMER inference — the narrowing of the one remaining
  * provider gap (the reference's in-process `hf:`/`tl:` torch
  * transformers, `/root/reference/src/krnel/graph/runners/local_runner/
  * model_registry_implementations.py:81-407`): an L-layer, H-head
  * causal-attention text encoder executed entirely in the executor JVM —
  * REAL multi-head attention over token positions, residual connections,
  * LayerNorm, and position-wise FFNs, not a bag-of-words pool. Round 19
  * generalizes the round-18 single-layer single-head block to a STACK of
  * [[TfBlock]]s (the architecture shape of the reference's pretrained
  * checkpoints); the ONNX Runtime Java path for arbitrary checkpoints
  * stays blocked by the zero-egress container, but any checkpoint whose
  * tensors fit this block shape converts offline via
  * `tools/make_tf_weights.py` into the JSON weight format.
  *
  * == The exactness discipline (what makes this oracle-able) ==
  * Every step is either EXACT in IEEE double or CORRECTLY ROUNDED with a
  * FIXED operand order, so an external SQL replay (DuckDB) reproduces
  * every activation bit for bit:
  *
  *  - Token embeddings come from the model's LEARNED table (`embed` —
  *    the real checkpoint's W_E) when it knows the token, else from
  *    4-bit nibbles of the replayable 60-bit md5 hash scaled by 1/16 —
  *    a tokenizer-free OOV embedding that keeps every text encodable;
  *    positional encodings (learned `posEmbed` = W_pos, or the built-in
  *    dyadic formula) and all weight matrices are dyadic (n/16) too, so
  *    the q/k/v projections and q·k scores are EXACT (every product and
  *    sum stays inside the 52-bit mantissa).
  *  - Attention comes in TWO gated softmax modes. The default
  *    INTEGER-SOFTMAX per head: score = floor(16 · q_h·k_h) over the
  *    head's component slice (exact → floor is deterministic, no
  *    round-half ambiguity), row-max subtraction in integers, and
  *    weights 2^(s−max) built by `Math.scalb` — exact powers of two (no
  *    `exp`, no `pow`; the SQL twin indexes a literal table of the same
  *    61 values). `softmax = "float"` (round 20) is the REAL checkpoint
  *    function: s = (q_h·k_h)/√d_h in double and weights e^(s−max) via
  *    the pinned exp chain ([[TransformerProvider.expA]] — argument
  *    reduction, [6/6] Padé, exact 2ⁿ rescale; ~2e-15 vs true exp,
  *    every op correctly rounded in a fixed order, so the SQL twin
  *    still replays every bit). In both modes the weighted value sums
  *    and the single normalizing division per output component are
  *    correctly rounded with a fixed j-ascending fold — deterministic
  *    on both engines. An output component at index d belongs to head
  *    d/(dim/H) — the standard concat-of-heads layout.
  *  - LayerNorm divides by dim (a power of two — exact) and uses IEEE
  *    `sqrt` (correctly rounded everywhere); the FFN's ReLU is written as
  *    `if (v < 0) 0 else v` and replayed as the identical CASE (not
  *    `greatest`, which would normalize −0.0).
  *  - Absent positions (text shorter than `maxLen`) contribute EXACT
  *    zeros to every masked sum — and stay exactly zero through every
  *    block, because masked positions are carried as zero vectors rather
  *    than pushed through the (bias-carrying) FFN.
  *  - Later blocks' activations are no longer dyadic, but every
  *    operation on them is still correctly rounded with pinned operand
  *    order, so the bit-replay property survives arbitrary depth.
  *
  * Provider surface (the [[ModelProvider]] contract): with B blocks,
  * `layerActivations(2b+1, mode)` = block b's MID state — the
  * post-attention LayerNorm output for a post-LN block, the raw
  * post-attention residual (TransformerLens `resid_mid`) for a pre-LN
  * block — and `layerActivations(2b+2, mode)` = block b's post-FFN
  * residual state (`resid_post`), b 0-based — `nLayers = 2B` REAL
  * intermediate layers.
  * `tokenMode` is honored: "mean" pools over positions, "last" returns
  * the final real position's vector (the two modes the reference's torch
  * providers serve). `logitScores(tokens)` = pooled final state ·
  * vocab[token]; `generate` is greedy argmax over the vocab head,
  * re-encoding the grown prompt each step (ties → lexicographically
  * smaller token).
  *
  * Scale shape: identical to [[MlpProvider]] — weights ride the task
  * closure (KB–MB heads; a broadcast is the one-line variant for bigger
  * ones), inference is map-side, throughput scales with partitions.
  */
final class TransformerProvider(val dim: Int, val maxLen: Int,
                                val blocks: Seq[TfBlock],
                                val vocab: Seq[(String, Array[Double])],
                                val embed: Seq[(String, Array[Double])] =
                                  Seq.empty,
                                val posEmbed: Option[Array[Array[Double]]] =
                                  None,
                                val tokenizer: Option[Seq[(String, String)]] =
                                  None,
                                // round 20: the checkpoint's FINAL LayerNorm
                                // (GPT-2 ln_f) — applied per position to the
                                // last block's residual before the vocab
                                // head (logitScores/generate only; the
                                // layerActivations surface stays the raw
                                // resid_post, the TransformerLens hook)
                                val lnFG: Option[Array[Double]] = None,
                                val lnFB: Option[Array[Double]] = None)
    extends ModelProvider {

  /** Round-18 single-block, single-head signature (kept for callers and
    * as the shape the flat JSON format loads into). */
  def this(dim: Int, maxLen: Int,
           wq: Array[Array[Double]], wk: Array[Array[Double]],
           wv: Array[Array[Double]],
           w1: Array[Array[Double]], b1: Array[Double],
           w2: Array[Array[Double]], b2: Array[Double],
           vocab: Seq[(String, Array[Double])]) =
    this(dim, maxLen, Seq(TfBlock(1, wq, wk, wv, w1, b1, w2, b2)), vocab)

  require(dim >= 1, s"dim must be >= 1, got $dim")
  require(maxLen >= 1, s"max_len must be >= 1, got $maxLen")
  require(blocks.nonEmpty, "at least one transformer block is required")
  blocks.zipWithIndex.foreach { case (blk, bi) =>
    require(blk.heads >= 1 && dim % blk.heads == 0,
      s"block $bi: heads (${blk.heads}) must divide dim ($dim)")
    def reqMat(m: Array[Array[Double]], name: String,
               rows: Int = dim, cols: Int = dim): Unit =
      require(m.length == rows && m.forall(_.length == cols),
        s"block $bi: $name must be $rows x $cols")
    reqMat(blk.wq, "wq"); reqMat(blk.wk, "wk"); reqMat(blk.wv, "wv")
    // the FFN may be rectangular: hid = b1.length (real checkpoints run
    // hid = 4*dim); the square post-LN fixtures pass through unchanged
    val hid = blk.b1.length
    require(hid >= 1, s"block $bi: b1 must be non-empty")
    reqMat(blk.w1, "w1", rows = hid)
    reqMat(blk.w2, "w2", cols = hid)
    blk.wo.foreach(reqMat(_, "wo"))
    require(blk.b2.length == dim, s"block $bi: b2 must have length dim")
    for ((v, n) <- Seq(blk.lnG -> "ln_g", blk.lnB -> "ln_b",
        blk.ln2G -> "ln2_g", blk.ln2B -> "ln2_b"); a <- v)
      require(a.length == dim, s"block $bi: $n must have length dim")
    require(blk.act == "relu" || blk.act == "gelu",
      s"block $bi: act must be 'relu' or 'gelu', got '${blk.act}'")
    require(blk.softmax == "int" || blk.softmax == "float",
      s"block $bi: softmax must be 'int' or 'float', got '${blk.softmax}'")
    require(blk.preLn || (blk.ln2G.isEmpty && blk.ln2B.isEmpty),
      s"block $bi: ln2_g/ln2_b require pre_ln (the post-LN block has one norm)")
  }
  require(vocab.forall(_._2.length == dim),
    s"vocab vectors must have the final dim $dim")
  for ((v, n) <- Seq(lnFG -> "ln_f_g", lnFB -> "ln_f_b"); a <- v)
    require(a.length == dim, s"$n must have length dim ($dim)")
  require(embed.forall(_._2.length == dim),
    s"embed vectors must have length dim ($dim)")
  posEmbed.foreach(p => require(p.length == maxLen &&
    p.forall(_.length == dim),
    s"pos embeddings must be $maxLen x $dim"))

  // single-block accessors (tests and the flat JSON round-trip)
  def wq: Array[Array[Double]] = blocks.head.wq
  def wk: Array[Array[Double]] = blocks.head.wk
  def wv: Array[Array[Double]] = blocks.head.wv
  def w1: Array[Array[Double]] = blocks.head.w1
  def b1: Array[Double] = blocks.head.b1
  def w2: Array[Array[Double]] = blocks.head.w2
  def b2: Array[Double] = blocks.head.b2

  private val vocabMap: Map[String, Array[Double]] = vocab.toMap
  private val vocabSorted: Seq[(String, Array[Double])] = vocab.sortBy(_._1)
  private val embedMap: Map[String, Array[Double]] = embed.toMap

  // round 20: the CHECKPOINT-TOKENIZER input path — with a stored BPE
  // merge list the provider feeds real SUBWORD tokens into W_E (the
  // reference tokenizes with the checkpoint's own tokenizer) instead of
  // whitespace words. Rank-greedy encode (graft.ext.Bpe's production
  // path, == the sequential definitional replay on any TRAINED list —
  // BpeSpec pins the equivalence, and the SQL oracle replays the
  // sequential form). First maxLen words, then first maxLen tokens.
  private val tokMergesArr: Array[(String, String)] =
    tokenizer.getOrElse(Seq.empty).toArray
  private val tokRanks: Map[(String, String), Int] = {
    val m = scala.collection.mutable.HashMap.empty[(String, String), Int]
    tokMergesArr.iterator.zipWithIndex.foreach { case (p, i) =>
      if (!m.contains(p)) m(p) = i
    }
    m.toMap
  }

  /** The provider's token stream for `text`. Without a tokenizer: the
    * round-18 whitespace split (`[ \t\n\f\r]+`). With one: the same
    * explicit class (ADVICE r20: Java `\s+` also matches U+000B vertical
    * tab, which the DuckDB oracle's RE2 `\s+` does NOT — the explicit
    * class pins both sides to one charset, the non-tokenizer path's
    * standing discipline), each word BPE-encoded, the flattened stream
    * truncated at maxLen subwords. */
  private def tokenize(text: String): Array[String] = {
    val t = if (text == null) "" else text
    if (tokenizer.isEmpty)
      t.split("[ \t\n\f\r]+").filter(_.nonEmpty).take(maxLen)
    else
      t.trim.split("[ \t\n\f\r]+").iterator.filter(_.nonEmpty).take(maxLen)
        .flatMap(w =>
          graft.ext.Bpe.tokenizeWordRanked(w, tokMergesArr, tokRanks))
        .take(maxLen).toArray
  }

  def nLayers: Int = 2 * blocks.length

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
    val out = new Array[Double](w.length)
    var r = 0
    while (r < w.length) {
      var acc = 0.0; val row = w(r); var c = 0
      while (c < row.length) { acc += row(c) * x(c); c += 1 }
      out(r) = acc; r += 1
    }
    out
  }

  /** LayerNorm with optional learned γ/β — /dim is a power-of-two
    * division only in the fixture regime, but the single rounding per
    * step is pinned either way; eps = 2^-16; `((z−μ)/σ)·γ + β`
    * left-associated, exactly the SQL twin's rendering. */
  private def layerNorm(z: Array[Double], g: Option[Array[Double]],
                        be: Option[Array[Double]]): Array[Double] = {
    var mu = 0.0; var d = 0
    while (d < dim) { mu += z(d); d += 1 }
    mu = mu / dim
    var va = 0.0; d = 0
    while (d < dim) { val t = z(d) - mu; va += t * t; d += 1 }
    va = va / dim
    val sd = math.sqrt(va + 0.0000152587890625)
    val affine = g.isDefined || be.isDefined
    Array.tabulate(dim) { d =>
      val base = (z(d) - mu) / sd
      if (!affine) base
      else base * g.map(_(d)).getOrElse(1.0) + be.map(_(d)).getOrElse(0.0)
    }
  }

  /** Full forward pass: per block, the (post-attention-LayerNorm states,
    * post-FFN states); plus n real tokens. Positions ≥ n carry zeros and
    * are masked out of attention and pooling exactly like the SQL twin.
    * `nBlocks` truncates the stack — a caller addressing an early layer
    * never pays for the suffix blocks' attention+FFN. */
  private[llm] def statesAll(text: String,
                             nBlocks: Int = Int.MaxValue)
      : (Seq[(Array[Array[Double]], Array[Array[Double]])], Int) = {
    val toks = tokenize(text)
    val n = toks.length
    // x_i = token embedding + positional encoding. Token embedding: the
    // LEARNED table entry when the model ships one and knows the token
    // (the real-checkpoint input layer), else the md5-nibble fallback —
    // a tokenizer-free OOV embedding that keeps every text encodable.
    // Positional: the learned W_pos row when present, else the dyadic
    // formula. All addends stay exact dyadics in the fixture regime, and
    // the k-indexed elementwise add is the same single rounding either
    // way.
    var x = Array.tabulate(maxLen) { i =>
      if (i >= n) new Array[Double](dim)
      else {
        val learned = embedMap.get(toks(i))
        val h = if (learned.isEmpty) hash60(toks(i)) else 0L
        Array.tabulate(dim) { k =>
          val e = learned match {
            case Some(v) => v(k)
            case None => (((h >>> (4 * (k % 15))) & 0xFL) - 8L) / 16.0
          }
          val p = posEmbed match {
            case Some(m) => m(i)(k)
            case None => pos(i, k)
          }
          e + p
        }
      }
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Array[Array[Double]], Array[Array[Double]])]
    for (blk <- blocks.take(nBlocks)) {
      val hid = blk.b1.length
      // pre-LN: the projections read LN1(x); the residual stream itself
      // is never normalized. Masked positions keep their exact zero
      // vectors in EITHER mode (LN1 of a zero vector would emit β) —
      // sound because the causal mask j <= i < n means no real position
      // ever attends to a masked one.
      val attIn =
        if (!blk.preLn) x
        else Array.tabulate(maxLen)(i =>
          if (i >= n) new Array[Double](dim)
          else layerNorm(x(i), blk.lnG, blk.lnB))
      val q = attIn.map(matVec(blk.wq, _))
      val kM = attIn.map(matVec(blk.wk, _))
      val v = attIn.map(matVec(blk.wv, _))
      val H = blk.heads
      val dh = dim / H
      // integer-softmax causal attention PER HEAD: s^h_ij =
      // floor(16 q^h_i·k^h_j) over the head's slice (exact at block 0;
      // floor of a correctly-rounded double after — deterministic both
      // ways), weights 2^(s − rowmax) via scalb (exact powers of two),
      // masked positions contribute exact zeros; ONE division per output
      // component, whose head is d / dh (concat-of-heads layout)
      val ln = new Array[Array[Double]](maxLen)
      val y = new Array[Array[Double]](maxLen)
      var i = 0
      while (i < maxLen) {
        if (i >= n) {
          ln(i) = new Array[Double](dim); y(i) = new Array[Double](dim)
        } else {
          val e = Array.ofDim[Double](H, maxLen)
          val sw = new Array[Double](H)
          var h = 0
          while (h < H) {
            if (blk.softmax == "float") {
              // REAL float softmax (round 20): s_j = (q·k)/√d_h in
              // double, weights e^(s_j − max) via the pinned exp chain
              // — the function a real checkpoint computes, up to expA's
              // ~2e-15 (closing the "up to the integer-softmax" delta)
              val s = new Array[Double](maxLen)
              var mx = Double.NegativeInfinity
              var j = 0
              while (j <= i) {
                var dp = 0.0; var d = h * dh
                while (d < (h + 1) * dh) { dp += q(i)(d) * kM(j)(d); d += 1 }
                s(j) = dp / math.sqrt(dh.toDouble)
                if (s(j) > mx) mx = s(j)
                j += 1
              }
              j = 0
              while (j <= i) {
                e(h)(j) = TransformerProvider.expA(s(j) - mx)
                j += 1
              }
            } else {
              val s = new Array[Long](maxLen)
              var mx = Long.MinValue
              var j = 0
              while (j <= i) {
                var dp = 0.0; var d = h * dh
                while (d < (h + 1) * dh) { dp += q(i)(d) * kM(j)(d); d += 1 }
                s(j) = math.floor(16.0 * dp).toLong
                if (s(j) > mx) mx = s(j)
                j += 1
              }
              j = 0
              while (j <= i) {
                val ex = math.max(s(j) - mx, -60L)
                e(h)(j) = Math.scalb(1.0, ex.toInt)
                j += 1
              }
            }
            var sS = 0.0
            var j = 0
            while (j < maxLen) { sS += e(h)(j); j += 1 }
            sw(h) = sS
            h += 1
          }
          // attention mix, optionally through the output projection wo
          // (absent ⇒ identity — z(d) = x + num/sw, the round-18 form,
          // bit-identical since a(d) IS that quotient)
          val att = new Array[Double](dim)
          var d = 0
          while (d < dim) {
            val hd = d / dh
            var num = 0.0
            var j = 0
            while (j < maxLen) { num += e(hd)(j) * v(j)(d); j += 1 }
            att(d) = num / sw(hd)
            d += 1
          }
          val ao = blk.wo match {
            case Some(m) => matVec(m, att)
            case None => att
          }
          val z = new Array[Double](dim)
          d = 0
          while (d < dim) { z(d) = x(i)(d) + ao(d); d += 1 }
          // post-LN: normalize the residual and feed the FFN from it
          // (mid state = the LN output). pre-LN: the mid state is the
          // RAW residual z; LN2(z) feeds the FFN and the FFN adds back
          // onto z. LayerNorm discipline in [[layerNorm]].
          val ffnIn =
            if (blk.preLn) layerNorm(z, blk.ln2G, blk.ln2B)
            else layerNorm(z, blk.lnG, blk.lnB)
          val base = if (blk.preLn) z else ffnIn
          ln(i) = base
          // position-wise FFN + residual; ReLU spelled to preserve -0.0,
          // GELU = the pinned tanh-approximation (TransformerProvider.gelu)
          val geluAct = blk.act == "gelu"
          val f = new Array[Double](hid)
          var c = 0
          while (c < hid) {
            var acc = blk.b1(c); var kk = 0
            while (kk < dim) { acc += blk.w1(c)(kk) * ffnIn(kk); kk += 1 }
            f(c) = if (geluAct) TransformerProvider.gelu(acc)
                   else (if (acc < 0.0) 0.0 else acc)
            c += 1
          }
          val yi = new Array[Double](dim)
          d = 0
          while (d < dim) {
            var acc = blk.b2(d); var cc = 0
            while (cc < hid) { acc += blk.w2(d)(cc) * f(cc); cc += 1 }
            yi(d) = base(d) + acc
            d += 1
          }
          y(i) = yi
        }
        i += 1
      }
      out += ((ln, y))
      x = y // the next block reads this block's residual stream
    }
    (out.toSeq, n)
  }

  /** The LAST block's (post-attention LayerNorm, post-FFN) states — the
    * round-18 single-block signature, still what the bit-equality specs
    * pin. */
  private[llm] def states(text: String)
      : (Array[Array[Double]], Array[Array[Double]], Int) = {
    val (st, n) = statesAll(text)
    (st.last._1, st.last._2, n)
  }

  /** Pooled state at `layerNum` (2b+1 = block b's post-attention
    * LayerNorm, 2b+2 = its post-FFN residual, b 0-based) under
    * `tokenMode` ("mean" | "last"). Empty text → the zero vector
    * (nothing to pool). */
  def pooled(text: String, layerNum: Int, tokenMode: String): Array[Double] = {
    require(layerNum >= 1 && layerNum <= nLayers,
      s"layerNum must be in [1, $nLayers], got $layerNum")
    require(tokenMode == "mean" || tokenMode == "last",
      s"tokenMode must be 'mean' or 'last', got '$tokenMode'")
    val blockIdx = (layerNum - 1) / 2
    val (all, n) = statesAll(text, blockIdx + 1)
    val (lnB, yB) = all(blockIdx)
    val st = if (layerNum % 2 == 1) lnB else yB
    poolStates(st, n, tokenMode)
  }

  /** EVERY layer's pooled state from ONE forward pass — the batch form a
    * caller reading multiple layers should use (per-layer [[pooled]]
    * calls each re-run the stack). Returns `nLayers` vectors, layer
    * order (block 0 ln, block 0 y, block 1 ln, ...). */
  def pooledAll(text: String, tokenMode: String): Seq[Array[Double]] = {
    require(tokenMode == "mean" || tokenMode == "last",
      s"tokenMode must be 'mean' or 'last', got '$tokenMode'")
    val (all, n) = statesAll(text)
    all.flatMap { case (lnB, yB) =>
      Seq(poolStates(lnB, n, tokenMode), poolStates(yB, n, tokenMode))
    }
  }

  private def poolStates(st: Array[Array[Double]], n: Int,
                         tokenMode: String): Array[Double] = {
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

  /** The vocab-head input: the pooled final state, through ln_f per
    * position first when the checkpoint ships one (the GPT-2 head path:
    * unembed(ln_f(h)) — pooling and ln_f commute only without γ/β, so
    * the norm applies before the pool). */
  private def headInput(text: String, tokenMode: String): Array[Double] = {
    // ADVICE r20: thread tokenMode through BOTH branches (the no-ln_f arm
    // hard-coded "mean"; both current callers pass "mean", so behavior is
    // unchanged — but a future "last" caller must not silently mean-pool)
    if (lnFG.isEmpty && lnFB.isEmpty) pooled(text, nLayers, tokenMode)
    else {
      val (all, n) = statesAll(text)
      val y = all.last._2
      val lnf = Array.tabulate(maxLen)(i =>
        if (i >= n) new Array[Double](dim) // masked stay exact zeros
        else layerNorm(y(i), lnFG, lnFB))
      poolStates(lnf, n, tokenMode)
    }
  }

  override def logitScores(texts: Iterator[Seq[String]],
                           tokens: Seq[Any]): Iterator[Seq[Array[Double]]] =
    texts.map(_.map { t =>
      val emb = headInput(t, "mean")
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
          val emb = headInput(sb.toString, "mean")
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

  /** tanh rendered as a FIXED, SQL-replayable operation chain — the
    * pinned-rounding discipline's answer to "no `exp`, no library
    * `tanh`" (Java's `Math.tanh` and DuckDB's libm `tanh` are each
    * <1 ulp but NOT guaranteed to round identically, so a library call
    * could silently diverge the oracle by one bit). Instead: clamp
    * (|x| > 19 ⇒ ±1, where true tanh rounds to ±1.0 in double anyway),
    * then 6 exact halvings (÷64, a power of two), the [7/6] Padé
    * approximant of tanh at the reduced argument (|t| ≤ 19/64, where
    * its relative error is ~1e-15), and 6 doubling steps
    * t ← 2t/(1+t²). Every multiply/add/divide is correctly rounded
    * IEEE with a pinned operand order, so DuckDB replaying the same
    * textual chain reproduces every bit; accuracy vs true tanh is
    * ~1e-15 relative (pinned in TransformerProviderSpec). */
  private[graft] def tanhA(x: Double): Double = {
    if (x > 19.0) 1.0
    else if (x < -19.0) -1.0
    else {
      var t = x / 64.0
      val t2 = t * t
      t = (t * (135135.0 + t2 * (17325.0 + t2 * (378.0 + t2)))) /
        (135135.0 + t2 * (62370.0 + t2 * (3150.0 + t2 * 28.0)))
      var k = 0
      while (k < 6) { t = 2.0 * t / (1.0 + t * t); k += 1 }
      t
    }
  }

  /** exp(x) for x ≤ 0 as a FIXED, SQL-replayable chain — the float-
    * softmax sibling of [[tanhA]] (library `exp` is <1 ulp on each
    * engine but not identically rounded across them): clamp (x < −60 ⇒
    * 0.0 — a weight ≤ e⁻⁶⁰ ≈ 9e-27 of the row max), then the standard
    * argument reduction n = ⌊x·log₂e⌋, r = x − n·ln2 ∈ [0, ln2), the
    * [6/6] Padé approximant of eʳ (relative error ~2e-15 at r = ln2),
    * and an EXACT 2ⁿ rescale (n ∈ [−87, 0]: Math.scalb here, a
    * multiply by a literal exact-decimal power-of-two table in SQL —
    * both exact, no subnormals at these magnitudes). Every op is
    * correctly rounded IEEE in a pinned order; accuracy vs true exp is
    * ~2e-15 relative (spec-swept). */
  private[graft] def expA(x: Double): Double = {
    if (x < -60.0) 0.0
    else {
      val n = math.floor(x * 1.4426950408889634)
      val r = x - n * 0.6931471805599453
      val num = 665280.0 + r * (332640.0 + r * (75600.0 + r * (10080.0 +
        r * (840.0 + r * (42.0 + r)))))
      val den = 665280.0 - r * (332640.0 - r * (75600.0 - r * (10080.0 -
        r * (840.0 - r * (42.0 - r)))))
      Math.scalb(num / den, n.toInt)
    }
  }

  /** The tanh-approximation GELU (Hendrycks & Gimpel 2016, the GPT-2
    * `gelu_new`): 0.5·v·(1 + tanh(√(2/π)·(v + 0.044715·v³))), with tanh
    * = [[tanhA]] and both constants as shared decimal literals (decimal
    * → double parsing is correctly rounded on both engines, so the same
    * literal IS the same double). */
  private[graft] def gelu(v: Double): Double = {
    val s = 0.7978845608028654 * (v + 0.044715 * (v * v * v))
    0.5 * v * (1.0 + tanhA(s))
  }

  /** Load from a JSON weight file. Flat single-block form (round 18,
    * optional `"heads"`):
    * {{{
    * {"dim": 8, "max_len": 8, "heads": 1,
    *  "wq": [[..dim x dim..]], "wk": [[..]], "wv": [[..]],
    *  "w1": [[..]], "b1": [..], "w2": [[..]], "b2": [..],
    *  "vocab": {"yes": [..dim..], "no": [..]}}
    * }}}
    * or the stacked form `tools/make_tf_weights.py` emits:
    * {{{
    * {"dim": 8, "max_len": 8,
    *  "blocks": [{"heads": 2, "wq": [[..]], ..., "b2": [..],
    *              "wo": [[..]], "ln_g": [..], "ln_b": [..],
    *              "pre_ln": true, "ln2_g": [..], "ln2_b": [..],
    *              "act": "gelu"}, ...],   // pre-LN + rectangular FFN:
    *                                      // w1 is hid x dim, b1 len hid,
    *                                      // w2 is dim x hid
    *  "embed": {"the": [..dim..], ...},   // learned W_E (md5 fallback)
    *  "pos": [[..max_len x dim..]],       // learned W_pos (formula else)
    *  "vocab": {...}}
    * }}} */
  def fromJson(path: String): TransformerProvider = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.readTree(new java.io.File(path))
    def arr1(n: com.fasterxml.jackson.databind.JsonNode): Array[Double] = {
      val out = new Array[Double](n.size())
      var i = 0
      while (i < out.length) { out(i) = n.get(i).asDouble(); i += 1 }
      out
    }
    def arr2(n: com.fasterxml.jackson.databind.JsonNode): Array[Array[Double]] =
      (0 until n.size()).map(i => arr1(n.get(i))).toArray
    def block(n: com.fasterxml.jackson.databind.JsonNode,
              where: String): TfBlock = {
      for (f <- Seq("wq", "wk", "wv", "w1", "b1", "w2", "b2"))
        require(n.has(f), s"$path: missing field '$f' in $where")
      TfBlock(if (n.has("heads")) n.get("heads").asInt() else 1,
        arr2(n.get("wq")), arr2(n.get("wk")), arr2(n.get("wv")),
        arr2(n.get("w1")), arr1(n.get("b1")),
        arr2(n.get("w2")), arr1(n.get("b2")),
        wo = if (n.has("wo")) Some(arr2(n.get("wo"))) else None,
        lnG = if (n.has("ln_g")) Some(arr1(n.get("ln_g"))) else None,
        lnB = if (n.has("ln_b")) Some(arr1(n.get("ln_b"))) else None,
        preLn = n.has("pre_ln") && n.get("pre_ln").asBoolean(),
        ln2G = if (n.has("ln2_g")) Some(arr1(n.get("ln2_g"))) else None,
        ln2B = if (n.has("ln2_b")) Some(arr1(n.get("ln2_b"))) else None,
        act = if (n.has("act")) n.get("act").asText() else "relu",
        softmax = if (n.has("softmax")) n.get("softmax").asText() else "int")
    }
    for (f <- Seq("dim", "max_len"))
      require(root.has(f), s"$path: missing field '$f'")
    val blocks =
      if (root.has("blocks")) {
        val bs = root.get("blocks")
        require(bs.isArray && bs.size() >= 1,
          s"$path: 'blocks' must be a non-empty array")
        (0 until bs.size()).map(i => block(bs.get(i), s"blocks[$i]"))
      } else Seq(block(root, "the flat layout"))
    def strMap(field: String): Seq[(String, Array[Double])] =
      if (!root.has(field)) Seq.empty[(String, Array[Double])]
      else {
        val v = root.get(field)
        val names = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Double])]
        val it = v.fieldNames()
        while (it.hasNext) { val k = it.next(); names += k -> arr1(v.get(k)) }
        names.toSeq.sortBy(_._1) // field order is not identity; pin it
      }
    // the stored-tokenizer input path: "tokenizer_path" points at a
    // graft.ext.Bpe.saveTokenizer artifact (content-addressed merge
    // list); "tokenizer": {"merges": [["a","b"], ...]} inlines one
    val tok: Option[Seq[(String, String)]] =
      if (root.has("tokenizer_path"))
        Some(graft.ext.Bpe.loadTokenizer(root.get("tokenizer_path").asText()))
      else if (root.has("tokenizer")) {
        val m = root.get("tokenizer").get("merges")
        require(m != null && m.isArray,
          s"$path: tokenizer needs a 'merges' array")
        Some((0 until m.size()).map(i =>
          (m.get(i).get(0).asText(), m.get(i).get(1).asText())))
      } else None
    new TransformerProvider(root.get("dim").asInt(),
      root.get("max_len").asInt(), blocks, strMap("vocab"),
      embed = strMap("embed"),
      posEmbed = if (root.has("pos")) Some(arr2(root.get("pos"))) else None,
      tokenizer = tok,
      lnFG = if (root.has("ln_f_g")) Some(arr1(root.get("ln_f_g"))) else None,
      lnFB = if (root.has("ln_f_b")) Some(arr1(root.get("ln_f_b"))) else None)
  }
}
