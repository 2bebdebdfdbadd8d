package graft.llm

import java.security.MessageDigest

/** Model-provider abstraction for LLM ops (reference
  * `runners/model_registry.py:13-75`: `@register_model_provider(schemes*)` +
  * `get_model_provider("hf:gpt2") -> (provider, "gpt2")`). Model names carry
  * a scheme prefix selecting the provider; the remainder is the
  * provider-specific model id.
  *
  * Shipped providers:
  *   - `fake:` — deterministic hash-derived outputs for CI and oracles
  *     (replaces the reference's GPU-bound `hf:`/`tl:` in this container;
  *     same role as a test double, reference uses real small models in a
  *     slow suite).
  *   - `http:` — any OpenAI-/Ollama-style embedding endpoint, called inside
  *     `mapPartitions` so inference distributes across executors (the
  *     reference's Ollama provider shape, batched HTTP).
  */
trait ModelProvider extends Serializable {

  /** Pooled residual activations for each text at `layerNum`. */
  def layerActivations(texts: Iterator[Seq[String]], layerNum: Long,
                       tokenMode: String): Iterator[Seq[Array[Double]]]

  /** Logits of the listed tokens at the last input position. */
  def logitScores(texts: Iterator[Seq[String]],
                  tokens: Seq[Any]): Iterator[Seq[Array[Double]]]

  /** Text generation (unimplemented in the reference; served by the
    * `fake:` provider and, beyond-parity, by `ollama:` via
    * `/api/generate`). */
  def generate(prompts: Iterator[Seq[String]],
               maxTokens: Long): Iterator[Seq[String]]
}

object ModelRegistry {

  private val factories =
    scala.collection.mutable.LinkedHashMap.empty[String, String => ModelProvider]

  def register(scheme: String)(factory: String => ModelProvider): Unit =
    factories(scheme) = factory

  def schemes: Seq[String] = factories.keys.toSeq

  /** "fake:d16" → (FakeProvider, "d16"); unknown scheme is a hard error
    * (reference `model_registry.py:55-64`). */
  def get(modelName: String): (ModelProvider, String) = {
    val i = modelName.indexOf(':')
    if (i < 0) throw new IllegalArgumentException(
      s"model name '$modelName' has no scheme (expected e.g. ${schemes.map(_ + ":...").mkString(", ")})")
    val scheme = modelName.substring(0, i)
    val rest = modelName.substring(i + 1)
    val f = factories.getOrElse(scheme, throw new IllegalArgumentException(
      s"no model provider for scheme '$scheme:'. Registered: ${schemes.mkString(", ")}"))
    (f(rest), rest)
  }

  /** Config lookup for alias endpoints: system property beats env var beats
    * default. Resolution happens on the DRIVER (providers are constructed in
    * `LLMOps` before the `mapPartitions` closure is serialized), so cluster
    * deployments only need the variable set on the driver. */
  private def cfg(prop: String, env: String, default: => String): String =
    sys.props.get(prop).orElse(sys.env.get(env)).getOrElse(default)

  /** Ollama server base URL (`GRAFT_OLLAMA_URL` / `-Dgraft.ollama.url`). */
  def ollamaUrl: String =
    cfg("graft.ollama.url", "GRAFT_OLLAMA_URL", "http://localhost:11434")

  /** Embedding endpoint for the `st:` alias (`GRAFT_EMBED_URL` /
    * `-Dgraft.embed.url`); defaults to the Ollama endpoint, which serves
    * sentence-transformer-family embedding models locally. */
  def embedUrl: String =
    cfg("graft.embed.url", "GRAFT_EMBED_URL",
      s"${ollamaUrl.stripSuffix("/")}/api/embed")

  /** HTTP transport timeouts. Without these a hung endpoint blocks an
    * executor task indefinitely; resolved on the driver at provider
    * construction and serialized into the `mapPartitions` closure. */
  def httpConnectTimeoutMs: Int =
    cfg("graft.http.connect.timeout.ms", "GRAFT_HTTP_CONNECT_TIMEOUT_MS", "10000").toInt
  def httpReadTimeoutMs: Int =
    cfg("graft.http.read.timeout.ms", "GRAFT_HTTP_READ_TIMEOUT_MS", "300000").toInt

  /** In-flight `/api/generate` requests per task batch. Generation has no
    * batch form in the Ollama API, so per-prompt round-trips are the unit;
    * pipelining them overlaps request latency (the server still schedules
    * actual decoding by its own OLLAMA_NUM_PARALLEL). 1 restores strictly
    * sequential posting. */
  def httpGenerateConcurrency: Int =
    cfg("graft.http.generate.concurrency", "GRAFT_HTTP_GENERATE_CONCURRENCY", "4").toInt

  register("fake")(rest => FakeProvider(FakeProvider.parseDim(rest)))
  register("http")(rest => new HttpProvider(rest))
  // Scheme ALIASES resolving to the http transport. The reference registry
  // maps SCHEMES to providers, not transports (`model_registry.py:44-64`;
  // `model_registry_implementations.py:22,460` registers `ollama` and
  // `sentencetransformer`/`st`), so `ollama:nomic-embed-text` names a MODEL
  // and the transport endpoint comes from configuration. Ollama's contract
  // checks (`model_registry_implementations.py:36-41`: last layer, 'last'
  // token mode only) are enforced at call time.
  register("ollama")(rest => new HttpProvider(
    s"${ollamaUrl.stripSuffix("/")}/api/embed", model = Some(rest),
    lastLayerOnly = true, scheme = "ollama",
    generateEndpoint = Some(s"${ollamaUrl.stripSuffix("/")}/api/generate")))
  // st: embedding endpoints also only serve last-layer pooled embeddings —
  // without the contract check, layerNum=3 would SILENTLY return last-layer
  // vectors labeled as layer-3 activations
  private val stFactory: String => ModelProvider =
    rest => new HttpProvider(embedUrl, model = Some(rest),
      lastLayerOnly = true, scheme = "st")
  register("st")(stFactory)
  register("sentencetransformer")(stFactory)
  // mlp:<weights.json> — IN-PROCESS inference (pure-JVM feature-hashing
  // MLP, see MlpProvider): the reference's in-process provider role
  // (`model_registry_implementations.py:81-407`) without torch or a
  // server; real intermediate layers, logit head, greedy generate.
  register("mlp")(rest => MlpProvider.fromJson(rest))
  // tf:<weights.json> — IN-PROCESS single-layer causal TRANSFORMER (pure
  // JVM, see TransformerProvider): real attention over positions,
  // LayerNorm, FFN, token modes "mean"/"last" — the reference's torch
  // in-process role for the architecture class a JVM can execute exactly.
  register("tf")(rest => TransformerProvider.fromJson(rest))
}

/** Deterministic fake provider: every output value is derived from
  * md5(text|layer|mode|index) — reproducible anywhere, including in a SQL
  * oracle (DuckDB can replicate the hex arithmetic), which turns the LLM op
  * plumbing into a fully hash-checkable pipeline.
  *
  * value = int(md5hex[0:8]) / 2^31 - 1  ∈ [-1, 1), exact in double on both
  * engines (power-of-two division; no rounding anywhere).
  */
final case class FakeProvider(dim: Int) extends ModelProvider {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  def value(key: String): Double =
    java.lang.Long.parseLong(md5hex(key).substring(0, 8), 16) / 2147483648.0 - 1.0

  def activationVector(text: String, layerNum: Long, tokenMode: String): Array[Double] =
    Array.tabulate(dim)(i => value(s"$text|$layerNum|$tokenMode|$i"))

  override def layerActivations(texts: Iterator[Seq[String]], layerNum: Long,
                                tokenMode: String): Iterator[Seq[Array[Double]]] =
    texts.map(_.map(t => activationVector(t, layerNum, tokenMode)))

  override def logitScores(texts: Iterator[Seq[String]],
                           tokens: Seq[Any]): Iterator[Seq[Array[Double]]] =
    texts.map(_.map(t =>
      tokens.map(tok => value(s"$t|logit|$tok")).toArray))

  override def generate(prompts: Iterator[Seq[String]],
                        maxTokens: Long): Iterator[Seq[String]] =
    prompts.map(_.map(p => "gen:" + md5hex(s"$p|$maxTokens").substring(0, 16)))
}

object FakeProvider {
  /** "d16" → 16; bare "" → default 16. */
  def parseDim(rest: String): Int =
    if (rest.startsWith("d") && rest.drop(1).forall(_.isDigit) && rest.length > 1)
      rest.drop(1).toInt
    else 16
}

/** HTTP provider: posts batches to an OpenAI-/Ollama-compatible endpoint.
  * Runs on executors inside `mapPartitions` — inference scales with
  * partitions, the engine never funnels text through the driver. The
  * request shape mirrors Ollama `/api/embed` (reference
  * `model_registry_implementations.py:56-67`); batching, value decoding,
  * and all three error paths are exercised against a loopback mock server
  * in LLMSpec (no network egress needed).
  *
  * @param model when set (the `ollama:`/`st:` alias path), sent as the
  *              `"model"` field of every request, matching Ollama's API.
  * @param lastLayerOnly Ollama contract: reject layerNum != -1 and
  *              tokenMode != "last" (reference
  *              `model_registry_implementations.py:36-41`).
  * @param generateEndpoint when set (the `ollama:` alias), `generate`
  *              posts Ollama `/api/generate` requests here (reference
  *              transport shape `model_registry_implementations.py:22-78`;
  *              the reference leaves the generate OP unimplemented, so this
  *              is beyond-parity surface).
  */
final class HttpProvider(endpoint: String, model: Option[String] = None,
                         lastLayerOnly: Boolean = false,
                         scheme: String = "http",
                         generateEndpoint: Option[String] = None) extends ModelProvider {

  // resolved on the driver at construction; serialized with the provider
  private val connectTimeoutMs = ModelRegistry.httpConnectTimeoutMs
  private val readTimeoutMs = ModelRegistry.httpReadTimeoutMs

  private def post(target: String, body: String): String = {
    val url = java.net.URI.create(
      if (target.startsWith("http")) target else s"http://$target").toURL
    val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", "application/json")
    conn.setDoOutput(true)
    conn.getOutputStream.write(body.getBytes("UTF-8"))
    val code = conn.getResponseCode
    if (code < 200 || code >= 300) {
      val detail = Option(conn.getErrorStream)
        .map(s => new String(s.readAllBytes(), "UTF-8").take(500))
        .filter(_.nonEmpty).map(d => s": $d").getOrElse("")
      throw new java.io.IOException(s"$scheme: HTTP $code from $target$detail")
    }
    new String(conn.getInputStream.readAllBytes(), "UTF-8")
  }

  private def post(body: String): String = post(endpoint, body)

  private def embedBatch(texts: Seq[String]): Seq[Array[Double]] = {
    import graft.spec._
    val fields = Vector("input" -> (JArr(texts.map(t => JString(t): JValue).toVector): JValue)) ++
      model.map(m => "model" -> (JString(m): JValue))
    val body = Json.render(JObj(fields: _*))
    Json.parse(post(body)) match {
      case o: JObj => o.get("embeddings") match {
        case Some(JArr(vecs)) => vecs.map {
          case JArr(xs) => xs.map {
            case JDouble(d) => d; case JLong(l) => l.toDouble
            case other => throw new IllegalStateException(s"bad embedding value $other")
          }.toArray
          case other => throw new IllegalStateException(s"bad embedding row $other")
        }
        case _ => throw new IllegalStateException("response has no 'embeddings'")
      }
      case other => throw new IllegalStateException(s"bad response $other")
    }
  }

  override def layerActivations(texts: Iterator[Seq[String]], layerNum: Long,
                                tokenMode: String): Iterator[Seq[Array[Double]]] = {
    if (lastLayerOnly) {
      require(layerNum == -1L,
        s"$scheme: does not support layer_num; it always returns the last layer")
      require(tokenMode == "last",
        s"$scheme: only supports 'last' token mode for embeddings")
    }
    texts.map(embedBatch)
  }

  override def logitScores(texts: Iterator[Seq[String]],
                           tokens: Seq[Any]): Iterator[Seq[Array[Double]]] =
    throw new UnsupportedOperationException(
      s"$scheme: logit scores are not exposed by embedding endpoints")

  // resolved on the driver, serialized with the provider (like the timeouts)
  private val generateConcurrency = ModelRegistry.httpGenerateConcurrency

  /** Ollama `/api/generate`: one non-streamed request per prompt —
    * generation has no batch form in the Ollama API, and batches are
    * already bounded by the op's `batchSize` so a hung prompt fails the
    * task (and its retry) rather than the job silently stalling.
    *
    * Within a batch, requests are PIPELINED in chunks of
    * [[ModelRegistry.httpGenerateConcurrency]]: per-prompt round-trip
    * latency (not server decode throughput) otherwise serializes the whole
    * partition. The bound is PER TASK — the executor pool is cached/
    * unbounded (daemon threads, idle-reaped), so N concurrent tasks drive
    * N × concurrency requests and one task's chunk never queues behind
    * another's. Results keep batch order; the first failure cancels the
    * chunk's remaining futures, is never followed by another chunk, and
    * propagates with its original exception — the same stop-at-the-failing-
    * prompt contract as the sequential path, which `concurrency=1` restores.
    */
  override def generate(prompts: Iterator[Seq[String]],
                        maxTokens: Long): Iterator[Seq[String]] = {
    import graft.spec._
    val genUrl = generateEndpoint.getOrElse(throw new UnsupportedOperationException(
      s"$scheme: no generation endpoint (generation is served by the ollama: scheme)"))
    def genOne(p: String): String = {
      val body = Json.render(JObj(
        "model" -> (JString(model.getOrElse("")): JValue),
        "prompt" -> (JString(p): JValue),
        "stream" -> (JBool(false): JValue),
        "options" -> (JObj("num_predict" -> (JLong(maxTokens): JValue)): JValue)))
      Json.parse(post(genUrl, body)) match {
        case o: JObj => o.get("response") match {
          case Some(JString(s)) => s
          case _ => throw new IllegalStateException(
            s"$scheme: generate response has no 'response' field")
        }
        case other => throw new IllegalStateException(s"bad response $other")
      }
    }
    prompts.map { batch =>
      if (generateConcurrency <= 1 || batch.size <= 1) batch.map(genOne)
      else {
        // SLIDING window, not a chunk barrier: a semaphore slot frees the
        // moment any request completes, so one straggler prompt never
        // idles the other concurrency−1 slots (grouped(concurrency) +
        // join-all degraded toward sequential when each chunk held one
        // slow prompt). Results keep batch order; once a failure is
        // observed no NEW request is posted (up to concurrency−1 already
        // in flight may still finish), outstanding futures are cancelled,
        // and the original exception propagates — concurrency=1 restores
        // the strictly sequential contract.
        val pool = HttpProvider.generatePool
        val sem = new java.util.concurrent.Semaphore(generateConcurrency)
        val failed = new java.util.concurrent.atomic.AtomicBoolean(false)
        val futures =
          scala.collection.mutable.ArrayBuffer.empty[java.util.concurrent.Future[String]]
        try {
          val it = batch.iterator
          var stop = false
          while (it.hasNext && !stop) {
            sem.acquire()
            if (failed.get()) { sem.release(); stop = true }
            else {
              val p = it.next()
              futures += pool.submit(new java.util.concurrent.Callable[String] {
                override def call(): String =
                  try genOne(p)
                  catch { case e: Throwable => failed.set(true); throw e }
                  finally sem.release()
              })
            }
          }
          futures.map { f =>
            try f.get()
            catch {
              case e: java.util.concurrent.ExecutionException =>
                throw Option(e.getCause).getOrElse(e)
            }
          }.toSeq
        } catch {
          case e: Throwable =>
            futures.foreach(_.cancel(true)) // no-op on completed futures
            throw e
        }
      }
    }
  }
}

object HttpProvider {
  // one JVM-wide CACHED daemon pool (executors reuse the JVM across tasks —
  // a per-task pool would leak threads; a fixed-size pool would cap the
  // whole JVM at one task's concurrency and FIFO-interleave tasks'
  // batches). Cached = grows to (concurrent tasks × chunk size), idle
  // threads reaped after 60 s, daemon so it never blocks JVM exit.
  private[llm] lazy val generatePool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newCachedThreadPool(
      new java.util.concurrent.ThreadFactory {
        private val c = new java.util.concurrent.atomic.AtomicInteger(0)
        override def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-generate-${c.incrementAndGet()}")
          t.setDaemon(true)
          t
        }
      })
}
