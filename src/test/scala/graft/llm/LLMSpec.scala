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

  test("ollama:/st: scheme aliases resolve to the http transport") {
    // reference registers schemes `ollama` and `sentencetransformer`/`st`
    // (model_registry_implementations.py:22,460); here they alias the
    // batched HTTP transport with the model name carried in the request
    val (po, ro) = ModelRegistry.get("ollama:nomic-embed-text")
    assert(po.isInstanceOf[HttpProvider] && ro == "nomic-embed-text")
    val (ps, rs) = ModelRegistry.get("st:all-MiniLM-L6-v2")
    assert(ps.isInstanceOf[HttpProvider] && rs == "all-MiniLM-L6-v2")
    val (pl, _) = ModelRegistry.get("sentencetransformer:all-MiniLM-L6-v2")
    assert(pl.isInstanceOf[HttpProvider])
    // Ollama contract: last layer + 'last' token mode only
    intercept[IllegalArgumentException](
      po.layerActivations(Iterator.single(Seq("x")), 3L, "last").next())
    intercept[IllegalArgumentException](
      po.layerActivations(Iterator.single(Seq("x")), -1L, "mean").next())
    // unregistered torch-bound schemes stay hard errors
    intercept[IllegalArgumentException](ModelRegistry.get("hf:gpt2"))
    intercept[IllegalArgumentException](ModelRegistry.get("tl:gpt2"))
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

  test("http: provider against a loopback mock server — batching, values, error paths") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    import scala.jdk.CollectionConverters._
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val batchSizes = new java.util.concurrent.CopyOnWriteArrayList[Integer]()
    val modelNames = new java.util.concurrent.CopyOnWriteArrayList[String]()
    def jsonHandler(f: Seq[String] => Option[String]): HttpHandler = (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      val texts = Json.parse(body) match {
        case o: JObj =>
          o.fields.get("model").foreach {
            case JString(m) => modelNames.add(m); case _ => ()
          }
          o("input") match {
            case JArr(xs) => xs.map { case JString(s) => s; case x => x.toString }
            case x => sys.error(s"bad input $x")
          }
        case x => sys.error(s"bad body $x")
      }
      f(texts.toSeq) match {
        case Some(resp) =>
          val bytes = resp.getBytes("UTF-8")
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
        case None =>
          ex.sendResponseHeaders(500, -1)
      }
      ex.close()
    }
    // embedding of a text = [length, 42.0] — verifiable per row
    def embed(texts: Seq[String]): String = Json.render(JObj(
      "embeddings" -> JArr(texts.map(t =>
        JArr(Vector(JDouble(t.length.toDouble), JDouble(42.0))): JValue).toVector)))
    server.createContext("/api/embed", jsonHandler { texts =>
      batchSizes.add(texts.length); Some(embed(texts))
    })
    server.createContext("/short", jsonHandler(texts => Some(embed(texts.take(1)))))
    server.createContext("/broken", jsonHandler(_ => None))
    server.createContext("/noembeds", jsonHandler(_ => Some("""{"other":1}""")))
    server.start()
    try {
      val port = server.getAddress.getPort
      // full engine path: mapPartitions on executors → loopback POST
      val r = newRunner()
      val text = SelectTextColumnOp(ds, "text")
      val act = LLMLayerActivationsOp(s"http:127.0.0.1:$port/api/embed", text,
        layerNum = -1L, batchSize = 2L)
      val v = r.toValues(act).map(_.asInstanceOf[scala.collection.Seq[Double]])
      assert(v.map(_.toSeq) ==
        Seq(Seq(11.0, 42.0), Seq(7.0, 42.0), Seq(11.0, 42.0), Seq(0.0, 42.0)))
      // batchSize honored: no request carried more than 2 texts, and all
      // 4 rows arrived across the batches
      assert(batchSizes.asScala.forall(_ <= 2))
      assert(batchSizes.asScala.map(_.toInt).sum == 4)

      // a short response is a hard error (no silent row drop)
      val shortR = LLMLayerActivationsOp(s"http:127.0.0.1:$port/short", text,
        layerNum = -1L, batchSize = 2L)
      val e = intercept[Exception](newRunner().toValues(shortR))
      def messages(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(x => String.valueOf(x.getMessage)).toSeq
      assert(messages(e).exists(_.contains("provider returned 1 results")))
      // HTTP 500 and a schema-less response are hard errors too
      intercept[Exception](new HttpProvider(s"127.0.0.1:$port/broken")
        .layerActivations(Iterator.single(Seq("x")), -1L, "last").next())
      val e2 = intercept[IllegalStateException](
        new HttpProvider(s"127.0.0.1:$port/noembeds")
          .layerActivations(Iterator.single(Seq("x")), -1L, "last").next())
      assert(e2.getMessage.contains("no 'embeddings'"))

      // full engine path through the ollama: ALIAS — endpoint from config,
      // model name delivered in the request body
      sys.props("graft.ollama.url") = s"http://127.0.0.1:$port"
      try {
        val actO = LLMLayerActivationsOp("ollama:nomic-embed-text", text,
          layerNum = -1L, batchSize = 3L)
        val vO = newRunner().toValues(actO).map(_.asInstanceOf[scala.collection.Seq[Double]])
        assert(vO.map(_.toSeq) ==
          Seq(Seq(11.0, 42.0), Seq(7.0, 42.0), Seq(11.0, 42.0), Seq(0.0, 42.0)))
        assert(modelNames.asScala.contains("nomic-embed-text"))
      } finally sys.props -= "graft.ollama.url"

      // st: alias with an explicit embedding endpoint
      sys.props("graft.embed.url") = s"http://127.0.0.1:$port/api/embed"
      try {
        val actS = LLMLayerActivationsOp("st:all-MiniLM-L6-v2", text,
          layerNum = -1L, batchSize = 4L)
        val vS = newRunner().toValues(actS).map(_.asInstanceOf[scala.collection.Seq[Double]])
        assert(vS.length == 4)
        assert(modelNames.asScala.contains("all-MiniLM-L6-v2"))
      } finally sys.props -= "graft.embed.url"
    } finally server.stop(0)
  }

  test("ollama: generate against a loopback mock — happy path, HTTP error, timeout") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    // records each request body so the Ollama /api/generate shape is asserted
    val bodies = new java.util.concurrent.CopyOnWriteArrayList[String]()
    def handler(f: JObj => Option[String]): HttpHandler = (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
      bodies.add(body)
      f(Json.parse(body).asInstanceOf[JObj]) match {
        case Some(resp) =>
          val bytes = resp.getBytes("UTF-8")
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
        case None =>
          val err = """{"error":"model 'missing' not found"}""".getBytes("UTF-8")
          ex.sendResponseHeaders(404, err.length)
          ex.getResponseBody.write(err)
      }
      ex.close()
    }
    // response echoes model + reversed prompt — verifiable per row
    server.createContext("/api/generate", handler { o =>
      (o("model"), o("prompt")) match {
        case (JString("missing"), _) => None
        case (JString(m), JString(p)) =>
          Some(Json.render(JObj("model" -> (JString(m): JValue),
            "response" -> (JString(s"[$m]${p.reverse}"): JValue),
            "done" -> (JBool(true): JValue))))
        case _ => None
      }
    })
    server.createContext("/slow", (ex: HttpExchange) => {
      Thread.sleep(5000); ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      sys.props("graft.ollama.url") = s"http://127.0.0.1:$port"
      try {
        // full engine path: LLMGenerateTextOp → mapPartitions → /api/generate
        val text = SelectTextColumnOp(ds, "text")
        val gen = LLMGenerateTextOp("ollama:llama3", text, maxTokens = 7L)
        val out = newRunner().toValues(gen).map(_.asInstanceOf[String])
        assert(out == Seq("[llama3]dlrow olleh", "[llama3]eybdoog",
          "[llama3]dlrow olleh", "[llama3]"))
        // request shape: model + prompt + stream:false + options.num_predict
        val shape = bodies.get(0)
        assert(shape.contains(""""model":"llama3""""))
        assert(shape.contains(""""stream":false"""))
        assert(shape.contains(""""num_predict":7"""))
        // HTTP error carries the server's error body (getErrorStream read)
        val (bad, _) = ModelRegistry.get("ollama:missing")
        val e = intercept[java.io.IOException](
          bad.generate(Iterator.single(Seq("x")), 5L).next())
        assert(e.getMessage.contains("HTTP 404") && e.getMessage.contains("not found"))
        // read timeout: a hung endpoint fails the task instead of blocking it
        sys.props("graft.http.read.timeout.ms") = "300"
        try {
          val slow = new HttpProvider(s"127.0.0.1:$port/slow",
            generateEndpoint = Some(s"http://127.0.0.1:$port/slow"))
          intercept[java.net.SocketTimeoutException](
            slow.generate(Iterator.single(Seq("x")), 5L).next())
        } finally sys.props -= "graft.http.read.timeout.ms"
        // schemes without a generation endpoint stay hard errors
        val (st, _) = ModelRegistry.get("st:all-MiniLM-L6-v2")
        intercept[UnsupportedOperationException](
          st.generate(Iterator.single(Seq("x")), 5L).next())
      } finally sys.props -= "graft.ollama.url"
    } finally server.stop(0)
  }

  test("ollama: generate pipelines requests within a batch, order preserved") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    // track in-flight request concurrency: each request parks briefly, so
    // pipelined posting must overlap while sequential posting cannot
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(16))
    server.createContext("/api/generate", (ex: HttpExchange) => {
      val now = inFlight.incrementAndGet()
      maxInFlight.accumulateAndGet(now, Math.max(_, _))
      try {
        val o = Json.parse(new String(ex.getRequestBody.readAllBytes(), "UTF-8"))
          .asInstanceOf[JObj]
        Thread.sleep(150)
        val JString(p) = o("prompt"): @unchecked
        val bytes = Json.render(JObj(
          "response" -> (JString(s"gen:$p"): JValue))).getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      } finally inFlight.decrementAndGet()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val prov = new HttpProvider(s"127.0.0.1:$port", model = Some("m"),
        generateEndpoint = Some(s"http://127.0.0.1:$port/api/generate"))
      val prompts = (0 until 8).map(i => s"p$i")
      val out = prov.generate(Iterator.single(prompts), 5L).next()
      // order is the batch order regardless of completion order
      assert(out == prompts.map(p => s"gen:$p"))
      // the default concurrency (4) must actually overlap round-trips;
      // maxInFlight alone proves the pipelining (an absolute wall-clock
      // bound here flaked under host contention without adding coverage)
      assert(maxInFlight.get() >= 2,
        s"no overlap observed (maxInFlight=${maxInFlight.get()})")
      // concurrency=1 restores strictly sequential posting
      sys.props("graft.http.generate.concurrency") = "1"
      try {
        maxInFlight.set(0)
        val seq1 = new HttpProvider(s"127.0.0.1:$port", model = Some("m"),
          generateEndpoint = Some(s"http://127.0.0.1:$port/api/generate"))
        assert(seq1.generate(Iterator.single(prompts.take(3)), 5L).next()
          == prompts.take(3).map(p => s"gen:$p"))
        assert(maxInFlight.get() == 1)
      } finally sys.props -= "graft.http.generate.concurrency"
    } finally server.stop(0)
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
