package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.HttpSink
import graft.sinks.HttpSink.WireSpec

/** Wire-sink behavior against an in-process HTTP server — the reference's
  * own test pattern (cmd/freader/sink/opensearch/opensearch_test.go:10
  * runs the sink against an httptest fake `_bulk` endpoint).
  */
class HttpSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** A fake OpenSearch `_bulk` endpoint: parses NDJSON action/doc pairs,
    * rejects docs containing "REJECT" with status 429, counts both sides.
    */
  private def withBulkServer(
      f: (String, AtomicLong, AtomicLong, AtomicLong) => Unit): Unit = {
    val accepted = new AtomicLong; val rejected = new AtomicLong
    val posts = new AtomicLong
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        posts.incrementAndGet()
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val lines = body.split("\n").filter(_.nonEmpty)
        val docs = lines.grouped(2).map(_.last).toSeq
        val items = docs.map { d =>
          if (d.contains("REJECT")) {
            rejected.incrementAndGet()
            """{"index":{"status":429,"error":{"type":"too_many_requests"}}}"""
          } else {
            accepted.incrementAndGet()
            """{"index":{"status":201}}"""
          }
        }
        val errors = docs.exists(_.contains("REJECT"))
        val resp = s"""{"took":1,"errors":$errors,"items":[${items.mkString(",")}]}"""
          .getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, resp.length.toLong)
        val os = ex.getResponseBody
        try os.write(resp) finally os.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}",
      accepted, rejected, posts)
    finally server.stop(0)
  }

  test("parseBulkResponse: errors:false fast path, per-item statuses, malformed") {
    assert(HttpSink.parseBulkResponse(
      """{"took":1,"errors":false,"items":[{"index":{"status":201}}]}""", 3)
      == IndexedSeq(true, true, true))
    assert(HttpSink.parseBulkResponse(
      """{"took":1,"errors":true,"items":[{"index":{"status":201}},""" +
        """{"index":{"status":429,"error":{"type":"x"}}},{"index":{"status":200}}]}""",
      3) == IndexedSeq(true, false, true))
    // item count ≠ batch size → indistinguishable outcomes count failed
    assert(HttpSink.parseBulkResponse("""{"errors":true,"items":[]}""", 2)
      == IndexedSeq(false, false))
    assert(HttpSink.parseBulkResponse("not json at all", 2)
      == IndexedSeq(false, false))
    // content spoofing: a rejected doc whose error.reason ECHOES bulk-API
    // text ('"errors": false', a status field) must not flip outcomes —
    // the parse is structural, not substring
    assert(HttpSink.parseBulkResponse(
      """{"took":1,"errors":true,"items":[{"index":{"status":400,""" +
        """"error":{"type":"mapper_parsing_exception","reason":""" +
        """"failed to parse: {\"errors\": false, \"status\": 201}"}}}]}""",
      1) == IndexedSeq(false))
  }

  test("opensearch bulk delivery: exact per-file accounting, batches sized by batch-size") {
    withBulkServer { (url, accepted, rejected, posts) =>
      import spark.implicits._
      // 23 docs over two files; 5 carry the reject marker
      val docs = (0 until 23).map { i =>
        val f = if (i % 2 == 0) "f-even" else "f-odd"
        val marker = if (i < 5) "REJECT" else "ok"
        (f, s"""{"message":"doc-$i $marker"}""")
      }.toDF("fname", "doc")
      val acc = HttpSink.deliver(docs.repartition(2),
        WireSpec("opensearch", url, "logs-graft", batchSize = 4))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(accepted.get() == 18 && rejected.get() == 5)
      assert(acc.values.map(_._1).sum == 18)
      assert(acc.values.map(_._2).sum == 5)
      // docs 0..4 rejected: evens 0,2,4 → f-even, odds 1,3 → f-odd
      assert(acc("f-even") == (9L, 3L) && acc("f-odd") == (9L, 2L))
      // batch-size respected: 23 docs / 4 per POST needs ≥ 6 POSTs
      assert(posts.get() >= 6)
    }
  }

  test("unreachable endpoint: whole batch counted failed, nothing thrown") {
    // grab a port with no listener
    val sock = new java.net.ServerSocket(0)
    val deadPort = sock.getLocalPort
    sock.close()
    import spark.implicits._
    val docs = Seq(("f1", """{"m":1}"""), ("f1", """{"m":2}""")).toDF("fname", "doc")
    val acc = HttpSink.deliver(docs,
      WireSpec("opensearch", s"http://127.0.0.1:$deadPort", "idx",
        timeoutMs = 2000))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(acc.map(_._1).sum == 0 && acc.map(_._2).sum == 2)
  }

  test("clickhouse HTTP flavor: INSERT FORMAT JSONEachRow, all-or-nothing per POST") {
    val inserted = new AtomicLong
    val sawQuery = new java.util.concurrent.atomic.AtomicReference[String]("")
    var failMode = false
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        sawQuery.set(java.net.URLDecoder.decode(
          Option(ex.getRequestURI.getRawQuery).getOrElse(""), "UTF-8"))
        val code = if (failMode) 500 else 200
        if (!failMode) inserted.addAndGet(body.split("\n").count(_.nonEmpty).toLong)
        val resp = (if (failMode) "Code: 241. DB::Exception: memory limit"
          else "").getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, if (resp.isEmpty) -1L else resp.length.toLong)
        val os = ex.getResponseBody
        try os.write(resp) finally os.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      import spark.implicits._
      val docs = (0 until 7).map(i => ("f1", s"""{"message":"r$i"}"""))
        .toDF("fname", "doc")
      val spec = WireSpec("clickhouse", url, "logs.freader_logs", batchSize = 3)
      val ok = HttpSink.deliver(docs, spec).collect().head
      assert(ok.getLong(1) == 7 && ok.getLong(2) == 0)
      assert(inserted.get() == 7)
      assert(sawQuery.get.contains("INSERT INTO logs.freader_logs FORMAT JSONEachRow"))
      failMode = true
      val bad = HttpSink.deliver(docs, spec).collect().head
      assert(bad.getLong(1) == 0 && bad.getLong(2) == 7)
    } finally server.stop(0)
  }

  test("basic auth header is sent when user is set") {
    val sawAuth = new java.util.concurrent.atomic.AtomicReference[String]("")
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        ex.getRequestBody.readAllBytes()
        sawAuth.set(Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""))
        val resp = """{"errors":false,"items":[]}""".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, resp.length.toLong)
        val os = ex.getResponseBody
        try os.write(resp) finally os.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      HttpSink.postBatch(
        WireSpec("opensearch", url, "idx", user = "u1", pass = "p w"),
        IndexedSeq("""{"m":1}"""))
      val expected = "Basic " + java.util.Base64.getEncoder.encodeToString(
        "u1:p w".getBytes(StandardCharsets.UTF_8))
      assert(sawAuth.get == expected)
    } finally server.stop(0)
  }
}
