package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** S11 — dashboard provisioning: generated saved objects must be valid
  * per-line JSON wired to the serving contract's fields, and the
  * import client must reproduce the reference's wait/import/report
  * protocol (status poll, kbn-xsrf multipart POST, successCount and
  * per-object error reporting, serving-index data gate).
  */
class KibanaSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("generated ndjson: one JSON object per line, contract fields, resolvable references") {
    val ndjson = KibanaSavedObjects.dashboardNdjson("sky_safe_flights")
    val lines = ndjson.trim.split("\n")
    assert(lines.length == 3)
    val objs = lines.map(mapper.readTree)
    val types = objs.map(_.path("type").asText()).toSeq
    assert(types == Seq("index-pattern", "dashboard", "config"))

    val pattern = objs(0)
    assert(pattern.path("attributes").path("title").asText() == "sky_safe_flights")
    assert(pattern.path("attributes").path("timeFieldName").asText() == "extracted_at")

    // dashboard panels use serving-contract fields and reference the pattern
    val dash = objs(1)
    val panelsJson = dash.path("attributes").path("panelsJSON").asText()
    assert(panelsJson.contains("location"))
    assert(panelsJson.contains("risk_category"))
    assert(panelsJson.contains("risk_score"))
    val refId = dash.path("references").get(0).path("id").asText()
    assert(refId == pattern.path("id").asText())
    // config points default index at the generated pattern
    assert(objs(2).path("attributes").path("defaultIndex").asText() == refId)

    // deterministic: same index → same ids (overwrite, not accumulate)
    assert(KibanaSavedObjects.dashboardNdjson("sky_safe_flights") == ndjson)
    assert(KibanaSavedObjects.dashboardNdjson("other_index") != ndjson)
  }

  test("provision: polls status until up, posts multipart with kbn-xsrf, reports errors") {
    val statusHits = new AtomicInteger(0)
    var importBody: String = null
    var xsrf: String = null
    var query: String = null

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/status", (ex: HttpExchange) => {
      // first two polls: not ready yet
      if (statusHits.incrementAndGet() < 3) respond(ex, 503, "starting")
      else respond(ex, 200, """{"status": {"overall": {"level": "available"}}}""")
    })
    server.createContext("/api/saved_objects/_import", (ex: HttpExchange) => {
      importBody = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      xsrf = ex.getRequestHeaders.getFirst("kbn-xsrf")
      query = ex.getRequestURI.getQuery
      respond(ex, 200,
        """{"successCount": 2, "errors": [
          |  {"id": "bad-object", "error": {"message": "unsupported type"}}
          |]}""".stripMargin)
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val prov = new KibanaProvisioner(base, maxRetries = 5, retryDelayMs = 10L)
      val ndjson = KibanaSavedObjects.dashboardNdjson("sky_safe_flights")
      val result = prov.provision(ndjson)

      assert(statusHits.get() == 3) // two not-ready polls + success
      assert(result.contains(KibanaImportResult(2,
        Seq("bad-object: unsupported type"))))
      assert(xsrf == "true")
      assert(query == "overwrite=true")
      assert(importBody.contains("filename=\"dashboard.ndjson\""))
      assert(importBody.contains("\"type\":\"dashboard\""))
    } finally server.stop(0)
  }

  test("provision gives up when kibana never answers; index data gate honors count") {
    val prov = new KibanaProvisioner("http://127.0.0.1:1", maxRetries = 2, retryDelayMs = 5L)
    assert(prov.provision("{}").isEmpty)

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val counts = new AtomicInteger(0)
    server.createContext("/sky_safe_flights/_count", (ex: HttpExchange) => {
      // empty on the first poll, populated on the second
      if (counts.incrementAndGet() == 1) respond(ex, 200, """{"count": 0}""")
      else respond(ex, 200, """{"count": 42}""")
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val p2 = new KibanaProvisioner(base, maxRetries = 5, retryDelayMs = 5L)
      assert(p2.waitForIndexData(base, "sky_safe_flights"))
      assert(counts.get() == 2)
    } finally server.stop(0)
  }

  test("sensor pokes are single-shot and never sleep; policy mirrors the DAG") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val statusHits = new AtomicInteger(0)
    val countHits = new AtomicInteger(0)
    server.createContext("/api/status", (ex: HttpExchange) => {
      if (statusHits.incrementAndGet() == 1) respond(ex, 503, "starting")
      else respond(ex, 200, """{"status": "ok"}""")
    })
    server.createContext("/idx/_count", (ex: HttpExchange) => {
      if (countHits.incrementAndGet() == 1) respond(ex, 200, """{"count": 0}""")
      else respond(ex, 200, """{"count": 7}""")
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val prov = new KibanaProvisioner(base, maxRetries = 1, retryDelayMs = 0L)
      // each poke makes EXACTLY one request and reports that attempt
      assert(!prov.pokeKibana() && statusHits.get() == 1)
      assert(prov.pokeKibana() && statusHits.get() == 2)
      assert(!prov.pokeIndexData(base, "idx") && countHits.get() == 1)
      assert(prov.pokeIndexData(base, "idx") && countHits.get() == 2)
      // unreachable cluster pokes false (the sensor's catch-all branch)
      assert(!prov.pokeIndexData("http://127.0.0.1:1", "idx"))
    } finally server.stop(0)

    // the DAG's schedule: poke every 30 s, give up after 600 s
    val policy = SensorPolicy()
    assert(policy.nextPokeAt(startMs = 0L, nowMs = 0L).contains(30000L))
    assert(policy.nextPokeAt(startMs = 0L, nowMs = 570000L).contains(600000L))
    assert(policy.nextPokeAt(startMs = 0L, nowMs = 580000L).isEmpty) // would overrun
    assert(policy.maxPokes == 21)
  }
}
