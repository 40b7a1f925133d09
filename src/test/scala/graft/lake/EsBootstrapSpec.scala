package graft.lake

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Serving-index bootstrap: the reference pings the cluster and
  * creates the index with its mapping before every bulk run
  * (`src/index_elastic.py:185-195`) — the client must reproduce that
  * sequence, fail hard when serving is down, and never re-create an
  * existing index.
  */
class EsBootstrapSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private final class RecordingSink extends DocumentSink {
    var calls = 0
    override def upsert(docs: DataFrame, keyCol: String): Unit = calls += 1
  }

  test("flight mapping json mirrors the reference index mapping") {
    val node = mapper.readTree(EsIndexBootstrap.flightMappingJson)
    val props = node.path("mappings").path("properties")
    def t(f: String): String = props.path(f).path("type").asText()
    assert(t("icao24") == "keyword")
    assert(t("location") == "geo_point")
    assert(t("baro_altitude") == "float")
    assert(t("on_ground") == "boolean")
    assert(t("risk_score") == "integer")
    assert(t("risk_category") == "keyword")
    // reference narrowings over the engine's double columns
    assert(t("cloud_cover") == "integer")
    assert(t("weather_code") == "integer")
    assert(t("observation_time") == "date")
    assert(t("extracted_at") == "date")
    // every contract field is mapped
    assert(props.size() == ServingContract.flightDocuments.fields.length)
  }

  test("bootstrap: ping, create-if-missing once, then bulk — " +
      "second run skips the create") {
    val spark = TestSpark.spark
    import spark.implicits._
    val pings = new AtomicInteger(0)
    val creates = new AtomicInteger(0)
    var createBody: String = null
    val exists = new java.util.concurrent.atomic.AtomicBoolean(false)

    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      (ex.getRequestMethod, ex.getRequestURI.getPath) match {
        case ("GET", "/") =>
          pings.incrementAndGet(); respond(ex, 200, """{"tagline":"ok"}""")
        case ("GET", "/sky_safe_flights") =>
          if (exists.get()) respond(ex, 200, """{"sky_safe_flights":{}}""")
          else respond(ex, 404, """{"error":"index_not_found_exception"}""")
        case ("PUT", "/sky_safe_flights") =>
          creates.incrementAndGet()
          createBody = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
          exists.set(true)
          respond(ex, 200, """{"acknowledged":true}""")
        case _ => respond(ex, 400, "unexpected")
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val inner = new RecordingSink
      val sink = new BootstrappedSink(
        new EsIndexBootstrap(url, "sky_safe_flights"),
        EsIndexBootstrap.flightMappingJson, inner)
      val docs = Seq(("abc123", 1)).toDF("icao24", "n")
      sink.upsert(docs, "icao24")
      sink.upsert(docs, "icao24")
      assert(pings.get() == 2, "every run pings first")
      assert(creates.get() == 1, "create fires only when the index is absent")
      assert(inner.calls == 2, "bulk runs after each bootstrap")
      // the create body IS the mapping (geo_point pinned pre-data)
      val sent = mapper.readTree(createBody)
      assert(sent.path("mappings").path("properties")
        .path("location").path("type").asText() == "geo_point")
    } finally server.stop(0)
  }

  test("bootstrap: unreachable cluster aborts before any bulk") {
    val spark = TestSpark.spark
    import spark.implicits._
    val inner = new RecordingSink
    // port 1 on localhost: connection refused
    val sink = new BootstrappedSink(
      new EsIndexBootstrap("http://127.0.0.1:1", "sky_safe_flights"),
      EsIndexBootstrap.flightMappingJson, inner)
    val docs = Seq(("abc123", 1)).toDF("icao24", "n")
    intercept[java.net.ConnectException] { sink.upsert(docs, "icao24") }
    assert(inner.calls == 0, "no bulk after a failed healthcheck")
  }

  test("a non-404 exists-check error propagates instead of triggering " +
      "a create") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      (ex.getRequestMethod, ex.getRequestURI.getPath) match {
        case ("GET", "/") => respond(ex, 200, "{}")
        case ("GET", "/guarded") =>
          respond(ex, 401, """{"error":"security_exception"}""")
        case _ => respond(ex, 400, "unexpected")
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}"
      val bs = new EsIndexBootstrap(url, "guarded")
      val e = intercept[graft.sources.Http.HttpStatusException] {
        bs.ensureIndex("{}")
      }
      assert(e.status == 401)
    } finally server.stop(0)
  }
}
