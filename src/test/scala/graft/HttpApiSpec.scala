package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.scalatest.BeforeAndAfterAll

import graft.api.HttpApi
import graft.streaming.{Prompb, PrompbV2}
import graft.tsdb.MatchEq

/** End-to-end HTTP API v1: POST prompb write → the Prometheus JSON shapes
  * out of every read endpoint (reference `api/api.go:157-233`). The whole
  * chain runs over a real socket: wire decode → Ingest validation → hot
  * store → QueryService → PromJson.
  */
class HttpApiSpec extends SparkSpec with BeforeAndAfterAll {

  import Prompb.PromSeries

  private lazy val api = new HttpApi(spark)
  private lazy val port = { writeFixture(); api.start(0) }
  private lazy val client = HttpClient.newHttpClient()

  // fixture: two metrics, two instances, 1-minute samples over 10 min
  private val T0 = 1704067200000L
  private val T9 = T0 + 9 * 60000L

  private def series(name: String, inst: String,
      f: Int => Double): PromSeries =
    PromSeries(Map("__name__" -> name, "instance" -> inst, "job" -> "node"),
      (0 until 10).map(i => (T0 + i * 60000L, f(i))))

  private def writeFixture(): Unit = {
    val payload = Prompb.encodeSnappy(Seq(
      series("http_requests_total", "i1", i => 100.0 + 10 * i), // counter
      series("http_requests_total", "i2", i => 200.0 + 20 * i),
      series("node_load", "i1", i => 1.0 + i),
      series("node_load", "i2", i => 5.0 - 0.5 * i)))
    api.write(Prompb.decodeSnappy(payload), "default")
  }

  private def get(pathAndQuery: String,
      headers: Seq[(String, String)] = Nil): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:$port$pathAndQuery"))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.GET().build(), HttpResponse.BodyHandlers.ofString())
  }

  private def post(path: String, body: Array[Byte], contentType: String,
      headers: Seq[(String, String)] = Nil): HttpResponse[Array[Byte]] = {
    val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .header("Content-Type", contentType)
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(
      b.POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
      HttpResponse.BodyHandlers.ofByteArray())
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  override def afterAll(): Unit = api.stop()

  test("write over HTTP returns 204; query_range returns the matrix shape") {
    // a fresh write through the real socket (adds nothing new: same series)
    val r = post("/api/v1/write", Prompb.encodeSnappy(Seq(
      series("node_load", "i1", i => 1.0 + i))), "application/x-protobuf")
    assert(r.statusCode() === 204)

    val resp = get(s"/api/v1/query_range?query=${enc("node_load")}" +
      s"&start=${T0 / 1000}&end=${T9 / 1000}&step=60")
    assert(resp.statusCode() === 200)
    val body = resp.body()
    assert(body.contains(""""status":"success""""))
    assert(body.contains(""""resultType":"matrix""""))
    // both instances present, with the metric name as a real label
    assert(body.contains(""""__name__":"node_load""""))
    assert(body.contains(""""instance":"i1""""))
    assert(body.contains(""""instance":"i2""""))
    // first i1 sample: [T0, "1"]
    assert(body.contains(s"""[${T0 / 1000},"1"]"""))
  }

  test("rate over the counter metric drops the name and computes per series") {
    val resp = get(s"/api/v1/query_range?query=${
      enc("rate(http_requests_total[2m])")}" +
      s"&start=${T0 / 1000 + 120}&end=${T9 / 1000}&step=60")
    assert(resp.statusCode() === 200)
    val body = resp.body()
    // name dropped (shouldDropMetricName), identity labels kept
    assert(!body.contains(""""__name__""""))
    assert(body.contains(""""instance":"i1""""))
    // i1 counter rises 10/min → rate 1/6 per second
    assert(body.contains("0.16666666666666666"))
  }

  test("instant query with sort_desc orders the serialized vector") {
    val resp = get(s"/api/v1/query?query=${enc("sort_desc(node_load)")}" +
      s"&time=${T9 / 1000}")
    assert(resp.statusCode() === 200)
    val body = resp.body()
    assert(body.contains(""""resultType":"vector""""))
    // at T9: i1 = 10, i2 = 0.5 → descending puts i1 first
    val i1 = body.indexOf(""""instance":"i1"""")
    val i2 = body.indexOf(""""instance":"i2"""")
    assert(i1 >= 0 && i2 >= 0 && i1 < i2)
  }

  test("aggregation drops the metric name across metrics") {
    val resp = get(s"/api/v1/query?query=${enc("sum by (job) (node_load)")}" +
      s"&time=${T9 / 1000}")
    val body = resp.body()
    assert(body.contains(""""job":"node""""))
    assert(!body.contains("__name__"))
    // 10 + 0.5
    assert(body.contains(""""10.5""""))
  }

  test("labels / label values / series endpoints") {
    val labels = get("/api/v1/labels").body()
    for (l <- Seq("__name__", "instance", "job", "__account_id"))
      assert(labels.contains(s""""$l""""), labels)

    val values = get("/api/v1/label/instance/values").body()
    assert(values.contains(""""i1"""") && values.contains(""""i2""""))

    val names = get("/api/v1/label/__name__/values").body()
    assert(names.contains(""""node_load"""")
      && names.contains(""""http_requests_total""""))

    val series = get(s"/api/v1/series?match[]=${
      enc("""node_load{instance="i1"}""")}").body()
    assert(series.contains(""""__name__":"node_load""""))
    assert(series.contains(""""instance":"i1""""))
    assert(!series.contains(""""instance":"i2""""), series)
  }

  test("remote read returns the written samples (snappy proto framing)") {
    val req = org.xerial.snappy.Snappy.compress(Prompb.encodeReadRequest(Seq(
      Prompb.ReadQuery(T0, T9, Seq(MatchEq("__name__", "node_load"),
        MatchEq("instance", "i1"))))))
    val resp = post("/api/v1/read", req, "application/x-protobuf")
    assert(resp.statusCode() === 200, new String(resp.body(), "UTF-8"))
    val results = Prompb.decodeReadResponse(
      org.xerial.snappy.Snappy.uncompress(resp.body()))
    assert(results.size === 1)
    val matched = results.head
    assert(matched.size === 1)
    assert(matched.head.labels("__name__") === "node_load")
    assert(matched.head.labels("instance") === "i1")
    assert(matched.head.samples === (0 until 10).map(i =>
      (T0 + i * 60000L, 1.0 + i)))
  }

  test("tenant isolation and limit headers through the request chain") {
    // write one series under tenant t1 via the header
    post("/api/v1/write", Prompb.encodeSnappy(Seq(
      series("tenant_metric", "i9", i => 7.0))), "application/x-protobuf",
      Seq("X-SquirrelDB-Tenant" -> "t1"))
    // visible under t1
    val t1 = get(s"/api/v1/query?query=${enc("tenant_metric")}" +
      s"&time=${T9 / 1000}", Seq("X-SquirrelDB-Tenant" -> "t1")).body()
    assert(t1.contains(""""instance":"i9""""), t1)
    // invisible under t2
    val t2 = get(s"/api/v1/query?query=${enc("tenant_metric")}" +
      s"&time=${T9 / 1000}", Seq("X-SquirrelDB-Tenant" -> "t2")).body()
    assert(!t2.contains("i9"))
    // F13 header: 4 series of node_load+http under a cap of 1 → error
    val limited = get(s"/api/v1/query?query=${enc("node_load")}" +
      s"&time=${T9 / 1000}", Seq("X-SquirrelDB-Max-Evaluated-Series" -> "1"))
    assert(limited.statusCode() === 422)
    assert(limited.body().contains("more than 1 series"))
    // F14 header
    val pLimited = get(s"/api/v1/query_range?query=${enc("node_load")}" +
      s"&start=${T0 / 1000}&end=${T9 / 1000}&step=60",
      Seq("X-SquirrelDB-Max-Evaluated-Points" -> "3"))
    assert(pLimited.statusCode() === 422)
    assert(pLimited.body().contains("more than 3 points"))
  }

  test("prompb v2 write (symbol table) through the content-type switch") {
    post("/api/v1/write", PrompbV2.encodeSnappy(Seq(
      series("v2_metric", "i1", i => 3.0))),
      "application/x-protobuf;proto=io.prometheus.write.v2.Request")
    val resp = get(s"/api/v1/query?query=${enc("v2_metric")}" +
      s"&time=${T9 / 1000}").body()
    assert(resp.contains(""""__name__":"v2_metric""""), resp)
  }
}
