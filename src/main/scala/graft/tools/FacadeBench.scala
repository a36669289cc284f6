package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.SparkSession

import graft.GraftSession
import graft.api.HttpApi
import graft.streaming.Prompb

/** Facade throughput bench shaped after the reference's own
  * `remote-storage-bench` workload (10 tenants × 10 agents × 20 metrics
  * at a 10 s scrape interval, logging pts/s —
  * `tests/remote-storage-bench/main.go:40-45`): snappy prompb POSTs over
  * a real socket into the append-only hot store, then query_range and a
  * streamed remote read over what was written.
  *
  * Env knobs: SPARK_GRAFT_CPUS (default 32), FB_TENANTS/FB_AGENTS/
  * FB_METRICS/FB_SCRAPES (default 10/10/20/30). One JSON line to stdout
  * and FACADE_BENCH.json.
  */
object FacadeBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val tenants = sys.env.getOrElse("FB_TENANTS", "10").toInt
    val agents = sys.env.getOrElse("FB_AGENTS", "10").toInt
    val metrics = sys.env.getOrElse("FB_METRICS", "20").toInt
    val scrapes = sys.env.getOrElse("FB_SCRAPES", "30").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // micro-batching lifts the per-POST job-scheduling floor (r6 Wrong
    // #3): FB_FLUSH_POSTS posts share one pinned batch (1 = old behavior)
    val flushPosts = sys.env.getOrElse("FB_FLUSH_POSTS", "8").toInt
    // durable tier on by default (FB_DURABLE=0 disables): the flush
    // spills to the cold tier and builds agg_5m, so the routed (A4)
    // query phase below can measure pre-agg vs raw
    val durable =
      if (sys.env.getOrElse("FB_DURABLE", "1") == "0") None
      else Some(java.nio.file.Files.createTempDirectory("fb_cold")
        .resolve("cold").toString)
    val api = new HttpApi(spark, flushEveryPosts = flushPosts,
      durablePath = durable)
    val port = api.start(0)
    val client = HttpClient.newHttpClient()
    val t0ms = 1704067200000L // fixed epoch; scrape interval 10 s

    def post(path: String, body: Array[Byte],
        headers: Seq[(String, String)]): HttpResponse[Array[Byte]] = {
      val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .header("Content-Type", "application/x-protobuf")
      headers.foreach { case (k, v) => b.header(k, v) }
      client.send(b.POST(HttpRequest.BodyPublishers.ofByteArray(body)).build(),
        HttpResponse.BodyHandlers.ofByteArray())
    }

    // ---- ingest: one POST per (tenant, scrape), all agents' metrics ----
    val nPoints = tenants.toLong * agents * metrics * scrapes
    val w0 = System.nanoTime()
    for (s <- 0 until scrapes; t <- 0 until tenants) {
      val series = for (a <- 0 until agents; m <- 0 until metrics) yield
        Prompb.PromSeries(
          Map("__name__" -> s"fb_metric_$m", "instance" -> s"agent$a",
            "job" -> "fb"),
          Seq((t0ms + s * 10000L, (s + a + m).toDouble)))
      val rc = post("/api/v1/write", Prompb.encodeSnappy(series),
        Seq("X-SquirrelDB-Tenant" -> s"tenant$t")).statusCode()
      require(rc == 204, s"write failed: $rc")
    }
    val ingestSec = (System.nanoTime() - w0) / 1e9

    // ---- optional: bulk-ingest FB_HIST_HOURS of 10 s history ----
    // The A4 routed-vs-raw comparison is only meaningful over realistic
    // history (the reference's pre-agg exists for dashboard queries over
    // days/weeks — cassandra/tsdb/read.go:57-72); 30 scrapes span 300 s,
    // one agg bucket, where routed ≈ raw by construction. History rides
    // the SAME wire path (snappy prompb POSTs) in chunked payloads —
    // FB_HIST_CHUNK_MIN minutes of all agents' series per POST — so the
    // cold tier and agg_5m are built by the normal flush machinery, and
    // the chunked-payload throughput is itself a useful datapoint
    // (per-POST overhead amortizes over ~chunk×agents×metrics points).
    val histHours = sys.env.getOrElse("FB_HIST_HOURS", "0").toInt
    val chunkMin = sys.env.getOrElse("FB_HIST_CHUNK_MIN", "120").toInt
    var histSec = 0.0
    var histPoints = 0L
    // History appends AFTER the live scrape window (t0 + scrapes·10 s):
    // chunk 0 starting at t0 would re-write the scrape phase's exact
    // (series, ts) keys with different values, making the stored window
    // ingest-order dependent and counting overwrites as throughput.
    // Chunk count rounds UP and the tail chunk clamps to the declared
    // span, so FB_HIST_HOURS is written exactly even when chunkMin does
    // not divide it.
    val histBaseMs = t0ms + scrapes * 10000L
    if (histHours > 0) {
      require(chunkMin > 0, "FB_HIST_CHUNK_MIN must be positive")
      val h0 = System.nanoTime()
      val perChunk = chunkMin * 6 // 10 s interval
      val histEndMs = histBaseMs + histHours * 3600000L
      val nChunks = (histHours * 60 + chunkMin - 1) / chunkMin
      for (c <- 0 until nChunks; t <- 0 until tenants) {
        val start = histBaseMs + c.toLong * chunkMin * 60000L
        val n = math.min(perChunk.toLong, (histEndMs - start) / 10000L).toInt
        val series = for (a <- 0 until agents; m <- 0 until metrics) yield
          Prompb.PromSeries(
            Map("__name__" -> s"fb_metric_$m", "instance" -> s"agent$a",
              "job" -> "fb"),
            (0 until n).map(i =>
              (start + i * 10000L, (c + a + m + i % 7).toDouble)))
        val rc = post("/api/v1/write", Prompb.encodeSnappy(series),
          Seq("X-SquirrelDB-Tenant" -> s"tenant$t")).statusCode()
        require(rc == 204, s"history write failed: $rc")
        histPoints += agents.toLong * metrics * n
      }
      histSec = (System.nanoTime() - h0) / 1e9
    }

    // steady state: fold the append vector before the query phase (the
    // background compactor does this every compactEvery batches anyway)
    client.send(HttpRequest.newBuilder(URI.create(
      s"http://127.0.0.1:$port/debug/flush")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

    // ---- query_range per tenant over the written window ----
    val q0 = System.nanoTime()
    for (t <- 0 until tenants) {
      val q = java.net.URLEncoder.encode(
        "sum by (instance) (fb_metric_1)", "UTF-8")
      val resp = client.send(HttpRequest.newBuilder(URI.create(
        s"http://127.0.0.1:$port/api/v1/query_range?query=$q" +
          s"&start=${t0ms / 1000}&end=${t0ms / 1000 + scrapes * 10}&step=10"))
        .header("X-SquirrelDB-Tenant", s"tenant$t").GET().build(),
        HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() == 200 && resp.body().contains("agent1"),
        resp.body().take(200))
    }
    val querySec = (System.nanoTime() - q0) / 1e9

    // ---- A4: routed (pre-agg) vs forced-raw query_range ----
    // step ≥ 5 min routes through agg_5m; same query forced raw scans
    // the cold tier — the year-long-dashboard shape the routing exists
    // for (reference cassandra/tsdb/read.go:57-72)
    var routedSec = 0.0
    var rawSec = 0.0
    // with history, the dashboard window spans scrape + history; step
    // 600 keeps the route through agg_5m
    val qEndSec =
      if (histHours > 0) histBaseMs / 1000 + histHours * 3600
      else t0ms / 1000 + scrapes * 10
    if (durable.isDefined && api.preAggWatermark > 0) {
      def timedQ(hdrs: Seq[(String, String)]): Double = {
        val t0 = System.nanoTime()
        for (t <- 0 until tenants) {
          val q = java.net.URLEncoder.encode(
            "avg_over_time(fb_metric_1[10m])", "UTF-8")
          val b = HttpRequest.newBuilder(URI.create(
            s"http://127.0.0.1:$port/api/v1/query_range?query=$q" +
              s"&start=${t0ms / 1000}&end=$qEndSec" +
              "&step=600"))
            .header("X-SquirrelDB-Tenant", s"tenant$t")
          hdrs.foreach { case (k, v) => b.header(k, v) }
          val resp = client.send(b.GET().build(),
            HttpResponse.BodyHandlers.ofString())
          require(resp.statusCode() == 200, resp.body().take(200))
        }
        (System.nanoTime() - t0) / 1e9
      }
      rawSec = timedQ(Seq("X-SquirrelDB-ForceRaw" -> "true"))
      routedSec = timedQ(Nil)
    }

    // ---- streamed remote read of one tenant's full window ----
    val r0 = System.nanoTime()
    val readReq = org.xerial.snappy.Snappy.compress(Prompb.encodeReadRequest(
      Seq(Prompb.ReadQuery(t0ms, t0ms + scrapes * 10000L,
        Seq(graft.tsdb.MatchEq("job", "fb")))),
      Seq(Prompb.ResponseTypeStreamedXorChunks)))
    val readResp = post("/api/v1/read", readReq, Nil)
    require(readResp.statusCode() == 200)
    val readSamples = Prompb.readChunkedFrames(readResp.body())
      .map(Prompb.decodeChunkedReadResponse)
      .flatMap(_._2).flatMap(_._2)
      .map(c => graft.functions.XorChunk.decode(c.data).size.toLong).sum
    val readSec = (System.nanoTime() - r0) / 1e9

    api.stop()
    val json =
      s"""{"metric":"facade_ingest_pts_per_s","value":${nPoints / ingestSec},""" +
        s""""unit":"pts/s","points":$nPoints,"ingest_sec":$ingestSec,""" +
        s""""writes":${scrapes * tenants},""" +
        s""""flush_every_posts":$flushPosts,""" +
        s""""hist_hours":$histHours,"hist_points":$histPoints,""" +
        s""""hist_ingest_pts_per_s":${if (histSec > 0) histPoints / histSec else 0},""" +
        s""""query_range_sec_per_tenant":${querySec / tenants},""" +
        s""""routed_query_sec_per_tenant":${routedSec / tenants},""" +
        s""""raw_query_sec_per_tenant":${rawSec / tenants},""" +
        s""""streamed_read_samples":$readSamples,"read_sec":$readSec,""" +
        s""""workload":"${tenants}t x ${agents}a x ${metrics}m x ${scrapes}s @10s"}"""
    println(json)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("FB_OUT", "FACADE_BENCH.json")),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
