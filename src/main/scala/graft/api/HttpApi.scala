package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.promql.{EvalParams, FuncCall, Parser, PromSource, Selector}
import graft.streaming.{Ingest, Prompb, PrompbV2}
import graft.tsdb.{MatchEq, Matcher, Matchers}

/** The Prometheus HTTP API v1 facade — the reference's outward face
  * (`api/api.go:157-233` mounts `/api/v1/{query,query_range,series,labels,
  * label/<n>/values,read,write}` around the embedded Prometheus engine).
  * Here every endpoint composes the already-verified pieces: prompb wire
  * decode → `Ingest.ingestLabeled` (S1) on write, and
  * `QueryService.queryRange` (the §3.1 per-request chain) → `PromJson`
  * serialization on read.
  *
  * Request semantics mirror the reference's custom headers
  * (`types/types.go:172-189`): `X-SquirrelDB-Tenant` (F11),
  * `X-SquirrelDB-Forced-Matcher` (F10), `X-SquirrelDB-Max-Evaluated-Series`
  * (F13/W9) and `X-SquirrelDB-Max-Evaluated-Points` (F14).
  *
  * Storage: the handle keeps the ingested set as an in-memory hot store
  * (S10 analogue — `localCheckpoint` pins it and truncates lineage per
  * write). The durable path at scale is `store.Store.writePoints` (S8,
  * day-partitioned parquet); the query side is identical either way since
  * both expose the same (labels, ts_ms, value) shape.
  *
  * The multi-metric store carries `__name__` as a REAL series-identity
  * column, which is what the compiler's name-aware paths (dropName /
  * keepRealName) exist for.
  */
final class HttpApi(spark: SparkSession,
    tenantLabel: String = "__account_id",
    defaultTenant: String = "default",
    lookbackMs: Long = 300000L) {

  import Prompb.{PromRow, PromSeries}

  // hot store: labels map + metric_id + (__seq, ts_ms, value)
  @volatile private var points: Option[DataFrame] = None
  @volatile private var labelNames: Seq[String] = Nil
  private var writeSeq = 0L
  private var server: Option[HttpServer] = None

  // label names that cannot become DataFrame columns without colliding
  // with the engine's own schema
  private val Reserved =
    Set("value", "ts_ms", "eval_ms", "labels", "metric_id", "__seq")

  /** S1 ingest: validated label-map rows merged into the hot store with
    * last-write-wins dedup per (series, ts).
    */
  def write(series: Seq[PromSeries], tenant: String): Unit = synchronized {
    import spark.implicits._
    val rows = series.flatMap(s =>
      s.samples.map { case (t, v) => PromRow(s.labels, t, v) })
    if (rows.isEmpty) return
    writeSeq += 1
    val batch = Ingest.ingestLabeled(rows.toDF(), tenantLabel, tenant)
      .withColumn("__seq", lit(writeSeq))
    val merged = points match {
      case Some(prev) => prev.unionByName(batch)
      case None => batch
    }
    // LWW per (series, ts): later writes win, ties break on value
    val deduped = merged
      .groupBy("metric_id", "ts_ms")
      .agg(
        max_by(col("labels"), col("__seq")).as("labels"),
        max_by(col("value"), struct(col("__seq"), col("value"))).as("value"),
        max(col("__seq")).as("__seq"))
      .localCheckpoint(true)
    points = Some(deduped)
    labelNames = deduped
      .select(explode(map_keys(col("labels"))).as("n")).distinct()
      .as[String].collect().sorted.toSeq
  }

  /** The multi-metric PromSource over the hot store: every stored label —
    * including `__name__` — becomes a real identity column.
    */
  def source(): Option[PromSource] = points.map { df0 =>
    val names = labelNames.filterNot(Reserved)
    val df = names.foldLeft(df0)((d, n) =>
      d.withColumn(n, element_at(col("labels"), n)))
      .drop("labels", "metric_id", "__seq")
    PromSource(df, names, {
      case n if names.contains(n) => col(n)
      case _ => lit(null).cast("string")
    })
  }

  private def requestOptions(h: HttpExchange): RequestOptions = {
    def header(n: String): Option[String] =
      Option(h.getRequestHeaders.getFirst(n)).filter(_.nonEmpty)
    val forced = header("X-SquirrelDB-Forced-Matcher").map { v =>
      v.split("=", 2) match {
        case Array(n, value) => MatchEq(n.trim, value.trim)
        case _ => throw new IllegalArgumentException(
          s"forced matcher must be name=value, got '$v'")
      }
    }
    RequestOptions(
      tenantLabel = header("X-SquirrelDB-Tenant").map(t => (tenantLabel, t)),
      forced = forced.toSeq,
      maxSeries = header("X-SquirrelDB-Max-Evaluated-Series").map(_.toLong),
      maxPoints = header("X-SquirrelDB-Max-Evaluated-Points").map(_.toLong))
  }

  // ---- HTTP plumbing ----

  /** Bind and start; `port` 0 picks an ephemeral port. Returns the bound
    * port.
    */
  def start(port: Int = 0): Int = synchronized {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    s.createContext("/api/v1/", handle _)
    s.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    s.start()
    server = Some(s)
    s.getAddress.getPort
  }

  def stop(): Unit = synchronized {
    server.foreach(_.stop(0))
    server = None
  }

  private def handle(h: HttpExchange): Unit =
    try {
      val path = h.getRequestURI.getPath
      path match {
        case "/api/v1/write" => handleWrite(h)
        case "/api/v1/read" => handleRead(h)
        case "/api/v1/query_range" => handleQueryRange(h)
        case "/api/v1/query" => handleQuery(h)
        case "/api/v1/series" => handleSeries(h)
        case "/api/v1/labels" => handleLabels(h)
        case p if p.startsWith("/api/v1/label/") && p.endsWith("/values") =>
          handleLabelValues(h,
            p.stripPrefix("/api/v1/label/").stripSuffix("/values"))
        case _ => respond(h, 404, PromJson.error("bad_data", "unknown endpoint"))
      }
    } catch {
      case e: Exception =>
        respond(h, 422, PromJson.error("execution",
          Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))
    } finally h.close()

  private def handleWrite(h: HttpExchange): Unit = {
    val body = h.getRequestBody.readAllBytes()
    val ct = Option(h.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
    val series =
      if (ct.contains("io.prometheus.write.v2.Request"))
        PrompbV2.decodeSnappy(body)
      else Prompb.decodeSnappy(body)
    val tenant = Option(h.getRequestHeaders.getFirst("X-SquirrelDB-Tenant"))
      .filter(_.nonEmpty).getOrElse(defaultTenant)
    write(series, tenant)
    respondBytes(h, 204, Array.emptyByteArray, "application/json")
  }

  /** Remote read: matcher-filtered raw series per query, snappy-framed
    * proto response (`api/api.go:58-61`; S3).
    */
  private def handleRead(h: HttpExchange): Unit = {
    val queries = Prompb.decodeReadRequest(
      org.xerial.snappy.Snappy.uncompress(h.getRequestBody.readAllBytes()))
    val results: Seq[Seq[PromSeries]] = queries.map { q =>
      points match {
        case None => Seq.empty
        case Some(df) =>
          val resolve: String => org.apache.spark.sql.Column =
            n => element_at(col("labels"), n)
          val hits = df
            .where(col("ts_ms") >= q.startMs && col("ts_ms") <= q.endMs)
            .where(if (q.matchers.isEmpty) lit(true)
              else Matchers.all(resolve, q.matchers))
            .groupBy("metric_id")
            .agg(max_by(col("labels"), col("__seq")).as("labels"),
              sort_array(collect_list(
                struct(col("ts_ms"), col("value")))).as("samples"))
            .collect()
          hits.toSeq.map { r =>
            val labels = r.getAs[Map[String, String]]("labels")
            val samples = r
              .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("samples")
              .map(s => (s.getLong(0), s.getDouble(1))).toSeq
            PromSeries(labels, samples)
          }.sortBy(_.labels.toSeq.sorted.mkString(","))
      }
    }
    respondBytes(h, 200,
      org.xerial.snappy.Snappy.compress(Prompb.encodeReadResponse(results)),
      "application/x-protobuf")
  }

  private def handleQueryRange(h: HttpExchange): Unit = {
    val ps = params(h)
    val q = required(ps, "query")
    val start = parseTime(required(ps, "start"))
    val end = parseTime(required(ps, "end"))
    val step = parseDuration(required(ps, "step"))
    source() match {
      case None => respond(h, 200,
        PromJson.success("""{"resultType":"matrix","result":[]}"""))
      case Some(src) =>
        val p = EvalParams(start, end, step, lookbackMs)
        val df = QueryService.queryRange(q, src, p, requestOptions(h))
        val labels = df.columns.filterNot(Set("eval_ms", "value")).toSeq
        respond(h, 200, PromJson.matrix(df, labels))
    }
  }

  private def handleQuery(h: HttpExchange): Unit = {
    val ps = params(h)
    val q = required(ps, "query")
    val t = ps.get("time").flatMap(_.headOption).map(parseTime)
      .getOrElse(System.currentTimeMillis())
    source() match {
      case None => respond(h, 200,
        PromJson.success("""{"resultType":"vector","result":[]}"""))
      case Some(src) =>
        val p = EvalParams(t, t, 1000L, lookbackMs)
        val df = QueryService.queryRange(q, src, p, requestOptions(h))
        val labels = df.columns.filterNot(Set("eval_ms", "value")).toSeq
        // presentation ordering for a top-level sort/sort_desc — applied
        // HERE, not in the plan
        val order = Parser.parse(q) match {
          case FuncCall("sort", _, _) => Some(false)
          case FuncCall("sort_desc", _, _) => Some(true)
          case _ => None
        }
        respond(h, 200, PromJson.vector(df, labels, order))
    }
  }

  /** match[] selectors → matcher predicates over the label map. */
  private def selectorMatchers(expr: String): Seq[Matcher] =
    Parser.parse(expr) match {
      case s: Selector =>
        s.matchers ++ s.name.map(n => MatchEq("__name__", n)).toSeq
      case other => throw new IllegalArgumentException(
        s"match[] must be a series selector, got $other")
    }

  private def timeBounds(ps: Map[String, Seq[String]]): (Long, Long) = (
    ps.get("start").flatMap(_.headOption).map(parseTime).getOrElse(Long.MinValue),
    ps.get("end").flatMap(_.headOption).map(parseTime).getOrElse(Long.MaxValue))

  private def handleSeries(h: HttpExchange): Unit = {
    val ps = params(h)
    val sels = ps.getOrElse("match[]", Seq.empty)
    if (sels.isEmpty)
      return respond(h, 400, PromJson.error("bad_data",
        "no match[] parameter provided"))
    val (startMs, endMs) = timeBounds(ps)
    points match {
      case None => respond(h, 200, PromJson.success("[]"))
      case Some(df) =>
        val resolve: String => org.apache.spark.sql.Column =
          n => element_at(col("labels"), n)
        val pred = sels.map(s => Matchers.all(resolve, selectorMatchers(s)))
          .reduce(_ || _)
        // set-ops can't key on MAP columns — dedup per series id instead
        val sets = df
          .where(col("ts_ms") >= startMs && col("ts_ms") <= endMs)
          .where(pred)
          .groupBy("metric_id")
          .agg(max_by(col("labels"), col("__seq")).as("labels"))
          .collect().toSeq
          .map(_.getAs[Map[String, String]]("labels").toSeq.sortBy(_._1))
          .distinct
        respond(h, 200, PromJson.seriesList(sets))
    }
  }

  private def handleLabels(h: HttpExchange): Unit =
    respond(h, 200, PromJson.strings(labelNames))

  private def handleLabelValues(h: HttpExchange, name: String): Unit = {
    import spark.implicits._
    points match {
      case None => respond(h, 200, PromJson.success("[]"))
      case Some(df) =>
        val values = df
          .select(element_at(col("labels"), name).as("v"))
          .where(col("v").isNotNull && col("v") =!= "")
          .distinct().as[String].collect().toSeq
        respond(h, 200, PromJson.strings(values))
    }
  }

  // ---- request parsing ----

  /** Query-string + form-body params (Prometheus accepts both). */
  private def params(h: HttpExchange): Map[String, Seq[String]] = {
    def parse(s: String): Seq[(String, String)] =
      s.split("&").toSeq.filter(_.nonEmpty).map { kv =>
        val Array(k, v) = (kv.split("=", 2) ++ Array("")).take(2)
        (java.net.URLDecoder.decode(k, UTF_8),
          java.net.URLDecoder.decode(v, UTF_8))
      }
    val fromQuery = Option(h.getRequestURI.getRawQuery).map(parse)
      .getOrElse(Seq.empty)
    val ct = Option(h.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
    val fromBody =
      if (ct.startsWith("application/x-www-form-urlencoded"))
        parse(new String(h.getRequestBody.readAllBytes(), UTF_8))
      else Seq.empty
    (fromQuery ++ fromBody).groupBy(_._1).map { case (k, vs) =>
      k -> vs.map(_._2) }
  }

  private def required(ps: Map[String, Seq[String]], name: String): String =
    ps.get(name).flatMap(_.headOption).getOrElse(
      throw new IllegalArgumentException(s"missing parameter '$name'"))

  /** Unix float seconds or RFC3339 → epoch ms. */
  private def parseTime(s: String): Long =
    if (s.contains("T")) java.time.Instant.parse(s).toEpochMilli
    else math.round(s.toDouble * 1000.0)

  private val DurRe = "([0-9]+)(ms|s|m|h|d|w|y)".r

  /** Go-style duration ("15s", "1m", "2h30m") or float seconds → ms. */
  private def parseDuration(s: String): Long =
    if (s.matches("^[0-9.]+$")) math.round(s.toDouble * 1000.0)
    else {
      val ms = DurRe.findAllMatchIn(s).map { m =>
        m.group(1).toLong * (m.group(2) match {
          case "ms" => 1L; case "s" => 1000L; case "m" => 60000L
          case "h" => 3600000L; case "d" => 86400000L
          case "w" => 604800000L; case "y" => 31536000000L
        })
      }.sum
      if (ms <= 0) throw new IllegalArgumentException(s"bad duration '$s'")
      ms
    }

  private def respond(h: HttpExchange, code: Int, json: String): Unit =
    respondBytes(h, code, json.getBytes(UTF_8), "application/json")

  private def respondBytes(h: HttpExchange, code: Int, body: Array[Byte],
      contentType: String): Unit = {
    h.getResponseHeaders.set("Content-Type", contentType)
    if (body.isEmpty) h.sendResponseHeaders(code, -1)
    else {
      h.sendResponseHeaders(code, body.length.toLong)
      h.getResponseBody.write(body)
    }
  }
}
