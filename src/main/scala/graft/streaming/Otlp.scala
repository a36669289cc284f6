package graft.streaming

import graft.streaming.Prompb.PromSeries
import graft.streaming.Wire._

/** OTLP metrics ingest decode (S1): the reference's third write path
  * (`api/api.go:63-66` enables OTLP receiving; translation via the public
  * prometheus otlptranslator). Public message shape
  * (`opentelemetry.proto.collector.metrics.v1.ExportMetricsServiceRequest`):
  *
  * {{{
  * ExportMetricsServiceRequest { repeated ResourceMetrics resource_metrics = 1; }
  * ResourceMetrics { Resource resource = 1; repeated ScopeMetrics scope_metrics = 2; }
  * Resource        { repeated KeyValue attributes = 1; }
  * ScopeMetrics    { repeated Metric metrics = 2; }
  * Metric          { string name = 1; Gauge gauge = 5; Sum sum = 7; }
  * Gauge/Sum       { repeated NumberDataPoint data_points = 1; }
  * NumberDataPoint { fixed64 time_unix_nano = 3; double as_double = 4;
  *                   sfixed64 as_int = 6; repeated KeyValue attributes = 7; }
  * KeyValue        { string key = 1; AnyValue value = 2; }
  * AnyValue        { string string_value = 1; bool bool_value = 2;
  *                   int64 int_value = 3; double double_value = 4; }
  * }}}
  *
  * Prometheus translation (the subset the reference's samples-only model
  * accepts — native histograms/exemplars are rejected there too,
  * `api/remotestorage/write.go:233-252`): metric name → `__name__`,
  * attribute keys sanitized (`.`/`-` → `_`), resource `service.name` →
  * `job`, `service.instance.id` → `instance`, nanos → ms.
  */
object Otlp {

  def decodeExportRequest(bytes: Array[Byte]): Seq[PromSeries] = {
    val out = Seq.newBuilder[PromSeries]
    eachField(bytes, 0, bytes.length) {
      case (1, from, to) => // ResourceMetrics
        var resourceAttrs = Map.empty[String, String]
        // first pass: resource attributes
        eachField(bytes, from, to) {
          case (1, f2, t2) => // Resource
            eachField(bytes, f2, t2) {
              case (1, f3, t3) => resourceAttrs += decodeKeyValue(bytes, f3, t3)
              case _ => ()
            }
          case _ => ()
        }
        val base = translateResource(resourceAttrs)
        // second pass: metrics
        val block = Seq.newBuilder[PromSeries]
        eachField(bytes, from, to) {
          case (2, f2, t2) => // ScopeMetrics
            eachField(bytes, f2, t2) {
              case (2, f3, t3) => // Metric
                block ++= decodeMetric(bytes, f3, t3, base)
              case _ => ()
            }
          case _ => ()
        }
        val series = block.result()
        out ++= series
        // target_info synthesis (the upstream otlptranslator's
        // addResourceTargetInfo, which the reference gets via the
        // Prometheus OTLP endpoint it enables): non-identifying resource
        // attributes become the data labels of ONE `target_info` sample
        // per resource, value 1, stamped at the block's most recent
        // data-point timestamp. Emitted only when the resource has an
        // identity (job/instance) AND at least one extra attribute —
        // exactly the upstream gate.
        val extras = resourceAttrs.view
          .filterKeys(k => k != "service.name" && k != "service.instance.id")
          .map { case (k, v) => sanitize(k) -> v }.toMap
        if (base.nonEmpty && extras.nonEmpty && series.nonEmpty) {
          val maxTs = series.iterator.flatMap(_.samples.map(_._1)).max
          out += PromSeries(
            base ++ extras + ("__name__" -> "target_info"),
            Seq((maxTs, 1.0)))
        }
      case _ => ()
    }
    out.result()
  }

  /** service.name → job, service.instance.id → instance (the otlptranslator
    * convention); everything else is dropped from the series identity as
    * the translator does by default (promote-resource-attributes is off).
    */
  private def translateResource(attrs: Map[String, String]): Map[String, String] =
    attrs.get("service.name").map("job" -> _).toMap ++
      attrs.get("service.instance.id").map("instance" -> _).toMap

  private def sanitize(key: String): String =
    key.map(c => if (c.isLetterOrDigit || c == '_') c else '_')

  private def decodeMetric(b: Array[Byte], from: Int, to: Int,
      base: Map[String, String]): Seq[PromSeries] = {
    var name = ""
    val series = Seq.newBuilder[PromSeries]
    eachField(b, from, to) {
      case (1, f, t) => name = new String(b, f, t - f, "UTF-8")
      case (fld, f, t) if fld == 5 || fld == 7 => // Gauge | Sum data points
        eachField(b, f, t) {
          case (1, f2, t2) =>
            val (attrs, ts, v) = decodeDataPoint(b, f2, t2)
            series += PromSeries(
              base ++ attrs + ("__name__" -> sanitize(name)),
              Seq((ts, v)))
          case _ => ()
        }
      case _ => ()
    }
    series.result()
  }

  private def decodeDataPoint(b: Array[Byte], from: Int,
      to: Int): (Map[String, String], Long, Double) = {
    var attrs = Map.empty[String, String]
    var tsNano = 0L
    var v = 0.0
    var pos = from
    while (pos < to) {
      val (tag, p1) = varint(b, pos)
      ((tag >> 3).toInt, (tag & 7).toInt) match {
        case (3, 1) => tsNano = fixed64(b, p1); pos = p1 + 8
        case (4, 1) => // as_double
          v = java.lang.Double.longBitsToDouble(fixed64(b, p1)); pos = p1 + 8
        case (6, 1) => // as_int, sfixed64
          v = fixed64(b, p1).toDouble; pos = p1 + 8
        case (7, 2) =>
          val (len, p2) = varint(b, p1)
          val (k, value) = decodeKeyValue(b, p2, p2 + len.toInt)
          attrs += sanitize(k) -> value
          pos = p2 + len.toInt
        case (_, w) => pos = skip(b, p1, w)
      }
    }
    (attrs, tsNano / 1000000L, v)
  }

  private def decodeKeyValue(b: Array[Byte], from: Int,
      to: Int): (String, String) = {
    var key = ""
    var value = ""
    eachField(b, from, to) {
      case (1, f, t) => key = new String(b, f, t - f, "UTF-8")
      case (2, f, t) => // AnyValue: take any scalar variant as string
        var pos = f
        while (pos < t) {
          val (tag, p1) = varint(b, pos)
          ((tag >> 3).toInt, (tag & 7).toInt) match {
            case (1, 2) =>
              val (len, p2) = varint(b, p1)
              value = new String(b, p2, len.toInt, "UTF-8")
              pos = p2 + len.toInt
            case (2, 0) =>
              val (x, p2) = varint(b, p1)
              value = if (x != 0) "true" else "false"; pos = p2
            case (3, 0) =>
              val (x, p2) = varint(b, p1); value = x.toString; pos = p2
            case (4, 1) =>
              value = java.lang.Double.longBitsToDouble(fixed64(b, p1)).toString
              pos = p1 + 8
            case (_, w) => pos = skip(b, p1, w)
          }
        }
    }
    key -> value
  }

  /** Iterate length-delimited subfields, handing (field, from, to) spans;
    * scalar fields are passed with their value span too (varint: the span
    * is the encoded bytes; callers that need them decode directly).
    */
  private def eachField(b: Array[Byte], from: Int, to: Int)(
      f: PartialFunction[(Int, Int, Int), Unit]): Unit = {
    var pos = from
    while (pos < to) {
      val (tag, p1) = varint(b, pos)
      val field = (tag >> 3).toInt
      val wire = (tag & 7).toInt
      wire match {
        case 2 =>
          val (len, p2) = varint(b, p1)
          val span = (field, p2, p2 + len.toInt)
          if (f.isDefinedAt(span)) f(span)
          pos = p2 + len.toInt
        case _ => pos = skip(b, p1, wire)
      }
    }
  }




  // --- encoder (tests) ---

  final case class OtlpPoint(metric: String, attrs: Map[String, String],
      tsNano: Long, value: Double)

  def encodeExportRequest(serviceName: String, instance: String,
      points: Seq[OtlpPoint],
      resourceAttrs: Map[String, String] = Map.empty): Array[Byte] = {
    def kv(k: String, v: String): Array[Byte] = {
      val av = new java.io.ByteArrayOutputStream()
      writeLenDelim(av, 1, v.getBytes("UTF-8")) // string_value
      val out = new java.io.ByteArrayOutputStream()
      writeLenDelim(out, 1, k.getBytes("UTF-8"))
      writeLenDelim(out, 2, av.toByteArray)
      out.toByteArray
    }
    val metrics = points.groupBy(_.metric).toSeq.sortBy(_._1).map {
      case (name, pts) =>
        val gauge = new java.io.ByteArrayOutputStream()
        pts.foreach { pt =>
          val dp = new java.io.ByteArrayOutputStream()
          dp.write((3 << 3) | 1) // time_unix_nano fixed64
          writeFixed64(dp, pt.tsNano)
          dp.write((4 << 3) | 1) // as_double
          writeFixed64(dp, java.lang.Double.doubleToLongBits(pt.value))
          pt.attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
            writeLenDelim(dp, 7, kv(k, v))
          }
          writeLenDelim(gauge, 1, dp.toByteArray)
        }
        val metric = new java.io.ByteArrayOutputStream()
        writeLenDelim(metric, 1, name.getBytes("UTF-8"))
        writeLenDelim(metric, 5, gauge.toByteArray) // gauge
        metric.toByteArray
    }
    val scope = new java.io.ByteArrayOutputStream()
    metrics.foreach(m => writeLenDelim(scope, 2, m))
    val resource = new java.io.ByteArrayOutputStream()
    writeLenDelim(resource, 1, kv("service.name", serviceName))
    writeLenDelim(resource, 1, kv("service.instance.id", instance))
    resourceAttrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
      writeLenDelim(resource, 1, kv(k, v))
    }
    val rm = new java.io.ByteArrayOutputStream()
    writeLenDelim(rm, 1, resource.toByteArray)
    writeLenDelim(rm, 2, scope.toByteArray)
    val out = new java.io.ByteArrayOutputStream()
    writeLenDelim(out, 1, rm.toByteArray)
    out.toByteArray
  }



}
