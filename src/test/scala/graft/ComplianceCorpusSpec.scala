package graft

import org.apache.spark.sql.functions._

import graft.promql.{Compiler, EvalParams, PromSource}

/** The reference's de-facto query-capability definition is the official
  * promql-compliance corpus (SURVEY §5.3: 119 templates expanded by
  * variant_args). This spec feeds EVERY template — variants substituted
  * with representative values — through the parser AND the compiler
  * (compilation is action-free, so this runs no Spark jobs per query).
  * `should_fail` templates are asserted to be rejected where the failure
  * is syntactic; semantic validation failures (invalid label names) are
  * out of the parser's scope and skipped.
  */
class ComplianceCorpusSpec extends SparkSpec {

  private val CorpusPath =
    "/root/reference/tests/promql-compliance-test/promql-test-queries.yml"

  /** Representative substitutions for the tester's variant defaults. */
  private val Variants = Map(
    "range" -> "5m", "offset" -> "1m",
    "simpleAggrOp" -> "sum", "topBottomOp" -> "topk",
    "quantile" -> "0.9", "arithBinOp" -> "+", "compBinOp" -> "==",
    "binOp" -> "+", "simpleTimeAggrOp" -> "avg",
    "overTimeAggrOp" -> "avg_over_time",
    "extrapolatedRateFunc" -> "rate", "instantRateFunc" -> "irate",
    "clampFunc" -> "clamp_min", "dateFunc" -> "day_of_week",
    "simpleMathFunc" -> "abs",
    "smoothingFactor" -> "0.3", "trendFactor" -> "0.1")

  private def substitute(q: String): String =
    Variants.foldLeft(q) { case (acc, (k, v)) =>
      acc.replace(s"{{.$k}}", v)
    }

  private lazy val templates: Seq[(String, Boolean)] = {
    val lines = scala.io.Source.fromFile(CorpusPath).getLines().toSeq
    val out = Seq.newBuilder[(String, Boolean)]
    var pending: Option[String] = None
    lines.foreach { raw =>
      val line = raw.trim
      if (line.startsWith("- query:") || line.startsWith("query:")) {
        pending.foreach(q => out += ((q, false)))
        val q = line.dropWhile(_ != ':').drop(1).trim
          .stripPrefix("'").stripSuffix("'")
          .stripPrefix("\"").stripSuffix("\"")
        pending = Some(q)
      } else if (line.startsWith("should_fail: true")) {
        pending.foreach(q => out += ((q, true)))
        pending = None
      }
    }
    pending.foreach(q => out += ((q, false)))
    out.result()
  }

  // a source whose labels mirror the demo metrics' (instance, job, type, le)
  private lazy val src: PromSource = {
    import spark.implicits._
    val pts = Seq(
      ("i1", "demo", "free", "0.5", 1704067200000L, 1.0),
      ("i1", "demo", "free", "+Inf", 1704067200000L, 2.0),
      ("i2", "demo", "used", "+Inf", 1704067260000L, 3.0))
      .toDF("instance", "job", "type", "le", "ts_ms", "value")
    PromSource(pts, Seq("instance", "job", "type", "le"), {
      case "instance" => col("instance")
      case "job" => col("job")
      case "type" => col("type")
      case "le" => col("le")
      case "__name__" => lit("demo") // every demo_* metric resolves
      case other => lit(null).cast("string") // absent labels
    })
  }

  private val p = EvalParams(1704067200000L, 1704070800000L, 60000L)

  test("every corpus template parses and compiles (variants substituted)") {
    assume(new java.io.File(CorpusPath).exists())
    // should_fail templates fail in Prometheus at EVALUATION; here the
    // invalid-label-name and invalid-regex cases are rejected at COMPILE
    // (the select-all guard is a per-deployment policy, skipped).
    val compileRejected = (q: String) =>
      q.contains("~invalid") || q.contains("\"(.*\"")
    var parsed = 0
    var compiled = 0
    val failures = Seq.newBuilder[String]
    templates.foreach { case (tpl, shouldFail) =>
      val q = substitute(tpl)
      if (shouldFail && compileRejected(q)) {
        intercept[Exception](
          Compiler.compile(graft.promql.Parser.parse(q), src, p))
      } else if (!shouldFail) {
        try {
          val ast = graft.promql.Parser.parse(q)
          parsed += 1
          Compiler.compile(ast, src, p) // action-free
          compiled += 1
        } catch {
          case e: Exception => failures += s"$q -> ${e.getMessage}"
        }
      }
    }
    val fs = failures.result()
    assert(fs.isEmpty, s"corpus failures (${fs.size}):\n${fs.mkString("\n")}")
    assert(parsed >= 110, s"only $parsed templates parsed")
    assert(compiled == parsed,
      s"only $compiled of $parsed parsed templates compiled")
  }

  test("printer round-trip: parse(print(ast)) == ast over the corpus") {
    assume(new java.io.File(CorpusPath).exists())
    import graft.promql.{Parser, Printer}
    var checked = 0
    val failures = Seq.newBuilder[String]
    templates.foreach { case (tpl, shouldFail) =>
      if (!shouldFail) {
        val q = substitute(tpl)
        try {
          val ast = Parser.parse(q)
          val printed = Printer.print(ast)
          val reparsed = Parser.parse(printed)
          // NaN breaks Double-field case-class equality; a second print
          // is a faithful structural comparison (print is deterministic)
          if (reparsed != ast && Printer.print(reparsed) != printed)
            failures += s"$q\n  printed: $printed\n  got:     $reparsed\n  want:    $ast"
          else checked += 1
        } catch {
          case e: Exception =>
            failures += s"$q -> ${e.getClass.getSimpleName}: ${e.getMessage}"
        }
      }
    }
    val fs = failures.result()
    assert(fs.isEmpty, s"round-trip failures (${fs.size}):\n${fs.take(5).mkString("\n")}")
    assert(checked >= 110, s"only $checked templates round-tripped")
  }

  test("printer roundtrip: parse(print(parse(q))) == parse(q) over the corpus") {
    assume(new java.io.File(CorpusPath).exists())
    val bad = Seq.newBuilder[String]
    templates.foreach { case (tpl, shouldFail) =>
      if (!shouldFail) {
        val q = substitute(tpl)
        val ast = graft.promql.Parser.parse(q)
        val printed = graft.promql.Printer.print(ast)
        // print-normal-form fixpoint (AST == fails on NaN literals: Scala
        // Double equality), and the reprint must be identical text
        val re = scala.util.Try(graft.promql.Parser.parse(printed))
        if (re.isFailure || graft.promql.Printer.print(re.get) != printed)
          bad += s"$q  ->  $printed"
      }
    }
    val fs = bad.result()
    assert(fs.isEmpty, s"roundtrip failures (${fs.size}):\n${fs.mkString("\n")}")
  }
}
