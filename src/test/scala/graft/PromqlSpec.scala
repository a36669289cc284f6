package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.promql._
import graft.tsdb._

/** PromQL front-end: parser AST shapes, error positions, and compile
  * equivalence — every construct must produce the same rows as the
  * directly-built operator pipeline it lowers onto.
  */
class PromqlSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val pts = Tables.points(spark, sfDir)
    .groupBy("event_type", "ts_ms")
    .agg(max_by(col("value"), col("event_id")).as("value"))

  private lazy val src = PromSource(pts, Seq("event_type"), {
    case "__name__" => lit("events")
    case "event_type" => col("event_type")
  })

  private val Start = 1704067200000L
  private val End = 1706659200000L
  private val Hour = 3600000L
  private val p = EvalParams(Start, End, Hour)

  private def rows(df: DataFrame): Set[(String, Long, Double)] =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("parser: aggregation over rate over matcher selector") {
    val e = Parser.parse(
      """sum by (event_type) (rate(events{event_type=~"click|view"}[1h]))""")
    assert(e === Agg("sum", Seq("event_type"), without = false,
      FuncCall("rate", Selector(Some("events"),
        Seq(MatchRe("event_type", "click|view")), Some(3600000L), 0L))))
  }

  test("parser: offset, durations, binary modifiers") {
    val e = Parser.parse("""foo{a="1"} offset 90m / on(x) group_left bar""")
    assert(e === BinOp("/",
      Selector(Some("foo"), Seq(MatchEq("a", "1")), None, 5400000L),
      Selector(Some("bar"), Seq.empty, None, 0L),
      Seq("x"), Seq.empty, groupLeft = true))
    assert(Parser.parse("rate(m[1h30m])") ===
      FuncCall("rate", Selector(Some("m"), Seq.empty, Some(5400000L), 0L)))
  }

  test("parser: malformed input fails with position") {
    for (bad <- Seq("rate(m)", "sum by (", """m{a=}""", "1 + ", "m[5x]"))
      intercept[Exception](Parser.parse(bad))
  }

  test("compile: top-level subquery raises the typed range-vector error") {
    // Prometheus query_range: "invalid expression type range vector" — a
    // subquery is only valid as a range function's argument
    val e = intercept[IllegalArgumentException](
      Compiler.compile("events[10m:1m]", src, p))
    assert(e.getMessage.contains("range vector"))
  }

  test("compile: instant selector == instantBucketed") {
    val got = Compiler.compile("""events{event_type="click"}""", src, p)
    val want = RangeWindows.instantBucketed(
      pts.where(col("event_type") === "click"), Seq("event_type"),
      Start, End, Hour, p.lookbackMs)
    assert(rows(got) === rows(want))
    assert(got.count() > 0)
  }

  test("compile: rate == Rate.overSteps") {
    val got = Compiler.compile("rate(events[1h])", src, p)
    val want = Rate.overSteps(pts, Seq("event_type"), Start, End, Hour, Hour)
      .select(col("event_type"), col("eval_ms"), col("rate").as("value"))
    assert(rows(got) === rows(want))
  }

  test("compile: sum by == groupBy over the inner plan; scalar arithmetic") {
    val got = Compiler.compile(
      "sum by (event_type) (rate(events[1h])) * 60", src, p)
    val want = Rate.overSteps(pts, Seq("event_type"), Start, End, Hour, Hour)
      .groupBy("event_type", "eval_ms")
      .agg(sum(col("rate")).as("value"))
      .withColumn("value", col("value") * 60)
    assert(rows(got) === rows(want))
  }

  test("compile: vector/vector division joins on shared labels + step") {
    val got = Compiler.compile(
      """events{event_type="click"} / on(event_type) events{event_type="click"}""",
      src, p)
    // x / x == 1 everywhere the series exists
    val vals = got.select("value").distinct().collect().map(_.getDouble(0))
    assert(vals.toSeq === Seq(1.0))
  }

  test("compile: on(..., __name__) joins the metric name, drops it from output") {
    // a source whose metric name varies with the data: events_<type>
    val named = PromSource(pts, Seq("event_type"), {
      case "__name__" => concat(lit("events_"), col("event_type"))
      case "event_type" => col("event_type")
    })
    val got = Compiler.compile(
      """{__name__=~"events_.*"} * on(__name__)
         {__name__=~"events_.*", event_type!="signup"}""", named, p)
    // __name__ joined but never appears in the output schema
    assert(!got.columns.contains("__name__"))
    // rhs excludes signup-named series → no signup rows survive; matched
    // rows are value², so every surviving value is non-negative
    val perName = Compiler.compile(
      """{__name__=~"events_.*"}""", named, p)
    val signupRows = perName.where(col("event_type") === "signup").count()
    assert(signupRows > 0) // lhs HAS signup rows; the name join removed them
    assert(got.count() === perName.where(col("event_type") =!= "signup").count())
    assert(got.where(col("value") < 0).count() === 0)
    // without __name__ in on(): many series share the (empty) match group →
    // the one-side duplicate guard must fire
    val dup = Compiler.compile(
      """sum by () ({__name__=~"events_.*"}) * on()
         {__name__=~"events_.*"}""", named, p)
    // count() would prune the guarded value column — evaluate it
    val e = intercept[Exception](dup.select(sum(col("value"))).collect())
    assert(e.getMessage.contains("duplicate series")
      || Option(e.getCause).exists(_.getMessage.contains("duplicate series")))
  }

  test("compile: and on(__name__) set op matches on the materialized name") {
    val named = PromSource(pts, Seq("event_type"), {
      case "__name__" => concat(lit("events_"), col("event_type"))
      case "event_type" => col("event_type")
    })
    val got = Compiler.compile(
      """{__name__=~"events_.*"} and on(__name__)
         {__name__="events_click"}""", named, p)
    assert(!got.columns.contains("__name__"))
    val types = got.select("event_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types === Set("click"))
  }

  test("compile: topk keeps full labels; quantile groups") {
    val top = Compiler.compile(
      "topk(2, sum by (event_type) (rate(events[1h])))", src, p)
    // at most 2 rows per eval step (single grouping: all-to-one)
    val counts = top.groupBy("eval_ms").count()
      .select(max("count")).head().getLong(0)
    assert(counts <= 2L)
    val q = Compiler.compile(
      "quantile(0.5, events)", src, p)
    assert(q.columns.toSeq === Seq("eval_ms", "value"))
    assert(q.count() > 0)
  }

  test("parser: precedence of or < and < comparison < arithmetic") {
    val e = Parser.parse("a + b > c and d or f")
    // ((a+b) > c) and d, then or f
    assert(e === BinOp("or",
      BinOp("and",
        BinOp(">",
          BinOp("+", sel("a"), sel("b"), Nil, Nil, false),
          sel("c"), Nil, Nil, false),
        sel("d"), Nil, Nil, false),
      sel("f"), Nil, Nil, false))
  }

  private def sel(n: String) = Selector(Some(n), Seq.empty, None, 0L)

  test("compile: comparison filters; and/unless/or set semantics") {
    val gt = Compiler.compile("""events{event_type="click"} > 100""", src, p)
    assert(gt.where(col("value") <= 100).count() === 0L)
    assert(gt.count() > 0)

    val both = Compiler.compile(
      """events{event_type="click"} and events{event_type="click"}""", src, p)
    val clicks = Compiler.compile("""events{event_type="click"}""", src, p)
    assert(both.count() === clicks.count())

    val none = Compiler.compile(
      """events{event_type="click"} unless events{event_type="click"}""",
      src, p)
    assert(none.count() === 0L)

    val union = Compiler.compile(
      """events{event_type="click"} or events{event_type="view"}""", src, p)
    val views = Compiler.compile("""events{event_type="view"}""", src, p)
    assert(union.count() === clicks.count() + views.count())
  }

  test("compile: irate/idelta/resets and present_over_time") {
    val irate = Compiler.compile("irate(events[1h])", src, p)
    val want = graft.tsdb.Rate.instantOverSteps(pts, Seq("event_type"),
      Start, End, Hour, Hour)
      .select(col("event_type"), col("eval_ms"), col("irate").as("value"))
    assert(rows(irate) === rows(want))
    val present = Compiler.compile("present_over_time(events[1h])", src, p)
    assert(present.select("value").distinct().head().getDouble(0) === 1.0)
    val resets = Compiler.compile("resets(events[1h])", src, p)
    assert(resets.where(col("value") < 0).count() === 0L)
  }

  test("time() and vector() produce label-less step vectors") {
    val t = Compiler.compile("time()", src, p)
    assert(t.count() === (End - Start) / Hour + 1)
    val first = t.orderBy("eval_ms").head()
    assert(first.getDouble(t.columns.indexOf("value")) === Start / 1000.0)
    val v = Compiler.compile("vector(42)", src, p)
    assert(v.select("value").distinct().head().getDouble(0) === 42.0)
    // arithmetic against a label-less vector joins on eval_ms alone
    val ratio = Compiler.compile("vector(2) * vector(3)", src, p)
    assert(ratio.select("value").distinct().head().getDouble(0) === 6.0)
  }

  test("parametric math: clamp family and round-to-multiple") {
    val c = Compiler.compile("clamp(events, 10, 100)", src, p)
    val mm = c.agg(min("value"), max("value")).head()
    assert(mm.getDouble(0) >= 10.0 && mm.getDouble(1) <= 100.0)
    val r = Compiler.compile("round(events, 5)", src, p)
    val off = r.where(expr("value % 5 != 0")).count()
    assert(off === 0L)
    assert(Compiler.compile("clamp_min(events, 50)", src, p)
      .where(col("value") < 50).count() === 0L)
  }

  test("label_replace / label_join derive label columns in the compiler") {
    val lr = Compiler.compile(
      """label_replace(events, "class", "$1_x", "event_type", "(cl|vi).*")""",
      src, p)
    assert(lr.columns.contains("class"))
    val classes = lr.select("event_type", "class").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(classes("click") === "cl_x" && classes("view") === "vi_x")
    assert(classes("purchase") === "") // no match → dst (missing) kept
    val lj = Compiler.compile(
      """label_join(events, "key", "|", "event_type", "event_type")""",
      src, p)
    assert(lj.select("key").distinct().collect().map(_.getString(0)).toSet
      .contains("click|click"))
    // aggregating by the derived label works
    val agg = Compiler.compile(
      """sum by (class) (label_replace(events, "class", "$1_x",
         "event_type", "(cl|vi).*"))""", src, p)
    assert(agg.columns.toSeq === Seq("class", "eval_ms", "value"))
    assert(agg.count() > 0)
  }

  test("bool modifier projects 1/0 instead of filtering; group returns 1") {
    val filt = Compiler.compile("""events{event_type="click"} > 100""", src, p)
    val boolQ = Compiler.compile(
      """events{event_type="click"} > bool 100""", src, p)
    val all = Compiler.compile("""events{event_type="click"}""", src, p)
    assert(boolQ.count() === all.count()) // no filtering
    assert(boolQ.where(col("value") === 1.0).count() === filt.count())
    assert(boolQ.select("value").distinct().collect()
      .map(_.getDouble(0)).toSet.subsetOf(Set(0.0, 1.0)))
    val grp = Compiler.compile("group by (event_type) (events)", src, p)
    assert(grp.select("value").distinct().head().getDouble(0) === 1.0)
  }

  test("@ modifier pins evaluation to a fixed time across all steps") {
    // 1704672000s = 2024-01-08; day-long lookback guarantees samples at
    // this scale factor
    val pDay = EvalParams(Start, End, Hour, lookbackMs = 86400000L)
    val at = Compiler.compile("""events{event_type="click"} @ 1704672000""",
      src, pDay)
    val perStep = at.groupBy("eval_ms").count()
    // same series count at every step, and one distinct value per series
    assert(perStep.select(countDistinct(col("count"))).head().getLong(0) === 1L)
    val fixed = Compiler.compile("""events{event_type="click"}""",
      src, EvalParams(1704672000000L, 1704672000000L, Hour,
        lookbackMs = 86400000L))
    val atVals = at.select("event_type", "value").distinct().collect().toSet
    val fixedVals = fixed.select("event_type", "value").collect().toSet
    assert(atVals === fixedVals)
    assert(at.count() === fixed.count() * ((End - Start) / Hour + 1))
  }

  test("subquery: parse and compile expr[range:step]") {
    assert(Parser.parse("max_over_time(rate(m[1h])[6h:1h])") ===
      FuncCall("max_over_time",
        Subquery(FuncCall("rate",
          Selector(Some("m"), Seq.empty, Some(3600000L), 0L)),
          21600000L, 3600000L)))
    // compiled == inner rate on the extended grid re-fed through the
    // outer range aggregation
    val got = Compiler.compile("max_over_time(rate(events[1h])[6h:1h])",
      src, EvalParams(Start, End, 6 * Hour))
    val innerRates = graft.tsdb.Rate.overSteps(pts, Seq("event_type"),
        Start - 6 * Hour, End, Hour, Hour)
      .select(col("event_type"), col("eval_ms").as("ts2"),
        col("rate").as("value"))
    val want = RangeWindows.rangeBucketed(innerRates, Seq("event_type"),
      Start, End, 6 * Hour, 6 * Hour,
      Seq("value" -> (v => max(v))), tsMs = "ts2")
    assert(rows(got) === rows(want))
    // aggregated inner: labels narrow to the aggregation's label set
    val agg = Compiler.compile(
      "max_over_time(sum by (event_type) (events)[6h:1h])",
      src, EvalParams(Start, End, 6 * Hour))
    assert(agg.columns.toSeq === Seq("event_type", "eval_ms", "value"))
    assert(agg.count() > 0)
  }

  test("absent(): labels derive from equality matchers (createLabelsForAbsentFunction)") {
    // single equality matcher on a never-present value → full grid with
    // the matcher's label/value
    val a1 = Compiler.compile("""absent(events{event_type="nosuch"})""",
      src, p)
    assert(a1.columns.toSeq === Seq("eval_ms", "value", "event_type"))
    val steps = (End - Start) / Hour + 1
    assert(a1.count() === steps)
    assert(a1.select("event_type").distinct().head().getString(0) === "nosuch")
    // conflicting equalities on the same label → the label is dropped
    val a2 = Compiler.compile(
      """absent(events{event_type="a", event_type="b"})""", src, p)
    assert(!a2.columns.contains("event_type"))
    assert(a2.count() === steps)
    // regex matchers never contribute
    val a3 = Compiler.compile("""absent(events{event_type=~"nosuch.*"})""",
      src, p)
    assert(!a3.columns.contains("event_type"))
    // equality then regex on the same label → dropped too
    val a4 = Compiler.compile(
      """absent(events{event_type="x", event_type=~".*y"})""", src, p)
    assert(!a4.columns.contains("event_type"))
    // absent_over_time: same derivation from the range selector
    val a5 = Compiler.compile(
      """absent_over_time(events{event_type="nosuch"}[1h])""", src, p)
    assert(a5.columns.contains("event_type"))
    assert(a5.select("event_type").distinct().head().getString(0) === "nosuch")
    // non-selector argument → no labels (matches Prometheus)
    val a6 = Compiler.compile(
      """absent(sum(events{event_type="nosuch"}))""", src, p)
    assert(a6.columns.toSeq === Seq("eval_ms", "value"))
  }

  test("holt_winters golden cases and compiler wiring") {
    import graft.tsdb.{HoltWintersAgg, TsSample}
    val agg = new HoltWintersAgg(0.5, 0.5)
    def run(vs: Seq[Double]): Option[Double] =
      agg.finish(vs.zipWithIndex.map { case (v, i) =>
        TsSample(i.toLong, v) }.toList)
    // s0=10,b=10 → i1: s=20,b=10 → i2: s=30 (linear trend tracked exactly)
    assert(run(Seq(10.0, 20.0, 30.0)) === Some(30.0))
    // v=[10,20,10]: i1: s=20,b=10; i2: s=0.5*10+0.5*30=20, b=0.5*0+0.5*10=5
    assert(run(Seq(10.0, 20.0, 10.0)) === Some(20.0))
    assert(run(Seq(42.0)) === None)
    // order independence of the buffer (merge is concatenation)
    val shuffled = List(TsSample(2L, 30.0), TsSample(0L, 10.0), TsSample(1L, 20.0))
    assert(agg.finish(shuffled) === Some(30.0))
    // compiler wiring parses params and produces rows
    val df = Compiler.compile(
      "holt_winters(events[1h], 0.3, 0.1)", src, p)
    assert(df.count() > 0)
    val pl = Compiler.compile("predict_linear(events[1h], 1800)", src, p)
    assert(pl.count() > 0)
  }

  test("compile: math functions and absent()") {
    val lnQ = Compiler.compile("ln(events + 1)", src, p)
    val base = Compiler.compile("events + 1", src, p)
    assert(lnQ.count() === base.count())
    val one = lnQ.join(base.withColumnRenamed("value", "raw"),
      Seq("event_type", "eval_ms"))
      .where(col("value") =!= log(col("raw"))).count()
    assert(one === 0L)
    // a matcher that hits nothing → absent == every step
    val ab = Compiler.compile("""absent(events{event_type="nope"})""", src, p)
    assert(ab.count() === (End - Start) / Hour + 1)
    assert(ab.select("value").distinct().head().getDouble(0) === 1.0)
    // a matcher that hits everything → absent is empty... except steps
    // with no click sample in the lookback window
    val abClick = Compiler.compile("""absent(events{event_type="click"})""", src, p)
    val clickSteps = Compiler.compile("""events{event_type="click"}""", src, p)
      .select("eval_ms").distinct().count()
    assert(abClick.count() === (End - Start) / Hour + 1 - clickSteps)
  }

  test("parser: topk/quantile parameter syntax") {
    assert(Parser.parse("topk(3, m)") ===
      Agg("topk", Seq.empty, without = false,
        Selector(Some("m"), Seq.empty, None, 0L), Some(3.0)))
  }

  test("parser: keyword boundary — on/ignoring/group_left as RHS prefixes") {
    // ADVICE r2: `a + online_users` must not have `on` eaten as a modifier
    assert(Parser.parse("a + online_users") ===
      BinOp("+", sel("a"), sel("online_users"), Nil, Nil, false))
    assert(Parser.parse("x / ignoring_errors_total") ===
      BinOp("/", sel("x"), sel("ignoring_errors_total"), Nil, Nil, false))
    assert(Parser.parse("a * group_left_total") ===
      BinOp("*", sel("a"), sel("group_left_total"), Nil, Nil, false))
    val e = Parser.parse("a / on(x) group_left(j) b")
    assert(e === BinOp("/", sel("a"), sel("b"), Seq("x"), Nil,
      groupLeft = true, boolMode = false, groupRight = false,
      groupLabels = Seq("j")))
    assert(Parser.parse("a / on(x) group_right b") ===
      BinOp("/", sel("a"), sel("b"), Seq("x"), Nil, false, false, true, Nil))
  }

  test("parser: % ^ unary minus precedence and Inf/NaN/hex literals") {
    // 1 * 2 + 4 / 6 - 10 % 2 ^ 2  (compliance corpus yml:104)
    val e = Parser.parse("1 * 2 + 4 / 6 - 10 % 2 ^ 2")
    val v = Compiler.compile(e, src, p).head().getDouble(0)
    assert(v === (1.0 * 2 + 4.0 / 6 - 10 % math.pow(2, 2)))
    assert(Compiler.compile("2 ^ 3 ^ 2", src, p).head().getDouble(0)
      === math.pow(2, 9)) // right-assoc
    assert(Compiler.compile("-2 ^ 2", src, p).head().getDouble(0)
      === -4.0) // unary binds looser than ^
    assert(Compiler.compile("Inf", src, p).head().getDouble(0)
      === Double.PositiveInfinity)
    assert(Compiler.compile("-Inf", src, p).head().getDouble(0)
      === Double.NegativeInfinity)
    assert(Compiler.compile("NaN", src, p).head().getDouble(0).isNaN)
    assert(Compiler.compile("0x1f + 1", src, p).head().getDouble(0) === 32.0)
    // unary minus over a vector negates values
    val neg = Compiler.compile("""-events{event_type="click"}""", src, p)
    assert(neg.where(col("value") > 0).count() === 0L)
  }

  test("compile: bottomk, stddev/stdvar, count_values") {
    // day-long lookback so every hourly step sees all event types
    val p = EvalParams(Start, End, Hour, lookbackMs = 86400000L)
    val bot = Compiler.compile(
      "bottomk(2, sum by (event_type) (events))", src, p)
    val top = Compiler.compile(
      "topk(2, sum by (event_type) (events))", src, p)
    // per step with ≥ 2k series, bottomk's values sit below topk's
    val n = Compiler.compile("sum by (event_type) (events)", src, p)
      .groupBy("eval_ms").count()
    val joined = bot.groupBy("eval_ms").agg(max("value").as("bmax"))
      .join(top.groupBy("eval_ms").agg(min("value").as("tmin")), "eval_ms")
      .join(n, "eval_ms").where(col("count") >= 4)
    assert(joined.count() > 0)
    assert(joined.where(col("bmax") > col("tmin")).count() === 0L)

    val sd = Compiler.compile("stddev by (event_type) (events)", src, p)
    val sv = Compiler.compile("stdvar by (event_type) (events)", src, p)
    val chk = sd.withColumnRenamed("value", "sd")
      .join(sv.withColumnRenamed("value", "sv"), Seq("event_type", "eval_ms"))
      .where(abs(col("sd") * col("sd") - col("sv")) >
        greatest(abs(col("sv")) * 1e-9, lit(1e-9)))
    assert(chk.count() === 0L)

    val cv = Compiler.compile("""count_values("v", floor(events / 100))""",
      src, p)
    assert(cv.columns.contains("v"))
    assert(cv.agg(sum("value")).head().getDouble(0) ===
      Compiler.compile("events", src, p).count().toDouble)
  }

  test("compile: timestamp/changes/quantile_over_time/sort") {
    val ts = Compiler.compile("""timestamp(events{event_type="click"})""",
      src, p)
    // sample timestamps are at or before the eval step, within lookback
    val bad = ts.where(col("value") * 1000 > col("eval_ms") ||
      col("value") * 1000 <= col("eval_ms") - p.lookbackMs).count()
    assert(bad === 0L && ts.count() > 0)

    val ch = Compiler.compile("changes(events[6h])", src, p)
    assert(ch.where(col("value") < 0).count() === 0L)
    // changes <= samples-1 in the window
    val cnt = Compiler.compile("count_over_time(events[6h])", src, p)
      .withColumnRenamed("value", "n")
    assert(ch.join(cnt, Seq("event_type", "eval_ms"))
      .where(col("value") > col("n") - 1).count() === 0L)

    val q0 = Compiler.compile("quantile_over_time(0, events[6h])", src, p)
    val mn = Compiler.compile("min_over_time(events[6h])", src, p)
      .withColumnRenamed("value", "mn")
    assert(q0.join(mn, Seq("event_type", "eval_ms"))
      .where(col("value") =!= col("mn")).count() === 0L)

    val sorted = Compiler.compile(
      "sort_desc(sum by (event_type) (events))", src, p)
    assert(sorted.count() > 0)
  }

  test("compile: group_left carries extra labels; guard rejects dup groups") {
    val srcSeries = PromSource(
      Tables.points(spark, sfDir)
        .groupBy("user_id", "event_type", "ts_ms")
        .agg(max_by(col("value"), col("event_id")).as("value")),
      Seq("user_id", "event_type"), {
        case "__name__" => lit("events")
        case "event_type" => col("event_type")
        case "user_id" => col("user_id").cast("string")
      })
    val pDay = EvalParams(Start, End, 86400000L, lookbackMs = Hour)
    val gl = Compiler.compile(
      """sum by (user_id) (events) * on(user_id) group_left(event_type)
         max by (user_id, event_type) (events{event_type="signup"})""",
      srcSeries, pDay)
    assert(gl.columns.toSeq === Seq("user_id", "event_type", "eval_ms", "value"))
    assert(gl.select("event_type").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("signup"))
    // many-per-group one side → raise_error surfaces as SparkException
    val bad = Compiler.compile(
      """sum by (user_id) (events) * on(user_id)
         max by (user_id, event_type) (events)""", srcSeries, pDay)
    intercept[Exception](bad.collect())
  }

  test("compile: or merges differing label sets; scalar() NaN semantics") {
    val srcSeries = PromSource(
      Tables.points(spark, sfDir)
        .groupBy("user_id", "event_type", "ts_ms")
        .agg(max_by(col("value"), col("event_id")).as("value")),
      Seq("user_id", "event_type"), {
        case "__name__" => lit("events")
        case "event_type" => col("event_type")
        case "user_id" => col("user_id").cast("string")
      })
    val pDay = EvalParams(Start, End, 86400000L, lookbackMs = Hour)
    val u = Compiler.compile(
      """sum by (user_id) (events{event_type="click"})
         or on(user_id) sum by (user_id, event_type)
           (events{event_type="purchase"})""", srcSeries, pDay)
    // union schema: event_type padded with "" on the left side's rows
    assert(u.columns.toSet === Set("user_id", "event_type", "eval_ms", "value"))
    assert(u.where(col("event_type") === "").count() > 0)

    // scalar() is NaN exactly where the vector has ≠ 1 series at the step
    val sc = Compiler.compile("scalar(events)", src, p)
    val perStep = Compiler.compile("events", src, p)
      .groupBy("eval_ms").count()
    val cross = sc.join(perStep, Seq("eval_ms"), "left")
      .withColumn("n", coalesce(col("count"), lit(0L)))
    assert(cross.where(isnan(col("value")) =!= (col("n") =!= 1)).count() === 0L)
    assert(sc.count() === (End - Start) / Hour + 1) // every step present
    val one = Compiler.compile("scalar(sum(events))", src, p)
    // no labels on a scalar result
    assert(one.columns.toSeq === Seq("eval_ms", "value"))
  }

  test("compile: histogram_quantile over le-labelled buckets") {
    import spark.implicits._
    // two series (job a/b) with classic cumulative buckets at one ts
    val t0 = Start + Hour
    val rows = Seq(
      ("a", "0.1", 10.0), ("a", "0.5", 50.0), ("a", "1", 90.0),
      ("a", "+Inf", 100.0),
      ("b", "0.1", 0.0), ("b", "0.5", 10.0), ("b", "1", 10.0),
      ("b", "+Inf", 10.0))
      .map { case (j, le, v) => (j, le, t0, v) }
      .toDF("job", "le", "ts_ms", "value")
    val hsrc = PromSource(rows, Seq("job", "le"), {
      case "__name__" => lit("m")
      case "job" => col("job")
      case "le" => col("le")
    })
    val hp = EvalParams(t0, t0, Hour)
    val got = Compiler.compile("histogram_quantile(0.9, m)", hsrc, hp)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // series a: rank=90 → falls exactly at bucket le=1 upper edge:
    // lower bucket (0.5, 50) → 0.5 + (1-0.5)*(90-50)/(90-50) = 1.0
    assert(math.abs(got("a") - 1.0) < 1e-12)
    // series b: rank=9 → inside (0.1, 0.5]: 0.1 + 0.4*(9-0)/(10-0)
    assert(math.abs(got("b") - (0.1 + 0.4 * 0.9)) < 1e-12)
    // φ=1 returns the highest finite bucket for a
    val p100 = Compiler.compile("histogram_quantile(1, m)", hsrc, hp)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(p100("a") === 1.0)
  }

  test("parser: .123 / 1.23e-3 literals, negative offset, subquery offset") {
    assert(Compiler.compile(".123", src, p).head().getDouble(0) === 0.123)
    assert(Compiler.compile("1.23e-3", src, p).head().getDouble(0) === 1.23e-3)
    assert(Parser.parse("m offset -5m") ===
      Selector(Some("m"), Seq.empty, None, -300000L))
    assert(Parser.parse("max_over_time(x[5m:10s] offset 5m)") ===
      FuncCall("max_over_time",
        Subquery(sel("x"), 300000L, 10000L, 300000L)))
    // negative offset shifts samples earlier; compiled plan produces rows
    val neg = Compiler.compile("""events{event_type="click"} offset -1h""",
      src, p)
    assert(neg.count() > 0)
    // corpus shape: subquery with offset over a scalar-vector comparison
    val sq = Compiler.compile(
      "max_over_time((time() - sum(events) < 100000000)[6h:1h] offset 6h)",
      src, EvalParams(Start, End, 6 * Hour))
    assert(sq.columns.toSeq === Seq("eval_ms", "value"))
  }

  test("compile: date functions over epoch-second values and time()") {
    // year() == year at every eval step (events span Jan 2024)
    val y = Compiler.compile("year()", src, p)
    assert(y.select("value").distinct().collect()
      .map(_.getDouble(0)).toSet === Set(2024.0))
    val dim = Compiler.compile("days_in_month()", src, p)
    assert(dim.select("value").distinct().collect()
      .map(_.getDouble(0)).toSet === Set(31.0))
    // day_of_week: 2024-01-01 was a Monday → 1 (0 = Sunday)
    val dow = Compiler.compile("day_of_week()", src,
      EvalParams(Start, Start, Hour))
    assert(dow.head().getDouble(1) === 1.0)
    // over a vector: timestamp(events) gives sample ts in seconds; its
    // month must be January
    val m = Compiler.compile("month(timestamp(events))", src, p)
    assert(m.select("value").distinct().collect()
      .map(_.getDouble(0)).toSet === Set(1.0))
  }

  test("@ start() / end() pin evaluation to the query range bounds") {
    val pDay = EvalParams(Start, End, Hour, lookbackMs = 86400000L)
    assert(Parser.parse("m @ start()") ===
      Selector(Some("m"), Seq.empty, None, 0L,
        Some(graft.promql.Selector.AtStart)))
    val atStart = Compiler.compile("""events{event_type="click"} @ start()""",
      src, pDay)
    val explicit = Compiler.compile(
      s"""events{event_type="click"} @ ${Start / 1000}""", src, pDay)
    assert(atStart.collect().toSet === explicit.collect().toSet)
    val atEnd = Compiler.compile("""events{event_type="click"} @ end()""",
      src, pDay)
    assert(atEnd.count() > 0)
  }

  test("W4: staleness markers suppress series in instant and range vectors") {
    import spark.implicits._
    import graft.functions.Bits
    // series a: real sample then a NEWER stale marker — the marker wins
    // the lookback choice and the series must be ABSENT at steps where it
    // is newest (not fall back to ts=1000); series b stays live
    val t0 = Start
    val rows = Seq(
      ("a", t0 - 3000L, 5.0), ("b", t0 - 3000L, 7.0),
      ("b", t0 + 3600000L, 8.0))
      .toDF("s", "ts_ms", "value")
      .unionByName(Seq(("a", t0 - 2000L))
        .toDF("s", "ts_ms")
        .withColumn("value", Bits.staleNaN))
    val ssrc = PromSource(rows, Seq("s"), {
      case "__name__" => lit("m"); case "s" => col("s")
    })
    val sp = EvalParams(t0, t0 + 3600000L, 3600000L, lookbackMs = 7200000L)
    val inst = Compiler.compile("m", ssrc, sp)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // a is absent everywhere (marker is its newest sample in every window)
    assert(inst === Set(("b", t0), ("b", t0 + 3600000L)))
    // range vectors never contain markers: count_over_time sees only the
    // real sample for a
    val cnt = Compiler.compile("count_over_time(m[2h])", ssrc, sp)
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    assert(cnt(("a", t0 + 3600000L)) === 1.0)
    // timestamp(selector) obeys the same choose-then-drop: a winning
    // marker suppresses the series instead of leaking its timestamp
    // (ADVICE r3)
    val ts = Compiler.compile("timestamp(m)", ssrc, sp)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ts === Set(("b", t0), ("b", t0 + 3600000L)))
  }

  test("compile: trig/atan2/absent_over_time") {
    // identity: rad(deg(x)) == x up to fp; sin²+cos² == 1
    val one = Compiler.compile(
      "sin(events) ^ 2 + cos(events) ^ 2", src, p)
    assert(one.where(abs(col("value") - 1.0) > 1e-9).count() === 0L)
    assert(Compiler.compile("(1 atan2 1) * 4", src, p).head().getDouble(0)
      === math.Pi)
    // absent_over_time: 1 exactly at steps with no sample in the window
    val ab = Compiler.compile(
      """absent_over_time(events{event_type="nope"}[1h])""", src, p)
    assert(ab.count() === (End - Start) / Hour + 1)
    val abSome = Compiler.compile(
      """absent_over_time(events{event_type="click"}[1h])""", src, p)
    val present = Compiler.compile(
      "count_over_time(events{event_type=\"click\"}[1h])", src, p)
      .select("eval_ms").distinct().count()
    assert(abSome.count() === (End - Start) / Hour + 1 - present)
  }

  test("parser: duration expressions in bracketed positions") {
    def rng(q: String): Long =
      Parser.parse(q).asInstanceOf[FuncCall].arg match {
        case s: Selector => s.rangeMs.get
        case sub: Subquery => sub.rangeMs
        case other => fail(s"unexpected $other")
      }
    assert(rng("rate(m[2 * 30m])") === 3600000L)
    assert(rng("rate(m[(2 + 3) * 1m])") === 300000L)
    assert(rng("rate(m[1h - 30m])") === 1800000L)
    assert(rng("rate(m[60])") === 60000L) // bare number = seconds
    assert(rng("rate(m[2^3 * 1s])") === 8000L)
    assert(rng("rate(m[1h30m])") === 5400000L) // classic concatenation
    // subqueries take expressions on both sides of ':'
    assert(Parser.parse("rate(m[2*1h:3*10s])") ===
      Parser.parse("rate(m[2h:30s])"))
    // non-positive results are rejected
    intercept[Exception](Parser.parse("rate(m[1m - 1m])"))
    // an offset keeps the literal grammar: + binds as a vector binop
    assert(Parser.parse("m offset 1h + n") ===
      BinOp("+", Selector(Some("m"), Seq.empty, None, 3600000L),
        Selector(Some("n"), Seq.empty, None, 0L),
        Seq.empty, Seq.empty, groupLeft = false))
  }

  test("printer round-trips the 3.x additions") {
    for (q <- Seq(
      "limitk(2, max by (event_type) (events))",
      "limit_ratio(-0.7, events)",
      """sort_by_label_desc(events, "event_type", "user_id")""",
      "mad_over_time(events[5m])",
      "ts_of_max_over_time(events[1h])",
      "ts_of_min_over_time(events[1h])",
      "ts_of_last_over_time(events[1h])",
      "double_exponential_smoothing(events[10m], 0.3, 0.1)",
      "asinh(events) + acosh(events) - atanh(events)"))
      assert(Parser.parse(Printer.print(Parser.parse(q))) ===
        Parser.parse(q), q)
  }

  test("info(): identity join decorates, missing info passes through, " +
    "multiple matches raise") {
    val spark0 = spark
    import spark0.implicits._
    val t0 = Start + Hour
    def mk(rows: Seq[(String, String, String, String, Long, Double)]) = {
      val pts = rows.toDF("__mname", "job", "instance", "dc", "ts_ms",
        "value")
      PromSource(pts, Seq("job", "instance", "dc"), {
        case "__name__" => col("__mname")
        case other => col(other)
      })
    }
    val s2 = mk(Seq(
      ("m", "api", "i1", null, t0, 1.0),
      ("m", "api", "i2", null, t0, 2.0),
      ("target_info", "api", "i1", "west", t0, 1.0)))
    val pp = EvalParams(t0, t0, Hour)
    val got = Compiler.compile("info(m)", s2, pp)
      .select("job", "instance", "dc", "value").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2)),
        r.getDouble(3))).toSet
    assert(got === Set(("api", "i1", Some("west"), 1.0),
      ("api", "i2", None, 2.0)))
    // the explicit selector restricts matching AND the copied labels
    val none = Compiler.compile("""info(m, {dc="east"})""", s2, pp)
      .where(col("dc").isNotNull).count()
    assert(none === 0L)
    // parse-time data names survive printing
    val q = """info(m, {dc=~".+"})"""
    assert(Parser.parse(Printer.print(Parser.parse(q))) === Parser.parse(q))
    // two info series sharing (job, instance) at a step → loud error
    val dup = mk(Seq(
      ("m", "api", "i1", null, t0, 1.0),
      ("target_info", "api", "i1", "west", t0, 1.0),
      ("target_info", "api", "i1", "east", t0, 1.0)))
    val e = intercept[Exception](
      Compiler.compile("info(m)", dup, pp).collect())
    assert(e.getMessage != null)
  }

  test("mad_over_time's array quantile matches percentile to the ulp " +
    "on random windows") {
    // the two interpolation forms — Prometheus' lo + (hi−lo)·f (the
    // array quantile) vs Spark percentile's lo·(1−f) + hi·f — are
    // algebraically equal but round differently in the LAST ulp, which
    // is why mad ships grid-rounded; fuzz that the divergence really is
    // ulp-scale and never structural (wrong bucket / wrong rank)
    val rnd = new scala.util.Random(20260815L)
    val rows = (1 to 60).flatMap { g =>
      val n = 1 + rnd.nextInt(9)
      (0 until n).map(_ => (g, (rnd.nextDouble() - 0.5) *
        math.pow(10, rnd.nextInt(7) - 3)))
    }
    val df = rows.toDF("g", "v").repartition(7)
    val got = df.groupBy("g")
      .agg(expr("percentile(v, 0.5)").as("p"),
        sort_array(collect_list(col("v"))).as("arr"))
      .withColumn("aq",
        element_at(col("arr"),
          (floor(lit(0.5) * (size(col("arr")) - 1)).cast("int") + 1)) +
        (element_at(col("arr"), least(
            floor(lit(0.5) * (size(col("arr")) - 1)).cast("int") + lit(1),
            size(col("arr")) - 1) + 1) -
          element_at(col("arr"),
            floor(lit(0.5) * (size(col("arr")) - 1)).cast("int") + 1)) *
        (lit(0.5) * (size(col("arr")) - 1).cast("double") -
          floor(lit(0.5) * (size(col("arr")) - 1))))
      .where(abs(col("p") - col("aq")) >
        lit(1e-12) * greatest(abs(col("p")), lit(1.0)))
    assert(got.count() === 0L)
    // and the operator built on it agrees with a two-pass reference
    val med = Compiler.compile("mad_over_time(events[6h])", src, p)
    assert(med.where(col("value") < 0).count() === 0L) // MAD is ≥ 0
  }

  test("compile: double_exponential_smoothing is holt_winters") {
    val hw = Compiler.compile("holt_winters(events[6h], 0.4, 0.2)", src, p)
    val de = Compiler.compile(
      "double_exponential_smoothing(events[6h], 0.4, 0.2)", src, p)
    assert(rows(hw) === rows(de))
  }

  test("compile: limitk / limit_ratio determinism and complementarity") {
    val all = rows(Compiler.compile("max by (event_type) (events)", src, p))
    val keep = rows(Compiler.compile(
      "limit_ratio(0.3, max by (event_type) (events))", src, p))
    val comp = rows(Compiler.compile(
      "limit_ratio(-0.7, max by (event_type) (events))", src, p))
    // the two hash slices partition the vector exactly
    assert((keep ++ comp) === all)
    assert(keep.intersect(comp) === Set.empty)
    // a series is in or out as a whole (per-series hash, not per-sample)
    val keepTypes = keep.map(_._1)
    assert(keep === all.filter(r => keepTypes(r._1)))
    // limitk: k series per step, stable across repeated evaluation
    val k1 = rows(Compiler.compile(
      "limitk(2, max by (event_type) (events))", src, p))
    assert(k1 === rows(Compiler.compile(
      "limitk(2, max by (event_type) (events))", src, p)))
    // k per step, capped by how many series are live at that step
    val liveByStep = all.groupBy(_._2).view.mapValues(_.size).toMap
    assert(k1.groupBy(_._2).forall { case (step, picked) =>
      picked.size == math.min(2, liveByStep(step)) })
    assert(k1.subsetOf(all))
    // k beyond the series count degrades to the identity
    assert(rows(Compiler.compile(
      "limitk(99, max by (event_type) (events))", src, p)) === all)
  }

  test("sort_by_label orders serialization only") {
    val pp = EvalParams(End, End, Hour, lookbackMs = Hour) // single instant
    val df = Compiler.compile(
      """sort_by_label_desc(max by (event_type) (events), "event_type")""",
      src, pp)
    // the compiled PLAN is presentation-unordered (same set as unsorted)
    assert(rows(df) === rows(Compiler.compile(
      "max by (event_type) (events)", src, pp)))
    val json = graft.api.PromJson.vector(df, Seq("event_type"),
      Some(graft.api.PromJson.ByLabels(Seq("event_type"), desc = true)))
    val order = """"event_type":"([a-z_]+)"""".r
      .findAllMatchIn(json).map(_.group(1)).toSeq
    assert(order === order.sorted.reverse && order.nonEmpty)
  }

  test("compile: inverse hyperbolics and pi()") {
    // pi() is a scalar constant; deg(pi()) folds to 180
    assert(Compiler.compile("deg(pi())", src, p).head().getDouble(0)
      === 180.0)
    // column path: atanh(tanh(x)) == x up to fp on real data
    val rt = Compiler.compile("atanh(tanh(events / 1000))", src, p)
      .join(Compiler.compile("events / 1000", src, p)
          .withColumnRenamed("value", "want"),
        Seq("eval_ms", "event_type"))
    assert(rt.where(abs(col("value") - col("want")) > 1e-9).count() === 0L)
    // const-fold path agrees with the column identities
    assert(Compiler.compile("asinh(0)", src, p).head().getDouble(0) === 0.0)
    assert(Compiler.compile("acosh(1)", src, p).head().getDouble(0) === 0.0)
    assert(math.abs(Compiler.compile("atanh(0.5)", src, p).head().getDouble(0)
      - 0.5 * math.log(3.0)) < 1e-15)
  }

  test("compile: count_over_time and offset shift") {
    val got = Compiler.compile("count_over_time(events[1d] offset 1d)", src, p)
    val want = RangeWindows.rangeBucketed(
      pts.withColumn("ts_ms", col("ts_ms") + 86400000L), Seq("event_type"),
      Start, End, Hour, 86400000L,
      Seq("value" -> (c => count(c).cast("double"))))
    assert(rows(got) === rows(want))
  }

  // ---- deterministic sum at large magnitudes (r15 ADVICE regression) ----

  /** A tiny multi-series source whose values land in the regime the r14
    * sumDet silently corrupted: Spark's `floor(double)` is LongType, so
    * `floor(v * 2^49)` saturates at Long.MaxValue once |v| >= 2^14.
    */
  private def bigSrc(values: Seq[Double]): PromSource = {
    val df = values.zipWithIndex
      .map { case (v, i) => (s"u$i", Start, v) }
      .toDF("u", "ts_ms", "value")
    PromSource(df, Seq("u"), {
      case "__name__" => lit("m")
      case "u" => col("u")
    })
  }

  // exact floor(v * 2^49) over the binary value of v (NOT its shortest
  // decimal string — java.math.BigDecimal(double) is the exact ctor),
  // mirroring the DuckDB oracle's HUGEINT arithmetic
  private def gridExact(v: Double): BigInt =
    BigDecimal(new java.math.BigDecimal(v))
      .*(BigDecimal(BigInt(2).pow(49)))
      .setScale(0, BigDecimal.RoundingMode.FLOOR).toBigInt

  test("sumDet: exact fixed-point sum for |v| >= 2^14 (long-floor regression)") {
    // every value is past the 2^14 saturation threshold of the r14
    // formula; several carry fractional parts so the integer/fraction
    // split is exercised, and one sits above 2^53 (already-integral
    // double, frac = 0 branch)
    val vals = Seq(16384.5, 1.0e9 + 0.25, 1.23456789e8 + 0.75,
      5.0e11 + 0.125, 98765.0, -2.5e10 - 0.5, 9.007199254740993e15)
    val single = EvalParams(Start, Start, Hour)
    val got = Compiler.compile("sum by () (m)", bigSrc(vals), single)
      .select("value").head().getDouble(0)
    val want = (BigDecimal(vals.map(gridExact).sum) /
      BigDecimal(BigInt(2).pow(49))).toDouble
    assert(got === want)
    // and the r14 direct-floor formula would NOT have produced this: the
    // saturated terms sum to ~n * 2^63 / 2^49 = n * 16384
    val saturated = vals.map(v =>
      BigInt((v * 562949953421312.0).toLong)).sum
    assert(BigDecimal(saturated) / BigDecimal(BigInt(2).pow(49))
      != BigDecimal(want))
  }

  test("sumDet: single large sample stays bit-exact; avg follows the sum") {
    val v = 8.76543219876e13 + 0.375
    val got = Compiler.compile("sum by () (m)", bigSrc(Seq(v)),
      EvalParams(Start, Start, Hour)).select("value").head().getDouble(0)
    assert(got === v) // single-sample regime: no grid, no quantization
    val vals = Seq(1.0e10 + 0.5, 2.0e10 + 0.25, 3.0e10 + 0.125)
    val gotAvg = Compiler.compile("avg by () (m)", bigSrc(vals),
      EvalParams(Start, Start, Hour)).select("value").head().getDouble(0)
    val wantAvg = (BigDecimal(vals.map(gridExact).sum) /
      BigDecimal(BigInt(2).pow(49))).toDouble / vals.size
    assert(gotAvg === wantAvg)
  }

  test("floor/ceil/round: double semantics at every magnitude (no long " +
      "saturation; NaN/Inf pass through)") {
    // Spark's floor/ceil(double) are LongType — the naive lowering
    // returned 0.0 for NaN, Long.MaxValue-ish for |v| >= 2^63, and
    // PromQL requires Go math.Floor double semantics
    val inf = Double.PositiveInfinity
    val vals = Seq(1.0e300, -1.0e300, 9.3e18, 2.5, -2.5, inf, -inf)
    val p1 = EvalParams(Start, Start, Hour)
    def run(q: String): Seq[Double] =
      Compiler.compile(q, bigSrc(vals), p1)
        .orderBy("u").select("value").collect().map(_.getDouble(0)).toSeq
    assert(run("floor(m)") === vals.map(math.floor))
    assert(run("ceil(m)") === vals.map(math.ceil))
    val gotR = run("round(m)")
    val wantR = vals.map(v => math.floor(v + 0.5))
    gotR.zip(wantR).foreach { case (g, w) =>
      assert(g == w || (g.isNaN && w.isNaN), s"round: $g != $w") }
    // NaN: floor(NaN) must be NaN, not the long-cast's 0.0
    val nan = Compiler.compile("floor(m)",
      bigSrc(Seq(Double.NaN)), p1).select("value").head().getDouble(0)
    assert(nan.isNaN)
  }

  test("sumDet: |v| >= 2^63 raises loudly instead of saturating") {
    val e = intercept[Exception] {
      Compiler.compile("sum by () (m)", bigSrc(Seq(1.0e19, 1.0, 2.0)),
        EvalParams(Start, Start, Hour)).select("value").head()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("2^63")))
  }

  test("sumDet: single sample >= 2^63 passes through bit-exact (no " +
      "raise — the guard is group-level, ADVICE r15)") {
    // PromQL accepts doubles to ~1.8e308; a 1-sample group never
    // touches the grid, so the 2^63 guard must not fire for it
    for (v <- Seq(1.0e19, -3.7e200, 1.0e308)) {
      val got = Compiler.compile("sum by () (m)", bigSrc(Seq(v)),
        EvalParams(Start, Start, Hour)).select("value").head().getDouble(0)
      assert(got === v)
      val gotAvg = Compiler.compile("avg by () (m)", bigSrc(Seq(v)),
        EvalParams(Start, Start, Hour)).select("value").head().getDouble(0)
      assert(gotAvg === v)
    }
  }
}
