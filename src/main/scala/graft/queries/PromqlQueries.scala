package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.ScalarFns
import graft.promql.{Compiler, EvalParams, PromSource}
import graft.tsdb._

/** PromQL-evaluation queries beyond the storage operators: binary ops with
  * vector matching (J4), subqueries (W6), the scalar/date/label function
  * layer (§2.7), histogram_quantile, mutable-label result decoration (M2),
  * the points-read limit (F14), and the reference's parquet export pivot
  * (S11, `cmd/prom-remote-storage-to-parquet`).
  */
object PromqlQueries {
  import TsdbQueries.{Start, End, Hour, P, PD, Grid, RateFinSql}

  private val SixH = 6 * Hour
  private val Day = 86400000L

  /** Hour-lookback hourly grid / hour-lookback daily grid eval params for
    * the compiler-driven gated queries.
    */
  private val HourP = EvalParams(Start, End, Hour, lookbackMs = Hour)
  private val DayP = EvalParams(Start, End, Day, lookbackMs = Hour)

  private def pts(s: SparkSession, dir: String): DataFrame = Tables.points(s, dir)

  private def ptsByType(s: SparkSession, dir: String): DataFrame =
    pts(s, dir)
      .groupBy("event_type", "ts_ms")
      .agg(max_by(col("value"), col("event_id")).as("value"))

  private val sumV =
    sum(expr("CAST(value AS DECIMAL(18,6))")).cast("double")

  private val HistLes = Seq(50.0, 100.0, 200.0, 500.0, Double.PositiveInfinity)

  /** Deduped per-(user_id, event_type) series for the PromQL compiler. */
  private def ptsBySeries(s: SparkSession, dir: String): DataFrame =
    pts(s, dir)
      .groupBy("user_id", "event_type", "ts_ms")
      .agg(max_by(col("value"), col("event_id")).as("value"))

  private def srcByType(s: SparkSession, dir: String): PromSource =
    PromSource(ptsByType(s, dir), Seq("event_type"), {
      case "__name__" => lit("events")
      case "event_type" => col("event_type")
    })

  private def srcBySeries(s: SparkSession, dir: String): PromSource =
    PromSource(ptsBySeries(s, dir), Seq("user_id", "event_type"), {
      case "__name__" => lit("events")
      case "event_type" => col("event_type")
      case "user_id" => col("user_id").cast("string")
    })

  /** Per-series source whose metric NAME varies with the data
    * (`events_<type>`), so `on(..., __name__)` matching is non-trivial:
    * the name genuinely constrains the join (dropping it from `on` would
    * raise the duplicate-match-group error — many types per user).
    */
  private def srcNamed(s: SparkSession, dir: String): PromSource =
    PromSource(ptsBySeries(s, dir), Seq("user_id", "event_type"), {
      case "__name__" => concat(lit("events_"), col("event_type"))
      case "event_type" => col("event_type")
      case "user_id" => col("user_id").cast("string")
    })

  /** Hourly per-type cumulative le-buckets derived from events — the
    * classic-histogram fixture pql4/pql23 evaluate over.
    */
  private def histSrc(s: SparkSession, dir: String): PromSource = {
    val hourly = pts(s, dir)
      .withColumn("hour_ms", col("ts_ms") - pmod(col("ts_ms"), lit(Hour)))
      .groupBy("event_type", "hour_ms")
      .agg(count(when(col("value") <= 50, 1)).as("c1"),
        count(when(col("value") <= 100, 1)).as("c2"),
        count(when(col("value") <= 200, 1)).as("c3"),
        count(when(col("value") <= 500, 1)).as("c4"),
        count(lit(1)).as("c5"))
    val buckets = hourly.select(col("event_type"),
        col("hour_ms").as("ts_ms"), explode(array(
          struct(lit("50").as("le"), col("c1").cast("double").as("value")),
          struct(lit("100").as("le"), col("c2").cast("double").as("value")),
          struct(lit("200").as("le"), col("c3").cast("double").as("value")),
          struct(lit("500").as("le"), col("c4").cast("double").as("value")),
          struct(lit("+Inf").as("le"), col("c5").cast("double").as("value"))
        )).as("b"))
      .select(col("event_type"), col("ts_ms"),
        col("b.le").as("le"), col("b.value").as("value"))
    PromSource(buckets, Seq("event_type", "le"), {
      case "__name__" => lit("m")
      case "event_type" => col("event_type")
      case "le" => col("le")
    })
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // PromQL end-to-end: parse → compile → DataFrame plan (SURVEY §7.1.6)
    "pql1_rate_sum" -> ((s, dir) =>
      Compiler.compile(
        """sum by (event_type) (rate(events{event_type=~"click|view"}[1h]))""",
        srcByType(s, dir), EvalParams(Start, End, Hour))
        .select(col("event_type"), col("eval_ms"),
          TsdbQueries.r6(col("value")).as("rate_v"))),

    "pql2_over_time" -> ((s, dir) =>
      Compiler.compile(
        """max_over_time(events{event_type="purchase"}[6h])""",
        srcByType(s, dir), EvalParams(Start, End, SixH))
        .select(col("event_type"), col("eval_ms"), col("value").as("max_v"))),

    "pql3_binop_ratio" -> ((s, dir) =>
      Compiler.compile(
        """sum by (user_id) (events{event_type="click"})
           / on(user_id) sum by (user_id) (events)""",
        srcBySeries(s, dir),
        EvalParams(Start, End, 86400000L, lookbackMs = Hour))
        .select(col("user_id"), col("eval_ms"),
          round(col("value"), 6).as("ratio"))),

    // A6 regression — sumDet at |v| ≥ 2^14: scaling every sample by 1e9
    // puts all terms deep into the regime where the r14 formula's
    // LongType floor silently saturated (floor(v·2^49) caps at
    // Long.MaxValue once |v| ≥ 16384, corrupting sums over routine
    // counter magnitudes). The split gridSum keeps the fixed-point sum
    // exact for any |v| < 2^63 and the DuckDB oracle mirrors the split
    // bit-for-bit — this query is the cross-engine witness.
    "pql24_sum_large" -> ((s, dir) =>
      Compiler.compile(
        """sum by (event_type) (events * 1000000000)""",
        srcBySeries(s, dir),
        EvalParams(Start, End, Day, lookbackMs = Hour))
        .select(col("event_type"), col("eval_ms"),
          TsdbQueries.r6(col("value")).as("sum_v"))),

    // §2.7/A6 — histogram_quantile compiled over le-labelled cumulative
    // buckets (compliance yml:233): hourly per-type histograms derived
    // from the events table, quantile interpolated per (series-minus-le)
    "pql4_hist_quantile" -> ((s, dir) =>
      Compiler.compile("histogram_quantile(0.9, m)", histSrc(s, dir), HourP)
        .select(col("event_type"), col("eval_ms"), col("value").as("p90"))),

    // §2.7/W3 — THE production histogram query: p90 latency from
    // per-bucket RATES (histogram_quantile over rate(bucket[6h])). Pins
    // the composition end-to-end: the le label must survive the rate
    // grouping, and the bucket interpolation runs over extrapolated
    // per-second rates — including the count-based target-bucket rule
    // on whatever (not necessarily monotone) rated values come out,
    // which the oracle replicates literally. NaN steps (empty windows)
    // are filtered on BOTH sides.
    "pql23_hist_rate" -> ((s, dir) =>
      Compiler.compile("histogram_quantile(0.9, rate(m[6h]))",
          histSrc(s, dir), HourP)
        .where(!isnan(col("value")))
        .select(col("event_type"), col("eval_ms"),
          round(col("value"), 6).as("p90"))),

    // A6/W8 — bottomk via the compiler (compliance yml:100 topBottomOp)
    "pql5_bottomk" -> ((s, dir) =>
      Compiler.compile("bottomk(2, sum by (event_type) (events))",
        srcByType(s, dir), HourP)
        .select(col("event_type"), col("eval_ms"), col("value"))),

    // A6 — count_values via the compiler (yml:242): the sample value
    // becomes a label, the count the new value
    "pql6_count_values" -> ((s, dir) =>
      Compiler.compile("""count_values("v", floor(events / 100))""",
        srcByType(s, dir), HourP)
        .select(col("v"), col("eval_ms"), col("value").as("n"))),

    // A6 — stddev/stdvar aggregators (yml:68-96 simpleAggrOp)
    "pql7_stddev_stdvar" -> ((s, dir) => {
      val src = srcBySeries(s, dir)
      // unrounded: the decimal-sum variance is engine-identical bitwise
      val sd = Compiler.compile("stddev by (event_type) (events)", src, DayP)
        .select(col("event_type"), col("eval_ms"), col("value").as("sd"))
      val sv = Compiler.compile("stdvar by (event_type) (events)", src, DayP)
        .select(col("event_type"), col("eval_ms"), col("value").as("sv"))
      sd.join(sv, Seq("event_type", "eval_ms"))
    }),

    // §2.7 — % ^ and unary minus through the compiler (yml:104,120)
    "pql8_arith_mod_pow" -> ((s, dir) =>
      Compiler.compile("events % 7 + events ^ 2 - -events",
        srcByType(s, dir), HourP)
        .select(col("event_type"), col("eval_ms"),
          round(col("value"), 6).as("val"))),

    // §2.7 — timestamp(): the chosen sample's own timestamp (yml:117,171)
    "pql9_timestamp" -> ((s, dir) =>
      Compiler.compile("timestamp(events)", srcByType(s, dir), HourP)
        .select(col("event_type"), col("eval_ms"), col("value").as("ts_sec"))),

    // W3 — changes() over the range window (yml:229)
    "pql10_changes" -> ((s, dir) =>
      Compiler.compile("changes(events[6h])", srcByType(s, dir), HourP)
        .select(col("event_type"), col("eval_ms"),
          col("value").as("n_changes"))),

    // A7 — quantile_over_time (yml:169)
    "pql11_quantile_over_time" -> ((s, dir) =>
      Compiler.compile("quantile_over_time(0.9, events[6h])",
        srcByType(s, dir), HourP)
        .select(col("event_type"), col("eval_ms"),
          round(col("value"), 6).as("q90"))),

    // O1 — sort_desc through the compiler (result-set identical; ordering
    // is presentation, which the gate ignores — this pins the compile path)
    "pql12_sort_desc" -> ((s, dir) =>
      Compiler.compile("sort_desc(sum by (event_type) (events))",
        srcByType(s, dir), HourP)
        .select(col("event_type"), col("eval_ms"), col("value"))),

    // J4 — group_left with extra-label carry (yml:131): the one side's
    // event_type label decorates the many side's rows
    "pql13_group_left" -> ((s, dir) =>
      Compiler.compile(
        """max by (user_id) (events) * on(user_id) group_left(event_type)
           min by (user_id, event_type) (events{event_type="signup"})""",
        srcBySeries(s, dir), DayP)
        .select(col("user_id"), col("event_type"), col("eval_ms"),
          col("value"))),

    // O7 — or across differing label schemas (padded with ""): left rows
    // plus unmatched right rows
    "pql14_or_mixed" -> ((s, dir) =>
      Compiler.compile(
        """max by (user_id) (events{event_type="click"}) or on(user_id)
           max by (user_id, event_type) (events{event_type="purchase"})""",
        srcBySeries(s, dir), DayP)
        .select(col("user_id"), col("event_type"), col("eval_ms"),
          col("value"))),

    // §2.7 — scalar(): NaN unless exactly one series at the step
    "pql15_scalar_semantics" -> ((s, dir) =>
      Compiler.compile("scalar(events)", srcByType(s, dir), HourP)
        .select(col("eval_ms"), isnan(col("value")).as("is_nan"))),

    // §2.7 — trig functions + the atan2 binary operator (Prometheus 2.31
    // surface; transcendentals rounded — libm vs Java last-ulp). The
    // inverse hyperbolics use domain-safe arguments (acosh ≥ 1, |atanh| < 1
    // for any sample value) and pi() exercises the scalar-constant path.
    "pql17_trig" -> ((s, dir) =>
      Compiler.compile(
        """sin(events / 100) + cos(events / 100) + rad(deg(atan(events)))
           + asinh(events / 1000) + acosh(abs(events) / 1000 + 1)
           + atanh(1 / (abs(events) + 2)) + pi()""",
        srcByType(s, dir), HourP)
        .join(Compiler.compile("events atan2 vector(2)", srcByType(s, dir),
            HourP).select(col("event_type"), col("eval_ms"),
            round(col("value"), 6).as("at2")),
          Seq("event_type", "eval_ms"))
        .select(col("event_type"), col("eval_ms"),
          round(col("value"), 6).as("trig"), col("at2"))),

    // J4 — on(..., __name__) vector matching (compliance corpus binary-op
    // section: "__name__ is always dropped, even if it's part of the
    // matching labels"): the metric name is a real join column; the rhs
    // excludes signup-named series, so only non-signup series match. The
    // match REQUIRES __name__ in on() — on(user_id) alone has many series
    // per user and would raise the duplicate-match-group error.
    "pql18_name_matching" -> ((s, dir) =>
      Compiler.compile(
        """{__name__=~"events_.*"} * on(user_id, __name__)
           {__name__=~"events_.*", event_type!="signup"}""",
        srcNamed(s, dir), DayP)
        .select(col("user_id"), col("eval_ms"), col("value"))),

    // §2.7 — absent() with label derivation from the selector's equality
    // matchers (Prometheus createLabelsForAbsentFunction): 1 at steps
    // where no purchase sample lies in the lookback hour, labelled
    // {event_type="purchase"} — step-varying, not a constant grid
    "pql19_absent" -> ((s, dir) =>
      Compiler.compile("""absent(events{event_type="purchase"})""",
        srcByType(s, dir), HourP)
        .select(col("event_type"), col("eval_ms"), col("value"))),

    // §2.6 — Prometheus 3.x experimental sampling aggregations: limitk
    // keeps the 2 smallest-hash series per step, limit_ratio the u ≤ 0.4
    // hash slice, limit_ratio(-0.6) its exact complement — the md5
    // selection hash is replayed verbatim by the oracle, so the gate
    // pins which series survive, not just how many
    "pql20_limit_sampling" -> ((s, dir) => {
      val src = srcByType(s, dir)
      def one(q: String, tag: String) =
        Compiler.compile(q, src, HourP).withColumn("which", lit(tag))
      one("limitk(2, max by (event_type) (events))", "k")
        .unionByName(one(
          "limit_ratio(0.4, max by (event_type) (events))", "r"))
        .unionByName(one(
          "limit_ratio(-0.6, max by (event_type) (events))", "rc"))
        .select(col("which"), col("event_type"), col("eval_ms"),
          col("value"))
    }),

    // §2.7 — 3.x experimental window functions: mad_over_time (median
    // absolute deviation, interpolated like quantile_over_time) and the
    // ts_of family (timestamp of the window's min/max/last sample,
    // seconds; value ties resolve to the latest sample)
    "pql21_mad_tsof" -> ((s, dir) => {
      val src = srcByType(s, dir)
      def one(q: String, n: String) =
        Compiler.compile(q, src, HourP)
          .select(col("event_type"), col("eval_ms"), col("value").as(n))
      Compiler.compile("mad_over_time(events[6h])", src, HourP)
        .select(col("event_type"), col("eval_ms"),
          round(col("value"), 6).as("mad"))
        .join(one("ts_of_max_over_time(events[6h])", "ts_max"),
          Seq("event_type", "eval_ms"))
        .join(one("ts_of_min_over_time(events[6h])", "ts_min"),
          Seq("event_type", "eval_ms"))
        .join(one("ts_of_last_over_time(events[6h])", "ts_last"),
          Seq("event_type", "eval_ms"))
    }),

    // §2.7 — info() (Prometheus 3.x experimental): each events sample
    // decorated with the dc data label of the target_info series sharing
    // its (job, instance) identity at that step. The fixture plants one
    // target_info series per (job, instance) with samples at the SAME
    // timestamps as the metric, so every instant row decorates and the
    // oracle can derive dc deterministically from the identity.
    "pql22_info" -> ((s, dir) => {
      val base = ptsBySeries(s, dir)
      def shaped(name: String, v: Column, dc: Column) = base.select(
        lit(name).as("__mname"),
        col("event_type").as("job"),
        col("user_id").cast("string").as("instance"),
        dc.as("dc"), col("ts_ms"), v.as("value"))
      val pts = shaped("events", col("value"), lit(null).cast("string"))
        .unionByName(shaped("target_info", lit(1.0),
          concat(lit("dc-"), pmod(col("user_id"), lit(3)).cast("string"))))
      val src = PromSource(pts, Seq("job", "instance", "dc"), {
        case "__name__" => col("__mname")
        case other => col(other)
      })
      Compiler.compile("info(events)", src, DayP)
        .select(col("job"), col("instance"), col("dc"), col("eval_ms"),
          col("value"))
    }),

    // §2.7 — date functions through the compiler: components of the
    // chosen sample's own timestamp (corpus dateFunc family)
    "pql16_date_fns" -> ((s, dir) => {
      val src = srcByType(s, dir)
      def one(q: String, n: String) =
        Compiler.compile(q, src, HourP)
          .select(col("event_type"), col("eval_ms"),
            col("value").cast("long").as(n))
      one("year(timestamp(events))", "y")
        .join(one("month(timestamp(events))", "mo"),
          Seq("event_type", "eval_ms"))
        .join(one("day_of_week(timestamp(events))", "dow"),
          Seq("event_type", "eval_ms"))
        .join(one("hour(timestamp(events))", "h"),
          Seq("event_type", "eval_ms"))
        .join(one("day_of_year(timestamp(events))", "doy"),
          Seq("event_type", "eval_ms"))
    }),

    // J4 — one-to-one vector matching on(user_id): clicks - purchases
    "j4_binop_one2one" -> ((s, dir) => {
      val p = pts(s, dir)
      val clicks = p.where(col("event_type") === "click")
        .groupBy("user_id").agg(sumV.as("value"))
      val buys = p.where(col("event_type") === "purchase")
        .groupBy("user_id").agg(sumV.as("value"))
      VectorMatch.oneToOne(clicks, buys, Seq("user_id"), _ - _, "diff")
        .select("user_id", "diff")
    }),

    // J4 — many-to-one (group_left): per-type share of the user's total
    "j4_binop_grpleft" -> ((s, dir) => {
      val p = pts(s, dir)
      val perType = p.groupBy("user_id", "event_type").agg(sumV.as("value"))
      val total = p.groupBy("user_id").agg(sumV.as("value"))
      VectorMatch.manyToOne(perType, total, Seq("user_id"), _ / _, "share")
        .select("user_id", "event_type", "share")
    }),

    // W6 — subquery max_over_time(rate(m[1h])[6h:1h]) at 6-hour steps
    "w6_subquery" -> ((s, dir) => {
      val rates = Rate.overSteps(ptsByType(s, dir), Seq("event_type"),
          Start, End, Hour, Hour)
        .select(col("event_type"), col("eval_ms").as("ts_ms"),
          col("rate").as("value"))
      RangeWindows.rangeBucketed(rates, Seq("event_type"),
          Start, End, SixH, SixH, Seq("max_rate_6h" -> (v => max(v))))
        .withColumn("max_rate_6h", TsdbQueries.r6(col("max_rate_6h")))
    }),

    // §2.7 — math functions (builtins, no UDFs); transcendentals rounded
    // (libm vs Java Math may differ in the last ulp)
    "sc1_math_fns" -> ((s, dir) =>
      pts(s, dir).select(col("event_id"),
        abs(col("value") - 100).as("abs_v"),
        ceil(col("value")).cast("double").as("ceil_v"),
        floor(col("value")).cast("double").as("floor_v"),
        sqrt(col("value")).as("sqrt_v"), // IEEE-exact
        round(col("value")).as("round_v"),
        signum(col("value") - 100).as("sgn_v"),
        ScalarFns.clamp(col("value"), 10.0, 100.0).as("clamp_v"),
        round(exp(-col("value") / 100), 6).as("exp_v"),
        round(log(col("value") + 1), 6).as("ln_v"),
        round(log2(col("value") + 1), 6).as("log2_v"),
        round(log10(col("value") + 1), 6).as("log10_v"))),

    // §2.7 — date functions with PromQL conventions (day_of_week: 0=Sun)
    "sc2_date_fns" -> ((s, dir) => {
      val t = timestamp_millis(col("ts_ms"))
      pts(s, dir).select(col("event_id"),
        year(t).cast("long").as("y"),
        month(t).cast("long").as("mo"),
        dayofmonth(t).cast("long").as("dom"),
        hour(t).cast("long").as("h"),
        minute(t).cast("long").as("mi"),
        ScalarFns.dayOfWeek(t).cast("long").as("dow"),
        ScalarFns.daysInMonth(t).cast("long").as("dim"))
    }),

    // §2.7 — label_replace / label_join on a labels map
    "sc3_label_fns" -> ((s, dir) => {
      val labeled = pts(s, dir).withColumn("labels",
        map(lit("uid"), col("user_id").cast("string"),
          lit("etype"), col("event_type")))
      val replaced = ScalarFns.labelReplace(col("labels"),
        "etype_class", "$1_class", "etype", "(cl|vi).*")
      val dropped = ScalarFns.labelReplace(col("labels"),
        "uid", "", "etype", "error") // empty expansion removes the label
      val joined = ScalarFns.labelJoin(col("labels"), "key", "|",
        Seq("uid", "etype"))
      labeled.select(col("event_id"),
        replaced.getItem("etype_class").as("etype_class"),
        dropped.getItem("uid").as("uid_after"),
        joined.getItem("key").as("key"))
    }),

    // §2.7 — histogram_quantile over cumulative le-buckets
    "sc4_histogram_quantile" -> ((s, dir) => {
      val cums = HistLes.init.zipWithIndex.map { case (le, i) =>
        count(when(col("value") <= le, 1)).as(s"c${i + 1}")
      } :+ count(lit(1)).as(s"c${HistLes.length}")
      val agg = pts(s, dir).groupBy("event_type").agg(cums.head, cums.tail: _*)
      agg.select(col("event_type") +:
        (1 to HistLes.length).map(i => col(s"c$i")) :+
        ScalarFns.histogramQuantile(0.9, HistLes,
          (1 to HistLes.length).map(i => col(s"c$i"))).as("p90"): _*)
    }),

    // M2 — decorate series with their mutable group (reverse mapping)
    "m2_mutable_decorate" -> ((s, dir) => {
      import s.implicits._
      val dim = Seq(
        ("click", "interactive"), ("view", "interactive"),
        ("purchase", "transactional"), ("signup", "transactional"),
        ("error", "errors")).toDF("event_type", "grp")
      pts(s, dir)
        .join(broadcast(dim), Seq("event_type"))
        .groupBy("grp")
        .agg(countDistinct(col("user_id"), col("event_type")).as("n_series"),
          count(lit(1)).as("n_points"))
    }),

    // F14 — points-read limit probe for a selector
    "f14_points_limit" -> ((s, dir) =>
      pts(s, dir).where(col("event_type") === "click")
        .agg(count(lit(1)).as("n_points"))
        .withColumn("exceeded", col("n_points") > 20000L)),

    // S11 — parquet export schema: one column per series, rows per bucket
    "s11_export_pivot" -> ((s, dir) =>
      pts(s, dir)
        .groupBy((col("ts_ms") - pmod(col("ts_ms"), lit(86400000L))).as("day_ms"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(sumV)),

    // S11 import direction: unpivot the export schema back to long rows —
    // round-trips to the direct (day, series) aggregate
    "s11_import_unpivot" -> ((s, dir) => {
      val pivoted = pts(s, dir)
        .groupBy((col("ts_ms") - pmod(col("ts_ms"), lit(86400000L))).as("day_ms"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(sumV)
      pivoted.select(col("day_ms"), expr(
        """stack(5, 'click', click, 'error', error, 'purchase', purchase,
           'signup', signup, 'view', view) AS (event_type, sum_v)"""))
        .where(col("sum_v").isNotNull)
    })
  )

  /** Shared oracle CTEs: instant vectors on the hourly (by type) and daily
    * (by series) grids, arithmetic mirroring [[RangeWindows.instantBucketed]].
    */
  private val InstType = s"""
    pts AS ($PD), grid AS (SELECT unnest(generate_series(${Start}, ${End},
      ${Hour})) AS eval_ms),
    inst AS (SELECT event_type, eval_ms,
      (max(struct_pack(t := ts_ms, v := value))).v AS value
      FROM pts JOIN grid ON ts_ms <= eval_ms AND ts_ms > eval_ms - ${Hour}
      GROUP BY 1, 2)"""

  private val InstSeries = s"""
    pts AS (SELECT user_id, event_type, epoch_ns(ts)//1000000 AS ts_ms,
      arg_max(value, event_id) AS value FROM events GROUP BY 1, 2, 3),
    grid AS (SELECT unnest(generate_series(${Start}, ${End}, ${Day}))
      AS eval_ms),
    inst AS (SELECT user_id, event_type, eval_ms,
      (max(struct_pack(t := ts_ms, v := value))).v AS value
      FROM pts JOIN grid ON ts_ms <= eval_ms AND ts_ms > eval_ms - ${Hour}
      GROUP BY 1, 2, 3)"""

  def oracleSql: Map[String, String] = Map(
    // Bucket interpolation: same op order as Compiler.bucketQuantile
    // (prev_le + (le-prev_le) * ((rank-prev_c)/(c-prev_c))); x-0.0 == x
    // bit-exact for the first bucket, so the c1 branch simplifies.
    "pql4_hist_quantile" -> s"""
      WITH pts AS ($P),
      b AS (SELECT event_type, ts_ms - ts_ms % ${Hour} AS eval_ms,
        CAST(count(*) FILTER (value <= 50) AS DOUBLE) AS c1,
        CAST(count(*) FILTER (value <= 100) AS DOUBLE) AS c2,
        CAST(count(*) FILTER (value <= 200) AS DOUBLE) AS c3,
        CAST(count(*) FILTER (value <= 500) AS DOUBLE) AS c4,
        CAST(count(*) AS DOUBLE) AS c5
        FROM pts GROUP BY 1, 2)
      SELECT event_type, eval_ms,
        CASE
          WHEN c1 >= 0.9 * c5 THEN
            0.0 + (50.0 - 0.0) * ((0.9 * c5 - 0.0) / (c1 - 0.0))
          WHEN c2 >= 0.9 * c5 THEN
            50.0 + (100.0 - 50.0) * ((0.9 * c5 - c1) / (c2 - c1))
          WHEN c3 >= 0.9 * c5 THEN
            100.0 + (200.0 - 100.0) * ((0.9 * c5 - c2) / (c3 - c2))
          WHEN c4 >= 0.9 * c5 THEN
            200.0 + (500.0 - 200.0) * ((0.9 * c5 - c3) / (c4 - c3))
          ELSE 500.0 END AS p90
      FROM b""",

    "pql23_hist_rate" -> {
      val bAgg = s"""SELECT event_type, ts_ms - ts_ms % ${Hour} AS ts_ms,
        CAST(count(*) FILTER (value <= 50) AS DOUBLE) AS c1,
        CAST(count(*) FILTER (value <= 100) AS DOUBLE) AS c2,
        CAST(count(*) FILTER (value <= 200) AS DOUBLE) AS c3,
        CAST(count(*) FILTER (value <= 500) AS DOUBLE) AS c4,
        CAST(count(*) AS DOUBLE) AS c5
        FROM ($P) GROUP BY 1, 2"""
      val bucketRows = Seq("50" -> "c1", "100" -> "c2", "200" -> "c3",
        "500" -> "c4", "+Inf" -> "c5").map { case (le, c) =>
        s"SELECT event_type, '$le' AS le, ts_ms, $c AS value FROM ($bAgg)"
      }.mkString(" UNION ALL ")
      s"""
      WITH ${TsdbQueries.rateFin(bucketRows, Seq("event_type", "le"), SixH)},
      rq AS (SELECT event_type, eval_ms,
          max(CASE WHEN le = '50' THEN inc END) / 21600.0 AS r1,
          max(CASE WHEN le = '100' THEN inc END) / 21600.0 AS r2,
          max(CASE WHEN le = '200' THEN inc END) / 21600.0 AS r3,
          max(CASE WHEN le = '500' THEN inc END) / 21600.0 AS r4,
          max(CASE WHEN le = '+Inf' THEN inc END) / 21600.0 AS r5
        FROM fin GROUP BY 1, 2),
      rq2 AS (SELECT *, 0.9 * r5 AS rk,
          CAST(r1 < 0.9 * r5 AS INT) + CAST(r2 < 0.9 * r5 AS INT) +
          CAST(r3 < 0.9 * r5 AS INT) + CAST(r4 < 0.9 * r5 AS INT) +
          CAST(r5 < 0.9 * r5 AS INT) AS lo
        FROM rq WHERE r1 IS NOT NULL AND r2 IS NOT NULL
          AND r3 IS NOT NULL AND r4 IS NOT NULL AND r5 IS NOT NULL),
      q AS (SELECT event_type, eval_ms,
        CASE
          WHEN lo >= 4 THEN 500.0
          WHEN lo = 0 THEN CASE WHEN r1 = 0.0 THEN 'NaN'::DOUBLE
            ELSE 0.0 + 50.0 * ((rk - 0.0) / r1) END
          WHEN lo = 1 THEN CASE WHEN r2 - r1 = 0.0 THEN 'NaN'::DOUBLE
            ELSE 50.0 + 50.0 * ((rk - r1) / (r2 - r1)) END
          WHEN lo = 2 THEN CASE WHEN r3 - r2 = 0.0 THEN 'NaN'::DOUBLE
            ELSE 100.0 + 100.0 * ((rk - r2) / (r3 - r2)) END
          ELSE CASE WHEN r4 - r3 = 0.0 THEN 'NaN'::DOUBLE
            ELSE 200.0 + 300.0 * ((rk - r3) / (r4 - r3)) END
        END AS p90 FROM rq2)
      SELECT event_type, eval_ms, round(p90, 6) AS p90
      FROM q WHERE NOT isnan(p90)"""
    },

    "pql5_bottomk" -> s"""
      WITH $InstType
      SELECT event_type, eval_ms, value FROM (
        SELECT *, row_number() OVER (PARTITION BY eval_ms
          ORDER BY value ASC, event_type ASC) AS rk FROM inst)
      WHERE rk <= 2""",

    "pql6_count_values" -> s"""
      WITH $InstType
      SELECT CAST(floor(value / 100.0) AS VARCHAR) AS v, eval_ms,
        CAST(count(*) AS DOUBLE) AS n
      FROM inst GROUP BY 1, 2""",

    "pql7_stddev_stdvar" -> s"""
      WITH $InstSeries,
      v AS (SELECT event_type, eval_ms,
          CAST(count(value) AS DOUBLE) AS n,
          CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
          CAST(sum(CAST(value AS DECIMAL(18,6))
            * CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s2
        FROM inst GROUP BY 1, 2)
      SELECT event_type, eval_ms,
        sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0)) AS sd,
        greatest(s2 / n - (s1 / n) * (s1 / n), 0.0) AS sv
      FROM v""",

    "pql8_arith_mod_pow" -> s"""
      WITH $InstType
      SELECT event_type, eval_ms,
        round((fmod(value, 7.0) + power(value, 2.0)) - (-1.0 * value), 6)
          AS val
      FROM inst""",

    "pql9_timestamp" -> s"""
      WITH pts AS ($PD), grid AS (SELECT unnest(generate_series(${Start},
        ${End}, ${Hour})) AS eval_ms)
      SELECT event_type, eval_ms,
        CAST(max(ts_ms) AS DOUBLE) / 1000.0 AS ts_sec
      FROM pts JOIN grid ON ts_ms <= eval_ms AND ts_ms > eval_ms - ${Hour}
      GROUP BY 1, 2""",

    "pql10_changes" -> s"""
      WITH pts AS ($PD), prev AS (
        SELECT event_type, ts_ms, value,
          lag(value) OVER w AS prev_val, lag(ts_ms) OVER w AS prev_ts
        FROM pts WINDOW w AS (PARTITION BY event_type ORDER BY ts_ms)
      ), grid AS ($Grid)
      SELECT event_type, eval_ms,
        CAST(sum(CASE WHEN prev_ts IS NOT NULL
            AND prev_ts > eval_ms - ${SixH} AND value <> prev_val
          THEN 1 ELSE 0 END) AS DOUBLE) AS n_changes
      FROM prev JOIN grid ON ts_ms <= eval_ms AND ts_ms > eval_ms - ${SixH}
      GROUP BY 1, 2""",

    "pql11_quantile_over_time" -> s"""
      WITH pts AS ($PD), grid AS ($Grid)
      SELECT event_type, eval_ms,
        round(quantile_cont(value, 0.9), 6) AS q90
      FROM pts JOIN grid ON ts_ms <= eval_ms AND ts_ms > eval_ms - ${SixH}
      GROUP BY 1, 2""",

    "pql12_sort_desc" -> s"""
      WITH $InstType
      SELECT event_type, eval_ms, value FROM inst""",

    "pql13_group_left" -> s"""
      WITH $InstSeries,
      m AS (SELECT user_id, eval_ms, max(value) AS mv
        FROM inst GROUP BY 1, 2),
      s AS (SELECT user_id, eval_ms, min(value) AS sv
        FROM inst WHERE event_type = 'signup' GROUP BY 1, 2)
      SELECT m.user_id, 'signup' AS event_type, m.eval_ms, m.mv * s.sv AS value
      FROM m JOIN s ON m.user_id = s.user_id AND m.eval_ms = s.eval_ms""",

    "pql22_info" -> s"""
      WITH $InstSeries
      SELECT event_type AS job, user_id::VARCHAR AS instance,
        'dc-' || (user_id % 3)::VARCHAR AS dc, eval_ms, value
      FROM inst""",

    "pql20_limit_sampling" -> s"""
      WITH $InstType,
      u AS (SELECT event_type,
        (CAST('0x' || substr(md5('event_type' || chr(2) || event_type),
          1, 12) AS BIGINT) + 1) / 281474976710656.0 AS u
        FROM (SELECT DISTINCT event_type FROM inst)),
      rk AS (SELECT i.event_type, i.eval_ms, i.value,
        row_number() OVER (PARTITION BY i.eval_ms
          ORDER BY u.u, i.event_type) AS rnk
        FROM inst i JOIN u USING (event_type))
      SELECT 'k' AS which, event_type, eval_ms, value FROM rk WHERE rnk <= 2
      UNION ALL
      SELECT 'r', i.event_type, i.eval_ms, i.value
      FROM inst i JOIN u USING (event_type) WHERE u.u <= 0.4
      UNION ALL
      SELECT 'rc', i.event_type, i.eval_ms, i.value
      FROM inst i JOIN u USING (event_type) WHERE u.u > 0.4""",

    "pql21_mad_tsof" -> s"""
      WITH pts AS ($PD), grid AS ($Grid),
      w AS (SELECT event_type, eval_ms, value, ts_ms
        FROM pts JOIN grid ON ts_ms <= eval_ms AND ts_ms > eval_ms - ${SixH}),
      m AS (SELECT event_type, eval_ms, quantile_cont(value, 0.5) AS med
        FROM w GROUP BY 1, 2),
      d AS (SELECT w.event_type, w.eval_ms,
        quantile_cont(abs(w.value - m.med), 0.5) AS mad
        FROM w JOIN m ON w.event_type = m.event_type
          AND w.eval_ms = m.eval_ms GROUP BY 1, 2),
      t AS (SELECT event_type, eval_ms,
        (max(struct_pack(v := value, t := ts_ms))).t AS tmax,
        -((min(struct_pack(v := value, t := -ts_ms))).t) AS tmin,
        max(ts_ms) AS tlast FROM w GROUP BY 1, 2)
      SELECT d.event_type, d.eval_ms, round(d.mad, 6) AS mad,
        t.tmax / 1000.0 AS ts_max, t.tmin / 1000.0 AS ts_min,
        t.tlast / 1000.0 AS ts_last
      FROM d JOIN t ON d.event_type = t.event_type
        AND d.eval_ms = t.eval_ms""",

    "pql19_absent" -> s"""
      WITH $InstType
      SELECT 'purchase' AS event_type, g.eval_ms, 1.0 AS value
      FROM grid g WHERE NOT EXISTS (SELECT 1 FROM inst
        WHERE inst.eval_ms = g.eval_ms AND inst.event_type = 'purchase')""",

    "pql18_name_matching" -> s"""
      WITH $InstSeries
      SELECT user_id, eval_ms, value * value AS value
      FROM inst WHERE event_type <> 'signup'""",

    "pql14_or_mixed" -> s"""
      WITH $InstSeries,
      l AS (SELECT user_id, '' AS event_type, eval_ms, max(value) AS value
        FROM inst WHERE event_type = 'click' GROUP BY 1, 3),
      r AS (SELECT user_id, event_type, eval_ms, value
        FROM inst WHERE event_type = 'purchase')
      SELECT * FROM l
      UNION ALL
      SELECT r.* FROM r WHERE NOT EXISTS (SELECT 1 FROM l
        WHERE l.user_id = r.user_id AND l.eval_ms = r.eval_ms)""",

    "pql17_trig" -> s"""
      WITH $InstType
      SELECT event_type, eval_ms,
        round(sin(value / 100.0) + cos(value / 100.0) +
          radians(degrees(atan(value)))
          + ln(value / 1000.0 + sqrt((value / 1000.0) * (value / 1000.0)
              + 1.0))
          + ln(abs(value) / 1000.0 + 1.0
              + sqrt((abs(value) / 1000.0 + 1.0) * (abs(value) / 1000.0
                + 1.0) - 1.0))
          + 0.5 * ln((1.0 + 1.0 / (abs(value) + 2.0))
              / (1.0 - 1.0 / (abs(value) + 2.0)))
          + pi(), 6) AS trig,
        round(atan2(value, 2.0), 6) AS at2
      FROM inst""",

    "pql16_date_fns" -> s"""
      WITH pts AS ($PD), grid AS (SELECT unnest(generate_series(${Start},
        ${End}, ${Hour})) AS eval_ms),
      t AS (SELECT event_type, eval_ms,
        epoch_ms(max(ts_ms) - max(ts_ms) % 1000) AS st
        FROM pts JOIN grid ON ts_ms <= eval_ms AND ts_ms > eval_ms - ${Hour}
        GROUP BY 1, 2)
      SELECT event_type, eval_ms, year(st) AS y, month(st) AS mo,
        dayofweek(st) AS dow, hour(st) AS h, dayofyear(st) AS doy
      FROM t""",

    "pql15_scalar_semantics" -> s"""
      WITH pts AS ($PD), grid AS ($Grid),
      n AS (SELECT eval_ms, count(DISTINCT event_type) AS n
        FROM pts JOIN grid ON ts_ms <= eval_ms AND ts_ms > eval_ms - ${Hour}
        GROUP BY 1)
      SELECT g.eval_ms, coalesce(n.n, 0) <> 1 AS is_nan
      FROM grid g LEFT JOIN n ON g.eval_ms = n.eval_ms""",

    "pql1_rate_sum" -> s"""
      WITH $RateFinSql
      SELECT event_type, eval_ms,
        floor((inc / 3600.0) * 1e6 + 0.5) / 1e6 AS rate_v
      FROM fin WHERE event_type IN ('click', 'view')""",

    "pql2_over_time" -> s"""
      WITH pts AS ($PD),
      grid AS (SELECT unnest(generate_series(${Start}, ${End}, ${SixH}))
        AS eval_ms)
      SELECT event_type, eval_ms, max(value) AS max_v
      FROM pts JOIN grid ON ts_ms <= eval_ms AND ts_ms > eval_ms - ${SixH}
      WHERE event_type = 'purchase'
      GROUP BY 1, 2""",

    "pql3_binop_ratio" -> s"""
      WITH pts AS (SELECT user_id, event_type,
        epoch_ns(ts)//1000000 AS ts_ms, arg_max(value, event_id) AS value
        FROM events GROUP BY 1, 2, 3),
      grid AS (SELECT unnest(generate_series(${Start}, ${End}, 86400000))
        AS eval_ms),
      inst AS (SELECT user_id, event_type, eval_ms,
        (max(struct_pack(t := ts_ms, v := value))).v AS value
        FROM pts JOIN grid ON ts_ms <= eval_ms AND ts_ms > eval_ms - ${Hour}
        GROUP BY 1, 2, 3),
      -- num groups hold exactly one series (a user's click series), so
      -- plain sum IS the sample; den sums up to 5 series and mirrors
      -- Compiler.sumDet's fixed-point form so the add order can't move
      -- the ratio across the 6th-decimal rounding boundary. The grid
      -- term is the SPLIT form floor(v)*2^49 + floor((v-floor(v))*2^49)
      -- (Sterbenz-exact, long-safe on the Spark side for |v| < 2^63 —
      -- the direct floor(v*2^49) saturates Spark's long floor at
      -- |v| >= 2^14); the non-finite arm mirrors the engine's IEEE
      -- fallback (dormant on finite fixture data)
      num AS (SELECT user_id, eval_ms, sum(value) AS v FROM inst
        WHERE event_type = 'click' GROUP BY 1, 2),
      den AS (SELECT user_id, eval_ms,
        CASE
          WHEN max(CASE WHEN isnan(value) OR isinf(value) THEN 1
            ELSE 0 END) = 1 THEN sum(value)
          WHEN count(value) = 1 THEN min(value)
          ELSE CAST(sum(CAST(floor(value) AS HUGEINT)
              * 562949953421312::HUGEINT
            + CAST(floor((value - floor(value)) * 562949953421312.0)
              AS HUGEINT))
            AS DOUBLE) / 562949953421312.0 END AS v FROM inst
        GROUP BY 1, 2)
      SELECT user_id, eval_ms, round(num.v / den.v, 6) AS ratio
      FROM num JOIN den USING (user_id, eval_ms)""",

    // (see the Spark-side comment) every term is >= 16384 here, so this
    // query fails against the r14 direct-floor engine and passes the
    // split form: the regression witness for gridSum.
    "pql24_sum_large" -> s"""
      WITH pts AS (SELECT user_id, event_type,
        epoch_ns(ts)//1000000 AS ts_ms, arg_max(value, event_id) AS value
        FROM events GROUP BY 1, 2, 3),
      grid AS (SELECT unnest(generate_series(${Start}, ${End}, ${Day}))
        AS eval_ms),
      inst AS (SELECT user_id, event_type, eval_ms,
        (max(struct_pack(t := ts_ms, v := value))).v * 1000000000.0
          AS value
        FROM pts JOIN grid ON ts_ms <= eval_ms AND ts_ms > eval_ms - ${Hour}
        GROUP BY 1, 2, 3)
      SELECT event_type, eval_ms,
        floor((CASE
          WHEN max(CASE WHEN isnan(value) OR isinf(value) THEN 1
            ELSE 0 END) = 1 THEN sum(value)
          WHEN count(value) = 1 THEN min(value)
          ELSE CAST(sum(CAST(floor(value) AS HUGEINT)
              * 562949953421312::HUGEINT
            + CAST(floor((value - floor(value)) * 562949953421312.0)
              AS HUGEINT))
            AS DOUBLE) / 562949953421312.0 END) * 1e6 + 0.5) / 1e6
          AS sum_v
      FROM inst GROUP BY 1, 2""",

    "j4_binop_one2one" -> s"""
      WITH pts AS ($P),
      c AS (SELECT user_id,
        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        FROM pts WHERE event_type = 'click' GROUP BY 1),
      b AS (SELECT user_id,
        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        FROM pts WHERE event_type = 'purchase' GROUP BY 1)
      SELECT user_id, c.v - b.v AS diff FROM c JOIN b USING (user_id)""",

    "j4_binop_grpleft" -> s"""
      WITH pts AS ($P),
      pt AS (SELECT user_id, event_type,
        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        FROM pts GROUP BY 1, 2),
      tot AS (SELECT user_id,
        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        FROM pts GROUP BY 1)
      SELECT user_id, event_type, pt.v / tot.v AS share
      FROM pt JOIN tot USING (user_id)""",

    "w6_subquery" -> s"""
      WITH $RateFinSql,
      rate_tbl AS (SELECT event_type, eval_ms AS ts_ms,
        inc / 3600.0 AS value FROM fin),
      grid6 AS (SELECT unnest(generate_series(${Start}, ${End}, ${SixH}))
        AS eval_ms)
      SELECT event_type, eval_ms,
        floor(max(value) * 1e6 + 0.5) / 1e6 AS max_rate_6h
      FROM rate_tbl JOIN grid6
        ON ts_ms <= eval_ms AND ts_ms > eval_ms - ${SixH}
      GROUP BY 1, 2""",

    "sc1_math_fns" -> s"""
      WITH pts AS ($P)
      SELECT event_id,
        abs(value - 100) AS abs_v,
        CAST(ceil(value) AS DOUBLE) AS ceil_v,
        CAST(floor(value) AS DOUBLE) AS floor_v,
        sqrt(value) AS sqrt_v,
        round(value) AS round_v,
        CASE WHEN value - 100 > 0 THEN 1.0
             WHEN value - 100 < 0 THEN -1.0 ELSE 0.0 END AS sgn_v,
        least(greatest(value, 10.0), 100.0) AS clamp_v,
        round(exp(-value / 100), 6) AS exp_v,
        round(ln(value + 1), 6) AS ln_v,
        round(log2(value + 1), 6) AS log2_v,
        round(log10(value + 1), 6) AS log10_v
      FROM pts""",

    "sc2_date_fns" -> s"""
      WITH pts AS ($P)
      SELECT event_id,
        year(epoch_ms(ts_ms)) AS y,
        month(epoch_ms(ts_ms)) AS mo,
        day(epoch_ms(ts_ms)) AS dom,
        hour(epoch_ms(ts_ms)) AS h,
        minute(epoch_ms(ts_ms)) AS mi,
        dayofweek(epoch_ms(ts_ms)) AS dow,
        day(last_day(epoch_ms(ts_ms))) AS dim
      FROM pts""",

    "sc3_label_fns" -> s"""
      WITH pts AS ($P)
      SELECT event_id,
        CASE WHEN regexp_full_match(event_type, '(?:(cl|vi).*)')
          THEN regexp_replace(event_type, '^(?:(cl|vi).*)$$', '\\1_class')
        END AS etype_class,
        CASE WHEN event_type = 'error' THEN NULL
          ELSE CAST(user_id AS VARCHAR) END AS uid_after,
        CAST(user_id AS VARCHAR) || '|' || event_type AS key
      FROM pts""",

    "sc4_histogram_quantile" -> s"""
      WITH pts AS ($P),
      h AS (SELECT event_type,
        count(*) FILTER (value <= 50) AS c1,
        count(*) FILTER (value <= 100) AS c2,
        count(*) FILTER (value <= 200) AS c3,
        count(*) FILTER (value <= 500) AS c4,
        count(*) AS c5
        FROM pts GROUP BY 1)
      SELECT event_type, c1, c2, c3, c4, c5,
        CASE
          WHEN CAST(c1 AS DOUBLE) >= 0.9 * CAST(c5 AS DOUBLE)
            THEN 0.0 + (50.0 - 0.0) * (0.9 * CAST(c5 AS DOUBLE) - 0.0)
              / (CAST(c1 AS DOUBLE) - 0.0)
          WHEN CAST(c2 AS DOUBLE) >= 0.9 * CAST(c5 AS DOUBLE)
            THEN 50.0 + (100.0 - 50.0) * (0.9 * CAST(c5 AS DOUBLE)
              - CAST(c1 AS DOUBLE)) / (CAST(c2 AS DOUBLE) - CAST(c1 AS DOUBLE))
          WHEN CAST(c3 AS DOUBLE) >= 0.9 * CAST(c5 AS DOUBLE)
            THEN 100.0 + (200.0 - 100.0) * (0.9 * CAST(c5 AS DOUBLE)
              - CAST(c2 AS DOUBLE)) / (CAST(c3 AS DOUBLE) - CAST(c2 AS DOUBLE))
          WHEN CAST(c4 AS DOUBLE) >= 0.9 * CAST(c5 AS DOUBLE)
            THEN 200.0 + (500.0 - 200.0) * (0.9 * CAST(c5 AS DOUBLE)
              - CAST(c3 AS DOUBLE)) / (CAST(c4 AS DOUBLE) - CAST(c3 AS DOUBLE))
          ELSE 500.0 END AS p90
      FROM h""",

    "m2_mutable_decorate" -> s"""
      WITH pts AS ($P)
      SELECT CASE event_type
          WHEN 'click' THEN 'interactive' WHEN 'view' THEN 'interactive'
          WHEN 'purchase' THEN 'transactional' WHEN 'signup' THEN 'transactional'
          ELSE 'errors' END AS grp,
        count(DISTINCT (user_id, event_type)) AS n_series,
        count(*) AS n_points
      FROM pts GROUP BY 1""",

    "f14_points_limit" -> s"""
      SELECT count(*) AS n_points, count(*) > 20000 AS exceeded
      FROM events WHERE event_type = 'click'""",

    "s11_export_pivot" -> s"""
      WITH pts AS ($P)
      SELECT ts_ms - ts_ms % 86400000 AS day_ms,
        CAST(sum(CAST(value AS DECIMAL(18,6))) FILTER (event_type = 'click')
          AS DOUBLE) AS click,
        CAST(sum(CAST(value AS DECIMAL(18,6))) FILTER (event_type = 'error')
          AS DOUBLE) AS error,
        CAST(sum(CAST(value AS DECIMAL(18,6))) FILTER (event_type = 'purchase')
          AS DOUBLE) AS purchase,
        CAST(sum(CAST(value AS DECIMAL(18,6))) FILTER (event_type = 'signup')
          AS DOUBLE) AS signup,
        CAST(sum(CAST(value AS DECIMAL(18,6))) FILTER (event_type = 'view')
          AS DOUBLE) AS view
      FROM pts GROUP BY 1""",

    "s11_import_unpivot" -> s"""
      WITH pts AS ($P)
      SELECT ts_ms - ts_ms % 86400000 AS day_ms, event_type,
        CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_v
      FROM pts GROUP BY 1, 2"""
  )
}
