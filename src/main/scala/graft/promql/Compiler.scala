package graft.promql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.tsdb.{Matchers, Rate, RangeWindows}

/** The point stream a PromQL expression evaluates over: flat rows with
  * `tsCol` (epoch ms), `valueCol` (double), and the series-identity label
  * columns. One sample per (series, ts) is required (dedup upstream with
  * [[graft.tsdb.PointOps.dedupLastWriteWins]]).
  *
  * `resolve` maps matcher label names to columns — including virtual
  * labels like `__name__` (typically `lit(<table name>)`).
  */
final case class PromSource(
    points: DataFrame,
    labelCols: Seq[String],
    resolve: String => Column,
    tsCol: String = "ts_ms",
    valueCol: String = "value",
    // A4 per-selector routing hook (reference `api/promql/queryable.go:
    // 367-373`: every Select carries its own function hint, mapped to a
    // counter-safe aggregated column independently — `cassandra/tsdb/
    // read.go:594-613`). Called with the innermost enclosing function of
    // each selector (None = bare instant vector); Some(frame) substitutes
    // that selector's point stream (e.g. the pre-aggregated table's
    // matching column plus a re-aggregated raw tail), None reads `points`.
    // So `max_over_time(a[1h]) / min_over_time(b[1h])` reads the agg
    // table twice — max column and min column — instead of falling back
    // to a raw scan because no single column serves the whole AST.
    routeFor: Option[String] => Option[DataFrame] = _ => None)

final case class EvalParams(
    startMs: Long, endMs: Long, stepMs: Long,
    lookbackMs: Long = 300000L)

/** Compiles a parsed PromQL [[Expr]] to a DataFrame plan producing
  * (labels…, eval_ms, value) — one row per series per eval step.
  *
  * This is the component the reference gets for free by embedding the
  * Prometheus engine (`api/promql/engine.go:27`) and SURVEY §7.1 calls the
  * largest novel piece. Every construct lowers onto the already-verified
  * operators: selectors → matcher predicates + per-sample step explode
  * (no nested-loop grid join), rate-family → [[Rate.overSteps]],
  * `*_over_time` → [[RangeWindows.rangeBucketed]], aggregation → hash
  * aggregate on (labels, eval_ms), binary ops → equi-joins on the matching
  * labels + eval step.
  *
  * Compile-time discipline (100 TB posture):
  *  - NO driver actions during compilation: scalar literals fold in Scala
  *    (`Vec.const`), data-dependent scalars (`scalar(v)`, `time()`) stay
  *    1-row-per-step plans joined on eval_ms — the r2 `.head()` jobs that
  *    serialized nested scalar builds are gone.
  *  - NO unconditional broadcast: the "one" side of a vector match gets a
  *    broadcast hint only when its AST shape is aggregate-bounded
  *    ([[aggBounded]]); raw-selector sides are left to AQE, so `a / b` over
  *    two unbounded selectors can never OOM the driver.
  */
object Compiler {

  /** Compiled form: the plan plus its series label set. `scalar` marks the
    * PromQL scalar type — the df is (eval_ms, value); `const` is set when
    * the value is a compile-time literal (df is a 1-row frame, only used
    * if the scalar is the query's top-level result).
    *
    * `nameCol`: the metric-name expression while the vector still HAS a
    * name (Prometheus semantics: selectors carry `__name__`; rate/math/
    * aggregation/arithmetic drop it). It exists so `on(..., __name__)`
    * vector matching can materialize the name as a join column on demand
    * — it is never part of `labels` and is always dropped from match
    * output (the corpus pins exactly that: "__name__ is always dropped,
    * even if it's part of the matching labels").
    */
  final case class Vec(df: DataFrame, labels: Seq[String], scalar: Boolean,
      const: Option[Double] = None, nameCol: Option[Column] = None)

  private val CmpOps = Set("==", "!=", ">", "<", ">=", "<=")

  def compile(expr: Expr, src: PromSource, p: EvalParams): DataFrame =
    compileVec(expr, src, p).df

  def compile(promql: String, src: PromSource, p: EvalParams): DataFrame =
    compile(Parser.parse(promql), src, p)

  /** Prometheus quantile semantics for out-of-range φ (promql/quantile.go
    * `quantile`): φ<0 → -Inf, φ>1 → +Inf, NaN → NaN — per group, with
    * the group still emitted. Spark's `percentile` REJECTS such φ at
    * analysis, so it only ever sees φ ∈ [0,1].
    */
  private def quantileAgg(vCol: String, q: Double): Column =
    if (q.isNaN) max(lit(Double.NaN))
    else if (q < 0) max(lit(Double.NegativeInfinity))
    else if (q > 1) max(lit(Double.PositiveInfinity))
    else expr(s"percentile($vCol, $q)")

  /** φ-quantile of an already-sorted array in the Prometheus
    * promql/quantile.go form: `v[lo] + (v[hi] − v[lo]) · (rank − lo)`
    * at `rank = φ·(n−1)`. Algebraically the same interpolation as
    * Spark's `percentile` and DuckDB's `quantile_cont`, but NOT
    * bit-identical to `percentile` (whose `lo·(1−f) + hi·f` form
    * rounds differently in the last ulp — property-fuzzed in
    * PromqlSpec); quantiles of DERIVED arrays (mad's deviation pass)
    * therefore ship grid-rounded through the gates, the same round-6
    * discipline `quantile_over_time` already uses.
    */
  private def arrayQuantile(sortedArr: Column, phi: Double): Column = {
    val n = size(sortedArr)
    val rank = lit(phi) * (n - lit(1)).cast("double")
    val lo = floor(rank).cast("int")
    val hi = least(lo + lit(1), n - lit(1))
    val vlo = element_at(sortedArr, lo + lit(1))
    val vhi = element_at(sortedArr, hi + lit(1))
    vlo + (vhi - vlo) * (rank - lo.cast("double"))
  }

  /** Population variance as exact decimal sums (Σx, Σx²) finished in
    * double — order-independent and engine-identical, where the
    * built-in `var_pop`'s streaming M2 accumulation is
    * partition-order-dependent FP (observed at sf1: one row an ulp
    * astride a 6th-decimal rounding boundary vs the oracle). The two
    * decimal folds are exact integer arithmetic; the finishing
    * `s2/n − (s1/n)²` runs on identical doubles in every engine, and
    * the zero clamp keeps cancellation from emitting a negative
    * variance (so stddev can't NaN). The oracle mirrors the op
    * sequence exactly.
    */
  /** Order-independent population variance on the decimal(18,6) grid.
    *
    * Accumulation is exact (decimal sums commute), so the result is
    * parallelism-independent; the oracle (`pql7_stddev_stdvar`) uses the
    * byte-identical formula. Two documented bounds of the discipline:
    *
    *  - '''magnitude''': `|v| < 1e12` (decimal(18,6) integral digits).
    *    Beyond it DuckDB errors on the cast; under ANSI (this engine's
    *    session default) Spark's cast errors identically, and under a
    *    non-ANSI deployment — where the cast would silently NULL while
    *    `count(c)` still counts the row, making the variance silently
    *    wrong — the `count(c) =!= count(d)` guard fails just as loudly.
    *  - '''cancellation''': the decimal sums are exact, but the final
    *    `s2/n − (s1/n)²` difference is taken in double, so relative
    *imprecision is amplified by ~`mean²/var`: with double's 2⁻⁵² ulp the
    *    result keeps ~`16 − 2·log10(|mean|/σ)` significant digits. For
    *    the engine's grid-rounded outputs (1e-6) that is exact while
    *    `mean²/var ≲ 1e10`; a series whose mean/σ ratio exceeds ~1e5
    *    needs a centered pre-pass (subtract a constant before querying).
    */
  private def varPopDet(c: Column): Column = {
    val d = c.cast("decimal(18,6)")
    val n = count(c).cast("double")
    val s1 = sum(d).cast("double")
    val s2 = sum(d * d).cast("double")
    when(count(c) =!= count(d), raise_error(lit(
      "stddev/stdvar: |value| >= 1e12 overflows the decimal(18,6) " +
        "accumulation grid")).cast("double"))
      .otherwise(greatest(s2 / n - (s1 / n) * (s1 / n), lit(0.0)))
  }

  /** Order-independent sum for the PromQL `sum`/`avg` aggregators and
    * the `sum_over_time`/`avg_over_time` folds. IEEE double addition is
    * not associative, so a plain `sum(double)` depends on shuffle fetch
    * order — local, cluster, and per-run results can differ in the last
    * ulps, and a 6-decimal presentation round amplifies one ulp into a
    * visible flip whenever the true sum sits near a rounding boundary.
    * Measured, not hypothetical: the r14 sf100 ClusterBench caught
    * `e2e_stream_slice` (a `sum by` over ~1M series per group)
    * fingerprint-MISMATCHING between local[16] and local-cluster over
    * identical data, while every small-group query matched. At 1000
    * executors this is a silent reproducibility hazard, so the engine
    * defines its sum as exact fixed-point rather than leaving it
    * execution-order-defined. Three regimes:
    *
    *  - '''non-finite group''' (any NaN/±Inf sample): plain double
    *    `sum` — NaN/±Inf saturation absorbs finite add order in every
    *    realistic case. One residual order-dependence survives here: a
    *    group holding one +Inf plus finite values whose partial sums
    *    can themselves overflow to −Inf (magnitudes near 1e308) yields
    *    +Inf in one add order and NaN in another. The engine accepts
    *    that corner — metric values at 1e308 are already garbage — and
    *    documents it rather than pretending IEEE saturation is total;
    *  - '''single sample''': the sample itself, bit-exact (no order to
    *    defend; keeps 1-series `sum by` groups — the common compiled
    *    shape — unquantized);
    *  - '''finite multi-sample''': each value floored onto the 2^-49
    *    fixed-point grid via [[gridSum]] (an EXACT, tie-free double
    *    op, unlike a double→decimal cast whose half-way ties the
    *    engines round differently), summed as exact integer
    *    DECIMAL(38,0) (order-independent, map-side-combinable, so the
    *    hash-aggregate plan shape is unchanged), divided back in
    *    double. Values with |v| ≥ 16 pass through the grid exactly
    *    (v·2^49 is already integral); smaller values quantize with
    *    ≤ 2^-49 absolute bias — twelve orders below the 1e-6
    *    presentation grid.
    *
    * Bounds: |v| must stay under 2^63 per sample ([[gridSum]]'s long
    * range), and Σ|v| within a group under ~5e23 (DECIMAL(38,0)
    * headroom at 2^49 scale; past it the decimal sum overflows loudly
    * under ANSI). The 2^63 guard is GROUP-level, not per-row (ADVICE
    * r15): aggregate arms all evaluate, so a per-row raise inside
    * [[gridSum]] fired even for single-sample groups whose CASE arm
    * returns the sample bit-exactly without touching the grid.
    * Huge-but-finite samples are clamped out of the grid input and the
    * raise happens only when the grid arm is actually SELECTED for a
    * group containing one (post-aggregation CASE branches evaluate
    * lazily). Oracles mirror the split formula verbatim in HUGEINT —
    * see the `den` CTE in [[graft.queries.PromqlQueries]]
    * `pql3_binop_ratio`.
    */
  private def hugeRaise: Column = raise_error(lit(
    "sum/avg: |value| >= 2^63 exceeds the deterministic fixed-point " +
      "grid's long range")).cast("double")

  private def isHuge(c: Column): Column =
    abs(c) >= lit(9.223372036854776e18)

  private def sumDet(c: Column): Column = {
    val bad = isnan(c) || abs(c) === lit(Double.PositiveInfinity)
    val fp = gridSum(when(bad || isHuge(c), lit(0.0)).otherwise(c))
    when(max(when(bad, 1).otherwise(0)) === 1, sum(c))
      .when(count(c) === 1, min(c))
      .when(max(when(isHuge(c), 1).otherwise(0)) === 1, hugeRaise)
      .otherwise(fp.cast("double") / lit(graft.similarity.Ann.CentroidScale))
  }

  /** Exact `floor(v · 2^49)` as DECIMAL(38,0), for any finite
    * |v| < 2^63. The naive `floor(v * 2^49)` is WRONG past |v| ≥ 2^14:
    * Spark's `floor(double)` returns LongType — codegen does
    * `(long) Math.floor(x)` — which silently saturates at
    * `Long.MaxValue` once v·2^49 ≥ 2^63, corrupting sums over routine
    * metric magnitudes (byte counters, request totals). A
    * double→decimal cast is no escape either: Spark routes it through
    * `Double.toString` (shortest round-trip repr, ≤17 significant
    * digits), which diverges from the exact binary value above ~1e17 —
    * while DuckDB's `CAST(double AS HUGEINT)` is binary-exact, so the
    * oracle fingerprints would drift ~ulp per term.
    *
    * Instead, split v exactly: `i = floor(v)` (long-safe for
    * |v| < 2^63) and `f = v − i`, exact by the Sterbenz lemma (i and v
    * are within a factor of 2 for |v| ≥ 1; f = v for |v| < 1; f = 0
    * for |v| ≥ 2^53 where v is already integral). Then
    * `floor(v·2^49) = i·2^49 + floor(f·2^49)` holds as exact integer
    * arithmetic: i·2^49 is an integer, f·2^49 < 2^49 fits a long, and
    * f·2^49 is an exact double op (power-of-two scale shifts the
    * exponent only). Both halves mirror bit-exactly in DuckDB HUGEINT.
    * |v| ≥ 2^63 would long-saturate the floor at `Long.MaxValue` —
    * which still FITS the decimal cast, so the decimal layer alone
    * cannot catch it; callers ([[sumDet]]/[[avgDet]]) clamp huge
    * samples out of the grid input and raise at GROUP level only when
    * the grid arm is selected for a group containing one.
    *
    * Cost shape (the r15 e2e profile): a per-row decimal multiply +
    * DECIMAL(38,0) add priced the naive `sum(i·2^49 + fracGrid)` at a
    * visible fraction of the whole compiled plan on ~10⁷-row groups.
    * Distributivity fixes it exactly: `Σ(i·2^49 + g) = (Σi)·2^49 + Σg`
    * in exact integer arithmetic (both engines), so the per-row work is
    * two long floors + two long→decimal casts, and the single decimal
    * multiply happens once per GROUP. The DuckDB mirrors keep the
    * per-row form — same integer, no oracle change. Headroom: both
    * partial sums ride decimal(30,0) (sum over decimal(20,0)), and the
    * final (Σi)·2^49 needs < 10^38 → Σ|v| < ~1.7e23, the same bound
    * the old DECIMAL(38,0) per-row accumulation had.
    */
  private def gridSum(v: Column): Column = {
    val i = floor(v)
    val g = floor((v - i.cast("double")) *
      lit(graft.similarity.Ann.CentroidScale))
    sum(i.cast("decimal(20,0)")) * lit(562949953421312L).cast("decimal(15,0)") +
      sum(g.cast("decimal(20,0)"))
  }

  /** [[sumDet]] / count — the `avg`/`avg_over_time` twin. The division
    * runs on the already-deterministic sum, so it inherits the same
    * order-independence; the single-sample and non-finite regimes
    * delegate to the sample / the IEEE-saturated builtin.
    */
  private def avgDet(c: Column): Column = {
    val bad = isnan(c) || abs(c) === lit(Double.PositiveInfinity)
    val fp = gridSum(when(bad || isHuge(c), lit(0.0)).otherwise(c))
    when(max(when(bad, 1).otherwise(0)) === 1, avg(c))
      .when(count(c) === 1, min(c))
      .when(max(when(isHuge(c), 1).otherwise(0)) === 1, hugeRaise)
      .otherwise(fp.cast("double") /
        lit(graft.similarity.Ann.CentroidScale) / count(c))
  }

  /** One row per eval step: the query_range grid. */
  private def grid(spark: SparkSession, p: EvalParams): DataFrame =
    spark.range(0, (p.endMs - p.startMs) / p.stepMs + 1)
      .select((lit(p.startMs) + col("id") * p.stepMs).as("eval_ms"))

  private def constVec(spark: SparkSession, v: Double): Vec =
    Vec(spark.range(1).select(lit(v).as("value")), Seq.empty, scalar = true,
      const = Some(v))

  /** True when the expression's cardinality is bounded by an aggregation —
    * safe to broadcast as the one-side of a vector match.
    */
  private def aggBounded(e: Expr): Boolean = e match {
    case _: Agg => true
    case _: NumLit => true
    case FuncCall("time" | "vector" | "scalar" | "absent", _, _) => true
    case FuncCall(_, a, _) => aggBounded(a)
    case LabelCall(_, a, _) => aggBounded(a)
    case BinOp(_, a, b, _, _, _, _, _, _) => aggBounded(a) && aggBounded(b)
    case _ => false // Selector / Subquery: unbounded series sets
  }

  private def compileVec(expr: Expr, src: PromSource, p: EvalParams,
      enclosing: Option[String] = None): Vec =
    expr match {
      case NumLit(v) => constVec(src.points.sparkSession, v)

      case s: Selector =>
        if (s.rangeMs.nonEmpty)
          throw new IllegalArgumentException(
            "bare range selector outside a range function")
        val base = selectorPoints(s, src, enclosing)
        // W4: staleness markers participate in the latest-sample CHOICE
        // (a marker newer than real samples suppresses the series at the
        // step — older samples must not leak through), then the chosen
        // marker rows are dropped
        def dropStale(df: DataFrame): DataFrame =
          df.where(!graft.functions.Bits.isStaleNaN(col(src.valueCol)))
        val df = s.atMs match {
          case None =>
            dropStale(RangeWindows.instantBucketed(base, src.labelCols,
              p.startMs, p.endMs, p.stepMs, p.lookbackMs,
              src.tsCol, src.valueCol))
          case Some(at0) =>
            // @ modifier: evaluate once at the pinned timestamp (start()/
            // end() resolve against the query range), then replicate
            // across the step grid (tiny broadcast cross join — the
            // fixed-time result is one row per series)
            val at = at0 match {
              case Selector.AtStart => p.startMs
              case Selector.AtEnd => p.endMs
              case t => t
            }
            val fixed = dropStale(RangeWindows.instantBucketed(base,
                src.labelCols, at, at, p.stepMs, p.lookbackMs,
                src.tsCol, src.valueCol))
              .drop("eval_ms")
            fixed.crossJoin(broadcast(grid(src.points.sparkSession, p)))
        }
        Vec(df, src.labelCols, scalar = false,
          nameCol = Some(src.resolve("__name__")))

      case FuncCall(fn, arg, fnParams)
        if Parser.MathFunctions(fn) || Parser.ParamMathFunctions(fn) =>
        val inner = compileVec(arg, src, p, Some(fn))
        inner.const match {
          case Some(cv) =>
            constVec(src.points.sparkSession, scalarMath(fn, cv, fnParams))
          case None =>
            // math functions drop the metric name (shouldDropMetricName)
            dropName(Vec(
              inner.df.withColumn("value", mathCol(fn, col("value"), fnParams)),
              inner.labels, inner.scalar))
        }

      // label manipulation over column-label sources: the destination
      // becomes a derived (string) label column on the plan
      case LabelCall(fn, arg, strArgs) =>
        val inner = compileVec(arg, src, p, enclosing)
        def labelCol(n: String): Column =
          if (inner.labels.contains(n)) col(n).cast("string") else lit("")
        val ValidLabel = "[a-zA-Z_][a-zA-Z0-9_]*".r
        def requireLabelName(n: String): Unit =
          if (!ValidLabel.pattern.matcher(n).matches())
            throw new IllegalArgumentException(
              s"invalid destination label name '$n'")
        fn match {
          case "label_replace" =>
            val Seq(dst, replacement, srcLabel, regex) = strArgs
            requireLabelName(dst)
            val anchored = "^(?:" + regex + ")$"
            // invalid regexes fail at compile, not mid-job
            java.util.regex.Pattern.compile(anchored)
            val srcVal = labelCol(srcLabel)
            val newVal = when(srcVal.rlike(anchored),
              regexp_replace(srcVal, anchored, replacement))
              .otherwise(labelCol(dst))
            val df = inner.df.withColumn(dst, newVal)
            Vec(df, (inner.labels :+ dst).distinct, scalar = false,
              nameCol = inner.nameCol)
          case "label_join" =>
            val dst = strArgs.head
            requireLabelName(dst)
            val sep = strArgs(1)
            val srcs = strArgs.drop(2)
            val df = inner.df.withColumn(dst,
              concat_ws(sep, srcs.map(labelCol): _*))
            Vec(df, (inner.labels :+ dst).distinct, scalar = false,
              nameCol = inner.nameCol)
          // Prometheus 3.x experimental funcSortByLabel(Desc): like
          // sort/sort_desc, purely presentation — the result SET is
          // unchanged and range queries ignore it entirely, so the plan
          // stays unsorted and api.PromJson orders the serialized output
          // when it is the top-level expression
          case "sort_by_label" | "sort_by_label_desc" =>
            Vec(inner.df, inner.labels, scalar = false,
              nameCol = inner.nameCol)
        }

      // info(v[, {sel}]) — Prometheus 3.x experimental (promql/info.go):
      // decorate each sample of v with the data labels of the matching
      // `target_info` series at that step (identifying labels: instance,
      // job — hardcoded upstream for target_info). An explicit selector
      // restricts which info series match AND which data labels are
      // copied (its non-__name__ matcher names, pinned at PARSE time in
      // `dataNames` so the per-request tenant/forced injection cannot
      // widen the set); without one, every info-side label that is
      // neither identifying nor the name is copied. A copied label
      // OVERWRITES the sample's own value where the info series defines
      // it (labels-builder Set semantics); samples with no matching info
      // series pass through unchanged (left join); MORE than one
      // matching info series for a sample raises, like the engine's
      // "found multiple matches" error. Identifying-label matching
      // treats a missing label as "" (the PromQL empty-matches-missing
      // convention), so an info series keyed by job alone still matches
      // samples without an instance.
      case InfoCall(arg, selOpt, dataNames) =>
        val inner = compileVec(arg, src, p, enclosing)
        val sel0 = selOpt.getOrElse(Selector(None, Seq.empty, None, 0L))
        val named =
          if (sel0.name.isDefined ||
            sel0.matchers.exists(_.label == "__name__")) sel0
          else sel0.copy(name = Some("target_info"))
        val infoVec = compileVec(named, src, p, Some("info"))
        val idLabels = Seq("instance", "job").filter(infoVec.labels.contains)
        if (idLabels.isEmpty) throw new IllegalArgumentException(
          "info() needs identifying labels (instance, job) on the source")
        // the default copy set never includes __-internal labels
        // (__name__, tenant) — upstream copies only the info series'
        // DATA labels; sources that expose internals as columns must
        // not have them overwritten
        val dataLabels =
          (if (dataNames.nonEmpty) dataNames
           else infoVec.labels.filterNot(idLabels.contains)
             .filterNot(_.startsWith("__")))
            .filter(infoVec.labels.contains)
        if (dataLabels.isEmpty) inner
        else {
          // one info row per (identity, step) or a loud error: the agg
          // collapses the instant vector and raises when two distinct
          // info series share the identifying tuple at a step
          val aggCols = dataLabels.map(d =>
            when(count(lit(1)) > 1, raise_error(lit(
              "info(): found multiple matching info series for an " +
                "identifying label set")).cast("string"))
              .otherwise(max(col(d).cast("string"))).as(s"__info_$d"))
          val infoSide = infoVec.df
            .groupBy((idLabels.map(l =>
              coalesce(col(l).cast("string"), lit("")).as(s"__id_$l")) :+
              col("eval_ms").as("__info_ms")): _*)
            .agg(aggCols.head, aggCols.tail: _*)
          val cond = idLabels.map { l =>
            val lhs =
              if (inner.labels.contains(l))
                coalesce(inner.df(l).cast("string"), lit(""))
              else lit("")
            lhs === infoSide(s"__id_$l")
          }.reduce(_ && _) && inner.df("eval_ms") === infoSide("__info_ms")
          val joined0 = inner.df.join(infoSide, cond, "left")
            .drop(infoSide("__info_ms"))
          val joined = idLabels.foldLeft(joined0)((d, l) =>
            d.drop(infoSide(s"__id_$l")))
          // Set semantics: the info value wins where defined, the
          // sample's own label rides through everywhere else
          val df = dataLabels.foldLeft(joined) { (d, dl) =>
            val own =
              if (inner.labels.contains(dl)) col(dl).cast("string")
              else lit(null).cast("string")
            d.withColumn(dl, coalesce(col(s"__info_$dl"), own))
              .drop(s"__info_$dl")
          }
          Vec(df, (inner.labels ++ dataLabels).distinct, scalar = false,
            nameCol = inner.nameCol)
        }

      // time(): the evaluation timestamp (seconds) at every step — a
      // per-step scalar (PromQL scalar type), joined on eval_ms downstream
      case FuncCall("time", _, _) =>
        val df = grid(src.points.sparkSession, p)
          .withColumn("value", col("eval_ms").cast("double") / 1000.0)
        Vec(df, Seq.empty, scalar = true)

      // vector(s): scalar as a label-less instant vector
      case FuncCall("vector", arg, _) =>
        val inner = compileVec(arg, src, p, Some("vector"))
        inner.const match {
          case Some(cv) =>
            val df = grid(src.points.sparkSession, p)
              .withColumn("value", lit(cv))
            Vec(df, Seq.empty, scalar = false)
          case None =>
            // per-step scalar already has the (eval_ms, value) shape
            Vec(inner.df, Seq.empty, scalar = false)
        }

      // scalar(v): the single series' value per step; NaN when the vector
      // has zero or many series at that step (Prometheus semantics)
      case FuncCall("scalar", arg, _) =>
        val inner = compileVec(arg, src, p, Some("scalar"))
        if (inner.scalar) inner
        else {
          val agg = inner.df.groupBy("eval_ms").agg(
            when(count(lit(1)) === 1, first(col("value")))
              .otherwise(lit(Double.NaN)).as("value"))
          val df = grid(src.points.sparkSession, p)
            .join(agg, Seq("eval_ms"), "left")
            .withColumn("value", coalesce(col("value"), lit(Double.NaN)))
          Vec(df, Seq.empty, scalar = true)
        }

      case FuncCall("absent", arg, _) =>
        // 1 at eval steps where the inner vector has no series at all;
        // result labels derive from the selector's equality matchers
        // (Prometheus createLabelsForAbsentFunction, promql/functions.go)
        val inner = compileVec(arg, src, p, Some("absent"))
        val present = inner.df.select("eval_ms").distinct()
        val lbls = absentLabels(arg)
        val df0 = grid(src.points.sparkSession, p)
          .join(present, Seq("eval_ms"), "left_anti")
          .withColumn("value", lit(1.0))
        val df = lbls.foldLeft(df0) { case (d, (k, v)) =>
          d.withColumn(k, lit(v)) }
        Vec(df, lbls.map(_._1), scalar = false)

      // timestamp(v): the timestamp (seconds) of each sample. For a raw
      // selector that is the chosen sample's own ts (offset removed, as
      // Prometheus reports the original sample time); for derived vectors
      // the sample time is the evaluation time.
      case FuncCall("timestamp", arg, _) =>
        arg match {
          case s: Selector if s.rangeMs.isEmpty =>
            val base = selectorPoints(s, src, Some("timestamp"))
            // W4 as for plain instant selectors: the staleness marker
            // participates in the latest-sample CHOICE (a marker newer than
            // real samples suppresses the series at the step), then chosen
            // marker rows are dropped — markers never leak a timestamp
            val df = RangeWindows.withEvalSteps(base,
                p.startMs, p.endMs, p.stepMs, p.lookbackMs, src.tsCol)
              .groupBy((src.labelCols.map(col) :+ col("eval_ms")): _*)
              .agg(max(struct(col(src.tsCol), col(src.valueCol))).as("__ch"))
              .where(!graft.functions.Bits.isStaleNaN(
                col("__ch").getField(src.valueCol)))
              .withColumn("value",
                (col("__ch").getField(src.tsCol) - lit(s.offsetMs))
                  .cast("double") / 1000.0)
              .drop("__ch")
            dropName(Vec(df, src.labelCols, scalar = false))
          case other =>
            val inner = compileVec(other, src, p, Some("timestamp"))
            dropName(Vec(inner.df.withColumn("value",
              col("eval_ms").cast("double") / 1000.0),
              inner.labels, scalar = false))
        }

      // date-component functions: the sample VALUE is an epoch-seconds
      // timestamp; the result is its UTC calendar component (Prometheus
      // "Date functions"; zero-arg form desugars to time() in the parser)
      case FuncCall(fn, arg, _) if Parser.DateFunctions(fn) =>
        val inner = compileVec(arg, src, p, Some(fn))
        def component(ts: Column): Column = fn match {
          case "minute" => minute(ts)
          case "hour" => hour(ts)
          case "day_of_week" => dayofweek(ts) - 1 // 0 = Sunday
          case "day_of_month" => dayofmonth(ts)
          case "day_of_year" => dayofyear(ts)
          case "days_in_month" => dayofmonth(last_day(ts))
          case "month" => month(ts)
          case "year" => year(ts)
        }
        inner.const match {
          case Some(cv) =>
            val t = java.time.LocalDateTime.ofEpochSecond(
              cv.toLong, 0, java.time.ZoneOffset.UTC)
            val v = fn match {
              case "minute" => t.getMinute
              case "hour" => t.getHour
              case "day_of_week" => t.getDayOfWeek.getValue % 7 // 0 = Sunday
              case "day_of_month" => t.getDayOfMonth
              case "day_of_year" => t.toLocalDate.getDayOfYear
              case "days_in_month" => t.toLocalDate.lengthOfMonth
              case "month" => t.getMonthValue
              case "year" => t.getYear
            }
            constVec(src.points.sparkSession, v.toDouble)
          case None =>
            val ts = timestamp_seconds(floor(col("value")).cast("long"))
            dropName(Vec(
              inner.df.withColumn("value", component(ts).cast("double")),
              inner.labels, inner.scalar))
        }

      // sort/sort_desc are presentation-only: the result SET is identical,
      // and Prometheus applies the ordering only when serializing an
      // instant-query result (range queries ignore sort entirely —
      // promql/functions.go funcSort note). A global orderBy here would
      // put a range-partition + sort into every compiled plan for pure
      // presentation cost, so the plan stays unsorted; the API layer
      // (api.PromJson) orders the serialized output when the top-level
      // expression is sort/sort_desc.
      case FuncCall("sort" | "sort_desc", arg, _) =>
        val inner = compileVec(arg, src, p, Some("sort"))
        Vec(inner.df, inner.labels, scalar = false, nameCol = inner.nameCol)

      // histogram_quantile(φ, v) over `le`-labelled cumulative buckets:
      // group by series-minus-le, sort buckets, interpolate inside the
      // target bucket (Prometheus promql/quantile.go bucketQuantile).
      // One hash aggregate; bucket arrays are histogram-sized (bounded).
      case FuncCall("histogram_quantile", arg, params) =>
        val phi = params.headOption.getOrElse(
          throw new IllegalArgumentException("histogram_quantile needs φ"))
        val inner = compileVec(arg, src, p, Some("histogram_quantile"))
        if (!inner.labels.contains("le"))
          throw new IllegalArgumentException(
            "histogram_quantile needs an input vector with an 'le' label")
        val groupLabels = inner.labels
          .filterNot(_ == "le").filterNot(_ == "__name__")
        val leNum = when(col("le").isin("+Inf", "Inf", "inf"),
          lit(Double.PositiveInfinity)).otherwise(col("le").cast("double"))
        val grouped = inner.df
          .withColumn("__le", leNum)
          .groupBy((groupLabels.map(col) :+ col("eval_ms")): _*)
          .agg(sort_array(collect_list(
            struct(col("__le").as("le"), col("value").as("v")))).as("__bs"))
        val df = grouped
          .withColumn("value", bucketQuantile(lit(phi), col("__bs")))
          .drop("__bs")
        Vec(df, groupLabels, scalar = false)

      case FuncCall(fn, arg, params) =>
        // The range function's input: either matcher-filtered raw points,
        // or — for a subquery — the inner expression materialized on its
        // own (finer) step grid covering [start-range, end], re-fed as a
        // derived point stream (W6).
        val (base, range, labels, tCol, vCol) = arg match {
          case s: Selector =>
            // W4: markers never appear inside range vectors
            (selectorPoints(s, src, Some(fn))
              .where(!graft.functions.Bits.isStaleNaN(col(src.valueCol))),
              s.rangeMs.get, src.labelCols, src.tsCol, src.valueCol)
          case Subquery(body, r, st, off) =>
            // offset shifts the whole subquery window: evaluate the inner
            // plan `off` earlier, then re-stamp its steps forward so the
            // outer range sees them at the shifted positions
            val innerP =
              EvalParams(p.startMs - r - off, p.endMs - off, st, p.lookbackMs)
            // the outer range function is the subquery body's routing
            // hint (Prometheus propagates select hints through
            // subqueries): rate(counter[30m:5m]) must read the
            // counter-safe max column, not avg, for its inner selector
            val inner = compileVec(body, src, innerP, Some(fn))
            val shifted = inner.df.withColumnRenamed("eval_ms", "__sq_ts")
            val df =
              if (off == 0) shifted
              else shifted.withColumn("__sq_ts", col("__sq_ts") + off)
            (df, r, inner.labels, "__sq_ts", "value")
          case other => throw new IllegalArgumentException(
            s"$fn requires a range selector or subquery, got $other")
        }
        val df = fn match {
          case "rate" | "increase" | "delta" =>
            val out = Rate.overSteps(base, labels,
              p.startMs, p.endMs, p.stepMs, range,
              counter = fn != "delta", tCol, vCol)
            val v = fn match {
              case "rate" => col("rate")
              case "increase" => col("increase")
              case "delta" => col("delta_raw")
            }
            out.select((labels.map(col) :+ col("eval_ms") :+
              v.as("value")): _*)
          case "irate" | "idelta" | "resets" =>
            val out = Rate.instantOverSteps(base, labels,
              p.startMs, p.endMs, p.stepMs, range, tCol, vCol)
            val v = fn match {
              case "irate" => col("irate")
              case "idelta" => col("idelta")
              case "resets" => col("resets").cast("double")
            }
            out.select((labels.map(col) :+ col("eval_ms") :+
              v.as("value")): _*)
          case "changes" =>
            // count of consecutive-sample value changes whose pair lies
            // inside the window (Prometheus funcChanges); NaN→NaN is not a
            // change under Spark's NaN==NaN comparison, matching the
            // engine's explicit both-NaN exemption
            val w = Window.partitionBy(labels.map(col): _*).orderBy(col(tCol))
            val withPrev = base
              .withColumn("__prev_val", lag(col(vCol), 1).over(w))
              .withColumn("__prev_ts", lag(col(tCol), 1).over(w))
            RangeWindows.withEvalSteps(withPrev,
                p.startMs, p.endMs, p.stepMs, range, tCol)
              .groupBy((labels.map(col) :+ col("eval_ms")): _*)
              .agg(sum(when(col("__prev_ts").isNotNull &&
                  col("__prev_ts") > col("eval_ms") - range &&
                  col(vCol) =!= col("__prev_val"), 1L).otherwise(0L))
                .cast("double").as("value"))
          case "quantile_over_time" =>
            val q = params.headOption.getOrElse(
              throw new IllegalArgumentException("quantile_over_time needs q"))
            RangeWindows.rangeBucketed(base, labels,
              p.startMs, p.endMs, p.stepMs, range,
              Seq("value" -> (_ => quantileAgg(vCol, q))),
              tCol, vCol)
          case "deriv" | "predict_linear" =>
            val horizon =
              if (fn == "predict_linear")
                params.headOption.getOrElse(throw new IllegalArgumentException(
                  "predict_linear needs a horizon (seconds)"))
              else 0.0
            val x = s"($tCol - eval_ms) / 1000.0"
            val v =
              if (fn == "deriv") org.apache.spark.sql.functions.expr(s"regr_slope($vCol, $x)")
              else org.apache.spark.sql.functions.expr(
                s"regr_intercept($vCol, $x) + regr_slope($vCol, $x) * $horizon")
            RangeWindows.withEvalSteps(base, p.startMs, p.endMs, p.stepMs,
                range, tCol)
              .groupBy((labels.map(col) :+ col("eval_ms")): _*)
              .agg(count(lit(1)).as("__n"), v.as("value"))
              .where(col("__n") >= 2).drop("__n")
          // Prometheus 3.x renames holt_winters to
          // double_exponential_smoothing (same Holt 1957 recurrence;
          // promql/functions.go funcDoubleExponentialSmoothing)
          case "holt_winters" | "double_exponential_smoothing" =>
            val (sf, tf) = (params.lift(0), params.lift(1)) match {
              case (Some(a), Some(b)) => (a, b)
              case _ => throw new IllegalArgumentException(
                s"$fn needs sf and tf")
            }
            val hw = udaf(new graft.tsdb.HoltWintersAgg(sf, tf))
            RangeWindows.withEvalSteps(base, p.startMs, p.endMs, p.stepMs,
                range, tCol)
              .groupBy((labels.map(col) :+ col("eval_ms")): _*)
              .agg(count(lit(1)).as("__n"),
                hw(col(tCol), col(vCol)).as("value"))
              .where(col("__n") >= 2 && col("value").isNotNull).drop("__n")
          case "absent_over_time" =>
            // 1 at steps where the range window holds NO sample at all;
            // labels from the range selector's equality matchers, same
            // derivation as absent()
            val present = RangeWindows.withEvalSteps(base,
                p.startMs, p.endMs, p.stepMs, range, tCol)
              .select("eval_ms").distinct()
            val lbls = absentLabels(arg)
            val adf0 = grid(src.points.sparkSession, p)
              .join(present, Seq("eval_ms"), "left_anti")
              .withColumn("value", lit(1.0))
            val adf = lbls.foldLeft(adf0) { case (d, (k, v)) =>
              d.withColumn(k, lit(v)) }
            return Vec(adf, lbls.map(_._1), scalar = false)
          case over =>
            val agg: Column => Column = over match {
              case "avg_over_time" => avgDet _
              case "min_over_time" => min
              case "max_over_time" => max
              case "sum_over_time" => sumDet _
              case "count_over_time" => c => count(c).cast("double")
              case "stddev_over_time" => c => sqrt(varPopDet(c))
              case "stdvar_over_time" => c => varPopDet(c)
              case "present_over_time" => _ => max(lit(1.0))
              case "last_over_time" =>
                c => max(struct(col(tCol), c)).getField(vCol)
              // Prometheus 3.x experimental window functions. mad is
              // median(|v − median(v)|) with the same linear
              // interpolation as quantile_over_time; the window's sample
              // list is bounded by the range selector, the same
              // per-group buffering `percentile` itself does. The ts_of
              // family returns the sample TIMESTAMP (seconds, float):
              // ties on the extreme value resolve to the LATEST sample
              // (funcTsOfMinOverTime/funcTsOfMaxOverTime update on <=/>=
              // as they scan forward in time).
              case "mad_over_time" => c => {
                val arr = sort_array(collect_list(c))
                val m = arrayQuantile(arr, 0.5)
                arrayQuantile(sort_array(transform(arr, x => abs(x - m))),
                  0.5)
              }
              case "ts_of_last_over_time" =>
                _ => max(col(tCol)).cast("double") / 1000.0
              case "ts_of_max_over_time" =>
                c => max(struct(c.as("__v"), col(tCol).as("__t")))
                  .getField("__t").cast("double") / 1000.0
              case "ts_of_min_over_time" =>
                c => (min(struct(c.as("__v"), (-col(tCol)).as("__t")))
                  .getField("__t") * lit(-1L)).cast("double") / 1000.0
              case other =>
                throw new IllegalArgumentException(s"unsupported function $other")
            }
            RangeWindows.rangeBucketed(base, labels,
              p.startMs, p.endMs, p.stepMs, range,
              Seq("value" -> agg), tCol, vCol)
        }
        // range functions compute per series (the grouping above keeps a
        // real __name__ identity column) but drop the metric name from
        // the OUTPUT — except last_over_time, which returns raw samples
        // name included (Prometheus funcLastOverTime)
        if (fn == "last_over_time") Vec(df, labels, scalar = false)
        else dropName(Vec(df, labels, scalar = false))

      case Agg(op, by, without, body, param, strParam) =>
        val inner = compileVec(body, src, p, enclosing)
        // aggregations always drop the metric name; `without` keeps the
        // complement of the listed labels MINUS __name__ (Prometheus
        // aggregation semantics); an explicit by(__name__) keeps it
        val groupLabels =
          if (without) inner.labels.filterNot(by.contains)
            .filterNot(_ == "__name__")
          else by.filter(inner.labels.contains)
        op match {
          case "topk" | "bottomk" =>
            // keep the full label set; rank within (group, step);
            // deterministic tiebreak on the label tuple
            val k = param.getOrElse(
              throw new IllegalArgumentException(s"$op needs k")).toInt
            val ord =
              if (op == "topk") col("value").desc else col("value").asc
            val w = Window
              .partitionBy((groupLabels.map(col) :+ col("eval_ms")): _*)
              .orderBy(ord, struct(inner.labels.map(col): _*).asc)
            val df = inner.df
              .withColumn("__rk", row_number().over(w))
              .where(col("__rk") <= k).drop("__rk")
            // topk/bottomk return input series unchanged → name survives
            Vec(df, inner.labels, scalar = false, nameCol = inner.nameCol)

          // Prometheus 3.x experimental sampling aggregations
          // (promql/engine.go aggregationK, LIMITK / LIMIT_RATIO):
          // deterministic per-series selection from a uniform hash of
          // the series' labels. limitk keeps the k smallest-hash series
          // present in each (group, step); limit_ratio keeps the hash
          // slice u ≤ r for r ≥ 0 and the complementary u > 1+r for
          // r < 0, so limit_ratio(r, v) or limit_ratio(r−1, v) ≡ v with
          // the two halves disjoint. The hash is the engine's md5-based
          // uniform (Prometheus uses xxhash of the labelset — same
          // determinism/complementarity contract, different constants,
          // so the particular subset differs; both are documented as a
          // pseudo-random deterministic sample). Selection keeps the
          // input series unchanged, like topk.
          case "limitk" | "limit_ratio" =>
            val prm = param.getOrElse(
              throw new IllegalArgumentException(s"$op needs a parameter"))
            val sortedLabels = inner.labels.sorted
            val hashStr = concat_ws("\u0001", sortedLabels.map(l =>
              concat_ws("\u0002", lit(l),
                coalesce(col(l).cast("string"), lit("")))): _*)
            // 12 hex digits → uniform u ∈ (0, 1] on a 2⁴⁸ grid
            val u = (conv(substring(md5(hashStr), 1, 12), 16, 10)
              .cast("long") + 1L).cast("double") / 281474976710656.0
            val df = op match {
              case "limitk" =>
                val k = prm.toInt
                val lblTuple = struct(sortedLabels.map(l =>
                  coalesce(col(l).cast("string"), lit(""))): _*)
                val w = Window
                  .partitionBy((groupLabels.map(col) :+ col("eval_ms")): _*)
                  .orderBy(u.asc, lblTuple.asc)
                inner.df.withColumn("__rk", row_number().over(w))
                  .where(col("__rk") <= k).drop("__rk")
              case _ =>
                val r = math.max(-1.0, math.min(1.0, prm))
                inner.df.where(
                  if (r >= 0) u <= lit(r) else u > lit(1.0 + r))
            }
            Vec(df, inner.labels, scalar = false, nameCol = inner.nameCol)

          case "count_values" =>
            // one output series per (group, distinct value): the value
            // becomes a new label, the new value is the count
            val vLab = strParam.getOrElse(
              throw new IllegalArgumentException(
                "count_values needs a label name"))
            val df = inner.df
              .withColumn(vLab, col("value").cast("string"))
              .groupBy(((groupLabels :+ vLab).map(col) :+ col("eval_ms")): _*)
              .agg(count(lit(1)).cast("double").as("value"))
            Vec(df, groupLabels :+ vLab, scalar = false)
          case _ =>
            val aggCol: Column = op match {
              case "sum" => sumDet(col("value"))
              case "avg" => avgDet(col("value"))
              case "min" => min(col("value"))
              case "max" => max(col("value"))
              case "count" => count(col("value")).cast("double")
              case "group" => max(lit(1.0)) // 1 per existing group
              case "stddev" => sqrt(varPopDet(col("value")))
              case "stdvar" => varPopDet(col("value"))
              case "quantile" =>
                quantileAgg("value", param.getOrElse(
                  throw new IllegalArgumentException("quantile needs q")))
            }
            val df = inner.df
              .groupBy((groupLabels.map(col) :+ col("eval_ms")): _*)
              .agg(aggCol.as("value"))
            Vec(df, groupLabels, scalar = false)
        }

      case BinOp(op @ ("and" | "or" | "unless"), lhs, rhs, on, ignoring,
          _, _, _, _) =>
        val l0 = compileVec(lhs, src, p, enclosing)
        val r0 = compileVec(rhs, src, p, enclosing)
        // on(..., __name__): materialize the metric name as a join column
        // (dropped again from the output labels below)
        val (l, r) =
          if (on.contains("__name__"))
            (materializeName(l0), materializeName(r0))
          else (l0, r0)
        // Prometheus matches set ops on the FULL label set by default;
        // differing label schemas are reconciled by padding missing labels
        // with "" (consistent with missing-label-matches-empty, F6)
        val all = (l.labels ++ r.labels).distinct
        def pad(v: Vec): DataFrame =
          all.foldLeft(v.df)((d, c) =>
            if (v.labels.contains(c)) d else d.withColumn(c, lit("")))
        // the default set-op signature is the full label set EXCLUDING the
        // metric name (Prometheus signature semantics) — __name__ joins
        // only when explicitly listed in on()
        val matchOn =
          if (on.nonEmpty) on
          else if (ignoring.nonEmpty) all.filterNot(ignoring.contains)
            .filterNot(_ == "__name__")
          else all.filterNot(_ == "__name__")
        val keys = matchOn :+ "eval_ms"
        // a MATERIALIZED __name__ (added for on(__name__) matching) never
        // appears in the output; a REAL name identity column survives —
        // and/unless/or return lhs (resp. both-side) samples as-is
        val lOut =
          if (l0.labels.contains("__name__")) l.labels
          else l.labels.filterNot(_ == "__name__")
        op match {
          case "and" =>
            val rKeys = pad(r).select(keys.map(col): _*).distinct()
            val df = pad(l).join(rKeys, keys, "left_semi")
              .select(((lOut :+ "eval_ms" :+ "value").map(col)): _*)
            Vec(df, lOut, scalar = false, nameCol = l0.nameCol)
          case "unless" =>
            val rKeys = pad(r).select(keys.map(col): _*).distinct()
            val df = pad(l).join(rKeys, keys, "left_anti")
              .select(((lOut :+ "eval_ms" :+ "value").map(col)): _*)
            Vec(df, lOut, scalar = false, nameCol = l0.nameCol)
          case "or" =>
            // left rows, plus right rows with no match group on the left
            val outAll =
              if (l0.labels.contains("__name__")
                || r0.labels.contains("__name__")) all
              else all.filterNot(_ == "__name__")
            val outCols = (outAll :+ "eval_ms" :+ "value").map(col)
            val lp = pad(l)
            val lKeys = lp.select(keys.map(col): _*).distinct()
            val df = lp.select(outCols: _*).unionByName(
              pad(r).join(lKeys, keys, "left_anti").select(outCols: _*))
            Vec(df, outAll, scalar = false)
        }

      case BinOp(op, lhsE, rhsE, on, ignoring, gl, boolMode, gr, gLabels) =>
        val l = compileVec(lhsE, src, p, enclosing)
        val r = compileVec(rhsE, src, p, enclosing)
        (l.const, r.const) match {
          case (Some(a), Some(b)) =>
            if (CmpOps(op)) {
              if (!boolMode) throw new IllegalArgumentException(
                "comparisons between scalars must use BOOL modifier")
              constVec(src.points.sparkSession,
                if (cmpScalar(op, a, b)) 1.0 else 0.0)
            } else constVec(src.points.sparkSession, evalScalar(op, a, b))
          case _ =>
            (l.scalar, r.scalar) match {
              case (false, true) =>
                vecScalar(op, l, r, vecOnLeft = true, boolMode)
              case (true, false) =>
                vecScalar(op, r, l, vecOnLeft = false, boolMode)
              case (true, true) =>
                scalarScalar(op, l, r, boolMode, src, p)
              case (false, false) =>
                vectorVector(op, l, r, lhsE, rhsE, on, ignoring, gl, gr,
                  gLabels, boolMode)
            }
        }

      // Prometheus: a subquery is a RANGE vector — valid only as a range
      // function's argument (handled there); at instant-vector position
      // query_range rejects it with this same error class, so raise the
      // typed error instead of a MatchError
      case sq: Subquery => throw new IllegalArgumentException(
        s"invalid expression type range vector (subquery $sq) for " +
          "instant vector evaluation")
    }

  /** vector ◦ scalar (either order). The scalar is a literal column when
    * constant, else a per-step 1-row frame joined (broadcast) on eval_ms.
    */
  private def vecScalar(op: String, v: Vec, s: Vec, vecOnLeft: Boolean,
      boolMode: Boolean): Vec = {
    val withScalar: (DataFrame, Column) = s.const match {
      case Some(sv) => (v.df, lit(sv))
      case None =>
        val sSide = s.df.withColumnRenamed("value", "__sv")
        (v.df.join(broadcast(sSide), Seq("eval_ms")), col("__sv"))
    }
    val (df0, sCol) = withScalar
    val (a, b) = if (vecOnLeft) (col("value"), sCol) else (sCol, col("value"))
    val out =
      if (CmpOps(op)) {
        if (boolMode)
          df0.withColumn("value", when(cmpCol(op, a, b), 1.0).otherwise(0.0))
        else df0.where(cmpCol(op, a, b))
      } else df0.withColumn("value", applyCol(op, a, b))
    // filter comparisons keep the vector's samples (and name); arithmetic
    // and bool-mode drop the metric name
    val res = Vec(dropTemp(out), v.labels, scalar = false,
      nameCol = if (CmpOps(op) && !boolMode) v.nameCol else None)
    if (CmpOps(op) && !boolMode) res else dropName(res)
  }

  /** scalar ◦ scalar where at least one side is per-step. */
  private def scalarScalar(op: String, l: Vec, r: Vec, boolMode: Boolean,
      src: PromSource, p: EvalParams): Vec = {
    if (CmpOps(op) && !boolMode) throw new IllegalArgumentException(
      "comparisons between scalars must use BOOL modifier")
    def combine(df: DataFrame, a: Column, b: Column): DataFrame =
      if (CmpOps(op))
        df.withColumn("value", when(cmpCol(op, a, b), 1.0).otherwise(0.0))
      else df.withColumn("value", applyCol(op, a, b))
    val df = (l.const, r.const) match {
      case (Some(lv), None) => combine(r.df, lit(lv), col("value"))
      case (None, Some(rv)) => combine(l.df, col("value"), lit(rv))
      case _ =>
        val rSide = r.df.withColumnRenamed("value", "__sv")
        combine(l.df.join(rSide, Seq("eval_ms")), col("value"), col("__sv"))
    }
    Vec(dropTemp(df), Seq.empty, scalar = true)
  }

  /** Vector-vector matching: equi-join on (match labels, eval_ms).
    *
    * Cardinality contract (ADVICE r2): the "one" side must be unique per
    * match group — enforced with a windowed count and `raise_error`, the
    * Spark analogue of Prometheus' "found duplicate series for the match
    * group". group_left/group_right carry `gLabels` from the one side.
    */
  private def vectorVector(op: String, l0: Vec, r0: Vec, lhsE: Expr, rhsE: Expr,
      on: Seq[String], ignoring: Seq[String], gl: Boolean, gr: Boolean,
      gLabels: Seq[String], boolMode: Boolean): Vec = {
    val isCmp = CmpOps(op)
    // on(..., __name__): the metric name becomes a real join column on
    // both sides (a name-less side — e.g. an aggregate — matches as "")
    val (l, r) =
      if (on.contains("__name__")) (materializeName(l0), materializeName(r0))
      else (l0, r0)
    // default matching never includes the metric name — Prometheus drops
    // it from the signature unless __name__ is EXPLICITLY listed in on()
    val matchOn =
      if (on.nonEmpty) on
      else l.labels.intersect(r.labels).filterNot(ignoring.contains)
        .filterNot(_ == "__name__")
    val keys = matchOn :+ "eval_ms"
    // on(...) may name labels absent from a side: an absent label matches
    // as the empty string (prometheus#3575 semantics carried into vector
    // matching), so pad it rather than failing resolution
    def pad(v: Vec): Vec = {
      val missing = matchOn.filterNot(v.labels.contains)
      Vec(missing.foldLeft(v.df)((d, c) => d.withColumn(c, lit(""))),
        v.labels ++ missing, v.scalar, v.const)
    }
    val (l2, r2) = (pad(l), pad(r))
    // group_right flips which side is the "one" side
    val (many, one, oneE) = if (gr) (r2, l2, lhsE) else (l2, r2, rhsE)
    val extras = gLabels.filter(one.labels.contains).filterNot(matchOn.contains)
    require(!extras.exists(many.labels.contains),
      s"group modifier labels ${extras.mkString(",")} already exist on the many side")
    val w = Window.partitionBy(keys.map(col): _*)
    val oneSel = one.df
      .select(((keys ++ extras).map(col) :+ col("value").as("__ov")): _*)
      .withColumn("__ocnt", count(lit(1)).over(w))
    val oneSide = if (aggBounded(oneE)) broadcast(oneSel) else oneSel
    val joined = many.df.join(oneSide, keys)
    val (a, b) =
      if (gr) (col("__ov"), col("value")) else (col("value"), col("__ov"))
    val dupError = raise_error(concat(
      lit("PromQL vector match: found duplicate series for the match group ("),
      lit(matchOn.mkString(",")), lit(")"))).cast("double")
    def guarded(c: Column): Column =
      when(col("__ocnt") > 1, dupError).otherwise(c)
    // "__name__ is always dropped, even if it's part of the matching
    // labels" (compliance corpus) — it joins above, never projects below.
    // The one exception: filter-mode comparisons return the many side's
    // samples unchanged, so a REAL __name__ identity column survives
    // (Prometheus keeps the metric name on comparison results).
    val keepRealName = isCmp && !boolMode &&
      (if (gr) r0 else l0).labels.contains("__name__")
    val outLabels = (
      if (isCmp) many.labels ++ extras
      else if (gl || gr) many.labels ++ extras
      else if (on.nonEmpty) on
      else l.labels.filterNot(ignoring.contains)
    ).filterNot(n => n == "__name__" && !keepRealName)
    val out =
      if (isCmp) {
        if (boolMode)
          joined.withColumn("value",
            guarded(when(cmpCol(op, a, b), 1.0).otherwise(0.0)))
        else joined
          .withColumn("__keep", guarded(when(cmpCol(op, a, b), 1.0)))
          .where(col("__keep").isNotNull)
      } else joined.withColumn("value", guarded(applyCol(op, a, b)))
    val df = out.select(((outLabels :+ "eval_ms" :+ "value").map(col)): _*)
    // filter comparisons return lhs samples as-is → the name survives;
    // arithmetic and bool-mode drop it (Prometheus shouldDropMetricName)
    val keepName = isCmp && !boolMode
    Vec(df, outLabels, scalar = false,
      nameCol = if (keepName) l0.nameCol else None)
  }

  /** Drop a REAL `__name__` identity column from a vector (sources whose
    * labelCols carry the metric name, e.g. the multi-metric HTTP store) —
    * the plan-level rendering of Prometheus `shouldDropMetricName`. No-op
    * for single-metric sources, whose labels never include `__name__`.
    */
  private def dropName(v: Vec): Vec =
    if (!v.labels.contains("__name__")) v
    else Vec(v.df.drop("__name__"), v.labels.filterNot(_ == "__name__"),
      v.scalar, v.const)

  /** Result labels for `absent(v)` / `absent_over_time(v[r])` — the Spark
    * rendering of Prometheus `createLabelsForAbsentFunction`
    * (promql/functions.go): walk the selector's matchers in order; the
    * FIRST equality matcher on a label contributes its value, but any
    * further matcher on the same label (second equality, regex, negation)
    * removes it — `absent(x{job="a",job="b"})` carries no `job`. Regex and
    * negative matchers never contribute; `__name__` and empty-valued
    * equalities are filtered (empty value == label absent). Non-selector
    * arguments derive no labels, exactly as in Prometheus.
    */
  private def absentLabels(e: Expr): Seq[(String, String)] = e match {
    case s: Selector =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val has = scala.collection.mutable.Set.empty[String]
      s.matchers.foreach {
        case graft.tsdb.MatchEq(n, v) if n != "__name__" && !has(n) =>
          m(n) = v; has += n
        case other if other.label != "__name__" => m.remove(other.label)
        case _ => ()
      }
      m.toSeq.filter(_._2.nonEmpty)
    case _ => Seq.empty
  }

  /** Expose a vector's metric name as a `__name__` column for matching
    * (no-op if already materialized); name-less vectors match as "".
    */
  private def materializeName(v: Vec): Vec =
    if (v.labels.contains("__name__")) v
    else Vec(
      v.df.withColumn("__name__",
        coalesce(v.nameCol.getOrElse(lit("")).cast("string"), lit(""))),
      v.labels :+ "__name__", v.scalar, v.const, v.nameCol)

  private def dropTemp(df: DataFrame): DataFrame =
    df.columns.filter(_.startsWith("__")).foldLeft(df)(_.drop(_))

  private def applyCol(op: String, a: Column, b: Column): Column = op match {
    case "+" => a + b
    case "-" => a - b
    case "*" => a * b
    case "/" => a / b
    case "%" => a % b // fmod, dividend sign — PromQL math.Mod
    case "^" => pow(a, b)
    case "atan2" => atan2(a, b)
  }

  private def cmpCol(op: String, a: Column, b: Column): Column = op match {
    case "==" => a === b; case "!=" => a =!= b
    case ">" => a > b; case "<" => a < b
    case ">=" => a >= b; case "<=" => a <= b
  }

  private def evalScalar(op: String, a: Double, b: Double): Double =
    op match {
      case "+" => a + b; case "-" => a - b
      case "*" => a * b; case "/" => a / b
      case "%" => a % b; case "^" => math.pow(a, b)
      case "atan2" => math.atan2(a, b)
    }

  private def cmpScalar(op: String, a: Double, b: Double): Boolean =
    op match {
      case "==" => a == b; case "!=" => a != b
      case ">" => a > b; case "<" => a < b
      case ">=" => a >= b; case "<=" => a <= b
    }

  /** Constant folding for math functions over scalar literals — keeps
    * nested scalar expressions free of Spark jobs at compile time.
    */
  private def scalarMath(fn: String, v: Double, ps: Seq[Double]): Double =
    fn match {
      case "abs" => math.abs(v)
      case "ceil" => math.ceil(v)
      case "floor" => math.floor(v)
      case "exp" => math.exp(v)
      case "ln" => math.log(v)
      case "log2" => math.log(v) / math.log(2.0)
      case "log10" => math.log10(v)
      case "sqrt" => math.sqrt(v)
      case "sgn" => math.signum(v)
      case "sin" => math.sin(v); case "cos" => math.cos(v)
      case "tan" => math.tan(v); case "asin" => math.asin(v)
      case "acos" => math.acos(v); case "atan" => math.atan(v)
      case "sinh" => math.sinh(v); case "cosh" => math.cosh(v)
      case "tanh" => math.tanh(v)
      // same log-form identities Spark's Asinh/Acosh/Atanh expressions
      // evaluate, so the constant-folded and column paths agree
      case "asinh" => math.log(v + math.sqrt(v * v + 1.0))
      case "acosh" => math.log(v + math.sqrt(v * v - 1.0))
      case "atanh" => 0.5 * math.log((1.0 + v) / (1.0 - v))
      case "deg" => math.toDegrees(v); case "rad" => math.toRadians(v)
      case "clamp" => math.min(math.max(v, ps.head), ps(1))
      case "clamp_min" => math.max(v, ps.head)
      case "clamp_max" => math.min(v, ps.head)
      case "round" =>
        val to = ps.headOption.getOrElse(1.0)
        math.floor(v / to + 0.5) * to
    }

  /** PromQL floor/ceil/round return DOUBLES (Go `math.Floor`), but
    * Spark's floor/ceil on a double are LongType — `(long) Math.floor`
    * silently saturates at ±2^63 (the r15 gate's defect class, see
    * [[gridSum]]). Any |v| ≥ 2^52 is already integral in double, so
    * floor/ceil are the identity there and the long conversion is
    * skipped — the result matches Go/DuckDB double semantics at every
    * magnitude (incl. ±Inf, which the identity branch passes through
    * where the long cast would saturate).
    */
  private def intValued(v: Column)(f: Column => Column): Column =
    when(abs(v) >= lit(4.503599627370496e15) || isnan(v), v)
      .otherwise(f(v))

  private def mathCol(fn: String, v: Column, ps: Seq[Double]): Column =
    fn match {
      case "abs" => abs(v)
      case "ceil" => intValued(v)(x => ceil(x).cast("double"))
      case "floor" => intValued(v)(x => floor(x).cast("double"))
      case "exp" => exp(v)
      case "ln" => log(v)
      case "log2" => log2(v)
      case "log10" => log10(v)
      case "sqrt" => sqrt(v)
      case "sgn" => signum(v)
      case "sin" => sin(v); case "cos" => cos(v); case "tan" => tan(v)
      case "asin" => asin(v); case "acos" => acos(v); case "atan" => atan(v)
      case "sinh" => sinh(v); case "cosh" => cosh(v); case "tanh" => tanh(v)
      case "asinh" => asinh(v); case "acosh" => acosh(v)
      case "atanh" => atanh(v)
      case "deg" => degrees(v); case "rad" => radians(v)
      case "clamp" =>
        val Seq(lo, hi) = ps
        least(greatest(v, lit(lo)), lit(hi))
      case "clamp_min" => greatest(v, lit(ps.head))
      case "clamp_max" => least(v, lit(ps.head))
      case "round" =>
        // PromQL round(v, to): nearest multiple, ties away from zero.
        // The +0.5 add always runs in double (its half-even tie at
        // ulp ≥ 1 is part of Go's op sequence); only the long floor is
        // skipped once the sum is ≥ 2^52 and already integral (same
        // saturation guard as floor/ceil above)
        val to = ps.headOption.getOrElse(1.0)
        intValued(v / to + 0.5)(x => floor(x).cast("double")) * to
    }

  /** Prometheus bucketQuantile over a sorted array of (le, cumulative
    * count) structs. Invalid histograms (fewer than 2 buckets, or highest
    * bucket not +Inf) yield NaN; a rank inside the +Inf bucket returns the
    * highest finite le; interpolation is linear within the target bucket.
    */
  private def bucketQuantile(phi: Column, bs: Column): Column = {
    val n = size(bs)
    val lastLe = element_at(bs, -1).getField("le")
    val total = element_at(bs, -1).getField("v")
    val rank = phi * total
    // 0-based index of the first bucket with cumulative count >= rank
    val lower = size(filter(bs, b => b.getField("v") < rank))
    val target = element_at(bs, least(lower + 1, n))
    val prevLe = when(lower === 0, lit(0.0))
      .otherwise(element_at(bs, greatest(lower, lit(1))).getField("le"))
    val prevCnt = when(lower === 0, lit(0.0))
      .otherwise(element_at(bs, greatest(lower, lit(1))).getField("v"))
    // empty target bucket (0/0) is NaN as in Prometheus — and must not
    // trip ANSI divide-by-zero
    val denom = target.getField("v") - prevCnt
    val interpolated = when(denom === 0.0, lit(Double.NaN)).otherwise(
      prevLe + (target.getField("le") - prevLe) *
        ((rank - prevCnt) / denom))
    when(n < 2 || lastLe =!= lit(Double.PositiveInfinity), lit(Double.NaN))
      .when(phi < 0, lit(Double.NegativeInfinity))
      .when(phi > 1, lit(Double.PositiveInfinity))
      .when(lower >= n - 1, element_at(bs, greatest(n - 1, lit(1)))
        .getField("le"))
      .when(lower === 0 && element_at(bs, 1).getField("le") <= 0,
        element_at(bs, 1).getField("le"))
      .otherwise(interpolated)
  }

  /** Matcher-filtered, offset-shifted points for a selector. `enclosing`
    * is the innermost function wrapping the selector — the per-selector
    * routing hint ([[PromSource.routeFor]] picks the counter-safe
    * pre-aggregated column from it, or falls back to raw points).
    */
  private def selectorPoints(s: Selector, src: PromSource,
      enclosing: Option[String]): DataFrame = {
    val pts = src.routeFor(enclosing).getOrElse(src.points)
    val ms = s.matchers ++
      s.name.map(n => graft.tsdb.MatchEq("__name__", n)).toSeq
    val filtered =
      if (ms.isEmpty) pts
      else pts.where(Matchers.all(src.resolve, ms))
    if (s.offsetMs == 0) filtered
    else filtered.withColumn(src.tsCol, col(src.tsCol) + s.offsetMs)
  }
}
