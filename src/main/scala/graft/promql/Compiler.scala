package graft.promql

import org.apache.spark.sql.{Column, DataFrame}
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
    valueCol: String = "value")

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
  * aggregate on (labels, eval_ms), binary ops → broadcast-friendly
  * equi-joins on the matching labels + eval step.
  */
object Compiler {

  /** Compiled form: the plan plus its series label set. */
  final case class Vec(df: DataFrame, labels: Seq[String], scalar: Boolean)

  def compile(expr: Expr, src: PromSource, p: EvalParams): DataFrame =
    compileVec(expr, src, p).df

  def compile(promql: String, src: PromSource, p: EvalParams): DataFrame =
    compile(Parser.parse(promql), src, p)

  private def compileVec(expr: Expr, src: PromSource, p: EvalParams): Vec =
    expr match {
      case NumLit(v) =>
        val df = src.points.sparkSession.range(1)
          .select(lit(v).as("value"))
        Vec(df, Seq.empty, scalar = true)

      case s: Selector =>
        if (s.rangeMs.nonEmpty)
          throw new IllegalArgumentException(
            "bare range selector outside a range function")
        val base = selectorPoints(s, src)
        val df = s.atMs match {
          case None =>
            RangeWindows.instantBucketed(base, src.labelCols,
              p.startMs, p.endMs, p.stepMs, p.lookbackMs,
              src.tsCol, src.valueCol)
          case Some(at) =>
            // @ modifier: evaluate once at the pinned timestamp, then
            // replicate across the step grid (tiny broadcast cross join —
            // the fixed-time result is one row per series)
            val fixed = RangeWindows.instantBucketed(base, src.labelCols,
                at, at, p.stepMs, p.lookbackMs, src.tsCol, src.valueCol)
              .drop("eval_ms")
            val spark = src.points.sparkSession
            val kMax = (p.endMs - p.startMs) / p.stepMs
            val grid = spark.range(0, kMax + 1)
              .select((lit(p.startMs) + col("id") * p.stepMs).as("eval_ms"))
            fixed.crossJoin(broadcast(grid))
        }
        Vec(df, src.labelCols, scalar = false)

      case FuncCall(fn, arg, fnParams)
        if Parser.MathFunctions(fn) || Parser.ParamMathFunctions(fn) =>
        val inner = compileVec(arg, src, p)
        val v = fn match {
          case "abs" => abs(col("value"))
          case "ceil" => ceil(col("value")).cast("double")
          case "floor" => floor(col("value")).cast("double")
          case "exp" => exp(col("value"))
          case "ln" => log(col("value"))
          case "log2" => log2(col("value"))
          case "log10" => log10(col("value"))
          case "sqrt" => sqrt(col("value"))
          case "sgn" => signum(col("value"))
          case "clamp" =>
            val Seq(lo, hi) = fnParams
            least(greatest(col("value"), lit(lo)), lit(hi))
          case "clamp_min" => greatest(col("value"), lit(fnParams.head))
          case "clamp_max" => least(col("value"), lit(fnParams.head))
          case "round" =>
            // PromQL round(v, to): nearest multiple, ties away from zero
            val to = fnParams.headOption.getOrElse(1.0)
            floor(col("value") / to + 0.5) * to
        }
        Vec(inner.df.withColumn("value", v), inner.labels, inner.scalar)

      // label manipulation over column-label sources: the destination
      // becomes a derived (string) label column on the plan
      case LabelCall(fn, arg, strArgs) =>
        val inner = compileVec(arg, src, p)
        def labelCol(n: String): Column =
          if (inner.labels.contains(n)) col(n).cast("string") else lit("")
        fn match {
          case "label_replace" =>
            val Seq(dst, replacement, srcLabel, regex) = strArgs
            val anchored = "^(?:" + regex + ")$"
            val srcVal = labelCol(srcLabel)
            val newVal = when(srcVal.rlike(anchored),
              regexp_replace(srcVal, anchored, replacement))
              .otherwise(labelCol(dst))
            val df = inner.df.withColumn(dst, newVal)
            Vec(df, (inner.labels :+ dst).distinct, scalar = false)
          case "label_join" =>
            val dst = strArgs.head
            val sep = strArgs(1)
            val srcs = strArgs.drop(2)
            val df = inner.df.withColumn(dst,
              concat_ws(sep, srcs.map(labelCol): _*))
            Vec(df, (inner.labels :+ dst).distinct, scalar = false)
        }

      // time(): the evaluation timestamp (seconds) at every step —
      // a label-less vector over the grid
      case FuncCall("time", _, _) =>
        val spark = src.points.sparkSession
        val kMax = (p.endMs - p.startMs) / p.stepMs
        val df = spark.range(0, kMax + 1)
          .select((lit(p.startMs) + col("id") * p.stepMs).as("eval_ms"))
          .withColumn("value", col("eval_ms").cast("double") / 1000.0)
        Vec(df, Seq.empty, scalar = false)

      // vector(s): scalar as a label-less vector; scalar(v): a
      // single-series vector's value as a scalar per step (here: the
      // label-less vector itself — both are the same representation)
      case FuncCall("vector" | "scalar", arg, _) =>
        val inner = compileVec(arg, src, p)
        if (inner.scalar) {
          val v = inner.df.head().getDouble(0)
          val spark = src.points.sparkSession
          val kMax = (p.endMs - p.startMs) / p.stepMs
          val df = spark.range(0, kMax + 1)
            .select((lit(p.startMs) + col("id") * p.stepMs).as("eval_ms"))
            .withColumn("value", lit(v))
          Vec(df, Seq.empty, scalar = false)
        } else Vec(inner.df, Seq.empty, scalar = false)

      case FuncCall("absent", arg, _) =>
        // 1 at eval steps where the inner vector has no series at all
        val inner = compileVec(arg, src, p)
        val spark = src.points.sparkSession
        val kMax = (p.endMs - p.startMs) / p.stepMs
        val grid = spark.range(0, kMax + 1)
          .select((lit(p.startMs) + col("id") * p.stepMs).as("eval_ms"))
        val present = inner.df.select("eval_ms").distinct()
        val df = grid.join(present, Seq("eval_ms"), "left_anti")
          .withColumn("value", lit(1.0))
        Vec(df, Seq.empty, scalar = false)

      case FuncCall(fn, arg, params) =>
        // The range function's input: either matcher-filtered raw points,
        // or — for a subquery — the inner expression materialized on its
        // own (finer) step grid covering [start-range, end], re-fed as a
        // derived point stream (W6).
        val (base, range, labels, tCol, vCol) = arg match {
          case s: Selector =>
            (selectorPoints(s, src), s.rangeMs.get, src.labelCols,
              src.tsCol, src.valueCol)
          case Subquery(body, r, st) =>
            val innerP = EvalParams(p.startMs - r, p.endMs, st, p.lookbackMs)
            val inner = compileVec(body, src, innerP)
            (inner.df.withColumnRenamed("eval_ms", "__sq_ts"), r,
              inner.labels, "__sq_ts", "value")
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
          case "deriv" | "predict_linear" =>
            val horizon =
              if (fn == "predict_linear")
                params.headOption.getOrElse(throw new IllegalArgumentException(
                  "predict_linear needs a horizon (seconds)"))
              else 0.0
            val x = s"($tCol - eval_ms) / 1000.0"
            val v =
              if (fn == "deriv")
                org.apache.spark.sql.functions.expr(s"regr_slope($vCol, $x)")
              else org.apache.spark.sql.functions.expr(
                s"regr_intercept($vCol, $x) + regr_slope($vCol, $x) * $horizon")
            RangeWindows.withEvalSteps(base, p.startMs, p.endMs, p.stepMs,
                range, tCol)
              .groupBy((labels.map(col) :+ col("eval_ms")): _*)
              .agg(count(lit(1)).as("__n"), v.as("value"))
              .where(col("__n") >= 2).drop("__n")
          case "holt_winters" =>
            val (sf, tf) = (params.lift(0), params.lift(1)) match {
              case (Some(a), Some(b)) => (a, b)
              case _ => throw new IllegalArgumentException(
                "holt_winters needs sf and tf")
            }
            val hw = udaf(new graft.tsdb.HoltWintersAgg(sf, tf))
            RangeWindows.withEvalSteps(base, p.startMs, p.endMs, p.stepMs,
                range, tCol)
              .groupBy((labels.map(col) :+ col("eval_ms")): _*)
              .agg(count(lit(1)).as("__n"),
                hw(col(tCol), col(vCol)).as("value"))
              .where(col("__n") >= 2 && col("value").isNotNull).drop("__n")
          case over =>
            val agg: Column => Column = over match {
              case "avg_over_time" => avg
              case "min_over_time" => min
              case "max_over_time" => max
              case "sum_over_time" => sum
              case "count_over_time" => c => count(c).cast("double")
              case "stddev_over_time" => c => stddev_pop(c)
              case "stdvar_over_time" => c => var_pop(c)
              case "present_over_time" => _ => max(lit(1.0))
              case "last_over_time" =>
                c => max(struct(col(tCol), c)).getField(vCol)
              case other =>
                throw new IllegalArgumentException(s"unsupported function $other")
            }
            RangeWindows.rangeBucketed(base, labels,
              p.startMs, p.endMs, p.stepMs, range,
              Seq("value" -> agg), tCol, vCol)
        }
        Vec(df, labels, scalar = false)

      case Agg(op, by, without, body, param) =>
        val inner = compileVec(body, src, p)
        val groupLabels =
          if (without) inner.labels.filterNot(by.contains)
          else by.filter(inner.labels.contains)
        op match {
          case "topk" =>
            // keep the full label set; rank within (group, step)
            val k = param.getOrElse(
              throw new IllegalArgumentException("topk needs k")).toInt
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy((groupLabels.map(col) :+ col("eval_ms")): _*)
              .orderBy(col("value").desc,
                struct(inner.labels.map(col): _*).asc)
            val df = inner.df
              .withColumn("__rk", row_number().over(w))
              .where(col("__rk") <= k).drop("__rk")
            Vec(df, inner.labels, scalar = false)
          case _ =>
            val aggCol: Column = op match {
              case "sum" => sum(col("value"))
              case "avg" => avg(col("value"))
              case "min" => min(col("value"))
              case "max" => max(col("value"))
              case "count" => count(col("value")).cast("double")
              case "group" => max(lit(1.0)) // 1 per existing group
              case "quantile" =>
                org.apache.spark.sql.functions.expr(
                  s"percentile(value, ${param.getOrElse(
                    throw new IllegalArgumentException("quantile needs q"))})")
            }
            val df = inner.df
              .groupBy((groupLabels.map(col) :+ col("eval_ms")): _*)
              .agg(aggCol.as("value"))
            Vec(df, groupLabels, scalar = false)
        }

      case BinOp(op @ ("and" | "or" | "unless"), lhs, rhs, on, ignoring, _, _) =>
        val l = compileVec(lhs, src, p)
        val r = compileVec(rhs, src, p)
        val matchOn =
          if (on.nonEmpty) on
          else l.labels.intersect(r.labels).filterNot(ignoring.contains)
        val keys = matchOn :+ "eval_ms"
        val rKeys = r.df.select(keys.map(col): _*).distinct()
        val df = op match {
          case "and" => l.df.join(rKeys, keys, "left_semi")
          case "unless" => l.df.join(rKeys, keys, "left_anti")
          case "or" =>
            require(l.labels == r.labels,
              "or requires identical label sets in this engine")
            l.df.unionByName(
              r.df.join(l.df.select(keys.map(col): _*).distinct(),
                keys, "left_anti"))
        }
        Vec(df, l.labels, scalar = false)

      case BinOp(op, lhs, rhs, on, ignoring, _, boolMode) =>
        val l = compileVec(lhs, src, p)
        val r = compileVec(rhs, src, p)
        val isCmp = Set("==", "!=", ">", "<", ">=", "<=")(op)
        def cmp(a: Column, b: Column): Column = op match {
          case "==" => a === b; case "!=" => a =!= b
          case ">" => a > b; case "<" => a < b
          case ">=" => a >= b; case "<=" => a <= b
        }
        def apply(a: Column, b: Column): Column = op match {
          case "+" => a + b
          case "-" => a - b
          case "*" => a * b
          case "/" => a / b
        }
        if (isCmp) {
          // comparison = filter (or 1/0 projection under `bool`)
          (l.scalar, r.scalar) match {
            case (false, true) =>
              val rv = r.df.head().getDouble(0)
              val out =
                if (boolMode) l.df.withColumn("value",
                  when(cmp(col("value"), lit(rv)), 1.0).otherwise(0.0))
                else l.df.where(cmp(col("value"), lit(rv)))
              return Vec(out, l.labels, scalar = false)
            case (false, false) =>
              val matchOn =
                if (on.nonEmpty) on
                else l.labels.intersect(r.labels).filterNot(ignoring.contains)
              val keys = matchOn :+ "eval_ms"
              val rSide = r.df.withColumnRenamed("value", "__rv")
                .select((keys :+ "__rv").map(col): _*)
              val joined = l.df.join(broadcast(rSide), keys)
              val out =
                if (boolMode) joined.withColumn("value",
                  when(cmp(col("value"), col("__rv")), 1.0).otherwise(0.0))
                  .drop("__rv")
                else joined.where(cmp(col("value"), col("__rv"))).drop("__rv")
              return Vec(out, l.labels, scalar = false)
            case _ =>
              throw new IllegalArgumentException(
                s"unsupported comparison operands for $op")
          }
        }
        (l.scalar, r.scalar) match {
          case (true, true) =>
            val lv = l.df.head().getDouble(0)
            val rv = r.df.head().getDouble(0)
            compileVec(NumLit(evalScalar(op, lv, rv)), src, p)
          case (false, true) =>
            val rv = r.df.head().getDouble(0)
            Vec(l.df.withColumn("value", apply(col("value"), lit(rv))),
              l.labels, scalar = false)
          case (true, false) =>
            val lv = l.df.head().getDouble(0)
            Vec(r.df.withColumn("value", apply(lit(lv), col("value"))),
              r.labels, scalar = false)
          case (false, false) =>
            val matchOn =
              if (on.nonEmpty) on
              else (l.labels.intersect(r.labels)).filterNot(ignoring.contains)
            val keys = matchOn :+ "eval_ms"
            val rSide = r.df
              .withColumnRenamed("value", "__rv")
              .select((keys :+ "__rv").map(col): _*)
            // the one-side of a match is an aggregate: broadcast it
            val joined = l.df.join(broadcast(rSide), keys)
              .withColumn("value", apply(col("value"), col("__rv")))
              .drop("__rv")
            Vec(joined, l.labels, scalar = false)
        }
    }

  private def evalScalar(op: String, a: Double, b: Double): Double =
    op match {
      case "+" => a + b; case "-" => a - b
      case "*" => a * b; case "/" => a / b
    }

  /** Matcher-filtered, offset-shifted points for a selector. */
  private def selectorPoints(s: Selector, src: PromSource): DataFrame = {
    val ms = s.matchers ++
      s.name.map(n => graft.tsdb.MatchEq("__name__", n)).toSeq
    val filtered =
      if (ms.isEmpty) src.points
      else src.points.where(Matchers.all(src.resolve, ms))
    if (s.offsetMs == 0) filtered
    else filtered.withColumn(src.tsCol, col(src.tsCol) + s.offsetMs)
  }
}
