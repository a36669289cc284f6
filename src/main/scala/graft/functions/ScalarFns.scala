package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PromQL scalar-function layer (SURVEY §2.7). The reference implements no
  * scalar library of its own — the embedded engine provides math/date/label
  * functions; here each maps to a codegen'd Spark builtin (never a UDF).
  */
object ScalarFns {

  /** clamp(v, min, max) — PromQL clamp / clamp_min / clamp_max compose. */
  def clamp(v: Column, lo: Double, hi: Double): Column =
    least(greatest(v, lit(lo)), lit(hi))

  /** PromQL day_of_week: 0 = Sunday (Spark's dayofweek is 1 = Sunday). */
  def dayOfWeek(ts: Column): Column = dayofweek(ts) - 1

  def daysInMonth(ts: Column): Column = dayofmonth(last_day(ts))

  /** PromQL label_replace(v, dst, replacement, src, regex): when the
    * anchored regex matches the (missing → empty) src value, dst is set to
    * the expanded replacement; an empty expansion removes dst. Java-regex
    * replacement syntax ($1); callers stay in the RE2 ∩ Java dialect.
    */
  def labelReplace(labels: Column, dst: String, replacement: String,
      src: String, regex: String): Column = {
    val anchored = "^(?:" + regex + ")$"
    val srcVal = coalesce(labels.getItem(src), lit(""))
    val newVal = regexp_replace(srcVal, anchored, replacement)
    val without = map_filter(labels, (k, _) => k =!= dst)
    when(!srcVal.rlike(anchored), labels)
      .when(newVal === "", without)
      .otherwise(map_concat(without, map(lit(dst), newVal)))
  }

  /** PromQL label_join(v, dst, sep, srcs…): dst = srcs joined by sep. */
  def labelJoin(labels: Column, dst: String, sep: String,
      srcs: Seq[String]): Column = {
    val joined = concat_ws(sep,
      srcs.map(s => coalesce(labels.getItem(s), lit(""))): _*)
    map_concat(map_filter(labels, (k, _) => k =!= dst), map(lit(dst), joined))
  }

  /** Prometheus histogram_quantile over FIXED cumulative buckets given as
    * (le, cumulative count) column pairs sorted by le, +Inf last. Linear
    * interpolation within the located bucket; rank below the first finite
    * bucket interpolates from 0 (promql/quantile.go bucketQuantile).
    * All arithmetic on exact longs + literal bounds → engine-portable.
    */
  def histogramQuantile(q: Double, les: Seq[Double],
      cums: Seq[Column]): Column = {
    require(les.nonEmpty && les.last.isPosInfinity)
    val total = cums.last.cast("double")
    val rank = lit(q) * total
    // walk buckets from the end: result = interpolation at the FIRST
    // bucket (lowest le) whose cumulative count >= rank
    val lastFinite = lit(les(les.length - 2))
    val init: Column = lastFinite // rank falls in the +Inf bucket
    (les.length - 2 to 0 by -1).foldLeft(init) { (acc, i) =>
      val cum = cums(i).cast("double")
      val prev = if (i == 0) lit(0.0) else cums(i - 1).cast("double")
      val lo = if (i == 0) lit(0.0) else lit(les(i - 1))
      val hi = lit(les(i))
      val interp = lo + (hi - lo) * (rank - prev) / (cum - prev)
      when(cum >= rank, interp).otherwise(acc)
    }
  }
}
