package graft.tsdb

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (ts, value) sample for order-sensitive aggregation. */
final case class TsSample(ts: Long, v: Double)

/** Prometheus double exponential smoothing (`holt_winters`, promql
  * funcDoubleExponentialSmoothing) as a custom Aggregator — the one range
  * function whose recursion over time-ordered samples cannot be expressed
  * with built-in aggregates (SURVEY §2.10). The buffer accumulates the
  * window's samples unordered (merge is concatenation, so partial
  * aggregation stays associative); `finish` sorts once and runs the exact
  * smoothing recursion:
  *
  * {{{
  * s0 = v(0); b = v(1) - v(0)
  * for i >= 1: s1 = sf·v(i) + (1-sf)·(s0 + b)
  *             b  = tf·(s1 - s0) + (1-tf)·b
  *             s0 = s1
  * return s0          (< 2 samples → null, as PromQL drops the point)
  * }}}
  *
  * State is bounded by samples-per-window (range/scrape-interval), not by
  * partition size.
  */
final class HoltWintersAgg(sf: Double, tf: Double)
  extends Aggregator[TsSample, List[TsSample], Option[Double]] {

  override def zero: List[TsSample] = Nil

  override def reduce(buf: List[TsSample], x: TsSample): List[TsSample] =
    x :: buf

  override def merge(a: List[TsSample], b: List[TsSample]): List[TsSample] =
    a ::: b

  override def finish(buf: List[TsSample]): Option[Double] = {
    if (buf.lengthCompare(2) < 0) return None
    val v = buf.sortBy(s => (s.ts, s.v)).map(_.v)
    var s0 = v(0)
    var b = v(1) - v(0)
    var i = 1
    while (i < v.length) {
      val s1 = sf * v(i) + (1 - sf) * (s0 + b)
      b = tf * (s1 - s0) + (1 - tf) * b
      s0 = s1
      i += 1
    }
    Some(s0)
  }

  override def bufferEncoder: Encoder[List[TsSample]] =
    ExpressionEncoder[List[TsSample]]()

  override def outputEncoder: Encoder[Option[Double]] =
    ExpressionEncoder[Option[Double]]()
}
