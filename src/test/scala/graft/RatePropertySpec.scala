package graft

import scala.util.Random

import graft.tsdb.Rate

/** Randomized cross-check of the declarative rate pipeline against an
  * independent straight-line Scala implementation of Prometheus
  * `extrapolatedRate` — catches algebra drift the hand goldens can't.
  */
class RatePropertySpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation (promql/functions.go extrapolatedRate),
    * written directly from the algorithm, independent of the SQL shape.
    */
  private def refIncrease(samples: Seq[(Long, Double)], evalMs: Long,
      rangeMs: Long, counter: Boolean): Option[Double] = {
    val in = samples.filter { case (t, _) => t > evalMs - rangeMs && t <= evalMs }
      .sortBy(_._1)
    if (in.size < 2) return None
    var corr = 0.0
    if (counter) {
      var prev = in.head._2
      for ((_, v) <- in.tail) {
        if (v < prev) corr += prev
        prev = v
      }
    }
    val delta = in.last._2 - in.head._2 + corr
    val si = (in.last._1 - in.head._1).toDouble
    val ds0 = (in.head._1 - (evalMs - rangeMs)).toDouble
    val de = (evalMs - in.last._1).toDouble
    val ad = si / (in.size - 1)
    val threshold = ad * 1.1
    var extStart = if (ds0 >= threshold) ad / 2.0 else ds0
    if (counter && delta > 0 && in.head._2 >= 0) {
      val dz = si * (in.head._2 / delta)
      if (dz < extStart) extStart = dz
    }
    val extEnd = if (de >= threshold) ad / 2.0 else de
    Some(delta * ((si + extStart + extEnd) / si))
  }

  test("random series: pipeline increase == reference implementation") {
    val rnd = new Random(20260812L)
    val rangeMs = 60000L
    val stepMs = 30000L
    val start = 0L
    val end = 600000L
    val series = (1 to 25).map { sid =>
      val n = 2 + rnd.nextInt(40)
      val ts = Seq.fill(n)(rnd.nextLong(end + rangeMs) - rangeMs / 2)
        .distinct.sorted
      sid.toLong -> ts.map(t => (t, math.rint(rnd.nextDouble() * 10000) / 100))
    }.toMap

    val df = series.toSeq
      .flatMap { case (sid, pts) => pts.map(p => (sid, p._1, p._2)) }
      .toDF("metric_id", "ts_ms", "value")
    val got = Rate.overSteps(df, Seq("metric_id"), start, end, stepMs,
        rangeMs, counter = true)
      .select("metric_id", "eval_ms", "increase")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap

    val evals = start to end by stepMs
    var checked = 0
    for ((sid, pts) <- series; e <- evals) {
      val want = refIncrease(pts, e, rangeMs, counter = true)
      val have = got.get((sid, e))
      (want, have) match {
        case (None, None) =>
        case (Some(w), Some(h)) =>
          assert(math.abs(w - h) <= 1e-9 * math.max(1.0, math.abs(w)),
            s"series $sid eval $e: ref $w pipeline $h")
          checked += 1
        case other =>
          fail(s"series $sid eval $e presence mismatch: $other " +
            s"(samples in window: ${pts.count(p => p._1 > e - rangeMs && p._1 <= e)})")
      }
    }
    assert(checked > 200, s"only $checked windows exercised")
    assert(got.size === series.toSeq.flatMap { case (sid, pts) =>
      evals.filter(e => refIncrease(pts, e, rangeMs, true).isDefined)
        .map(e => (sid, e))
    }.size)
  }
}
