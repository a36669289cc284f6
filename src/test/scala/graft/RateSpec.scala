package graft

import graft.tsdb.Rate

/** Rate/increase goldens hand-computed from the public Prometheus
  * `extrapolatedRate` algorithm (promql/functions.go), which the reference
  * inherits by embedding the engine (`api/promql/engine.go:27`).
  */
class RateSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-9

  private def run(samples: Seq[(Long, Double)], evalMs: Long, rangeMs: Long,
      counter: Boolean = true) =
    Rate.overSteps(
      samples.toDF("ts_ms", "value")
        .withColumn("metric_id", org.apache.spark.sql.functions.lit(1L)),
      Seq("metric_id"), evalMs, evalMs, rangeMs, rangeMs, counter)
      .select("eval_ms", "n_samples", "delta_raw", "increase", "rate")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))

  test("steady counter: extrapolated increase recovers the true increase") {
    // 0,10,...,100 every 30 s; window (0, 300s]: 10 samples 10..100.
    // delta=90, si=270s, ds0=30s, de=0, ad=30s; zero-cut 30s not < 30s;
    // factor=300/270 → increase=100, rate=1/3.
    val samples = (0 to 10).map(i => (i * 30000L, i * 10.0))
    val Seq((e, n, d, inc, rate)) = run(samples, 300000L, 300000L).toSeq
    assert(e === 300000L && n === 10L)
    assert(math.abs(d - 90.0) < eps)
    assert(math.abs(inc - 100.0) < eps)
    assert(math.abs(rate - 100.0 / 300.0) < eps)
  }

  test("counter reset adds the pre-reset value") {
    // (0:10) (60s:20) (120s:5) (180s:15); window (0,180s]: 20,5,15.
    // reset at 120s → corr=20; delta=15-20+20=15; si=120s, ds0=60s<66s,
    // de=0; zero-cut 120s*(20/15)=160s not smaller; factor=1.5 → 22.5.
    val samples = Seq((0L, 10.0), (60000L, 20.0), (120000L, 5.0), (180000L, 15.0))
    val Seq((_, n, d, inc, rate)) = run(samples, 180000L, 180000L).toSeq
    assert(n === 3L)
    assert(math.abs(d - 15.0) < eps)
    assert(math.abs(inc - 22.5) < eps)
    assert(math.abs(rate - 0.125) < eps)
  }

  test("delta (counter=false): no reset correction, plain extrapolation") {
    val samples = Seq((0L, 10.0), (60000L, 20.0), (120000L, 5.0), (180000L, 15.0))
    val Seq((_, n, d, inc, _)) = run(samples, 180000L, 180000L, counter = false).toSeq
    assert(n === 3L)
    assert(math.abs(d - (-5.0)) < eps)
    assert(math.abs(inc - (-7.5)) < eps)
  }

  test("windows with fewer than 2 samples yield no row") {
    val samples = Seq((150000L, 42.0))
    assert(run(samples, 300000L, 300000L).isEmpty)
    // sample exactly at window-open boundary is excluded: (0, 300s]
    val boundary = Seq((0L, 1.0), (300000L, 2.0))
    val rows = run(boundary, 300000L, 300000L)
    assert(rows.isEmpty) // ts=0 is outside (0, 300000], only 1 sample left
  }

  test("zero-cut extrapolation caps the start extension") {
    // (240s:2) (300s:4): delta=2, si=60s, ds0=240s >= ad*1.1=66s → ad/2=30s;
    // zero-cut: si*(first/delta)=60s*1=60s, not < 30s → keep 30s.
    // de=0; factor=(60+30+0)/60=1.5 → increase=3.
    val samples = Seq((240000L, 2.0), (300000L, 4.0))
    val Seq((_, n, _, inc, _)) = run(samples, 300000L, 300000L).toSeq
    assert(n === 2L)
    assert(math.abs(inc - 3.0) < eps)
  }
}
