package graft

import org.apache.spark.sql.functions._

import graft.functions.Bits
import graft.tsdb.Downsample

/** Downsampling kernel semantics per the reference's golden tests
  * (`aggregate/aggregate_test.go`, behavior at `aggregate/aggregate.go:
  * 43-137`): StaleNaN excluded everywhere, all-stale bucket dropped,
  * ordinary NaN poisons avg (emitted as NormalNaN), min/max ignore
  * ordinary NaN unless every sample is NaN.
  */
class DownsampleSpec extends SparkSpec {
  import spark.implicits._

  private val R = 300000L // 5 min

  private def run(points: Seq[(Long, Double)]) =
    Downsample(
      points.toDF("ts_ms", "value").withColumn("metric_id", lit(1L)),
      Seq(col("metric_id")), col("ts_ms"), col("value"), R)
      .select("bucket_ms", "min", "max", "avg", "count")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
      .sortBy(_._1)

  test("bucket key is ts - ts % resolution; plain min/max/avg/count") {
    val rows = run(Seq((0L, 2.0), (299999L, 4.0), (300000L, 10.0)))
    assert(rows === Seq((0L, 2.0, 4.0, 3.0, 2L), (300000L, 10.0, 10.0, 10.0, 1L)))
  }

  test("StaleNaN samples are skipped; count excludes them") {
    val rows = run(Seq((0L, 2.0), (1000L, Bits.StaleNaN), (2000L, 6.0)))
    assert(rows === Seq((0L, 2.0, 6.0, 4.0, 2L)))
  }

  test("all-stale bucket is dropped entirely") {
    val rows = run(Seq((0L, Bits.StaleNaN), (1000L, Bits.StaleNaN),
      (300000L, 1.0)))
    assert(rows === Seq((300000L, 1.0, 1.0, 1.0, 1L)))
  }

  test("ordinary NaN poisons avg (as NormalNaN) but min/max ignore it") {
    val rows = run(Seq((0L, 2.0), (1000L, Double.NaN), (2000L, 6.0)))
    assert(rows.length === 1)
    val (b, mn, mx, avg, n) = rows.head
    assert(b === 0L && mn === 2.0 && mx === 6.0 && n === 3L)
    assert(java.lang.Double.doubleToRawLongBits(avg) === Bits.NormalNaNBits)
  }

  test("all-ordinary-NaN bucket: min/max/avg all NormalNaN, count kept") {
    val rows = run(Seq((0L, Double.NaN), (1000L, Double.NaN)))
    assert(rows.length === 1)
    val (_, mn, mx, avg, n) = rows.head
    assert(n === 2L)
    for (v <- Seq(mn, mx, avg))
      assert(java.lang.Double.doubleToRawLongBits(v) === Bits.NormalNaNBits)
  }

  test("A3: function→column routing is counter-safe (rate family reads max)") {
    import graft.tsdb.PreAgg
    assert(PreAgg.columnFor("min_over_time") === "min")
    assert(PreAgg.columnFor("max") === "max")
    assert(PreAgg.columnFor("count_over_time") === "count")
    // averaging a counter would fabricate resets; the reference routes the
    // whole rate family to Max (cassandra/tsdb/read.go:604-609)
    for (f <- Seq("rate", "irate", "increase", "resets"))
      assert(PreAgg.columnFor(f) === "max")
    assert(PreAgg.columnFor("avg") === "avg")
    assert(PreAgg.columnFor("anything_else") === "avg")
  }

  test("StaleNaN detection is exact-bit: ordinary NaN is NOT stale") {
    val df = Seq(Bits.StaleNaN, Double.NaN, Bits.NormalNaN, 1.0)
      .toDF("value")
    val stale = df.where(Bits.isStaleNaN(col("value"))).count()
    assert(stale === 1L)
    // and the staleNaN literal survives codegen/optimization with payload
    val bits = spark.range(1)
      .select(Bits.doubleBits(Bits.staleNaN).as("b")).head().getLong(0)
    assert(bits === Bits.StaleNaNBits)
  }
}
