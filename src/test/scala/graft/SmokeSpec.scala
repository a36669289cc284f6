package graft

class SmokeSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("events parquet timestamps (nanos or micros) are readable via ts_ms") {
    val pts = Tables.points(spark, sfDir)
    assert(pts.count() === 1000)
    // ns→ms floor: all timestamps within 2024-01
    val row = pts.selectExpr("min(ts_ms)", "max(ts_ms)").head()
    assert(row.getLong(0) >= 1704067200000L)
    assert(row.getLong(1) < 1706659200000L)
  }

  test("flagship entry query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
