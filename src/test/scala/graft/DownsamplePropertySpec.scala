package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.Bits
import graft.tsdb.Downsample

/** Randomized cross-check of the downsampling kernel against a reference
  * implementation written directly from `aggregate/aggregate.go:43-137`,
  * with stale markers and ordinary NaNs injected at random positions.
  */
class DownsamplePropertySpec extends SparkSpec {
  import spark.implicits._

  private val R = 300000L

  private def refBucket(vs: Seq[Double]): Option[(Double, Double, Double, Long)] = {
    val nonStale = vs.filter(v =>
      java.lang.Double.doubleToRawLongBits(v) != Bits.StaleNaNBits)
    if (nonStale.isEmpty) return None // all-stale bucket dropped
    val finite = nonStale.filterNot(_.isNaN)
    val mn = if (finite.isEmpty) Bits.NormalNaN else finite.min
    val mx = if (finite.isEmpty) Bits.NormalNaN else finite.max
    // avg poisoned by any ordinary NaN (sequential sum)
    val sum = nonStale.sum
    val avg = if ((sum / nonStale.size).isNaN) Bits.NormalNaN
      else sum / nonStale.size
    Some((mn, mx, avg, nonStale.size.toLong))
  }

  private def sameBits(a: Double, b: Double): Boolean =
    java.lang.Double.doubleToRawLongBits(a) ==
      java.lang.Double.doubleToRawLongBits(b) || a == b

  test("random series with stale + NaN injections match the reference") {
    val rnd = new Random(424242L)
    val rows = (1 to 4).flatMap { sid =>
      (1 to 400).map { _ =>
        val ts = rnd.nextLong(40 * R)
        val v = rnd.nextInt(100) match {
          case n if n < 8 => Bits.StaleNaN
          case n if n < 14 => Double.NaN
          case _ => math.rint(rnd.nextDouble() * 10000) / 100
        }
        (sid.toLong, ts, v)
      }
    }
    val got = Downsample(rows.toDF("metric_id", "ts_ms", "value"),
        Seq(col("metric_id")), col("ts_ms"), col("value"), R)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getLong(5)))
      .toMap

    val want = rows.groupBy(r => (r._1, r._2 - r._2 % R))
      .flatMap { case (k, rs) =>
        // preserve input order for the sequential-sum avg
        refBucket(rs.map(_._3)).map(k -> _)
      }

    assert(got.keySet === want.keySet)
    var staleDropped = 0
    var nanAvg = 0
    for ((k, (wmn, wmx, wavg, wn)) <- want) {
      val (gmn, gmx, gavg, gn) = got(k)
      assert(gn === wn, s"count at $k")
      assert(sameBits(gmn, wmn), s"min at $k: $wmn vs $gmn")
      assert(sameBits(gmx, wmx), s"max at $k: $wmx vs $gmx")
      if (wavg.isNaN) {
        nanAvg += 1
        assert(java.lang.Double.doubleToRawLongBits(gavg) ===
          Bits.NormalNaNBits, s"avg at $k not NormalNaN")
      } else assert(math.abs(gavg - wavg) <=
        1e-9 * math.max(1.0, math.abs(wavg)), s"avg at $k")
    }
    staleDropped = rows.groupBy(r => (r._1, r._2 - r._2 % R))
      .count { case (_, rs) => rs.forall(r =>
        java.lang.Double.doubleToRawLongBits(r._3) == Bits.StaleNaNBits) }
    assert(nanAvg > 20, s"only $nanAvg NaN-poisoned buckets exercised")
    assert(got.size < rows.groupBy(r => (r._1, r._2 - r._2 % R)).size ||
      staleDropped == 0) // all-stale buckets really dropped
  }
}
