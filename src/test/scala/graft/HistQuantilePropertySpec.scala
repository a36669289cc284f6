package graft

import org.apache.spark.sql.functions._

import graft.promql.{Compiler, EvalParams, PromSource}

/** histogram_quantile: the compiled bucket interpolation must agree
  * bit-for-bit with an independent Scala port of Prometheus'
  * `bucketQuantile` (promql/quantile.go) over randomized histograms —
  * including zero buckets, ties, ranks on bucket edges, φ at the +Inf
  * bucket, and invalid histograms (no +Inf, single bucket → NaN).
  */
class HistQuantilePropertySpec extends SparkSpec {
  import spark.implicits._

  /** Straight port of the Prometheus algorithm (buckets sorted by le,
    * cumulative counts).
    */
  private def ref(phi: Double, buckets: Seq[(Double, Double)]): Double = {
    if (buckets.size < 2 || !buckets.last._1.isPosInfinity) return Double.NaN
    if (phi < 0) return Double.NegativeInfinity
    if (phi > 1) return Double.PositiveInfinity
    val total = buckets.last._2
    var rank = phi * total
    val b = buckets.indexWhere(_._2 >= rank)
    if (b == buckets.length - 1) buckets(buckets.length - 2)._1
    else if (b == 0 && buckets.head._1 <= 0) buckets.head._1
    else {
      var start = 0.0
      val end = buckets(b)._1
      var count = buckets(b)._2
      if (b > 0) {
        start = buckets(b - 1)._1
        count -= buckets(b - 1)._2
        rank -= buckets(b - 1)._2
      }
      start + (end - start) * (rank / count)
    }
  }

  private val t0 = 1704067200000L

  test("compiled histogram_quantile == Prometheus bucketQuantile (random)") {
    val rnd = new scala.util.Random(42)
    val ladders = Seq(
      Seq(0.1, 0.5, 1.0, 5.0), Seq(-1.0, 0.0, 2.0), Seq(10.0),
      Seq(0.25, 0.5, 1.0, 2.0, 4.0, 8.0))
    val histos: Seq[(String, Seq[(Double, Double)])] =
      (0 until 200).map { i =>
        val ladder = ladders(rnd.nextInt(ladders.size))
        var cum = 0.0
        val finite = ladder.map { le =>
          cum += rnd.nextInt(5) // zeros and ties are common on purpose
          (le, cum)
        }
        (s"g$i", finite :+ (Double.PositiveInfinity, cum + rnd.nextInt(3)))
      } ++ Seq(
        // invalid: highest bucket not +Inf → NaN
        ("bad_noinf", Seq((0.5, 1.0), (1.0, 2.0))),
        // invalid: single bucket → NaN
        ("bad_single", Seq((Double.PositiveInfinity, 5.0))),
        // empty histogram (all-zero counts): 0/0 → NaN as in Prometheus
        ("zero", Seq((0.5, 0.0), (1.0, 0.0), (Double.PositiveInfinity, 0.0))))
    val rows = histos.flatMap { case (g, bs) =>
      bs.map { case (le, c) =>
        val leStr = if (le.isPosInfinity) "+Inf" else le.toString
        (g, leStr, t0, c)
      }
    }
    val df = rows.toDF("g", "le", "ts_ms", "value")
    val src = PromSource(df, Seq("g", "le"), {
      case "__name__" => lit("m")
      case "g" => col("g")
      case "le" => col("le")
    })
    for (phi <- Seq(0.0, 0.5, 0.9, 0.99, 1.0)) {
      val got = Compiler.compile(s"histogram_quantile($phi, m)", src,
        EvalParams(t0, t0, 3600000L))
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      histos.foreach { case (g, bs) =>
        val want = ref(phi, bs)
        val gv = got(g)
        assert((gv.isNaN && want.isNaN) || gv === want,
          s"phi=$phi g=$g buckets=$bs: got $gv want $want")
      }
    }
  }
}
