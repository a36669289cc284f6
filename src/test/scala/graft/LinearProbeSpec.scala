package graft

import org.apache.spark.sql.functions._

import graft.ml.LinearProbe

class LinearProbeSpec extends SparkSpec {
  import spark.implicits._

  test("fitPredict converges toward an exactly linear target") {
    // y = 0.25 + 0.5·x1 — representable weights, well-conditioned design
    val rows = (0 until 64).map { i =>
      val x1 = (i % 8).toDouble / 8.0
      (i.toLong, Array(1.0, x1), 0.25 + 0.5 * x1)
    }
    val df = rows.toDF("doc_id", "x", "y")
    def maxErr(iters: Int): Double =
      LinearProbe.fitPredict(df, 2, iters, 0.5).collect()
        .map(r => math.abs(r.getDouble(1) - r.getDouble(2))).max
    // GD contraction for this design is |1 − lr·λmin| ≈ 0.92/iter, so 40
    // iterations ≈ 0.92⁴⁰ ≈ 0.04 of the initial error — check the rate,
    // not an arbitrary small threshold
    val (e5, e40) = (maxErr(5), maxErr(40))
    assert(e40 < 0.05, s"probe should approach the linear target, err=$e40")
    assert(e40 < e5 / 2, s"error must contract with iterations: $e5 -> $e40")
  }

  test("weights are invariant under repartitioning (fixed-point gradient)") {
    val rows = (0 until 50).map { i =>
      (i.toLong, Array(1.0, i.toDouble / 50.0, (i % 7).toDouble / 7.0),
        (i % 3).toDouble / 3.0)
    }
    val df = rows.toDF("doc_id", "x", "y")
    def w(d: org.apache.spark.sql.DataFrame) =
      LinearProbe.fit(d, 3, 6, 0.5).collect()(0).getSeq[Double](0)
    assert(w(df) === w(df.repartition(13)),
      "decimal-accumulated gradients must not depend on partitioning")
  }

  test("every trained weight sits on the 2^-30 grid") {
    val rows = (0 until 30).map(i =>
      (i.toLong, Array(1.0, (i % 5).toDouble / 5.0), (i % 2).toDouble))
    val df = rows.toDF("doc_id", "x", "y")
    val ws = LinearProbe.fit(df, 2, 4, 0.5).collect()(0).getSeq[Double](0)
    ws.foreach { v =>
      val scaled = v * LinearProbe.WeightScale
      assert(scaled == math.floor(scaled),
        s"weight $v is off the WeightScale grid")
    }
  }
}
