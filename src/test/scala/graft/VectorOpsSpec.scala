package graft

import org.apache.spark.sql.functions._

import graft.similarity.Ann

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  /** The fused VecDot/VecSqDist must be drop-in for the composable
    * `aggregate(zip_with(...), 0.0, +)` form — same values bit-for-bit,
    * same null semantics (null array, length mismatch, null element).
    */
  private def foldDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  test("VecDot matches the interpreted fold bit-for-bit on float arrays") {
    val df = Seq(
      (1L, Array(0.1f, 0.2f, 0.3f), Array(0.7f, -0.5f, 0.11f)),
      (2L, Array(1e30f, -1e30f, 1.0f), Array(1.0f, 1.0f, 1.0f)),
      (3L, Array.empty[Float], Array.empty[Float]))
      .toDF("id", "a", "b")
    val got = df.select(col("id"), Ann.dot(col("a"), col("b")).as("f"),
        foldDot(col("a"), col("b")).as("g")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        s"row ${r.getLong(0)}")
    }
  }

  test("VecSqDist: length mismatch and null elements yield null, like " +
    "the zip_with form") {
    val df = Seq(
      (1L, Seq[Option[Double]](Some(1.0), Some(2.0)),
        Seq[Option[Double]](Some(1.0), Some(2.0), Some(3.0))),
      (2L, Seq[Option[Double]](Some(1.0), None),
        Seq[Option[Double]](Some(1.0), Some(2.0))),
      (3L, Seq[Option[Double]](Some(1.0), Some(5.0)),
        Seq[Option[Double]](Some(2.0), Some(3.0))))
      .toDF("id", "a", "b")
    val got = df.select(col("id"),
        Ann.sqdist(col("a"), col("b")).as("d")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got(1L) === None, "length mismatch -> null")
    assert(got(2L) === None, "null element -> null")
    assert(got(3L) === Some(1.0 + 4.0))
    // null array -> null
    val n = df.select(Ann.sqdist(lit(null).cast("array<double>"),
      col("b")).as("d")).collect()
    assert(n.forall(_.isNullAt(0)))
  }

  test("VecSqDist mixes float corpus against double centroids") {
    val df = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "emb")
    val got = df.select(Ann.sqdist(col("emb"),
      array(lit(0.5), lit(1.5))).as("d")).collect()(0).getDouble(0)
    assert(got === 0.25 + 0.25)
  }
}
