package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.similarity.Ann.CentroidScale

/** Distributed linear-probe training by fixed-iteration batch gradient
  * descent — the "distill an expensive scorer into a cheap linear model"
  * step of a data-curation pipeline (a fastText-style quality classifier
  * reduced to its Spark-native core: the expensive score is computed once
  * over a corpus slice, a linear probe is fit to mimic it, and the probe —
  * five multiplies per document — gates the other 99% of the corpus).
  *
  * Engine-exact by the k-means discipline (`Ann.kmeans`):
  *  - the per-row prediction is an ordered IEEE fold over the feature
  *    vector (`aggregate(zip_with(x, w, *))`), bit-identical everywhere;
  *  - the cross-row gradient sum is order-INDEPENDENT: each per-row term
  *    xⱼ·r is floored onto the 2⁻⁴⁹ fixed-point grid (an exact double op,
  *    see `Ann.CentroidScale`) and summed as integer DECIMAL(38,0), so any
  *    partitioning — and the DuckDB oracle — produces the same gradient;
  *  - the learning rate is a power of two, so the weight update
  *    w − lr·g stays on exactly representable products;
  *  - iteration count is a small fixed constant: a bounded, reproducible
  *    pipeline stage, one corpus scan per iteration.
  *
  * Scale shape per iteration: the d weights ride as ONE broadcast row, the
  * gradient aggregate partial-combines to ≤ d groups map-side — the only
  * corpus-scale shuffle ships d rows per task. Nothing is collected to the
  * driver; the weight chain is a lazy one-row-DataFrame fold exactly like
  * the k-means centroid chain.
  */
object LinearProbe {

  /** Weight grid: each updated weight is floored onto 2⁻³⁰ — COARSER than
    * the 2⁻⁴⁹ gradient-term grid, deliberately. The gradient mean casts a
    * >2⁵³ integer DECIMAL to double, and that cast is not correctly
    * rounded in every engine (measured: DuckDB rounds -187489813713792112
    * to a double one ulp off nearest-even, where the JVM is exact), so
    * the raw updated weight can differ cross-engine in its last ulp. A
    * weight ulp (~6e-17 at w≈0.4) moves the 2³⁰-scaled value by ~6e-8, so
    * flooring onto this grid collapses the discrepancy except within
    * ~2⁻²³ of a grid boundary — the same absorb-the-ulp role
    * `Ann.CentroidScale` plays for k-means centroids, with the grid
    * chosen for the probe's precision needs (2⁻³⁰ is ten orders below any
    * meaningful quality-weight resolution).
    */
  val WeightScale: Double = 1073741824.0

  /** The trained one-row weight array (for inspection / reuse). */
  def fit(features: DataFrame, dims: Int, iters: Int, lr: Double,
      id: String = "doc_id", x: String = "x", y: String = "y"): DataFrame =
    fitPredictImpl(features, dims, iters, lr, id, x, y)._2

  /** Train on `(id, x: array<double>, y)` and score every row.
    *
    * @return (id, pred, y-passthrough) — `pred` is the trained probe's
    *         ordered-fold prediction for each input row
    */
  def fitPredict(features: DataFrame, dims: Int, iters: Int, lr: Double,
      id: String = "doc_id", x: String = "x", y: String = "y"): DataFrame =
    fitPredictImpl(features, dims, iters, lr, id, x, y)._1

  private def fitPredictImpl(features: DataFrame, dims: Int, iters: Int,
      lr: Double, id: String, x: String, y: String)
      : (DataFrame, DataFrame) = {
    // Every GD iteration AND the final predict re-reads the feature
    // relation — unpinned, Catalyst would recompute the caller's whole
    // featurization chain (regex feature extraction over raw text for
    // x17) once per pass: 7 featurizations for 6 iterations. The pin
    // materializes (id, x, y) once — corpus-scale and feeding hours of
    // downstream work, so it takes the durable staged-parquet form
    // ([[graft.store.Stage.pin]] discipline; measured at sf1: 41 s
    // unpinned → one featurization pass + d-wide iterations).
    // In-plan dims guard: a row whose feature array disagrees with
    // `dims` would otherwise cascade silently — posexplode emits js the
    // weight array lacks, element_at returns null, and every weight and
    // prediction goes null with no error. raise_error is lazy (costs
    // nothing when arrays conform) and rides the pin write, so the
    // mismatch fails the fit loudly at materialization time.
    // NULL feature arrays get their own branch: size(null) is null, so
    // the === dims test would route them to the size-mismatch error with
    // a message that misstates the problem. A null row is rejected (not
    // passed through) — a silent null would zero its gradient
    // contribution while still counting toward no row, skewing nothing
    // but hiding data corruption.
    val f = graft.store.Stage.pin(features.select(col(id),
      when(col(x).isNull, raise_error(concat(
        lit(s"LinearProbe: null feature array for ${id}="),
        col(id).cast("string"))).cast("array<double>"))
        .when(size(col(x)) === dims, col(x))
        .otherwise(raise_error(concat(
          lit(s"LinearProbe: feature array size != dims=$dims for ${id}="),
          col(id).cast("string")))).as("__x"),
      col(y).cast("double").as("__y")), "probe-features")
    val pred: Column = // ordered fold: 0.0 + x₀w₀ + x₁w₁ + … (fused)
      graft.functions.VectorOps.vecDot(col("__x"), col("__w"))
    // the weight row is a driver-built LITERAL each round (Ann.dimLit):
    // flat lineage — the t-th broadcast otherwise re-executes every
    // earlier GD round — and zero Spark work for the d-double reshape
    // (the old one-row w0 even scanned 32 empty range partitions)
    def wLit(ws: Seq[Double]): DataFrame = graft.similarity.Ann.dimLit(
      f.sparkSession, org.apache.spark.sql.types.DoubleType, ws, "__w")
    val w0 = wLit(Seq.fill(dims)(0.0))
    // ONE ≤ d-group gradient aggregate per iteration reaches Spark; the
    // nest-to-one-row reshape happens on the driver over d doubles (the
    // wj values are the collected aggregate outputs, bit-unchanged)
    def step(w: DataFrame): Seq[Double] =
      f.crossJoin(broadcast(w))
        .withColumn("__r", pred - col("__y"))
        .select(col("__w"), col("__r"),
          posexplode(col("__x")).as(Seq("j", "xj")))
        .select(col("j"),
          element_at(col("__w"), (col("j") + 1).cast("int")).as("wj"),
          // the gradient term xj·r quantizes through the saturation-
          // safe split sum (r16 audit: the naive floor(xj·r·2^49)
          // long-saturated at |xj·r| ≥ 2^14 — unnormalized features
          // times an early-training residual get there); the weight
          // round keeps double floor semantics at every magnitude
          (col("xj") * col("__r")).as("g"))
        .groupBy("j")
        .agg((graft.similarity.Ann.floorD((min(col("wj")) - lit(lr) *
          (graft.similarity.Ann.gridFloorSum(col("g")).cast("double") /
            count(lit(1)) / CentroidScale)) * WeightScale) / WeightScale)
          .as("wj"))
        .collect().toSeq.sortBy(_.getInt(0)).map(_.getDouble(1))
    val wT = (1 to iters).foldLeft(w0)((w, _) => wLit(step(w)))
    (f.crossJoin(broadcast(wT))
      .select(col(id), pred.as("pred"), col("__y").as("y")), wT)
  }
}
