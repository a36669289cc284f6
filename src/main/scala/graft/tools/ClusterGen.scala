package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.GraftSession

/** Clustered-embedding generator for [[RecallProbe]]'s production-sizing
  * mode.
  *
  * ScaleGen's synthetic vectors are deliberately structure-free —
  * near-uniform on the sphere, the WORST case for every ANN method (each
  * r10 probe number is worst-case-indicative, SCALE.md). Real text/image
  * embeddings concentrate on manifolds; this tool plants that structure
  * as a mixture of Gaussians so the probe can answer the question a user
  * actually has: which (nProbe, codebook bits) reach recall@10 ≥ 0.9 on
  * clustered data.
  *
  * Each vector: pick a center c(id) (deterministic per id), emit
  * `normalize(center_c + sigma · N(0, I))`. Centers are unit-norm
  * Gaussian draws from a fixed seed. sigma controls cluster tightness
  * (0.15 ≈ within-cluster cosine ~0.9 at 64 dims; 0.5 ≈ loose overlap).
  * `label` carries the true cluster id — reusable as ground truth for
  * v4-v6. Schema matches the driver's embeddings table
  * (vec_id, embedding array<float>, label).
  *
  * Usage: ClusterGen [srcEmbeddings=sf0.1] [dstDir] [nClusters=32]
  *   [sigma=0.15] [seed=20260814] [nRows=src count]
  *
  * `nRows` overrides the source row count (dims still come from the
  * source schema) — the IVFADC head-to-head needs a corpus big enough
  * that ADC arithmetic, not per-query fixed floors, dominates.
  */
object ClusterGen {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dstDir =
      if (args.length > 1) args(1) else "/root/repo/benchdata/clustered"
    val nClusters = if (args.length > 2) args(2).toInt else 32
    val sigma = if (args.length > 3) args(3).toDouble else 0.15
    val seed = if (args.length > 4) args(4).toLong else 20260814L
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[16]")
        .config("spark.sql.shuffle.partitions", 16)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // shape from the source table: same row count and dims, so probe
    // timings compare like-for-like with the structure-free corpus
    val src = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val n = args.lift(5).map(_.toLong).getOrElse(src.count())
    val dims = src.selectExpr("size(embedding)").head().getInt(0)

    val rnd = new java.util.Random(seed)
    val centers = Array.fill(nClusters) {
      val v = Array.fill(dims)(rnd.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / norm).toFloat)
    }
    val bCenters = spark.sparkContext.broadcast(centers)

    val out = spark.range(n).map { id =>
      // per-id deterministic stream: partition layout can never change
      // the data (same discipline as ScaleGen's md5 sign flips)
      val r = new java.util.Random(seed ^ (id * 0x9E3779B97F4A7C15L))
      val cid = r.nextInt(nClusters)
      val c = bCenters.value(cid)
      val v = Array.tabulate(c.length)(d =>
        c(d) + sigma * r.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      (id, v.map(x => (x / norm).toFloat), s"c$cid")
    }.toDF("vec_id", "embedding", "label")

    out.write.mode(SaveMode.Overwrite)
      .parquet(s"$dstDir/embeddings.parquet")
    System.err.println(s"[clustergen] $n vectors, $dims dims, " +
      s"$nClusters clusters, sigma=$sigma -> $dstDir")
    spark.stop()
  }
}
