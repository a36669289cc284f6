package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.similarity.Ann

/** Scaling-discipline probe for SemDeDup: the registered d9 query holds
  * k fixed (oracle parity needs a pinned constant), so a 10× corpus
  * makes each cell 10× larger and the within-cell pair term quadratic —
  * the published method instead GROWS k with the corpus so cells stay
  * constant-sized (Abbas et al. 2023; `Ann.semdedup` scaladoc). This
  * probe measures both variants at a given scale so SCALE.md can carry
  * the number, not just the argument.
  *
  * Usage: ScaleProbe <sfDir> <kFixed> <kScaled> [iters]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val kFixed = args(1).toInt
    val kScaled = args(2).toInt
    val iters = if (args.length > 3) args(3).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def run(k: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = Ann.semdedup(vecs, k, iters, 0.9).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    run(kFixed) // warmup pass: JVM/codegen
    val (tF, nF) = run(kFixed)
    val (tS, nS) = run(kScaled)
    println(s"""{"sf":"$sfDir","k_fixed":$kFixed,"sec_fixed":$tF,""" +
      s""""pairs_fixed":$nF,"k_scaled":$kScaled,"sec_scaled":$tS,""" +
      s""""pairs_scaled":$nS}""")
    spark.stop()
  }
}
