package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Scale-up generator for the round-10 scaling-curve measurement: builds
  * an sf1-equivalent dataset (factor× the sf0.1 tables) under the repo's
  * own benchdata dir, WITHOUT touching the read-only driver testdata.
  *
  * A naive `union` of identical replicas would corrupt the measurement:
  * every document would gain factor−1 exact duplicates (LSH candidate
  * pairs grow quadratically in the replica count) and every embedding
  * factor−1 clones (cosine 1.0 pairs everywhere) — the curve would then
  * measure the planted blowup, not the operators. Replicas are therefore
  * DECORRELATED while preserving each replica's internal structure:
  *
  *  - documents: replica i > 0 suffixes every token with `_r{i}` — all
  *    shingles/tokens differ across replicas (zero cross-replica Jaccard
  *    or shared vocabulary) while within-replica duplicate structure is
  *    byte-preserved, so corpus-wide dup DENSITY is constant;
  *  - embeddings: replica i applies a deterministic md5-derived ±1 sign
  *    flip per dimension — an isometry (within-replica cosines and
  *    distances bit-preserved) that sends cross-replica cosines to ~0;
  *  - events: ids shift (event_id, user_id), so the series/user universe
  *    grows factor× with per-series history unchanged — the 100 TB shape
  *    (more series, not longer ones).
  *
  * Ids shift by i·10^7 (docs/vecs), i·10^9 (users), i·10^12 (events) —
  * far above the planted-duplicate id ranges the query corpus() uses, so
  * those plants stay replica-0-only and constant-sized.
  */
object ScaleGen {

  private def signFlip(tag: String, i: Int, d: Int): Float = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$tag$i-$d".getBytes("UTF-8"))
    if ((h(0) & 1) == 0) 1.0f else -1.0f
  }

  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dstDir = if (args.length > 1) args(1) else "/root/repo/benchdata/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    // second-decade stacking (sf1 → sf10): the source is itself a
    // replicated generation, so (a) id strides must clear the WHOLE
    // source id span — `strideMult` scales every stride by the source's
    // own replica factor — and (b) the decorrelation seeds must differ
    // from the source generation's, or replica i of this run would apply
    // the EXACT sign pattern / token suffix the source's replica i
    // already carries (identical vectors → cosine-1 cross-pairs, shared
    // suffixed vocabulary → planted cross-replica shingle overlap)
    val strideMult = if (args.length > 3) args(3).toLong else 1L
    val tag = if (args.length > 4) args(4) else "r"
    // optional table filter (csv; default all): a probe that needs one
    // decade-scaled table should not pay the whole generation — e.g. the
    // d9 cluster re-run needs only `embeddings` at sf100
    val only: Set[String] =
      if (args.length > 5) args(5).split(",").toSet else Set.empty
    def wanted(t: String): Boolean = only.isEmpty || only(t)
    val seedTag = if (tag == "r") "sf" else s"sf-$tag-"
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[16]")
        .config("spark.sql.shuffle.partitions", 16))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(dstDir))

    // dimension tables ride along unchanged (queries outside the scaling
    // headline still need them to resolve)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem") if wanted(t)) {
      val s = Paths.get(srcDir, s"$t.parquet")
      if (Files.isRegularFile(s))
        Files.copy(s, Paths.get(dstDir, s"$t.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
      else
        spark.read.parquet(s.toString).write.mode(SaveMode.Overwrite)
          .parquet(Paths.get(dstDir, s"$t.parquet").toString)
    }

    def replicate(table: String)(tx: (DataFrame, Int) => DataFrame): Unit = {
      if (!wanted(table)) return
      val base = spark.read.parquet(s"$srcDir/$table.parquet")
      val out = (0 until factor).map(i => tx(base, i)).reduce(_ unionByName _)
      out.write.mode(SaveMode.Overwrite)
        .parquet(s"$dstDir/$table.parquet")
      System.err.println(s"[scalegen] $table ×$factor done")
    }

    replicate("documents") { (df, i) =>
      val txt =
        if (i == 0) col("text")
        else array_join(
          transform(split(col("text"), " "), t => concat(t, lit(s"_$tag$i"))),
          " ")
      df.select(
        (col("doc_id") + lit(i * 10000000L * strideMult)).as("doc_id"),
        txt.as("text"), col("lang"), col("source"),
        length(txt).cast("long").as("n_chars"))
    }

    val dims =
      if (!wanted("embeddings")) 0
      else spark.read.parquet(s"$srcDir/embeddings.parquet")
        .select(size(col("embedding"))).head().getInt(0)
    replicate("embeddings") { (df, i) =>
      val emb =
        if (i == 0) col("embedding")
        else zip_with(col("embedding"),
          array((0 until dims).map(d => lit(signFlip(seedTag, i, d))): _*),
          (x, s) => (x * s).cast("float"))
      df.select((col("vec_id") + lit(i * 10000000L * strideMult)).as("vec_id"),
        emb.as("embedding"), col("label"))
    }

    replicate("events") { (df, i) =>
      df.select(
        (col("event_id") + lit(i * 1000000000000L * strideMult))
          .as("event_id"),
        col("ts"),
        (col("user_id") + lit(i * 1000000000L * strideMult)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }

    spark.stop()
  }
}
