package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines.
  *
  * All hashing is md5-based so results are portable across engines (the
  * correctness oracle recomputes them in DuckDB); at production scale md5
  * would be swapped for xxhash64 (same plan shape, cheaper hash).
  *
  * Plan shapes, 100 TB view:
  *  - exact dedup: single hash aggregate on the text digest — one shuffle of
  *    (digest, id), never the full text.
  *  - MinHash: explode (doc × shingle × k) then hash-aggregate min per
  *    (doc, k). Linear in corpus size, no pairwise work.
  *  - LSH bucketing: hash aggregate per (doc, band) then a self-join only
  *    within buckets — the classic way to avoid the O(n²) pair join.
  *  - verification (Jaccard) runs only on candidate pairs.
  */
object Dedup {

  /** Word tokens of a single-space separated text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** All word n-grams IN ORDER (duplicates kept) — the building block
    * for both the distinct shingle set and the repetition filter's
    * duplicate-fraction. Docs with fewer than n tokens yield an empty
    * array; the size guard matters because Spark's `sequence(1, 0)`
    * counts DOWN, fabricating windows for sub-length docs.
    */
  def grams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct word n-gram shingle set (order dropped, duplicates merged). */
  def shingles(text: Column, n: Int): Column =
    array_distinct(grams(text, n))

  /** Exact duplicate groups by content digest: (text_md5, keep_id, n_docs).
    * keep_id is the smallest doc id of the group (the canonical survivor).
    */
  def exact(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs
      .groupBy(md5(col(text)).as("text_md5"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** Per-permutation multiply-shift constants: odd 32-bit multiplier and
    * 32-bit addend derived from md5(h) — deterministic, so any engine can
    * be handed the same literals. Public so the correctness oracle embeds
    * identical constants in its SQL.
    */
  def permutationConstants(k: Int): Seq[(Long, Long)] = (0 until k).map { h =>
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(h.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // multiplier is 31-bit odd so a_h·x + b_h < 2^63 (x, b_h are 32-bit)
    ((java.lang.Long.parseLong(d.substring(0, 8), 16) & 0x7FFFFFFFL) | 1L,
      java.lang.Long.parseLong(d.substring(8, 16), 16))
  }

  /** Long-format MinHash signatures: (doc_id, h, minhash) for h in [0, k).
    * The classic multiply-shift construction: each shingle is digested
    * ONCE (md5 → 32-bit x), and permutation h is (a_h·x + b_h) mod 2^32
    * with per-h pseudorandom odd multipliers — so the per-row hashing cost
    * is independent of k (the r2 form salted a full md5 per (shingle, h):
    * k× the hash work, the dominant cost of the LSH pipeline at scale).
    * A single shared multiplier (a + h·b) is NOT enough: the same shingle
    * then wins most permutations and candidate volume explodes (measured
    * 40× at sf0.1). 32-bit operands keep a_h·x + b_h under 2^63 (no ANSI
    * overflow) and the arithmetic is bit-reproducible in any engine.
    */
  def minhash(docs: DataFrame, k: Int, shingleLen: Int,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val mask = lit(0xFFFFFFFFL)
    val sigs = permutationConstants(k).map { case (a, b) =>
      array_min(transform(col("xs"),
        x => (lit(a) * x + lit(b)).bitwiseAND(mask)))
    }
    docs
      .select(col(id), shingles(col(text), shingleLen).as("sh"))
      // digest once per shingle; the k permutations are pure arithmetic
      // over the digest array within the same projection
      .select(col(id), transform(col("sh"),
        s => conv(substring(md5(s), 1, 8), 16, 10).cast("long")).as("xs"))
      .select(col(id), posexplode(array(sigs: _*)))
      .toDF(id, "h", "minhash")
  }

  /** LSH band buckets from long-format signatures: (band, bucket, doc_id).
    * Docs sharing (band, bucket) are near-duplicate candidates.
    */
  def lshBuckets(sigs: DataFrame, rowsPerBand: Int): DataFrame =
    sigs
      .withColumn("band", (col("h") / rowsPerBand).cast("int"))
      .withColumn("hk", concat(lpad(col("h").cast("string"), 2, "0"),
        lit(":"), col("minhash")))
      .groupBy(col("doc_id"), col("band"))
      .agg(md5(array_join(array_sort(collect_list(col("hk"))), ",")).as("bucket"))
      .select("band", "bucket", "doc_id")

  /** Candidate pairs (a < b) sharing at least one LSH bucket, with skew
    * control: a within-bucket self-join is quadratic in bucket size, and
    * real corpora have boilerplate-heavy hot buckets (every exact-duplicate
    * group collapses into one bucket per band) — at 100 TB one hot bucket
    * is O(n²). Buckets larger than `maxBucket` therefore emit only a
    * hub-star (every member paired with the bucket's smallest doc_id):
    * O(n) per bucket, and the candidate graph stays connected, so
    * duplicate-CLUSTER recall is preserved — any member still reaches the
    * group through the hub — while pairwise enumeration inside mega-groups
    * is deliberately elided (standard LSH skew control; the alternative,
    * dropping the bucket, loses the group entirely).
    */
  def lshCandidates(buckets: DataFrame, maxBucket: Int = 32): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")
    val sized = buckets
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__hub", min(col("doc_id")).over(w))
    val small = sized.where(col("__n") <= maxBucket)
      .select("band", "bucket", "doc_id")
    val l = small.as("l")
    val r = small.as("r")
    val allPairs = l.join(r,
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
    val starPairs = sized.where(col("__n") > maxBucket &&
        col("doc_id") =!= col("__hub"))
      .select(col("__hub").as("doc_a"), col("doc_id").as("doc_b"))
    allPairs.unionByName(starPairs).distinct()
  }

  /** Benchmark decontamination (the published GPT-3 / The-Pile
    * discipline: drop training documents that share long word n-grams
    * with a held-out evaluation set, so benchmark answers don't leak
    * into training data). Returns (doc_id, n_overlap) — every training
    * doc sharing ≥1 n-gram shingle with ANY benchmark doc, with its
    * count of distinct overlapping shingles.
    *
    * Scale shape: both sides reduce to (id, shingle) pairs — the text
    * itself never shuffles; the benchmark's DISTINCT shingle set is
    * eval-set-sized (orders below the corpus) so the semi-join build
    * side stays broadcastable, and the training side streams through
    * one hash semi-join + count aggregate.
    */
  def decontaminate(train: DataFrame, bench: DataFrame, shingleLen: Int,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val tsh = train.select(col(id).as("doc_id"),
      explode(shingles(col(text), shingleLen)).as("sh"))
    val bsh = bench.select(explode(shingles(col(text), shingleLen)).as("sh"))
      .distinct()
    tsh.join(bsh, Seq("sh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
  }

  /** Exact n-gram Jaccard for given pairs. `pairs`: (doc_a, doc_b).
    * Computed via an explode + join on shingle value — set-oriented, never
    * materializes per-pair sets on the driver.
    */
  def jaccard(docs: DataFrame, pairs: DataFrame, shingleLen: Int,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val sh = docs.select(col(id).as("jd_id"),
      explode(shingles(col(text), shingleLen)).as("sh"))
    val sizes = sh.groupBy("jd_id").agg(count(lit(1)).as("n_sh"))
    // Intersection size per pair. BOTH the pair id and the shingle value
    // are join keys: joining on doc ids alone and filtering sh_a == sh_b
    // afterwards materializes an |sh_a|×|sh_b| cross product per pair
    // (observed 20× slowdown at sf0.1) — the equi-join on (doc, sh) keeps
    // it a hash join on composite keys.
    val inter = pairs
      .join(sh.select(col("jd_id").as("doc_a"), col("sh")), "doc_a")
      .join(sh.select(col("jd_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_inter"))
    // Left-join sizes: a doc shorter than the shingle length has an empty
    // shingle set (absent from `sizes`); its pairs must still surface, with
    // n=0 and jaccard null when the union is empty (0/0).
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0, Seq("n_inter"))
      .join(sizes.withColumnRenamed("jd_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), Seq("doc_a"), "left")
      .join(sizes.withColumnRenamed("jd_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), Seq("doc_b"), "left")
      .withColumn("n_union",
        coalesce(col("n_a"), lit(0L)) + coalesce(col("n_b"), lit(0L)) - col("n_inter"))
      .withColumn("jaccard",
        when(col("n_union") > 0,
          round(col("n_inter").cast("double") / col("n_union").cast("double"), 6)))
      .select("doc_a", "doc_b", "n_inter", "jaccard")
  }

  /** Near-dup CLUSTERING: connected components over the verified pair
    * graph (`jaccard >= threshold`) by iterative min-label propagation —
    * every doc in a duplicate component converges to the smallest doc id
    * reachable from it, the canonical representative a dedup pipeline
    * keeps (`keep = doc_id == cluster`). The loop is the standard
    * large-scale CC shape: O(component diameter) rounds, each ONE
    * edge–label equi-join + a min aggregate, labels pinned per round so
    * lineage stays flat — no graph library, no driver-side adjacency.
    * At 100 TB the edge list is candidate-pair-sized (LSH-bounded),
    * orders below the corpus.
    *
    * @param verified output of [[jaccard]]: (doc_a, doc_b, …, jaccard)
    */
  def dupClusters(verified: DataFrame, threshold: Double,
      maxIters: Int = 50): DataFrame = {
    val e = verified.where(col("jaccard") >= threshold)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val sym = e.unionByName(
        e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    // min-neighbor initialization instead of identity labels: one
    // aggregate over the (symmetric) edge list seeds every node with
    // min(self, smallest neighbor). Hub-star components — the shape LSH
    // skew-capping emits, with the hub already the bucket minimum —
    // converge AT INIT (every member's best neighbor IS the hub), so the
    // loop below runs only for chain-shaped components.
    // pinned: the loop reads labels twice per round, and a measured
    // un-pinned variant (recompute from the cached edge list) was slower
    var labels = sym.groupBy("src")
      .agg(min(col("dst")).as("__m"))
      .select(col("src").as("doc_id"),
        least(col("src"), col("__m")).as("cluster"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val nbrMin = sym
        .join(labels.select(col("doc_id").as("dst"),
          col("cluster").as("nc")), Seq("dst"))
        .groupBy("src").agg(min(col("nc")).as("nbr_min"))
        .withColumnRenamed("src", "doc_id")
      // the pre-propagate label rides along as __old, so the convergence
      // check needs no join back against `labels`; prop is pinned so the
      // change count AND the halving below both read cached partitions
      val prop = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster"),
            coalesce(col("nbr_min"), col("cluster"))).as("cluster"),
          col("cluster").as("__old"))
        .localCheckpoint(true)
      changed = prop
        .agg(coalesce(sum((col("cluster") < col("__old")).cast("long")),
          lit(0L))).head().getLong(0)
      labels =
        if (changed == 0) prop.drop("__old") // converged: halving is a no-op
        else {
          // pointer halving: cluster := cluster(cluster). Labels are node
          // ids of the same component and only decrease (label(x) ≤ x),
          // so the extra hop is safe and convergence drops from
          // O(diameter) to O(log diameter) rounds — the standard
          // CC-over-MapReduce acceleration, self-joining the PINNED prop.
          prop.alias("a")
            .join(prop.select(col("doc_id").as("__p"),
              col("cluster").as("__pc")),
              col("a.cluster") === col("__p"), "left")
            .select(col("a.doc_id").as("doc_id"),
              coalesce(col("__pc"), col("a.cluster")).as("cluster"))
            .localCheckpoint(true)
        }
      iter += 1
      if (sys.env.contains("GRAFT_DEBUG_CC"))
        System.err.println(s"[cc] round $iter changed=$changed")
    }
    // an unconverged result silently splits components (each fragment
    // with its own keep=true representative) — fail loudly instead
    require(changed == 0,
      s"dupClusters did not converge within $maxIters iterations " +
        "(component diameter exceeds the bound; raise maxIters)")
    labels.withColumn("keep", col("doc_id") === col("cluster"))
  }

  /** SimHash (60-bit, from the first 15 hex chars of each token's md5):
    * bit j of the signature is the sign of Σ_tokens (2·bit_j(h(token)) − 1).
    */
  def simhash(docs: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val tok = docs.select(col(id),
      explode(array_distinct(tokens(col(text)))).as("tok"))
      .withColumn("hbits", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
    tok
      .select(col(id), explode(sequence(lit(0), lit(59))).as("j"), col("hbits"))
      .withColumn("contrib",
        when(expr("shiftright(hbits, j)").bitwiseAND(1) === 1, lit(1))
          .otherwise(lit(-1)))
      .groupBy(col(id), col("j"))
      .agg(sum("contrib").as("s"))
      .groupBy(col(id))
      .agg(sum(when(col("s") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), j)")).otherwise(lit(0L))).as("simhash"))
  }
}
