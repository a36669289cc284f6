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
      id: String = "doc_id", text: String = "text"): DataFrame =
    shingleHashes(docs, shingleLen, id, text)
      .select(col(id), posexplode(array(sigExprs(k): _*)))
      .toDF(id, "h", "minhash")

  /** (id, xs): each doc's distinct shingles digested ONCE to 32-bit hash
    * values — the shared front end of [[minhash]] and [[lshBucketsDirect]],
    * factored so the long-format oracle path and the direct execution path
    * cannot drift apart.
    */
  private def shingleHashes(docs: DataFrame, shingleLen: Int,
      id: String, text: String): DataFrame =
    docs.select(col(id), xsCol(col(text), shingleLen).as("xs"))

  /** The per-doc shingle-hash array (digest once per distinct shingle;
    * the k permutations are pure arithmetic over this array) — shared by
    * the batch LSH chain and [[graft.streaming.StreamNearDup]], so the
    * streaming gate's buckets are bit-identical to d3's.
    */
  private[graft] def xsCol(text: Column, shingleLen: Int): Column =
    transform(shingles(text, shingleLen),
      s => conv(substring(md5(s), 1, 8), 16, 10).cast("long"))

  /** The k per-permutation signature expressions over the `xs` array. */
  private def sigExprs(k: Int): Seq[Column] = {
    val mask = lit(0xFFFFFFFFL)
    permutationConstants(k).map { case (a, b) =>
      array_min(transform(col("xs"),
        x => (lit(a) * x + lit(b)).bitwiseAND(mask)))
    }
  }

  /** Zero-pad width for the `h` prefix inside band digests. Fixed at 5 so
    * lexicographic prefix order equals numeric h order for any practical
    * k (≤ 100000) — a width tied to 2 digits silently TRUNCATES h ≥ 100
    * under lpad, corrupting the within-band sort for k > 100.
    */
  private val HPad = 5

  /** LSH band buckets from long-format signatures: (band, bucket, doc_id).
    * Docs sharing (band, bucket) are near-duplicate candidates.
    */
  def lshBuckets(sigs: DataFrame, rowsPerBand: Int): DataFrame =
    sigs
      .withColumn("band", (col("h") / rowsPerBand).cast("int"))
      .withColumn("hk", concat(lpad(col("h").cast("string"), HPad, "0"),
        lit(":"), col("minhash")))
      .groupBy(col("doc_id"), col("band"))
      .agg(md5(array_join(array_sort(collect_list(col("hk"))), ",")).as("bucket"))
      .select("band", "bucket", "doc_id")

  /** LSH band buckets as a PURE PROJECTION — no explode, no shuffle.
    * Produces bit-identical buckets to `minhash` → [[lshBuckets]]: the
    * signature is born as a per-doc array in one projection, and each
    * band's bucket digest concatenates its `hh:minhash` entries in h
    * order, which IS the lexicographic order `lshBuckets` sorts into
    * (h is zero-padded). The long-format pair exists for portability
    * (the oracle recomputes it relationally); this is the execution
    * shape — at 100 TB the explode→groupBy round trip of the long form
    * shuffles k rows per document for no reason.
    */
  /** The nBands per-band bucket-digest expressions over the k named
    * signature columns `__s0..__s{k-1}` — factored so the batch path and
    * the streaming gate share the exact digest layout.
    */
  private[graft] def bandDigestCols(k: Int, rowsPerBand: Int): Seq[Column] = {
    require(k < 100000, s"k=$k exceeds the $HPad-digit h-prefix pad")
    val nBands = (k + rowsPerBand - 1) / rowsPerBand
    (0 until nBands).map { band =>
      val entries = (band * rowsPerBand until math.min((band + 1) * rowsPerBand, k))
        .map(h => concat(lit(s"%0${HPad}d:".format(h)), col(s"__s$h")))
      // concat_ws skips null entries the way collect_list drops null hk
      // rows in the long form (empty shingle set → all-null sigs → md5(""))
      md5(concat_ws(",", entries: _*))
    }
  }

  /** The k signature columns, named `__s0..` for [[bandDigestCols]]. */
  private[graft] def sigNamedCols(k: Int): Seq[Column] =
    sigExprs(k).zipWithIndex.map { case (c, h) => c.as(s"__s$h") }

  def lshBucketsDirect(docs: DataFrame, k: Int, shingleLen: Int,
      rowsPerBand: Int, id: String = "doc_id", text: String = "text"): DataFrame =
    shingleHashes(docs, shingleLen, id, text)
      .select(col(id) +: sigNamedCols(k): _*)
      .select(col(id), posexplode(array(bandDigestCols(k, rowsPerBand): _*)))
      .toDF(id, "band", "bucket")
      .select("band", "bucket", id)

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
    *
    * Scale shape: only docs that appear in a candidate pair need their
    * shingle sets, so the corpus is semi-joined down FIRST — the pair-id
    * set is LSH-bounded (≤ 2·|pairs|, orders below the corpus), so
    * non-candidate documents never pay the shingle computation and the
    * corpus text never shuffles through the reduction. The semi-join
    * carries NO broadcast hint: AQE broadcasts while the pair-member set
    * is small and falls back to a shuffled semi-join on a
    * duplication-heavy corpus where |members| approaches |corpus| — an
    * unconditional hint would OOM the driver there (same delegation as
    * hotColdMerge and the TTL dim). Each surviving doc
    * carries its shingle set as ONE array row (not an exploded
    * (doc, shingle) relation — the r8 form shuffled every shingle of
    * every corpus doc through two joins and a groupBy), and the
    * intersection is a linear-time `array_intersect` per pair.
    */
  def jaccard(docs: DataFrame, pairs: DataFrame, shingleLen: Int,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val ids = pairs.select(col("doc_a").as("__jid"))
      .unionByName(pairs.select(col("doc_b").as("__jid")))
      .distinct()
    val shArr = docs
      .join(ids, col(id) === col("__jid"), "left_semi")
      .select(col(id).as("__jid"), shingles(col(text), shingleLen).as("__shs"))
    val empty = array().cast("array<string>")
    // left joins: a pair member shorter than the shingle length (or absent
    // from `docs`) has an empty set; its pairs still surface, with n=0 and
    // jaccard null when the union is empty (0/0)
    pairs
      .join(shArr.select(col("__jid").as("doc_a"), col("__shs").as("__sa")),
        Seq("doc_a"), "left")
      .join(shArr.select(col("__jid").as("doc_b"), col("__shs").as("__sb")),
        Seq("doc_b"), "left")
      .withColumn("__sa", coalesce(col("__sa"), empty))
      .withColumn("__sb", coalesce(col("__sb"), empty))
      .withColumn("n_inter",
        size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("n_union",
        (size(col("__sa")) + size(col("__sb"))).cast("long") - col("n_inter"))
      .withColumn("jaccard",
        when(col("n_union") > 0,
          round(col("n_inter").cast("double") / col("n_union").cast("double"), 6)))
      .select("doc_a", "doc_b", "n_inter", "jaccard")
  }

  /** Edit-distance verification for candidate pairs: Levenshtein
    * distance plus the normalized similarity
    * `1 − lev(a, b) / max(|a|, |b|)` — the character-level complement
    * of [[jaccard]]'s set overlap (detects small in-place edits that
    * keep the shingle sets close; ranks templated spam by how literal
    * the copy is). `capChars` bounds the comparison to a document
    * PREFIX: Levenshtein is O(|a|·|b|) per pair, so production runs
    * verify the first 1–2 KB, the same discipline as hashing a
    * fingerprint prefix — the cap is part of the operator's contract,
    * not an approximation knob hidden inside it.
    *
    * Scale shape mirrors [[jaccard]]: only pair members are semi-joined
    * out of the corpus, each pair carries two capped strings through
    * ONE codegen'd `levenshtein`, and nothing else of the corpus text
    * moves. Distances are exact integers (both engines implement unit
    * edit cost over codepoints), so the normalized ratio is
    * bit-identical cross-engine.
    */
  def editVerify(docs: DataFrame, pairs: DataFrame, capChars: Int,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val ids = pairs.select(col("doc_a").as("__eid"))
      .unionByName(pairs.select(col("doc_b").as("__eid")))
      .distinct()
    val txt = docs
      .join(ids, col(id) === col("__eid"), "left_semi")
      .select(col(id).as("__eid"),
        substring(col(text), 1, capChars).as("__t"))
    // left joins: an absent pair member compares as "" (distance =
    // the other side's length, similarity 0 unless both empty → null)
    pairs
      .join(txt.select(col("__eid").as("doc_a"), col("__t").as("__ta")),
        Seq("doc_a"), "left")
      .join(txt.select(col("__eid").as("doc_b"), col("__t").as("__tb")),
        Seq("doc_b"), "left")
      .withColumn("__ta", coalesce(col("__ta"), lit("")))
      .withColumn("__tb", coalesce(col("__tb"), lit("")))
      .withColumn("edit_dist",
        levenshtein(col("__ta"), col("__tb")).cast("long"))
      .withColumn("edit_sim",
        when(greatest(length(col("__ta")), length(col("__tb"))) > 0,
          lit(1.0) - col("edit_dist").cast("double") /
            greatest(length(col("__ta")), length(col("__tb")))
              .cast("double")))
      .select("doc_a", "doc_b", "edit_dist", "edit_sim")
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
    // pin the HALF-size edge list, not the mirrored union: a checkpoint
    // after the union would run the whole jaccard chain once per branch,
    // and a distinct would add a shuffle that min-aggregates (duplicate-
    // insensitive) never needed. The mirror is a narrow union over the
    // pinned partitions — free to recompute.
    val t0 = System.nanoTime()
    def dbg(msg: String): Unit =
      if (sys.env.contains("GRAFT_DEBUG_CC"))
        System.err.println(f"[cc] +${(System.nanoTime() - t0) / 1e9}%.2fs $msg")
    // durable pin (Stage.pin): the edge list is candidate-pair-scale —
    // far below the corpus but still data-proportional, and everything
    // downstream hangs off it
    val e = graft.store.Stage.pin(
      verified.where(col("jaccard") >= threshold)
        .select(col("doc_a").as("src"), col("doc_b").as("dst")), "cc-edges")
    dbg("edges pinned")
    val sym = e.unionByName(
      e.select(col("dst").as("src"), col("src").as("dst")))
    // min-neighbor initialization instead of identity labels: one
    // aggregate over the (symmetric) edge list seeds every node with
    // min(self, smallest neighbor). Hub-star components — the shape LSH
    // skew-capping emits, with the hub already the bucket minimum —
    // converge AT INIT (every member's best neighbor IS the hub), so the
    // loop below typically runs ONE probe round for convergence proof.
    // pinned DURABLY (Stage.pin, like the edges): the loop reads labels
    // twice per round, and a measured un-pinned variant (recompute from
    // the cached edge list) was slower. The PER-ROUND pins below stay
    // localCheckpoint — losing one costs re-running the loop from these
    // two durable pins, a bounded restart, not the whole LSH chain
    var labels = graft.store.Stage.pin(sym.groupBy("src")
      .agg(min(col("dst")).as("__m"))
      .select(col("src").as("doc_id"),
        least(col("src"), col("__m")).as("cluster")), "cc-labels0")
    dbg("labels initialized")
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val nbrMin = sym
        .join(labels.select(col("doc_id").as("dst"),
          col("cluster").as("nc")), Seq("dst"))
        .groupBy("src").agg(min(col("nc")).as("nbr_min"))
        .withColumnRenamed("src", "doc_id")
      // the pre-propagate label rides along as __old, so the convergence
      // check needs no join back against `labels`
      val propPlan = labels.join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster"),
            coalesce(col("nbr_min"), col("cluster"))).as("cluster"),
          col("cluster").as("__old"))
      // probe FIRST with a bare aggregate — the common case (hub-star
      // components converged at init) then pays one action and zero
      // checkpoints; only a round that actually changed labels
      // materializes the propagated frame for the halving self-join
      changed = propPlan
        .agg(coalesce(sum((col("cluster") < col("__old")).cast("long")),
          lit(0L))).head().getLong(0)
      if (changed > 0) {
        val prop = propPlan.localCheckpoint(true)
        // pointer halving: cluster := cluster(cluster). Labels are node
        // ids of the same component and only decrease (label(x) ≤ x),
        // so the extra hop is safe and convergence drops from
        // O(diameter) to O(log diameter) rounds — the standard
        // CC-over-MapReduce acceleration, self-joining the PINNED prop.
        labels = prop.alias("a")
          .join(prop.select(col("doc_id").as("__p"),
            col("cluster").as("__pc")),
            col("a.cluster") === col("__p"), "left")
          .select(col("a.doc_id").as("doc_id"),
            coalesce(col("__pc"), col("a.cluster")).as("cluster"))
          .localCheckpoint(true)
      }
      iter += 1
      dbg(s"round $iter changed=$changed")
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
