package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: token counting, quality
  * scoring, language identification, and document fingerprinting. All
  * expressions are engine-portable (verified against a DuckDB oracle) and
  * codegen-friendly — no UDFs in the scan path.
  */
object TextOps {

  /** Number of word tokens ([a-z0-9]+ runs, case-insensitive). */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0)))

  /** BPE-ish subword count: alphanumeric runs are split every 4 chars,
    * other printable symbols count one token each — a cheap deterministic
    * stand-in for a real tokenizer's token count.
    */
  def subwordCount(text: Column): Column = {
    val runs = regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))
    val sym = size(regexp_extract_all(text, lit("[^a-zA-Z0-9\\s]"), lit(0)))
    aggregate(runs, lit(0),
      (acc, r) => acc + ceil(length(r) / 4.0).cast("int")) + sym
  }

  /** Deterministic stratified sampling for corpus curation: the k docs
    * per stratum with the smallest `md5(id)` — a seedless,
    * engine-portable "random" order (any engine computes the identical
    * sample, so a re-run or an audit reproduces it exactly). One window
    * shuffle on the stratum key; at 100 TB each stratum ranks
    * independently and the cap bounds the output to k × |strata| rows.
    */
  def stratifiedSample(docs: DataFrame, stratum: String, k: Int,
      id: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum)
      .orderBy(md5(col(id).cast("string")), col(id))
    docs.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }

  /** Deterministic weighted sampling without replacement, per stratum —
    * the Efraimidis–Spirakis A-ES recipe (2006): each item draws
    * u ∈ (0, 1] and the k items with the largest u^(1/w) win,
    * equivalently the k SMALLEST −ln(u)/w — one ranking pass, no
    * sequential reservoir, so it distributes as a per-stratum window
    * exactly like [[stratifiedSample]] (which is the w≡1 special case).
    *
    * Engine-portable randomness: u derives from the first 48 bits of
    * md5(id) shifted into (0, 1] — a division by 2⁴⁸, exact in IEEE —
    * so every engine draws the identical u (the [[stratifiedSample]]
    * seedless discipline). The ranking key −ln(u)/w is quantized onto
    * an integer 1e-6 grid BEFORE ranking (the [[tfidfKeywords]] idf
    * discipline: a cross-engine ln ulp may not reorder the sample),
    * with the id tiebreak making grid collisions deterministic.
    * Weights join as a broadcast dim; strata absent from the weight
    * list are excluded (an unweighted stratum has no sampling rate).
    * At 100 TB: one scan, one per-stratum window, output bounded by
    * k × |strata|.
    */
  def weightedSample(docs: DataFrame, weights: Seq[(String, Double)],
      k: Int, stratum: String = "source", id: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wdim = weights.toDF(stratum, "__w")
    val u = (conv(substring(md5(col(id).cast("string")), 1, 12),
      16, 10).cast("long") + 1L).cast("double") / 281474976710656.0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(col("score_q"), col(id))
    docs.select(col(id), col(stratum))
      .join(broadcast(wdim), stratum)
      .withColumn("score_q",
        floor(-log(u) / col("__w") * 1e6 + 0.5).cast("long"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col(stratum), col(id), col("score_q"), col("rnk"))
  }

  /** Quality features + a composite score in [0, 1]. */
  def quality(docs: DataFrame, text: String = "text"): DataFrame = {
    val t = col(text)
    val nTok = tokenCount(t)
    val stop = size(regexp_extract_all(lower(t),
      lit("\\b(the|a|an|and|or|of|to|in|is|it)\\b"), lit(0)))
    val punct = size(regexp_extract_all(t, lit("[^a-zA-Z0-9\\s]"), lit(0)))
    val upper = size(regexp_extract_all(t, lit("[A-Z]"), lit(0)))
    // No rounding anywhere: every ratio is an int/int double division and
    // the score is a fixed left-associated expression over them, so any
    // IEEE-754 engine (incl. the DuckDB oracle) reproduces each value
    // bit-for-bit. Rounding would *add* cross-engine risk (Spark rounds via
    // shortest-decimal-string, C engines round the raw binary).
    docs
      .withColumn("n_tokens", nTok)
      .withColumn("avg_token_len",
        length(regexp_replace(t, lit("\\s+"), lit(""))).cast("double") /
          greatest(nTok, lit(1)).cast("double"))
      .withColumn("stopword_ratio",
        stop.cast("double") / greatest(nTok, lit(1)).cast("double"))
      .withColumn("punct_ratio",
        punct.cast("double") / greatest(length(t), lit(1)).cast("double"))
      .withColumn("upper_ratio",
        upper.cast("double") / greatest(length(t), lit(1)).cast("double"))
      .withColumn("quality_score",
        least(col("n_tokens").cast("double") / 64.0, lit(1.0)) * 0.5 +
          least(col("stopword_ratio") * 5.0, lit(1.0)) * 0.3 +
          (lit(1.0) - least(col("punct_ratio") * 10.0, lit(1.0))) * 0.2)
  }

  /** N-gram-frequency language scoring: per language, the count of marker
    * tokens divided by token count; prediction = argmax (ties → 'und').
    * Markers are common function words / character patterns per language.
    */
  def langId(docs: DataFrame, text: String = "text"): DataFrame = {
    val markers: Seq[(String, String)] = Seq(
      "en" -> "\\b(the|and|of|to|is|in|that|it|was|for)\\b",
      "fr" -> "\\b(le|la|les|et|de|des|un|une|est|que)\\b",
      "es" -> "\\b(el|los|las|y|de|que|un|una|es|en)\\b",
      "de" -> "\\b(der|die|das|und|ist|von|ein|eine|zu|den)\\b",
      "zh" -> "[\\u4e00-\\u9fff]")
    val t = lower(col(text))
    val scored = markers.foldLeft(docs) { case (d, (lang, re)) =>
      d.withColumn(s"score_$lang",
        size(regexp_extract_all(t, lit(re), lit(0))))
    }
    val best = markers.map { case (lang, _) => col(s"score_$lang") }
      .reduce((a, b) => greatest(a, b))
    val pred = markers.foldRight(lit("und"): Column) { case ((lang, _), el) =>
      when(col(s"score_$lang") === best && best > 0, lit(lang)).otherwise(el)
    }
    scored.withColumn("lang_pred", pred)
  }

  /** RE2-compatible PII patterns (no lookaround — the same rule runs in
    * Spark codegen and any RE2 engine, DuckDB included).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  /** PII scrubbing, the standard pre-tokenization redaction pass: count
    * email addresses and phone-shaped numbers, and digest the text with
    * both replaced by placeholders — the digest proves the REPLACEMENT
    * happened, not just that something was counted. Pure projection, no
    * shuffle, no UDF.
    */
  def piiScrub(docs: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val t = col(text)
    // counts mirror the sequential redaction exactly: phones are counted
    // on the email-scrubbed INTERMEDIATE, so a digit run consumed by an
    // overlapping email match ('...123 456 7890@x.co') is neither
    // counted nor claimed redacted — count and digest stay consistent
    val afterEmail = regexp_replace(t, lit(EmailRe), lit("<EMAIL>"))
    val scrubbed = regexp_replace(afterEmail, lit(PhoneRe), lit("<PHONE>"))
    docs.select(col(id),
      size(regexp_extract_all(t, lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(PhoneRe), lit(0)))
        .cast("long").as("n_phones"),
      md5(scrubbed).as("scrubbed_md5"))
  }

  /** Intra-document repetition (the Gopher-style duplicate-n-gram
    * fraction, a published quality gate): the share of word n-grams that
    * repeat an earlier n-gram of the SAME document. Boilerplate/spam
    * tails push the ratio up; `keep` gates at `maxDupRatio`. Pure
    * projection — per-document arrays, no shuffle.
    */
  def repetition(docs: DataFrame, n: Int = 2, maxDupRatio: Double = 0.2,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val grams = graft.dedup.Dedup.grams(col(text), n)
    docs.select(col(id),
      size(grams).cast("long").as("n_grams"),
      size(array_distinct(grams)).cast("long").as("n_distinct"))
      .withColumn("dup_ratio",
        (col("n_grams") - col("n_distinct")).cast("double") /
          greatest(col("n_grams"), lit(1L)).cast("double"))
      .withColumn("keep", col("dup_ratio") <= maxDupRatio)
  }

  /** Sequence packing (the concatenate-and-chunk batching step of an LLM
    * pre-training pipeline): documents are laid out in a deterministic
    * order (doc_id) and split into training sequences of `budget` tokens
    * — each doc gets its running token offset and the sequence (bin) its
    * first token lands in.
    *
    * The global prefix sum is computed as a distributed two-pass, never a
    * single-partition window: docs are bucketed into `numShards`
    * equal-width id ranges (a pure monotone function of the id — no
    * sampling, so recomputation across jobs is stable), each shard
    * cumsums independently under one hash-partitioned window, and the
    * per-shard token totals (≤ numShards rows) turn into exclusive shard
    * bases via a triangular self-join that re-enters as a broadcast join.
    * Output is bit-identical to the single-window form for any
    * `numShards`. The whole thing is ONE lazy plan — no driver-side
    * collect, so merely constructing the DataFrame (plan dumps, spec
    * sweeps) runs no job, and execution can never see a stale snapshot of
    * the bases. Null ids sort first (their own leading shard), null-token
    * docs ride along with offset = running sum — both exactly the
    * single-window semantics. Non-numeric ids that survive a BIGINT cast
    * as null fail loudly instead of silently vanishing.
    * Assumes ids are roughly uniform over their range (sequential ingest
    * ids are); pathological clustering degrades balance, not correctness.
    */
  def sequencePack(docs: DataFrame, budget: Long, numShards: Int = 64,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val toks = docs.select(col(id),
      tokenCount(col(text)).cast("long").as("n_tokens"))
    // bounds ride along as a broadcast single-row cross join — the scan
    // prunes to the id column only, and stays inside the one lazy plan
    val bounds = toks.agg(min(col(id).cast("long")).as("__lo"),
      max(col(id).cast("long")).as("__hi"))
    val idn = col(id).cast("long")
    val sharded = toks.crossJoin(broadcast(bounds))
      .withColumn("__ps",
        when(col(id).isNull, lit(-1L)) // nulls-first, like ORDER BY id
          .when(idn.isNull, raise_error(concat(
            lit(s"sequencePack: id column `$id` is not castable to " +
              "BIGINT: "), col(id).cast("string"))).cast("long"))
          .otherwise(expr(s"(CAST(`$id` AS BIGINT) - __lo) div " +
            s"greatest(1L, (__hi - __lo) div ${numShards}L + 1L)")))
      .drop("__lo", "__hi")
    // pass 1: per-shard token totals -> exclusive prefix sum over the
    // aggregate-small totals (≤ numShards+1 rows) via a triangular
    // broadcast join — O(numShards²) rows, no window, no driver action
    val totals = sharded.groupBy("__ps")
      .agg(coalesce(sum("n_tokens"), lit(0L)).as("__tot"))
    val bases = totals.as("a")
      .join(broadcast(totals.as("b")),
        col("b.__ps") < col("a.__ps"), "left")
      .groupBy(col("a.__ps").as("__ps"))
      .agg(coalesce(sum(col("b.__tot")), lit(0L)).as("__base"))
    // pass 2: per-shard exclusive cumsum + broadcast shard base
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__ps").orderBy(col(id))
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    sharded
      .withColumn("__local", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .join(broadcast(bases), "__ps")
      .withColumn("tok_offset", col("__local") + col("__base"))
      // integer division (`div`), not double `/`+cast: the oracle's `//`
      // is exact at any magnitude, double quotients are not past 2^53
      .withColumn("seq_bin", expr(s"tok_offset div ${budget}L"))
      .select(col(id), col("n_tokens"), col("tok_offset"), col("seq_bin"))
  }

  /** Order-insensitive content fingerprint: md5 of the sorted token bag —
    * robust to word shuffling (the classic "fingerprint" dedup key).
    * Plus a positional rolling digest (md5 of the raw normalized text).
    */
  def fingerprint(docs: DataFrame, text: String = "text"): DataFrame = {
    val norm = regexp_replace(lower(col(text)), lit("\\s+"), lit(" "))
    docs
      .withColumn("fp_exact", md5(norm))
      .withColumn("fp_bag",
        md5(array_join(array_sort(split(norm, " ")), " ")))
  }

  /** Deterministic training-shard layout — the "global shuffle" a
    * training run consumes, without any engine-private RNG: each doc's
    * shard is its md5-prefix hash mod `nShards`, and `pos` is its rank
    * within the shard in the same md5 order. Seedless and
    * engine-portable, so a re-run (or an audit in another engine)
    * reproduces byte-identical shards. One window shuffle partitioned
    * by the shard key; at 100 TB each shard ranks independently and
    * writers consume shards as partition directories.
    */
  def shardAssign(docs: DataFrame, nShards: Int,
      id: String = "doc_id"): DataFrame = {
    val hm = md5(col(id).cast("string"))
    val h = conv(substring(hm, 1, 8), 16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(hm, col(id))
    docs.withColumn("shard", pmod(h, lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
  }

  /** Pairwise inter-source shingle overlap — the corpus-composition
    * audit behind mixture design: how much n-gram content do two crawl
    * sources share? (High overlap → double-counted content when both
    * sources are mixed at full weight; the measurement that motivates
    * per-source dedup or weight adjustment before training.) Emits one
    * row per unordered source pair with the distinct-shingle
    * intersection, union, and Jaccard.
    *
    * Scale path: the corpus collapses to distinct (source, shingle)
    * pairs in one hash aggregate, then each shingle's source SET (≤ |S|
    * entries, a few dozen for any real corpus) is built in a second —
    * the pair explosion is bounded by |S|²/2 per shingle and the output
    * by |S|²/2 rows total, so nothing downstream of the two aggregates
    * ever sees corpus-scale data and NO shingle-keyed self-join of the
    * corpus happens (the naive pairing join would shuffle the shingle
    * set twice and explode on hot shingles).
    */
  def sourceOverlap(docs: DataFrame, shingleLen: Int): DataFrame = {
    val sh = docs
      .select(col("source"),
        explode(graft.dedup.Dedup.shingles(col("text"), shingleLen)).as("sh"))
      .distinct()
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("n_sh"))
    // per-shingle sorted source set → ordered pairs (a before b in the
    // sorted array ⇒ src_a < src_b), counted per pair
    val perShingle = sh.groupBy("sh")
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .where(size(col("srcs")) >= 2)
    val inter = perShingle
      .select(posexplode(col("srcs")).as(Seq("i", "src_a")), col("srcs"))
      .select(col("src_a"),
        explode(slice(col("srcs"), col("i") + 2, size(col("srcs"))))
          .as("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_inter"))
    // complete pair frame (zero-overlap pairs included): sources dim is
    // tiny, both joins broadcast
    val srcs = docs.select("source").distinct()
    srcs.select(col("source").as("src_a"))
      .crossJoin(srcs.select(col("source").as("src_b")))
      .where(col("src_a") < col("src_b"))
      .join(broadcast(sizes.select(col("source").as("src_a"),
        col("n_sh").as("n_a"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"),
        col("n_sh").as("n_b"))), "src_b")
      .join(inter, Seq("src_a", "src_b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .withColumn("jaccard", when(col("n_union") > 0,
        round(col("n_inter").cast("double") / col("n_union").cast("double"),
          6)))
      .select("src_a", "src_b", "n_inter", "n_union", "jaccard")
  }

  /** Seedless train/val/test assignment by id hash — [[shardAssign]]'s
    * md5-prefix discipline applied to split construction: bucket
    * `h mod nBuckets`, bucket 0 → test, 1 → val, rest → train (5/5/90 at
    * the default 20). Pure projection; any engine reproduces the exact
    * membership.
    */
  def hashSplit(id: Column, nBuckets: Int = 20): Column = {
    val h = conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long")
    when(pmod(h, lit(nBuckets.toLong)) === 0, lit("test"))
      .when(pmod(h, lit(nBuckets.toLong)) === 1, lit("val"))
      .otherwise(lit("train"))
  }

  /** Split-leakage guard: verified near-duplicate pairs whose members
    * land in DIFFERENT splits — the eval-contamination check a training
    * run performs after hash-splitting (a test doc with a train-side
    * near-dup inflates eval scores; published practice is to audit the
    * split against the dedup graph, not assume hashing is enough).
    * `verified` is [[graft.dedup.Dedup.jaccard]]'s output
    * (doc_a, doc_b, jaccard); pairs at/above `threshold` are near-dups.
    * Output is candidate-bounded (a filter + projection over the
    * verified pair set — no new corpus-scale work beyond the dedup chain
    * the pipeline already ran).
    */
  def splitLeakage(verified: DataFrame, threshold: Double,
      nBuckets: Int = 20): DataFrame =
    verified.where(col("jaccard") >= threshold)
      .withColumn("split_a", hashSplit(col("doc_a"), nBuckets))
      .withColumn("split_b", hashSplit(col("doc_b"), nBuckets))
      .where(col("split_a") =!= col("split_b"))
      .select("doc_a", "doc_b", "split_a", "split_b", "jaccard")

  /** TF-IDF top-k keyword extraction per document — the classic
    * keyword/topic signal a curation pipeline attaches to each doc
    * (domain tagging, topic balancing). tf is the raw in-document token
    * count; idf = ln((N+1)/(df+1)) (add-one smoothed); rank orders by
    * score descending with the token string as the deterministic
    * tie-break. Only integer evidence (tf, df, rnk) is emitted, and the
    * ranking key itself is an INTEGER: tf · round(idf · 1e9). The idf is
    * quantized per distinct df value, so within-engine score arithmetic
    * is exact and mathematically equal scores reached through different
    * (tf, df) pairs (e.g. 2·ln 4 vs ln 16) land on the SAME integer in
    * both engines — the token tie-break then fires identically, where a
    * raw-double key could order the two ULP-apart products in
    * engine-dependent directions. Cross-engine agreement only needs each
    * df's ln to land in the same 1e-9 bucket (libm ULP noise is ~1e-15
    * relative; genuinely distinct idf values differ by ≥ ~1/df).
    *
    * Plan shape: tf is one (doc, token) hash aggregate over the exploded
    * corpus, PINNED durably ([[graft.store.Stage.pin]]) — df aggregates
    * THE TF RELATION (vocabulary-sized), and without the pin Catalyst's
    * per-consumer column pruning makes the df branch a second full
    * corpus scan + tf recompute (ReuseExchange can't fire on the
    * differently-pruned subtrees; same discipline as [[dsirWeights]]);
    * the corpus count rides in as a broadcast single-row cross join;
    * top-k is a per-doc window. At 100 TB: one corpus scan, two linear
    * shuffles plus a vocabulary-keyed join — no pairwise work, and the
    * hot-token join skew is bounded because the probe side holds at most
    * one row per (doc, token).
    */
  def tfidfKeywords(docs: DataFrame, k: Int, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val tf = graft.store.Stage.pin(docs
      .select(col(id), explode(graft.dedup.Dedup.tokens(col(text))).as("token"))
      .groupBy(col(id), col("token"))
      .agg(count(lit(1)).as("tf")), "tfidf-tf")
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(id).orderBy(col("score").desc, col("token"))
    tf.join(df, Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") *
        floor(log((col("__n") + 1).cast("double") /
          (col("df") + 1).cast("double")) * 1e9 + 0.5))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col(id), col("token"), col("tf"), col("df"), col("rnk"))
  }

  /** First-occurrence novelty: the fraction of a document's distinct
    * n-gram shingles whose first owner (smallest doc id in the corpus)
    * is the document itself — the "new information ratio" curation
    * pipelines use to rank near-boilerplate docs below content-bearing
    * ones without any pairwise comparison. Docs shorter than the
    * shingle length have no shingles and are absent (novelty of an
    * empty set is undefined, matching the relational oracle).
    *
    * Plan shape: the exploded (doc, shingle) relation is aggregated
    * exactly twice — a vocabulary-keyed min for first owners and a
    * per-doc count — and n_novel comes from COUNTING THE FIRST-OWNER
    * AGGREGATE ITSELF (each shingle has exactly one first owner, so
    * grouping the vocabulary-sized owner table by owner yields the
    * per-doc novel count); the exploded corpus is never joined back
    * against the vocabulary. Two corpus-scale linear shuffles, then only
    * aggregate-sized data moves (a vocabulary-keyed count and a
    * doc-keyed join). All aggregates are monoids (min/count) with
    * map-side partials, so boilerplate-hot shingle keys combine before
    * the shuffle.
    */
  def novelty(docs: DataFrame, shingleLen: Int, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val sh = docs.select(col(id),
      explode(graft.dedup.Dedup.shingles(col(text), shingleLen)).as("sh"))
    val novel = sh.groupBy("sh").agg(min(col(id)).as("__first"))
      .groupBy(col("__first").as(id))
      .agg(count(lit(1)).as("__n_novel"))
    sh.groupBy(col(id))
      .agg(count(lit(1)).as("n_shingles"))
      .join(novel, Seq(id), "left")
      .withColumn("n_novel", coalesce(col("__n_novel"), lit(0L)))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_shingles").cast("double"))
      .select(col(id), col("n_shingles"), col("n_novel"), col("novelty"))
  }

  /** Weighted source mixing — the mixture-construction step that turns
    * per-source corpora into a training distribution (the Pile/Dolma
    * recipe): each source keeps its `ceil(weight × |source|)` docs with
    * the smallest md5(id), so the sample is deterministic and
    * re-weighting is reproducible. The weights dimension is tiny and
    * broadcast; the corpus ranks per-source under one window shuffle.
    * Sources absent from the mixture config are excluded (weight 0).
    */
  def sourceMix(docs: DataFrame, weights: Seq[(String, Double)],
      id: String = "doc_id", source: String = "source"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wdim = weights.toDF(source, "__w")
    val bysrc = org.apache.spark.sql.expressions.Window.partitionBy(source)
    val win = bysrc.orderBy(md5(col(id).cast("string")), col(id))
    docs.join(broadcast(wdim), source)
      .withColumn("rnk", row_number().over(win).cast("long"))
      .withColumn("__cnt", count(lit(1)).over(bysrc))
      .where(col("rnk") <=
        ceil(col("__w") * col("__cnt").cast("double")).cast("long"))
      .select(col(id), col(source), col("rnk"))
  }

  /** Per-source boilerplate n-gram mining — the highest-document-frequency
    * n-grams inside each source (site templates, navigation chrome,
    * licence text) that a curation pipeline strips or feeds into a
    * removal dictionary (the CCNet/RefinedWeb practice). df counts
    * DISTINCT owning docs per (source, shingle) — `shingles` is already a
    * per-doc distinct set — and rank orders df descending with the
    * shingle string as the deterministic tie-break; every output column
    * is an integer or string, so the result is engine-exact.
    *
    * Plan shape: ONE corpus-scale exploded aggregate keyed
    * (source, shingle) — hot boilerplate shingles are exactly the keys
    * being counted, and count is a monoid so they combine map-side —
    * then a bounded-state [[TopNgramsAgg]] per source: the df relation
    * is a source's whole shingle vocabulary (corpus-scale, NOT
    * aggregate-small), so a per-source ranking window would serialize
    * it through one reducer; the aggregator ships at most k entries per
    * map task instead.
    */
  def boilerplateNgrams(docs: DataFrame, k: Int, shingleLen: Int,
      text: String = "text", source: String = "source"): DataFrame = {
    val sh = docs.select(col(source),
      explode(graft.dedup.Dedup.shingles(col(text), shingleLen)).as("sh"))
    val df = sh.groupBy(col(source), col("sh")).agg(count(lit(1)).as("df"))
    val topk = udaf(new TopNgramsAgg(k))
    df.groupBy(col(source))
      .agg(topk(col("df"), col("sh")).as("__top"))
      .select(col(source), posexplode(col("__top")))
      .select(col(source), col("col.sh").as("sh"), col("col.df").as("df"),
        (col("pos") + 1).cast("long").as("rnk"))
  }

  /** Per-source document-length percentile gate — drop the tails of each
    * source's token-count distribution (truncated pages, concatenation
    * artifacts), the standard per-source length filter a curation
    * pipeline applies before dedup. Thresholds use DISC (rank-based)
    * percentile semantics made explicit: the p-th threshold is the
    * smallest length whose cumulative doc count reaches
    * ceil(p·n/100), computed in INTEGER arithmetic ((p·n + 99) div 100)
    * so both engines agree exactly; output is integers + a boolean, so
    * the gate is engine-exact end to end.
    *
    * Plan shape: the corpus reduces to a per-(source, length) HISTOGRAM
    * first (one linear shuffle, count partials map-side); the cumulative
    * window and threshold extraction run over the histogram — source ×
    * distinct-lengths rows, aggregate-small — never a per-doc ranking
    * window (a corpus-scale row_number per source would serialize each
    * source through one reducer at 100 TB). The threshold dim joins back
    * source-keyed with no hint; AQE broadcasts it.
    */
  def lengthGate(docs: DataFrame, pLoPct: Int = 5, pHiPct: Int = 95,
      id: String = "doc_id", text: String = "text",
      source: String = "source"): DataFrame = {
    val toks = docs.select(col(id), col(source),
      size(graft.dedup.Dedup.tokens(col(text))).cast("long").as("n_tokens"))
    val hist = toks.groupBy(col(source), col("n_tokens"))
      .agg(count(lit(1)).as("__c"))
    // NULLS LAST matches DuckDB's ASC default: a null-text histogram row
    // (n_tokens null) must not inflate every cumulative count from the
    // front the way Spark's nulls-first default would
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(source).orderBy(col("n_tokens").asc_nulls_last)
    val th = hist
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(source)))
      .withColumn("__lo_r", expr(s"($pLoPct * __n + 99) DIV 100"))
      .withColumn("__hi_r", expr(s"($pHiPct * __n + 99) DIV 100"))
      .groupBy(col(source))
      .agg(min(when(col("__cum") >= col("__lo_r"), col("n_tokens"))).as("lo"),
        min(when(col("__cum") >= col("__hi_r"), col("n_tokens"))).as("hi"))
    toks.join(th, Seq(source))
      .select(col(id), col("n_tokens"), col("lo"), col("hi"),
        (col("n_tokens") >= col("lo") && col("n_tokens") <= col("hi"))
          .as("keep"))
  }

  /** DSIR-style hashed importance weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every raw document by how target-like its hashed unigram
    * distribution is. Tokens hash into `buckets` fixed cells (md5-based,
    * engine-portable like [[graft.dedup.Dedup]]'s signatures); each cell
    * gets the add-one-smoothed occurrence ratio
    * `((target + 1) · 10^6) div (raw + 1)` between the target sources
    * and the whole corpus, and a document's weight is the tf-weighted
    * sum of its cells' ratios. The published method uses log-ratios;
    * the linear scaled-integer form keeps the SAME ranking intent
    * (target-like mass up, generic mass down) with BIGINT-only
    * arithmetic — `div` here and `//` in the oracle — so the result is
    * engine-exact, reproducible, and auditable. Docs with no tokens
    * surface with weight 0 rather than vanishing.
    *
    * Plan shape: ONE corpus-scale exploded aggregate builds the
    * (doc, bucket, tf) relation, PINNED durably ([[graft.store.Stage.pin]],
    * the same boundary discipline as the LSH→verify chain) — without the
    * pin, Catalyst's column pruning makes the ratio branch a second
    * full corpus scan + tf recompute because the two consumers prune
    * different columns and ReuseExchange can't fire. The ratio
    * dimension then aggregates the pinned tf (map-side partials
    * collapse it to ≤ `buckets` rows per task) and is
    * bucket-count-bounded, so the broadcast back onto tf is safe at
    * ANY corpus size; the final per-doc sum is a doc-keyed monoid
    * aggregate. At 100 TB: one corpus scan, one corpus-scale shuffle,
    * a fixed-size broadcast — no pairwise work, no vocabulary-keyed
    * join, no skew (bucket heat is capped by the hash).
    */
  def dsirWeights(docs: DataFrame, targetSources: Seq[String],
      buckets: Int, id: String = "doc_id", text: String = "text",
      source: String = "source"): DataFrame = {
    val tf = graft.store.Stage.pin(docs.select(col(id), col(source),
        explode(graft.dedup.Dedup.tokens(col(text))).as("token"))
      .withColumn("bucket",
        pmod(conv(substring(md5(col("token")), 1, 8), 16, 10).cast("long"),
          lit(buckets.toLong)))
      .groupBy(col(id), col(source), col("bucket"))
      .agg(count(lit(1)).as("tf")), "dsir-tf")
    val isTgt = col(source).isin(targetSources: _*)
    val ratio = tf.groupBy("bucket")
      .agg(sum(col("tf")).as("__raw"),
        sum(when(isTgt, col("tf")).otherwise(0L)).as("__tgt"))
      .withColumn("__r", expr("((__tgt + 1) * 1000000) DIV (__raw + 1)"))
    val w = tf.join(broadcast(ratio.select(col("bucket"), col("__r"))),
        Seq("bucket"))
      .groupBy(col(id))
      .agg(sum(col("tf") * col("__r")).as("__w"))
    docs.select(col(id)).join(w, Seq(id), "left")
      .withColumn("dsir_weight", coalesce(col("__w"), lit(0L)))
      .select(col(id), col("dsir_weight"))
  }

  /** Corpus-wide repeated-chunk detection — the paragraph/line-level
    * dedup stage of a curation pipeline (the CCNet/RefinedWeb practice of
    * dropping lines that recur across many pages: navigation chrome,
    * cookie banners, licence boilerplate). Documents split into
    * consecutive `chunkTokens`-token chunks on the raw whitespace layout
    * (position-preserving, unlike the sliding shingles of the near-dup
    * path — a chunk is a removable unit, a shingle is a similarity
    * feature); a chunk is "duplicated" when ≥ 2 distinct docs contain it.
    * Output per doc: chunk counts plus a keep flag that drops docs whose
    * content is mostly recycled (strict-majority rule in integer
    * arithmetic, so the gate is engine-exact).
    *
    * Plan shape: ONE corpus-scale exploded relation of distinct
    * (doc, chunk) pairs, PINNED durably ([[graft.store.Stage.pin]]) —
    * the df branch
    * aggregates THE SAME relation (chunk-vocabulary-sized), and without
    * the pin Catalyst's per-consumer pruning re-scans the corpus (the
    * [[tfidfKeywords]] / [[dsirWeights]] discipline). Then one
    * vocabulary-keyed join back (probe side holds at most one row per
    * (doc, chunk), so boilerplate-hot chunk keys are bounded by doc
    * count, and count partials collapse map-side) and a per-doc monoid
    * aggregate. At 100 TB: one corpus scan, two linear shuffles, one
    * vocabulary join — no pairwise work.
    */
  /** Corpus-LM negative log-likelihood per document — the language-model
    * quality signal of CCNet-style curation (Wenzek et al. 2019 score
    * pages with a KenLM 5-gram; Moore & Lewis 2010 rank data by LM
    * cross-entropy): documents whose token transitions are improbable
    * under a model of the corpus score a high NLL (noise, shuffled
    * boilerplate), fluent/typical text scores low. The model is an
    * add-one-smoothed bigram LM estimated from the corpus itself in the
    * same pass — the distributed estimate-then-score shape is the
    * point; a richer external model would replace only the model
    * relation, not the plan.
    *
    * Engine-exactness: each bigram's log-probability is quantized onto
    * an integer 1e-9 grid (`floor(ln(p)·1e9 + 0.5)` — the
    * [[tfidfKeywords]] idf discipline) and every downstream
    * accumulation is BIGINT, so sums are order-independent and
    * bit-equal across engines despite floating-point logs. `nll_q` is
    * provably non-negative (p = (c12+1)/(c1+V) < 1 whenever V ≥ 2, and
    * V = 1 forces p = 1 exactly), so the BIGINT `avg_nll_q` division
    * never sees a negative operand — Spark's truncating `div` and the
    * oracle's floor `//` cannot diverge. Docs with fewer than two
    * tokens have no transitions and are absent (their NLL is
    * undefined, matching the relational oracle).
    *
    * Plan shape: ONE corpus-scale (doc, bigram, count) relation, PINNED
    * durably ([[graft.store.Stage.pin]]) — the model (bigram counts,
    * left-context counts, vocabulary size) aggregates THE SAME
    * relation, and without the pin Catalyst's per-consumer pruning
    * re-scans the corpus (the [[tfidfKeywords]] / [[dsirWeights]]
    * discipline). Scoring is one vocabulary-keyed join back (the probe
    * side holds at most one row per (doc, bigram), so hot function-word
    * bigrams are bounded by doc count), a broadcast single-row
    * vocabulary cross join, and a map-side-combined per-doc aggregate.
    * At 100 TB: one corpus scan, two vocabulary-sized shuffles, one
    * vocabulary join — no pairwise work, no windows.
    */
  def bigramNll(docs: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val dbg = graft.store.Stage.pin(docs
      .select(col(id),
        explode(graft.dedup.Dedup.grams(col(text), 2)).as("bg"))
      .groupBy(col(id), col("bg"))
      .agg(count(lit(1)).as("__k")), "bigram-tf")
    val c12 = dbg.groupBy("bg").agg(sum("__k").as("__c12"))
    def w1(c: Column): Column = split(c, " ").getItem(0)
    val c1 = c12.groupBy(w1(col("bg")).as("__w1")).agg(sum("__c12").as("__c1"))
    val v = c12.agg(countDistinct(split(col("bg"), " ").getItem(1)).as("__v"))
    // lp is a function of the bigram alone — computed once per VOCAB
    // entry on the model side, not once per (doc, bigram) probe row
    val model = c12.join(c1, w1(col("bg")) === col("__w1"))
      .crossJoin(broadcast(v))
      .select(col("bg"), floor(
        log((col("__c12") + 1).cast("double") /
          (col("__c1") + col("__v")).cast("double")) * 1e9 + 0.5)
        .cast("long").as("__lp"))
    dbg.join(model, Seq("bg"))
      .groupBy(col(id))
      .agg(sum(col("__k")).as("n_bigrams"),
        (-sum(col("__k") * col("__lp"))).as("nll_q"))
      .withColumn("avg_nll_q", expr("nll_q div n_bigrams"))
      .select(col(id), col("n_bigrams"), col("nll_q"), col("avg_nll_q"))
  }

  /** Moore-Lewis contrastive selection (Moore & Lewis 2010, "Intelligent
    * Selection of Language Model Training Data" — the method DSIR
    * generalizes): rank every document by the log-likelihood-ratio of an
    * in-domain (target-source) bigram LM against the general corpus LM.
    * `ml_q > 0` means the doc's transitions are more probable under the
    * target model — the classic "select general-corpus data that looks
    * like the target domain" signal.
    *
    * Both models are add-one-smoothed bigram LMs sharing the CORPUS
    * vocabulary size V (so unseen-by-target bigrams get a well-defined
    * (0+1)/(0+V) floor probability instead of dropping out), and both
    * log-probabilities ride the [[bigramNll]] integer 1e-9 grid, so the
    * per-doc ratio sum is BIGINT — order-independent and hash-exact.
    * `ml_q` may be negative (general-looking docs), so no integer
    * division is emitted (Spark's `div` truncates toward zero, DuckDB's
    * `//` floors — divergent on negatives; consumers rank by the raw
    * ratio, which is what Moore-Lewis thresholds anyway).
    *
    * Plan shape: ONE pinned corpus-scale (doc, source, bigram, k)
    * relation; the general model, the target model (a filtered
    * re-aggregate of the SAME pin), and V all aggregate the pin; the
    * target counts LEFT-join onto the general model's vocabulary
    * (vocab-sized joins, zeros coalesced), lp for BOTH models computes
    * per VOCAB entry, then one vocabulary-keyed join back scores every
    * doc. At 100 TB: one corpus scan, vocabulary-sized shuffles, no
    * pairwise work.
    */
  def mooreLewis(docs: DataFrame, targetSources: Seq[String],
      id: String = "doc_id", text: String = "text",
      source: String = "source"): DataFrame = {
    val dbg = graft.store.Stage.pin(docs
      .select(col(id), col(source),
        explode(graft.dedup.Dedup.grams(col(text), 2)).as("bg"))
      .groupBy(col(id), col(source), col("bg"))
      .agg(count(lit(1)).as("__k")), "ml-bigram-tf")
    def w1(c: Column): Column = split(c, " ").getItem(0)
    val cG = dbg.groupBy("bg").agg(sum("__k").as("__cg"))
    val c1G = cG.groupBy(w1(col("bg")).as("__w1g")).agg(sum("__cg").as("__c1g"))
    val tgt = dbg.where(col(source).isInCollection(targetSources))
    val cT = tgt.groupBy("bg").agg(sum("__k").as("__ct"))
    val c1T = cT.groupBy(w1(col("bg")).as("__w1t")).agg(sum("__ct").as("__c1t"))
    val v = cG.agg(countDistinct(split(col("bg"), " ").getItem(1)).as("__v"))
    def lp(c12: Column, c1: Column): Column = floor(
      log((c12 + 1).cast("double") / (c1 + col("__v")).cast("double")) * 1e9
        + 0.5).cast("long")
    val model = cG
      .join(c1G, w1(col("bg")) === col("__w1g"))
      .join(cT, Seq("bg"), "left")
      .join(c1T, w1(col("bg")) === col("__w1t"), "left")
      .crossJoin(broadcast(v))
      .select(col("bg"),
        (lp(coalesce(col("__ct"), lit(0L)), coalesce(col("__c1t"), lit(0L)))
          - lp(col("__cg"), col("__c1g"))).as("__lr"))
    dbg.join(model, Seq("bg"))
      .groupBy(col(id))
      .agg(sum(col("__k")).as("n_bigrams"),
        sum(col("__k") * col("__lr")).as("ml_q"))
      .select(col(id), col("n_bigrams"), col("ml_q"))
  }

  /** Exact duplicated-substring spans (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499 —
    * the ExactSubstr method): a run of `windowTokens` consecutive
    * tokens that occurs more than once ANYWHERE in the corpus
    * (including twice in the same document) marks every position it
    * covers as duplicated; overlapping or adjacent duplicated windows
    * merge into maximal spans per document (gaps-and-islands over the
    * flagged start positions), and each doc reports its span count,
    * duplicated-token total, and surviving-token count — the numbers
    * the paper's span-removal step consumes.
    *
    * The paper builds a suffix array on one machine; the distributed
    * re-expression is a rolling token window: ONE corpus-tokens-sized
    * (doc, pos, window) relation — pinned, because both the global
    * duplicate set and the position join consume it — one
    * hash-aggregate on the window's md5 DIGEST for the duplicate set
    * (computed map-side inside the explode, so the window text never
    * leaves the scan stage — the digest is byte-identical across
    * engines on the same UTF-8 string, the oracle groups by the same
    * digest, and a 128-bit collision is the standard content-digest
    * contract), a left-semi join back, then one per-doc window pass
    * (running max-end → island ids → span extents). All arithmetic is
    * integer, so the result is engine-exact. The window aggregate is
    * the one corpus-sized shuffle — 32-byte keys, volume scaling with
    * window COUNT, not corpus BYTES — and the per-doc pass shuffles on
    * doc id: no pairwise work anywhere. (x16 chunkDedup is the cheap non-overlapping variant;
    * this is the position-exact one — x16 cannot see a duplicated run
    * that straddles a chunk boundary, this can.)
    */
  def substringDedup(docs: DataFrame, windowTokens: Int,
      id: String = "doc_id", text: String = "text"): DataFrame = {
    val k = windowTokens
    def toks = split(col(text), " ")
    // window start positions 1..n-k+1; Spark's sequence(1, 0) steps
    // DOWN (yields [1, 0]) where the oracle's generate_series(1, 0) is
    // empty, so short docs guard to an explicit empty array
    val starts = when(size(toks) >= k,
      sequence(lit(1), size(toks) - lit(k - 1)))
      .otherwise(typedLit(Seq.empty[Int]))
    // digest-keyed like chunkDedup: one row per token POSITION makes
    // this the suite's widest explode (≈ one window string per token),
    // so carrying the ~k-token window text through the pin and both
    // shuffles is the dominant cost — the md5 digest is computed
    // map-side and the text never leaves the scan stage
    val e = graft.store.Stage.pin(docs
      .select(col(id), col(text), explode(starts).as("p"))
      .select(col(id), col("p"),
        md5(array_join(slice(toks, col("p"), lit(k)), " ")).as("wh")),
      "substr-windows")
    val dup = e.groupBy("wh").agg(count(lit(1)).as("__c"))
      .where(col("__c") >= 2).select("wh")
    val dupPos = e.join(dup, Seq("wh"), "left_semi").select(col(id), col("p"))
    // gaps-and-islands: a flagged start opens a NEW span iff it begins
    // past the running max end + 1 (adjacent coverage merges); each
    // position appears once per doc, so the order is total
    val wo = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("p"))
    val prevEnd = max(col("p") + lit(k - 1))
      .over(wo.rowsBetween(Long.MinValue, -1))
    val spans = dupPos
      .withColumn("__new",
        when(prevEnd.isNull || col("p") > prevEnd + lit(1), 1L)
          .otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(wo))
      .groupBy(col(id), col("__isl"))
      .agg(min("p").as("__s"), max(col("p") + lit(k - 1)).as("__e"))
    val perDoc = spans.groupBy(col(id))
      .agg(count(lit(1)).as("dup_spans"),
        sum(col("__e") - col("__s") + 1).cast("long").as("dup_tokens"))
    docs.select(col(id), size(toks).cast("long").as("n_tokens"))
      .join(perDoc, Seq(id), "left")
      .select(col(id), col("n_tokens"),
        coalesce(col("dup_spans"), lit(0L)).as("dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        (col("n_tokens") - coalesce(col("dup_tokens"), lit(0L)))
          .as("keep_tokens"))
  }

  def chunkDedup(docs: DataFrame, chunkTokens: Int, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val toks = split(col(text), " ")
    // ceil(|toks| / chunkTokens) in integer arithmetic; clamped to ≥1
    // because sequence(1, 0) auto-steps DOWN to [1, 0] in Spark while
    // generate_series(1, 0) is empty in the oracle — unreachable while
    // split() never returns an empty array, but pinned so a tokenizer
    // change cannot diverge the engines
    val nChunks = greatest(
      ((size(toks) + lit(chunkTokens - 1)) / lit(chunkTokens)).cast("int"),
      lit(1))
    val chunks = transform(sequence(lit(1), nChunks),
      g => array_join(
        slice(toks, (g - lit(1)) * lit(chunkTokens) + lit(1),
          lit(chunkTokens)),
        " "))
    // dedup on the chunk's md5 DIGEST, not the chunk text: the digest
    // is computed map-side inside the explode, so the ~1 KB chunk
    // string never reaches the pin, the groupBy shuffle, or the
    // join-back — at sf1000 that is the difference between shuffling
    // ~70 GB of text twice (the r14-r16 spill wall: 300 GB spilled on
    // 96 GB of executor memory) and shuffling 32-byte keys. md5 is
    // byte-identical across engines on the same UTF-8 string (the d2
    // MinHash discipline), so the oracle mirrors the digest grouping
    // exactly; a 128-bit collision (~1e-21 at corpus scale) is the
    // standard content-digest dedup contract.
    val e = graft.store.Stage.pin(docs
      .select(col(id),
        explode(array_distinct(transform(chunks, c => md5(c)))).as("ch")),
      "chunk-pairs")
    val df = e.groupBy("ch").agg(count(lit(1)).as("__df"))
    e.join(df, Seq("ch"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__df") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("keep", col("n_dup_chunks") * 2 < col("n_chunks"))
      .select(col(id), col("n_chunks"), col("n_dup_chunks"), col("keep"))
  }
}
