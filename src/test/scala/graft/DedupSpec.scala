package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: short docs yield empty sets, no fabricated windows") {
    val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, "a")).toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(sh(1L) === Set("a b c", "b c d"))
    assert(sh(2L) === Set.empty)
    assert(sh(3L) === Set.empty)
  }

  test("decontaminate: only docs sharing a full n-gram with the " +
    "benchmark surface, with distinct-overlap counts") {
    val train = Seq(
      (1L, "alpha beta gamma delta"), // shares the 3-gram "alpha beta gamma"
      (2L, "alpha beta x y"), //         2-gram overlap only → clean at n=3
      (3L, "p q r s"), //                disjoint → clean
      (4L, "alpha beta gamma beta gamma delta z")) // two distinct overlaps
      .toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = Dedup.decontaminate(train, bench, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 4L -> 2L),
      s"1 shares 'alpha beta gamma'+'beta gamma delta', 4 both too: $got")
  }

  test("piiScrub counts and redacts; repetition flags spam tails") {
    import graft.text.TextOps
    val docs = Seq(
      (1L, "mail me at a.b@x.co or call +555 123 4567 today"),
      (2L, "no pii here")).toDF("doc_id", "text")
    val pii = TextOps.piiScrub(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(pii === Map(1L -> ((1L, 1L)), 2L -> ((0L, 0L))))
    // the digest reflects the REDACTED text, not the original
    val d1 = TextOps.piiScrub(docs).where(col("doc_id") === 1)
      .select("scrubbed_md5").head().getString(0)
    val want = docs.sparkSession.sql(
      "SELECT md5('mail me at <EMAIL> or call <PHONE> today')")
      .head().getString(0)
    assert(d1 === want)
    val rep = TextOps.repetition(Seq(
      (1L, "buy now buy now buy now"), // 5 2-grams, 2 distinct
      (2L, "all distinct words here"),
      (3L, "one")).toDF("doc_id", "text")) // sub-length → 0 grams, keep
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(rep === Map(1L -> ((5L, 2L, false)), 2L -> ((3L, 3L, true)),
      3L -> ((0L, 0L, true))))
  }

  test("exact dedup groups by digest, keeps smallest id") {
    val df = Seq((5L, "same text"), (2L, "same text"), (9L, "other"))
      .toDF("doc_id", "text")
    val rows = Dedup.exact(df).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set((2L, 2L), (9L, 1L))) // (keep_id, n_docs)
  }

  test("dupClusters: transitive components converge to the min doc id; " +
    "below-threshold edges are ignored") {
    // chain 1-2, 2-3 (one component) + isolated pair 7-9 + a weak edge
    // 9-20 below threshold that must NOT merge
    val verified = Seq(
      (1L, 2L, 0.9), (2L, 3L, 0.8), (7L, 9L, 1.0), (9L, 20L, 0.2))
      .toDF("doc_a", "doc_b", "jaccard")
    val out = Dedup.dupClusters(verified, 0.5).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out === Map(
      1L -> ((1L, true)), 2L -> ((1L, false)), 3L -> ((1L, false)),
      7L -> ((7L, true)), 9L -> ((7L, false))))
  }

  test("jaccard: pairs with sub-shingle-length docs are not dropped") {
    // doc 2 has <3 tokens → empty shingle set; pair (1,2) must still
    // surface with jaccard 0/2 = 0. Pair (2,3): both empty → union empty
    // → jaccard null (0/0). An earlier inner-join silently dropped both.
    val docs = Seq((1L, "a b c d"), (2L, "a b"), (3L, "x y")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.jaccard(docs, pairs, 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(out.size === 2)
    assert(out((1L, 2L)) === ((0L, Some(0.0))))
    assert(out((2L, 3L)) === ((0L, None)))
  }

  test("jaccard: identical docs score 1, disjoint docs score 0") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "p q r s t"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.jaccard(docs, pairs, 3).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(out((1L, 2L)) === 1.0)
    assert(out((1L, 3L)) === 0.0)
  }

  test("LSH: exact duplicates collide in every band; disjoint docs never do") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"), // exact dup of 1
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8")).toDF("doc_id", "text")
    val cand = Dedup.lshCandidates(
      Dedup.lshBuckets(Dedup.minhash(docs, 8, 3), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand === Set((1L, 2L)))
  }

  test("LSH: lshBucketsDirect is bit-identical to minhash → lshBuckets") {
    // the projection-native banding must produce the same (band, bucket,
    // doc) rows as the long-format explode→groupBy path, including the
    // empty-shingle-set doc (all-null sigs → md5("") bucket) and a
    // ragged final band (k not divisible by rowsPerBand)
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"),
      (3L, "z1 z2 z3 z4 z5"),
      (4L, "too short")).toDF("doc_id", "text")
    for (rpb <- Seq(2, 3)) { // 8 % 3 != 0 exercises the ragged band
      val long = Dedup.lshBuckets(Dedup.minhash(docs, 8, 3), rpb)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
      val direct = Dedup.lshBucketsDirect(docs, 8, 3, rpb)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
      assert(direct === long, s"rowsPerBand=$rpb")
    }
    // k > 100: h crosses the 2-digit width inside a band (h = 99..101 in
    // band 33) — a 2-char pad would lpad-TRUNCATE "100" to "10" in the
    // long form while the direct form kept "100", silently diverging
    val long102 = Dedup.lshBuckets(Dedup.minhash(docs, 102, 3), 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    val direct102 = Dedup.lshBucketsDirect(docs, 102, 3, 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    assert(direct102 === long102)
  }

  test("LSH: oversized buckets degrade to hub-stars, cluster recall kept") {
    // 40 exact duplicates collapse into one bucket per band; with
    // maxBucket=8 the bucket emits a star through the smallest doc id
    // instead of 40·39/2 pairs — every member stays reachable from doc 1
    val txt = "w1 w2 w3 w4 w5 w6 w7 w8"
    val docs = ((1L to 40L).map(i => (i, txt)) :+ (99L, "z1 z2 z3 z4 z5"))
      .toDF("doc_id", "text")
    val buckets = Dedup.lshBuckets(Dedup.minhash(docs, 8, 3), 2)
    val capped = Dedup.lshCandidates(buckets, maxBucket = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exactly the star: (1, i) for each duplicate, nothing quadratic
    assert(capped === (2L to 40L).map(i => (1L, i)).toSet)
    // uncapped still returns the full pair set
    val full = Dedup.lshCandidates(buckets, maxBucket = 1000).count()
    assert(full === 40L * 39 / 2)
  }

  test("TopKAgg: ordered insert, tiebreak, merge, k-truncation") {
    import graft.similarity.{Scored, TopKAgg}
    val agg = new TopKAgg(3)
    val buf = Seq(Scored(0.5, 2L), Scored(0.9, 7L), Scored(0.5, 1L),
      Scored(0.1, 9L), Scored(0.9, 3L))
      .foldLeft(agg.zero)(agg.reduce)
    // desc by cos, asc id on ties, truncated to 3
    assert(agg.finish(buf) ===
      Seq(Scored(0.9, 3L), Scored(0.9, 7L), Scored(0.5, 1L)))
    // merge keeps global order across partial buffers
    val other = Seq(Scored(0.7, 4L), Scored(0.95, 5L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(buf, other)) ===
      Seq(Scored(0.95, 5L), Scored(0.9, 3L), Scored(0.9, 7L)))
    // fewer than k inputs: all kept
    assert(agg.finish(agg.reduce(agg.zero, Scored(1.0, 1L))) ===
      Seq(Scored(1.0, 1L)))
  }

  test("IVF: persisted index is built once, reused, and finds planted dups") {
    import graft.similarity.Ann
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    // re-ingest queries under new ids: the duplicate shares the cell and
    // must rank first with cosine 1
    val corpus = emb.unionByName(
      emb.where(col("vec_id") < 5).withColumn("vec_id", col("vec_id") + 100000))
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_ivf_spec").toString + "/idx"
    // index job runs once; the second call is a no-op (the query path
    // never rebuilds — VERDICT r3 #1)
    assert(graft.store.Store.buildIvfIndex(spark, idxPath, corpus, 8))
    assert(!graft.store.Store.buildIvfIndex(spark, idxPath, corpus, 8))
    val (cells, asg) = graft.store.Store.readIvfIndex(spark, idxPath)
    // the probe plan reads the index from parquet — no recompute, no
    // localCheckpoint/LogicalRDD pinning
    val probe = Ann.ivfTopK(corpus, emb.where(col("vec_id") < 5), 3,
      cells, asg)
    val plan = probe.queryExecution.optimizedPlan.toString
    assert(plan.contains("parquet"), "probe should scan the parquet index")
    assert(!plan.contains("LogicalRDD"), "no checkpoint-pinned RDD in probe")
    val got = probe.where(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0L until 5L).foreach { q =>
      assert(got(q) === q + 100000, s"query $q top-1 should be its clone")
    }
    // a second query against the SAME read-back index: build-once, probe-many
    val again = Ann.ivfTopK(corpus, emb.where(col("vec_id") === 7), 3,
      cells, asg)
    assert(again.count() === 3)
    // the inverted file partitions the corpus: every vector in exactly
    // one cell
    assert(asg.count() === corpus.count())
    assert(asg.select("vec_id").distinct().count() === corpus.count())
  }

  test("IVF upsert: delta assigned against frozen centroids as its own " +
    "generation; idempotent per tag; probes find upserted vectors") {
    import graft.similarity.Ann
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val base = emb.where(col("vec_id") >= 20)
    // delta clones of base vectors: after upsert, each query's top-1
    // must be its exact clone — provably served from the upserted file
    val delta = base.where(col("vec_id") < 25)
      .withColumn("vec_id", col("vec_id") + 200000)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_ivfup_spec").toString + "/idx"
    graft.store.Store.buildIvfIndex(spark, idxPath, base, 8)
    val cellsBefore = spark.read.parquet(s"$idxPath/cells")
      .collect().map(_.toString).sorted
    assert(graft.store.Store.upsertIvfIndex(spark, idxPath, delta, "b1"))
    // idempotence: a replayed ingest of the same batch tag is a no-op
    assert(!graft.store.Store.upsertIvfIndex(spark, idxPath, delta, "b1"))
    // the quantizer is frozen: upsert must not touch the centroids
    val cellsAfter = spark.read.parquet(s"$idxPath/cells")
      .collect().map(_.toString).sorted
    assert(cellsAfter === cellsBefore)
    val (cells, asg) = graft.store.Store.readIvfIndex(spark, idxPath)
    assert(asg.count() === base.count() + delta.count())
    val corpus = base.unionByName(delta)
    val got = Ann.ivfTopK(corpus, base.where(col("vec_id") < 25), 3,
        cells, asg)
      .where(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    (20L until 25L).foreach { q =>
      assert(got(q) === q + 200000, s"query $q top-1 should be its " +
        "upserted clone")
    }
    // a SECOND generation stacks (distinct tag), and the union sees it
    assert(graft.store.Store.upsertIvfIndex(spark, idxPath,
      delta.withColumn("vec_id", col("vec_id") + 100000), "b2"))
    val (_, asg2) = graft.store.Store.readIvfIndex(spark, idxPath)
    assert(asg2.count() === base.count() + 2 * delta.count())
  }

  test("IVF upsert after a simulated crash (ADVICE r13): a stale temp " +
    "directory neither blocks the replay nor leaks into reads") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val base = emb.where(col("vec_id") >= 20)
    val delta = base.where(col("vec_id") < 25)
      .withColumn("vec_id", col("vec_id") + 200000)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_ivfcrash_spec").toString + "/idx"
    graft.store.Store.buildIvfIndex(spark, idxPath, base, 8)
    // simulate a crash mid-write: the in-flight generation exists only
    // as the dot-prefixed temp (partial parquet junk inside), never at
    // the final path — that is what the atomic-rename commit guarantees
    val tmp = java.nio.file.Paths.get(idxPath, ".asg_up_bX.tmp")
    java.nio.file.Files.createDirectories(tmp)
    java.nio.file.Files.write(tmp.resolve("part-junk.parquet"),
      Array[Byte](1, 2, 3))
    // age the crash leftover past the sweep's mtime gate (r14: temps
    // are nonce-suffixed and only STALE ones are swept — a fresh temp
    // is indistinguishable from a concurrent writer's in-flight dir)
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2 * 3600 * 1000L)
    java.nio.file.Files.setLastModifiedTime(tmp, old)
    java.nio.file.Files.setLastModifiedTime(
      tmp.resolve("part-junk.parquet"), old)
    // the temp dir is invisible to reads (no half-written generation)
    val (_, asgBefore) = graft.store.Store.readIvfIndex(spark, idxPath)
    assert(asgBefore.count() === base.count())
    // the replayed upsert of that batch COMPLETES (pre-fix: directory
    // existence made every replay return false and the delta was lost)
    assert(graft.store.Store.upsertIvfIndex(spark, idxPath, delta, "bX"))
    val (_, asgAfter) = graft.store.Store.readIvfIndex(spark, idxPath)
    assert(asgAfter.count() === base.count() + delta.count())
    // and a genuine replay of the now-committed batch is still a no-op
    assert(!graft.store.Store.upsertIvfIndex(spark, idxPath, delta, "bX"))
    assert(!java.nio.file.Files.exists(tmp))
  }

  test("IVF retrain trigger (r14): below the balance threshold the " +
    "quantizer stays frozen; at it a retrain generation commits, " +
    "rebalances, supersedes reads, and keeps tag idempotency") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val base = emb.where(col("vec_id") >= 20)
    // drifted deltas: near-constant vectors far from the base mass —
    // every one lands in the same frozen cell, the worst-case skew the
    // churn probe's drift produces gradually
    def skewed(off: Long) = base.where(col("vec_id") < 30).select(
      (col("vec_id") + off).as("vec_id"),
      transform(col("embedding"),
        x => (x * 0.0 + 5.0).cast("float")).as("embedding"))
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_ivfretrain_spec").toString + "/idx"
    graft.store.Store.buildIvfIndex(spark, idxPath, base, 8)
    // no corpus handle → the upsert NEVER retrains, however skewed
    assert(graft.store.Store.upsertIvfIndex(spark, idxPath,
      skewed(200000), "d1"))
    val r1 = graft.store.Store.ivfCellBalance(spark, idxPath)
    assert(r1 > 1.0)
    val cellsBefore = spark.read.parquet(s"$idxPath/cells")
      .collect().map(_.toString).sorted
    val corpus2 = base.unionByName(skewed(200000)).unionByName(skewed(300000))
    // threshold safely ABOVE the post-append balance → frozen
    spark.conf.set("spark.graft.ivf.retrain.ratio", (r1 * 100).toString)
    assert(graft.store.Store.upsertIvfIndex(spark, idxPath,
      skewed(300000), "d2", Some(corpus2)))
    assert(!java.nio.file.Files.list(java.nio.file.Paths.get(idxPath))
      .iterator().asScala.exists(_.getFileName.toString.startsWith("retrain_")),
      "below threshold: no retrain generation")
    assert(spark.read.parquet(s"$idxPath/cells")
      .collect().map(_.toString).sorted === cellsBefore)
    // threshold AT the floor → this upsert's balance check fires
    spark.conf.set("spark.graft.ivf.retrain.ratio", "1.0")
    val corpus3 = corpus2.unionByName(skewed(400000))
    assert(graft.store.Store.upsertIvfIndex(spark, idxPath,
      skewed(400000), "d3", Some(corpus3)))
    spark.conf.unset("spark.graft.ivf.retrain.ratio")
    val retrains = java.nio.file.Files.list(java.nio.file.Paths.get(idxPath))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("retrain_")).toSeq
    assert(retrains === Seq("retrain_000001"), "at threshold: one retrain")
    // the retrain supersedes: reads serve the full corpus from the new
    // root, and the dense drifted region now has its own cell(s) — the
    // balance statistic drops from the frozen index's skew
    val (_, asg) = graft.store.Store.readIvfIndex(spark, idxPath)
    assert(asg.count() === corpus3.count())
    // (balance IMPROVEMENT is corpus-dependent at this toy scale; the
    // contract under test is commit/supersede/idempotency — the probe
    // tool measures the recall effect at real scale)
    val r3 = graft.store.Store.ivfCellBalance(spark, idxPath)
    assert(r3 >= 1.0)
    // a replayed PRE-retrain tag stays consumed (its vectors are inside
    // the retrained corpus — re-applying would double-insert)
    assert(!graft.store.Store.upsertIvfIndex(spark, idxPath,
      skewed(200000), "d1"))
    assert(asg.count() === corpus3.count())
    // and a genuinely new post-retrain upsert lands under the new root
    assert(graft.store.Store.upsertIvfIndex(spark, idxPath,
      skewed(500000), "d4"))
    val (_, asg4) = graft.store.Store.readIvfIndex(spark, idxPath)
    assert(asg4.count() === corpus3.count() + 10)
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
      idxPath, "retrain_000001", "asg_up_d4")))
  }

  test("IVF cell-balance stats are incremental: per-generation _counts " +
      "sidecars fold to the full-rescan value; a legacy generation " +
      "falls back once") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val base = emb.where(col("vec_id") >= 20)
    def shifted(off: Long) = emb.where(col("vec_id") < 15).select(
      (col("vec_id") + off).as("vec_id"), col("embedding"))
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_ivfcounts_spec").toString + "/idx"
    graft.store.Store.buildIvfIndex(spark, idxPath, base, 8)
    assert(graft.store.Store.upsertIvfIndex(spark, idxPath,
      shifted(100000), "c1"))
    assert(graft.store.Store.upsertIvfIndex(spark, idxPath,
      shifted(200000), "c2"))
    // every generation carries its sidecar
    for (g <- Seq("asg", "asg_up_c1", "asg_up_c2"))
      assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
        idxPath, g, "_counts")), s"$g missing _counts sidecar")
    // the sidecar fold must equal the full rescan EXACTLY — same
    // max/median over the same per-cell totals (trigger behavior on the
    // churn probe is therefore identical, with the index-sized scan
    // gone from the upsert hot path)
    def rescanBalance(): Double = {
      val (_, asg) = graft.store.Store.readIvfIndex(spark, idxPath)
      val sizes = asg.groupBy("c").agg(count(lit(1)).as("n"))
        .select("n").collect().map(_.getLong(0)).sorted
      sizes.last.toDouble / sizes(sizes.length / 2)
    }
    val fast = graft.store.Store.ivfCellBalance(spark, idxPath)
    assert(fast === rescanBalance())
    // legacy generation (no sidecar, pre-r15 layout): delete one sidecar
    // and the balance must come from the rescan path, same value
    val victim = java.nio.file.Paths.get(idxPath, "asg_up_c1", "_counts")
    java.nio.file.Files.walk(victim).sorted(
      java.util.Comparator.reverseOrder()).forEach(p =>
      java.nio.file.Files.delete(p))
    assert(graft.store.Store.ivfCellBalance(spark, idxPath) === fast)
  }

  test("IVFADC: full-probe + wide shortlist degrades to exact brute force; " +
      "narrow probe only surfaces probed-cell candidates") {
    import graft.similarity.Ann
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val n = emb.count().toInt
    val queries = emb.where(col("vec_id") < 3)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_ivfadc_spec").toString + "/idx"
    graft.store.Store.buildIvfIndex(spark, idxPath, emb, 4)
    val (cells, asg) = graft.store.Store.readIvfIndex(spark, idxPath)
    // nProbe = nCells and nCand >= n: the ADC stage can drop nothing, so
    // the exact rerank over "all candidates" IS brute force — the
    // composition provably loses only what the probe/shortlist prunes
    val full = Ann.ivfAdcRerank(emb, queries, cells, asg,
        m = 4, subDim = 16, k = 4, iters = 1,
        nProbe = 4, nCand = n, topK = 3)
      .select("q_id", "rank", "nn_id", "cos_sim")
      .collect().map(_.toString).sorted
    val brute = Ann.bruteForceTopK(emb, queries, 3)
      .select("q_id", "rank", "nn_id", "cos_sim")
      .collect().map(_.toString).sorted
    assert(full === brute)
    // narrow probe: every returned neighbor must live in one of its
    // query's nProbe probed cells (the inverted-file prune is real)
    val nProbe = 1
    val got = Ann.ivfAdcRerank(emb, queries, cells, asg,
      m = 4, subDim = 16, k = 4, iters = 1,
      nProbe = nProbe, nCand = 8, topK = 3)
    val probed = queries.crossJoin(broadcast(cells))
      .withColumn("dist", Ann.sqdist(col("embedding"), col("cen")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("dist"), col("c"))))
      .where(col("rn") <= nProbe)
      .select(col("vec_id").as("q_id"), col("c"))
    val offCell = got.join(asg.withColumnRenamed("vec_id", "nn_id"), "nn_id")
      .join(probed, Seq("q_id", "c"), "left_anti")
    assert(offCell.count() === 0,
      "no candidate may come from an unprobed cell")
  }

  test("simhash: deterministic, and identical docs hash identically") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta")).toDF("doc_id", "text")
    val h = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) === h(2L))
    assert(h(1L) !== h(3L))
    assert(h(1L) >= 0L && h(1L) < (1L << 60))
  }

  test("shardAssign: every doc in exactly one shard, contiguous positions") {
    import graft.text.TextOps
    val docs = (0L until 200L).toDF("doc_id")
    val got = TextOps.shardAssign(docs, 8).collect()
    assert(got.length === 200)
    assert(got.map(_.getLong(0)).toSet === (0L until 200L).toSet)
    val byShard = got.groupBy(_.getLong(1))
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    byShard.foreach { case (shard, rows) =>
      val pos = rows.map(_.getLong(2)).sorted.toSeq
      assert(pos === (1L to rows.length), s"shard $shard positions: $pos")
    }
  }

  test("tfidfKeywords: rare tokens outrank common ones; token tie-break; " +
    "k truncates") {
    import graft.text.TextOps
    // "rare" appears in 1 doc, "mid" in 2, "common" in all 3 — idf
    // ordering must put rare first wherever tf is equal
    val docs = Seq(
      (1L, "common rare mid"),
      (2L, "common mid"),
      (3L, "common common")).toDF("doc_id", "text")
    val out = TextOps.tfidfKeywords(docs, 2).collect()
      .map(r => (r.getLong(0), r.getLong(4)) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out((1L, 1L)) === (("rare", 1L, 1L)))
    assert(out((1L, 2L)) === (("mid", 1L, 2L)))
    // doc 3: the ubiquitous token (df = N → idf exactly 0) still ranks,
    // because rank orders within the doc rather than gating on score
    assert(out((3L, 1L)) === (("common", 2L, 3L)))
    // k=2 truncation: no rank 3 anywhere
    assert(out.keys.forall(_._2 <= 2L))
  }

  test("novelty: first owner scores 1, exact copy scores 0, overlap is " +
    "fractional; sub-shingle docs absent") {
    import graft.text.TextOps
    val docs = Seq(
      (1L, "a b c d"),   // shingles {abc, bcd} — first owner of both
      (2L, "a b c d"),   // exact copy → nothing novel
      (3L, "b c d e"),   // {bcd, cde}: bcd seen (doc 1), cde novel → 0.5
      (4L, "x y")        // sub-shingle-length → absent
    ).toDF("doc_id", "text")
    val out = TextOps.novelty(docs, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out === Map(
      1L -> ((2L, 2L, 1.0)),
      2L -> ((2L, 0L, 0.0)),
      3L -> ((2L, 1L, 0.5))))
  }

  test("bigramNll: add-one bigram LM NLL matches the hand model; " +
    "sub-bigram docs absent; avg is integer division") {
    import graft.text.TextOps
    val docs = Seq(
      (1L, "a b a"), // bigrams: "a b", "b a"
      (2L, "a b"),   // bigram:  "a b"
      (3L, "x")      // no transitions → absent
    ).toDF("doc_id", "text")
    // model: c12("a b")=2, c12("b a")=1; c1("a")=2, c1("b")=1; V={b,a}=2
    def lp(c12: Long, c1: Long): Long =
      math.floor(math.log((c12 + 1).toDouble / (c1 + 2).toDouble) * 1e9
        + 0.5).toLong
    val lpAB = lp(2, 2) // ln(3/4) on the 1e-9 grid
    val lpBA = lp(1, 1) // ln(2/3)
    val out = TextOps.bigramNll(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out === Map(
      1L -> ((2L, -(lpAB + lpBA), -(lpAB + lpBA) / 2)),
      2L -> ((1L, -lpAB, -lpAB))))
    assert(out(1L)._2 > 0L) // NLL is provably non-negative (scaladoc)
  }

  test("weightedSample: matches the hand A-ES model (md5 u, -ln(u)/w " +
    "grid); k truncates per stratum; unweighted strata excluded") {
    import graft.text.TextOps
    def scoreQ(id: Long, w: Double): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble /
        281474976710656.0
      math.floor(-math.log(u) / w * 1e6 + 0.5).toLong
    }
    val docs = ((1L to 10L).map((_, "a")) ++ (11L to 16L).map((_, "b")) ++
      Seq((17L, "unweighted"))).toDF("doc_id", "source")
    val weights = Seq("a" -> 1.0, "b" -> 0.25)
    val out = TextOps.weightedSample(docs, weights, 3).collect()
      .map(r => (r.getString(0), r.getLong(3)) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    val expected = (for ((s, w, ids) <- Seq(("a", 1.0, 1L to 10L),
        ("b", 0.25, 11L to 16L))) yield {
      ids.map(i => (i, scoreQ(i, w))).sortBy { case (i, q) => (q, i) }
        .take(3).zipWithIndex
        .map { case ((i, q), r) => (s, r + 1L) -> ((i, q)) }
    }).flatten.toMap
    assert(out === expected)
    assert(!out.keys.exists(_._1 == "unweighted"))
  }

  test("TopKAgg: NaN cosines order deterministically as GREATEST with " +
    "id tiebreak, independent of arrival order") {
    import graft.similarity.{Scored, TopKAgg}
    val agg = new TopKAgg(2)
    val nan9 = Scored(Double.NaN, 9L)
    // NaN arriving last must still evict the k-th finite candidate
    val fin = List(Scored(0.9, 1L), Scored(0.5, 2L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.reduce(fin, nan9).map(_.id) === List(9L, 1L))
    // NaN arriving first must not be evicted by later finite scores
    val rev = List(nan9, Scored(0.9, 1L), Scored(0.5, 2L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(rev.map(_.id) === List(9L, 1L))
    // NaN vs NaN ties break id-ascending (both engines' DESC order)
    val merged = agg.merge(List(Scored(Double.NaN, 3L)), List(nan9))
    assert(merged.map(_.id) === List(3L, 9L))
  }

  test("mooreLewis: matches the two-LM hand model; target-seen bigrams " +
    "rank above unseen ones, which hit the (0+1)/(0+V) floor") {
    import graft.text.TextOps
    val docs = Seq(
      (1L, "a b", "tgt"),   // the whole target domain: bigram "a b"
      (2L, "a b", "gen"),   // general doc that LOOKS target-like
      (3L, "c d", "gen")    // bigram unseen by the target model
    ).toDF("doc_id", "text", "source")
    // general: cg("a b")=2, cg("c d")=1; c1g(a)=2, c1g(c)=1; V={b,d}=2
    // target:  ct("a b")=1; c1t(a)=1; "c d" unseen → (0+1)/(0+2).
    // At these tiny counts add-one smoothing drags BOTH ratios negative
    // (the 1-observation target LM smooths harder than the 2-observation
    // general LM: ln(2/3) < ln(3/4)) — the Moore-Lewis invariant is the
    // ORDERING, target-evidence docs above target-unseen ones.
    def g(c12: Long, c1: Long): Long =
      math.floor(math.log((c12 + 1).toDouble / (c1 + 2).toDouble) * 1e9
        + 0.5).toLong
    val lrAB = g(1, 1) - g(2, 2) // ln(2/3) - ln(3/4) = ln(8/9)
    val lrCD = g(0, 0) - g(1, 1) // ln(1/2) - ln(2/3) = ln(3/4) < ln(8/9)
    val out = TextOps.mooreLewis(docs, Seq("tgt")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      1L -> ((1L, lrAB)), 2L -> ((1L, lrAB)), 3L -> ((1L, lrCD))))
    assert(lrAB > lrCD)
  }

  test("boilerplateNgrams: within-source df ranking, shingle tie-break, " +
    "sources independent, k truncates") {
    import graft.text.TextOps
    val docs = Seq(
      (1L, "a b c x1 y1 z1", "s1"),
      (2L, "a b c x2 y2 z2", "s1"),
      (3L, "a b c x3 y3 z3", "s1"),
      (4L, "q r s t u v", "s2")).toDF("doc_id", "text", "source")
    val out = TextOps.boilerplateNgrams(docs, 2, 3).collect()
      .map(r => (r.getString(0), r.getLong(3)) -> ((r.getString(1), r.getLong(2))))
      .toMap
    // "a b c" is owned by all 3 s1 docs; every other s1 shingle has df=1,
    // so rank 2 falls to the lexicographically smallest of them
    assert(out(("s1", 1L)) === (("a b c", 3L)))
    assert(out(("s1", 2L)) === (("b c x1", 1L)))
    // s2 ranks its own shingles, unaffected by s1's counts
    assert(out(("s2", 1L)) === (("q r s", 1L)))
    assert(out(("s2", 2L)) === (("r s t", 1L)))
    assert(out.keys.forall(_._2 <= 2L))
  }

  test("lengthGate: DISC thresholds per source, tails cut, boundary and " +
    "single-doc source kept") {
    import graft.text.TextOps
    // s1: lengths 1..20 → lo rank ceil(5%·20)=1 → lo=1; hi rank
    // ceil(95%·20)=19 → hi=19; only the length-20 doc is dropped
    val docs = (1L to 20L).map(i => (i, ("w " * i.toInt).trim, "s1")) :+
      ((100L, "a b", "s2"))
    val out = TextOps.lengthGate(docs.toDF("doc_id", "text", "source"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out(1L) === ((1L, 1L, 19L, true)))
    assert(out(19L) === ((19L, 1L, 19L, true)))
    assert(out(20L) === ((20L, 1L, 19L, false)))
    // single-doc source: both thresholds collapse to its own length
    assert(out(100L) === ((2L, 2L, 2L, true)))
  }

  test("sequencePack: per-shard two-pass matches the global prefix sum " +
    "for any shard count; empty corpus yields empty output") {
    import graft.text.TextOps
    // sparse, clustered ids — stress the equal-width bucketing
    val docs = Seq(3L, 5L, 6L, 100L, 101L, 9000L, 9001L, 9002L)
      .map(i => (i, ("tok " * ((i % 7).toInt + 1)).trim))
      .toDF("doc_id", "text")
    def pack(n: Int) = TextOps.sequencePack(docs, 5L, numShards = n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    val expected = {
      // reference prefix sum, computed directly
      val toks = Seq(3L, 5L, 6L, 100L, 101L, 9000L, 9001L, 9002L)
        .map(i => (i, i % 7 + 1))
      var acc = 0L
      toks.map { case (i, n) =>
        val out = (i, n.toLong, acc, acc / 5L); acc += n; out
      }
    }
    for (n <- Seq(1, 3, 64, 1000))
      assert(pack(n) === expected, s"numShards=$n")
    val empty = TextOps.sequencePack(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), 5L)
    assert(empty.count() === 0L)
    assert(empty.columns.toSeq ===
      Seq("doc_id", "n_tokens", "tok_offset", "seq_bin"))
  }

  test("sequencePack: null text rides along (offset keeps running), null " +
    "ids pack first, uncastable ids fail loudly, and construction alone " +
    "runs no Spark job") {
    import graft.text.TextOps
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(null, "a b c"), // null id → leading shard
        Row(10L, null), //     null text → null n_tokens, no offset advance
        Row(11L, "x y"),
        Row(12L, "z")), 2),
      schema)
    val got = TextOps.sequencePack(docs, 2L).collect()
      .map(r => (Option(r.get(0)),
        if (r.isNullAt(1)) -99L else r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._3).toSeq
    // single-window reference: nulls-first id order, window sum skips
    // null n_tokens — offsets 0, 3, 3, 5
    assert(got === Seq(
      (None, 3L, 0L, 0L),
      (Some(10L), -99L, 3L, 1L),
      (Some(11L), 2L, 3L, 1L),
      (Some(12L), 1L, 5L, 2L)))
    // numeric-string ids cast fine; non-numeric ids must error, not
    // silently return an empty result
    val strDocs = Seq(("7", "a b"), ("8", "c")).toDF("doc_id", "text")
    assert(TextOps.sequencePack(strDocs, 2L).count() === 2L)
    val badDocs = Seq(("seven", "a b")).toDF("doc_id", "text")
    intercept[Exception] { TextOps.sequencePack(badDocs, 2L).collect() }
    // plan-only construction triggers no job (the two-pass is one lazy
    // plan, not an eager collect of shard totals)
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null)
      .length
    TextOps.sequencePack(docs, 2L)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null)
      .length
    assert(after === before, "constructing sequencePack ran a Spark job")
  }

  test("sourceMix keeps ceil(weight × count) per source; absent sources drop") {
    import graft.text.TextOps
    val docs = (0L until 100L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val weights = Seq("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25)
    val got = TextOps.sourceMix(docs, weights).collect()
    val cnt = got.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // 25 docs/source: ceil(25)=25, ceil(12.5)=13, ceil(6.25)=7; src3 gone
    assert(cnt === Map("src0" -> 25, "src1" -> 13, "src2" -> 7))
    val again = TextOps.sourceMix(docs, weights).collect()
      .map(_.getLong(0)).toSet
    assert(again === got.map(_.getLong(0)).toSet, "sample is deterministic")
  }

  test("groupCentroids: exact means, bit-identical under repartitioning") {
    import graft.similarity.Ann
    val vecs = Seq((1L, 0, Array(1.0f, 2.0f)), (2L, 0, Array(3.0f, 4.0f)),
      (3L, 1, Array(-1.0f, 0.5f))).toDF("vec_id", "label", "embedding")
    def centroids(df: org.apache.spark.sql.DataFrame) =
      Ann.groupCentroids(df.select("label", "embedding"), "label")
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
    val w = centroids(vecs)
    assert(w((0, 0L)) === 2.0 && w((0, 1L)) === 3.0)
    assert(w((1, 0L)) === -1.0 && w((1, 1L)) === 0.5)
    assert(centroids(vecs.repartition(7)) === w,
      "fixed-point accumulation is order-independent")
  }

  test("kmeans: groups separate around their seeds; label = seed id; " +
    "deterministic under repartitioning") {
    import graft.similarity.Ann
    // ids interleave the two tight groups so the k=2 seeds (first two in
    // md5(id) order: 6 then 4) land one in each group — Lloyd then
    // separates them in the first assignment and stays converged
    val vecs = Seq(
      (6L, Array(0.0f, 0.1f)), (1L, Array(0.2f, 0.0f)),
      (3L, Array(0.1f, 0.1f)),
      (4L, Array(10.0f, 10.1f)), (2L, Array(10.2f, 10.0f)),
      (5L, Array(9.9f, 10.0f))).toDF("vec_id", "embedding")
    def run(df: org.apache.spark.sql.DataFrame) =
      Ann.kmeans(df, 2, 2).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run(vecs)
    assert(got === Map(6L -> 6L, 1L -> 6L, 3L -> 6L,
      4L -> 4L, 2L -> 4L, 5L -> 4L))
    assert(run(vecs.repartition(5)) === got,
      "fixed-point centroid updates make iterations order-independent")
  }

  test("semdedup: near-identical vectors pair within their cell; " +
    "orthogonal vectors never pair") {
    import graft.similarity.Ann
    // two direction-clusters seeded by ids 11 and 4 (the first two in
    // md5(id) order), one per direction; id 11 is an exact copy of id 1
    // — every within-cell near-parallel pair surfaces, cross-direction
    // cosines are ~0 and stay below the threshold
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (3L, Array(1.02f, 0.0f)),
      (11L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)), (4L, Array(0.0f, 1.03f)))
      .toDF("vec_id", "embedding")
    val got = Ann.semdedup(vecs, 2, 2, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === Set((1L, 3L), (1L, 11L), (3L, 11L), (2L, 4L)))
    assert(got.values.forall(_ > 0.999))
  }

  test("prototypePrune keeps the hardest ceil(keepFrac·n) per group") {
    import graft.similarity.Ann
    // three prototypical vectors (cos=+1 to the centroid) and one hard
    // opposite (cos=-1): with keepFrac=0.5, keep = the opposite + the
    // lowest-id of the cos=+1 tie
    val vecs = Seq(
      (1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(1.0f, 0.0f)),
      (3L, 0, Array(1.0f, 0.0f)), (4L, 0, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = Ann.prototypePrune(vecs, 0.5).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got(4L)._1 === -1.0 && got(4L)._2, "hardest example kept")
    assert(got(1L)._1 === 1.0)
    assert(got.filter(_._2._2).keySet === Set(4L, 1L))
  }

  test("dsirWeights: add-one-smoothed scaled-integer importance ratios, " +
    "target-heavy docs rank above generic ones") {
    // alpha/beta/gamma hash to distinct cells at 64 buckets (35/48/23);
    // target corpus = source 't'. By hand: r_alpha = (2+1)·1e6 div (3+1)
    // = 750000, r_beta = (1+1)·1e6 div 4 = 500000, r_gamma = (0+1)·1e6
    // div 4 = 250000 → w1 = 2·750000 + 500000, w2 = 750000 + 2·500000,
    // w3 = 3·250000.
    val docs = Seq(
      (1L, "alpha alpha beta", "t"),
      (2L, "alpha beta beta", "r"),
      (3L, "gamma gamma gamma", "r"))
      .toDF("doc_id", "text", "source")
    val got = graft.text.TextOps.dsirWeights(docs, Seq("t"), 64).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2000000L, 2L -> 1750000L, 3L -> 750000L))
  }

  test("chunkDedup: corpus-repeated chunks flagged, within-doc repeats " +
    "count once, strict-majority keep gate") {
    import graft.text.TextOps
    // 4-token chunks. doc 1 = two chunks; doc 2 = exact copy (both dup);
    // doc 3 shares doc 1's first chunk, unique tail (half recycled —
    // strict majority drops it); doc 4 short + unique; doc 5 repeats ONE
    // chunk twice within itself only — not a corpus-level duplicate
    val c1 = "a b c d"
    val c2 = "e f g h"
    val docs = Seq(
      (1L, s"$c1 $c2"),
      (2L, s"$c1 $c2"),
      (3L, s"$c1 u v w x"),
      (4L, "y z"),
      (5L, "p q r s p q r s")).toDF("doc_id", "text")
    val got = TextOps.chunkDedup(docs, 4).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got === Map(
      1L -> ((2L, 2L, false)),
      2L -> ((2L, 2L, false)),
      3L -> ((2L, 1L, false)),
      4L -> ((1L, 0L, true)),
      5L -> ((1L, 0L, true))))
  }

  test("substringDedup: maximal duplicated spans — cross-doc runs, " +
    "within-doc repeats, adjacency merge, short docs, separated spans") {
    import graft.text.TextOps
    // k=3 windows. docs 1/2 share the 5-token run "a b c d e" (one
    // merged span each); doc 3 repeats its own 3-gram, and the island
    // merge chains overlapping coverage across the whole doc; doc 4 has
    // no duplicated window; doc 5 is shorter than the window (no
    // windows at all); doc 6 carries TWO duplicated runs separated by a
    // unique gap wider than the merge adjacency — two spans
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x a b c d e y z"),
      (3L, "p q r p q r p"),
      (4L, "u v w q"),
      (5L, "s t"),
      (6L, "a b c z1 z2 z3 c d e")).toDF("doc_id", "text")
    val got = TextOps.substringDedup(docs, 3).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      1L -> ((8L, 1L, 5L, 3L)),
      2L -> ((8L, 1L, 5L, 3L)),
      3L -> ((7L, 1L, 7L, 0L)),
      4L -> ((4L, 0L, 0L, 4L)),
      5L -> ((2L, 0L, 0L, 2L)),
      6L -> ((9L, 2L, 6L, 3L))))
  }

  test("knnClassify: majority label wins, vote ties break to the " +
    "smaller label") {
    import graft.similarity.Ann
    // query 0 sits in a cluster of two label-7 vectors and one label-3:
    // with k=3 the vote is 2:1. Query 1's three neighbors carry three
    // distinct labels (9, 2, 3) — a three-way tie at one vote each
    val corpus = Seq(
      (0L, 7, Array(1.0f, 0.0f)),
      (10L, 7, Array(0.99f, 0.01f)),
      (11L, 7, Array(0.98f, 0.02f)),
      (12L, 3, Array(0.97f, 0.03f)),
      (1L, 5, Array(0.0f, 1.0f)),
      (20L, 9, Array(0.01f, 0.99f)),
      (21L, 2, Array(0.02f, 0.98f))).toDF("vec_id", "label", "embedding")
    val got = Ann.knnClassify(corpus,
        corpus.where($"vec_id" < 2L), 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // query 0: neighbors 10, 11 (label 7) and 12 (label 3) → 7 by 2 votes
    assert(got(0L) === ((7L, 2L)))
    // query 1: neighbors 20 (label 9), 21 (label 2) and vec 12 (label 3)
    // — every label has one vote; the tie resolves to the smallest, 2
    assert(got(1L) === ((2L, 1L)))
  }

  // the two subspaces cluster INDEPENDENTLY: dims 0-1 split {6,1,3} near
  // the origin vs {4,2,5} near (10,10); dims 2-3 split {6,1,2} near
  // (5,0) vs {3,4,5} near (0,5). Seeds are ids 6 and 4 (the first two in
  // md5(id) order), one per cluster in BOTH subspaces.
  private val pqVecs = Seq(
    (6L, Array(0.0f, 0.1f, 5.0f, 0.0f)),
    (1L, Array(0.2f, 0.0f, 5.1f, 0.1f)),
    (3L, Array(0.1f, 0.1f, 0.0f, 5.0f)),
    (4L, Array(10.0f, 10.1f, 0.1f, 5.1f)),
    (2L, Array(10.2f, 10.0f, 4.9f, 0.0f)),
    (5L, Array(9.9f, 10.0f, 0.0f, 4.9f)))

  test("pqCodes: per-subspace codewords follow the subspace clusters, " +
    "not the full-vector ones; deterministic under repartitioning") {
    import graft.similarity.Ann
    val df = pqVecs.toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Ann.pqCodes(d, 2, 2, 2, 2).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = run(df)
    // sub 0 codes: {6,1,3} → codeword 6, {4,2,5} → codeword 4
    for (id <- Seq(6L, 1L, 3L)) assert(got((id, 0L)) === 6L)
    for (id <- Seq(4L, 2L, 5L)) assert(got((id, 0L)) === 4L)
    // sub 1 codes cut ACROSS the sub-0 clusters: {6,1,2} vs {3,4,5}
    for (id <- Seq(6L, 1L, 2L)) assert(got((id, 1L)) === 6L)
    for (id <- Seq(3L, 4L, 5L)) assert(got((id, 1L)) === 4L)
    assert(run(df.repartition(5)) === got,
      "fixed-point codebook updates make codes order-independent")
  }

  test("pqAdcTopK ranks by summed per-subspace codeword distances") {
    import graft.similarity.Ann
    val df = pqVecs.toDF("vec_id", "embedding")
    val got = Ann.pqAdcTopK(df, df.where($"vec_id" === 6L), 2, 2, 2, 2, 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    // query 6 (codes 6,6): vec 1 shares both codewords (ADC ≈ 0); vec 3
    // shares sub-0 only (ADC ≈ the ~7-unit sub-1 gap²); vec 2 shares
    // sub-1 only (ADC ≈ the ~14-unit sub-0 gap²); 4 and 5 share neither
    assert(got.map(x => (x._1, x._2)).toSeq === Seq((1L, 1L), (2L, 3L), (3L, 2L)))
    assert(got(0)._3 < 1.0 && got(1)._3 > 40 && got(1)._3 < 60 &&
      got(2)._3 > 190 && got(2)._3 < 210)
    assert(got.map(_._3).sliding(2).forall(p => p(0) < p(1)),
      "ADC distance increases with rank")
  }

  test("probeCellsBudget: mass budget stops at a giant first cell; the " +
    "minCells floor restores distance-ranked coverage without touching " +
    "the budget-covered tail") {
    import graft.similarity.Ann
    import spark.implicits._
    // 1-d toy inverted file: cell 0 is a drift-fattened giant (100
    // members), cells 1-3 are small (2 each) — the IVF_CHURN_r14
    // skew-frontier shape, where the pure mass rule under-probed
    val cells = Seq((0, Array(0.0f)), (1, Array(1.0f)),
      (2, Array(2.0f)), (3, Array(3.0f))).toDF("c", "cen")
    val asg = ((0 until 100).map(i => (i.toLong, 0)) ++
      Seq((100L, 1), (101L, 2), (102L, 3), (103L, 1), (104L, 2),
        (105L, 3))).toDF("vec_id", "c")
    val queries = Seq((1000L, Array(0.1f)), (1001L, Array(2.9f)))
      .toDF("vec_id", "embedding")
    def probesOf(minCells: Int): Set[(Long, Int)] =
      Ann.probeCellsBudget(queries, cells, asg, 10L, "vec_id", minCells)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    // pure budget: the giant nearest cell exhausts the budget for the
    // query beside it (one probe), while the small-cell query walks
    // all four cells inside the same budget
    val pure = probesOf(1)
    assert(pure.filter(_._1 == 1000L).map(_._2) === Set(0))
    assert(pure.filter(_._1 == 1001L).map(_._2) === Set(0, 1, 2, 3))
    // floor 3: the giant-cell query now also sees its next two
    // distance-ranked cells; the already-covered query is unchanged
    val floored = probesOf(3)
    assert(floored.filter(_._1 == 1000L).map(_._2) === Set(0, 1, 2))
    assert(floored.filter(_._1 == 1001L).map(_._2) === Set(0, 1, 2, 3))
  }

  test("filteredTopK: selective predicate bypasses the index exactly; " +
    "broad predicate post-filters in-cell") {
    import graft.similarity.Ann
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.where(col("vec_id") < 5)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_ivff_spec").toString + "/idx"
    graft.store.Store.buildIvfIndex(spark, idxPath, emb, 8)
    val (cells, asg) = graft.store.Store.readIvfIndex(spark, idxPath)
    // selective branch (label=7 keeps ~10% < nProbe/K=0.25): recall 1 by
    // construction — the answer IS the exact brute force over the
    // filtered subset, and the plan never touches the index parquet
    val narrowPred = col("label") === 7
    val narrowSel = 0.1
    val narrow = Ann.filteredTopK(emb, queries, 3, cells, asg,
      narrowPred, narrowSel, nCells = 8)
    assert(!narrow.queryExecution.executedPlan.toString.contains(idxPath),
      "pre-filter branch must bypass the index")
    val exact = Ann.bruteForceTopK(emb.where(narrowPred), queries, 3)
      .collect().map(_.toString).sorted
    assert(narrow.collect().map(_.toString).sorted === exact)
    // broad branch (label%3=0 keeps ~40% > 0.25): the index IS probed,
    // and every neighbor satisfies the predicate AND lives in one of its
    // query's probed cells (in-cell post-filter, not a global scan)
    val broadPred = col("label") % 3 === 0
    val broad = Ann.filteredTopK(emb, queries, 3, cells, asg,
      broadPred, 0.408, nCells = 8)
    assert(broad.queryExecution.executedPlan.toString.contains(idxPath),
      "post-filter branch must probe the index")
    val rows = broad.join(
      emb.select(col("vec_id").as("nn_id"), col("label")), "nn_id")
    assert(rows.count() > 0)
    assert(rows.where(!(col("label") % 3 === 0)).count() === 0,
      "every neighbor must satisfy the predicate")
    val probed = queries.crossJoin(broadcast(cells))
      .withColumn("dist", Ann.sqdist(col("embedding"), col("cen")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("dist"), col("c"))))
      .where(col("rn") <= 2)
      .select(col("vec_id").as("q_id"), col("c"))
    val offCell = broad
      .join(asg.withColumnRenamed("vec_id", "nn_id"), "nn_id")
      .join(probed, Seq("q_id", "c"), "left_anti")
    assert(offCell.count() === 0,
      "no candidate may come from an unprobed cell")
  }

  test("sourceOverlap: exact pairwise shingle intersections, zero-overlap " +
    "pairs kept, sub-length docs contribute nothing") {
    import graft.text.TextOps
    val docs = Seq(
      ("s1", "a b c d"), //   shingles {a b c, b c d}
      ("s2", "b c d e"), //   shingles {b c d, c d e}
      ("s3", "x y z w"), //   shingles {x y z, y z w} — disjoint
      ("s3", "x y")) //       sub-length: no shingles
      .toDF("source", "text")
    val got = TextOps.sourceOverlap(docs, 3).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet === Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    assert(got(("s1", "s2")) === ((1L, 3L, 0.333333)))
    assert(got(("s1", "s3")) === ((0L, 4L, 0.0)))
    assert(got(("s2", "s3")) === ((0L, 4L, 0.0)))
  }

  test("editVerify: exact distances, prefix cap, absent member as empty") {
    val docs = Seq(
      (1L, "kitten sat here"),
      (2L, "sitting sat here"),
      (3L, "kitten sat here"),
      (4L, "completely different body of text"),
      // beyond-cap divergence is invisible at capChars = 15
      (5L, "kitten sat here EXTRA DIVERGENT TAIL"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 99L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.editVerify(docs, pairs, capChars = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    // lev("kitten sat here", "sitting sat her") = classic kitten→sitting
    // 3 edits + the trailing 'e' truncated by the cap on doc 2 only
    assert(got((1L, 3L)) === ((0L, Some(1.0))))
    assert(got((1L, 5L)) === ((0L, Some(1.0)))) // tail cut by the cap
    assert(got((1L, 2L))._1 === 4L)
    assert(got((1L, 4L))._1 > 5L)
    // absent member: distance = |a| (vs ""), similarity 0
    assert(got((1L, 99L)) === ((15L, Some(0.0))))
  }

  test("hashSplit/splitLeakage: splits match the md5 definition; only " +
    "cross-split pairs at/above the threshold are emitted") {
    import graft.text.TextOps
    // mirror of the hashSplit definition, computed locally
    def splitOf(id: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 20 match {
        case 0 => "test"; case 1 => "val"; case _ => "train"
      }
    }
    val ids = (0L until 200L)
    val got = ids.toDF("doc_id")
      .select(col("doc_id"), TextOps.hashSplit(col("doc_id")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    ids.foreach(id => assert(got(id) === splitOf(id), s"id $id"))
    assert(Set("train", "val", "test").subsetOf(got.values.toSet),
      "200 ids should hit all three splits")
    // leakage: pick one genuinely cross-split and one same-split id pair
    val crossA = ids.find(i => splitOf(i) == "test").get
    val crossB = ids.find(i => splitOf(i) == "train").get
    val sameA +: sameB +: _ =
      ids.filter(i => splitOf(i) == "train").take(2).toList
    val verified = Seq(
      (crossA, crossB, 0.9), //  cross-split, above threshold → emitted
      (sameA, sameB, 0.9), //    same split → dropped
      (crossA, sameB, 0.3)) //   below threshold → dropped
      .toDF("doc_a", "doc_b", "jaccard")
    val leaks = TextOps.splitLeakage(verified, 0.5).collect()
    assert(leaks.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((crossA, crossB)))
    assert(leaks.head.getString(2) === "test" &&
      leaks.head.getString(3) === "train")
  }
}
