package graft

/** Plan-shape regression tests: the properties that keep these operators
  * viable at 100 TB — filters reaching the parquet scan, dimension joins
  * broadcasting, and grid evaluation compiling to explode+hash-aggregate
  * instead of a broadcast nested-loop join. `.explain` output is asserted
  * so a refactor that silently degrades the plan fails here, not on a
  * cluster.
  */
class PlanSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("s4 raw scan pushes id + time filters into the parquet scan") {
    val p = plan("s4_raw_scan")
    // a NON-EMPTY pushed-filter list naming the id column
    assert(p.contains("In(user_id"), p)
    // no shuffle at all for a pure scan+filter
    assert(!p.contains("Exchange hashpartitioning"))
  }

  test("matcher predicates stay pushable (no coalesce wrapper)") {
    val p = plan("f1_matchers")
    assert(p.contains("In(event_type"), p)
  }

  test("j1 dimension join broadcasts the series dim") {
    val p = plan("j1_points_join_series")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("tpch_q5 uses broadcast joins for dims, never a cartesian product") {
    val p = plan("tpch_q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("grid evaluation (w1/w2/rate) has no broadcast nested-loop join") {
    for (q <- Seq("w1_instant_lookback", "w2_range_agg", "w3_rate_1h")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$q compiled to a nested-loop grid join")
      assert(p.contains("Generate explode"), s"$q lost the step explode")
    }
  }

  test("downsample is a single partial+final hash aggregate") {
    val p = plan("a1_downsample_5m")
    // one shuffle: exactly one hashpartitioning exchange
    val shuffles = "Exchange hashpartitioning".r
      .findAllMatchIn(p).length
    assert(shuffles === 1, s"expected 1 shuffle, plan:\n$p")
    assert(p.contains("HashAggregate"))
  }

  test("sessionize shares ONE user-key shuffle across both windows and " +
    "the session aggregate") {
    val p = plan("q2_sessionize")
    val shuffles = "Exchange hashpartitioning".r.findAllMatchIn(p).length
    assert(shuffles === 1, s"expected 1 shuffle, plan:\n${p.take(1500)}")
    assert(p.contains("Window"))
  }

  test("rollup pricing evaluates all grouping levels in one Expand + " +
    "hash-agg pass over a single shuffle") {
    val p = plan("q5_rollup_pricing")
    assert(p.contains("Expand"), p.take(1500))
    val shuffles = "Exchange hashpartitioning".r.findAllMatchIn(p).length
    assert(shuffles === 1, s"expected 1 shuffle, plan:\n${p.take(1500)}")
  }

  test("decontaminate: the benchmark shingle set joins as the semi-join " +
    "build side; no cartesian") {
    val p = plan("d8_decontaminate")
    assert(p.contains("LeftSemi"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
  }

  test("jaccard verify: corpus reduces through a semi-join on pair " +
    "members (no forced broadcast); no exploded-shingle shuffle") {
    val df = SparkEntry.queries("d4_jaccard_verify")(spark, sfDir)
    // candidate-member reduction BEFORE shingle computation, with NO
    // static hint — on a duplication-heavy corpus the member set
    // approaches corpus size and a forced broadcast would OOM the driver
    assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
      df.queryExecution.analyzed.toString.take(1500))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), p.take(1500))
    // the intersection is a per-pair array op, not a corpus-wide
    // (doc, shingle) shuffle join + count aggregate
    assert(p.contains("array_intersect"), p.take(1500))
    assert(!p.contains("CartesianProduct"))
    // ...and AQE still broadcasts the LSH-bounded member set here
    df.collect()
    assert(df.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  test("LSH banding is a pure projection (no collect_list aggregate)") {
    // lshBucketsDirect computes band digests in the minhash projection;
    // the long-format explode -> collect_list groupBy (an extra shuffle
    // of k rows per document) must not reappear in the candidate chain
    val p = plan("d3_lsh_candidates")
    assert(!p.contains("collect_list"), p.take(2000))
  }

  test("vector-vector binops broadcast only aggregate-bounded sides") {
    import org.apache.spark.sql.functions._
    val pts = Tables.points(spark, sfDir)
      .groupBy("event_type", "ts_ms")
      .agg(max_by(col("value"), col("event_id")).as("value"))
    val src = graft.promql.PromSource(pts, Seq("event_type"), {
      case "__name__" => lit("events")
      case "event_type" => col("event_type")
    })
    val p = graft.promql.EvalParams(1704067200000L, 1706659200000L, 3600000L)
    // raw selector / raw selector: NO broadcast hint — AQE decides from
    // runtime sizes (the r2 unconditional broadcast could OOM the driver)
    val raw = graft.promql.Compiler
      .compile("events / events", src, p)
      .queryExecution.optimizedPlan.toString
    assert(!raw.contains("ResolvedHint"),
      s"raw-selector RHS must not carry a broadcast hint:\n$raw")
    // aggregate RHS: the bounded side IS hinted for broadcast
    val agg = graft.promql.Compiler
      .compile("events / sum by (event_type) (events)", src, p)
      .queryExecution.executedPlan.toString
    assert(agg.contains("BroadcastHashJoin"),
      s"aggregate RHS should broadcast:\n$agg")
  }

  test("f6 negative matchers compile to plain column predicates (no map)") {
    val p = plan("f6_matchers_negative")
    // the r2 form allocated a map per row; resolved columns must not
    assert(!p.contains("map_from_arrays") && !p.toLowerCase.contains("map("),
      s"f6 must not build a per-row label map:\n$p")
  }

  test("no registered query plans an unbroadcast cartesian product") {
    // t1 drives a streaming query (side effects); j1 writes its dim —
    // both excluded from this pure plan sweep
    val skip = Set("t1_stream_window", "j1_points_join_series")
    for ((name, fn) <- SparkEntry.queries if !skip(name)) {
      val p = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$p")
    }
  }

  test("sequence packing never plans a single-partition window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = SparkEntry.queries("x8_sequence_pack")(spark, sfDir)
    val bad = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty,
      s"x8 moved the corpus to one partition:\n${bad.mkString("\n")}")
    // the per-shard offset bases enter as a broadcast, not a shuffle
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("no registered query plans an unpartitioned (single-partition) window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    // o1's rank sits ABOVE the series-dim aggregate — a global window over
    // dimension-sized (not corpus-sized) data, the documented design
    val skip = Set("t1_stream_window", "j1_points_join_series",
      "o1_series_sorted")
    for ((name, fn) <- SparkEntry.queries if !skip(name)) {
      val bad = fn(spark, sfDir).queryExecution.optimizedPlan.collect {
        case w: LWindow if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"$name plans a global window: ${bad.headOption}")
    }
  }

  test("sort/sort_desc compile to UNSORTED plans (ordering is presentation)") {
    // a global Sort over an instant vector is pure presentation cost at
    // scale — ordering belongs to the API serialization layer
    val p = plan("pql12_sort_desc")
    // "Sort [...], true" = a GLOBAL sort (range partition + sort);
    // "..., false" sorts are local SortAggregate requirements and fine
    assert(!"""Sort \[[^\]]*\], true""".r.findFirstIn(p).isDefined,
      s"sort_desc must not put a global Sort into the plan:\n$p")
  }

  test("x11/x15/x16/x18/x19: ONE text-bearing corpus scan, inside the durable pin") {
    // The pinned text operators claim "one corpus scan": the exploded
    // tf / chunk relation reads the corpus (with its heavy `text`
    // column) exactly once, inside the eager Stage.pin; every later
    // consumer reads the staged parquet. A lost pin regresses to
    // Catalyst re-scanning the corpus per consumer — which this test
    // catches as a text-bearing documents scan in the FINAL plan.
    def scans(p: String): Seq[String] =
      p.split("Scan parquet|FileScan parquet").toSeq.tail
    for ((q, tag) <- Seq("x11_tfidf_keywords" -> "tfidf-tf",
        "x15_dsir_weights" -> "dsir-tf",
        "x16_chunk_dedup" -> "chunk-pairs",
        "x18_bigram_nll" -> "bigram-tf",
        "x19_moore_lewis" -> "ml-bigram-tf")) {
      graft.store.Stage.startRecording()
      val p = plan(q) // builds the query; the pin materializes eagerly
      val pins = graft.store.Stage.stopRecording()
      assert(pins.map(_._1) === Seq(tag),
        s"$q should materialize exactly the $tag pin, got ${pins.map(_._1)}")
      val pinTextScans = scans(pins.head._2)
        .filter(s => s.contains("documents.parquet") && s.contains("text"))
      assert(pinTextScans.nonEmpty,
        s"$q pin plan lost its corpus scan:\n${pins.head._2.take(1500)}")
      val finalTextScans = scans(p)
        .filter(s => s.contains("documents.parquet") && s.contains("text"))
      assert(finalTextScans.isEmpty,
        s"$q re-reads the corpus text outside the pin:\n${p.take(2000)}")
    }
  }

  test("p1: pinned-scored single pass — one corpus scan inside the pin, " +
    "window keep-test downstream, no corpus-side join") {
    // r17 restructure: quality+langid+md5 materialize in ONE wide corpus
    // scan (the p1-scored pin); the keep-list membership test is
    // `min(doc_id) over (partition by __md5)` on the pin read. A
    // regression to the join form shows up as a second documents scan,
    // or a join in the final plan; a lost pin as a documents scan there.
    def scans(p: String): Seq[String] =
      p.split("Scan parquet|FileScan parquet").toSeq.tail
    graft.store.Stage.startRecording()
    val p = plan("p1_curation_pipeline")
    val pins = graft.store.Stage.stopRecording()
    assert(pins.map(_._1) === Seq("p1-scored"),
      s"p1 should materialize exactly the p1-scored pin, got ${pins.map(_._1)}")
    assert(scans(pins.head._2).count(_.contains("documents.parquet")) >= 1,
      s"p1 pin plan lost its corpus scan:\n${pins.head._2.take(1500)}")
    assert(scans(p).forall(!_.contains("documents.parquet")),
      s"p1 re-reads the corpus outside the pin:\n${p.take(2000)}")
    assert(!p.contains("Join"),
      s"p1 final plan regressed to the join form:\n${p.take(2000)}")
    assert(p.contains("Window"),
      s"p1 final plan lost the keep-test window:\n${p.take(2000)}")
  }

  test("gridSum keeps partial/final hash aggregation with the two " +
    "decimal(20,0) partial sums (map-side combine preserved)") {
    // the r15 distributive rewrite's cost model depends on this shape:
    // per-row work is two long floors + two long->decimal casts feeding
    // map-side partial sums; the decimal multiply happens once per
    // group AFTER the final aggregate. A refactor that collapses the
    // sum to a single-phase aggregate (losing map-side combine) or
    // reintroduces a per-row decimal multiply fails here.
    val p = plan("pql24_sum_large")
    assert("partial_sum\\(cast\\(FLOOR".r.findAllMatchIn(p).nonEmpty,
      s"expected decimal partial sums over long floors:\n${p.take(2000)}")
    assert("as decimal\\(20,0\\)".r.findAllMatchIn(p).size >= 2, p.take(2000))
  }

  test("upkeep rewrite shape: the LWW dedup aggregate rides one " +
    "repartition on the bucket column (subset rule, no second exchange)") {
    import org.apache.spark.sql.functions._
    // fineForUpkeep pre-partitions rewrite inputs on metric_id (bucketed
    // mode) or (metric_id, ts_ms) (legacy); either HashPartitioning
    // satisfies the groupBy(metric_id, ts_ms)'s clustering requirement —
    // HashPartitioning(e) satisfies ClusteredDistribution(c) for e ⊆ c —
    // so the dedup aggregate adds NO second exchange and the write rides
    // the same task layout. This is the mechanism behind both the r15
    // soak fix (agg-task head-of-line bound) and the r16 bucketed write
    // alignment.
    val base = spark.range(1000).select(col("id").as("metric_id"),
      (col("id") % 97L * 1000L).as("ts_ms"),
      col("id").cast("double").as("value"), col("id").as("__seq"))
    for (keys <- Seq(Seq("metric_id"), Seq("metric_id", "ts_ms"))) {
      val shaped = base.repartition(8, keys.map(col): _*)
        .groupBy("metric_id", "ts_ms")
        .agg(max_by(col("value"), col("__seq")).as("value"),
          max(col("__seq")).as("__seq"))
      val p = shaped.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllMatchIn(p).length === 1,
        s"keys=$keys expected exactly 1 exchange:\n${p.take(1500)}")
    }
  }

  test("matcher queries keep whole-stage codegen in the scan path") {
    // AQE hides codegen until the final plan: execute first
    val df = SparkEntry.queries("f1_matchers")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the tree string
    assert(p.contains("*("), p)
  }
}
