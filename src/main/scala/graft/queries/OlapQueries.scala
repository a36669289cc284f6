package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational/OLAP queries over the TPC-H-ish tables — exercises scans,
  * predicate pushdown, broadcast joins and hash aggregation at bench scale.
  *
  * Float determinism: money aggregates are summed as DECIMAL (exact,
  * order-independent) and cast back to double, so Spark and the DuckDB
  * oracle agree bit-for-bit regardless of partitioning.
  */
object OlapQueries {

  private def t(s: SparkSession, dir: String, name: String) = Tables.table(s, dir, name)

  /** SUM(price*(1-disc)) with order-independent decimal accumulation.
    * Scale 4, not more: price (2dp) × discount (2dp) is EXACTLY a 4dp
    * rational, and at 4dp both engines' double→decimal casts recover the
    * same exact value. A wider scale (28,10) asks for digits the data
    * doesn't have and amplifies sub-ulp representation differences —
    * Spark casts via the double's shortest decimal string, DuckDB via its
    * full binary expansion, so ...4462 vs ...44619999994 round apart
    * (caught by q5_rollup_pricing's (N,F) subtotal at sf0.01).
    */
  private val revenueExpr =
    sum(expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))"))
      .cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("sum_qty"))),

    "tpch_q1_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum(expr("CAST(l_extendedprice AS DECIMAL(18,2))")).cast("double")
            .as("sum_base_price"),
          revenueExpr.as("sum_disc_price"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))),

    "tpch_q3_topranked" -> ((s, dir) => {
      val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .where(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      val l = t(s, dir, "lineitem")
        .where(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        // o_orderdate is TIMESTAMP_NTZ; cast in the UTC session == epoch_ms
        .groupBy(col("l_orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"))
        .agg(revenueExpr.as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // pure scan+filter+agg — the pushdown/codegen showcase query
    "tpch_q6_forecast" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum(expr("CAST(l_extendedprice * l_discount AS DECIMAL(28,4))"))
          .cast("double").as("revenue"),
          count(lit(1)).as("n"))),

    // gap-based sessionization over the events stream (the classic
    // behavioral-analytics shape): a session breaks after 30 min of
    // user inactivity. One shuffle on the user key; lag + running sum +
    // final per-session aggregate all reuse the same window partitioning
    "q2_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val gapMs = 30L * 60000L
      val w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
      Tables.points(s, dir)
        .withColumn("__prev", lag(col("ts_ms"), 1).over(w))
        .withColumn("__new", (col("__prev").isNull ||
          col("ts_ms") - col("__prev") > gapMs).cast("long"))
        .withColumn("session_id", sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts_ms").as("t_start"), max("ts_ms").as("t_end"))
    }),

    // staged conversion funnel over the events stream: first view →
    // first click strictly after it → first purchase strictly after
    // that. Three aggregates reusing one user_id shuffle; each stage's
    // survivor set is aggregate-small, so the stage joins broadcast
    // under AQE at any corpus size
    "q3_funnel" -> ((s, dir) => {
      val ev = Tables.points(s, dir).select("user_id", "event_type", "ts_ms")
      val v = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts_ms").as("t_view"))
      val c = ev.join(v, "user_id")
        .where(col("event_type") === "click" && col("ts_ms") > col("t_view"))
        .groupBy("user_id").agg(min("ts_ms").as("t_click"))
      val p = ev.join(c, "user_id")
        .where(col("event_type") === "purchase" &&
          col("ts_ms") > col("t_click"))
        .groupBy("user_id").agg(min("ts_ms").as("t_purchase"))
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click_after_view")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_click")))
    }),

    // weekly cohort retention over the events stream (the classic
    // product-analytics companion to q2/q3): cohort = epoch week of a
    // user's first event, retention = distinct users active at each week
    // offset. Two linear user-keyed shuffles (per-user min, distinct
    // user-weeks); the per-user cohort dim is aggregate-small and
    // broadcasts under AQE; the final aggregate is weeks² rows. All
    // arithmetic is BIGINT floor-division, engine-exact
    "q4_cohort_retention" -> ((s, dir) => {
      val wk = 7L * 86400000L
      val ev = Tables.points(s, dir).select("user_id", "ts_ms")
      val first = ev.groupBy("user_id")
        .agg(expr(s"min(ts_ms) div $wk").as("cohort_wk"))
      val active = ev.select(col("user_id"),
        expr(s"ts_ms div $wk").as("wk")).distinct()
      active.join(first, "user_id")
        .groupBy(col("cohort_wk"),
          (col("wk") - col("cohort_wk")).as("wk_offset"))
        .agg(countDistinct("user_id").as("n_users"))
    }),

    // as-of enrichment: every click carries the user's most recent
    // purchase at-or-before it (the trade↔quote join). The purchase side
    // is pre-aggregated to one row per (user, instant) — arg_max by
    // event id — because simultaneous right rows have no deterministic
    // winner; AsOfJoin then unions both sides under ONE user-key shuffle
    "q6_asof_join" -> ((s, dir) => {
      val ev = Tables.points(s, dir)
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts_ms", "value")
      val purchases = ev.where(col("event_type") === "purchase")
        .groupBy("user_id", "ts_ms")
        .agg(max_by(col("value"), col("event_id")).as("p_value"))
        .withColumn("p_ts", col("ts_ms"))
      graft.tsdb.AsOfJoin.asof(clicks, purchases, "user_id", "ts_ms",
        Seq("p_ts", "p_value"))
    }),

    // ROLLUP pricing summary (GROUPING SETS): per (flag, status), per
    // flag, and grand total in ONE hash aggregate — Spark expands the
    // rollup levels with an Expand node under a single shuffle instead
    // of three scans; gid disambiguates subtotal rows exactly as SQL
    // GROUPING does
    "q5_rollup_pricing" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(grouping_id().cast("long").as("gid"),
          sum("l_quantity").as("sum_qty"),
          revenueExpr.as("revenue"),
          count(lit(1)).as("n"))),

    "tpch_q5_region_revenue" -> ((s, dir) => {
      // dims broadcast; fact tables shuffle once on the join key
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      val cust = t(s, dir, "customer")
      val sup = t(s, dir, "supplier")
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(revenueExpr.as("revenue"))
    }))

  val oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      "SELECT l_returnflag, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY 1",

    "q2_sessionize" -> """
      WITH pts AS (SELECT event_id, user_id,
        epoch_ns(ts)//1000000 AS ts_ms FROM events),
      x AS (SELECT user_id, event_id, ts_ms,
        CASE WHEN lag(ts_ms) OVER
            (PARTITION BY user_id ORDER BY ts_ms, event_id) IS NULL
          OR ts_ms - lag(ts_ms) OVER
            (PARTITION BY user_id ORDER BY ts_ms, event_id) > 1800000
          THEN 1 ELSE 0 END AS new_s
        FROM pts),
      y AS (SELECT user_id, ts_ms, sum(new_s) OVER
          (PARTITION BY user_id ORDER BY ts_ms, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
          AS session_id
        FROM x)
      SELECT user_id, session_id, count(*) AS n_events,
        min(ts_ms) AS t_start, max(ts_ms) AS t_end
      FROM y GROUP BY 1, 2""",

    "q3_funnel" -> """
      WITH ev AS (SELECT user_id, event_type,
        epoch_ns(ts)//1000000 AS ts_ms FROM events),
      v AS (SELECT user_id, min(ts_ms) AS t_view FROM ev
        WHERE event_type = 'view' GROUP BY 1),
      c AS (SELECT e.user_id, min(e.ts_ms) AS t_click
        FROM ev e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts_ms > v.t_view GROUP BY 1),
      p AS (SELECT e.user_id, min(e.ts_ms) AS t_purchase
        FROM ev e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts_ms > c.t_click GROUP BY 1)
      SELECT * FROM
        (SELECT count(*) AS n_view FROM v),
        (SELECT count(*) AS n_click_after_view FROM c),
        (SELECT count(*) AS n_purchase_after_click FROM p)""",

    "q4_cohort_retention" -> """
      WITH ev AS (SELECT user_id,
        epoch_ns(ts)//1000000 AS ts_ms FROM events),
      f AS (SELECT user_id, min(ts_ms) // 604800000 AS cohort_wk
        FROM ev GROUP BY 1),
      a AS (SELECT DISTINCT user_id, ts_ms // 604800000 AS wk FROM ev)
      SELECT f.cohort_wk, a.wk - f.cohort_wk AS wk_offset,
        count(DISTINCT a.user_id) AS n_users
      FROM a JOIN f USING (user_id) GROUP BY 1, 2""",

    // DuckDB's native ASOF LEFT JOIN is the semantic spec the Spark-side
    // union-window implementation is pinned to (inclusive >= match)
    "q6_asof_join" -> """
      WITH ev AS (SELECT event_id, user_id, event_type,
        epoch_ns(ts)//1000000 AS ts_ms, value FROM events),
      p AS (SELECT user_id, ts_ms AS p_ts, arg_max(value, event_id) AS p_value
        FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2),
      c AS (SELECT event_id, user_id, ts_ms, value FROM ev
        WHERE event_type = 'click')
      SELECT c.event_id, c.user_id, c.ts_ms, c.value, p.p_ts, p.p_value
      FROM c ASOF LEFT JOIN p
        ON c.user_id = p.user_id AND c.ts_ms >= p.p_ts""",

    "q5_rollup_pricing" -> """
      SELECT l_returnflag, l_linestatus,
        GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid,
        sum(l_quantity) AS sum_qty,
        CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
        count(*) AS n
      FROM lineitem
      GROUP BY ROLLUP(l_returnflag, l_linestatus)""",

    "tpch_q1_pricing" -> """
      SELECT l_returnflag, l_linestatus,
        sum(l_quantity) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        sum(l_quantity) / count(*) AS avg_qty,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY 1, 2""",

    "tpch_q3_topranked" -> """
      SELECT l_orderkey, epoch_ms(o_orderdate) AS odate_ms,
        CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1995-03-15'
        AND l_shipdate > TIMESTAMP '1995-03-15'
      GROUP BY 1, 2
      ORDER BY revenue DESC, l_orderkey ASC
      LIMIT 10""",

    "tpch_q6_forecast" -> """
      SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,4)))
          AS DOUBLE) AS revenue,
        count(*) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1994-01-01'
        AND l_shipdate < TIMESTAMP '1995-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24""",

    "tpch_q5_region_revenue" -> """
      SELECT n_name,
        CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1""")
}
