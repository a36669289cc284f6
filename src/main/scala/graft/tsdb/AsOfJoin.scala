package graft.tsdb

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row is enriched with the payload of the most
  * recent right row whose timestamp is ≤ the left row's (inclusive),
  * within the same key — the classic time-series enrichment join
  * (trade↔quote, event↔latest-state) that Spark's built-in join
  * operators cannot express without a per-row range probe.
  *
  * Spark-first design: rather than a theta-join (broadcast nested loop,
  * or a skew-prone range join), both sides are UNIONED and the right
  * payload is carried forward by a last-non-null window ordered
  * (ts, side) within the key — ONE hash shuffle of left+right on the
  * key, a sort, zero pairwise work; this is the relational equivalent
  * of the sorted-merge ASOF algorithm and survives any corpus size
  * (per-key data never concentrates beyond the key's own history, the
  * same property every per-series window in this engine relies on).
  *
  * Semantics pinned to DuckDB's `ASOF LEFT JOIN ... ON l.k = r.k AND
  * l.ts >= r.ts` (the oracle): a right row at exactly the left
  * timestamp IS visible (the right side orders before the left at
  * equal ts), and left rows with no prior right row keep NULL payload.
  * The payload is carried as ONE struct, so a right row with NULL in
  * some payload field can never tear (a per-column carry would splice
  * fields from different right rows). The right side must be unique
  * per (key, ts) — pre-aggregate it otherwise; multiple simultaneous
  * right rows have no deterministic winner in any engine.
  */
object AsOfJoin {

  /** @param payload right-side columns to carry (must exist on `right`;
    *                names must not collide with `left`'s columns)
    */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val lOnly = lCols.filterNot(c => c == key || c == ts)
    // withColumn REPLACES on name collision — a payload name already on
    // the left (or a left-only name on the right) would silently null
    // real data instead of failing, so enforce the scaladoc contract
    val payClash = payload.filter(lCols.contains)
    require(payClash.isEmpty,
      s"asof payload columns collide with left columns: $payClash")
    val rClash = lOnly.filter(right.columns.contains)
    require(rClash.isEmpty,
      s"left-only columns also present on right: $rClash")
    val l = payload.foldLeft(left.withColumn("__side", lit(1))) {
      (df, p) => df.withColumn(p, lit(null).cast(right.schema(p).dataType))
    }
    val r = lOnly.foldLeft(right.withColumn("__side", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val cols = (lCols ++ Seq("__side") ++ payload).map(col)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.select(cols: _*).unionByName(r.select(cols: _*))
      .withColumn("__p", last(
        when(col("__side") === 0, struct(payload.map(col): _*)),
        ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(lCols.map(col) ++ payload.map(p => col(s"__p.$p").as(p)): _*)
  }
}
