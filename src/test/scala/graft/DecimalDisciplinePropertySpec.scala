package graft

import java.math.{BigDecimal => JBD, RoundingMode}

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.tsdb.{Rate, RangeWindows}

/** Randomized fuzz of the engine's cross-engine determinism disciplines
  * — decimal accumulation and order-independent finishing — under RANDOM
  * PARALLELISM (r10 found four order-dependence bugs only at scale-gate
  * time; this suite hunts the next boundary row at spec time).
  *
  * Three invariants, each over a seeded corpus of random series with
  * adversarial magnitudes (values off the 1e-6 grid, mixed exponents,
  * negatives):
  *
  *  1. the decimal window-sum discipline (w7-class) is BIT-identical
  *     across input partitionings AND equals an independent
  *     BigDecimal reference (quantize HALF_UP via the double's shortest
  *     decimal form — Spark's own double→decimal cast semantics — then
  *     exact sum, then one IEEE division);
  *  2. the variance discipline (pql7-class, `Compiler.varPopDet`'s
  *     formula) is bit-identical across partitionings and equals the
  *     reference finishing arithmetic in the documented order;
  *  3. the rate reset-correction decimal accumulation (w3-class) is
  *     bit-identical across partitionings.
  *
  * Case = one (series, eval step) assertion; the suite checks well over
  * 200 per run, all from one fixed seed.
  */
class DecimalDisciplinePropertySpec extends SparkSpec {
  import spark.implicits._

  private val Seed = 20260814L

  /** Spark's double→decimal(18,6) cast: shortest-decimal string of the
    * double, then HALF_UP to 6 places. (DuckDB rounds the binary value —
    * the engines agree except within half-ulp of a .5e-6 boundary, which
    * is why query outputs stay UNROUNDED or decimal-summed end-to-end.)
    */
  private def q6(v: Double): JBD =
    new JBD(java.lang.Double.toString(v)).setScale(6, RoundingMode.HALF_UP)

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  /** Random value with adversarial shape: mixed exponent, 8 decimal
    * digits (off the 1e-6 grid), signed.
    */
  private def randValue(rnd: Random): Double = {
    val exp = rnd.nextInt(10) - 2 // 1e-2 .. 1e7
    val mant = (rnd.nextLong(200000000L) - 100000000L) / 100000000.0
    mant * math.pow(10.0, exp.toDouble)
  }

  private def randSeries(rnd: Random, n: Int, endMs: Long)
      : Map[Long, Seq[(Long, Double)]] =
    (1 to n).map { sid =>
      val m = 1 + rnd.nextInt(40)
      val ts = Seq.fill(m)(rnd.nextLong(endMs + 120000L) - 60000L)
        .distinct.sorted
      sid.toLong -> ts.map(t => (t, randValue(rnd)))
    }.toMap

  private def toDf(series: Map[Long, Seq[(Long, Double)]]): DataFrame =
    series.toSeq.flatMap { case (sid, pts) =>
      pts.map(p => (sid, p._1, p._2)) }
      .toDF("metric_id", "ts_ms", "value")

  /** Run `op` over the same data at several input partitionings and
    * shuffle-partition settings; assert every run is BIT-identical.
    * Returns the canonical result map.
    */
  private def acrossParallelism(df: DataFrame, keyCols: Seq[String],
      valCols: Seq[String])(op: DataFrame => DataFrame)
      : Map[Seq[Any], Seq[Long]] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def run(parts: Int, shuffle: Int): Map[Seq[Any], Seq[Long]] = {
      spark.conf.set("spark.sql.shuffle.partitions", shuffle)
      try op(df.repartition(parts)).collect().map { r =>
        keyCols.map(r.getAs[Any]) ->
          valCols.map(c => bits(r.getAs[Double](c)))
      }.toMap
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    val base = run(1, 5)
    for ((p, s) <- Seq((3, 7), (7, 3), (13, 2))) {
      val other = run(p, s)
      assert(other.keySet === base.keySet,
        s"row set differs at parallelism ($p, $s)")
      for ((k, v) <- base)
        assert(other(k) === v,
          s"bit drift at parallelism ($p, $s) for key $k")
    }
    base
  }

  test("w7-class decimal window sums: parallelism-invariant and equal " +
    "to the BigDecimal reference") {
    val rnd = new Random(Seed)
    val (start, end, step, range) = (0L, 300000L, 60000L, 90000L)
    val series = randSeries(rnd, 40, end)
    val got = acrossParallelism(toDf(series), Seq("metric_id", "eval_ms"),
      Seq("sum_dec", "avg_dec")) { df =>
      RangeWindows.rangeBucketed(df, Seq("metric_id"),
        start, end, step, range,
        Seq("sum_dec" -> (v => sum(v.cast("decimal(18,6)")).cast("double")),
          "n" -> (v => count(v).cast("double"))))
        .withColumn("avg_dec", col("sum_dec") / col("n"))
    }
    var checked = 0
    for ((sid, pts) <- series; e <- start to end by step) {
      val in = pts.filter { case (t, _) => t > e - range && t <= e }
      if (in.nonEmpty) {
        val refSum = in.map(p => q6(p._2)).reduce(_ add _).doubleValue
        val Seq(gotSum, gotAvg) = got(Seq(sid, e))
        assert(gotSum === bits(refSum), s"series $sid eval $e sum")
        assert(gotAvg === bits(refSum / in.size), s"series $sid eval $e avg")
        checked += 1
      } else assert(!got.contains(Seq(sid, e)))
    }
    assert(checked >= 100, s"only $checked populated cases — weak corpus")
  }

  test("pql7-class variance: parallelism-invariant and equal to the " +
    "documented finishing order") {
    val rnd = new Random(Seed + 1)
    val series = randSeries(rnd, 60, 300000L)
    val got = acrossParallelism(toDf(series), Seq("metric_id"),
      Seq("sv", "sd")) { df =>
      // varPopDet's exact shape (Compiler.scala): decimal Σx / Σx²,
      // double finishing s2/n − (s1/n)², clamped at 0
      val d = col("value").cast("decimal(18,6)")
      val n = count(col("value")).cast("double")
      val s1 = sum(d).cast("double")
      val s2 = sum(d * d).cast("double")
      val sv = greatest(s2 / n - (s1 / n) * (s1 / n), lit(0.0))
      df.groupBy("metric_id").agg(sv.as("sv"), sqrt(sv).as("sd"))
    }
    for ((sid, pts) <- series) {
      val n = pts.size.toDouble
      val s1 = pts.map(p => q6(p._2)).reduce(_ add _).doubleValue
      val s2 = pts.map { p => val d = q6(p._2); d.multiply(d) }
        .reduce(_ add _).doubleValue
      val sv = math.max(s2 / n - (s1 / n) * (s1 / n), 0.0)
      assert(got(Seq(sid)) === Seq(bits(sv), bits(math.sqrt(sv))),
        s"series $sid variance")
    }
  }

  test("w3-class rate reset-correction: parallelism-invariant bitwise") {
    val rnd = new Random(Seed + 2)
    val (start, end, step, range) = (0L, 600000L, 30000L, 60000L)
    // counter-shaped series: mostly increasing with injected resets so
    // the decimal correction sum is populated
    val series = (1 to 30).map { sid =>
      var acc = 0.0
      val n = 2 + rnd.nextInt(40)
      val ts = Seq.fill(n)(rnd.nextLong(end + range)).distinct.sorted
      sid.toLong -> ts.map { t =>
        acc = if (rnd.nextDouble() < 0.15) rnd.nextDouble() * 10
          else acc + math.abs(randValue(rnd))
        (t, acc)
      }
    }.toMap
    val got = acrossParallelism(toDf(series), Seq("metric_id", "eval_ms"),
      Seq("increase")) { df =>
      Rate.overSteps(df, Seq("metric_id"), start, end, step, range,
          counter = true)
        .select(col("metric_id"), col("eval_ms"), col("increase"))
        .where(col("increase").isNotNull)
    }
    assert(got.size >= 200, s"only ${got.size} populated rate cases")
  }

  test("variance magnitude guard: |value| >= 1e12 fails loudly instead " +
    "of silently nulling the decimal cast") {
    val df = Seq((1L, 1.0e13), (1L, 2.0e13)).toDF("metric_id", "value")
    val d = col("value").cast("decimal(18,6)")
    val n = count(col("value")).cast("double")
    val s1 = sum(d).cast("double")
    val s2 = sum(d * d).cast("double")
    val guarded = when(count(col("value")) =!= count(d), raise_error(lit(
      "stddev/stdvar: |value| >= 1e12 overflows the decimal(18,6) " +
        "accumulation grid")).cast("double"))
      .otherwise(greatest(s2 / n - (s1 / n) * (s1 / n), lit(0.0)))
    val e = intercept[Throwable] {
      df.groupBy("metric_id").agg(guarded.as("sv")).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    // two loud paths, both matching DuckDB's error-on-overflow: under
    // ANSI (the session default) the decimal cast itself raises; under
    // a non-ANSI deployment the cast nulls and the count-mismatch guard
    // raises instead
    assert(msgs(e).contains("overflows the decimal(18,6)") ||
      msgs(e).contains("NUMERIC_VALUE_OUT_OF_RANGE"), msgs(e))
  }
}
