package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every operator family's named queries; each key
  * has a DuckDB-equivalent in `oracleSql` (same column names — the driver
  * sorts columns by name before hashing) unless the op is not SQL-expressible,
  * in which case the driver records a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("tpch_q5_region_revenue")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.OlapQueries.queries ++
      graft.queries.TsdbQueries.queries ++
      graft.queries.PromqlQueries.queries ++
      graft.queries.PipelineQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.OlapQueries.oracleSql ++
      graft.queries.TsdbQueries.oracleSql ++
      graft.queries.PromqlQueries.oracleSql ++
      graft.queries.PipelineQueries.oracleSql
}
