package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's `queries`/`oracleSql` registration.
  * Each entry is one SURVEY §2 inventory row (or one training-data
  * pipeline operator) exercised end-to-end over the driver's parquet
  * tables; `oracleSql` carries the DuckDB-equivalent SQL for the
  * driver's hash compare.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.Knn.queries ++
      operators.TextAnalysis.queries ++ operators.Dedup.queries ++
      operators.Temporal.queries ++ operators.Advanced.queries ++
      operators.Indexed.queries ++ operators.Corpus.queries ++
      operators.Bucketed.queries ++ operators.Layout.queries ++
      operators.Hybrid.queries ++ operators.Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracleSql ++ operators.Knn.oracleSql ++
      operators.TextAnalysis.oracleSql ++ operators.Dedup.oracleSql ++
      operators.Temporal.oracleSql ++ operators.Advanced.oracleSql ++
      operators.Indexed.oracleSql ++ operators.Corpus.oracleSql ++
      operators.Bucketed.oracleSql ++ operators.Layout.oracleSql ++
      operators.Hybrid.oracleSql ++ operators.Graph.oracleSql
}
