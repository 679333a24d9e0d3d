package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query implementations + DuckDB oracles live in
  * [[graft.driver.DriverQueries]]. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * BM25(k1=0.9, b=0.4) top-k over the documents corpus (north-rule path). */
  def entry(spark: SparkSession): DataFrame =
    driver.DriverQueries.queries("r1_bm25_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    driver.DriverQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    driver.DriverQueries.oracleSql
}
