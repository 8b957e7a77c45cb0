package graft

import graft.queries.{ExtendedQueries, PipelineQueries, Q, Round4Queries, Round5Queries, Round6Queries, Round7Queries, Round8Queries, StarQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one named entry per implemented operator from
  * SURVEY.md §2 plus the training-data-pipeline suite (dedup / similarity /
  * multimodal / text analysis / streaming); `oracleSql` holds the DuckDB
  * equivalent for every SQL-expressible entry. Column names and types are
  * aligned on both sides.
  */
object SparkEntry {

  def registry: Seq[Q] = {
    val all = StarQueries.all ++ PipelineQueries.all ++
      ExtendedQueries.all ++ Round4Queries.all ++ Round5Queries.all ++
      Round6Queries.all ++ Round7Queries.all ++ Round8Queries.all
    val dupes = all.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(",")}")
    all
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    registry.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (engine
    * hash functions, streaming internals) → driver rows-only check.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
