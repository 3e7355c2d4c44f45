package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2's inventory (plus the training-data-pipeline
  * operators) is declared here as a named query with, where SQL-expressible,
  * a DuckDB oracle over the same parquet tables. Column names are aliased
  * identically on both sides.
  */
object SparkEntry {

  val registry: Seq[GraftQuery] =
    CoreQueries.all ++ JoinQueries.all ++ WindowQueries.all ++
      TextQueries.all ++ SpanQueries.all ++ VectorQueries.all ++
      DslQueries.all ++ CompositeQueries.all ++ SamplingQueries.all ++
      WarehouseQueries.all ++ TemporalQueries.all ++ BpeQueries.all ++
      LmQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1Agg.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(g => g.name -> g.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(g => g.oracle.map(g.name -> _)).toMap
}
