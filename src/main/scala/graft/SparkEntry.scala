package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.{Enrich, Route}
import graft.sources.Transcripts

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship end-to-end pipeline (parse → enrich → route → aggregate) on
    * sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    functions.KvParse.register(spark)
    val t = Transcripts.fromEvents(spark, "/root/testdata/sf0.001")
    val routed = Route.routed(Enrich.enrich(operators.Parse.parseTurns(t)))
    Route.sinkCounts(routed, Queries.demoRules)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
