package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.sources.Transcripts

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Transcripts.fromEvents(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_transcripts" -> ((s, dir) => Transcripts.fromEvents(s, dir)),
    "q1_agg" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(org.apache.spark.sql.functions.sum("l_quantity").as("sum_qty")))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_transcripts" -> (Transcripts.eventsCte + "SELECT * FROM transcripts"),
    "q1_agg" -> "SELECT l_returnflag, sum(l_quantity) AS sum_qty FROM lineitem GROUP BY 1"
  )
}
