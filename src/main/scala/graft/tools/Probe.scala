package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Enrich, Parse, Route}
import graft.sources.Transcripts

/** Scratch profiling main (not part of the driver contract). */
object Probe {
  def timed(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.KvParse.register(spark)

    val turns = Transcripts.synthesize(spark, 10000, 50, numPartitions = 64).toDF()
    timed("synthesize.count")(turns.count())
    timed("synthesize.count2")(turns.count())
    val parsed = Parse.parseTurns(turns)
    timed("parse.count")(parsed.count())
    val enriched = Enrich.enrich(parsed)
    timed("enrich.count")(enriched.count())
    val routed = Route.routed(enriched)
    timed("routed.count")(routed.count())
    val slim = routed.select(col("ts"), col("host"), col("route_key"), col("text"),
      col("conv_id"), col("turn_idx"), col("verb"), col("dur_ms"),
      col("status"), col("tool_family"))
    timed("sinkCounts.nocache")(Route.sinkCounts(slim, graft.Queries.demoRules).count())
    timed("slim.persist.count") {
      slim.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      slim.count()
    }
    timed("slim.cached.count")(slim.count())
    timed("sinkCounts.cached")(Route.sinkCounts(slim, graft.Queries.demoRules).count())
    timed("sinkCounts.cached2")(Route.sinkCounts(slim, graft.Queries.demoRules).count())
    timed("groupByOnly.cached")(
      slim.groupBy(col("route_key")).agg(count(lit(1))).count())
    timed("explodeOnly.cached")(
      slim.select(explode(Route.acceptingSinks(graft.Queries.demoRules, col("text")))).count())
    slim.unpersist()
    spark.stop()
  }
}
