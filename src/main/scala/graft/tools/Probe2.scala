package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{Enrich, Parse, Route}
import graft.sources.Transcripts

/** Scaling isolation probe: fresh session per run, both orders. */
object Probe2 {
  def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"probe2-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.KvParse.register(s)
    s
  }

  def job(spark: SparkSession, turns: Long): Long = {
    val t = Transcripts.synthesize(spark, turns / 50, 50,
      numPartitions = spark.sparkContext.defaultParallelism * 2).toDF()
    Route.sinkCounts(Route.routed(Enrich.enrich(Parse.parseTurns(t))),
      graft.Queries.demoRules).collect()
      .filter(_.getString(0) == "all").map(_.getLong(2)).sum
  }

  def run(cpus: Int, turns: Long): Unit = {
    val s = session(cpus)
    val times = (1 to 3).map { i =>
      val t0 = System.nanoTime()
      job(s, turns)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe2] cores=$cpus iter=$i sec=$sec%.2f rows/s=${(turns / sec).toLong}")
      sec
    }
    println(f"[probe2] cores=$cpus BEST=${times.min}%.2f rows/s=${(turns / times.min).toLong}")
    s.stop()
  }

  def main(args: Array[String]): Unit = {
    val turns = 20000000L
    run(8, turns)
    run(32, turns)
  }
}
