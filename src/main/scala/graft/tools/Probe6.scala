package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{Enrich, Parse, Route}
import graft.sources.Transcripts

/** Parquet-input e2e scaling: synth once to parquet, time read→parse→route→agg. */
object Probe6 {
  def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.KvParse.register(s)
    s
  }

  def job(s: SparkSession, path: String): Long = {
    val t = s.read.parquet(path)
    Route.sinkCounts(Route.routed(Enrich.enrich(Parse.parseTurns(t))),
      graft.Queries.demoRules).collect()
      .filter(_.getString(0) == "all").map(_.getLong(2)).sum
  }

  def main(args: Array[String]): Unit = {
    val turns = 10000000L
    val path = "/tmp/graft-bench-turns"
    val s0 = session(32)
    Transcripts.synthesize(s0, turns / 50, 50, numPartitions = 64).toDF()
      .write.mode("overwrite").parquet(path)
    s0.stop()
    Seq(2, 8, 32).foreach { cpus =>
      val s = session(cpus)
      job(s, path) // warm
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime(); job(s, path); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe6] cores=$cpus best=${times.min}%.2f rows/s=${(turns / times.min).toLong} all=${times.map(x => f"$x%.1f").mkString(",")}")
      s.stop()
    }
  }
}
