package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{Enrich, Parse, Route}

/** Single fresh-JVM e2e-job timing at a given core count (arg 1). */
object Probe5 {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("4").toInt
    val path = "/tmp/graft-bench-turns"
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.KvParse.register(s)
    def job(): Unit =
      Route.sinkCounts(Route.routed(Enrich.enrich(Parse.parseTurns(
        s.read.parquet(path)))), graft.Queries.demoRules).collect()
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime(); job()
      println(f"[probe5] cores=$cpus iter=$i sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    s.stop()
  }
}
