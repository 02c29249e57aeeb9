package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{Enrich, Parse, Route}

/** Final scaling measurement: many iterations per level, min + all times. */
object Probe8 {
  def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.KvParse.register(s)
    graft.functions.ParseTurn.register(s)
    s
  }

  def main(args: Array[String]): Unit = {
    val iters = args.headOption.getOrElse("8").toInt
    val levels = args.drop(1).map(_.toInt).toSeq match {
      case Nil => Seq(4, 16, 32); case l => l
    }
    val results = levels.map { cpus =>
      val s = session(cpus)
      def run(): Unit =
        Route.sinkCounts(Route.routed(Enrich.enrich(Parse.parseTurns(
          s.read.parquet("/tmp/graft-bench-turns")))), graft.Queries.demoRules).collect()
      run() // warm
      val ts = (1 to iters).map { _ =>
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe8] cores=$cpus min=${ts.min}%.2f all=${ts.map(t => f"$t%.1f").mkString(",")}")
      s.stop()
      cpus -> ts.min
    }.toMap
    for (Seq(lo, hi) <- levels.sorted.sliding(2) if results.contains(lo) && results.contains(hi)) {
      val eff = results(lo) / ((hi.toDouble / lo) * results(hi))
      println(f"[probe8] EFF $lo->$hi: ${eff}%.2f")
    }
  }
}
