package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{Enrich, Parse, Route}

/** The one diagnostic probe (consolidates round 1's Probe..Probe8 scratch
  * mains). Two modes:
  *
  *  - `runMain graft.tools.Probe scale [iters] [cores...]` — the e2e
  *    scaling ladder over the synthesized transcript table (expects
  *    /tmp/graft-bench-turns, written by a Bench run), printing min wall
  *    time per core level and pairwise efficiency.
  *  - `runMain graft.tools.Probe q [names...]` — per-query wall times over
  *    $SPARK_GRAFT_SF_DIR (default sf0.1) at $SPARK_GRAFT_CPUS cores; no
  *    names = all queries. 3 runs each, min reported.
  */
object Probe {
  def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.KvParse.register(s)
    graft.functions.ParseTurn.register(s)
    graft.functions.SimHash.register(s)
    s
  }

  private def scale(args: Array[String]): Unit = {
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
      println(f"[probe] cores=$cpus min=${ts.min}%.2f all=${ts.map(t => f"$t%.1f").mkString(",")}")
      s.stop()
      cpus -> ts.min
    }.toMap
    for (Seq(lo, hi) <- levels.sorted.sliding(2) if results.contains(lo) && results.contains(hi)) {
      val eff = results(lo) / ((hi.toDouble / lo) * results(hi))
      println(f"[probe] EFF $lo->$hi: ${eff}%.2f")
    }
  }

  private def queries(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val s = session(cpus)
    val names = if (args.isEmpty) graft.SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); fn(s, sfDir).count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $n min=${ts.min}%.2f all=${ts.map(t => f"$t%.1f").mkString(",")}")
    }
    s.stop()
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("q") => queries(args.drop(1))
    case Some("scale") => scale(args.drop(1))
    case _ => scale(args)
  }
}
