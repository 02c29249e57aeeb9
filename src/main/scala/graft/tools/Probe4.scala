package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Enrich, Parse, Route}
import graft.sources.Transcripts

/** Which stage fails to scale 8→32 threads? */
object Probe4 {
  def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"probe4-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.KvParse.register(s)
    s
  }

  def best(n: Int)(f: => Unit): Double =
    (1 to n).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min

  def main(args: Array[String]): Unit = {
    val turns = 10000000L
    val res = Seq(8, 32).map { cpus =>
      val s = session(cpus)
      val t = Transcripts.synthesize(s, turns / 50, 50,
        numPartitions = s.sparkContext.defaultParallelism * 2).toDF()
      def synthOnly = t.select(sum(length(col("text")))).head()
      def regexOnly = t.select(sum(length(regexp_extract(col("text"), "tool=([A-Za-z0-9_]+)", 1)))).head()
      def kvOnly = t.select(sum(size(call_function("kv_parse", col("text"))))).head()
      def explodeAgg = Route.sinkCounts(Route.routed(t.withColumn("host", lit("h"))), graft.Queries.demoRules).collect()
      def full = Route.sinkCounts(Route.routed(Enrich.enrich(Parse.parseTurns(t))), graft.Queries.demoRules).collect()
      val names = Seq("synth", "regex", "kv", "explodeAgg", "full")
      val fns: Seq[() => Unit] = Seq(() => synthOnly, () => regexOnly, () => kvOnly, () => explodeAgg, () => full)
      val times = names.zip(fns).map { case (n, f) =>
        f() // warm
        val b = best(3)(f())
        println(f"[probe4] cores=$cpus $n best=$b%.2f")
        n -> b
      }
      s.stop()
      cpus -> times.toMap
    }.toMap
    Seq("synth", "regex", "kv", "explodeAgg", "full").foreach { n =>
      val eff = res(8)(n) / (4 * res(32)(n))
      println(f"[probe4] SCALING $n: t8=${res(8)(n)}%.2f t32=${res(32)(n)}%.2f eff=$eff%.2f")
    }
  }
}
