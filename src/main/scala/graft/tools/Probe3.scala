package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Enrich, Parse, Route}
import graft.sources.Transcripts

/** Stage-by-stage 8-vs-32-thread bisection. */
object Probe3 {
  def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName(s"probe3-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.KvParse.register(s)
    s
  }

  def timed(name: String, cpus: Int)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[probe3] cores=$cpus $name: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
  }

  def stages(spark: SparkSession, cpus: Int): Unit = {
    val t = Transcripts.synthesize(spark, 40000, 50,
      numPartitions = spark.sparkContext.defaultParallelism * 2).toDF()
    timed("synthesize", cpus)(t.count())
    timed("synth+count(text)", cpus)(t.select(length(col("text"))).filter(col("length(text)") >= 0).count())
    val p = Parse.parseTurns(t)
    timed("parse(kv incl)", cpus)(p.select(col("dur_ms")).filter(col("dur_ms").isNotNull).count())
    timed("parse kv only", cpus)(t.select(call_function("kv_parse", col("text")).as("kv"))
      .select(size(col("kv")).as("s")).agg(sum("s")).head().getLong(0))
    timed("parse regex only", cpus)(
      t.withColumn("verb", regexp_extract(col("text"), "^([A-Za-z]+)", 1))
        .withColumn("dur", nullif(regexp_extract(col("text"), "dur=(\\d+)ms", 1), lit("")).cast("long"))
        .filter(col("verb") =!= "x").count())
    val e = Enrich.enrich(p)
    timed("enrich", cpus)(e.filter(col("tool_family") =!= "zzz").count())
    val r = Route.routed(e)
    timed("routed", cpus)(r.count())
    timed("sinkCounts", cpus)(Route.sinkCounts(r, graft.Queries.demoRules).count())
    timed("sinkCounts-no-parse", cpus)(
      Route.sinkCounts(Route.routed(Enrich.enrich(t)), graft.Queries.demoRules).count())
  }

  def main(args: Array[String]): Unit = {
    Seq(8, 32).foreach { cpus =>
      val s = session(cpus)
      stages(s, cpus) // warm
      stages(s, cpus)
      s.stop()
    }
  }
}
