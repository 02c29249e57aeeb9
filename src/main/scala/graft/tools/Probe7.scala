package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Enrich, Route}

/** Interleaved A/B: regex-based parse vs native parse_turn, same session. */
object Probe7 {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("16").toInt
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.KvParse.register(s)
    graft.functions.ParseTurn.register(s)

    def turns = s.read.parquet("/tmp/graft-bench-turns")

    def oldParse(df: DataFrame): DataFrame = {
      val text = col("text")
      val isCall = text.startsWith("CALL ")
      df.withColumn("verb", regexp_extract(text, "^([A-Za-z]+)", 1))
        .withColumn("tool_x", when(isCall, regexp_extract(text, "tool=([A-Za-z0-9_]+)", 1)).otherwise(lit("")))
        .withColumn("dur_ms", when(isCall, nullif(regexp_extract(text, "dur=(\\d+)ms", 1), lit("")).cast("long")))
        .withColumn("status", when(isCall, nullif(regexp_extract(text, "status=(\\w+)", 1), lit(""))))
        .withColumn("kv", when(isCall, call_function("kv_parse", text)).otherwise(typedLit(Map.empty[String, String])))
    }
    def newParse(df: DataFrame): DataFrame = {
      val p = call_function("parse_turn", col("text"))
      df.withColumn("verb", p.getField("verb"))
        .withColumn("tool_x", p.getField("tool"))
        .withColumn("dur_ms", p.getField("dur_ms"))
        .withColumn("status", p.getField("status"))
        .withColumn("kv", p.getField("kv"))
    }
    def run(parse: DataFrame => DataFrame): Unit =
      Route.sinkCounts(Route.routed(Enrich.enrich(parse(turns))), graft.Queries.demoRules).collect()

    run(oldParse); run(newParse) // warm both
    val (ta, tb) = (collection.mutable.ArrayBuffer[Double](), collection.mutable.ArrayBuffer[Double]())
    (1 to 5).foreach { i =>
      val t0 = System.nanoTime(); run(oldParse); val a = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); run(newParse); val b = (System.nanoTime() - t1) / 1e9
      ta += a; tb += b
      println(f"[probe7] iter=$i old=$a%.2f new=$b%.2f")
    }
    println(f"[probe7] cores=$cpus OLD_min=${ta.min}%.2f NEW_min=${tb.min}%.2f")
    s.stop()
  }
}
