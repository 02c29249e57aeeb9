package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Transcripts

/** Single-session synth scaling: pass cores as arg, fresh JVM per run. */
object Probe5 {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8").toInt
    val turns = 10000000L
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val t = Transcripts.synthesize(s, turns / 50, 50,
      numPartitions = cpus * 2).toDF()
    (1 to 5).foreach { i =>
      val t0 = System.nanoTime()
      t.select(sum(length(col("text")))).head()
      println(f"[probe5] cores=$cpus iter=$i sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    s.stop()
  }
}
