package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway stage-timing scratchpad for the optimization round — not part
  * of any deliverable path. Dissects q_curate_full stage by stage.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val s = Probe.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.operators.{Dedup, TextAnalysis}
    def timed[T](name: String)(f: => T): T = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name min=${runs.min}%.2f all=${runs.map(t => f"$t%.2f").mkString(",")}")
      null.asInstanceOf[T]
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val d = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val copies = d.filter(col("doc_id") < 30)
      .select((col("doc_id") + 200000).as("doc_id"), col("text"))
    val nearDups = d.filter(col("doc_id") < 100 &&
        size(split(lower(trim(col("text"))), "\\s+")) >= 12)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" tail tail")).as("text"))
    val line = concat(lit("the a of and to in is that it u"), col("doc_id").cast("string"))
    val repeaty = d.filter(col("doc_id") >= 30 && col("doc_id") < 40)
      .select((col("doc_id") + 300000).as("doc_id"),
        trim(repeat(concat(line, lit(" ")), 4)).as("text"))
    val corpus = d.unionByName(copies).unionByName(nearDups).unionByName(repeaty)

    timed("corpus scan")(noop(corpus))
    val uniq0 = Dedup.exactDeduped(corpus, "doc_id", "text")
    timed("exactDeduped (uncached)")(noop(uniq0))
    val uniq = uniq0.cache()
    uniq.count()
    val pairs = Dedup.minhashLsh(uniq, "doc_id", "text",
      n = 3, bands = 4, rowsPerBand = 2, threshold = 0.6)
    timed("minhashLsh(uniq)")(noop(pairs))
    val keep = uniq.join(pairs.select(col("b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    timed("keep (anti)")(noop(keep))
    val rep = TextAnalysis.repetition(keep, "doc_id", "text")
    timed("repetition(keep)")(noop(rep))
    timed("quality+langId(keep)")(noop(
      TextAnalysis.quality(keep).withColumn("pred_lang", TextAnalysis.langId(col("text")))))
    timed("full query")(noop(graft.SparkEntry.queries("q_curate_full")(s, dir)))
    timed("full prep_pipeline")(noop(graft.SparkEntry.queries("q_prep_pipeline")(s, dir)))
    s.stop()
  }
}
