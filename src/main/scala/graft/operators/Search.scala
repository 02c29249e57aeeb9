package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lexical retrieval over the corpus — the search face of the engine,
  * next to the embedding ANN family ([[Similarity]]): BM25 (Robertson &
  * Zaragoza 2009, the Lucene-default scoring function) as one declarative
  * plan.
  *
  * Cross-engine exactness discipline: every floating-point step is written
  * in the SAME operation order on both engines (left-associative, shared
  * literals via shortest-roundtrip rendering), the only data-dependent
  * float SUM is the per-document fold over at most |terms| term scores in
  * alphabetical term order (a deterministic ordered fold, never a
  * partition-order-dependent aggregate), and `ln` agrees between Spark
  * and DuckDB (precedent: the HLL estimator oracle). Integer-valued
  * doubles (tf, df, dl, N) are exact below 2^53.
  *
  * Scale shape: the token pass filters to the query terms BEFORE its
  * count aggregates (map-side combined, ≤ |docs|·|terms| rows); df and
  * the corpus stats are broadcast-sized; the final ranking is a top-K
  * (TakeOrderedAndProject), never a global sort.
  */
object Search {

  /** Top-K documents by BM25 over whitespace tokens. Returns
    * (doc_id, score) with the r6-rounded score; ranking uses the RAW
    * double (identical bits on both engines) with doc_id tie-break.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, topK: Int = 10): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val tok = docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(col("text"))).as("word"))
      .filter(col("word").isin(terms: _*))
    val tf = tok.groupBy("doc_id", "word")
      .agg(count(lit(1)).cast("double").as("tf"))
    val dft = tok.groupBy("word")
      .agg(countDistinct("doc_id").cast("double").as("df"))
    val dl = docs.select(col("doc_id"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    tf.join(broadcast(dft), "word")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("tscore",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
          * ((col("tf") * lit(k1 + 1)) /
            (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl")))))
      .select(col("doc_id"), struct(col("word"), col("tscore")).as("ts"))
      .groupBy("doc_id").agg(sort_array(collect_list("ts")).as("tss"))
      .select(col("doc_id"),
        aggregate(transform(col("tss"), t => t.getField("tscore")),
          lit(0.0), (a, x) => a + x).as("score_raw"))
      .orderBy(col("score_raw").desc, col("doc_id")).limit(topK)
      .select(col("doc_id"), TextAnalysis.r6(col("score_raw")).as("score"))
  }
}
