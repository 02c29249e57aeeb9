package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - [[bruteForceKnn]] — exact cosine top-k: broadcast the (small) query
  *    set, one pass over the corpus, per-query top-k via window. The
  *    correctness baseline.
  *  - [[lshKnn]] — random-hyperplane LSH bucketing: sign-bit sketches from
  *    deterministic pseudo-random hyperplanes, candidates = bucket
  *    collisions (multi-probe over b bands), exact rerank of candidates.
  *    The scale path: corpus is bucketed once (shuffle on bucket key), each
  *    query probes its buckets instead of scanning 10^12 rows.
  *
  * All arithmetic is promoted to double before any accumulation so results
  * are reproducible across engines and partitionings (the fold order inside
  * one row's array is fixed).
  */
object Similarity {

  /** Cast float vector to double to make downstream folds deterministic. */
  def toDoubleVec(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Exact top-k neighbors for each query row (queries ≪ corpus: broadcast).
    * Output: (query_id, neighbor_id, cosine, rank). Self-pairs excluded.
    */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      toDoubleVec(col(embCol)).as("cv"))
      .withColumn("cnorm", l2norm(col("cv")))
    val q = queries.select(col(idCol).as("query_id"),
      toDoubleVec(col(embCol)).as("qv"))
      .withColumn("qnorm", l2norm(col("qv")))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", TextAnalysis.r6(
        cosine(col("qv"), col("cv"), col("qnorm"), col("cnorm"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a fixed hash mapped to [-1, 1). No RNG state — reproducible anywhere.
    */
  private def planeComponent(p: Column, i: Column): Column =
    (pmod(xxhash64(p, i), lit(1000003L)).cast("double") / 500001.5) - 1.0

  /** Projection of `v` onto pseudo-random hyperplane `p`. */
  private def projection(v: Column, p: Column): Column =
    aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => x * planeComponent(p, i)),
      lit(0.0), (a, x) => a + x)

  /** Sign-bit sketch of band `b`: `planesPerBand` bits packed into a long
    * (acc*2+bit — no shifts, stays pure-expression).
    */
  def bandSketch(v: Column, b: Int, planesPerBand: Int): Column =
    aggregate(
      sequence(lit(b * planesPerBand), lit((b + 1) * planesPerBand - 1)),
      lit(0L),
      (acc, p) => acc * 2 + when(projection(v, p) >= 0, 1L).otherwise(0L))

  /** IVF-bucketed ANN: deterministic coarse quantizer (the first
    * `nCentroids` corpus rows by id — reproducible, no RNG) assigns every
    * corpus row to its nearest centroid (1 probe) and every query to its
    * `nProbe` nearest; candidates are the bucket joins, exactly reranked.
    * The 10^12-row shape: centroids broadcast, corpus bucketed once
    * (shuffle on cid), each query touches nProbe/nCentroids of the corpus.
    */
  def ivfKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("cid"), toDoubleVec(col(embCol)).as("centv"))
      .withColumn("centnorm", l2norm(col("centv")))

    def assigned(df: DataFrame, id: String, probes: Int): DataFrame = {
      val base = df.select(col(idCol).as(id), toDoubleVec(col(embCol)).as(s"${id}_v"))
        .withColumn(s"${id}_norm", l2norm(col(s"${id}_v")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(id).orderBy(col("csim").desc, col("cid"))
      base.crossJoin(broadcast(cents))
        .withColumn("csim",
          cosine(col(s"${id}_v"), col("centv"), col(s"${id}_norm"), col("centnorm")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= probes)
        .drop("centv", "centnorm", "csim", "crank")
    }

    val cb = assigned(corpus, "neighbor_id", probes = 1)
    val qb = assigned(queries, "query_id", probes = nProbe)
    val scored = qb.join(cb, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", TextAnalysis.r6(
        cosine(col("query_id_v"), col("neighbor_id_v"),
          col("query_id_norm"), col("neighbor_id_norm"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** LSH-bucketed ANN: `bands` independent sketches of `planesPerBand` bits
    * each; query and corpus rows sharing any (band, sketch) bucket become
    * candidates; candidates are exactly reranked. Recall grows with bands;
    * cost is bands shuffled equi-joins instead of a cross join.
    */
  def lshKnn(corpus: DataFrame, queries: DataFrame, idCol: String,
      embCol: String, k: Int, bands: Int = 8, planesPerBand: Int = 12): DataFrame = {
    def withBuckets(df: DataFrame, id: String): DataFrame = {
      val v = toDoubleVec(col(embCol))
      df.select(col(idCol).as(id), v.as(s"${id}_v"))
        .withColumn(s"${id}_norm", l2norm(col(s"${id}_v")))
        .select(col(id), col(s"${id}_v"), col(s"${id}_norm"),
          posexplode(array((0 until bands).map { b =>
            bandSketch(col(s"${id}_v"), b, planesPerBand)
          }: _*)).as(Seq("band", "sk")))
    }
    val cb = withBuckets(corpus, "neighbor_id")
    val qb = withBuckets(queries, "query_id")
    val cand = cb.join(qb, Seq("band", "sk"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "neighbor_id", "query_id_v", "query_id_norm",
        "neighbor_id_v", "neighbor_id_norm")
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand.withColumn("cosine", TextAnalysis.r6(
      cosine(col("query_id_v"), col("neighbor_id_v"),
        col("query_id_norm"), col("neighbor_id_norm"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
