package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Enrich, Parse, Route}

/** Plan-quality audit: prints formatted plans for the load-bearing queries
  * so pushdown / pruning / broadcast / codegen spans can be inspected.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.KvParse.register(spark)
    graft.functions.ParseTurn.register(spark)
    val dir = "/root/testdata/sf0.01"

    println("==== e2e pipeline (parse->enrich->route->sinkCounts) ====")
    Route.sinkCounts(Route.routed(Enrich.enrich(Parse.parseTurns(
      graft.sources.Transcripts.fromEvents(spark, dir)))), graft.Queries.demoRules)
      .explain("formatted")

    println("==== projection pushdown: 2 columns of events ====")
    spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_type") === "error")
      .select("event_id", "ts").explain("formatted")

    println("==== enrich join strategy ====")
    Enrich.enrich(graft.sources.Transcripts.fromEvents(spark, dir)).explain("formatted")

    println("==== knn brute (broadcast expected) ====")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    graft.operators.Similarity.bruteForceKnn(e, e.filter(col("vec_id") < 3),
      "vec_id", "embedding", 5).explain("formatted")

    println("==== knn ivf (pure-projection centroid assignment: no Exchange before the cid join) ====")
    graft.operators.Similarity.ivfKnn(e, e.filter(col("vec_id") < 3),
      "vec_id", "embedding", 5, nCentroids = 8, nProbe = 4).explain("formatted")

    println("==== embedding near-dup (band-blocked: no BroadcastNestedLoopJoin/Cartesian) ====")
    graft.operators.Dedup.embeddingNearDup(e, "vec_id", "embedding", 0.9)
      .explain("formatted")

    println("==== minhash LSH (hashed shingles; equi band join, no cartesian) ====")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    graft.operators.Dedup.minhashLsh(docs, "doc_id", "text", 3, 4, 2, 0.6)
      .explain("formatted")

    println("==== decontaminate shape (broadcast semi-join on 8-byte shingle hashes) ====")
    graft.Queries.queries("q_decontaminate")(spark, dir).explain("formatted")

    println("==== pii scrub + chunk windows (pure expressions: zero Exchange expected) ====")
    graft.Queries.queries("q_pii_scrub")(spark, dir).explain("formatted")
    graft.Queries.queries("q_chunk_windows")(spark, dir).explain("formatted")

    println("==== repetition (ids-only aggregate exchanges; line stats stay pure) ====")
    graft.Queries.queries("q_repetition")(spark, dir).explain("formatted")

    println("==== vocab top-k (TakeOrderedAndProject, no global sort shuffle) ====")
    graft.Queries.queries("q_vocab_topk")(spark, dir).explain("formatted")

    println("==== stratified sample (WindowGroupLimit pushdown both sides of the exchange) ====")
    graft.Queries.queries("q_stratified_sample")(spark, dir).explain("formatted")

    println("==== sequence packing (one window per shard, no global sort) ====")
    graft.Queries.queries("q_pack_sequences")(spark, dir).explain("formatted")

    println("==== tf-idf top terms (broadcast df dimension + WindowGroupLimit top-3) ====")
    graft.Queries.queries("q_tfidf_topterms")(spark, dir).explain("formatted")

    println("==== embedding outlier (pure-projection scoring; one window exchange) ====")
    graft.Queries.queries("q_emb_outlier")(spark, dir).explain("formatted")

    println("==== bloom decontamination (constant-sketch pre-filter + exact semi-join) ====")
    graft.Queries.queries("q_decontaminate_bloom")(spark, dir).explain("formatted")

    println("==== capstone curation pipeline (six stages, one plan) ====")
    graft.Queries.queries("q_curate_full")(spark, dir).explain("formatted")

    println("==== quantile sketch (sample predicate in scan; window over the value histogram, never the sample) ====")
    graft.Queries.queries("q_quantile_sketch")(spark, dir).explain("formatted")

    println("==== as-of join (ONE exchange, no Join node — union + running last over the keyed timeline) ====")
    graft.Queries.queries("q_asof_attribution")(spark, dir).explain("formatted")

    println("==== cross-doc dup spans (inverted index over longs; no cartesian) ====")
    graft.Queries.queries("q_dup_spans")(spark, dir).explain("formatted")

    println("==== epoch-upsampled source mixing (broadcast rate dim; zero shuffle, explode after join) ====")
    graft.Queries.queries("q_mix_epochs")(spark, dir).explain("formatted")

    println("==== grouped quantiles (per-group windows; no single-partition stage) ====")
    graft.Queries.queries("q_group_quantiles")(spark, dir).explain("formatted")

    println("==== canonical dedup pick (ids-only labels + per-cluster argmax window) ====")
    graft.Queries.queries("q_dedup_canonical")(spark, dir).explain("formatted")

    println("==== incremental exact dedup batch-B plan (hash anti-join vs store, no BNLJ) ====")
    locally {
      val store = java.nio.file.Files.createTempDirectory("graft-plans-inc").toString
      val d = docs.select(col("doc_id"), col("text"))
      graft.operators.Dedup.incrementalExactStaged(
        d.filter(col("doc_id") % 2 === 0), "doc_id", "text", store).commit()
      graft.operators.Dedup
        .incrementalExactStaged(d.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", store)
        .fresh.explain("formatted")
    }

    println("==== incremental minhash batch-B plan (exact pre-filter + band equi-joins) ====")
    locally {
      val store = java.nio.file.Files.createTempDirectory("graft-plans-incmh").toString
      val d = docs.select(col("doc_id"), col("text")).filter(col("doc_id") < 400)
      graft.operators.Dedup.incrementalMinhashStaged(
        d.filter(col("doc_id") % 2 === 0), "doc_id", "text", store,
        n = 3, bands = 4, rowsPerBand = 2, threshold = 0.6).commit()
      graft.operators.Dedup
        .incrementalMinhashStaged(d.filter(col("doc_id") % 2 === 1),
          "doc_id", "text", store, n = 3, bands = 4, rowsPerBand = 2,
          threshold = 0.6)
        .fresh.explain("formatted")
    }

    spark.stop()
  }
}
