package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for a large-scale training-data pipeline:
  *
  *  - [[exact]]          — hash-groupBy exact dedup (one shuffle on the hash)
  *  - [[ngramJaccard]]   — all-pairs n-gram Jaccard via shingle inverted
  *                         index (exact, quadratic in bucket size — small
  *                         corpora / verification)
  *  - [[minhashLsh]]     — MinHash signatures + banded LSH bucket join +
  *                         exact Jaccard verification of candidates; the
  *                         100 TB path: cost ≈ shingling + k·S hashing +
  *                         one shuffle per band join, no all-pairs blowup
  *  - [[simhash]]        — 64-bit SimHash fingerprints + hamming-ball pairing
  *  - [[embeddingNearDup]] — cosine near-duplicates over an embedding column
  *
  * Hashing is pluggable: the engine path uses `xxhash64` (64-bit, codegen'd);
  * the oracle path uses sha256-prefix *strings* so DuckDB can reproduce the
  * exact signatures (both are deterministic; they yield the same verified
  * pairs because verification is exact Jaccard either way).
  */
object Dedup {

  /** Exact dedup on normalized text: keep the lowest id per content hash. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup returning the surviving rows (lowest id per content hash),
    * schema-preserving — the "apply" form of [[exact]].
    */
  def exactDeduped(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Distinct shingles per doc (n-gram sets for Jaccard). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("id"),
        array_distinct(TextAnalysis.shingles(col(textCol), n)).as("sh"))
      .filter(size(col("sh")) > 0)

  /** Exact all-pairs n-gram Jaccard ≥ threshold via a shingle inverted
    * index: explode → self-join on shingle → per-pair intersection counts →
    * |A∩B| / (|A|+|B|−|A∩B|). Pairs are (a < b).
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, n)
    val sizes = sets.select(col("id"), size(col("sh")).as("sz"))
    val inv = sets.select(col("id"), explode(col("sh")).as("s"))
    val pairs = inv.as("l").join(inv.as("r"),
        col("l.s") === col("r.s") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("a"), col("r.id").as("b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** MinHash signature as an array of k per-permutation minima.
    * `hashFn(shingle, perm)` must be deterministic and orderable.
    */
  def minhashSignature(sh: Column, k: Int, hashFn: (Column, Int) => Column): Column =
    array((0 until k).map(i => array_min(transform(sh, s => hashFn(s, i)))): _*)

  /** 64-bit engine hash: xxhash64 with the permutation index as seed salt. */
  def xxHash(s: Column, perm: Int): Column = xxhash64(lit(perm), s)

  /** Oracle-replicable hash: first 16 hex chars of sha256("<perm>|<shingle>"),
    * compared as strings (DuckDB computes the identical value).
    */
  def shaHash(s: Column, perm: Int): Column =
    substring(sha2(concat(lit(s"$perm|"), s), 256), 1, 16)

  /** MinHash + banded LSH near-dup detection.
    *
    * Signatures (k = bands·rowsPerBand) are banded; docs sharing any band
    * hash become candidates (equi-join on (band, hash) — Catalyst shuffle
    * hash join); candidates are verified with exact Jaccard. At 100 TB the
    * expensive all-pairs comparison never materializes: band buckets bound
    * the candidate set, AQE handles bucket skew, and verification joins
    * only candidate ids back to shingle sets.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 4, rowsPerBand: Int = 2,
      threshold: Double = 0.8,
      hashFn: (Column, Int) => Column = xxHash): DataFrame = {
    val k = bands * rowsPerBand
    val sets = shingleSets(df, idCol, textCol, n)
    val sig = sets.withColumn("sig", minhashSignature(col("sh"), k, hashFn))

    val bandRows = sig.select(col("id"), posexplode(
      array((0 until bands).map { b =>
        // band hash = joined slice of the signature (stable text form)
        sha2(concat_ws(",", (0 until rowsPerBand).map(r =>
          col("sig").getItem(b * rowsPerBand + r).cast("string")): _*), 256)
      }: _*)).as(Seq("band", "bhash")))

    val candidates = bandRows.as("l").join(bandRows.as("r"),
        col("l.band") === col("r.band") && col("l.bhash") === col("r.bhash") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"))
      .distinct()

    // exact-Jaccard verification of candidates only
    val withSets = candidates
      .join(sets.select(col("id").as("a"), col("sh").as("sha_")), "a")
      .join(sets.select(col("id").as("b"), col("sh").as("shb_")), "b")
    withSets
      .withColumn("inter", size(array_intersect(col("sha_"), col("shb_"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sha_")) + size(col("shb_")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  /** 64-bit SimHash fingerprint — native single-pass expression
    * ([[graft.functions.SimHash]], registered as `simhash64`).
    */
  def simhash(text: Column): Column = call_function("simhash64", text)

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs within a hamming radius, blocked by 16-bit
    * quarters (a pair within distance ≤3 shares at least one identical
    * quarter — pigeonhole), so the join is equi on (quarter idx, value).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "quarter blocking guarantees recall only for distance <= 3")
    val fp = df.select(col(idCol).as("id"), simhash(col(textCol)).as("fp"))
    val blocks = fp.select(col("id"), col("fp"), posexplode(array(
      (0 until 4).map(q => shiftright(col("fp"), q * 16).bitwiseAND(0xFFFFL)): _*))
      .as(Seq("q", "qv")))
    blocks.as("l").join(blocks.as("r"),
        col("l.q") === col("r.q") && col("l.qv") === col("r.qv") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("a"), col("r.id").as("b"),
        hamming(col("l.fp"), col("r.fp")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxHamming)
  }

  /** Cosine near-duplicates over an embedding column (exact, via the
    * Similarity kernels); see [[Similarity.bruteForceKnn]] for the ANN path.
    */
  def embeddingNearDup(df: DataFrame, idCol: String, embCol: String,
      minCosine: Double = 0.95): DataFrame = {
    val v = Similarity.toDoubleVec(col(embCol))
    val withNorm = df.select(col(idCol).as("id"), v.as("v"))
      .withColumn("norm", Similarity.l2norm(col("v")))
    withNorm.as("l").join(withNorm.as("r"), col("l.id") < col("r.id"))
      .withColumn("cosine",
        Similarity.dot(col("l.v"), col("r.v")) / (col("l.norm") * col("r.norm")))
      .filter(col("cosine") >= minCosine)
      .select(col("l.id").as("a"), col("r.id").as("b"), col("cosine"))
  }
}
