package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal snapshot-table layer over Parquet: atomic snapshot commit,
  * monotonically increasing snapshot ids, read-at-snapshot.
  *
  * Stands in for an Iceberg table (no Iceberg runtime ships in this
  * environment — SURVEY.md environment facts): the semantics the engine
  * relies on are (a) a snapshot is an immutable list of data files,
  * (b) commits are atomic (tmp + rename on the same filesystem),
  * (c) readers can pin a snapshot id. The interface is deliberately thin so
  * `spark.read.format("iceberg").option("snapshot-id", …)` can be dropped
  * in behind [[TranscriptTable]] on a real cluster.
  *
  * Layout: `<root>/data/<uuid>-partNNN.parquet`,
  * `<root>/manifests/manifest-<id>.txt` (line 1 = snapshot id, then one
  * data-file path per line). All I/O goes through the Hadoop FileSystem
  * API, so the same code runs on HDFS/S3A (with the caveat that S3 rename
  * is copy-based; a real deployment would use a metastore commit).
  */
trait TranscriptTable {
  def currentSnapshotId: Option[Long]
  def filesAt(snapshotId: Long): Seq[String]
  def read(spark: SparkSession, snapshotId: Long): DataFrame
  def append(df: DataFrame): Long
}

final class SnapshotTable(spark: SparkSession, root: String) extends TranscriptTable {
  private val conf = spark.sparkContext.hadoopConfiguration
  private def fs(p: Path): FileSystem = p.getFileSystem(conf)

  private val rootPath = new Path(root)
  private val dataDir = new Path(rootPath, "data")
  private val manifestDir = new Path(rootPath, "manifests")

  override def currentSnapshotId: Option[Long] = {
    val f = fs(manifestDir)
    if (!f.exists(manifestDir)) None
    else {
      val ids = f.listStatus(manifestDir).map(_.getPath.getName)
        .collect { case n if n.startsWith("manifest-") && n.endsWith(".txt") =>
          n.stripPrefix("manifest-").stripSuffix(".txt").toLong }
      if (ids.isEmpty) None else Some(ids.max)
    }
  }

  private def manifestPath(id: Long): Path =
    new Path(manifestDir, f"manifest-$id%012d.txt")

  override def filesAt(snapshotId: Long): Seq[String] = {
    val p = manifestPath(snapshotId)
    val in = fs(p).open(p)
    try {
      val text = new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
      text.split("\n").toSeq.drop(1).filter(_.nonEmpty)
    } finally in.close()
  }

  override def read(spark: SparkSession, snapshotId: Long): DataFrame = {
    val files = filesAt(snapshotId)
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(files: _*)
  }

  /** Write `df` as new data files and atomically commit snapshot N+1 whose
    * manifest = previous files + new files.
    */
  override def append(df: DataFrame): Long = {
    val f = fs(rootPath)
    f.mkdirs(dataDir)
    f.mkdirs(manifestDir)
    val uuid = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(rootPath, s"_staging-$uuid")
    df.write.mode("overwrite").parquet(staging.toString)
    val newFiles = f.listStatus(staging)
      .filter(s => s.getPath.getName.endsWith(".parquet"))
      .map { s =>
        val dst = new Path(dataDir, s"$uuid-${s.getPath.getName}")
        require(f.rename(s.getPath, dst), s"rename failed: ${s.getPath}")
        dst.toString
      }.toSeq.sorted
    f.delete(staging, true)
    val prevId = currentSnapshotId
    val prevFiles = prevId.map(filesAt).getOrElse(Seq.empty)
    val newId = prevId.getOrElse(0L) + 1
    val body = (newId.toString +: (prevFiles ++ newFiles)).mkString("\n")
    val tmp = new Path(manifestDir, s"_tmp-$uuid")
    val out = f.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    require(f.rename(tmp, manifestPath(newId)), "manifest commit rename failed")
    newId
  }
}
