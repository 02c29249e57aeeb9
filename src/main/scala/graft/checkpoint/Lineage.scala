package graft.checkpoint

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** One committed lineage entry: data file × sink, the engine's analogue of
  * freader's offsets row (internal/store/migrations/00001_create_table_offsets.sql;
  * API internal/store/sqlite_store.go:18-30). `content_hash` plays the
  * fingerprint role (internal/file_tracker/fingerprint.go:27-53): recomputed
  * at resume, a mismatch means the file changed under us and must be
  * reprocessed from scratch — the same reaction as the reference's
  * fingerprint-mismatch reopen (internal/tailer/tail_reader.go:95-106 →
  * collector.go:93-98 re-registration).
  */
final case class LineageEntry(
    runId: String,
    snapshotId: Long,
    file: String,
    sink: String,
    rowsDelivered: Long,
    contentHash: String,
    committedAtMs: Long)

/** Driver-committed lineage checkpoint store: one atomic text file per run
  * (tmp + rename), pipe-separated entries. Single-writer (the driver), so
  * no SQLite-style busy retry is needed; atomicity comes from the
  * filesystem rename, mirroring the WAL commit point.
  */
final class LineageStore(spark: SparkSession, root: String) {
  private val conf = spark.sparkContext.hadoopConfiguration
  private val rootPath = new Path(root)
  private def fs: FileSystem = rootPath.getFileSystem(conf)

  def readAll(): Seq[LineageEntry] = {
    if (!fs.exists(rootPath)) return Seq.empty
    fs.listStatus(rootPath).toSeq
      .filter(_.getPath.getName.startsWith("commit-"))
      .sortBy(_.getPath.getName)
      .flatMap { st =>
        val in = fs.open(st.getPath)
        val text =
          try new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
          finally in.close()
        text.split("\n").filter(_.nonEmpty).map { line =>
          val p = line.split("\\|", -1)
          LineageEntry(p(0), p(1).toLong, p(2), p(3), p(4).toLong, p(5), p(6).toLong)
        }
      }
  }

  /** Atomically commit one run's entries. */
  def commit(entries: Seq[LineageEntry]): Unit = {
    if (entries.isEmpty) return
    fs.mkdirs(rootPath)
    val runId = entries.head.runId
    val body = entries.map(e =>
      s"${e.runId}|${e.snapshotId}|${e.file}|${e.sink}|${e.rowsDelivered}|${e.contentHash}|${e.committedAtMs}")
      .mkString("\n")
    val tmp = new Path(rootPath, s"_tmp-$runId")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    require(fs.rename(tmp, new Path(rootPath, s"commit-$runId.txt")),
      "lineage commit rename failed")
  }

  /** Remove entries for files no longer present (J4 removal set-difference,
    * mirroring offset Delete on file removal — collector.go:206-214).
    * Rewrites the store compacted; returns removed entries.
    */
  def pruneTo(liveFiles: Set[String]): Seq[LineageEntry] = {
    val all = readAll()
    val (keep, drop) = all.partition(e => liveFiles.contains(e.file))
    if (drop.nonEmpty) {
      val old = fs.listStatus(rootPath).filter(_.getPath.getName.startsWith("commit-"))
      fs.mkdirs(rootPath)
      val tmp = new Path(rootPath, "_tmp-compact")
      val body = keep.map(e =>
        s"${e.runId}|${e.snapshotId}|${e.file}|${e.sink}|${e.rowsDelivered}|${e.contentHash}|${e.committedAtMs}")
        .mkString("\n")
      val out = fs.create(tmp, true)
      try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
      old.foreach(s => fs.delete(s.getPath, false))
      require(fs.rename(tmp, new Path(rootPath, "commit-00000000-compacted.txt")),
        "lineage compaction rename failed")
    }
    drop
  }
}

/** File fingerprinting for resume validation — the `checksum` strategy
  * (sha256 of the first N bytes, internal/file_tracker/fingerprint.go:27-53)
  * applied to immutable data files. Files shorter than N hash what exists
  * (data files, unlike live logs, cannot grow), but length is mixed in so
  * truncation is always detected.
  */
/** The reference's three fingerprint strategies as an ADT producing hash
  * Columns over row content (internal/watcher/watcher.go:15-18 enum;
  * strategies at internal/file_tracker/fingerprint.go and
  * file_id_linux.go:11-18):
  *
  *  - Checksum(n): sha256 of the first n characters; rows shorter than n
  *    yield null (the reference errors on too-small files,
  *    fingerprint.go:33-40)
  *  - ChecksumSeparator(sep, n): sha256 through the Nth separator occurrence
  *    inclusive; null when fewer than n separators exist
  *  - DeviceAndInode: identity from storage coordinates, not content — here
  *    the source file path (the batch analogue of dev:ino)
  */
sealed trait FingerprintStrategy {
  def column(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column
}
object FingerprintStrategy {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  final case class Checksum(n: Int) extends FingerprintStrategy {
    def column(content: Column): Column =
      when(length(content) >= n, sha2(substring(content, 1, n), 256))
  }
  final case class ChecksumSeparator(sep: String, n: Int) extends FingerprintStrategy {
    def column(content: Column): Column =
      when(size(split(content, java.util.regex.Pattern.quote(sep))) > n,
        sha2(concat(substring_index(content, sep, n), lit(sep)), 256))
  }
  case object DeviceAndInode extends FingerprintStrategy {
    def column(content: Column): Column = input_file_name()
  }
}

object Fingerprint {
  val DefaultPrefixBytes: Int = 64 * 1024

  def ofFile(spark: SparkSession, file: String, prefixBytes: Int = DefaultPrefixBytes): String = {
    val p = new Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val status = fs.getFileStatus(p)
    val n = math.min(prefixBytes.toLong, status.getLen).toInt
    val buf = new Array[Byte](n)
    val in = fs.open(p)
    try in.readFully(0L, buf, 0, n) finally in.close()
    val md = MessageDigest.getInstance("SHA-256")
    md.update(buf)
    md.update(status.getLen.toString.getBytes(StandardCharsets.UTF_8))
    md.digest().map("%02x".format(_)).mkString
  }
}
