package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing kernel.
  *
  * Every approximate operator (MinHash, SimHash, hyperplane LSH) needs
  * pseudo-randomness that BOTH engines of the correctness gate can compute
  * bit-identically: Spark for the query side, DuckDB for the oracle side.
  * `xxhash64` is Spark-only; sha256 exists in both, so all randomness here
  * derives from sha256:
  *
  *  - [[sha60]]: first 15 hex chars of sha256, parsed as an integer — a
  *    uniform non-negative 60-bit value. 15 chars keeps it < 2^60, so the
  *    parse is exact in a signed 64-bit int in ANSI Spark, DuckDB
  *    (`('0x' || hex)::BIGINT`) and the JVM alike.
  *  - [[mix]]: the affine universal-hash family h_i(x) = (a_i·x + b_i) mod P
  *    over the Mersenne prime P = 2^31−1, with (a_i, b_i) themselves derived
  *    from sha256 of `"a:<i>"` / `"b:<i>"`. One sha256 per input string,
  *    then each "permutation" costs two integer ops — this replaces round
  *    1's one-sha-per-(input × permutation) scheme, whose hashing dominated
  *    the benchmark (q_dedup_minhash was 193 s of the 280 s total). All
  *    operands stay < 2^62, so neither ANSI Spark nor DuckDB overflows.
  *
  * Each primitive ships in three forms: a Column (engine), a SQL-string
  * builder (oracle — constants are re-derived IN SQL from the same sha256
  * recipe, so nothing injected can drift), and a JVM function (driver-side
  * precomputation such as LSH plane matrices).
  *
  * Reference hashing being replaced: the file fingerprints of
  * internal/file_tracker/fingerprint.go:27-53 are also sha256-based, so
  * sha256-derived randomness is the reference-faithful choice too.
  */
object Hashing {

  /** Mersenne prime 2^31 − 1: modulus of the mixing family. */
  final val P = 2147483647L

  // ------------------------------------------------------------ sha60

  /** 60-bit non-negative hash of a string column. */
  def sha60(c: Column): Column =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast("long")

  /** DuckDB rendering of [[sha60]] over a SQL expression. */
  def sha60Sql(expr: String): String =
    s"('0x' || substr(sha256($expr), 1, 15))::BIGINT"

  private val mdTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-256"))

  /** JVM twin of [[sha60]] (driver-side precomputation, native exprs).
    * The first 15 hex chars of the digest are exactly the top 60 bits of
    * its first 8 bytes, so the value assembles with shifts — no hex string
    * (this sits on the per-token hot path of [[ShingleHashesHelper]]; the
    * format-and-parse version measured 2.4× slower end-to-end).
    */
  def sha60Jvm(s: String): Long = {
    val md = mdTL.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  /** Hyperplane component (plane p, dim i) in [-1, 1): sha60("p,i")
    * mod 1000003, affinely mapped. The single source of LSH plane
    * randomness — the Column form, the native [[PlaneSketchHelper]] and
    * the DuckDB oracle all derive the identical matrix from it.
    */
  def planeComponent(p: Int, i: Int): Double =
    (sha60Jvm(s"$p,$i") % 1000003L).toDouble / 500001.5 - 1.0

  // ------------------------------------------------------------ affine mixing family

  /** Multiplier of permutation i — non-zero mod P. */
  def mixA(i: Int): Long = sha60Jvm(s"a:$i") % (P - 1) + 1

  /** Offset of permutation i. */
  def mixB(i: Int): Long = sha60Jvm(s"b:$i") % P

  /** h_i(x) for a non-negative column x. */
  def mix(h: Column, i: Int): Column =
    (lit(mixA(i)) * (h % P) + lit(mixB(i))) % P

  /** JVM twin of [[mix]]. */
  def mixJvm(h: Long, i: Int): Long = (mixA(i) * (h % P) + mixB(i)) % P

  /** DuckDB rendering of [[mix]]; `iExpr` is any integer SQL expression. */
  def mixSql(hExpr: String, iExpr: String): String = {
    val a = s"((${sha60Sql(s"'a:' || ($iExpr)::VARCHAR")}) % ${P - 1} + 1)"
    val b = s"((${sha60Sql(s"'b:' || ($iExpr)::VARCHAR")}) % $P)"
    s"(($a * (($hExpr) % $P) + $b) % $P)"
  }
}
