package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Hashing

/** Pins the cross-engine hashing contract: the Column forms must equal the
  * JVM forms bit-for-bit (the DuckDB forms are pinned by the oracle gate —
  * tools/check_oracle.py — which recomputes the same recipes in SQL).
  */
class HashingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val samples = Seq("", "abc", "hello world", "a,0", "0,0",
    "the quick brown fox", "ünïcödé", "x" * 500)

  test("sha60 column equals sha60Jvm and stays within 60 bits") {
    val got = samples.toDF("s")
      .select($"s", Hashing.sha60($"s").as("h")).as[(String, Long)]
      .collect().toMap
    samples.foreach { s =>
      assert(got(s) == Hashing.sha60Jvm(s), s"sha60 mismatch for '$s'")
      assert(got(s) >= 0L && got(s) < (1L << 60))
    }
    // known value: sha256("abc") = ba7816bf8f01cfe... → 0xba7816bf8f01cfe
    assert(Hashing.sha60Jvm("abc") == java.lang.Long.parseLong("ba7816bf8f01cfe", 16))
  }

  test("mix column equals mixJvm and stays within [0, P)") {
    val perms = 0 until 8
    val exprs = perms.map(i => Hashing.mix(Hashing.sha60($"s"), i).as(s"m$i"))
    val rows = samples.toDF("s").select(($"s" +: exprs): _*).collect()
    rows.foreach { r =>
      val s = r.getString(0)
      val h = Hashing.sha60Jvm(s)
      perms.foreach { i =>
        val got = r.getLong(i + 1)
        assert(got == Hashing.mixJvm(h, i), s"mix($i) mismatch for '$s'")
        assert(got >= 0L && got < Hashing.P)
      }
    }
  }

  test("plane matrix components lie in [-1, 1) and are deterministic") {
    val m1 = graft.operators.Similarity.planeMatrix(6, 8)
    val m2 = graft.operators.Similarity.planeMatrix(6, 8)
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
    assert(m1.flatten.forall(x => x >= -1.0 && x < 1.0))
    // not degenerate: components differ across (plane, dim)
    assert(m1.flatten.distinct.length > 40)
  }
}
