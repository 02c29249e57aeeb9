package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver smoke contract: entry returns rows > 0 on sf0.001. */
class EntrySpec extends AnyFunSuite {
  test("SparkEntry.entry yields rows on sf0.001") {
    val df = SparkEntry.entry(SparkTestSession.spark)
    assert(df.count() > 0)
  }
}
