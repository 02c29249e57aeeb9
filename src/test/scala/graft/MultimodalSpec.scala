package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").cache()
  private lazy val media = Multimodal.mediaFromDocuments(docs).cache()

  test("media schema: binary payload + typed metadata") {
    assert(media.schema("blob").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    assert(media.count() == docs.count())
  }

  test("batched decode is deterministic and batch-size independent") {
    val a = Multimodal.decodeBatched(media, batchSize = 7)
      .drop("features").as[(Long, String, Int, Int, Int, Int)].collect().sortBy(_._1).toSeq
    val b = Multimodal.decodeBatched(media.repartition(9), batchSize = 64)
      .drop("features").as[(Long, String, Int, Int, Int, Int)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(a.size == media.count())
    assert(a.forall { case (_, _, len, w, h, c) => len > 0 && w >= 1 && h >= 1 && c == 3 })
  }

  test("decode features have fixed shape and [0,1] range") {
    val feats = Multimodal.decodeBatched(media).select("features")
      .as[Array[Float]].collect()
    assert(feats.forall(_.length == 8))
    assert(feats.forall(_.forall(f => f >= 0f && f <= 1f)))
  }

  test("frame sampling preserves lineage and bounds") {
    val frames = Multimodal.sampleFrames(media, frames = 4)
      .as[(Long, Int, Array[Byte], Int)].collect()
    assert(frames.nonEmpty)
    assert(frames.forall { case (_, idx, frame, len) =>
      idx >= 0 && idx < 4 && frame.length == len && len <= 16 })
    val perDoc = frames.groupBy(_._1)
    assert(perDoc.values.forall(_.map(_._2).distinct.length <= 4))
  }

  test("binaryFeatures sha matches text sha (blob is the utf-8 payload)") {
    val row = Multimodal.binaryFeatures(media).orderBy("media_id").limit(1)
      .as[(Long, Int, String, String)].head()
    val text = docs.orderBy("doc_id").limit(1).select("text").as[String].head()
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expected = md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row._3 == expected)
    assert(row._2 == text.getBytes("UTF-8").length)
  }
}
