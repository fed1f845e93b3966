package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MediaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mime sniffing reads real magic bytes") {
    assert(FakeCodec.sniffMime(Array(0x89.toByte, 'P', 'N', 'G', 13, 10)) == "image/png")
    assert(FakeCodec.sniffMime(Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte))
      == "image/jpeg")
    assert(FakeCodec.sniffMime("RIFF1234WAVE".getBytes("US-ASCII")) == "audio/wav")
    assert(FakeCodec.sniffMime("plain words".getBytes("UTF-8")) == "text/plain")
    assert(FakeCodec.sniffMime(Array[Byte](0, 1, 2)) == "application/octet-stream")
    assert(FakeCodec.sniffMime(Array.empty[Byte]) == "application/octet-stream")
  }

  test("features: batching preserves every record exactly once; hash matches md5") {
    val records = (1L to 200L).map(i =>
      MediaRecord(i, "text", s"content number $i".getBytes("UTF-8"), s"src$i"))
    val ds = spark.createDataset(records)
    val out = Media.features(ds, FakeCodec, batchSize = 7).collect().sortBy(_.media_id)
    assert(out.length == 200)
    assert(out.map(_.media_id).toSeq == (1L to 200L))
    val expectedHash = java.security.MessageDigest.getInstance("MD5")
      .digest("content number 1".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(out.head.content_hash == expectedHash)
    assert(out.head.mime == "text/plain")
    assert(out.forall(f => f.frames == f.byte_len / 256 + 1))
  }
}
