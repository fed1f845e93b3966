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

  test("sampleFrames: every stride-th frame, distinct per-frame hashes, one-to-many") {
    val content = ("x" * 1200).getBytes("UTF-8") // 1200/256+1 = 5 frames
    val ds = spark.createDataset(Seq(MediaRecord(7L, "video", content, "s")))
    val out = Media.sampleFrames(ds, FakeCodec, stride = 2).collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq == Seq(0L, 2L, 4L), "frames 0,2,4 of 5")
    assert(out.map(_.frame_hash).distinct.length == 3, "frame hashes differ per index")
    assert(out.forall(_.media_id == 7L))
    // fingerprint matches the documented md5(content ++ \":idx\") contract
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(content ++ ":2".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(out(1).frame_hash == expected)
  }
}
