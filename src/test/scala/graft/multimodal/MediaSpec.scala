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

  test("fingerprintFrames hash frame bytes: shared prefixes share fingerprints") {
    val base = ("b" * 200).getBytes("UTF-8")
    val extended = ("b" * 200 + "tail-unique-content").getBytes("UTF-8")
    val other = ("z" * 200).getBytes("UTF-8")
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, "video", base, "s"),
      MediaRecord(2L, "video", extended, "s"),
      MediaRecord(3L, "video", other, "s")))
    val fr = Media.fingerprintFrames(ds, FakeCodec, frameSize = 64).collect()
    // ceil(200/64)=4, ceil(219/64)=4, ceil(200/64)=4
    assert(fr.count(_.media_id == 1L) == 4)
    val h = fr.groupBy(_.media_id).view.mapValues(_.map(f => f.frame_idx -> f.frame_hash).toMap)
    // full 64-byte frames of the shared prefix agree; the sliced tail differs
    (0L to 2L).foreach(i => assert(h(1L)(i) == h(2L)(i), s"shared frame $i"))
    assert(h(1L)(3L) != h(2L)(3L), "diverging tail frame")
    assert((0L to 3L).forall(i => h(1L)(i) != h(3L)(i)), "unrelated media share nothing")
  }

  test("nearDupPairs: Jaccard over distinct fingerprints, threshold filters") {
    val a = ("a" * 256).getBytes("UTF-8") // 4 frames, all identical bytes
    val b = ("a" * 256 + "x" * 64).getBytes("UTF-8") // base + 1 distinct frame
    val c = ("c" * 256).getBytes("UTF-8")
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, "v", a, "s"), MediaRecord(2L, "v", b, "s"),
      MediaRecord(3L, "v", c, "s")))
    val frames = Media.fingerprintFrames(ds, FakeCodec, frameSize = 64)
    val pairs = Media.nearDupPairs(frames, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // media 1: 4 identical 'a'-frames -> ONE distinct fingerprint;
    // media 2 adds one 'x'-frame -> {a, x}; shared = {a}; J = 1/2
    assert(pairs.toSeq == Seq((1L, 2L, 1L, 1L, 2L, 0.5)))
    // below threshold or disjoint pairs never surface
    assert(Media.nearDupPairs(frames, threshold = 0.6).count() == 0)
  }
}
