package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Codec, Multimodal}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Codec: PNG encode -> decode round trip is exact (dims and two-tone means)") {
    val bytes = Codec.encodePng(10, 4, (200, 0, 50), (100, 255, 49))
    // a real PNG, not a stand-in: magic bytes present
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    val d = Codec.decodeImage(bytes).get
    assert(d.width == 10 && d.height == 4)
    assert(d.meanR == 150.0 && d.meanG == 127.5 && d.meanB == 49.5)
  }

  test("Codec: junk bytes decode to None; resize preserves aspect inside the box") {
    assert(Codec.decodeImage("not an image".getBytes).isEmpty)
    val big = Codec.encodePng(40, 20, (10, 10, 10), (10, 10, 10))
    val small = Codec.decodeImage(Codec.resizeToBox(big, 10)).get
    assert(small.width == 10 && small.height == 5)
    // already inside the box: bytes pass through untouched
    assert(Codec.resizeToBox(big, 100) eq big)
  }

  test("Codec: frame container counts and random-accesses without decoding") {
    val frames = (0 until 5).map(i => Codec.encodePng(8, 8, (i, i, i), (i, i, i)))
    val packed = Codec.packFrames(frames)
    assert(Codec.countFrames(packed) == 5)
    assert(java.util.Arrays.equals(Codec.frameAt(packed, 3), frames(3)))
    intercept[IllegalArgumentException](Codec.countFrames(packed.dropRight(1)))
  }

  test("synthesizeImages -> decodeImages recovers the planted parameters via the real codec") {
    implicit val s = spark
    val ids = Seq(0L, 7L, 123L, 255L).toDF("doc_id")
    val feats = Multimodal.decodeImages(Multimodal.synthesizeImages(ids, "doc_id"))
      .collect().map(f => f.media_id -> f).toMap
    for (id <- Seq(0L, 7L, 123L, 255L)) {
      val f = feats(id)
      assert(f.width == 8 + (id % 12) * 2 && f.height == 8 + id % 24)
      assert(f.mean_r == (id % 256 + id * 3 % 256) / 2.0)
      assert(f.mean_g == (id * 7 % 256 + id * 11 % 256) / 2.0)
      assert(f.mean_b == (id * 13 % 256 + id * 17 % 256) / 2.0)
      assert(f.content_sha.length == 64 && f.n_bytes > 0)
    }
  }

  test("decodeImages fails loudly on junk by default; drop mode skips the row") {
    implicit val s = spark
    val mixed = Seq(
      Multimodal.MediaRow(1L, Codec.encodePng(8, 8, (1, 2, 3), (4, 5, 6))),
      Multimodal.MediaRow(2L, "junk".getBytes)).toDS()
    val err = intercept[Exception] {
      Multimodal.decodeImages(mixed).collect()
    }
    assert(Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null).take(8)
      .exists(c => Option(c.getMessage).exists(_.contains("media_id 2"))))
    val kept = Multimodal.decodeImages(mixed, onUndecodable = "drop").collect()
    assert(kept.map(_.media_id).toSeq == Seq(1L))
  }

  test("resizeImages re-encodes oversized payloads to the bounding box") {
    implicit val s = spark
    val media = Seq(Multimodal.MediaRow(1L, Codec.encodePng(30, 12, (9, 9, 9), (9, 9, 9)))).toDS()
    val out = Multimodal.decodeImages(Multimodal.resizeImages(media, maxDim = 15))
      .collect().head
    assert(out.width == 15 && out.height == 6)
  }

  test("Codec WAV round trip: rate, count, and exact square-wave RMS survive encode/decode") {
    val samples = Array.tabulate(1200)(i => (if ((i / 3) % 2 == 0) 2500 else -2500).toShort)
    val bytes = Codec.encodeWav(8000, samples)
    val d = Codec.decodeWav(bytes).get
    assert(d.sampleRate == 8000 && d.nSamples == 1200L)
    assert(d.rms == 2500.0) // every sample is ±A: RMS is exactly A
    // non-square content: RMS strictly between 0 and the peak
    val ramp = Codec.decodeWav(Codec.encodeWav(8000,
      Array.tabulate(100)(i => (i * 10).toShort))).get
    assert(ramp.rms > 0.0 && ramp.rms < 990.0)
    assert(Codec.decodeWav(Array[Byte](1, 2, 3, 4)).isEmpty) // junk is None, not a throw
  }

  test("synthesizeAudio -> decodeAudio recovers planted parameters; junk errors or drops") {
    implicit val s = spark
    val ids = Seq(0L, 3L, 11L, 23L).toDF("doc_id")
    val feats = Multimodal.decodeAudio(Multimodal.synthesizeAudio(ids, "doc_id"))
      .collect().map(f => f.media_id -> f).toMap
    for (id <- Seq(0L, 3L, 11L, 23L)) {
      val (amp, n) = (1000 + (id % 7) * 500, 800 + (id % 5) * 400)
      val f = feats(id)
      assert(f.sample_rate == 8000L && f.n_samples == n.toLong)
      assert(f.rms == amp.toDouble)
      assert(f.duration_s == n.toDouble / 8000)
    }
    val junk = Seq(Multimodal.MediaRow(9L, Array[Byte](0, 1, 2))).toDS()
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudio(junk).collect()
    }
    assert(Multimodal.decodeAudio(junk, onUndecodable = "drop").isEmpty)
  }

  test("sampleFrames decodes only sampled frames with planted tones") {
    implicit val s = spark
    val ids = Seq(25L).toDF("doc_id") // 25 % 30 + 1 = 26 frames
    val rows = Multimodal.sampleFrames(Multimodal.synthesizeVideos(ids, "doc_id"), stride = 10)
      .collect().sortBy(_.frame_idx)
    assert(rows.map(_.frame_idx).toSeq == Seq(0L, 10L, 20L))
    assert(rows.forall(r => r.n_frames == 26 && r.width == 8 && r.height == 8))
    assert(rows.map(_.mean_r).toSeq == Seq(25.0, 35.0, 45.0)) // (id + f) % 256
  }
}
