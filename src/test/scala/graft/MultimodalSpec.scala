package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "image", "a" * 100),
    (2L, "video", "b" * 2000)
  ).toDF("media_id", "media_type", "txt")
    .select(col("media_id"), col("media_type"), col("txt").cast("binary").as("payload"))

  test("decode: deterministic stub features through the typed mapPartitions boundary") {
    val out = Multimodal.decode(media)(spark).collect().map(f => f.media_id -> f).toMap
    assert(out(1L).n_bytes == 100 && out(1L).width == 164 && out(1L).n_frames == 1)
    assert(out(2L).n_bytes == 2000 && out(2L).n_frames == 2000 % 30 + 1)
    assert(out(1L).content_sha.length == 64)
  }

  test("resizeStub preserves small media, scales large to the bounding box") {
    implicit val s = spark
    val feats = Multimodal.decode(media)
    val resized = Multimodal.resizeStub(feats, maxDim = 100).collect().map(f => f.media_id -> f).toMap
    assert(resized(1L).width <= 164)        // 164x(64+700%768) scaled if over 100
    assert(math.max(resized(2L).width, resized(2L).height) <= 100)
  }

  test("frameSampleStub emits every stride-th frame for videos") {
    implicit val s = spark
    val frames = Multimodal.frameSampleStub(Multimodal.decode(media), stride = 10)
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == 1)                   // single image frame
    val expected = (2000 % 30 + 1 + 9) / 10 // ceil(n_frames / stride)
    assert(byId(2L) == expected)
  }
}
