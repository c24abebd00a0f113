package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (1L, Array.fill[Byte](1000)(7)),
    (2L, Array.fill[Byte](100)(3)),
    (3L, Array[Byte](1)) // tiny: still one frame
  ).toDF("media_id", "content")

  test("decode attaches deterministic metadata in batches") {
    val d = Multimodal.decode(media, batchSize = 2).collect()
      .map(m => m.media_id -> m.meta).toMap
    assert(d(1L).n_bytes == 1000 && d(1L).width == (1000 % 640) + 1)
    assert(d(1L).height == ((1000 * 7) % 480) + 1 && d(1L).channels == 3)
    assert(d(3L).n_bytes == 1)
  }

  test("resize rewrites content to the target byte budget and metadata") {
    val r = Multimodal.resize(Multimodal.decode(media), 8, 4).collect()
    r.foreach { m =>
      assert(m.meta.width == 8 && m.meta.height == 4)
      assert(m.content.length == 8 * 4 * 3)
    }
  }

  test("frameSample explodes every nth frame, at least one per item") {
    val f = Multimodal.frameSample(Multimodal.decode(media), everyN = 2)
      .groupBy("media_id").count().as[(Long, Long)].collect().toMap
    assert(f(1L) == 2) // 1000/256 = 3 frames -> sampled 0,2
    assert(f(2L) == 1) // 100 bytes -> 1 frame
    assert(f(3L) == 1)
  }

  test("extractFeatures emits fixed-dim deterministic vectors") {
    val a = Multimodal.extractFeatures(Multimodal.decode(media), dim = 8)
      .filter($"media_id" === 1L).head().features.toSeq
    val b = Multimodal.extractFeatures(Multimodal.decode(media), dim = 8)
      .filter($"media_id" === 1L).head().features.toSeq
    assert(a == b && a.length == 8 && a.exists(_ != 0f))
  }
}
