package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal (image/audio/video) column handling for training-data
 * pipelines: media travels as an opaque `binary` column plus a typed
 * metadata struct; per-item compute runs batched inside mapPartitions —
 * the Scala analogue of Python's mapInPandas contract (batch in, batch
 * out, executor-local, no driver round-trips).
 *
 * The actual codecs are NOT in this container, so `decodeStub` is a
 * clearly-marked deterministic fake (metadata derived from the byte
 * stream); everything around it — schema, batching, partitioning,
 * feature shape — is the real plumbing a codec would drop into.
 *
 * At 100 TB: rows are value-heavy (MBs per row), so operators here never
 * shuffle the binary payload — metadata-only projections go through
 * aggregations, and payload transforms stay narrow (mapPartitions).
 */
object Multimodal {

  /** Typed metadata carried next to the binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_bytes", LongType)))

  final case class MediaMeta(format: String, width: Int, height: Int,
                             channels: Int, n_bytes: Long)
  final case class MediaRow(media_id: Long, content: Array[Byte], meta: MediaMeta)
  final case class FrameRow(media_id: Long, frame_no: Int, content: Array[Byte])
  final case class FeatureRow(media_id: Long, features: Array[Float])

  /**
   * STUB — deterministic fake decoder standing in for an image codec.
   * A real implementation would parse the container header; this derives
   * plausible metadata purely from the bytes so tests and oracles are
   * reproducible: width = n%640+1, height = (n*7)%480+1, channels = 3.
   */
  def decodeStub(content: Array[Byte]): MediaMeta = {
    val n = content.length.toLong
    MediaMeta("fake", (n % 640).toInt + 1, ((n * 7) % 480).toInt + 1, 3, n)
  }

  /** Attach decoded metadata to a (media_id, content) table. Batched
    * mapPartitions — the mapInPandas-shaped entry point. */
  def decode(media: DataFrame, batchSize: Int = 64): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch to amortize per-item codec setup, like an Arrow batch
        it.grouped(batchSize).flatMap { batch =>
          batch.map { case (id, bytes) => MediaRow(id, bytes, decodeStub(bytes)) }
        }
      }
  }

  /** STUB resize: a real kernel would rescale pixels; the fake keeps the
    * plumbing honest by transforming content deterministically (truncate/
    * pad to the target byte budget) and rewriting metadata. */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val budget = w * h * m.meta.channels
        val out = java.util.Arrays.copyOf(m.content, budget)
        MediaRow(m.media_id, out,
          MediaMeta(m.meta.format, w, h, m.meta.channels, budget.toLong))
      }
    }
  }

  /** STUB frame sampling: every nth "frame" of a fake fixed frame size;
    * one row per sampled frame (video → images explode). */
  def frameSample(media: Dataset[MediaRow], everyN: Int,
                  frameBytes: Int = 256): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val nFrames = math.max(m.content.length / frameBytes, 1)
      (0 until nFrames by everyN).map { f =>
        val from = f * frameBytes
        val until = math.min(from + frameBytes, m.content.length)
        FrameRow(m.media_id, f, java.util.Arrays.copyOfRange(m.content, from,
          math.max(until, from)))
      }
    }
  }

  /** STUB feature extraction: a real model would embed the media; the
    * fake emits a deterministic dim-sized float vector from a rolling
    * hash of the bytes — shape-compatible with Similarity ops. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val v = new Array[Float](dim)
        var h = 1125899906842597L
        var i = 0
        while (i < m.content.length) {
          h = 31 * h + m.content(i)
          v(i % dim) += (h % 1000) / 1000.0f
          i += 1
        }
        FeatureRow(m.media_id, v)
      }
    }
  }
}
