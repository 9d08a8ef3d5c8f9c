package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary-column) plumbing: opaque payloads with typed
  * metadata, and a batched decode pipeline with a STUBBED decoder
  * (SURVEY.md §2.10).
  *
  * The model: media lives in a `binary` column next to typed metadata
  * columns; metadata extraction (size, magic header, checksum) is pure
  * `Column` arithmetic; decode/feature-extract runs as a per-partition
  * batch transform (`mapPartitions` with a typed `Encoder` — the Scala
  * analog of `mapInPandas`): one decoder instantiation per partition,
  * streamed row batches, columnar-friendly fixed schema out.
  *
  * No image/audio codec libraries exist in this container, so
  * [[StubDecoder]] is a clearly-marked deterministic fake; everything
  * around it — schema, batch iteration, partitioning, the typed output
  * encoder — is real and tested, and a production decoder drops in by
  * replacing one function.
  */
object Multimodal {

  /** Typed metadata over an opaque binary payload column. The payload here
    * is the UTF-8 encoding of `text` (the only binary source in the test
    * data); the metadata expressions are payload-agnostic. */
  def metadata(docs: DataFrame): DataFrame = {
    val payload = col("text").cast("binary")
    docs.select(
      col("doc_id"),
      payload.as("payload"),
      length(payload).as("byte_size"),
      lower(hex(substring(payload, 1, 4))).as("magic_hex"),
      md5(payload).as("checksum"))
  }

  // ---- decode plumbing (stubbed decoder, real pipeline) ----------------

  /** Fixed decode output schema: one row per extracted frame. */
  case class DecodedFrame(
      doc_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      n_channels: Int,
      frame_checksum: String)

  /** STUB decoder — deterministic fake standing in for a codec library.
    * Derives "frames" from payload bytes only, so results are stable
    * across runs and partitionings. A real implementation would parse the
    * container format here and emit one row per decoded/sampled frame. */
  object StubDecoder {
    def decode(docId: Long, payload: Array[Byte], maxFrames: Int): Iterator[DecodedFrame] = {
      val nFrames = math.min(maxFrames, 1 + payload.length % 3)
      val side = 16 + (payload.length % 16)
      (0 until nFrames).iterator.map { i =>
        val window = payload.slice(i * 8, i * 8 + 64)
        val sum = window.foldLeft(0L)((a, b) => a * 31 + (b & 0xff))
        DecodedFrame(docId, i, side, side, 3, f"$sum%016x")
      }
    }
  }

  /** Batched decode over the payload column: per-partition iteration (one
    * decoder per partition, no per-row setup), typed output. */
  def decodeFrames(spark: SparkSession, withPayload: DataFrame, maxFrames: Int = 3): Dataset[DecodedFrame] = {
    import spark.implicits._
    withPayload.select(col("doc_id").cast("long"), col("payload").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // decoder/codec init would happen once per partition here
        rows.flatMap { case (id, payload) => StubDecoder.decode(id, payload, maxFrames) }
      }
  }

  /** Frame sampling: keep every `everyN`-th frame of each document — a
    * pure filter on the typed frame stream, no shuffle (the standard
    * video-to-training-frames thinning step). */
  def sampleFrames(frames: Dataset[DecodedFrame], everyN: Int = 2): Dataset[DecodedFrame] =
    frames.filter(f => f.frame_idx % everyN == 0)

  /** Resized-frame record: source + output geometry and the (stub)
    * resized-content checksum. */
  case class ResizedFrame(
      doc_id: Long,
      frame_idx: Int,
      src_w: Int,
      src_h: Int,
      out_w: Int,
      out_h: Int,
      scale: Double,
      resized_checksum: String)

  /** Batched resize stage: fit each frame into a `target`×`target` box
    * preserving aspect ratio. The geometry math is real; the pixel
    * resample is the stub (checksum derived deterministically from the
    * frame's checksum + output dims, where a production kernel would
    * hash the resampled buffer). Same per-partition batch shape as
    * [[decodeFrames]], so the two stages pipeline inside one task with
    * no intermediate materialization. */
  def resizeFrames(frames: Dataset[DecodedFrame], target: Int = 224): Dataset[ResizedFrame] = {
    import frames.sparkSession.implicits._
    frames.mapPartitions { rows =>
      // resampler init would happen once per partition here
      rows.map { f =>
        val scale = math.min(target.toDouble / f.width, target.toDouble / f.height)
        val ow = math.max(1, math.round(f.width * scale).toInt)
        val oh = math.max(1, math.round(f.height * scale).toInt)
        val sum = (f.frame_checksum + s":${ow}x$oh").foldLeft(0L)((a, c) => a * 31 + c)
        ResizedFrame(f.doc_id, f.frame_idx, f.width, f.height, ow, oh, scale, f"$sum%016x")
      }
    }
  }
}
