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
}
