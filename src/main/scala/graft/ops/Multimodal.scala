package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video
  * handled as opaque `binary` columns plus typed metadata, processed
  * per-partition so codec state is initialized once per task, not per
  * row — the Scala analogue of an Arrow-batched decode UDF.
  *
  * The actual media decode is STUBBED (`StubCodec`): this container
  * has no image/audio libraries, so the codec derives deterministic
  * fake dimensions from the bytes. Everything around it — the binary
  * schema, the typed Dataset plumbing, the mapPartitions batch shape,
  * partition-level codec lifecycle, the frame-sampling explode — is
  * real and tested; swapping StubCodec for javax.imageio/ffmpeg is a
  * one-object change.
  *
  * Scale: content bytes never shuffle — metadata extraction is
  * map-only; downstream joins/apply work on the (small) metadata,
  * and frame sampling multiplies rows map-side before any exchange.
  */
object Multimodal {

  final case class MediaFile(media_id: Long, kind: String, content: Array[Byte])

  final case class MediaMeta(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      header_hex: String, // first 4 bytes, uppercase hex (magic number)
      checksum: String, // md5 of content
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class Frame(media_id: Long, frame_idx: Int, byte_offset: Long, n_bytes: Int)

  final case class AudioMeta(
      media_id: Long,
      n_bytes: Long,
      sample_rate: Int,
      channels: Int,
      duration_ms: Long)

  implicit val mediaFileEnc: Encoder[MediaFile] = Encoders.product[MediaFile]
  implicit val mediaMetaEnc: Encoder[MediaMeta] = Encoders.product[MediaMeta]
  implicit val frameEnc: Encoder[Frame] = Encoders.product[Frame]
  implicit val audioMetaEnc: Encoder[AudioMeta] = Encoders.product[AudioMeta]

  /** ??? in spirit — a deterministic fake decoder. A real deployment
    * replaces `decodeDims` with an actual codec call; the signature
    * (bytes in, dims out, stateful init amortized per partition) is
    * the contract the pipeline relies on.
    */
  object StubCodec {
    /** "Open" the codec — in reality: load native libs, allocate
      * buffers. Called once per partition, never per row.
      */
    def open(): StubCodec.type = this

    def decodeDims(kind: String, bytes: Array[Byte]): (Int, Int, Long) = {
      val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      val width = 64 + b0 % 64
      val height = 64 + b1 % 64
      val durationMs = if (kind == "video" || kind == "audio") bytes.length.toLong else 0L
      (width, height, durationMs)
    }

    /** Audio header stand-ins: a real decoder reads these from the WAV
      * fmt / MP3 frame header; the stub derives them deterministically
      * from header bytes 3-4 so the Spark-side plumbing stays
      * oracle-checkable.
      */
    val SampleRates: Array[Int] = Array(8000, 16000, 22050, 44100, 48000)

    def decodeAudio(bytes: Array[Byte]): (Int, Int, Long) = {
      val b2 = if (bytes.length > 2) bytes(2) & 0xff else 0
      val b3 = if (bytes.length > 3) bytes(3) & 0xff else 0
      (SampleRates(b2 % SampleRates.length), 1 + b3 % 2, bytes.length.toLong)
    }
  }

  private def hexUpper(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02X").mkString

  private def md5Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  /** Decode / feature-extract: one codec per partition, iterator in /
    * iterator out (no per-row setup, no full-partition materialization).
    */
  def extractMeta(files: Dataset[MediaFile]): Dataset[MediaMeta] =
    files.mapPartitions { it =>
      val codec = StubCodec.open()
      it.map { f =>
        val (w, h, d) = codec.decodeDims(f.kind, f.content)
        MediaMeta(
          media_id = f.media_id,
          kind = f.kind,
          n_bytes = f.content.length.toLong,
          header_hex = hexUpper(f.content.take(4)),
          checksum = md5Hex(f.content),
          width = w,
          height = h,
          duration_ms = d)
      }
    }

  /** Audio-kind metadata: sample rate / channel count / duration from
    * the (stubbed) header decode — same per-partition codec lifecycle
    * as [[extractMeta]], map-only, bytes never shuffle.
    */
  def extractAudioMeta(files: Dataset[MediaFile]): Dataset[AudioMeta] =
    files.filter(_.kind == "audio").mapPartitions { it =>
      val codec = StubCodec.open()
      it.map { f =>
        val (rate, channels, durationMs) = codec.decodeAudio(f.content)
        AudioMeta(f.media_id, f.content.length.toLong, rate, channels, durationMs)
      }
    }

  /** Frame sampling for video-kind rows: every `frameBytes`-sized chunk
    * is one "frame"; keep every `everyNth`. Map-side row explosion.
    */
  def sampleFrames(files: Dataset[MediaFile], frameBytes: Int, everyNth: Int): Dataset[Frame] =
    files.filter(_.kind == "video").flatMap { f =>
      val nFrames = (f.content.length + frameBytes - 1) / frameBytes
      (0 until nFrames).by(everyNth).map { i =>
        val off = i.toLong * frameBytes
        val len = math.min(frameBytes, f.content.length - off.toInt)
        Frame(f.media_id, i, off, len)
      }
    }

  /** "Resize": binary-in binary-out content transform (stub: truncate
    * to maxBytes) — the shape of a real re-encode pass.
    */
  def resize(files: Dataset[MediaFile], maxBytes: Int): Dataset[MediaFile] =
    files.map(f => f.copy(content = f.content.take(maxBytes)))

  /** Lift a DataFrame with (idCol, kindCol, binary contentCol) into the
    * typed media Dataset.
    */
  def asMedia(df: DataFrame, idCol: String, kindCol: String, contentCol: String): Dataset[MediaFile] =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(kindCol).as("kind"),
      col(contentCol).cast("binary").as("content")).as[MediaFile]
}
