package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal decode / feature-extraction pipeline (SURVEY §2.9 X3).
  *
  * Media travels as opaque `binary` columns with a typed metadata
  * struct. The Spark-side plumbing — schema, partition sizing, batched
  * per-partition decode, output shape — is real and tested; only the
  * codec call itself is stubbed (this container ships no image/audio
  * libraries), behind the [[Codec]] trait, with [[MediaCodec]] as the
  * deterministic fake so tests are reproducible. Every pipeline stage
  * takes a `codec: Codec = MediaCodec` parameter — a real
  * libjpeg/ffmpeg/JNI implementation drops in without touching any
  * stage (seam proven by MultimodalSpec's custom-codec test).
  *
  * Scale notes: decode is a mapPartitions pass (one codec context per
  * partition, not per row — the per-row-UDF anti-pattern would
  * re-initialize the decoder millions of times). Payload columns are
  * large, so upstream operators must prune them early; `decodedSchema`
  * keeps metadata separate from the payload so catalog-only queries
  * never touch bytes.
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  final case class MediaMeta(
      mediaType: String, // "image" | "audio" | "video"
      nBytes: Long,
      width: Int,
      height: Int,
      sampleRateHz: Int)

  final case class MediaRow(id: Long, payload: Array[Byte], meta: MediaMeta)

  final case class Feature(id: Long, featureId: Int, value: Double)

  /** The codec seam: everything the pipeline needs from a real media
    * stack, and nothing else. A deployment drops in a libjpeg/ffmpeg/
    * JNI implementation of THIS trait and every pipeline stage below
    * (`asMediaTable`, `extractFeatures`, `resize`) works unchanged —
    * the stages take a `codec` parameter defaulting to the stub.
    *
    * Contract for implementors: instances ship to executors inside
    * `mapPartitions` closures, so they must be Serializable and must
    * defer any native-context initialization to first use on the
    * executor (lazy JNI handle per JVM, NOT per row — the pipeline
    * calls you once per row but constructs you once per closure).
    */
  trait Codec extends Serializable {
    /** Parse container headers → typed metadata. */
    def decode(payload: Array[Byte]): MediaMeta
    /** Fixed-dim feature vector (embedding / mel-spectrogram). */
    def features(payload: Array[Byte], dim: Int): Array[Double]
    /** Downscale the payload by `factor`, returning the new payload. */
    def resizePayload(payload: Array[Byte], factor: Int): Array[Byte]
    /** 64-bit perceptual hash packed as two unsigned 32-bit halves. */
    def aHash64(payload: Array[Byte]): (Long, Long)
  }

  /** STUB [[Codec]]. The container ships no image/audio libraries, so
    * decode is a clearly-marked deterministic fake over the payload
    * bytes (NOT a real decode); the sampling/threshold/packing
    * mechanics of aHash64 are real.
    */
  object MediaCodec extends Codec {
    /** STUB: deterministic pseudo-decode. Real impl would parse the
      * container format; this derives stable "dimensions" from content
      * bytes so the pipeline shape is testable end-to-end. */
    def decode(payload: Array[Byte]): MediaMeta = {
      val n = payload.length.toLong
      val h = java.util.Arrays.hashCode(payload)
      MediaMeta(
        mediaType = if (h % 3 == 0) "image" else if (h % 3 == 1) "audio" else "video",
        nBytes = n,
        width = (math.abs(h) % 640) + 1,
        height = (math.abs(h / 7) % 480) + 1,
        sampleRateHz = 16000)
    }

    /** Average-hash (aHash) perceptual fingerprint over the payload:
      * 64 evenly-spaced byte samples (position `i·len div 64`), bit i
      * set iff sample i exceeds the integer-floor mean of the 64
      * samples. Packed as two unsigned 32-bit halves in Longs so SQL
      * engines can replay XOR/bit_count without sign traps. On a real
      * deployment the samples are the 8×8 downscaled grayscale pixels
      * (the classic aHash); the sampling/threshold/packing mechanics —
      * the part that matters for the dedup join — are identical. */
    def aHash64(payload: Array[Byte]): (Long, Long) = {
      val len = payload.length
      require(len > 0, "aHash64 needs a non-empty payload")
      val samples = new Array[Int](64)
      var i = 0
      var sum = 0L
      while (i < 64) {
        samples(i) = payload((i * len) / 64) & 0xff
        sum += samples(i)
        i += 1
      }
      val mean = sum / 64
      var hi = 0L
      var lo = 0L
      i = 0
      while (i < 64) {
        if (samples(i) > mean) {
          if (i < 32) hi |= 1L << (31 - i)
          else lo |= 1L << (63 - i)
        }
        i += 1
      }
      (hi, lo)
    }

    /** STUB: fixed-length feature vector from payload bytes (stands in
      * for a real embedding model / mel-spectrogram). */
    def features(payload: Array[Byte], dim: Int): Array[Double] = {
      val out = new Array[Double](dim)
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xff) / 255.0
        i += 1
      }
      out
    }

    /** STUB resize: byte-stride downsampling standing in for real
      * resampling (a real codec decodes, scales, re-encodes). */
    def resizePayload(payload: Array[Byte], factor: Int): Array[Byte] = {
      val out = new Array[Byte]((payload.length + factor - 1) / factor)
      var i = 0
      while (i < out.length) { out(i) = payload(i * factor); i += 1 }
      out
    }
  }

  /** Wrap any table with a binary payload column into the media schema:
    * (id, payload binary, meta struct). Deterministic fake payloads
    * from a text column when no real media exists. */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String,
                   codec: Codec = MediaCodec): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(textCol).cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one "codec context" per partition — the batch shape that
        // matters at scale
        it.map { case (id, payload) =>
          MediaRow(id, payload, codec.decode(payload)) }
      }
  }

  /** Batched feature extraction: payload → fixed-dim feature rows
    * (exploded long-form, the layout similarity search consumes). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8,
                      codec: Codec = MediaCodec): Dataset[Feature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { row =>
        codec.features(row.payload, dim).iterator.zipWithIndex.map {
          case (v, i) => Feature(row.id, i, v) }
      }
    }
  }

  /** Resize stage: map-only, payload-in/payload-out, resampling
    * delegated to the [[Codec]] seam (stub = byte-stride
    * downsampling; real impl = decode → scale → re-encode). */
  def resize(media: Dataset[MediaRow], factor: Int,
             codec: Codec = MediaCodec): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val out = codec.resizePayload(row.payload, factor)
        row.copy(payload = out,
          meta = row.meta.copy(nBytes = out.length,
            width = math.max(1, row.meta.width / factor),
            height = math.max(1, row.meta.height / factor)))
      }
    }
  }

  /** Deterministic frame sampling: every `stride` bytes, a `frameLen`
    * slice — the positional-access pattern of video frame extraction. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 64,
                   frameLen: Int = 16, maxFrames: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { row =>
      val frames = (0 until maxFrames).map { i =>
        val from = i * stride
        val until = math.min(from + frameLen, row.payload.length)
        if (from >= row.payload.length) Array.empty[Byte]
        else java.util.Arrays.copyOfRange(row.payload, from, until)
      }
      (row.id, frames)
    }.toDF("id", "frames")
  }
}
