package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal decode / feature-extraction pipeline (SURVEY §2.9 X3).
  *
  * Media travels as opaque `binary` columns with a typed metadata
  * struct. The Spark-side plumbing — schema, partition sizing, batched
  * per-partition decode, output shape — is real and tested; only the
  * codec call itself is stubbed (this container ships no image/audio
  * libraries), behind [[MediaCodec.decode]], with a deterministic fake
  * so tests are reproducible.
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

  /** The codec boundary. A real deployment plugs libjpeg/ffmpeg/etc. in
    * here; the container has none, so decode is a clearly-marked
    * deterministic fake over the payload bytes (NOT a real decode).
    */
  object MediaCodec {
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
    def features(payload: Array[Byte], dim: Int = 8): Array[Double] = {
      val out = new Array[Double](dim)
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xff) / 255.0
        i += 1
      }
      out
    }
  }

  /** Wrap any table with a binary payload column into the media schema:
    * (id, payload binary, meta struct). Deterministic fake payloads
    * from a text column when no real media exists. */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(textCol).cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // one "codec context" per partition — the batch shape that
        // matters at scale
        it.map { case (id, payload) =>
          MediaRow(id, payload, MediaCodec.decode(payload)) }
      }
  }

  /** Batched feature extraction: payload → fixed-dim feature rows
    * (exploded long-form, the layout similarity search consumes). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[Feature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { row =>
        MediaCodec.features(row.payload, dim).iterator.zipWithIndex.map {
          case (v, i) => Feature(row.id, i, v) }
      }
    }
  }

  /** STUB resize: byte-stride downsampling standing in for image
    * resampling (real impl would go through the codec). Keeps the
    * map-only, payload-in/payload-out shape a resize stage has. */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val out = new Array[Byte]((row.payload.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = row.payload(i * factor); i += 1 }
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
