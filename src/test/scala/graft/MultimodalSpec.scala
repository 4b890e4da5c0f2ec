package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** X3 plumbing: schema, per-partition decode batching, feature/frames
  * output shapes (the codec itself is a documented stub). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def media() = Multimodal.asMediaTable(
    Seq((1L, "hello world payload"), (2L, "a much longer payload with more bytes in it"))
      .toDF("id", "text"), "id", "text")

  test("asMediaTable: binary payload + typed metadata struct") {
    val rows = media().collect().sortBy(_.id)
    assert(rows.length == 2)
    assert(rows(0).payload sameElements "hello world payload".getBytes)
    assert(rows(0).meta.nBytes == 19)
    assert(Set("image", "audio", "video").contains(rows(0).meta.mediaType))
    assert(rows(0).meta.width >= 1 && rows(0).meta.height >= 1)
    // deterministic: same payload → same fake decode
    assert(media().collect().sortBy(_.id).head.meta == rows(0).meta)
  }

  test("extractFeatures: fixed-dim long-form features") {
    val f = Multimodal.extractFeatures(media(), dim = 8).collect()
    assert(f.length == 16)
    assert(f.map(_.featureId).distinct.sorted.toSeq == (0 until 8))
    assert(f.forall(_.value >= 0.0))
  }

  test("resize: byte-stride downsample, metadata scaled") {
    val r = Multimodal.resize(media(), factor = 4).collect().sortBy(_.id)
    assert(new String(r(0).payload) == "horpo") // bytes 0,4,8,12,16
    assert(r(0).meta.nBytes == 5)  // ceil(19/4)
    assert(r(0).meta.width >= 1 && r(0).meta.height >= 1)
  }

  test("codec seam: a custom Codec drops into every stage without touching the pipeline") {
    // stands in for a JNI/ffmpeg impl: fixed metadata, constant
    // features, identity resize — recognizably different from the stub
    object FakeRealCodec extends Multimodal.Codec {
      def decode(payload: Array[Byte]) =
        Multimodal.MediaMeta("image", payload.length.toLong, 1920, 1080, 0)
      def features(payload: Array[Byte], dim: Int) = Array.fill(dim)(0.5)
      def resizePayload(payload: Array[Byte], factor: Int) = payload
      def aHash64(payload: Array[Byte]) = (0L, 0L)
    }
    val df = Seq((1L, "hello world payload")).toDF("id", "text")
    val m = Multimodal.asMediaTable(df, "id", "text", FakeRealCodec)
    val rows = m.collect()
    assert(rows.head.meta == Multimodal.MediaMeta("image", 19L, 1920, 1080, 0))
    val f = Multimodal.extractFeatures(m, dim = 4, codec = FakeRealCodec).collect()
    assert(f.length == 4 && f.forall(_.value == 0.5))
    val r = Multimodal.resize(m, factor = 4, codec = FakeRealCodec).collect()
    assert(r.head.payload sameElements rows.head.payload)
  }

  test("documents fixture is pure ASCII (the q_mm_features oracle " +
    "equates ord(char) with the payload byte)") {
    import org.apache.spark.sql.functions._
    val nonAscii = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      // UTF-8 byte length == char length iff every char is ASCII
      .filter(octet_length(col("text")) =!= length(col("text")))
      .count()
    assert(nonAscii == 0,
      s"$nonAscii docs contain non-ASCII text — the byte-fold oracle breaks")
  }

  test("aHash64: last-byte edits are invisible above 64 bytes; halves stay unsigned-32-bit") {
    val rnd = new scala.util.Random(7)
    val payload = Array.fill(200)((rnd.nextInt(94) + 32).toByte)
    val (hi, lo) = Multimodal.MediaCodec.aHash64(payload)
    // packed halves are unsigned 32-bit values — no sign traps in SQL XOR
    assert(hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32))
    // max sample index (63*len) div 64 < len-1 for len > 64, so a
    // last-byte edit can never reach a sample: perceptually identical
    val edited = payload.clone(); edited(199) = '~'.toByte
    assert(Multimodal.MediaCodec.aHash64(edited) == ((hi, lo)))
    // a mid-payload burst IS visible (some sampled position changes)
    val burst = payload.clone()
    (90 until 110).foreach(i => burst(i) = 0x7e.toByte)
    assert(Multimodal.MediaCodec.aHash64(burst) != ((hi, lo)))
  }

  test("sampleFrames: positional slices, stride/frameLen honored") {
    val frames = Multimodal.sampleFrames(media(), stride = 8, frameLen = 4,
      maxFrames = 3).orderBy("id").collect()
    val first = frames(0).getSeq[Array[Byte]](1)
    assert(first.length == 3)
    assert(new String(first.head) == "hell")
    assert(new String(first(1)) == "rld ") // bytes 8..12
  }
}
