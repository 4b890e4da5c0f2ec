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

  // ---- REAL codec (ImageIoCodec, JDK javax.imageio — no stub) ----

  /** Real PNG bytes: w×h gradient with per-image phase, so distinct
    * images differ and near-duplicates (tiny phase shift) stay close. */
  private def png(w: Int, h: Int, phase: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = ((x * 255 / math.max(w - 1, 1)) + phase) % 256
      val u = (y * 255 / math.max(h - 1, 1) + phase / 2) % 256
      img.setRGB(x, y, (v << 16) | (u << 8) | ((v + u) / 2))
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  test("ImageIoCodec decodes real PNG containers: exact dimensions, image type") {
    val meta = graft.operators.ImageIoCodec.decode(png(64, 48, 0))
    assert(meta.mediaType == "image")
    assert(meta.width == 64 && meta.height == 48)
    intercept[IllegalArgumentException] {
      graft.operators.ImageIoCodec.decode("not an image".getBytes)
    }
  }

  test("ImageIoCodec resize: re-encoded PNG decodes at dims ÷ factor") {
    val out = graft.operators.ImageIoCodec.resizePayload(png(64, 48, 0), 4)
    val meta = graft.operators.ImageIoCodec.decode(out)
    assert(meta.width == 16 && meta.height == 12)
  }

  test("ImageIoCodec aHash64: identical/near-dup images collide or stay " +
    "close; distinct images are far; halves unsigned-32-bit") {
    val c = graft.operators.ImageIoCodec
    val a = c.aHash64(png(64, 64, 0))
    assert(a._1 >= 0L && a._1 < (1L << 32) && a._2 >= 0L && a._2 < (1L << 32))
    // byte-identical pixels re-encoded through resize(1) → same hash
    assert(c.aHash64(c.resizePayload(png(64, 64, 0), 1)) == a)
    // near-duplicate (tiny phase shift): small Hamming distance
    assert(hamming(a, c.aHash64(png(64, 64, 4))) <= 12)
    // different image (large phase = shifted gradient): far
    assert(hamming(a, c.aHash64(png(64, 64, 128))) >= 20)
  }

  test("ImageIoCodec features: normalized gray histogram of the decoded pixels") {
    val f = graft.operators.ImageIoCodec.features(png(32, 32, 0), 8)
    assert(f.length == 8)
    assert(math.abs(f.sum - 1.0) < 1e-9) // probability mass over buckets
    assert(f.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("real codec drives every pipeline stage over real PNG payloads") {
    val df = Seq(
      (1L, png(64, 48, 0)), (2L, png(64, 48, 3)), (3L, png(80, 60, 130)))
      .toDF("id", "img")
    val m = Multimodal.asMediaTable(df, "id", "img",
      codec = graft.operators.ImageIoCodec)
    val rows = m.collect().sortBy(_.id)
    assert(rows.map(r => (r.meta.width, r.meta.height)).toSeq ==
      Seq((64, 48), (64, 48), (80, 60)))
    val r2 = Multimodal.resize(m, factor = 2,
      codec = graft.operators.ImageIoCodec).collect().sortBy(_.id)
    // payloads are REAL re-encoded PNGs: decode them back
    assert(r2.map(r => graft.operators.ImageIoCodec.decode(r.payload))
      .map(mm => (mm.width, mm.height)).toSeq ==
      Seq((32, 24), (32, 24), (40, 30)))
    val f = Multimodal.extractFeatures(m, dim = 8,
      codec = graft.operators.ImageIoCodec).collect()
    assert(f.length == 24 && f.forall(_.value >= 0.0))
    // the pHash-dedup shape: 1 and 2 are near-dups, 3 is not
    val h = rows.map(r => graft.operators.ImageIoCodec.aHash64(r.payload))
    assert(hamming(h(0), h(1)) < hamming(h(0), h(2)))
  }

  test("golden fixture: ImageIoCodec reproduces every committed " +
    "expectation (dims, aHash, resize dims, features)") {
    import graft.examples.MmGoldenFixture
    import graft.operators.ImageIoCodec
    // parity BY CONSTRUCTION, not by file: regenerate the corpus in
    // memory and compare the generator's matrix-derived expectations
    // against the codec's decode of the PNG encoding — the exact
    // contract q_mm_phash_real's oracle replays from the committed
    // parquet
    MmGoldenFixture.images().foreach { case (id, m) =>
      val png = MmGoldenFixture.encodePng(m)
      val meta = ImageIoCodec.decode(png)
      assert((meta.width, meta.height) == (m(0).length, m.length),
        s"img $id dims")
      assert(ImageIoCodec.aHash64(png) == MmGoldenFixture.expectedAHash(m),
        s"img $id aHash")
      val rs = ImageIoCodec.decode(ImageIoCodec.resizePayload(png, 2))
      assert((rs.width, rs.height) ==
        (math.max(1, m(0).length / 2), math.max(1, m.length / 2)),
        s"img $id resize dims")
      assert(ImageIoCodec.features(png, 8).toSeq ==
        MmGoldenFixture.expectedFeatures(m, 8).toSeq, s"img $id features")
    }
    // the committed parquet matches the in-memory regeneration (guards
    // against a stale fixture after a generator edit). ALL 15
    // expectation columns via the Expected encoder — a drifted f0..f7
    // or rs_width/rs_height would otherwise slip the unit guard and
    // only surface as a q_mm_phash_real oracle mismatch at verify time
    // (ADVICE r9). Exact Double compare is safe: both sides are the
    // same deterministic integer-count ÷ pixel-count division.
    val committed = spark.read.parquet(MmGoldenFixture.expectedPath)
      .as[MmGoldenFixture.Expected].collect().sortBy(_.img_id)
    val fresh = MmGoldenFixture.expectedRows()
    assert(committed.length == fresh.length, "fixture row count")
    committed.zip(fresh).foreach { case (c, e) =>
      assert(c == e,
        s"committed fixture stale at img ${e.img_id} — rerun MmGoldenFixture")
    }
    // twins are near-dups: tiny Hamming distance to their source image
    val byId = fresh.map(e => e.img_id -> e).toMap
    Seq(17L -> 4L, 18L -> 9L, 19L -> 12L, 20L -> 15L).foreach {
      case (twin, src) =>
        val d = java.lang.Long.bitCount(byId(twin).phash_hi ^ byId(src).phash_hi) +
          java.lang.Long.bitCount(byId(twin).phash_lo ^ byId(src).phash_lo)
        assert(d <= 6, s"twin $twin vs $src hamming $d")
    }
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
