package graft.operators

import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.9 X3): media as opaque
  * `binary` payloads + typed metadata structs. The testdata has no real
  * image/audio bytes (and this container has no codec libraries), so
  * payloads are derived deterministically from `documents.text` — the
  * Spark-side schema/partitioning/batching is real and oracle-checked;
  * the actual codec is the clearly-marked stub in
  * [[graft.operators.Multimodal]].
  */
object MultimodalQueries {
  import Q._

  /** Committed real-codec golden fixture (examples.MmGoldenFixture).
    * Absolute paths resolved from SPARK_GRAFT_REPO (default
    * /root/repo): the verify/bench harnesses run with an sf dir, not
    * the repo dir, and the DuckDB oracle reads the same files — the
    * env var makes the battery green from any working directory or a
    * relocated checkout. (Declared before `specs` — the oracle string
    * interpolates them at object init.) */
  private val repoBase = sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo")
  val goldenImagesPath = s"$repoBase/fixtures/mm_golden_images.parquet"
  val goldenExpectedPath = s"$repoBase/fixtures/mm_golden_expected.parquet"

  val specs: Seq[Spec] = Seq(

    // Binary payload + typed metadata extraction: byte length, content
    // hash, deterministic fake decode dims, head-of-payload hex. All
    // row-local (map-only at scale).
    Spec("q_mm_binary_meta",
      (s, dir) => {
        val payload = col("text").cast("binary")
        val nbytes = octet_length(col("text")).cast("long")
        t(s, dir, "documents")
          .select(col("doc_id"),
            nbytes.as("n_bytes"),
            md5(payload).as("content_hash"),
            (nbytes % 640).as("fake_width"),
            (nbytes % 480).as("fake_height"),
            upper(hex(substring(col("text"), 1, 8).cast("binary"))).as("head_hex"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
                    CAST(strlen(text) AS BIGINT) AS n_bytes,
                    md5(text) AS content_hash,
                    CAST(strlen(text) AS BIGINT) % 640 AS fake_width,
                    CAST(strlen(text) AS BIGINT) % 480 AS fake_height,
                    upper(hex(substr(text, 1, 8))) AS head_hex
             FROM documents ORDER BY doc_id""")),

    // Resize analog: stride-4 byte downsample of the payload (the
    // map-only payload-in/payload-out shape of an image resize; the
    // codec itself is the documented stub in Multimodal.MediaCodec).
    // One regex pass — keep char 1 of every ≤4-char window — instead of
    // the r2 per-position substr HOF chain (interpreted per element;
    // this was the one remaining HOF on a hot path).
    Spec("q_mm_resize",
      (s, dir) => {
        val resized = regexp_replace(col("text"),
          lit("(?s)(.)(.{0,3})"), lit("$1"))
        t(s, dir, "documents")
          .select(col("doc_id"), resized.as("resized"))
          .select(col("doc_id"), col("resized"),
            octet_length(col("resized")).cast("long").as("n_bytes"),
            md5(col("resized")).as("content_hash"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH r AS (
               SELECT doc_id,
                      regexp_replace(text, '(.)(.{0,3})', '\1', 'gs') AS resized
               FROM documents)
             SELECT doc_id, resized,
                    CAST(strlen(resized) AS BIGINT) AS n_bytes,
                    md5(resized) AS content_hash
             FROM r ORDER BY doc_id""")),

    // Feature extraction through the REAL mapPartitions pipeline
    // (Multimodal.asMediaTable → extractFeatures): payload bytes folded
    // into an 8-dim vector per doc, emitted long-form — this is the
    // gate check for the batched per-partition decode shape itself,
    // not a SQL re-derivation. Oracle replays the same ascending-order
    // byte fold (corpus is pure ASCII, so ord(char) == byte —
    // MultimodalSpec asserts the fixture constraint). coalesce guards
    // the short-doc case: a doc with < 8 chars has no positions for the
    // tail feature ids, where DuckDB's list_sum of an empty list is
    // NULL but the byte fold is 0.0.
    Spec("q_mm_features",
      (s, dir) => Multimodal.extractFeatures(
          Multimodal.asMediaTable(
            t(s, dir, "documents").filter(col("doc_id") < 50),
            "doc_id", "text"))
        .toDF()
        .select(col("id").as("doc_id"),
          col("featureId").cast("long").as("feature_id"),
          (floor(col("value") * 10000) / 10000).as("v"))
        .orderBy(col("doc_id"), col("feature_id")),
      Some("""SELECT doc_id, CAST(k AS BIGINT) AS feature_id,
                    floor(coalesce(list_sum(list_transform(
                      list_filter(generate_series(1, length(text)),
                                  p -> (p - 1) % 8 = k),
                      p -> ord(substr(text, p, 1)) / 255.0)), 0) * 10000) / 10000
                      AS v
             FROM documents, UNNEST(generate_series(0, 7)) AS t(k)
             WHERE doc_id < 50 ORDER BY doc_id, feature_id""")),

    // Frame sampling: every 64th 16-byte window of the payload —
    // the batch shape of video frame extraction, with the codec
    // replaced by a positional slice. Frames are built as a real
    // ArrayType column, then '|'-joined for the output: the driver's
    // pandas gate cannot hash array-typed cells.
    Spec("q_mm_frame_sample",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          transform(sequence(lit(0), lit(3)),
            i => upper(hex(col("text").substr(i * 64 + 1, lit(16)).cast("binary"))))
            .as("frames_arr"))
        .select(col("doc_id"), array_join(col("frames_arr"), "|").as("frames"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                    array_to_string(list_transform(generate_series(0, 3),
                      i -> upper(hex(substr(text, i * 64 + 1, 16)))), '|') AS frames
             FROM documents ORDER BY doc_id""")),

    // Perceptual-hash (aHash) image dedup: the multimodal counterpart
    // of the text near-dup tier. Hashes are computed through the REAL
    // pipeline shape — binary payloads through the per-partition codec
    // context ([[Multimodal.MediaCodec.aHash64]]: 64 evenly-spaced
    // byte samples, mean threshold, two unsigned-32-bit halves) — then
    // dedup is a prefix-bucket equi-join on the top half plus a
    // bit_count(XOR) Hamming verify on the bottom half, exactly the
    // q_dedup_simhash_pairs join geometry: candidate volume scales
    // with bucket occupancy, never |corpus|². The corpus has no
    // natural byte-identical media, so the query synthesizes one
    // variant per 50th doc with the LAST byte replaced — provably
    // never sampled when len > 64 (max sample index (63·len) div 64 <
    // len−1) — i.e., perceptually identical twins with different md5,
    // the exact case content-hash dedup misses and pHash exists for.
    Spec("q_mm_phash_dedup",
      (s, dir) => {
        import s.implicits._
        val base = t(s, dir, "documents")
          .filter(octet_length(col("text")) > 0)
          .select(col("doc_id"), col("text"))
        val variants = base
          .filter(col("doc_id") % 50 === 0 && octet_length(col("text")) > 64)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(expr("substring(text, 1, octet_length(text) - 1)"),
              lit("~")).as("text"))
        val media = Multimodal.asMediaTable(
          base.unionByName(variants), "doc_id", "text")
        val hashes = media.mapPartitions { it =>
          it.map { r =>
            val (hi, lo) = Multimodal.MediaCodec.aHash64(r.payload)
            (r.id, hi, lo)
          }
        }.toDF("doc_id", "hi", "lo")
        val a = hashes
          .select(col("doc_id").as("doc_a"), col("hi"), col("lo").as("lo_a"))
        val b = hashes.select(col("doc_id").as("doc_b"),
          col("hi").as("hi_b"), col("lo").as("lo_b"))
        a.join(b, col("hi") === col("hi_b") && col("doc_a") < col("doc_b"))
          .withColumn("hamming", expr("bit_count(lo_a ^ lo_b)").cast("long"))
          .filter(col("hamming") <= 6)
          .select(col("doc_a"), col("doc_b"), col("hamming"))
          .orderBy(col("doc_a"), col("doc_b"))
      },
      Some("""WITH u AS (
               SELECT doc_id, text FROM documents WHERE strlen(text) > 0
               UNION ALL
               SELECT doc_id + 1000000, substr(text, 1, strlen(text) - 1) || '~'
               FROM documents WHERE doc_id % 50 = 0 AND strlen(text) > 64),
             d AS (SELECT doc_id, text, strlen(text) AS len FROM u),
             s AS (SELECT doc_id, i,
                          ord(substr(text,
                            CAST((i * len) // 64 AS INTEGER) + 1, 1)) AS smp
                   FROM d, (SELECT unnest(generate_series(0, 63)) AS i)),
             m AS (SELECT doc_id, CAST(sum(smp) // 64 AS BIGINT) AS mean
                   FROM s GROUP BY doc_id),
             h AS (SELECT s.doc_id,
                          CAST(sum(CASE WHEN smp > mean AND i < 32
                            THEN (CAST(1 AS BIGINT) << (31 - i))
                            ELSE 0 END) AS BIGINT) AS hi,
                          CAST(sum(CASE WHEN smp > mean AND i >= 32
                            THEN (CAST(1 AS BIGINT) << (63 - i))
                            ELSE 0 END) AS BIGINT) AS lo
                   FROM s JOIN m USING (doc_id) GROUP BY s.doc_id)
             SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    CAST(bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
             FROM h a JOIN h b ON a.hi = b.hi AND a.doc_id < b.doc_id
             WHERE bit_count(xor(a.lo, b.lo)) <= 6
             ORDER BY doc_a, doc_b""")),

    // The REAL codec, oracle-gated (VERDICT r8 #2): committed PNG
    // payloads (fixtures/mm_golden_images.parquet — solids, gradients,
    // checkers, noise, near-dup twins; generated + committed by
    // examples.MmGoldenFixture) driven end-to-end through
    // ImageIoCodec — container decode, 8×8-pooled aHash64, factor-2
    // resize → re-encode → re-decode, 8-bucket grayscale histogram —
    // inside the same per-partition codec-context mapPartitions shape
    // the stub rows use. The oracle replays the committed expectation
    // table, whose values the generator computed INDEPENDENTLY from
    // the pixel matrices it drew (the codec never ran at generation
    // time; PNG is lossless so the decoded matrix is the contract) —
    // a regression in any codec stage shows as a value mismatch here.
    // The stub row above is retained: it is the oracle-replayable
    // sampling-mechanics gate; THIS row gates the real decoder.
    Spec("q_mm_phash_real",
      (s, dir) => {
        import s.implicits._
        s.read.parquet(goldenImagesPath)
          .select(col("img_id"), col("payload"))
          .as[(Long, Array[Byte])]
          .mapPartitions { it =>
            val codec = ImageIoCodec // one codec context per partition
            it.map { case (id, p) =>
              val m = codec.decode(p)
              val (hi, lo) = codec.aHash64(p)
              val rs = codec.decode(codec.resizePayload(p, 2))
              val f = codec.features(p, 8)
              (id, m.width.toLong, m.height.toLong, hi, lo,
                rs.width.toLong, rs.height.toLong,
                f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
            }
          }
          .toDF("img_id", "width", "height", "phash_hi", "phash_lo",
            "rs_width", "rs_height",
            "f0", "f1", "f2", "f3", "f4", "f5", "f6", "f7")
          .orderBy(col("img_id"))
      },
      Some(s"""SELECT img_id, width, height, phash_hi, phash_lo,
                    rs_width, rs_height, f0, f1, f2, f3, f4, f5, f6, f7
             FROM read_parquet('$goldenExpectedPath/*.parquet')
             ORDER BY img_id"""))
  )
}
