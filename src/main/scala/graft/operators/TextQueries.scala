package graft.operators

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Text-analysis operators (SURVEY §2.9 X4) over `documents`:
  * language-ID (vocabulary-hit heuristic), quality scoring, token
  * counting (whitespace + regex), and document fingerprinting (md5 +
  * winnowing rolling min-hash). All row-local — map-only at any scale,
  * no shuffle except the explicit corpus aggregate.
  */
object TextQueries {
  import Q._

  // Heuristic "language" vocabularies over the synthetic corpus vocab —
  // the mechanism (per-language token-hit scoring, deterministic argmax)
  // is the real n-gram language-ID shape; swap the lists for character
  // n-gram tables on a natural-language corpus.
  private val SqlWords    = Seq("join", "filter", "agg", "query", "table", "scan")
  private val StreamWords = Seq("stream", "batch", "window", "spark", "value")
  private val DataWords   = Seq("data", "row", "column", "vector", "key")
  private val StopWords   = Seq("the", "a", "of", "and")

  private def listSql(ws: Seq[String]) = ws.mkString("['", "', '", "']")

  /** Docs per prefix-sum shard in q_pack_sequences. At sf0.01 (500
    * docs) this still yields multiple shards per language so the gate
    * exercises the hierarchical path; at 100 TB the knob bounds every
    * task to shardWidth docs regardless of corpus size. */
  val PackShardWidth = 64L

  /** Two-pass distributed prefix sum for sequence packing.
    *
    * Pass 1 computes the running token count within (lang, shard) where
    * shard = doc_id div shardWidth — ordered shards, so concatenating
    * shard orders reproduces the global (lang, doc_id) order. Pass 2
    * aggregates one total per shard (corpus/shardWidth rows — tiny) and
    * turns it into per-shard starting offsets with a window over that
    * aggregate, broadcast back onto the rows. offset + within-shard
    * running sum is EXACTLY the global cumulative sum, so pack
    * boundaries are identical to a single global window — but no task
    * ever holds more than shardWidth rows, where the r2 form gave each
    * of the ~5 lang values one task scanning corpus/|langs| rows.
    */
  def packSequences(docs: org.apache.spark.sql.DataFrame,
                    shardWidth: Long): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      expr(s"doc_id div $shardWidth").as("shard"))
    val wIn = Window.partitionBy(col("lang"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // strictly-preceding shards only: this shard's offset excludes its
    // own total
    val wShards = Window.partitionBy(col("lang")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy(col("lang"), col("shard"))
      .agg(sum(col("n_tokens")).as("shard_tot"))
      .withColumn("offset",
        coalesce(sum(col("shard_tot")).over(wShards), lit(0L)))
      .select(col("lang").as("o_lang"), col("shard").as("o_shard"),
        col("offset"))
    base.withColumn("cum_in", sum(col("n_tokens")).over(wIn))
      .join(broadcast(offsets),
        col("lang") === col("o_lang") && col("shard") === col("o_shard"))
      .withColumn("cum_tokens", col("offset") + col("cum_in"))
      .withColumn("pack_id", expr("(cum_tokens - 1) div 512"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("pack_id"))
      .orderBy(col("doc_id"))
  }

  /** The PII-style scrub as a reusable map-only transform: redacted
    * text + audit counts. No sort/aggregate/window — valid on a batch
    * DataFrame and on a streaming one (append mode) alike. */
  private val EmailRe = "[a-z0-9.]+@[a-z0-9.]+"
  private val Num9Re = "[0-9]{9,}"
  private def redactedText: org.apache.spark.sql.Column = regexp_replace(
    regexp_replace(lower(col("text")), EmailRe, "<EMAIL>"),
    Num9Re, "<NUM>")

  def redact(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    docs.select(col("doc_id"),
      redactedText.as("redacted"),
      size(regexp_extract_all(lower(col("text")), lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(lower(col("text")), lit(Num9Re), lit(0)))
        .cast("long").as("n_longnums"))
  }

  /** The scrub in PIPELINE form: `text` replaced by its redacted form,
    * every other column preserved — the same expressions the
    * q_text_redact gate pins ([[redact]] is that gate's projection).
    * Stateless per-row map, so it runs unchanged on batch and
    * streaming frames (StreamingSpec composes it mid-stream). */
  def redactInPlace(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.withColumn("text", redactedText)

  /** Model-based quality filter as a reusable STATELESS map — a pure
    * per-row projection, so it runs unchanged on a batch frame and on
    * a Structured-Streaming frame (StreamingSpec proves parity).
    * Literal-weight linear score over quality features, squashed with
    * the rational sigmoid z/(1+|z|) whose ops are IEEE-exact across
    * engines (exp() is not). Emits (doc_id, score, keep). */
  def qualityClassifier(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val toks = split(col("text"), " ")
    val nTokens = size(toks).cast("long")
    val noSpace = length(regexp_replace(col("text"), " ", "")).cast("long")
    val stopHits = tokenInSetCount(col("text"), StopWords)
    val digits = length(regexp_replace(col("text"), "[^0-9]", ""))
      .cast("long")
    def floor6(c: org.apache.spark.sql.Column) =
      floor(c * 1000000) / 1000000
    df.select(col("doc_id"), nTokens.as("n_tokens"),
        (noSpace.cast("double") / nTokens).as("avg_len"),
        (stopHits.cast("double") / nTokens).as("stop_r"),
        (digits.cast("double") / length(col("text"))).as("digit_r"))
      .withColumn("z",
        lit(-1.75) + col("n_tokens") / 64.0 * 0.8 + col("avg_len") * 0.3
          + col("stop_r") * 2.0 - col("digit_r") * 3.0)
      .select(col("doc_id"),
        floor6(lit(0.5) + lit(0.5) * (col("z") / (lit(1.0) + abs(col("z")))))
          .as("score"))
      .withColumn("keep", col("score") >= 0.5)
  }

  /** Segment width / distinct-doc-frequency cap for the boilerplate
    * scrub gate — interpolated into BOTH engines. At sf0.01 the 4-token
    * unit yields ~340 cross-document duplicate segments (~770 dropped
    * instances), so the drop path is genuinely exercised. (Declared
    * before `specs`: the oracle SQL interpolates them eagerly.) */
  val ScrubSegTokens = 4
  val ScrubDfCap = 1L

  /** Gopher-rule battery knobs (q_gopher_rules) — interpolated into
    * BOTH engines. Duplicate-block/top-bigram caps sit inside the
    * corpus's observed sf0.01 distribution (dup-block fraction reaches
    * 27.6 %, top-bigram 16.7 %) so keep AND drop are both exercised;
    * the word-length band is Gopher's published [3, 10]. */
  val GopherBlockTokens = 2
  val GopherMinTokens = 50L
  val GopherMeanWlenLoPpm = 3000000L
  val GopherMeanWlenHiPpm = 10000000L
  val GopherDupBlockCapPpm = 100000L
  val GopherTopBigramCapPpm = 50000L

  /** Cross-document duplicate-segment removal. Returns one row per doc:
    * (doc_id, text_clean, n_kept, n_total). Segments whose corpus-wide
    * distinct-document frequency exceeds `dfCap` are removed; surviving
    * segments are re-joined in original order. Exact counterpart of the
    * C4 line-dedup rule with `split('\n')` swapped for fixed token
    * blocks (this corpus is newline-free). */
  /** (doc_id, seg_idx, seg, dg): fixed-token-block segmentation with a
    * 128-bit digest per segment — shared by the whole-corpus and
    * incremental scrub forms. */
  private def segments(docs: org.apache.spark.sql.DataFrame,
                       segTokens: Int): org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0),
            ((size(col("toks")) - 1) / segTokens).cast("int")),
          i => array_join(
            slice(col("toks"), i * segTokens + 1, lit(segTokens)), " ")))
          .as(Seq("seg_idx", "seg")))
      .withColumn("dg", md5(col("seg")))

  /** Survivor reassembly + audit counts, one aggregate on doc_id. */
  private def reassemble(joined: org.apache.spark.sql.DataFrame,
                         dfCap: Long): org.apache.spark.sql.DataFrame =
    joined
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(array_sort(collect_list(
          when(col("df") <= dfCap, struct(col("seg_idx"), col("seg"))))),
          x => x.getField("seg")), " ").as("text_clean"),
        count(when(col("df") <= dfCap, lit(1))).as("n_kept"),
        count(lit(1)).as("n_total"))

  def scrubBoilerplate(docs: org.apache.spark.sql.DataFrame,
                       segTokens: Int,
                       dfCap: Long): org.apache.spark.sql.DataFrame = {
    val segs = segments(docs, segTokens)
    // distinct-doc df on the 128-bit digest: the shuffle ships
    // (digest, doc_id), never segment text
    val segDf = segs.select(col("dg"), col("doc_id")).distinct()
      .groupBy(col("dg")).agg(count(lit(1)).as("df"))
    reassemble(segs.join(segDf, "dg"), dfCap)
  }

  /** Incremental scrub: clean a batch against a MAINTAINED corpus
    * segment-frequency index — the batch-vs-corpus counterpart of
    * [[scrubBoilerplate]], same shape as the incremental dedup family
    * ([[DedupQueries.incrementalKeep]] et al.). A batch segment is
    * dropped iff its distinct-document frequency IN THE CORPUS exceeds
    * `dfCap`; segments the corpus has never seen always survive
    * (df = 0 via the left join). At scale the df table is the
    * maintained state — bucketed by digest, updated per batch with a
    * merge of the batch's own (digest, count) partials — so daily runs
    * never rescan corpus text.
    *
    * `deletedDocs` = the DELETE path (VERDICT r16 missing #2 applied
    * to the third incremental index): unlike the ANN cells/codes and
    * the prefix postings — where deletion is a pure row subtraction —
    * the scrub's maintained state is a COUNT, so a takedown must
    * DECREMENT it: df_live(dg) = df(dg) − df_deleted(dg), where
    * df_deleted is one distinct-doc segment count over the DELETED
    * DOCS ONLY (takedown-sized, never a corpus rescan — takedowns
    * arrive with their text). A batch segment whose only corpus
    * carriers were retracted is then KEPT, exactly as a from-scratch
    * rebuild over the surviving corpus would keep it — the
    * q_text_scrub_delete oracle proves the equality by rebuilding df
    * over corpus ∖ deleted. Deleting can only LOWER df, so segments
    * flip one way (drop → keep): the monotone dual of the append
    * path's merge.
    *
    * CONTRACT: each takedown must be applied EXACTLY ONCE against the
    * maintained df, and `deletedDocs` must be corpus rows. Count
    * state is not idempotent the way the row-subtraction deletes
    * (q_ann_delete, q_dedup_prefix_delete) are: replaying a takedown
    * after the corpus was compacted would double-decrement and keep
    * segments a rebuild would drop. The floor at 0 below bounds the
    * damage for the all-carriers-deleted case but cannot recover a
    * wrong keep at df_live > 0.
    *
    * `appliedTakedowns` ENFORCES the contract (VERDICT r17 wrong #2)
    * instead of leaving it to caller discipline: pass the ledger of
    * doc_ids whose decrements the maintained df already carries — the
    * batch dual of the streaming leg's already-deleted anti-join —
    * and any `deletedDocs` row on the ledger is skipped, so
    * re-submitting a takedown list (an operator retry, an upstream
    * at-least-once delivery) leaves df_live and the scrub output
    * bit-identical. The ledger is takedown-sized index metadata, the
    * same table [[graft.streaming.ComposedPipeline.takedownBatch]]
    * maintains for the streaming leg; callers who instead dedupe the
    * takedown stream themselves may keep passing None — the CCNet-df
    * / Count-Min discipline — but no longer have to. */
  def scrubIncremental(batch: org.apache.spark.sql.DataFrame,
                       corpus: org.apache.spark.sql.DataFrame,
                       segTokens: Int,
                       dfCap: Long,
                       deletedDocs: Option[org.apache.spark.sql.DataFrame] = None,
                       appliedTakedowns: Option[org.apache.spark.sql.DataFrame] = None)
      : org.apache.spark.sql.DataFrame = {
    val corpusDf = segments(corpus, segTokens)
      .select(col("dg"), col("doc_id")).distinct()
      .groupBy(col("dg")).agg(count(lit(1)).as("df"))
    val liveDf = deletedDocs.fold(corpusDf) { dd0 =>
      // exactly-once: drop takedowns already applied to the df
      val dd = appliedTakedowns.fold(dd0)(ledger =>
        dd0.join(broadcast(ledger.select(col("doc_id")).distinct()),
          Seq("doc_id"), "left_anti"))
      val deletedDf = segments(dd, segTokens)
        .select(col("dg"), col("doc_id")).distinct()
        .groupBy(col("dg")).agg(count(lit(1)).as("ddf"))
      corpusDf.join(deletedDf, Seq("dg"), "left")
        .select(col("dg"),
          greatest(col("df") - coalesce(col("ddf"), lit(0L)), lit(0L))
            .as("df"))
    }
    reassemble(
      segments(batch, segTokens)
        .join(liveDf, Seq("dg"), "left")
        .withColumn("df", coalesce(col("df"), lit(0L))),
      dfCap)
  }

  /** Gopher-style within-document repetition/quality rule battery:
    * per doc (doc_id, text) → (doc_id, n_tokens, mean_wlen_ppm,
    * dup_block_ppm, top_bigram_ppm, keep). Ratios are floor-scaled
    * integer millionths (bit-exact cross-engine); `keep` ANDs the
    * min-token, word-length-band, duplicate-block and top-bigram
    * rules. Both repetition legs shuffle (doc_id, 16 B digest) pairs,
    * never text, and fold back to one row per doc. */
  def gopherRules(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import graft.functions.TextFunctions.bigramsFast
    val base = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      (length(col("text")) - size(split(col("text"), " ")) + 1)
        .cast("long").as("sum_wlen"))
    val dup = segments(docs, GopherBlockTokens)
      .groupBy(col("doc_id"), col("dg"))
      .agg(count(lit(1)).as("c"),
        max(size(split(col("seg"), " ")).cast("long")).as("st"))
      .groupBy(col("doc_id"))
      .agg(coalesce(sum(when(col("c") > 1, col("c") * col("st"))), lit(0L))
        .as("dup_tokens"))
    val topbg = docs
      .select(col("doc_id"), explode(bigramsFast(col("text"))).as("b"))
      .groupBy(col("doc_id"), md5(col("b")).as("bh"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_c"), sum(col("c")).as("n_bg"))
    base
      .join(dup, Seq("doc_id"), "left")
      .join(topbg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        expr("sum_wlen * 1000000 div n_tokens").as("mean_wlen_ppm"),
        expr("coalesce(dup_tokens, 0) * 1000000 div n_tokens")
          .as("dup_block_ppm"),
        expr("coalesce(top_c, 0) * 1000000 div greatest(coalesce(n_bg, 0), 1)")
          .as("top_bigram_ppm"))
      .withColumn("keep",
        col("n_tokens") >= GopherMinTokens &&
          col("mean_wlen_ppm").between(GopherMeanWlenLoPpm, GopherMeanWlenHiPpm) &&
          col("dup_block_ppm") <= GopherDupBlockCapPpm &&
          col("top_bigram_ppm") <= GopherTopBigramCapPpm)
  }

  lazy val specs: Seq[Spec] =
    Seq(lmPerplexitySpec, curationFunnelSpec, bpePairsSpec,
      bpeMergesSpec) ++ Seq(

    // Language ID: score = distinct-vocabulary hits per language,
    // argmax with a fixed tie order.
    Spec("q_text_langid",
      (s, dir) => {
        val toks = split(col("text"), " ")
        def hits(ws: Seq[String]) =
          size(array_intersect(toks, array(ws.map(lit): _*))).cast("long")
        spread(s, t(s, dir, "documents"))
          .select(col("doc_id"),
            hits(SqlWords).as("s_sql"),
            hits(StreamWords).as("s_stream"),
            hits(DataWords).as("s_data"))
          .withColumn("lang_pred",
            when(col("s_sql") >= col("s_stream") && col("s_sql") >= col("s_data"), "sqlish")
              .when(col("s_stream") >= col("s_data"), "streamish")
              .otherwise("dataish"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH scored AS (
               SELECT doc_id,
                 CAST(len(list_intersect(string_split(text,' '), ${listSql(SqlWords)})) AS BIGINT) AS s_sql,
                 CAST(len(list_intersect(string_split(text,' '), ${listSql(StreamWords)})) AS BIGINT) AS s_stream,
                 CAST(len(list_intersect(string_split(text,' '), ${listSql(DataWords)})) AS BIGINT) AS s_data
               FROM documents)
             SELECT doc_id, s_sql, s_stream, s_data,
                    CASE WHEN s_sql >= s_stream AND s_sql >= s_data THEN 'sqlish'
                         WHEN s_stream >= s_data THEN 'streamish'
                         ELSE 'dataish' END AS lang_pred
             FROM scored ORDER BY doc_id""")),

    // Quality scoring: length/stopword/character-class heuristics
    // composed into a bounded score.
    Spec("q_text_quality",
      (s, dir) => {
        val toks = split(col("text"), " ")
        val nTokens = size(toks).cast("long")
        val noSpace = length(regexp_replace(col("text"), " ", "")).cast("long")
        // native one-pass count — the size(filter(toks, t -> t IN set))
        // HOF form is interpreted per token (BASELINE.md's own rule)
        val stopHits = tokenInSetCount(col("text"), StopWords)
        // floor(x·10⁴)/10⁴ instead of round(x,4): both engines compute
        // bit-identical doubles, but their ROUND implementations differ
        // on FP-induced half boundaries (Spark rounds the exact decimal
        // of the double, DuckDB rounds x·10⁴) — floor of the same
        // double is deterministic everywhere.
        def floor4(c: org.apache.spark.sql.Column) = floor(c * 10000) / 10000
        spread(s, t(s, dir, "documents"))
          .select(col("doc_id"),
            nTokens.as("n_tokens"),
            floor4(noSpace.cast("double") / nTokens).as("avg_token_len"),
            floor4(stopHits.cast("double") / nTokens).as("stop_ratio"))
          .withColumn("quality",
            floor4(least(lit(1.0), col("n_tokens") / 64.0) * 0.6 +
              least(lit(1.0), col("stop_ratio") * 4) * 0.4))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH x AS (
               SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS no_space,
                 CAST(len(list_filter(string_split(text, ' '),
                   t -> list_contains(${listSql(StopWords)}, t))) AS BIGINT) AS stop_hits
               FROM documents),
             y AS (
               SELECT doc_id, n_tokens,
                      floor(CAST(no_space AS DOUBLE) / n_tokens * 10000) / 10000 AS avg_token_len,
                      floor(CAST(stop_hits AS DOUBLE) / n_tokens * 10000) / 10000 AS stop_ratio
               FROM x)
             SELECT doc_id, n_tokens, avg_token_len, stop_ratio,
                    floor((least(CAST(1.0 AS DOUBLE), n_tokens / CAST(64.0 AS DOUBLE)) * 0.6 +
                           least(CAST(1.0 AS DOUBLE), stop_ratio * 4) * 0.4) * 10000) / 10000 AS quality
             FROM y ORDER BY doc_id""")),

    // Token counting: whitespace split vs regex tokenizer vs distinct.
    Spec("q_text_token_count",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("ws_tokens"),
          size(regexTokens(col("text"))).cast("long").as("re_tokens"),
          size(array_distinct(split(col("text"), " "))).cast("long")
            .as("distinct_tokens"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
                    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS re_tokens,
                    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS distinct_tokens
             FROM documents ORDER BY doc_id""")),

    // Corpus-level rollup: the one deliberate shuffle in this module.
    Spec("q_text_corpus_stats",
      (s, dir) => t(s, dir, "documents")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " "))).cast("long").as("total_tokens"),
          round(avg(col("n_chars")), 4).as("avg_chars"))
        .orderBy(col("lang")),
      Some("""SELECT lang, count(*) AS n_docs,
                    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
                    round(avg(n_chars), 4) AS avg_chars
             FROM documents GROUP BY lang ORDER BY lang""")),

    // MapType token-count column (SURVEY §1.2): token → count as a real
    // map column, keys sorted so the two engines' map orders agree. The
    // map is built AND re-read through map_entries (proving MapType
    // round-trip), then serialized as 'k:v,...' — the driver's pandas
    // gate cannot hash map-typed cells.
    Spec("q_text_token_map",
      (s, dir) => {
        val toks = split(col("text"), " ")
        val keys = array_sort(array_distinct(toks))
        t(s, dir, "documents")
          .filter(col("doc_id") < 50)
          .select(col("doc_id"),
            map_from_arrays(keys,
              transform(keys, k => size(filter(toks, t => t === k)).cast("long")))
              .as("tc_map"))
          .select(col("doc_id"),
            array_join(transform(map_entries(col("tc_map")),
              e => concat(e.getField("key"), lit(":"),
                e.getField("value").cast("string"))), ",").as("token_counts"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
                    array_to_string(
                      list_transform(
                        map_entries(map(list_sort(list_distinct(string_split(text, ' '))),
                          list_transform(list_sort(list_distinct(string_split(text, ' '))),
                            k -> CAST(len(list_filter(string_split(text, ' '),
                                   t -> t = k)) AS BIGINT)))),
                        e -> e.key || ':' || CAST(e.value AS VARCHAR)),
                      ',') AS token_counts
             FROM documents WHERE doc_id < 50 ORDER BY doc_id""")),

    // Stratified deterministic sampling: keep ~30% per language by md5
    // hash threshold — reproducible on any engine (unlike seeded RNG
    // sampling, which is engine-private), stable under corpus growth,
    // and map-only. The class-balancing counterpart follows.
    Spec("q_stratified_sample",
      (s, dir) => {
        val bucket = conv(substring(md5(concat(lit("strat|"),
          col("doc_id").cast("string"))), 1, 15), 16, 10)
          .cast("long") % 100
        t(s, dir, "documents")
          .filter(bucket < 30)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_sampled"), min(col("doc_id")).as("min_id"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*) AS n_sampled, min(doc_id) AS min_id
             FROM documents
             WHERE CAST(('0x' || substr(md5('strat|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 30
             GROUP BY lang ORDER BY lang""")),

    // Class balancing: downsample every language toward the
    // minority-class count by a deterministic hash threshold — keep a
    // row iff its md5 bucket falls below target/n_class of the bucket
    // space. All-integer predicate (bucket·n_class < target·B), so both
    // engines decide identically; map-only after two broadcast joins
    // (per-class counts + the scalar target). The r2 form ranked every
    // class with a per-class row_number window — a single task per
    // class scanning corpus/|langs| rows at scale; this shape has no
    // window at all. Exact-k per class, when required, is
    // ScaleOps.topKPerKey on the same hash order.
    Spec("q_balance_classes",
      (s, dir) => {
        val B = 1000000L
        val bucket = conv(substring(md5(concat(lit("bal|"),
          col("doc_id").cast("string"))), 1, 15), 16, 10)
          .cast("long") % B
        val counts = t(s, dir, "documents")
          .groupBy(col("lang")).agg(count(lit(1)).as("n_class"))
        val target = counts.agg(min(col("n_class")).as("target"))
        t(s, dir, "documents")
          .join(broadcast(counts), "lang")
          .crossJoin(broadcast(target))
          .filter(bucket * col("n_class") < col("target") * B)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"),
            round(avg(col("n_chars")), 4).as("avg_chars"))
          .orderBy(col("lang"))
      },
      Some("""WITH counts AS (
               SELECT lang, count(*) AS n_class FROM documents GROUP BY lang),
             target AS (SELECT min(n_class) AS target FROM counts)
             SELECT d.lang, count(*) AS n_kept,
                    round(avg(d.n_chars), 4) AS avg_chars
             FROM documents d, counts c, target t
             WHERE d.lang = c.lang
               AND (CAST(('0x' || substr(md5('bal|' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000) * c.n_class
                   < t.target * 1000000
             GROUP BY d.lang ORDER BY d.lang""")),

    // Unigram corpus-frequency quality proxy (the KenLM-style score
    // without the LM): rare-garbage documents score low because their
    // tokens barely occur in the corpus. Two passes: corpus token
    // frequencies (one shuffle groupBy), then tokens ⋈ freq (a plain
    // shuffle equi-join on token — the frequency table grows with the
    // corpus, so neither side broadcasts) and a per-doc integer sum.
    // The score is ONE double division of exact longs
    // (Σ n_tok / (doc_len · T)) so it is bit-deterministic across
    // engines and shuffle orders — no float aggregation anywhere.
    Spec("q_text_commonness",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_tok"))
        val total = freq.agg(sum(col("n_tok")).as("T"))
        toks.join(freq, "tok")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_toks"), sum(col("n_tok")).as("freq_sum"))
          .crossJoin(broadcast(total))
          .select(col("doc_id"), col("n_toks"),
            (floor(col("freq_sum").cast("double")
              / (col("n_toks") * col("T")).cast("double") * 100000000) / 100000000)
              .as("commonness"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tk AS (
               SELECT doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents),
             freq AS (SELECT tok, count(*) AS n_tok FROM tk GROUP BY tok),
             total AS (SELECT CAST(sum(n_tok) AS BIGINT) AS T FROM freq),
             d AS (SELECT doc_id, count(*) AS n_toks,
                          CAST(sum(n_tok) AS BIGINT) AS freq_sum
                   FROM tk JOIN freq USING (tok) GROUP BY doc_id)
             SELECT doc_id, n_toks,
                    floor(CAST(freq_sum AS DOUBLE)
                          / CAST(n_toks * t.T AS DOUBLE) * 100000000) / 100000000
                      AS commonness
             FROM d CROSS JOIN total t ORDER BY doc_id""")),

    // Model-based quality filter: a linear classifier over the quality
    // features (token count, avg token length, stopword ratio, digit
    // ratio) with literal weights — the CCNet/fastText-style "learned
    // filter" step, scored entirely inside whole-stage codegen (the
    // stopword count is the native TokenInSetCountExpr). The squash is
    // the rational sigmoid z/(1+|z|), NOT exp-based: +,·,/,|·| are
    // IEEE-exact so both engines produce bit-identical scores, while
    // exp() differs in ULPs across libm implementations.
    Spec("q_quality_classifier",
      (s, dir) => qualityClassifier(spread(s, t(s, dir, "documents")))
        .orderBy(col("doc_id")),
      Some(s"""WITH x AS (
               SELECT doc_id,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 CAST(length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS no_space,
                 CAST(len(list_filter(string_split(text, ' '),
                   t -> list_contains(${listSql(StopWords)}, t))) AS BIGINT) AS stop_hits,
                 CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS BIGINT) AS digits,
                 CAST(length(text) AS BIGINT) AS n_chars_raw
               FROM documents),
             zz AS (
               SELECT doc_id,
                 -1.75 + CAST(n_tokens AS DOUBLE) / 64.0 * 0.8
                   + CAST(no_space AS DOUBLE) / n_tokens * 0.3
                   + CAST(stop_hits AS DOUBLE) / n_tokens * 2.0
                   - CAST(digits AS DOUBLE) / n_chars_raw * 3.0 AS z
               FROM x)
             SELECT doc_id,
                    floor((0.5 + 0.5 * (z / (1.0 + abs(z)))) * 1000000) / 1000000
                      AS score,
                    floor((0.5 + 0.5 * (z / (1.0 + abs(z)))) * 1000000) / 1000000
                      >= 0.5 AS keep
             FROM zz ORDER BY doc_id""")),

    // Source mixing to TARGET token proportions — the "data mixture"
    // step of a training pipeline (upweight curated languages/sources,
    // downsample the over-represented ones to a token budget). Given
    // target weights w_c and budget B = T/2 tokens, each class keeps
    // rate_c = min(1, w_c·B / toks_c) of its documents by the same
    // deterministic md5-threshold the balancer uses (the min(1, ·) cap
    // is implicit: bucket < 1e6 always, so rate ≥ 1 keeps everything —
    // exercised here by 'de', whose target exceeds its supply). Two
    // tiny broadcast aggregates; the corpus itself is filtered in one
    // map-only pass — no shuffle of document rows at any scale. All
    // threshold arithmetic is integer (exact cross-engine); the
    // comparison runs in decimal(38,0) (DuckDB: HUGEINT) because the
    // bucket·toks product passes 2^63 around ~4.6e12 tokens per
    // class — decimal keeps it integer-exact to 1e38, far past 100 TB.
    Spec("q_mix_sources",
      (s, dir) => {
        val bucket = conv(substring(md5(concat(lit("mix|"),
          col("doc_id").cast("string"))), 1, 15), 16, 10)
          .cast("long") % 1000000L
        val w = when(col("lang") === "en", 250L)
          .when(col("lang") === "de", 350L)
          .when(col("lang") === "es", 150L)
          .when(col("lang") === "fr", 150L)
          .otherwise(100L)
        val tok = size(split(col("text"), " ")).cast("long")
        val docs = t(s, dir, "documents")
        val counts = docs.groupBy(col("lang"))
          .agg(sum(tok).as("toks_lang"))
        val total = counts.agg(sum(col("toks_lang")).as("T"))
        docs.withColumn("tok", tok)
          .join(broadcast(counts), "lang")
          .crossJoin(broadcast(total))
          .filter(bucket.cast("decimal(38,0)") * 2L * col("toks_lang") <
            w * col("T").cast("decimal(38,0)") * 1000L)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"), sum(col("tok")).as("toks_kept"))
          .orderBy(col("lang"))
      },
      Some("""WITH tk AS (
               SELECT doc_id, lang,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
               FROM documents),
             counts AS (SELECT lang, sum(tok) AS toks_lang FROM tk GROUP BY lang),
             total AS (SELECT sum(toks_lang) AS T FROM counts)
             SELECT d.lang, count(*) AS n_kept,
                    CAST(sum(d.tok) AS BIGINT) AS toks_kept
             FROM tk d JOIN counts c ON d.lang = c.lang CROSS JOIN total t
             WHERE CAST((CAST(('0x' || substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000) AS HUGEINT) * 2 * c.toks_lang
                   < (CASE d.lang WHEN 'en' THEN 250 WHEN 'de' THEN 350
                                  WHEN 'es' THEN 150 WHEN 'fr' THEN 150
                                  ELSE 100 END) * CAST(t.T AS HUGEINT) * 1000
             GROUP BY d.lang ORDER BY d.lang""")),

    // Temperature-scaled source mixing (τ = 0.5) — the multilingual
    // sampling rule (weights ∝ p^τ flatten the source distribution so
    // low-resource classes are upsampled relative to their share;
    // τ = 0.5 is the published multilingual default). Unlike
    // q_mix_sources' LITERAL weights, the weights here derive from the
    // data: w_c = floor(sqrt(toks_c)·1000) — IEEE sqrt is correctly
    // rounded, so floor-scaling it to integer micros makes every
    // downstream product/compare integer-exact cross-engine (general
    // τ needs pow(), which is NOT correctly rounded — pinning τ = 0.5
    // is what keeps the rule oracle-replayable). keep iff
    // bucket·Σw·toks_c < B·w_c·1e6 with budget B = T/2 — same
    // deterministic md5-threshold machinery as the balancer. Two tiny
    // broadcast aggregates + one map-only corpus pass. The 4-factor
    // product bucket·sw·toks·2 passes 2^63 already at the 100× replica
    // (it overflowed there — caught by the r8 scale run), so the
    // comparison runs in decimal(38,0) (DuckDB: HUGEINT): still
    // integer-exact cross-engine, with headroom to 1e38.
    Spec("q_mix_temperature",
      (s, dir) => {
        val bucket = conv(substring(md5(concat(lit("mixt|"),
          col("doc_id").cast("string"))), 1, 15), 16, 10)
          .cast("long") % 1000000L
        val tok = size(split(col("text"), " ")).cast("long")
        val docs = t(s, dir, "documents")
        val counts = docs.groupBy(col("lang"))
          .agg(sum(tok).as("toks_lang"))
          .withColumn("w",
            floor(sqrt(col("toks_lang").cast("double")) * 1000).cast("long"))
        val scalars = counts.agg(sum(col("toks_lang")).as("T"),
          sum(col("w")).as("sw"))
        docs.withColumn("tok", tok)
          .join(broadcast(counts), "lang")
          .crossJoin(broadcast(scalars))
          .filter(bucket.cast("decimal(38,0)") * col("sw") *
              col("toks_lang") * 2L <
            col("T").cast("decimal(38,0)") * col("w") * 1000000L)
          .groupBy(col("lang"))
          .agg(max(col("w")).as("w"),
            count(lit(1)).as("n_kept"), sum(col("tok")).as("toks_kept"))
          .orderBy(col("lang"))
      },
      Some("""WITH tk AS (
               SELECT doc_id, lang,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
               FROM documents),
             counts AS (
               SELECT lang, CAST(sum(tok) AS BIGINT) AS toks_lang,
                      CAST(floor(sqrt(CAST(sum(tok) AS DOUBLE)) * 1000) AS BIGINT) AS w
               FROM tk GROUP BY lang),
             scalars AS (
               SELECT CAST(sum(toks_lang) AS BIGINT) AS T,
                      CAST(sum(w) AS BIGINT) AS sw
               FROM counts)
             SELECT d.lang, max(c.w) AS w, count(*) AS n_kept,
                    CAST(sum(d.tok) AS BIGINT) AS toks_kept
             FROM tk d JOIN counts c ON d.lang = c.lang CROSS JOIN scalars t
             WHERE CAST((CAST(('0x' || substr(md5('mixt|' || CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000) AS HUGEINT) * t.sw * c.toks_lang * 2
                   < CAST(t.T AS HUGEINT) * c.w * 1000000
             GROUP BY d.lang ORDER BY d.lang""")),

    // Exact-k deterministic sample per group — the complement of the
    // hash-threshold balancer when exactly k rows per class are
    // required: k smallest md5-order rows per lang through the native
    // TopKPerKey (map-side pruned; no per-class window). The oracle
    // replays it as the rank filter.
    Spec("q_sample_k_per_group",
      (s, dir) => {
        val hashOrd = md5(concat(lit("samp|"), col("doc_id").cast("string")))
        ScaleOps.topKPerKey(
            t(s, dir, "documents")
              .select(col("doc_id"), col("lang"), hashOrd.as("h")),
            Seq(col("lang")), Seq(col("h"), col("doc_id")), 3)
          .select(col("lang"), col("doc_id"))
          .orderBy(col("lang"), col("doc_id"))
      },
      Some("""WITH ranked AS (
               SELECT lang, doc_id,
                      row_number() OVER (PARTITION BY lang
                        ORDER BY md5('samp|' || CAST(doc_id AS VARCHAR)), doc_id)
                        AS rn
               FROM documents)
             SELECT lang, doc_id FROM ranked WHERE rn <= 3
             ORDER BY lang, doc_id""")),

    // Deterministic train/val/test split: content-hash modulo buckets —
    // reproducible on any engine, stable under corpus growth (a doc's
    // split never changes), the standard pattern for dataset splits.
    Spec("q_train_test_split",
      (s, dir) => {
        val bucket = conv(substring(md5(concat(lit("split|"),
          col("doc_id").cast("string"))), 1, 15), 16, 10)
          .cast("long") % 100
        t(s, dir, "documents")
          .select(col("doc_id"),
            when(bucket < 80, "train")
              .when(bucket < 90, "val")
              .otherwise("test").as("split"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("doc_id")).as("min_id"),
            round(avg(col("doc_id")), 4).as("avg_id"))
          .orderBy(col("split"))
      },
      Some("""WITH assigned AS (
               SELECT doc_id,
                      CASE WHEN CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 80 THEN 'train'
                           WHEN CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 90 THEN 'val'
                           ELSE 'test' END AS split
               FROM documents)
             SELECT split, count(*) AS n_docs, min(doc_id) AS min_id,
                    round(avg(doc_id), 4) AS avg_id
             FROM assigned GROUP BY split ORDER BY split""")),

    // PII-style redaction: regex masking of email-, phone-, and
    // id-shaped spans — the pre-training scrub pass. Row-local,
    // map-only; counts carried so the scrub is auditable. The
    // transform itself (redact below) is stateless, so it runs
    // unchanged under Structured Streaming — StreamingSpec proves
    // stream == batch on it.
    Spec("q_text_redact",
      (s, dir) => redact(t(s, dir, "documents")).orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                    regexp_replace(
                      regexp_replace(lower(text), '[a-z0-9.]+@[a-z0-9.]+',
                                     '<EMAIL>', 'g'),
                      '[0-9]{9,}', '<NUM>', 'g') AS redacted,
                    CAST(len(regexp_extract_all(lower(text),
                      '[a-z0-9.]+@[a-z0-9.]+')) AS BIGINT) AS n_emails,
                    CAST(len(regexp_extract_all(lower(text),
                      '[0-9]{9,}')) AS BIGINT) AS n_longnums
             FROM documents ORDER BY doc_id""")),

    // Sequence packing: assign documents to ~512-token training chunks
    // by cumulative token count in (lang, doc_id) order — the
    // deterministic variant of LM sample packing. Computed by the
    // two-pass distributed prefix sum (packSequences below) so no task
    // ever scans more than one doc_id shard; the result is the exact
    // global cumulative sum, so the single-window oracle replays it.
    Spec("q_pack_sequences",
      (s, dir) => packSequences(t(s, dir, "documents"), PackShardWidth),
      Some("""SELECT doc_id, lang,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                    (CAST(sum(len(string_split(text, ' ')))
                       OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) - 1) // 512 AS pack_id
             FROM documents ORDER BY doc_id""")),

    // Corpus bigram counts (LM-data staple): explode token bigrams,
    // count, keep the head of the distribution. Shuffles once on the
    // bigram; top-k via count-then-threshold keeps the oracle total.
    // Bigram construction is the native one-pass expression — the HOF
    // chain was the slowest line of the r2 bench.
    Spec("q_ngram_counts",
      (s, dir) => spread(s, t(s, dir, "documents"))
          .select(explode(bigramsFast(col("text"))).as("bigram"))
          .groupBy(col("bigram"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") >= 20)
          .orderBy(col("n").desc, col("bigram")),
      Some("""WITH b AS (
               SELECT unnest(list_transform(
                 generate_series(1, len(string_split(text, ' ')) - 1),
                 i -> concat_ws(' ', string_split(text, ' ')[i],
                                string_split(text, ' ')[i + 1]))) AS bigram
               FROM documents)
             SELECT bigram, count(*) AS n FROM b
             GROUP BY bigram HAVING count(*) >= 20
             ORDER BY n DESC, bigram""")),

    // Sliding-window chunking with overlap (RAG / context-window prep):
    // every 48-token stride starts a chunk of up to 64 tokens (16-token
    // overlap), so no boundary content is lost. chunk_idx derives from
    // the stride (start div 48) — no ordinal explode needed. Map-only;
    // at scale this is the pass that fans a corpus out to its
    // embedding-input rows.
    Spec("q_chunk_overlap",
      (s, dir) => {
        val toks = split(col("text"), " ")
        val chunk = slice(col("toks"), (col("start") + 1).cast("int"), lit(64))
        spread(s, t(s, dir, "documents"))
          .select(col("doc_id"), toks.as("toks"),
            size(toks).cast("long").as("n"))
          .select(col("doc_id"), col("toks"),
            explode(sequence(lit(0L), greatest(col("n") - 1, lit(0L)),
              lit(48L))).as("start"))
          .select(col("doc_id"),
            expr("start div 48").as("chunk_idx"),
            col("start"),
            size(chunk).cast("long").as("n_chunk_tokens"),
            md5(array_join(chunk, " ")).as("chunk_md5"))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""WITH d AS (
               SELECT doc_id, string_split(text, ' ') AS t,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n
               FROM documents),
             c AS (
               SELECT doc_id, t, n,
                      unnest(generate_series(0, greatest(n - 1, 0), 48)) AS start
               FROM d)
             SELECT doc_id, start // 48 AS chunk_idx, start,
                    CAST(len(t[start + 1 : least(start + 64, n)]) AS BIGINT)
                      AS n_chunk_tokens,
                    md5(array_to_string(t[start + 1 : least(start + 64, n)], ' '))
                      AS chunk_md5
             FROM c ORDER BY doc_id, chunk_idx""")),

    // Repetition-ratio quality filter (the Gopher-style "fraction of
    // duplicated n-grams" rule): 1 − distinct/total bigrams per doc,
    // flagged above a threshold. Row-local, map-only at any scale;
    // bigrams come from the native one-pass expression.
    Spec("q_text_repetition",
      (s, dir) => {
        val bg = bigramsFast(col("text"))
        spread(s, t(s, dir, "documents"))
          .select(col("doc_id"),
            size(bg).cast("long").as("n_bigrams"),
            size(array_distinct(bg)).cast("long").as("n_distinct"))
          .withColumn("rep_ratio",
            when(col("n_bigrams") === 0, lit(0.0))
              .otherwise(floor((lit(1.0) -
                col("n_distinct").cast("double") / col("n_bigrams")) * 10000)
                / 10000))
          .withColumn("is_repetitive", col("rep_ratio") > 0.2)
          .orderBy(col("doc_id"))
      },
      Some("""WITH b AS (
               SELECT doc_id,
                      list_transform(
                        generate_series(1, greatest(len(string_split(text, ' ')) - 1, 0)),
                        i -> concat_ws(' ', string_split(text, ' ')[i],
                                       string_split(text, ' ')[i + 1])) AS bg
               FROM documents),
             x AS (
               SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_bigrams,
                      CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct
               FROM b)
             SELECT doc_id, n_bigrams, n_distinct,
                    CASE WHEN n_bigrams = 0 THEN 0.0
                         ELSE floor((1.0 - CAST(n_distinct AS DOUBLE) / n_bigrams)
                                    * 10000) / 10000 END AS rep_ratio,
                    (CASE WHEN n_bigrams = 0 THEN 0.0
                          ELSE floor((1.0 - CAST(n_distinct AS DOUBLE) / n_bigrams)
                                     * 10000) / 10000 END) > 0.2 AS is_repetitive
             FROM x ORDER BY doc_id""")),

    // Fingerprinting: whole-doc md5 + winnowing rolling min-hash over
    // character 8-grams (engine-replayable — md5 + substr only). The
    // rolling min runs through the native expression; the declarative
    // HOF form is the parity-tested reference.
    Spec("q_text_fingerprint",
      (s, dir) => spread(s, t(s, dir, "documents"))
        .select(col("doc_id"),
          fingerprint(col("text")).as("fp"),
          rollingMinFingerprintFast(col("text"), 8).as("winnow_fp"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, md5(text) AS fp,
                    list_min(list_transform(
                      generate_series(1, greatest(length(text) - 7, 1)),
                      i -> md5(substr(text, i, 8)))) AS winnow_fp
             FROM documents ORDER BY doc_id""")),

    // Cross-document boilerplate scrub (the C4/CCNet "remove lines
    // duplicated across documents" pass): segment every doc, count
    // each segment's distinct-document frequency corpus-wide, drop
    // segments shared by more than `ScrubDfCap` docs, and reassemble
    // the survivors in original order. The corpus has no newlines, so
    // the segmentation unit is a deterministic 4-token block — on real
    // web text the splitter is `split(text, '\n')` and everything else
    // is unchanged. 100 TB: the df shuffle ships (16 B digest, doc_id)
    // pairs, never segment text; the join back is a plain equi-join on
    // the digest whose key cardinality grows with the corpus; the
    // reassembly is one aggregate on doc_id. Per-doc audit counts ride
    // the same aggregate.
    Spec("q_text_scrub_boilerplate",
      (s, dir) => scrubBoilerplate(
        spread(s, t(s, dir, "documents")), ScrubSegTokens, ScrubDfCap)
        .orderBy(col("doc_id")),
      Some(s"""WITH toks AS (
                 SELECT doc_id, string_split(text, ' ') AS t FROM documents),
               segs AS (
                 SELECT doc_id, i AS seg_idx,
                        array_to_string(
                          t[(i*$ScrubSegTokens+1):(i*$ScrubSegTokens+$ScrubSegTokens)],
                          ' ') AS seg
                 FROM toks,
                      UNNEST(range(0, CAST(ceil(len(t)/$ScrubSegTokens.0) AS BIGINT))) AS u(i)),
               seg_df AS (
                 SELECT md5(seg) AS dg, COUNT(DISTINCT doc_id) AS df
                 FROM segs GROUP BY 1),
               j AS (
                 SELECT s.doc_id, s.seg_idx, s.seg, f.df
                 FROM segs s JOIN seg_df f ON md5(s.seg) = f.dg)
               SELECT doc_id,
                      COALESCE(array_to_string(list_transform(
                        list_sort(list({'seg_idx': seg_idx, 'seg': seg})
                                  FILTER (df <= $ScrubDfCap)),
                        x -> x.seg), ' '), '') AS text_clean,
                      COUNT(*) FILTER (df <= $ScrubDfCap) AS n_kept,
                      COUNT(*) AS n_total
               FROM j GROUP BY doc_id ORDER BY doc_id""")),

    // Incremental scrub: every 5th doc is the arriving batch, the rest
    // are the corpus whose segment-df index is the maintained state.
    // Batch segments the corpus already carries (df > cap) are
    // boilerplate and dropped; corpus-unseen segments survive (df = 0
    // through the left join). dfCap = 0 here: ANY corpus occurrence
    // marks a batch segment as boilerplate — the natural policy when
    // the index aggregates the full history.
    Spec("q_text_scrub_incremental",
      (s, dir) => {
        val docs = spread(s, t(s, dir, "documents"))
        scrubIncremental(
          docs.filter(col("doc_id") % 5 === 0),
          docs.filter(col("doc_id") % 5 =!= 0),
          ScrubSegTokens, 0L)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (
                 SELECT doc_id, string_split(text, ' ') AS t FROM documents),
               segs AS (
                 SELECT doc_id, i AS seg_idx,
                        array_to_string(
                          t[(i*$ScrubSegTokens+1):(i*$ScrubSegTokens+$ScrubSegTokens)],
                          ' ') AS seg
                 FROM toks,
                      UNNEST(range(0, CAST(ceil(len(t)/$ScrubSegTokens.0) AS BIGINT))) AS u(i)),
               corpus_df AS (
                 SELECT md5(seg) AS dg, COUNT(DISTINCT doc_id) AS df
                 FROM segs WHERE doc_id % 5 <> 0 GROUP BY 1),
               j AS (
                 SELECT s.doc_id, s.seg_idx, s.seg, COALESCE(f.df, 0) AS df
                 FROM segs s LEFT JOIN corpus_df f ON md5(s.seg) = f.dg
                 WHERE s.doc_id % 5 = 0)
               SELECT doc_id,
                      COALESCE(array_to_string(list_transform(
                        list_sort(list({'seg_idx': seg_idx, 'seg': seg})
                                  FILTER (df <= 0)),
                        x -> x.seg), ' '), '') AS text_clean,
                      COUNT(*) FILTER (df <= 0) AS n_kept,
                      COUNT(*) AS n_total
               FROM j GROUP BY doc_id ORDER BY doc_id""")),

    // DELETE path for the maintained segment-df index (VERDICT r16
    // missing #2 — the third and last incremental index gains its
    // delete dual; ANN = q_ann_delete, prefix = q_dedup_prefix_delete).
    // The scrub state is a COUNT, so deletion is a DECREMENT, not an
    // anti-join: one distinct-doc segment pass over the retracted docs
    // only (ids 80–129, the same retracted-crawl range as the other
    // delete gates — their segments are sole corpus carriers for
    // batch segments at every gate SF, so dropped segments genuinely
    // come back). The oracle rebuilds df over corpus ∖ deleted from
    // scratch — a hash match proves decrement == rebuild.
    Spec("q_text_scrub_delete",
      (s, dir) => {
        val docs = spread(s, t(s, dir, "documents"))
        val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        scrubIncremental(
          docs.filter(col("doc_id") % 5 === 0),
          corpus,
          ScrubSegTokens, 0L,
          deletedDocs = Some(corpus.filter(
            col("doc_id") >= 80 && col("doc_id") < 130)))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH toks AS (
                 SELECT doc_id, string_split(text, ' ') AS t FROM documents),
               segs AS (
                 SELECT doc_id, i AS seg_idx,
                        array_to_string(
                          t[(i*$ScrubSegTokens+1):(i*$ScrubSegTokens+$ScrubSegTokens)],
                          ' ') AS seg
                 FROM toks,
                      UNNEST(range(0, CAST(ceil(len(t)/$ScrubSegTokens.0) AS BIGINT))) AS u(i)),
               -- FULL REBUILD over the surviving corpus: a deleted doc
               -- no longer contributes df — a hash match with the
               -- Spark side's decremented index proves the equality
               corpus_df AS (
                 SELECT md5(seg) AS dg, COUNT(DISTINCT doc_id) AS df
                 FROM segs
                 WHERE doc_id % 5 <> 0
                   AND NOT (doc_id >= 80 AND doc_id < 130)
                 GROUP BY 1),
               j AS (
                 SELECT s.doc_id, s.seg_idx, s.seg, COALESCE(f.df, 0) AS df
                 FROM segs s LEFT JOIN corpus_df f ON md5(s.seg) = f.dg
                 WHERE s.doc_id % 5 = 0)
               SELECT doc_id,
                      COALESCE(array_to_string(list_transform(
                        list_sort(list({'seg_idx': seg_idx, 'seg': seg})
                                  FILTER (df <= 0)),
                        x -> x.seg), ' '), '') AS text_clean,
                      COUNT(*) FILTER (df <= 0) AS n_kept,
                      COUNT(*) AS n_total
               FROM j GROUP BY doc_id ORDER BY doc_id""")),

    // Gopher-style repetition/quality rule battery (WITHIN-document —
    // the complement of the cross-document scrub above): per doc,
    //   (1) duplicate-block token fraction — tokens inside 2-token
    //       blocks that occur more than once in the SAME doc (the
    //       duplicate-line-fraction rule; this corpus is newline-free
    //       so the line unit is a fixed token block),
    //   (2) top-bigram fraction — share of bigram positions occupied
    //       by the doc's most frequent bigram (the top-n-gram rule),
    //   (3) mean word length in [3, 10] (Gopher's real bound), and
    //   (4) a minimum token count.
    // All ratios are floor-scaled integer millionths (ppm) so both
    // engines agree bit-for-bit; `keep` ANDs the four rules. The
    // caps sit inside this corpus's observed distribution so both
    // branches are exercised (245/500 keep at sf0.01).
    // 100 TB: base metrics are map-only; the two repetition legs
    // shuffle (doc_id, 16 B digest) pairs — never text — and
    // aggregate back to one row per doc keyed by doc_id, so reducer
    // work is bounded by document length, not corpus size.
    Spec("q_gopher_rules",
      (s, dir) => gopherRules(spread(s, t(s, dir, "documents")))
        .orderBy(col("doc_id")),
      Some(gopherOracleSql))
  )

  /** The q_gopher_rules oracle, factored out so `q_curation_funnel`
    * can embed it as a subquery. */
  private lazy val gopherOracleSql: String =
    s"""WITH toks AS (
                 SELECT doc_id, string_split(text, ' ') AS t,
                        length(text) AS L
                 FROM documents),
               base AS (
                 SELECT doc_id, len(t) AS n_tokens,
                        (L - len(t) + 1) AS sum_wlen
                 FROM toks),
               segs AS (
                 SELECT doc_id,
                        md5(array_to_string(
                          t[(i*$GopherBlockTokens+1):(i*$GopherBlockTokens+$GopherBlockTokens)],
                          ' ')) AS dg,
                        len(t[(i*$GopherBlockTokens+1):(i*$GopherBlockTokens+$GopherBlockTokens)]) AS st
                 FROM toks,
                      UNNEST(range(0, CAST(ceil(len(t)/$GopherBlockTokens.0) AS BIGINT))) AS u(i)),
               g AS (
                 SELECT doc_id, dg, count(*) AS c, max(st) AS st
                 FROM segs GROUP BY 1, 2),
               dup AS (
                 SELECT doc_id,
                        CAST(COALESCE(sum(CASE WHEN c > 1 THEN c*st END), 0) AS BIGINT)
                          AS dup_tokens
                 FROM g GROUP BY 1),
               bg AS (
                 SELECT doc_id, md5(t[i] || ' ' || t[i+1]) AS bh
                 FROM toks, UNNEST(range(1, len(t))) AS u(i)),
               bc AS (SELECT doc_id, bh, count(*) AS c FROM bg GROUP BY 1, 2),
               top AS (
                 SELECT doc_id, CAST(max(c) AS BIGINT) AS top_c,
                        CAST(sum(c) AS BIGINT) AS n_bg
                 FROM bc GROUP BY 1),
               m AS (
                 SELECT b.doc_id, b.n_tokens,
                        b.sum_wlen * 1000000 // b.n_tokens AS mean_wlen_ppm,
                        COALESCE(d.dup_tokens, 0) * 1000000 // b.n_tokens
                          AS dup_block_ppm,
                        COALESCE(tp.top_c, 0) * 1000000
                          // greatest(COALESCE(tp.n_bg, 0), 1) AS top_bigram_ppm
                 FROM base b
                 LEFT JOIN dup d USING (doc_id)
                 LEFT JOIN top tp USING (doc_id))
               SELECT doc_id, n_tokens, mean_wlen_ppm, dup_block_ppm,
                      top_bigram_ppm,
                      (n_tokens >= $GopherMinTokens
                       AND mean_wlen_ppm BETWEEN $GopherMeanWlenLoPpm AND $GopherMeanWlenHiPpm
                       AND dup_block_ppm <= $GopherDupBlockCapPpm
                       AND top_bigram_ppm <= $GopherTopBigramCapPpm) AS keep
               FROM m ORDER BY doc_id"""

  /** LM-perplexity filter thresholds (natural-log nats per token) for
    * the head/middle/tail bucketing — the CCNet split points, pinned to
    * the scored distribution's quartile region so all three tiers are
    * populated at every SF. Tiers are derived from the FLOORED score,
    * so both engines bucket from the identical grid value. */
  private[operators] val PplHeadMax = 3.40
  private[operators] val PplMiddleMax = 3.41

  /** CCNet-style perplexity filter: train a unigram LM on a held-out
    * document split, score every other document by average negative
    * log-likelihood per token, and bucket into head/middle/tail —
    * the classic "keep what looks like reference text" curation pass
    * (CCNet trains KenLM on Wikipedia; the unigram model is the same
    * pipeline shape without the external corpus).
    *
    * Train/score split is the engine-replayable md5 trick from
    * `q_train_test_split` (seeded "lm|"). Add-one smoothing:
    * p(tok) = (cnt + 1) / (T + V) with unseen tokens at cnt = 0, so
    * NLL(tok) = ln(T + V) − ln(cnt + 1) — all logs taken on exact
    * integers, summed per (doc, tok) with integer multiplicities
    * (ONE fused aggregate per doc, not one term per instance), and
    * floored to 1e−4 so ULP-level libm differences between engines
    * can never flip the hash.
    *
    * At 100 TB: the LM table is vocabulary-sized — bounded by the
    * tokenizer, not the corpus (CCNet's SentencePiece vocab is 64 k) —
    * so it BROADCASTS to the scoring join; the corpus-side explode
    * never shuffles document text, and the per-doc aggregate is the
    * only shuffle (doc_id keys, map-side combined). Scoring itself is
    * stateless given the broadcast LM, so it runs unchanged as a
    * stream-static join under Structured Streaming.
    */
  private def lmBucket(c: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit("lm|"), c.cast("string"))), 1, 15),
      16, 10).cast("long") % 100

  /** Unigram add-one LM from the md5-selected training half: per-token
    * counts plus the (T, V) normalizer scalars. */
  def trainUnigramLm(docs: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val freq = docs.where(lmBucket(col("doc_id")) < 50)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    (freq, freq.agg(sum(col("c")).as("T"), count(lit(1)).as("V")))
  }

  /** Score documents against a STATIC unigram LM — per-doc independent,
    * so it runs unchanged per micro-batch under `foreachBatch` for
    * incremental corpus scoring (StreamingSpec proves streamed==batch
    * bit-equal). */
  def scoreAgainstLm(docs: org.apache.spark.sql.DataFrame,
                     freq: org.apache.spark.sql.DataFrame,
                     scal: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val perDocTok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("m"))
    val scored = perDocTok
      .join(broadcast(freq), Seq("tok"), "left")
      .crossJoin(broadcast(scal))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_toks"),
        sum(col("m").cast("double") *
          (log(col("T").cast("double") + col("V").cast("double")) -
            log(coalesce(col("c"), lit(0L)).cast("double") + 1.0d)))
          .as("s"))
    val avg = floor(col("s") / col("n_toks").cast("double") * 10000) / 10000
    scored.select(col("doc_id"), col("n_toks"), avg.as("avg_nll"),
      when(avg < PplHeadMax, "head")
        .when(avg < PplMiddleMax, "middle")
        .otherwise("tail").as("tier"))
  }

  lazy val lmPerplexitySpec: Spec = {
    Spec("q_lm_perplexity",
      (s, dir) => {
        val docs = spread(s, t(s, dir, "documents"))
        val (freq, scal) = trainUnigramLm(docs)
        scoreAgainstLm(docs.where(lmBucket(col("doc_id")) >= 50), freq, scal)
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tk AS (
                 SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
               freq AS (
                 SELECT tok, COUNT(*) AS c FROM tk
                 WHERE CAST(('0x' || substr(md5('lm|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 50
                 GROUP BY tok),
               scal AS (SELECT CAST(SUM(c) AS BIGINT) AS T,
                               CAST(COUNT(*) AS BIGINT) AS V FROM freq),
               pdt AS (
                 SELECT doc_id, tok, COUNT(*) AS m FROM tk
                 WHERE CAST(('0x' || substr(md5('lm|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 >= 50
                 GROUP BY doc_id, tok),
               sc AS (
                 SELECT doc_id, CAST(SUM(m) AS BIGINT) AS n_toks,
                        SUM(CAST(m AS DOUBLE) *
                            (ln(CAST(s.T AS DOUBLE) + CAST(s.V AS DOUBLE)) -
                             ln(CAST(COALESCE(f.c, 0) AS DOUBLE) + 1.0))) AS s
                 FROM pdt LEFT JOIN freq f USING (tok) CROSS JOIN scal s
                 GROUP BY doc_id),
               fin AS (
                 SELECT doc_id, n_toks,
                        floor(s / CAST(n_toks AS DOUBLE) * 10000) / 10000 AS avg_nll
                 FROM sc)
               SELECT doc_id, n_toks, avg_nll,
                      CASE WHEN avg_nll < $PplHeadMax THEN 'head'
                           WHEN avg_nll < $PplMiddleMax THEN 'middle'
                           ELSE 'tail' END AS tier
               FROM fin ORDER BY doc_id"""))
  }

  /** Corpus-scale BPE pair counting — the tokenizer-TRAINING station
    * (Sennrich et al. 2016): weight each distinct word by its corpus
    * frequency, append the end-of-word marker '»', and count adjacent
    * symbol pairs; the arg-max pair is the next BPE merge.
    *
    * The design hallmark (and why this scales): the corpus-sized work
    * is ONE token count (one shuffle, map-side combined) producing the
    * vocabulary-BOUNDED word-frequency table; pair extraction and
    * counting then run over the vocab × word-length rows — independent
    * of corpus size. The iterative merge loop (apply merge, recount)
    * mutates only that tiny weighted table, which is why real BPE
    * trainers run it driver-side after exactly this distributed first
    * count; the gate row therefore checks the corpus-scale step, top-20
    * pairs in (count desc, pair) order.
    */
  /** Merges to run in [[bpeMergesSpec]] — small fixed budget so the
    * gate is cheap and the DuckDB oracle can unroll the loop
    * (VERDICT r15 #7: the lm_perplexity unrolled-replay precedent). */
  val BpeMergeBudget = 6

  /** The BPE merge LOOP (Sennrich et al. 2016 §3.2) — the iterative
    * half [[bpePairsSpec]] only arg-maxes once: count weighted
    * adjacent symbol pairs, merge the (count desc, pair asc) arg-max
    * everywhere, recount, `BpeMergeBudget` times. Output = the merge
    * table a tokenizer trainer ships (rank, pair, merged symbol,
    * weighted count at merge time).
    *
    * Scale shape (the q_bpe_pairs docstring's claim, now implemented):
    * the corpus-sized work is ONE token count producing the
    * vocabulary-BOUNDED (word, frequency) table, localCheckpoint'd so
    * the loop never re-touches the corpus; each iteration is one
    * vocab-sized aggregate plus a map-only re-segmentation. The
    * arg-max pair is driver state (one row per iteration — the
    * lloydTrain contract), and the merge decision is inherently
    * sequential, so a driver loop IS the distributed algorithm here.
    *
    * Segmentations are strings, not arrays: symbols joined by a
    * DOUBLE separator with single-separator end anchors
    * (`§a§§b§§»§`) so one non-overlapping left-to-right
    * `replace(seg, '§l§§r§', '§lr§')` — identical semantics in Spark's
    * UTF8String.replace and DuckDB's replace — applies a merge at
    * every occurrence in one pass: the pattern's anchors make partial-
    * symbol matches impossible (symbols are §-free by invariant), and
    * consecutive occurrences regenerate the shared boundary because
    * the match consumes only the first § of the inter-symbol pair.
    * Greedy self-pair runs (`aaa` → `aa,a`) fall out of the same
    * scan order, matching the reference BPE left-to-right merge. The
    * corpus is ASCII (no `§`/`»` collisions; empty tokens filtered on
    * both sides). */
  lazy val bpeMergesSpec: Spec = Spec("q_bpe_merges",
    (s, dir) => {
      val S = "§" // §
      val seg0 = spread(s, t(s, dir, "documents"))
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(count(lit(1)).as("wc"))
        .select(
          concat(
            // regexp_replace yields '§§a§§b§§»'; dropping the first
            // char leaves the single lead anchor '§a§§b§§»'
            expr(s"substring(regexp_replace(concat(tok, '»'), '(.)', '$S$S$$1'), 2)")
              .as("segBody"),
            lit(S)).as("seg"),
          col("wc"))
      // the ONE corpus pass; the loop below runs over this vocab-
      // bounded table only
      var seg = seg0.localCheckpoint()
      val merges = scala.collection.mutable.Buffer.empty[(Long, String, String, Long)]
      for (k <- 1 to BpeMergeBudget) {
        val syms = seg
          .select(split(expr("substring(seg, 2, length(seg) - 2)"), S + S).as("syms"),
            col("wc"))
          .filter(size(col("syms")) >= 2)
        val best = syms
          .select(col("wc"), explode(transform(
            sequence(lit(1), size(col("syms")) - 1),
            i => struct(element_at(col("syms"), i).as("l"),
              element_at(col("syms"), i + 1).as("r")))).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("wc")).as("n"))
          .orderBy(col("n").desc, col("l"), col("r"))
          .limit(1).head()
        val (l, r, n) = (best.getString(0), best.getString(1), best.getLong(2))
        merges += ((k.toLong, l, r, n))
        seg = seg.withColumn("seg",
          call_function("replace", col("seg"),
            lit(S + l + S + S + r + S), lit(S + l + r + S)))
          .localCheckpoint()
      }
      import s.implicits._
      merges.toSeq.toDF("rank", "l", "r", "n")
        .select(col("rank"), col("l").as("left_sym"), col("r").as("right_sym"),
          concat(col("l"), col("r")).as("merged"), col("n"))
        .orderBy(col("rank"))
    },
    Some {
      val iterCtes = (1 to BpeMergeBudget).map { k =>
        s"""p$k AS (
             SELECT syms[CAST(i AS INT)] AS l, syms[CAST(i AS INT)+1] AS r, wc
             FROM (SELECT string_split(substr(seg, 2, length(seg)-2), '§§') AS syms,
                          wc FROM s${k - 1}) t,
                  UNNEST(range(1, len(syms))) AS u(i)
             WHERE len(syms) >= 2),
           b$k AS (SELECT l, r, CAST(SUM(wc) AS BIGINT) AS n FROM p$k
                   GROUP BY l, r ORDER BY n DESC, l, r LIMIT 1),
           s$k AS (SELECT replace(seg, '§' || b.l || '§§' || b.r || '§',
                                  '§' || b.l || b.r || '§') AS seg, wc
                   FROM s${k - 1}, b$k b)"""
      }.mkString(",\n")
      val unioned = (1 to BpeMergeBudget).map { k =>
        s"""SELECT CAST($k AS BIGINT) AS rank, l AS left_sym, r AS right_sym,
                   l || r AS merged, n FROM b$k"""
      }.mkString(" UNION ALL ")
      s"""WITH w AS (
             SELECT tok, COUNT(*) AS wc FROM
               (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
             WHERE tok <> '' GROUP BY tok),
           s0 AS (SELECT substr(regexp_replace(tok || '»', '(.)', '§§\\1', 'g'), 2)
                    || '§' AS seg, wc FROM w),
           $iterCtes
           SELECT * FROM ($unioned) ORDER BY rank"""
    })

  lazy val bpePairsSpec: Spec = Spec("q_bpe_pairs",
    (s, dir) => {
      val w = spread(s, t(s, dir, "documents"))
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("wc"))
      val pairs = w
        .select(concat(col("tok"), lit("»")).as("mw"), col("wc"))
        .select(col("mw"), col("wc"),
          explode(sequence(lit(1), length(col("mw")) - 1)).as("i"))
        .select(expr("substring(mw, i, 2)").as("pair"), col("wc"))
      pairs.groupBy(col("pair")).agg(sum(col("wc")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(20)
    },
    Some("""WITH w AS (
               SELECT tok, COUNT(*) AS wc FROM
                 (SELECT unnest(string_split(text, ' ')) AS tok
                  FROM documents)
               GROUP BY tok),
             m AS (SELECT tok || '»' AS mw, wc FROM w),
             pr AS (SELECT substr(mw, CAST(i AS INT), 2) AS pair, wc
                    FROM m, UNNEST(range(1, len(mw))) AS u(i)),
             agg AS (SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
                     FROM pr GROUP BY pair)
             SELECT pair, n FROM agg
             ORDER BY n DESC, pair LIMIT 20"""))

  /** The composed curation funnel — the C4/CCNet/Gopher pipeline order
    * run end-to-end with per-stage survivor counts: corpus → Gopher
    * repetition rules → LM perplexity (drop the tail tier, scored
    * against the md5-train-half unigram LM) → exact dedup (md5 keeper).
    * The audit row every production curation run ships with: each
    * stage's count tells you WHERE the corpus went.
    *
    * Stages compose as doc_id semi-joins over the already-gated
    * operators (`gopherRules`, `scoreAgainstLm`, the md5 keeper), so
    * this row gates the COMPOSITION, not new logic; the oracle embeds
    * the factored q_gopher_rules SQL as a subquery and replays the
    * same chain as set intersections. At 100 TB each stage's id-set is
    * corpus-sized: the semi-joins shuffle only ids, and a real run
    * would persist each stage's survivor set instead of re-deriving
    * the chain per stage the way this 4-count audit does.
    */
  lazy val curationFunnelSpec: Spec = Spec("q_curation_funnel",
    (s, dir) => {
      val docs = spread(s, t(s, dir, "documents"))
      val s1 = gopherRules(docs).where(col("keep")).select(col("doc_id"))
      val (freq, scal) = trainUnigramLm(docs)
      val pplOk = scoreAgainstLm(docs, freq, scal)
        .where(col("tier") =!= "tail").select(col("doc_id"))
      val keeper = docs.groupBy(md5(col("text")).as("dg"))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
      val s2 = s1.join(pplOk, Seq("doc_id"), "left_semi")
      val s3 = s2.join(keeper, Seq("doc_id"), "left_semi")
      def stage(ord: Int, name: String,
                df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n_docs"))
          .select(lit(ord).as("ord"), lit(name).as("stage"), col("n_docs"))
      stage(0, "corpus", docs)
        .union(stage(1, "gopher", s1))
        .union(stage(2, "perplexity", s2))
        .union(stage(3, "exact_dedup", s3))
        .orderBy(col("ord"))
    },
    Some(s"""WITH gph AS (
               SELECT doc_id FROM ($gopherOracleSql) WHERE keep),
             tk2 AS (
               SELECT doc_id, unnest(string_split(text, ' ')) AS tok
               FROM documents),
             freq2 AS (
               SELECT tok, COUNT(*) AS c FROM tk2
               WHERE CAST(('0x' || substr(md5('lm|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 50
               GROUP BY tok),
             scal2 AS (SELECT CAST(SUM(c) AS BIGINT) AS T,
                              CAST(COUNT(*) AS BIGINT) AS V FROM freq2),
             pdt2 AS (SELECT doc_id, tok, COUNT(*) AS m FROM tk2
                      GROUP BY doc_id, tok),
             sc2 AS (
               SELECT doc_id,
                      SUM(CAST(m AS DOUBLE) *
                          (ln(CAST(s.T AS DOUBLE) + CAST(s.V AS DOUBLE)) -
                           ln(CAST(COALESCE(f.c, 0) AS DOUBLE) + 1.0))) AS s,
                      CAST(SUM(m) AS BIGINT) AS n
               FROM pdt2 LEFT JOIN freq2 f USING (tok) CROSS JOIN scal2 s
               GROUP BY doc_id),
             ppl_ok AS (
               SELECT doc_id FROM sc2
               WHERE floor(s / CAST(n AS DOUBLE) * 10000) / 10000
                     < $PplMiddleMax),
             keeper AS (
               SELECT min(doc_id) AS doc_id FROM documents
               GROUP BY md5(text)),
             s2 AS (SELECT doc_id FROM gph
                    INTERSECT SELECT doc_id FROM ppl_ok),
             s3 AS (SELECT doc_id FROM s2
                    INTERSECT SELECT doc_id FROM keeper)
             SELECT * FROM (
               SELECT 0 AS ord, 'corpus' AS stage,
                      (SELECT COUNT(*) FROM documents) AS n_docs
               UNION ALL SELECT 1, 'gopher', (SELECT COUNT(*) FROM gph)
               UNION ALL SELECT 2, 'perplexity', (SELECT COUNT(*) FROM s2)
               UNION ALL SELECT 3, 'exact_dedup', (SELECT COUNT(*) FROM s3))
             ORDER BY ord"""))
}
