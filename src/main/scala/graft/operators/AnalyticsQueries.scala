package graft.operators

import org.apache.spark.sql.functions._

/** Event-analytics and feature-statistics operators — the product/BI
  * surface a warehouse user of the reference would run downstream of
  * ingest (the reference delegates this whole layer to BigQuery SQL,
  * `functions/load_query/main.py:57`; here each shape is a native
  * Spark plan with the scale design stated per operator).
  *
  * Cross-engine determinism rules follow the battery conventions:
  * time arithmetic is integer µs/days via the schema-adaptive
  * [[Q.tsUs]]/[[Q.tsDay]] accessors (events.ts may arrive as a nanos
  * Long via `nanosAsLong` or as parquet timestamp[us]), distinct
  * counting that must hash-match is exact, sketch paths are gated as
  * bounded-error booleans, and the χ² statistic is computed entirely
  * in DECIMAL(38,0)/HUGEINT integer arithmetic with ONE integral
  * division at the end — no float accumulation anywhere.
  */
object AnalyticsQueries {
  import Q._

  def specs: Seq[Spec] = Seq(

    // Unpivot / melt — the inverse of q_pivot: a wide per-key metrics
    // row becomes (key, metric, value) long form, the shape feeding
    // generic metric stores and plotting layers. Metrics are all
    // BIGINT so the melted `value` column needs no unifying float
    // cast (cross-engine FP identity for free). Map-only after the
    // one aggregate: Expand emits 3 rows per input row with no
    // shuffle of its own.
    Spec("q_unpivot",
      (s, dir) => {
        val m = t(s, dir, "customer")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_cust"),
            countDistinct(col("c_mktsegment")).as("n_seg"),
            max(col("c_custkey")).as("max_key"))
        m.unpivot(
            Array(col("c_nationkey")),
            Array(col("n_cust"), col("n_seg"), col("max_key")),
            "metric", "value")
          .orderBy(col("c_nationkey"), col("metric"))
      },
      Some("""WITH m AS (
               SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_cust,
                      CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_seg,
                      CAST(max(c_custkey) AS BIGINT) AS max_key
               FROM customer GROUP BY c_nationkey)
             SELECT c_nationkey, metric, value FROM (
               SELECT c_nationkey, 'n_cust' AS metric, n_cust AS value FROM m
               UNION ALL
               SELECT c_nationkey, 'n_seg', n_seg FROM m
               UNION ALL
               SELECT c_nationkey, 'max_key', max_key FROM m)
             ORDER BY c_nationkey, metric""")),

    // Ordered-step conversion funnel: signup → view → click → purchase,
    // each step's timestamp strictly after the previous step's. The
    // sequential dependency is resolved by STAGED per-user min
    // aggregates (stage k filters events against stage k−1's time and
    // takes the min) — every join and aggregate is keyed on user_id,
    // so AQE reuses one hash partitioning across the whole chain and
    // the per-stage state is one row per surviving user. The
    // collect-and-sort-per-user alternative holds a user's whole
    // event history in one task; this shape never does.
    Spec("q_event_funnel",
      (s, dir) => {
        val e0 = t(s, dir, "events")
        val e = e0.select(col("user_id"), col("event_type"),
          tsUs(e0).as("ts_us"))
        def stage(prev: org.apache.spark.sql.DataFrame, prevT: String,
                  typ: String, outT: String) =
          e.join(prev.select(col("user_id"), col(prevT)), "user_id")
            .filter(col("event_type") === typ && col("ts_us") > col(prevT))
            .groupBy(col("user_id")).agg(min(col("ts_us")).as(outT))
        val s1 = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts_us")).as("t_signup"))
        val s2 = stage(s1, "t_signup", "view", "t_view")
        val s3 = stage(s2, "t_view", "click", "t_click")
        val s4 = stage(s3, "t_click", "purchase", "t_purchase")
        s1.join(s2, Seq("user_id"), "left")
          .join(s3, Seq("user_id"), "left")
          .join(s4, Seq("user_id"), "left")
          .select(col("user_id"), col("t_signup"), col("t_view"),
            col("t_click"), col("t_purchase"),
            (lit(1L) + col("t_view").isNotNull.cast("long")
              + col("t_click").isNotNull.cast("long")
              + col("t_purchase").isNotNull.cast("long")).as("reached"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (
               SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
             s1 AS (SELECT user_id, min(ts_us) AS t_signup FROM e
                    WHERE event_type = 'signup' GROUP BY user_id),
             s2 AS (SELECT e.user_id, min(ts_us) AS t_view
                    FROM e JOIN s1 ON e.user_id = s1.user_id
                    WHERE event_type = 'view' AND ts_us > t_signup
                    GROUP BY e.user_id),
             s3 AS (SELECT e.user_id, min(ts_us) AS t_click
                    FROM e JOIN s2 ON e.user_id = s2.user_id
                    WHERE event_type = 'click' AND ts_us > t_view
                    GROUP BY e.user_id),
             s4 AS (SELECT e.user_id, min(ts_us) AS t_purchase
                    FROM e JOIN s3 ON e.user_id = s3.user_id
                    WHERE event_type = 'purchase' AND ts_us > t_click
                    GROUP BY e.user_id)
             SELECT s1.user_id, t_signup, t_view, t_click, t_purchase,
                    CAST(1 + (t_view IS NOT NULL)::INT
                           + (t_click IS NOT NULL)::INT
                           + (t_purchase IS NOT NULL)::INT AS BIGINT) AS reached
             FROM s1
             LEFT JOIN s2 ON s1.user_id = s2.user_id
             LEFT JOIN s3 ON s1.user_id = s3.user_id
             LEFT JOIN s4 ON s1.user_id = s4.user_id
             ORDER BY s1.user_id""")),

    // Cohort retention matrix: users are cohorted by the epoch WEEK of
    // their first activity; n_users(cohort, offset) counts members
    // active `offset` weeks later. All time math is integer epoch-day
    // floor division (`w = day div 7`) — no calendar functions, so the
    // two engines can't disagree on week boundaries. The (user, week)
    // distinct is the only corpus-sized shuffle; the cohort table is
    // one row per user and joins back on the same user_id hashing.
    Spec("q_cohort_retention",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val uw = ev
          .select(col("user_id"), (tsDay(ev) / 7).cast("long").as("w"))
          .distinct()
        val cohort = uw.groupBy(col("user_id"))
          .agg(min(col("w")).as("cohort_w"))
        uw.join(cohort, "user_id")
          .groupBy(col("cohort_w"), (col("w") - col("cohort_w")).as("week_offset"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("cohort_w"), col("week_offset"))
      },
      Some("""WITH uw AS (
               SELECT DISTINCT user_id,
                      epoch_us(ts) // 86400000000 // 7 AS w
               FROM events),
             c AS (SELECT user_id, min(w) AS cohort_w FROM uw GROUP BY user_id)
             SELECT cohort_w, w - cohort_w AS week_offset,
                    CAST(count(*) AS BIGINT) AS n_users
             FROM uw JOIN c USING (user_id)
             GROUP BY cohort_w, week_offset
             ORDER BY cohort_w, week_offset""")),

    // Rolling 7-day distinct users (WAU per day). Distinct counts
    // can't ride a RANGE window frame, so the scale-honest exact shape
    // is CONTRIBUTION EXPLODE: each distinct (user, day) feeds the ≤7
    // window-end days it is visible to, then one distinct + one count
    // per day — a bounded 7× row blowup of the already-deduplicated
    // (user, day) table (tiny vs raw events), all in hash aggregates.
    // The sketch alternative (per-day HLL + 7-way merge) is
    // q_hll_union's pattern; this one is the exact leg.
    Spec("q_rolling_distinct",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val ud = ev
          .select(col("user_id"), tsDay(ev).as("d")).distinct()
        val maxd = ud.agg(max(col("d")).as("max_d"))
        ud.select(col("user_id"),
            explode(sequence(col("d"), col("d") + 6)).as("wday"))
          .distinct()
          .crossJoin(broadcast(maxd))
          .filter(col("wday") <= col("max_d"))
          .groupBy(col("wday"))
          .agg(count(lit(1)).as("wau"))
          .orderBy(col("wday"))
      },
      Some("""WITH ud AS (
               SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS d
               FROM events),
             x AS (SELECT DISTINCT user_id, d + g AS wday
                   FROM ud CROSS JOIN
                     (SELECT unnest(generate_series(0, 6)) AS g)),
             m AS (SELECT max(d) AS max_d FROM ud)
             SELECT wday, CAST(count(*) AS BIGINT) AS wau
             FROM x, m WHERE wday <= max_d
             GROUP BY wday ORDER BY wday""")),

    // Pre-aggregated sketch tables — THE 100 TB distinct-count
    // pattern: build one HLL sketch per (event_type, day) partition
    // (the expensive corpus pass, done once), then answer "distinct
    // users over any day range" by MERGING sketches, never rescanning
    // rows. The gate materializes the daily sketch table, merges with
    // hll_union_agg, and verifies the estimate against the exact
    // distinct (|est − exact| ≤ 5 % · exact; HLL lgK=12 ⇒ ~1.6 %
    // relative sd) — the oracle replays exact + TRUE, as in
    // q_agg_approx_distinct.
    Spec("q_hll_union",
      (s, dir) => {
        val e = t(s, dir, "events")
        val daily = e.select(col("event_type"), tsDay(e).as("d"), col("user_id"))
          .groupBy(col("event_type"), col("d"))
          .agg(hll_sketch_agg(col("user_id")).as("sk"))
        val merged = daily.groupBy(col("event_type"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
        e.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("exact_users"))
          .join(merged, "event_type")
          .select(col("event_type"), col("exact_users"),
            (abs(col("est") - col("exact_users")).cast("double")
              / col("exact_users") <= 0.05).as("union_ok"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
                    CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
                    TRUE AS union_ok
             FROM events GROUP BY event_type ORDER BY event_type""")),

    // χ² token–class feature selection (the statistic behind
    // fastText-style quality-classifier feature pruning): for each
    // (lang, token), the 2×2 presence contingency
    //   A = class docs with token   B = other docs with token
    //   C = class docs without      D = other docs without
    // scores χ² = N(AD−BC)² / ((A+B)(C+D)(A+C)(B+D)). Computed
    // ENTIRELY in integer arithmetic — DECIMAL(38,0) on the Spark
    // side, HUGEINT in DuckDB, one integral division at the end,
    // emitted as floor(χ²·10⁴) — so the value is bit-identical
    // regardless of plan or aggregation order ((AD−BC)² alone
    // overflows BIGINT once doc counts pass ~1.5 B·density, hence the
    // wide intermediates). Corpus-sized work: one distinct over
    // (doc, token) digests and one (lang, tok) count; the class and
    // vocabulary margins are tiny and broadcast, and the full
    // class × vocab grid (so zero-support cells score too — a token
    // absent from a class is evidence) is vocab-bounded, not
    // corpus-bounded.
    Spec("q_chi_square",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
        val dt = docs
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("tok"))
          .distinct()
        val classTot = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_class"))
        val tokTot = dt.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        val aTab = dt.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("a_ct"))
        val total = docs.agg(count(lit(1)).as("n_total"))
        broadcast(classTot).crossJoin(tokTot)
          .join(aTab, Seq("lang", "tok"), "left")
          .na.fill(0L, Seq("a_ct"))
          .crossJoin(broadcast(total))
          .select(col("lang"), col("tok"), col("df"), col("a_ct"),
            (col("df") - col("a_ct")).as("b_ct"),
            (col("n_class") - col("a_ct")).as("c_ct"),
            (col("n_total") - col("n_class") - col("df") + col("a_ct")).as("d_ct"),
            col("n_class"), col("n_total"))
          .withColumn("chi2_x10k", expr(
            """CASE WHEN df = 0 OR df = n_total
                      OR n_class = 0 OR n_class = n_total THEN 0L
                    ELSE CAST(
                      (CAST(n_total AS DECIMAL(38,0))
                        * (CAST(a_ct AS DECIMAL(38,0)) * d_ct
                           - CAST(b_ct AS DECIMAL(38,0)) * c_ct)
                        * (CAST(a_ct AS DECIMAL(38,0)) * d_ct
                           - CAST(b_ct AS DECIMAL(38,0)) * c_ct)
                        * 10000)
                      div
                      (CAST(df AS DECIMAL(38,0)) * (n_total - df)
                        * n_class * (n_total - n_class))
                    AS BIGINT) END"""))
          .select(col("lang"), col("tok"), col("df"), col("a_ct"), col("chi2_x10k"))
          .orderBy(col("lang"), col("tok"))
      },
      Some("""WITH d AS (SELECT doc_id, lang, text FROM documents),
             dt AS (SELECT DISTINCT doc_id, lang,
                           unnest(string_split(text, ' ')) AS tok FROM d),
             ct AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_class
                    FROM d GROUP BY lang),
             tt AS (SELECT tok, CAST(count(*) AS BIGINT) AS df
                    FROM dt GROUP BY tok),
             at AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS a_ct
                    FROM dt GROUP BY lang, tok),
             tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM d),
             g AS (SELECT ct.lang, tt.tok, tt.df,
                          COALESCE(at.a_ct, 0) AS a_ct, ct.n_class, n_total
                   FROM ct CROSS JOIN tt
                   LEFT JOIN at ON ct.lang = at.lang AND tt.tok = at.tok
                   CROSS JOIN tot)
             SELECT lang, tok, df, a_ct,
                    CASE WHEN df = 0 OR df = n_total
                           OR n_class = 0 OR n_class = n_total
                         THEN CAST(0 AS BIGINT)
                    ELSE CAST(
                      (CAST(n_total AS HUGEINT)
                        * (CAST(a_ct AS HUGEINT)
                             * (n_total - n_class - df + a_ct)
                           - CAST(df - a_ct AS HUGEINT) * (n_class - a_ct))
                        * (CAST(a_ct AS HUGEINT)
                             * (n_total - n_class - df + a_ct)
                           - CAST(df - a_ct AS HUGEINT) * (n_class - a_ct))
                        * 10000)
                      //
                      (CAST(df AS HUGEINT) * (n_total - df)
                        * n_class * (n_total - n_class))
                    AS BIGINT) END AS chi2_x10k
             FROM g ORDER BY lang, tok""")),

    // Exact deterministic quantiles (ScaleOps.exactQuantiles, VERDICT
    // r10 #2): the adaptive-policy primitive — type-1 / inverse-CDF
    // semantics over a long column, result a function of the value
    // multiset alone (approxQuantile's GK sketch depends on partition
    // merge order, which is why the composed pipeline's quantile cut
    // was previously un-gateable). The oracle replays the definition
    // verbatim as a windowed cumulative sum over DuckDB's identical
    // IEEE arithmetic. n_chars is the same grid-bounded integer score
    // family the intended callers scale into.
    Spec("q_exact_quantile",
      (s, dir) => ScaleOps.exactQuantiles(
          t(s, dir, "documents").select(col("n_chars")),
          "n_chars", Seq(0.25, 0.5, 2.0 / 3.0, 0.9, 1.0))
        .orderBy(col("p")),
      Some("""WITH counts AS (
               SELECT CAST(n_chars AS BIGINT) AS v, count(*) AS cnt
               FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
             cum AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum
                     FROM counts),
             tot AS (SELECT sum(cnt) AS n FROM counts),
             ps AS (SELECT unnest([0.25, 0.5, 2.0/3.0, 0.9, 1.0]) AS p)
             SELECT p, min(v) AS value
             FROM cum, tot, ps
             WHERE cum >= CAST(ceiling(p * CAST(n AS DOUBLE)) AS BIGINT)
             GROUP BY p ORDER BY p""")),

    // Robust per-group outlier detection via median absolute deviation
    // — the outlier gate that, unlike the z-score (q_normalize_zscore),
    // a few extreme documents cannot drag: median and MAD have 50 %
    // breakdown points. Exact medians at gate scale (every arithmetic
    // step lands on the dyadic .25 grid, so the two engines' doubles
    // are bit-identical); the 100 TB path swaps approx_percentile into
    // the same two tiny per-group tables, both broadcast back —
    // corpus rows never shuffle.
    Spec("q_mad_outliers",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("n_chars"))
        val med = d.groupBy(col("lang"))
          .agg(expr("percentile(n_chars, 0.5D)").as("med"))
        val dev = d.join(broadcast(med), "lang")
          .withColumn("dev", abs(col("n_chars") - col("med")))
        val mad = dev.groupBy(col("lang"))
          .agg(expr("percentile(dev, 0.5D)").as("mad"))
        dev.join(broadcast(mad), "lang")
          .select(col("doc_id"), col("lang"), col("n_chars"),
            (col("dev") > lit(3.0) * lit(1.4826) * col("mad"))
              .as("is_outlier"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH m AS (SELECT lang, quantile_cont(n_chars, 0.5) AS med
                        FROM documents GROUP BY lang),
             d AS (SELECT doc_id, documents.lang, n_chars,
                          abs(n_chars - med) AS dev
                   FROM documents JOIN m ON documents.lang = m.lang),
             md AS (SELECT lang, quantile_cont(dev, 0.5) AS mad
                    FROM d GROUP BY lang)
             SELECT doc_id, d.lang, n_chars,
                    dev > 3.0 * 1.4826 * mad AS is_outlier
             FROM d JOIN md ON d.lang = md.lang ORDER BY doc_id""")),

    // Bigram lift (the monotone integer core of PMI): how much more
    // often a token pair co-occurs adjacently than independence
    // predicts — collocation mining / tokenizer-merge evidence over
    // the corpus. lift = P(ab) / (P(a)·P(b)) = c_ab·N² / (B·c_a·c_b),
    // emitted as floor(lift·10⁶) in DECIMAL(38,0)/HUGEINT arithmetic
    // (one integral division — PMI's log is monotone in this ratio, so
    // ranking/thresholding needs no float math at all). Corpus passes:
    // one token count + one native-bigram count; the unigram margin is
    // vocab-bounded and broadcast, totals are 1-row scalars.
    Spec("q_pmi_bigrams",
      (s, dir) => {
        import graft.functions.TextFunctions.bigramsFast
        val toks = spread(s, t(s, dir, "documents"))
          .select(explode(split(col("text"), " ")).as("tok"))
        val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c_tok"))
        val nTok = toks.agg(count(lit(1)).as("n_tok"))
        val bi = spread(s, t(s, dir, "documents"))
          .select(explode(bigramsFast(col("text"))).as("bigram"))
        val bcnt = bi.groupBy(col("bigram")).agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= 5)
        val nBi = bi.agg(count(lit(1)).as("n_bi"))
        bcnt
          .withColumn("tok_a", split(col("bigram"), " ").getItem(0))
          .withColumn("tok_b", split(col("bigram"), " ").getItem(1))
          .join(broadcast(uni.select(col("tok").as("tok_a"),
            col("c_tok").as("c_a"))), "tok_a")
          .join(broadcast(uni.select(col("tok").as("tok_b"),
            col("c_tok").as("c_b"))), "tok_b")
          .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBi))
          .withColumn("lift_ppm", expr(
            """CAST((CAST(c_ab AS DECIMAL(38,0)) * n_tok * n_tok * 1000000)
                   div (CAST(n_bi AS DECIMAL(38,0)) * c_a * c_b) AS BIGINT)"""))
          .select(col("tok_a"), col("tok_b"), col("c_ab"), col("lift_ppm"))
          .orderBy(col("tok_a"), col("tok_b"))
      },
      Some("""WITH tk AS (SELECT unnest(string_split(text, ' ')) AS tok
                         FROM documents),
             uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c_tok
                     FROM tk GROUP BY tok),
             nt AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM tk),
             b AS (SELECT unnest(list_transform(
                     generate_series(1, len(string_split(text, ' ')) - 1),
                     i -> concat_ws(' ', string_split(text, ' ')[i],
                                    string_split(text, ' ')[i + 1]))) AS bigram
                   FROM documents),
             bc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c_ab
                    FROM b GROUP BY bigram HAVING count(*) >= 5)
             SELECT string_split(bigram, ' ')[1] AS tok_a,
                    string_split(bigram, ' ')[2] AS tok_b, c_ab,
                    CAST((CAST(c_ab AS HUGEINT) * n_tok * n_tok * 1000000)
                         // (CAST((SELECT count(*) FROM b) AS HUGEINT)
                            * ua.c_tok * ub.c_tok) AS BIGINT) AS lift_ppm
             FROM bc CROSS JOIN nt
             JOIN uni ua ON ua.tok = string_split(bigram, ' ')[1]
             JOIN uni ub ON ub.tok = string_split(bigram, ' ')[2]
             ORDER BY tok_a, tok_b""")),

    // Join-preserving PII pseudonymization: user ids are replaced by a
    // salted-hash token that is DETERMINISTIC (the same user maps to
    // the same token in every table and every run, so joins and
    // distinct counts survive tokenization) and NON-REVERSIBLE without
    // the salt. Map-only — one codegen'd md5 per row, no shuffle; the
    // bijectivity property (|tokens| = |users|) is asserted in
    // AnalyticsSpec rather than burned into every gate row.
    Spec("q_pseudonymize",
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          md5(concat(lit("graft-pii-v1:"), col("user_id").cast("string")))
            .as("user_token"),
          col("event_type"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
                    md5('graft-pii-v1:' || CAST(user_id AS VARCHAR)) AS user_token,
                    event_type
             FROM events ORDER BY event_id""")))
}
