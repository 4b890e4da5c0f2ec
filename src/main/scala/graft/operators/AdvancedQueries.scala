package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Operators beyond the reference's delegated-SQL surface that a
  * large-scale event/training-data pipeline needs (SURVEY §2.9 spirit):
  * as-of join, sessionization, pivot, explode (UDTF analog), exact
  * percentiles, ordered collect, range join.
  *
  * Timestamps: every cross-engine comparison happens in integer epoch
  * µs via the schema-adaptive [[Q.tsUs]] accessor (events.ts may be
  * TIMESTAMP(NANOS) parquet read as a nanos Long under `nanosAsLong`,
  * or timestamp[us] parquet read as Timestamp/NTZ); DuckDB reads the
  * same column at µs precision (`epoch_us(ts)`).
  *
  * Scale notes: the as-of join is the union + last-non-null
  * carry-forward formulation — ONE shuffle on the key, a linear
  * per-partition scan, no per-row range probe and no candidate
  * explosion; sessionization is the classic gap-flag + running-sum pair
  * of windows over the same (user, ts) order — both windows share one
  * shuffle.
  */
object AdvancedQueries {
  import Q._

  val specs: Seq[Spec] = Seq(

    // Event-time tumbling-window aggregation in BATCH via the same
    // window() operator Structured Streaming uses (StreamingSpec proves
    // stream==batch for this shape); bucket start exported as epoch µs
    // so the cell is scalar and engine-neutral. window() is a plain
    // projection + hash aggregate — partial+final, one shuffle.
    Spec("q_time_window_agg",
      (s, dir) => {
        val ev = t(s, dir, "events")
        ev.withColumn("ets", timestamp_micros(tsUs(ev)))
        .groupBy(window(col("ets"), "6 hours"), col("event_type"))
        // sum in exact decimal, not double: double accumulation is
        // order-dependent, and partition layout changes the order —
        // the per-element decimal cast is deterministic, the decimal
        // sum is exact, so the rounded total is layout-proof
        // (InputOrderInvarianceSpec guards this class battery-wide)
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(20,10)")), 2)
            .cast("double").as("total"))
        .select(unix_micros(col("window.start")).as("bucket_us"),
          col("event_type"), col("n"), col("total"))
        .orderBy(col("bucket_us"), col("event_type"))
      },
      Some("""SELECT (epoch_us(ts) // 21600000000) * 21600000000 AS bucket_us,
                    event_type, count(*) AS n,
                    CAST(round(sum(CAST(value AS DECIMAL(20,10))), 2)
                         AS DOUBLE) AS total
             FROM events
             GROUP BY bucket_us, event_type
             ORDER BY bucket_us, event_type""")),

    // Upsert / MERGE overlay (SCD-style dim refresh): updates win over
    // the base by anti-join + union — the engine-agnostic MERGE
    // formulation (one shuffle on the key; at scale the base side
    // should be the bucketed table so the anti-join is shuffle-free).
    // Updates are derived deterministically so the oracle replays them.
    Spec("q_upsert_snapshot",
      (s, dir) => {
        val base = t(s, dir, "customer")
        val updates = base.filter(col("c_custkey") % 10 === 0)
          .withColumn("c_mktsegment", lit("RESEGMENTED"))
        val snapshot = base.join(updates.select(col("c_custkey").as("u_key")),
            col("c_custkey") === col("u_key"), "left_anti")
          .unionByName(updates)
        snapshot.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("c_acctbal")), 2).as("bal"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""WITH updates AS (
               SELECT c_custkey, c_name, c_nationkey, 'RESEGMENTED' AS c_mktsegment,
                      c_acctbal
               FROM customer WHERE c_custkey % 10 = 0),
             snapshot AS (
               SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
               WHERE c_custkey NOT IN (SELECT c_custkey FROM updates)
               UNION ALL
               SELECT c_custkey, c_mktsegment, c_acctbal FROM updates)
             SELECT c_mktsegment, count(*) AS n, round(sum(c_acctbal), 2) AS bal
             FROM snapshot GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Equi-width histogram: integer bucket arithmetic (exact on both
    // engines), one hash aggregate — the profiling primitive for any
    // numeric column at scale.
    Spec("q_histogram",
      (s, dir) => t(s, dir, "events")
        .select(floor(col("value") / 25.0).cast("long").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bucket")),
      Some("""SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket,
                    count(*) AS n
             FROM events GROUP BY bucket ORDER BY bucket""")),

    // Correlation / covariance aggregates per group. floor-at-1e-4
    // rather than round: the engines accumulate in different orders
    // and round-at-half is unstable on FP dust.
    Spec("q_agg_corr",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          (floor(corr(col("l_quantity"), col("l_extendedprice")) * 10000) / 10000)
            .as("qty_price_corr"),
          (floor(covar_samp(col("l_quantity"), col("l_discount")) * 10000) / 10000)
            .as("qty_disc_cov"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
                    floor(corr(l_quantity, l_extendedprice) * 10000) / 10000
                      AS qty_price_corr,
                    floor(covar_samp(l_quantity, l_discount) * 10000) / 10000
                      AS qty_disc_cov
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // As-of join: each click paired with the user's most recent
    // prior-or-equal signup.
    // As-of join through the reusable ScaleOps.asofJoin operator
    // (union + last-non-null carry-forward — one shuffle, linear scan;
    // randomized equivalence vs the direct max-≤ formulation in
    // ScaleOpsSpec). Inclusive: a signup at the click's exact ts
    // attaches.
    Spec("q_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), tsUs(ev).as("ts_us"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id").as("s_user"), tsUs(ev).as("s_ts"),
            tsUs(ev).as("signup_ts_us"))
        ScaleOps.asofJoin(clicks, signups,
            Seq("user_id"), Seq("s_user"), "ts_us", "s_ts",
            Seq("signup_ts_us"))
          .select(col("event_id"), col("user_id"), col("ts_us"),
            col("signup_ts_us"))
          .orderBy(col("event_id"))
      },
      Some("""WITH clicks AS (
               SELECT event_id, user_id, epoch_us(ts) AS ts_us
               FROM events WHERE event_type = 'click'),
             sign AS (
               SELECT user_id, epoch_us(ts) AS ts_us
               FROM events WHERE event_type = 'signup')
             SELECT c.event_id, c.user_id, c.ts_us, s.ts_us AS signup_ts_us
             FROM clicks c ASOF LEFT JOIN sign s
               ON c.user_id = s.user_id AND c.ts_us >= s.ts_us
             ORDER BY c.event_id""")),

    // CDC-style snapshot diff: classify every key of two table versions
    // as added / removed / changed / unchanged via ONE full-outer join
    // on the key — the change-detection primitive feeding incremental
    // refreshes (the MERGE upsert's read side). Versions are derived
    // deterministically from orders so both engines build identical
    // inputs.
    Spec("q_snapshot_diff",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val yesterday = o.filter(col("o_orderkey") % 10 =!= 0)
          .select(col("o_orderkey").as("k_old"),
            when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1)
              .otherwise(col("o_totalprice")).as("p_old"))
        val today = o.filter(col("o_orderkey") % 11 =!= 0)
          .select(col("o_orderkey").as("k_new"),
            col("o_totalprice").as("p_new"))
        today.join(yesterday, col("k_new") === col("k_old"), "full_outer")
          .select(
            when(col("k_old").isNull, "added")
              .when(col("k_new").isNull, "removed")
              .when(col("p_new") =!= col("p_old"), "changed")
              .otherwise("unchanged").as("status"))
          .groupBy(col("status")).agg(count(lit(1)).as("n"))
          .orderBy(col("status"))
      },
      Some("""WITH yesterday AS (
               SELECT o_orderkey AS k_old,
                      CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
                           ELSE o_totalprice END AS p_old
               FROM orders WHERE o_orderkey % 10 <> 0),
             today AS (
               SELECT o_orderkey AS k_new, o_totalprice AS p_new
               FROM orders WHERE o_orderkey % 11 <> 0),
             j AS (
               SELECT CASE WHEN k_old IS NULL THEN 'added'
                           WHEN k_new IS NULL THEN 'removed'
                           WHEN p_new <> p_old THEN 'changed'
                           ELSE 'unchanged' END AS status
               FROM today t FULL OUTER JOIN yesterday y ON t.k_new = y.k_old)
             SELECT status, count(*) AS n FROM j
             GROUP BY status ORDER BY status""")),

    // Time-series gap fill: regularize each user's event stream onto a
    // dense 6-hour-bucket grid (missing buckets → zero rows) — the
    // resample step before any rolling/ML feature computation. The grid
    // is generated per user from its own [min, max] span (sequence +
    // explode — no driver-side calendar), then left-joined back onto
    // the sparse aggregate. Shuffle keys are (user, bucket): scales
    // with users × span, never a cross join.
    Spec("q_gap_fill",
      (s, dir) => {
        val BucketUs = 6L * 3600 * 1000000
        val ev = t(s, dir, "events")
        val agg = ev
          .filter(col("user_id") < 50)
          .select(col("user_id"), tsUsDiv(ev, BucketUs).as("bucket"),
            col("value"))
          .groupBy(col("user_id"), col("bucket"))
          // exact decimal sum → integer cents: double accumulation is
          // order-dependent and input layout changes the order; cents
          // as a BIGINT divided by 100.0 is layout-proof on both engines
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(20,10)")).as("v"))
        val grid = agg.groupBy(col("user_id"))
          .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
          .select(col("user_id"), explode(sequence(col("b0"), col("b1"))).as("bucket"))
        grid.join(agg, Seq("user_id", "bucket"), "left")
          .select(col("user_id"), col("bucket"),
            coalesce(col("n"), lit(0L)).as("n_events"),
            (floor(coalesce(col("v"), lit(0)) * 100).cast("long") / 100.0)
              .as("total"))
          .orderBy(col("user_id"), col("bucket"))
      },
      Some("""WITH e AS (
               SELECT user_id, epoch_us(ts) // CAST(21600000000 AS BIGINT) AS bucket, value
               FROM events WHERE user_id < 50),
             a AS (
               SELECT user_id, bucket, count(*) AS n,
                      sum(CAST(value AS DECIMAL(20,10))) AS v
               FROM e GROUP BY user_id, bucket),
             s AS (
               SELECT user_id, min(bucket) AS b0, max(bucket) AS b1
               FROM a GROUP BY user_id),
             g AS (
               SELECT user_id, unnest(generate_series(b0, b1)) AS bucket FROM s)
             SELECT g.user_id, g.bucket,
                    coalesce(a.n, 0) AS n_events,
                    CAST(floor(coalesce(a.v, 0) * 100) AS BIGINT) / 100.0 AS total
             FROM g LEFT JOIN a USING (user_id, bucket)
             ORDER BY g.user_id, g.bucket""")),

    // RANGE window frame (value-based, not row-based): per-user rolling
    // 6-hour event total. RANGE includes ALL peers of the boundary
    // values, so the result is deterministic even when one user has
    // many events in the same hour — the property ROWS frames lack.
    Spec("q_window_range_frame",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("hr"))
          .rangeBetween(-6, 0)
        val ev = t(s, dir, "events")
        ev.filter(col("user_id") < 50)
          .select(col("event_id"), col("user_id"),
            tsUsDiv(ev, 3600000000L).as("hr"), col("value"))
          // exact decimal window sum → integer cents (order-free; the
          // frame's accumulation order follows input layout otherwise)
          .withColumn("rolling_6h",
            floor(sum(col("value").cast("decimal(20,10)")).over(w) * 100)
              .cast("long") / 100.0)
          .select(col("event_id"), col("user_id"), col("hr"), col("rolling_6h"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (
               SELECT event_id, user_id,
                      epoch_us(ts) // 3600000000 AS hr, value
               FROM events WHERE user_id < 50)
             SELECT event_id, user_id, hr,
                    CAST(floor(sum(CAST(value AS DECIMAL(20,10)))
                        OVER (PARTITION BY user_id ORDER BY hr
                        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) * 100)
                      AS BIGINT) / 100.0 AS rolling_6h
             FROM e ORDER BY event_id""")),

    // Sessionization: a new session starts after a >30 min gap; the
    // session id is the running count of gap flags.
    Spec("q_sessionize",
      (s, dir) => {
        val wOrder = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        val wRun = wOrder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ev = t(s, dir, "events")
        ev.select(col("event_id"), col("user_id"), tsUs(ev).as("ts_us"))
          .withColumn("gap",
            when(col("ts_us") - lag(col("ts_us"), 1).over(wOrder)
              > 30L * 60 * 1000000, 1L).otherwise(0L))
          .withColumn("session_id", sum(col("gap")).over(wRun))
          .select(col("event_id"), col("user_id"), col("session_id"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (
               SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events),
             g AS (
               SELECT event_id, user_id, ts_us,
                      CASE WHEN ts_us - lag(ts_us, 1) OVER w > 30 * 60 * 1000000
                           THEN 1 ELSE 0 END AS gap
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id))
             SELECT event_id, user_id,
                    CAST(sum(gap) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                      AS session_id
             FROM g ORDER BY event_id""")),

    // Pivot (wide aggregation): per-user event-type counts. The value
    // list is fixed so the output schema is static (the only sane form
    // at scale — a dynamic pivot needs a driver-side distinct first).
    Spec("q_pivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = t(s, dir, "events")
          .groupBy(col("user_id"))
          .pivot("event_type", types)
          .count()
        p.select(col("user_id") +: types.map(tp =>
            coalesce(col(tp), lit(0L)).as(tp)): _*)
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
                    count(*) FILTER (WHERE event_type = 'click') AS click,
                    count(*) FILTER (WHERE event_type = 'error') AS error,
                    count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                    count(*) FILTER (WHERE event_type = 'signup') AS signup,
                    count(*) FILTER (WHERE event_type = 'view') AS view
             FROM events GROUP BY user_id ORDER BY user_id""")),

    // Generator / UDTF analog: positional token explode.
    Spec("q_explode_tokens",
      (s, dir) => t(s, dir, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos0", "token")))
        .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"),
          col("token"))
        .orderBy(col("doc_id"), col("pos")),
      Some("""SELECT doc_id, CAST(i AS BIGINT) AS pos,
                    string_split(text, ' ')[i] AS token
             FROM documents,
                  UNNEST(generate_series(1, len(string_split(text, ' ')))) AS t(i)
             WHERE doc_id < 20 ORDER BY doc_id, pos""")),

    // Exact percentiles (sort-based, interpolated) — the exact
    // counterpart of the HLL/approx sketch family. Both quantiles come
    // from ONE percentile(…, array(…)) aggregate: a single per-group
    // value buffer instead of two (separate calls each accumulate their
    // own counts-map over every row).
    Spec("q_agg_percentile",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_extendedprice, array(0.5D, 0.9D))").as("ps"))
        .select(col("l_returnflag"),
          round(element_at(col("ps"), 1), 4).as("p50"),
          round(element_at(col("ps"), 2), 4).as("p90"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
                    round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
                    round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Ordered collect + string agg (collect_set order is engine-
    // private, so both sides sort before joining).
    Spec("q_agg_collect",
      (s, dir) => t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(array_join(array_sort(collect_set(col("o_orderpriority"))), ",")
          .as("priorities"))
        .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus,
                    array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
                      AS priorities
             FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Range (theta) join against a tiny bands table — broadcast
    // nested-loop with a 4-row build side, the only sane theta-join
    // shape at scale.
    Spec("q_range_join",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val bands = Seq(
          ("small", 0.0, 50000.0), ("mid", 50000.0, 150000.0),
          ("large", 150000.0, 300000.0), ("huge", 300000.0, 1e9))
          .toDF("band", "lo", "hi")
        t(s, dir, "orders")
          .join(broadcast(bands),
            col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy(col("band"))
      },
      Some("""WITH bands(band, lo, hi) AS (
               VALUES ('small', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
                      ('large', 150000.0, 300000.0), ('huge', 300000.0, 1e9))
             SELECT band, count(*) AS n, round(sum(o_totalprice), 2) AS total
             FROM orders JOIN bands
               ON o_totalprice >= lo AND o_totalprice < hi
             GROUP BY band ORDER BY band""")),

    // Binned interval join — the scale path for interval/overlap joins
    // when NEITHER side is broadcastable (q_range_join's nested loop
    // needs a tiny build side). Attribution shape: every click joined
    // to the same user's signups within a 1-day window, through the
    // reusable ScaleOps.binnedIntervalJoin operator (6-hour bins → each
    // interval covers ≤ 5 bins; plain shuffle equi join on (user, bin)
    // + exact window re-verify).
    Spec("q_interval_join_binned",
      (s, dir) => {
        val BinUs = 6L * 3600 * 1000000   // 6-hour bins
        val WindowUs = 24L * 3600 * 1000000 // 1-day attribution window
        val ev0 = t(s, dir, "events")
        val ev = ev0.select(col("event_id"), col("user_id"),
          col("event_type"), tsUs(ev0).as("ts_us"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id").as("s_user"), col("ts_us").as("s_ts"))
          .withColumn("s_end", col("s_ts") + WindowUs)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts_us"))
        ScaleOps.binnedIntervalJoin(clicks, signups,
            Seq("user_id"), Seq("s_user"), "ts_us", "s_ts", "s_end", BinUs)
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_signups"), min(col("s_ts")).as("first_signup"))
          .orderBy(col("event_id"))
      },
      Some("""WITH clicks AS (
               SELECT event_id, user_id, epoch_us(ts) AS ts_us
               FROM events WHERE event_type = 'click'),
             sign AS (
               SELECT user_id, epoch_us(ts) AS s_ts
               FROM events WHERE event_type = 'signup')
             SELECT c.event_id, count(*) AS n_signups, min(s.s_ts) AS first_signup
             FROM clicks c JOIN sign s
               ON c.user_id = s.user_id
              AND s.s_ts <= c.ts_us
              AND c.ts_us < s.s_ts + CAST(24 AS BIGINT)*3600*1000000
             GROUP BY c.event_id ORDER BY c.event_id""")),
  )
}
