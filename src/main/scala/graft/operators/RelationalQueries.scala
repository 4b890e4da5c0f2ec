package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The delegated-SQL surface (SURVEY §2.4–§2.7): the reference reaches
  * joins/aggregations/windows/set-ops/scalars only by shipping SQL text
  * to BigQuery (`functions/load_query/main.py:57`); here each category
  * is exercised natively through the DataFrame API so Catalyst plans it
  * (broadcast vs shuffle join selection, partial aggregation, top-k via
  * TakeOrderedAndProject, predicate pushdown).
  *
  * Scale notes per query are in the comments: small dimensions are
  * broadcast explicitly; fact-fact joins shuffle on their keys which is
  * the correct 100 TB plan.
  */
object RelationalQueries {
  import Q._

  val specs: Seq[Spec] = Seq(

    // ── joins ────────────────────────────────────────────────────────
    // 3-way equi join: lineitem ⋈ orders shuffles on orderkey (both
    // large at scale — correct); orders ⋈ customer broadcasts the
    // customer dim. Aggregation is partial+final (map-side combine).
    Spec("q_join_equi",
      (s, dir) => t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment,
                    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                    count(*) AS n_rows
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Broadcast join against the part dimension — no shuffle of the
    // fact side at any scale (dim stays under the broadcast threshold).
    Spec("q_join_broadcast",
      (s, dir) => t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("p_brand")),
      Some("""SELECT p_brand, round(sum(l_quantity), 2) AS sum_qty,
                    count(*) AS n_rows
             FROM lineitem JOIN part ON l_partkey = p_partkey
             GROUP BY p_brand ORDER BY p_brand""")),

    // Left-semi join = EXISTS: orders having at least one big line.
    Spec("q_join_semi",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "lineitem").filter(col("l_quantity") > 49)
            .select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, count(*) AS n_orders
             FROM orders
             WHERE EXISTS (SELECT 1 FROM lineitem
                           WHERE l_orderkey = o_orderkey AND l_quantity > 49)
             GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // Left-anti join = NOT EXISTS: customers with no open ('O') orders
    // (plain "no orders" is vacuously empty on the dense testdata).
    Spec("q_join_anti",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_orderstatus") === "O")
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name FROM customer
             WHERE NOT EXISTS (SELECT 1 FROM orders
                               WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
             ORDER BY c_custkey""")),

    // Left outer join preserving order-less customers; count of
    // non-null keys distinguishes them from 1-order customers.
    Spec("q_join_left_outer",
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("spend"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders,
                    round(coalesce(sum(o_totalprice), 0), 2) AS spend
             FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             GROUP BY c_custkey ORDER BY c_custkey""")),

    // Full outer join across two aggregated sides (suppliers and
    // customers per nation) — exercises null-filling on both sides.
    Spec("q_join_full_outer",
      (s, dir) => {
        val sup = t(s, dir, "supplier").groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n_sup"))
        val cus = t(s, dir, "customer").groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n_cus"))
        sup.join(cus, col("s_nationkey") === col("c_nationkey"), "full")
          .select(
            coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
            coalesce(col("n_sup"), lit(0L)).as("n_sup"),
            coalesce(col("n_cus"), lit(0L)).as("n_cus"))
          .orderBy(col("nationkey"))
      },
      Some("""WITH sup AS (SELECT s_nationkey, count(*) AS n_sup
                          FROM supplier GROUP BY s_nationkey),
                  cus AS (SELECT c_nationkey, count(*) AS n_cus
                          FROM customer GROUP BY c_nationkey)
             SELECT coalesce(s_nationkey, c_nationkey) AS nationkey,
                    coalesce(n_sup, 0) AS n_sup, coalesce(n_cus, 0) AS n_cus
             FROM sup FULL OUTER JOIN cus ON s_nationkey = c_nationkey
             ORDER BY nationkey""")),

    // Cross join (both sides tiny by construction — a cross join is
    // only ever sane when at least one side is bounded).
    Spec("q_join_cross",
      (s, dir) => t(s, dir, "region")
        .crossJoin(t(s, dir, "orders").select(col("o_orderstatus")).distinct())
        .select(col("r_name"), col("o_orderstatus"))
        .orderBy(col("r_name"), col("o_orderstatus")),
      Some("""SELECT r_name, o_orderstatus
             FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
             ORDER BY r_name, o_orderstatus""")),

    // ── aggregations ─────────────────────────────────────────────────
    // TPC-H Q1 shape: the canonical partial+final hash aggregate.
    Spec("q_agg_pricing_summary",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
                    round(sum(l_quantity), 2) AS sum_qty,
                    round(sum(l_extendedprice), 2) AS sum_base_price,
                    round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                    round(avg(l_quantity), 4) AS avg_qty,
                    count(*) AS count_order
             FROM lineitem GROUP BY l_returnflag, l_linestatus
             ORDER BY l_returnflag, l_linestatus""")),

    // Exact distinct aggregation (expand-based in Spark).
    Spec("q_agg_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_sups"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
                    count(DISTINCT l_suppkey) AS n_sups
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ROLLUP grouping sets. NULLS FIRST is forced on both sides —
    // Spark's default null ordering (asc = nulls first) differs from
    // DuckDB's (nulls last).
    Spec("q_agg_rollup",
      (s, dir) => t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                    round(sum(o_totalprice), 2) AS total
             FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")),

    // CUBE grouping sets.
    Spec("q_agg_cube",
      (s, dir) => t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n
             FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // Explicit GROUPING SETS with grouping() disambiguation of the
    // aggregate nulls (rollup/cube are the derived forms above).
    Spec("q_agg_grouping_sets",
      (s, dir) => {
        t(s, dir, "orders").createOrReplaceTempView("gs_orders")
        s.sql("""SELECT o_orderstatus, o_orderpriority,
                        CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
                        CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
                        count(*) AS n
                 FROM gs_orders
                 GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
                 ORDER BY o_orderstatus NULLS FIRST,
                          o_orderpriority NULLS FIRST""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
                    CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
                    CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
                    count(*) AS n
             FROM orders
             GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             ORDER BY o_orderstatus NULLS FIRST,
                      o_orderpriority NULLS FIRST""")),

    // Struct (nested) column construction + field access — SURVEY §1.2:
    // nested types come free with Spark SQL even though the reference
    // never uses them.
    // The struct is built and field-accessed as a real StructType column;
    // the output serializes it as 'name|bal' (bal via a decimal(12,2)
    // cast, which renders identically on both engines) because the
    // driver's pandas gate cannot hash struct-typed cells.
    Spec("q_scalar_struct",
      (s, dir) => t(s, dir, "customer")
        .select(col("c_custkey"),
          struct(col("c_name").as("name"), col("c_acctbal").as("bal"))
            .as("info"))
        .select(col("c_custkey"),
          concat_ws("|", col("info.name"),
            col("info.bal").cast("decimal(12,2)").cast("string")).as("info"),
          col("info.name").as("flat_name"),
          round(col("info.bal") * 2, 2).as("doubled"))
        .orderBy(col("c_custkey")),
      Some("""WITH x AS (SELECT c_custkey,
                               struct_pack(name := c_name, bal := c_acctbal) AS s
                        FROM customer)
             SELECT c_custkey,
                    concat(struct_extract(s, 'name'), '|',
                           CAST(CAST(struct_extract(s, 'bal') AS DECIMAL(12,2)) AS VARCHAR)) AS info,
                    struct_extract(s, 'name') AS flat_name,
                    round(struct_extract(s, 'bal') * 2, 2) AS doubled
             FROM x ORDER BY c_custkey""")),

    // Min/max/stddev stats (stddev rounded to 2 — double accumulation
    // order differs across engines).
    Spec("q_agg_stats",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(min(col("l_extendedprice")), 2).as("min_price"),
          round(max(col("l_extendedprice")), 2).as("max_price"),
          round(stddev(col("l_extendedprice")), 2).as("sd_price"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, round(min(l_extendedprice), 2) AS min_price,
                    round(max(l_extendedprice), 2) AS max_price,
                    round(stddev_samp(l_extendedprice), 2) AS sd_price
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // HLL++ approximate distinct (SURVEY §2.9 X5). The raw estimate is
    // engine-private, so the query emits the exact count plus a
    // Spark-side bounded-error check (|approx − exact| / exact ≤ 5 %,
    // well above HLL++'s default ~2.3 % relative sd) — which the DuckDB
    // oracle replays as exact + TRUE. The sketch still runs on the
    // Spark side (dedup accounting at 100 TB runs on sketches, not
    // exact distincts); the gate now verifies it stays in bounds.
    Spec("q_agg_approx_distinct",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx") - col("exact_parts")).cast("double") /
            col("exact_parts") <= 0.05).as("approx_ok"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
                    TRUE AS approx_ok
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Fuzzy string matching (edit distance): candidate pairs from a
    // bounded broadcast self-join of the dim, kept under a Levenshtein
    // threshold — the record-linkage / data-cleaning primitive. At
    // corpus scale the all-pairs shape is replaced by a blocking key
    // (first letter, length band, or the MinHash pipeline); the
    // distance function itself is the same.
    Spec("q_fuzzy_match",
      (s, dir) => {
        val a = t(s, dir, "nation").select(col("n_name").as("name_a"))
        val b = t(s, dir, "nation").select(col("n_name").as("name_b"))
        a.crossJoin(broadcast(b))
          .filter(col("name_a") < col("name_b"))
          .select(col("name_a"), col("name_b"),
            levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
          .filter(col("dist") <= 1)
          .orderBy(col("name_a"), col("name_b"))
      },
      Some("""SELECT a.n_name AS name_a, b.n_name AS name_b,
                    CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS dist
             FROM nation a, nation b
             WHERE a.n_name < b.n_name
               AND levenshtein(a.n_name, b.n_name) <= 1
             ORDER BY name_a, name_b""")),

    // The SCALE form of the fuzzy match: ScaleOps.blockedFuzzyJoin over
    // the documents corpus — blocking key (prefix × length band) turns
    // the all-pairs shape above into a shuffle equi-join whose cost is
    // block-local pair counts, not n². The fuzzy key is the first 4
    // words of each document (variable length, so the band mechanism is
    // actually exercised). The operating point is DATA-DERIVED
    // (ScaleOps.deriveFuzzyBlocking, one cheap aggregate): prefixLen
    // grows until expected block occupancy ≤ 200 rows, and the residual
    // occupancy picks the salt count — at 100× the corpus re-derives
    // its own knobs instead of needing manual retuning (VERDICT r7).
    // The oracle replays the same integer derivation and blocking,
    // including the deliberate prefix recall trade-off (salts don't
    // change results, so the oracle ignores them). On the measured
    // replicas this lands exactly on the hand-tuned points: p=1 at
    // sf0.01, p=2 at sf0.1/10× (BASELINE.md: 1 char → 22.4 s,
    // 2 chars → 12.5 s at −0.08 % recall), p=8 at 100× — the r8 run
    // measured pMax=4 saturating there (expected occupancy 3067,
    // block-pair volume 3.35e9, 809 s), while p=8's occupancy is 29
    // and pair volume 1.93e8; the pMax=8 ceiling lets the derivation
    // keep walking the occupancy curve at corpus scale, at the same
    // documented recall trade (edits inside the first 8 chars).
    //
    // RETIRE-OR-KEEP decision (VERDICT r11 #7 / r12 #7): KEPT — the
    // exact segment join dominates it at every measured operating
    // point, but this row is the LOSSY BASELINE every fuzzy
    // head-to-head (FuzzyTierRemeasure, EntropyHeadToHead, the
    // advisor's rationale prose) compares the exact operators
    // against; retiring it would leave the measured "exact recall AND
    // faster" claims without their in-battery reference row.
    //
    // OPERATING POINT (VERDICT r13 #1): DOWNSIZED to every 4th doc,
    // the q_fuzzy_match_qgram_lowent recipe — at 100× the full-corpus
    // leg burned 424.8 s = 18.8 % of the battery wall
    // (bench/bench_r13_full_100x.json) to price a DOMINATED lossy
    // operator whose full-size lossy-vs-exact comparison already
    // lives in the committed head-to-head artifacts
    // (bench/fuzzy_remeasure_100x_r13.jsonl: blocked 424.8 s / 67 %
    // of exact pairs vs segment 406.3 s / 100 %). Block-pair volume
    // ∝ n²/keyspace, so n/4 ≈ 1/16 of the cost; the battery still
    // prices the operator's shape without letting it own the wall.
    Spec("q_fuzzy_match_blocked",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .filter(col("doc_id") % 4 === 0)
          .select(col("doc_id"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 4)).as("k"))
        val bp = ScaleOps.deriveFuzzyBlocking(docs, "k",
          targetRowsPerBlock = 200, pMax = 8, maxDist = 4)
        ScaleOps.blockedFuzzyJoin(
            docs.select(col("doc_id").as("id_a"), col("k").as("s_a")),
            docs.select(col("doc_id").as("id_b"), col("k").as("s_b")),
            "s_a", "s_b", maxDist = 4,
            salts = bp.salts, prefixLen = bp.prefixLen,
            saltHotOnlyAbove = 200L, partitions = bp.partitions)
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"), col("dist"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH k AS (
               SELECT doc_id,
                      array_to_string((string_split(text, ' '))[1:4], ' ') AS s
               FROM documents WHERE doc_id % 4 = 0),
             stats AS (SELECT count(*) AS n,
                              count(DISTINCT substr(s, 1, 1)) AS d1,
                              count(DISTINCT substr(s, 1, 2)) AS d2,
                              count(DISTINCT substr(s, 1, 3)) AS d3,
                              count(DISTINCT substr(s, 1, 4)) AS d4,
                              count(DISTINCT substr(s, 1, 5)) AS d5,
                              count(DISTINCT substr(s, 1, 6)) AS d6,
                              count(DISTINCT substr(s, 1, 7)) AS d7,
                              count(DISTINCT substr(s, 1, 8)) AS d8
                       FROM k),
             params AS (SELECT CASE
                          WHEN n // greatest(d1, 1) <= 200 THEN 1
                          WHEN n // greatest(d2, 1) <= 200 THEN 2
                          WHEN n // greatest(d3, 1) <= 200 THEN 3
                          WHEN n // greatest(d4, 1) <= 200 THEN 4
                          WHEN n // greatest(d5, 1) <= 200 THEN 5
                          WHEN n // greatest(d6, 1) <= 200 THEN 6
                          WHEN n // greatest(d7, 1) <= 200 THEN 7
                          ELSE 8 END AS p FROM stats),
             l AS (SELECT doc_id AS id_a, s AS s_a,
                          substr(s, 1, (SELECT p FROM params)) AS c,
                          length(s) // 4 AS b FROM k),
             r AS (SELECT doc_id AS id_b, s AS s_b,
                          substr(s, 1, (SELECT p FROM params)) AS c,
                          length(s) // 4 + o.off AS b
                   FROM k CROSS JOIN (SELECT unnest([-1, 0, 1]) AS off) o)
             SELECT id_a, id_b, CAST(levenshtein(s_a, s_b) AS BIGINT) AS dist
             FROM l JOIN r USING (c, b)
             WHERE id_a < id_b AND levenshtein(s_a, s_b) <= 4
             ORDER BY id_a, id_b""")),

    // The GUARANTEED-RECALL scale form (VERDICT r10 #1):
    // ScaleOps.qgramFuzzyJoin — Ed-Join-family positional q-gram
    // prefix filtering. Unlike the blocked variant above, the oracle
    // here IS the brute-force edit-distance join (the
    // prefixFilterPairs contract): no blocking-key recall trade at
    // all, and candidate volume scales with gram rarity instead of a
    // fixed (prefix × band) key space — the property that kept
    // q_fuzzy_match_blocked `weak` at the 100-TB bar. BOTH knobs are
    // data-derived and purely physical (deriveQgramParams): recall is
    // exact at ANY gram width, so q is chosen by the measured
    // candidate-volume model n·(q·d+1)·avgDf(q) — the oracle needs no
    // replay of the derivation, precisely because the result cannot
    // depend on it. Granularity degenerates to the session constant
    // at gate scale.
    //
    // GATE OPERATING POINT (VERDICT r12 #2): the gate key is
    // gram-DIVERSE — 20 base64 chars of the document's md5 (the
    // EntropyHeadToHead corpus shape: ~6 bits/char, 4-gram vocabulary
    // 64⁴ ≈ 16.7 M ≫ corpus grams, postings ≈ 1), with deterministic
    // planted single-edit mutants (id + 1e9, every 5th doc; position
    // and replacement char hash-derived, so DuckDB replays them
    // bit-for-bit) giving a non-trivial match set. This is the corpus
    // profile adviseDedup actually ROUTES to the q-gram join;
    // the low-entropy profile it routes AWAY (first-4-words keys on
    // generated text, avgDf ≈ 3 090 at 100×, where the old gate burned
    // 647 s = 24 % of the r11 100× battery) is kept as the downsized
    // adversarial row below.
    Spec("q_fuzzy_match_qgram",
      (s, dir) => {
        val b = t(s, dir, "documents").select(col("doc_id").as("id"),
          expr("substring(base64(unhex(md5(text))), 1, 20)").as("k"))
        val alphabet =
          "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
        // Mutant derivation (ADVICE r13): position from TWO md5 hex
        // digits mapped to their values (ascii%20 of one hex digit
        // never reaches positions 3-8), and the replacement char as a
        // 1..63 alphabet SHIFT from the original's index — never the
        // original itself, so every planted pair is edit distance
        // EXACTLY 1, not occasionally 0. Both engines replay the
        // instr-based digit decode bit-for-bit.
        val hexv = "instr('0123456789abcdef', substring(md5(concat(k, '%s')), %d, 1)) - 1"
        val mut = b.filter(col("id") % 5 === 0)
          .withColumn("__p",
            expr(s"((${hexv.format("p", 1)}) * 16 + ${hexv.format("p", 2)}) % 20 + 1"))
          .withColumn("__s",
            expr(s"((${hexv.format("c", 1)}) * 16 + ${hexv.format("c", 2)}) % 63 + 1"))
          .withColumn("__c",
            expr(s"substring('$alphabet', ((instr('$alphabet', " +
              "substring(k, __p, 1)) - 1 + __s) % 64) + 1, 1)"))
          .select((col("id") + 1000000000L).as("id"),
            expr("concat(substring(k, 1, __p - 1), __c, " +
              "substring(k, __p + 1, 20 - __p))").as("k"))
        val u = b.unionByName(mut)
        val (q, np) = ScaleOps.deriveQgramParams(u, "k", maxDist = 4)
        ScaleOps.qgramFuzzyJoin(
            u.select(col("id").as("id_a"), col("k").as("s_a")),
            u.select(col("id").as("id_b"), col("k").as("s_b")),
            "s_a", "s_b", maxDist = 4, q = q, partitions = np)
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"), col("dist"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH b AS (
               SELECT doc_id AS id,
                      substr(base64(unhex(md5(text))), 1, 20) AS k
               FROM documents),
             m AS (
               SELECT id + 1000000000 AS id,
                      substr(k, 1, p - 1) ||
                        substr(alpha, ((instr(alpha, substr(k, p, 1)) - 1 + s)
                                       % 64) + 1, 1) ||
                        substr(k, p + 1, 20 - p) AS k
               FROM (SELECT id, k,
                       ((instr('0123456789abcdef', substr(md5(k || 'p'), 1, 1)) - 1) * 16
                         + instr('0123456789abcdef', substr(md5(k || 'p'), 2, 1)) - 1)
                         % 20 + 1 AS p,
                       ((instr('0123456789abcdef', substr(md5(k || 'c'), 1, 1)) - 1) * 16
                         + instr('0123456789abcdef', substr(md5(k || 'c'), 2, 1)) - 1)
                         % 63 + 1 AS s,
                       'ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/'
                         AS alpha
                     FROM b WHERE id % 5 = 0)),
             u AS (SELECT id, k FROM b UNION ALL SELECT id, k FROM m)
             SELECT a.id AS id_a, b2.id AS id_b,
                    CAST(levenshtein(a.k, b2.k) AS BIGINT) AS dist
             FROM u a JOIN u b2
               ON a.id < b2.id
             WHERE levenshtein(a.k, b2.k) <= 4
             ORDER BY id_a, id_b""")),

    // The documented ADVERSARIAL leg of the q-gram row (VERDICT r12
    // #2): the LOW-ENTROPY corpus profile — first-4-words keys over
    // generated text, where gram postings collapse (100×: vocab
    // 4 782, avgDf ≈ 3 090) and adviseDedup routes production jobs to
    // the segment join instead. Kept deliberately DOWNSIZED (every
    // 4th doc: candidate volume ∝ n²/vocab, so ~1/16 of the full-
    // corpus cost that made the old gate 24 % of the 100× battery) so
    // the battery still prices the operator's worst-case profile
    // without letting a mismatched operating point dominate the wall.
    Spec("q_fuzzy_match_qgram_lowent",
      (s, dir) => {
        val docs = t(s, dir, "documents")
          .filter(col("doc_id") % 4 === 0)
          .select(col("doc_id"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 4)).as("k"))
        val (q, np) = ScaleOps.deriveQgramParams(docs, "k", maxDist = 4)
        ScaleOps.qgramFuzzyJoin(
            docs.select(col("doc_id").as("id_a"), col("k").as("s_a")),
            docs.select(col("doc_id").as("id_b"), col("k").as("s_b")),
            "s_a", "s_b", maxDist = 4, q = q, partitions = np)
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"), col("dist"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH k AS (
               SELECT doc_id,
                      array_to_string((string_split(text, ' '))[1:4], ' ') AS s
               FROM documents
               WHERE doc_id % 4 = 0)
             SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                    CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
             FROM k a JOIN k b
               ON a.doc_id < b.doc_id
              AND abs(length(a.s) - length(b.s)) <= 4
             WHERE levenshtein(a.s, b.s) <= 4
             ORDER BY id_a, id_b""")),

    // The LOW-ENTROPY-corpus exact form (the r11 head-to-head lesson):
    // ScaleOps.segmentFuzzyJoin — Pass-Join-family disjoint-segment
    // pigeonholing. Same oracle as q_fuzzy_match_qgram (brute force —
    // both are exact-recall), different candidate bound: q-gram
    // postings collapse on generated text (100×: vocab 4 782, mean df
    // 3 090 → 2.6e10 predicted candidates; record walls in
    // bench/fuzzy_remeasure_100x_r13.jsonl — qgram 967.1 s vs segment
    // 430.9 s on identical match sets), while
    // exact len/(d+1)-char segments at length-aligned positions stay
    // selective (474 685 distinct (len, seg) keys on the same corpus).
    // The candidate join needs no pre-join shuffle: the segment index
    // (d+1 rows/string) broadcasts under deriveSegmentJoin's heap
    // budget and windowed probe substrings are generated in-codegen
    // inside the scan stage; only verified matches reach the dedup
    // exchange.
    Spec("q_fuzzy_match_segment",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 4)).as("k"))
        val plan = ScaleOps.deriveSegmentJoin(docs, "k", maxDist = 4)
        ScaleOps.segmentFuzzyJoin(
            docs.select(col("doc_id").as("id_a"), col("k").as("s_a")),
            docs.select(col("doc_id").as("id_b"), col("k").as("s_b")),
            "s_a", "s_b", maxDist = 4,
            broadcastIndex = plan.broadcastIndex,
            partitions = plan.partitions,
            symmetric = true)
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"), col("dist"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH k AS (
               SELECT doc_id,
                      array_to_string((string_split(text, ' '))[1:4], ' ') AS s
               FROM documents)
             SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                    CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
             FROM k a JOIN k b
               ON a.doc_id < b.doc_id
              AND abs(length(a.s) - length(b.s)) <= 4
             WHERE levenshtein(a.s, b.s) <= 4
             ORDER BY id_a, id_b""")),

    // Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    // match each other — the semantics MERGE pipelines need when the
    // join key is itself nullable. Still a hash-partitionable equi
    // join (NULLs hash to one bucket).
    Spec("q_join_null_safe",
      (s, dir) => {
        val o = t(s, dir, "orders")
        def keyed(m: Int, alias: String) = o
          .select(when(col("o_orderkey") % m === 0, lit(null))
            .otherwise(col("o_orderstatus")).as(s"k_$alias"))
          .groupBy(col(s"k_$alias")).agg(count(lit(1)).as(s"n_$alias"))
        keyed(7, "a").join(keyed(5, "b"), col("k_a") <=> col("k_b"))
          .select(coalesce(col("k_a"), lit("NULL")).as("k"),
            col("n_a"), col("n_b"))
          .orderBy(col("k"))
      },
      Some("""WITH a AS (
               SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                           ELSE o_orderstatus END AS k_a,
                      count(*) AS n_a
               FROM orders GROUP BY 1),
             b AS (
               SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL
                           ELSE o_orderstatus END AS k_b,
                      count(*) AS n_b
               FROM orders GROUP BY 1)
             SELECT coalesce(k_a, 'NULL') AS k, n_a, n_b
             FROM a JOIN b ON k_a IS NOT DISTINCT FROM k_b
             ORDER BY k""")),

    // Approximate median (the sketch the percentile runs on at 100 TB),
    // gated the same way as the HLL row: the engine-private estimate is
    // checked in-engine against the exact interpolated percentile
    // (rank error ≤ 1/accuracy ⇒ generous 5 % value tolerance), and the
    // oracle replays exact + TRUE.
    Spec("q_agg_approx_quantile",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("approx_med"),
          expr("percentile(l_extendedprice, 0.5)").as("exact_med"))
        .select(col("l_returnflag"),
          // floor, not round: the interpolated median lands on FP half
          // boundaries where the engines' ROUNDs disagree
          (floor(col("exact_med") * 100) / 100).as("exact_median"),
          (abs(col("approx_med") - col("exact_med")) / col("exact_med") <= 0.05)
            .as("approx_ok"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
                    floor(quantile_cont(l_extendedprice, 0.5) * 100) / 100
                      AS exact_median,
                    TRUE AS approx_ok
             FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ── window functions ─────────────────────────────────────────────
    // Ranking window: top-3 orders per market segment. row_number over
    // a total order (price desc, key asc) keeps it deterministic.
    // Distribution window functions (§2.6 completion next to the rank
    // family): percent_rank / cume_dist plus the positional
    // first/last/nth values over an explicit full-partition frame.
    // The window ORDER BY is total (acctbal then custkey), so rank is
    // tie-free and both engines evaluate ONE integer division per
    // distribution value — a single IEEE-correctly-rounded op, safe to
    // compare raw (no accumulation order exists to diverge).
    Spec("q_window_distribution",
      (s, dir) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        val wFull = w.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "customer")
          .filter(col("c_custkey") <= 200)
          .select(col("c_custkey"), col("c_mktsegment"),
            percent_rank().over(w).as("pct_rank"),
            cume_dist().over(w).as("cume"),
            first_value(col("c_custkey")).over(wFull).as("first_key"),
            last_value(col("c_custkey")).over(wFull).as("last_key"),
            nth_value(col("c_custkey"), 2).over(wFull).as("second_key"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_mktsegment,
                    percent_rank() OVER w AS pct_rank,
                    cume_dist() OVER w AS cume,
                    first_value(c_custkey) OVER wf AS first_key,
                    last_value(c_custkey) OVER wf AS last_key,
                    nth_value(c_custkey, 2) OVER wf AS second_key
             FROM customer WHERE c_custkey <= 200
             WINDOW w AS (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal, c_custkey),
                    wf AS (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal, c_custkey
                           ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING)
             ORDER BY c_custkey""")),

    Spec("q_window_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .join(broadcast(t(s, dir, "customer")),
            col("o_custkey") === col("c_custkey"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 3)
          .select(col("c_mktsegment"), col("rnk"), col("o_orderkey"),
            col("o_totalprice"))
          .orderBy(col("c_mktsegment"), col("rnk"))
      },
      Some("""SELECT c_mktsegment, rnk, o_orderkey, o_totalprice
             FROM (SELECT c_mktsegment, o_orderkey, o_totalprice,
                          row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
                   FROM orders JOIN customer ON o_custkey = c_custkey) x
             WHERE rnk <= 3 ORDER BY c_mktsegment, rnk""")),

    // Running-sum frame (rows unbounded preceding → current): per-
    // customer cumulative spend. Sequential per-partition accumulation
    // is order-identical across engines given the same total order.
    Spec("q_window_running_sum",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .withColumn("running_spend", round(sum(col("o_totalprice")).over(w), 2))
          .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
                    round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                      AS running_spend
             FROM orders ORDER BY o_custkey, o_orderkey""")),

    // lag/lead analytics: days between consecutive orders per customer.
    Spec("q_window_lag_lead",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
          .withColumn("next_key", lead(col("o_orderkey"), 1).over(w))
          .select(col("o_custkey"), col("o_orderkey"),
            datediff(col("o_orderdate").cast("date"),
              col("prev_date").cast("date")).cast("long").as("days_since_prev"),
            col("next_key"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
                    CAST(datediff('day',
                      CAST(lag(o_orderdate, 1) OVER w AS DATE),
                      CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_prev,
                    lead(o_orderkey, 1) OVER w AS next_key
             FROM orders
             WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             ORDER BY o_custkey, o_orderkey""")),

    // dense_rank + ntile, partitioned by order year: an unpartitioned
    // window is a single-task sort at scale — partitioning by a
    // bounded-cardinality time bucket keeps the semantics (per-period
    // quartiles, the form reporting actually wants) and the
    // parallelism.
    Spec("q_window_ntile",
      (s, dir) => {
        val yr = year(col("o_orderdate")).cast("long")
        val w = Window.partitionBy(col("o_year"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("o_year", yr)
          .withColumn("drnk", dense_rank().over(w).cast("long"))
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .filter(col("drnk") <= 10)
          .select(col("o_year"), col("o_orderkey"), col("drnk"), col("quartile"))
          .orderBy(col("o_year"), col("drnk"))
      },
      Some("""SELECT o_year, o_orderkey, drnk, quartile
             FROM (SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
                          o_orderkey,
                          dense_rank() OVER w AS drnk,
                          ntile(4) OVER w AS quartile
                   FROM orders
                   WINDOW w AS (PARTITION BY extract(year FROM o_orderdate)
                                ORDER BY o_totalprice DESC, o_orderkey)) x
             WHERE drnk <= 10 ORDER BY o_year, drnk""")),

    // The PRODUCTION form of the ranked-window report (VERDICT r7 #4):
    // same dense_rank + ntile semantics, partitioned by (year, month)
    // instead of year alone. The year gate above is the documented
    // bounded-cardinality shape (~7 partitions), which at 100× leaves
    // seven 2 M-row sort tasks while 25 cores idle; (year, month)
    // multiplies the window key cardinality by 12 (~84 partitions), so
    // every core carries sort tasks and per-task frames shrink 12× —
    // the partitioning a monthly report actually wants, with identical
    // per-frame semantics. Window keys that outnumber cores are the
    // general rule for scale-safe ranked windows; when the report
    // really needs a coarse frame AND only top-k survives, route the
    // rank leg through TopKPerKey as q_topk_per_key does.
    Spec("q_window_ntile_month",
      (s, dir) => {
        val w = Window.partitionBy(col("o_year"), col("o_month"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("o_year", year(col("o_orderdate")).cast("long"))
          .withColumn("o_month", month(col("o_orderdate")).cast("long"))
          .withColumn("drnk", dense_rank().over(w).cast("long"))
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .filter(col("drnk") <= 3)
          .select(col("o_year"), col("o_month"), col("o_orderkey"),
            col("drnk"), col("quartile"))
          .orderBy(col("o_year"), col("o_month"), col("drnk"))
      },
      Some("""SELECT o_year, o_month, o_orderkey, drnk, quartile
             FROM (SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
                          CAST(extract(month FROM o_orderdate) AS BIGINT) AS o_month,
                          o_orderkey,
                          dense_rank() OVER w AS drnk,
                          ntile(4) OVER w AS quartile
                   FROM orders
                   WINDOW w AS (PARTITION BY extract(year FROM o_orderdate),
                                             extract(month FROM o_orderdate)
                                ORDER BY o_totalprice DESC, o_orderkey)) x
             WHERE drnk <= 3 ORDER BY o_year, o_month, drnk""")),

    // ── sort / limit / top-k ─────────────────────────────────────────
    // Global top-k: Spark plans TakeOrderedAndProject (per-partition
    // heap + driver merge), never a full sort at scale.
    Spec("q_topk",
      (s, dir) => t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // Per-key top-k through the NATIVE TopKPerKey operator
    // (graft.plans): bounded heap per key, no per-group sort — the
    // oracle replays the equivalent window-function semantics.
    Spec("q_topk_per_key",
      (s, dir) => ScaleOps.topKPerKey(
          t(s, dir, "orders"), Seq(col("o_custkey")),
          Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey")),
      Some("""SELECT o_custkey, o_orderkey, o_totalprice
             FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                          row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
                   FROM orders) x
             WHERE rn <= 3
             ORDER BY o_custkey, o_totalprice DESC, o_orderkey""")),

    // ── set operations ───────────────────────────────────────────────
    Spec("q_union_all",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), lit("finished").as("bucket"))
          .unionAll(o.filter(col("o_orderstatus") === "O")
            .select(col("o_orderkey"), lit("open").as("bucket")))
          .orderBy(col("o_orderkey"), col("bucket"))
      },
      Some("""SELECT o_orderkey, 'finished' AS bucket FROM orders WHERE o_orderstatus = 'F'
             UNION ALL
             SELECT o_orderkey, 'open' AS bucket FROM orders WHERE o_orderstatus = 'O'
             ORDER BY o_orderkey, bucket""")),

    Spec("q_intersect",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_totalprice") > 150000).select(col("o_custkey"))
          .intersect(o.filter(col("o_orderstatus") === "F").select(col("o_custkey")))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_totalprice > 150000
             INTERSECT
             SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             ORDER BY o_custkey""")),

    Spec("q_intersect_all",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_totalprice") > 100000).select(col("o_custkey"))
          .intersectAll(o.filter(col("o_orderstatus") === "F")
            .select(col("o_custkey")))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_totalprice > 100000
             INTERSECT ALL
             SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             ORDER BY o_custkey""")),

    Spec("q_except_all",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.select(col("o_custkey"))
          .exceptAll(o.filter(col("o_orderstatus") === "O")
            .select(col("o_custkey")))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders
             EXCEPT ALL
             SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             ORDER BY o_custkey""")),

    Spec("q_except",
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.select(col("o_custkey"))
          .except(o.filter(col("o_orderstatus") === "O").select(col("o_custkey")))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT DISTINCT o_custkey FROM orders
             EXCEPT
             SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             ORDER BY o_custkey""")),

    // ── scalar function batteries (SURVEY §2.7) ──────────────────────
    Spec("q_scalar_string",
      (s, dir) => t(s, dir, "customer")
        .select(col("c_custkey"),
          upper(col("c_name")).as("up"),
          lower(col("c_mktsegment")).as("lo"),
          length(col("c_name")).cast("long").as("len"),
          substring(col("c_name"), 1, 8).as("sub"),
          concat_ws("-", col("c_mktsegment"), col("c_custkey")).as("cat"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          regexp_replace(col("c_name"), "[0-9]+", "#").as("masked"),
          trim(lit("  x  ")).as("trimmed"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, upper(c_name) AS up, lower(c_mktsegment) AS lo,
                    CAST(length(c_name) AS BIGINT) AS len,
                    substr(c_name, 1, 8) AS sub,
                    concat_ws('-', c_mktsegment, c_custkey) AS cat,
                    lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
                    regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked,
                    trim('  x  ') AS trimmed
             FROM customer ORDER BY c_custkey""")),

    Spec("q_scalar_date",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          quarter(col("o_orderdate")).cast("long").as("qtr"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          last_day(col("o_orderdate")).as("eom"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
                    CAST(extract(year FROM o_orderdate) AS BIGINT) AS yr,
                    CAST(extract(month FROM o_orderdate) AS BIGINT) AS mo,
                    CAST(extract(day FROM o_orderdate) AS BIGINT) AS dom,
                    CAST(extract(quarter FROM o_orderdate) AS BIGINT) AS qtr,
                    date_trunc('month', o_orderdate) AS month_start,
                    CAST(o_orderdate AS DATE) + 30 AS plus30,
                    last_day(CAST(o_orderdate AS DATE)) AS eom
             FROM orders ORDER BY o_orderkey""")),

    Spec("q_scalar_math",
      // spread() first: 600k rows of per-row math would otherwise all
      // evaluate on the single-row-group scan task before the sort
      (s, dir) => spread(s, t(s, dir, "lineitem"))
        .select(col("l_orderkey"), col("l_linenumber"),
          round(abs(col("l_extendedprice") * lit(-1)), 2).as("abs_price"),
          floor(col("l_quantity")).cast("long").as("fl"),
          ceil(col("l_discount") * 100).cast("long").as("disc_pct"),
          round(sqrt(col("l_extendedprice")), 4).as("root"),
          pmod(col("l_orderkey"), lit(7)).as("k_mod"),
          round(ln(col("l_extendedprice") + 1), 4).as("log_price"))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // data, so the ORDER BY covers every output column — rows that
        // still tie are full duplicates, interchangeable under any hash
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("abs_price"),
          col("fl"), col("disc_pct"), col("root"), col("log_price")),
      Some("""SELECT l_orderkey, l_linenumber,
                    round(abs(l_extendedprice * -1), 2) AS abs_price,
                    CAST(floor(l_quantity) AS BIGINT) AS fl,
                    CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct,
                    round(sqrt(l_extendedprice), 4) AS root,
                    l_orderkey % 7 AS k_mod,
                    round(ln(l_extendedprice + 1), 4) AS log_price
             FROM lineitem
             ORDER BY l_orderkey, l_linenumber, abs_price, fl, disc_pct,
                      root, log_price""")),

    // JSON extraction over the events.props column.
    Spec("q_scalar_json",
      // spread() first: the per-row Jackson parse is the cost here, and
      // a single-row-group events file would otherwise serialize every
      // parse onto one scan task (projections evaluate in the scan
      // stage, before the sort exchange)
      (s, dir) => spread(s, t(s, dir, "events"))
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").try_cast("long").as("k"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
                    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             FROM events ORDER BY event_id""")),

    Spec("q_scalar_conditional",
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          when(col("value") > 150, "high")
            .when(col("value") > 50, "mid")
            .otherwise("low").as("band"),
          coalesce(nullif(col("event_type"), lit("error")), lit("ok")).as("et"),
          greatest(col("value"), col("user_id").cast("double")).as("hi"),
          least(col("value"), col("user_id").cast("double")).as("lo"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
                    CASE WHEN value > 150 THEN 'high'
                         WHEN value > 50 THEN 'mid' ELSE 'low' END AS band,
                    coalesce(nullif(event_type, 'error'), 'ok') AS et,
                    greatest(value, CAST(user_id AS DOUBLE)) AS hi,
                    least(value, CAST(user_id AS DOUBLE)) AS lo
             FROM events ORDER BY event_id""")),

    // Array scalar battery over tokenized text (sorted post-distinct on
    // both sides — engines keep different dedup orders). The arrays are
    // built as real ArrayType columns, then serialized with a '|' join
    // for the output: the driver's pandas-based gate canonicalizes with
    // sort_values, which cannot hash array-typed cells.
    Spec("q_scalar_array",
      (s, dir) => t(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          array_sort(array_distinct(split(col("text"), " "))).as("vocab_arr"),
          array_contains(split(col("text"), " "), "spark").as("has_spark"),
          slice(split(col("text"), " "), 1, 3).as("head3_arr"))
        .select(col("doc_id"), col("n_tokens"),
          array_join(col("vocab_arr"), "|").as("vocab"),
          col("has_spark"),
          array_join(col("head3_arr"), "|").as("head3"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                    array_to_string(list_sort(list_distinct(string_split(text, ' '))), '|') AS vocab,
                    list_contains(string_split(text, ' '), 'spark') AS has_spark,
                    array_to_string(list_slice(string_split(text, ' '), 1, 3), '|') AS head3
             FROM documents WHERE doc_id < 50 ORDER BY doc_id"""))
  )
}
