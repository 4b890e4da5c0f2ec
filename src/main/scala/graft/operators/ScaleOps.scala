package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale patterns for the 100 TB deployment (SURVEY §7 risks; builder
  * brief: "co-locate joins via bucketing, salting for skew").
  *
  * These are the utilities a production job composes around the
  * operator battery; each has a spec proving the plan shape (no
  * exchange on bucketed joins) or value equivalence (salted == plain).
  */
object ScaleOps {

  /** Caches pinned by [[materializePinned]] since the last
    * [[unpersistPinned]] — the generic form of GraphQueries' per-query
    * edge-cache registry (r19 optimization round): an operator whose
    * plan consumes one EXPENSIVE derived table (per-doc shingle sets,
    * per-doc LM scores) from several join arms pays the derivation
    * once into a compressed columnar cache instead of re-evaluating it
    * per arm (guide §1.2 "don't compute things you throw away").
    * MEMORY_AND_DISK like the graph caches: evicts under pressure,
    * recomputes from lineage — never a correctness risk. Released by
    * the same harness finally-hook as the graph caches
    * (GraphQueries.unpersistAll delegates here). */
  private val pinned =
    scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Materialize a within-query-reused derived table as compressed
    * columnar cache and register it for the harness' per-query
    * release. Fast-paths an already-cached plan (the
    * GraphQueries.materialize contract). The materializing count runs
    * INSIDE the caller's query construction, so Bench's timer (which
    * wraps the construction) charges it to the query — no timing
    * semantics change. */
  def materializePinned(df: DataFrame): DataFrame = {
    if (df.storageLevel != org.apache.spark.storage.StorageLevel.NONE) {
      df.count()
      return df
    }
    val out = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // register BEFORE the count: a failed materialization must still be
    // released by the finally-side hook (the GraphQueries.materialize
    // ordering argument)
    synchronized { pinned += out }
    out.count()
    out
  }

  /** Release every cache pinned by [[materializePinned]] since the
    * last call — non-blocking, invoked per query by
    * GraphQueries.unpersistAll (the hook Bench/Verify already call). */
  def unpersistPinned(): Unit = synchronized {
    pinned.foreach(_.unpersist(blocking = false))
    pinned.clear()
  }

  /** "8g"/"512m"-style JVM size string → bytes. A SUFFIXLESS value is
    * MiB, matching Spark's own `getSizeAsMb` reading of
    * `spark.executor.memory` — treating "8192" as bytes would
    * underestimate the heap ~10^6×. */
  private[graft] def parseJvmBytes(s: String): Long = {
    val t = s.trim.toLowerCase
    // A blank value would crash `t.last` with an opaque
    // NoSuchElementException inside partition derivation (ADVICE r10);
    // name the config key so the misconfiguration is diagnosable.
    require(t.nonEmpty,
      "spark.executor.memory is set but blank — expected a JVM size " +
        "string like 8g / 512m / 8192 (suffixless = MiB)")
    val (num, mult) = t.last match {
      case 'k' => (t.dropRight(1), 1L << 10)
      case 'm' => (t.dropRight(1), 1L << 20)
      case 'g' => (t.dropRight(1), 1L << 30)
      case 't' => (t.dropRight(1), 1L << 40)
      case _   => (t, 1L << 20)
    }
    (num.toDouble * mult).toLong
  }

  /** DATA-derived shuffle partition count — the q_graph_triangles rule
    * (GraphQueries.triangleCounts) generalized to any heavy join/sort
    * whose granularity must scale with the data, not the session
    * constant (VERDICT r9 #4): partitions such that the `conc` task
    * slots concurrently hold ≤ a conservative tenth of the executor
    * heap of `bytes` between them. Degenerates to the session
    * `spark.sql.shuffle.partitions` whenever that already suffices
    * (plan unchanged at gate scale), and caps at 4096 so task-launch
    * overhead never dominates. `spark.executor.memory` is
    * authoritative when set (cluster mode always sets it); the
    * `Runtime.maxMemory` fallback is LOCAL-MODE only, where driver ==
    * executor JVM. */
  def deriveShufflePartitions(ss: SparkSession, bytes: Long,
                              cap: Int = 4096): Int = {
    val parts = ss.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val heap = ss.conf.getOption("spark.executor.memory").map(parseJvmBytes)
      .getOrElse(Runtime.getRuntime.maxMemory)
    val needed =
      math.ceil(bytes.toDouble * concurrentSlotsPerHeap(ss) / (0.1 * heap))
        .toLong
    math.min(cap.toLong, math.max(parts.toLong, needed)).toInt
  }

  /** Task slots that SHARE one executor heap — the concurrency the
    * per-heap budget must divide by. `spark.executor.cores` when set
    * (cluster mode always sets it: per-executor slots share that
    * executor's heap); `defaultParallelism` only as the LOCAL-mode
    * fallback, where all threads share the single JVM heap. Using
    * defaultParallelism unconditionally would multiply the estimate by
    * the executor COUNT on a cluster (cluster-wide slots against one
    * executor's heap) and over-partition ~N_executors-fold — enough to
    * push derivations past their caps and flip plans to fallbacks on
    * exactly the deployments the derivation targets. */
  private[operators] def concurrentSlotsPerHeap(ss: SparkSession): Int =
    ss.conf.getOption("spark.executor.cores").map(_.trim.toInt)
      .filter(_ > 0)
      .getOrElse(ss.sparkContext.defaultParallelism)

  /** The repartition-if-above guard every derived-granularity call
    * site shares: explicit hash repartition by the coming join/agg
    * keys when `np` exceeds the session constant (the join consumes
    * the partitioning — the exchange REPLACES the join's own), no-op
    * otherwise (gate-scale degeneration; PlanAssertSpec pins both
    * directions). One definition so a fix to the guard can never miss
    * a call site. */
  def widenIfAbove(df: DataFrame, np: Int, keys: Column*): DataFrame = {
    val parts =
      df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    if (np > parts) df.repartition(np, keys: _*) else df
  }

  /** Persist both sides of a recurring join bucketed + sorted on the
    * join key: every subsequent equi-join on that key is shuffle-free
    * (bucket-local sort-merge). The write cost is paid once; at 100 TB
    * the repeated-join shuffle it removes is the dominant cost.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: String = null): Unit = {
    // an explicit path makes the table external: a fresh JVM whose
    // catalog doesn't know the table can still recreate it even though
    // a previous run's managed-table directory survives in the
    // warehouse (managed CREATE refuses a non-empty location)
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
    (if (path != null) w.option("path", path) else w).saveAsTable(table)
  }

  /** Per-key top-k through the native TopKPerKey operator
    * (graft.plans): a map-side partial pass with bounded per-key heaps
    * (capped at `maxKeysInMemory` keys, overflow passes through) prunes
    * the shuffle to ≤ k rows per key per mapper, then the final pass
    * streams the first k of each key group off a spillable sort of the
    * pruned data — versus the full per-key sort the window-function
    * encoding pays. Rows come back unordered across keys (add a global
    * orderBy when determinism matters downstream).
    */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                 k: Int,
                 maxKeysInMemory: Int = graft.plans.TopKPerKey.DefaultMaxKeysInMemory): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.{Project, Sort}
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKPerKeyStrategy
    // Column → resolved Expression: route through a real sort/select so
    // the analyzer does the conversion (raw bridge conversion yields
    // lazy column nodes that never resolve inside a custom plan)
    val (sortOrders, child) = ColumnBridge.analyzedPlan(df.sort(order: _*)) match {
      case Sort(so, _, c, _) => (so, c)
      case other => sys.error(s"unexpected plan shape: $other")
    }
    val keyExprs = ColumnBridge.analyzedPlan(df.select(keys: _*)) match {
      case Project(list, _) => list.map {
        case Alias(e, _) => e
        case e => e
      }
      case other => sys.error(s"unexpected plan shape: $other")
    }
    ColumnBridge.ofRows(spark,
      graft.plans.TopKPerKeyPlan(keyExprs, sortOrders, k, child, maxKeysInMemory))
  }

  /** Equi-join scale path for point-in-interval (overlap) joins when
    * NEITHER side is broadcastable — a broadcast nested loop needs a
    * tiny build side, and a shuffle theta join has no key to shuffle
    * on. Intervals explode to the fixed-width bins they cover
    * (⌈len/binWidth⌉+1 rows each), points map to exactly one bin, and
    * the join becomes a plain shuffle EQUI join on (keys…, bin) with
    * the exact half-open predicate `lo ≤ ts < hi` re-verified — no
    * theta join, no blowup. A point's bin occurs once in each covering
    * interval's bin list, so no post-join dedup is needed. Choose
    * binWidth near the typical interval length: wider bins replicate
    * intervals less but pack more false candidates per bin.
    *
    * `pointKeys`/`intervalKeys` are positional equi-key pairs; `ts`
    * names the point column, `lo`/`hi` the interval bounds (longs).
    * Output = all point columns + all interval columns (names must not
    * collide).
    */
  def binnedIntervalJoin(points: DataFrame, intervals: DataFrame,
                         pointKeys: Seq[String], intervalKeys: Seq[String],
                         ts: String, lo: String, hi: String,
                         binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    require(pointKeys.length == intervalKeys.length,
      "pointKeys and intervalKeys must pair up")
    require(points.columns.intersect(intervals.columns).isEmpty,
      s"point/interval column names must not collide: " +
        points.columns.intersect(intervals.columns).mkString(", "))
    val bi = intervals.withColumn("__bin",
      explode(sequence(expr(s"$lo div $binWidth"), expr(s"$hi div $binWidth"))))
    val bp = points.withColumn("__bin", expr(s"$ts div $binWidth"))
    val keyCond = pointKeys.zip(intervalKeys)
      .map { case (a, b) => bp(a) === bi(b) }
      .foldLeft(bp("__bin") === bi("__bin"))(_ && _)
    bp.join(bi, keyCond && bi(lo) <= bp(ts) && bp(ts) < bi(hi))
      .drop(bp("__bin")).drop(bi("__bin"))
  }

  /** As-of (time-travel) LEFT join: attach to every left row the
    * newest right row with `rightTs` ≤ `leftTs` for the same key —
    * without a range theta join. Both sides union into one relation,
    * right rows sorting before left rows at equal timestamps
    * (inclusive as-of), and ALL `payload` columns are carried forward
    * together as ONE struct by a single last-non-null window — the
    * struct is non-null for every right row even when its fields are
    * NULL, so a NULL payload value on the newest matching right row
    * comes back as NULL (it is never skipped in favour of an older
    * row, and fields never mix across different right rows). ONE
    * shuffle on the key and a linear scan per partition, versus the
    * per-row range probe a theta join would pay; this is the standard
    * Spark encoding for "price as of trade time" style joins at scale.
    *
    * Ties among right rows at the same (key, ts) resolve to any one of
    * them — pass pre-deduplicated right sides when that matters.
    * `payload` names right columns to attach; left columns pass
    * through unchanged (names must not collide with payload).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKeys: Seq[String], rightKeys: Seq[String],
               leftTs: String, rightTs: String,
               payload: Seq[String]): DataFrame = {
    require(leftKeys.length == rightKeys.length,
      "leftKeys and rightKeys must pair up")
    require(payload.nonEmpty, "payload must name at least one right column")
    import org.apache.spark.sql.expressions.Window
    val keyNames = leftKeys.indices.map(i => s"__k$i")
    val leftCols = left.columns.toSeq
    val reserved = keyNames ++ Seq("__ts", "__side", "__p")
    require(!leftCols.exists(reserved.contains),
      s"left columns collide with asofJoin internals: " +
        leftCols.filter(reserved.contains).mkString(", "))
    require(!payload.exists(leftCols.contains),
      s"payload names collide with left columns: " +
        payload.filter(leftCols.contains).mkString(", "))
    val payloadType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p).copy(name = p)))
    val l = left.select(
      (leftKeys.zip(keyNames).map { case (c, k) => col(c).as(k) } ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftCols.map(col) :+
        lit(null).cast(payloadType).as("__p")): _*)
    val r = right.select(
      (rightKeys.zip(keyNames).map { case (c, k) => col(c).as(k) } ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(col): _*).as("__p")): _*)
    val w = Window.partitionBy(keyNames.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__p").getField(p).as(p)): _*)
  }

  /** A data-derived operating point for [[blockedFuzzyJoin]] (VERDICT
    * r7: the knobs existed but were manual — at 100× the gate would
    * have needed retuning by hand). One cheap aggregate over the key
    * column yields the corpus stats, and both knobs fall out:
    *
    *  - `prefixLen` = the smallest prefix length whose EXPECTED block
    *    occupancy (rows ÷ distinct prefixes) is ≤ `targetRowsPerBlock`
    *    (capped at `pMax` — each extra char costs recall on pairs whose
    *    edits touch the prefix, so we stop growing the key once the
    *    corpus' prefix diversity saturates);
    *  - `salts` = how many ways the residual occupancy at that prefix
    *    must split so one block's quadratic verify loop stays ~one
    *    task's worth of CPU (`ceil(occupancy / targetRowsPerBlock)`,
    *    where occupancy is the worst 3-band NEIGHBORHOOD of the actual
    *    (prefix, length-band) blocking key — pass the join's `maxDist`
    *    so the measured bands are the bands [[blockedFuzzyJoin]]
    *    builds).
    *
    * The aggregate is a single scan producing one row (`pMax + 1`
    * longs) — the same small-by-construction driver scalar as the
    * quality-threshold percentile. Integer arithmetic throughout so an
    * oracle can replay the derivation exactly (`n div max(d_p, 1)`).
    */
  /** `partitions` is the derived shuffle granularity for the verify
    * join ([[deriveShufflePartitions]] over the join's own byte
    * volume) — it never changes results, only layout, so oracles
    * ignore it. */
  final case class FuzzyBlocking(prefixLen: Int, salts: Int,
                                 partitions: Int = 0)

  def deriveFuzzyBlocking(df: DataFrame, c: String,
                          targetRowsPerBlock: Long = 200,
                          pMax: Int = 4,
                          maxDist: Int = 4): FuzzyBlocking = {
    require(targetRowsPerBlock >= 1, "targetRowsPerBlock must be >= 1")
    require(pMax >= 1, "pMax must be >= 1")
    val aggs = (1 to pMax).map(p =>
      count_distinct(substring(col(c), 1, p)).as(s"d$p")) :+
      sum(octet_length(col(c))).as("kb")
    val row = df.agg(count(lit(1)).as("n"), aggs: _*).head()
    val n = row.getLong(0)
    val keyBytes = if (row.isNullAt(pMax + 1)) 0L else row.getLong(pMax + 1)
    val occ = (1 to pMax).map(p => n / math.max(row.getLong(p), 1L))
    val p = occ.indexWhere(_ <= targetRowsPerBlock) match {
      case -1 => pMax
      case i  => i + 1
    }
    // salts must bound the WORST block, not the average: a corpus whose
    // head token dominates ('customer ...' on this testdata) puts a
    // quadratic verify loop on one task no matter how good the expected
    // occupancy looks (measured at the 100× replica: expected occ 29 at
    // p=8 but one 9153-row block = 42 M pairs on a single core). One
    // more cheap aggregate — max occupancy over the ACTUAL blocking key
    // (prefix, length band), with band width tied to the SAME
    // max(maxDist, 1) blockedFuzzyJoin will use, so the measured blocks
    // are the blocks the join builds. A task's verify loop pairs a left
    // block against the right side's band ±1 neighborhood, so the
    // occupancy that must split is the 3-band NEIGHBORHOOD sum, not the
    // single band — the self-join below runs on the already-aggregated
    // block-count table (|prefixes|×|bands| rows, tiny by construction).
    val w = math.max(maxDist, 1)
    val blockCounts = df
      .groupBy(substring(col(c), 1, p).as("__c"),
        (length(col(c)) / w).cast("long").as("__b"))
      .count()
    val nbr = blockCounts.select(col("__c"), col("__b"), col("count"))
      .join(blockCounts.select(col("__c").as("__c2"), col("__b").as("__b2"),
          col("count").as("__n2")),
        col("__c") === col("__c2") && abs(col("__b") - col("__b2")) <= 1)
      .groupBy(col("__c"), col("__b")).agg(sum(col("__n2")).as("__nbr"))
      .agg(max(col("__nbr"))).head()
    // empty input → max over zero groups is null → no salting needed
    val maxOcc = if (nbr.isNullAt(0)) 0L else nbr.getLong(0)
    val salts =
      ((maxOcc + targetRowsPerBlock - 1) / targetRowsPerBlock).max(1L)
    // verify-join shuffle granularity from the join's own byte volume
    // (VERDICT r9 #4): each side's sorted stream carries the key
    // string plus ~48 B of ids/blocking columns, and the right side
    // triples through the band ±1 explode — ×4 bounds left + exploded
    // right (hot-only salting adds replication proportional to hot
    // mass, already inside the slack). At gate scale this degenerates
    // to the session constant (plan unchanged).
    val joinBytes = (keyBytes + 48L * n) * 4L
    val np = deriveShufflePartitions(df.sparkSession, joinBytes)
    FuzzyBlocking(p, salts.toInt, np)
  }

  /** Blocked fuzzy (edit-distance) join — the record-linkage primitive
    * at corpus scale, replacing the all-pairs cross join with a plain
    * shuffle EQUI-join on a blocking key (first char × length band).
    *
    * Band completeness is exact: `levenshtein ≤ maxDist` implies the
    * lengths differ by ≤ maxDist, and with band width = maxDist two
    * such lengths land in the same or adjacent bands — the right side
    * emits its own band ±1, so every length-compatible pair meets in
    * exactly one (char, band) block (no post-join dedup needed). The
    * deliberate recall trade-off is the first-char key: pairs whose
    * first characters differ are never candidates — the standard
    * blocking compromise; the MinHash pipeline (DedupQueries) is the
    * high-recall alternative when that matters. Cost scales with
    * block-local pair counts instead of n², and the join shuffles on
    * (char, band) like any equi-join — no cartesian, no theta join.
    *
    * Output = all left columns + all right columns + `distCol` (long
    * edit distance ≤ maxDist); names must not collide.
    *
    * `prefixLen` sets the blocking prefix length (default 1 char).
    * The blocking-key space is FIXED (prefix alphabet × length bands),
    * so block-local pair counts grow quadratically with the corpus —
    * at larger scale, raise `prefixLen` (each extra char multiplies
    * key cardinality by the alphabet size and divides per-block pairs
    * accordingly, at the documented recall trade-off: pairs whose
    * edit distance touches the prefix are missed).
    *
    * `salts > 1` additionally splits each block's LEFT side across
    * `salts` sub-keys (right side replicated per salt) — the result
    * set is identical, but a boilerplate-heavy hot block's n_l × n_r
    * edit-distance work spreads over `salts` tasks instead of one.
    * The right-side replication cost is `salts ×` on the (id, key)
    * projection only, the standard trade for bounding the straggler;
    * AQE's skew split does the same for reducer-side bytes but cannot
    * split the per-task CPU of one hot block's quadratic verify loop.
    */
  def blockedFuzzyJoin(left: DataFrame, right: DataFrame,
                       leftCol: String, rightCol: String,
                       maxDist: Int, distCol: String = "dist",
                       salts: Int = 1, prefixLen: Int = 1,
                       saltHotOnlyAbove: Long = 0L,
                       partitions: Int = 0): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(salts >= 1, "salts must be >= 1")
    require(prefixLen >= 1, "prefixLen must be >= 1")
    val dup = left.columns.intersect(right.columns)
    require(dup.isEmpty,
      s"left/right column names must not collide: ${dup.mkString(", ")}")
    val reserved = Seq("__c", "__b", "__b0", "__s", "__hot", distCol)
    val clash = (left.columns ++ right.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"columns collide with blockedFuzzyJoin internals: ${clash.mkString(", ")}")
    val w = math.max(maxDist, 1)
    // int/int Column division is double; cast(long) truncates = floor
    // for the non-negative lengths here
    val l0 = left
      .withColumn("__c", substring(col(leftCol), 1, prefixLen))
      .withColumn("__b", (length(col(leftCol)) / w).cast("long"))
    val r0 = right
      .withColumn("__c", substring(col(rightCol), 1, prefixLen))
      .withColumn("__b0", (length(col(rightCol)) / w).cast("long"))
      .withColumn("__b",
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    // `saltHotOnlyAbove > 0` = salt ONLY the blocks whose left-side
    // occupancy exceeds the threshold. Flat salting replicates the
    // whole right side `salts`×, which scales with the CORPUS; the hot
    // blocks of a head-heavy corpus are a broadcastable handful of
    // keys, so conditional salting makes the replication scale with
    // the HOT MASS instead (the 100× replica: 69 M → ~7 M salted right
    // rows for the same per-task pair bound). Cold blocks keep salt 0
    // on both sides — the pair set is bit-identical either way.
    // Salt assignment hashes the WHOLE left row (every left column,
    // which in practice includes the caller's stable id) rather than
    // the key alone: an exact-duplicate-heavy hot block (many copies of
    // ONE string) would otherwise send every row to the same salt and
    // keep its straggler despite salts=N. The hash is DETERMINISTIC in
    // row content — a recomputed map task under a partial stage retry
    // re-draws the identical salt, so the result is stable on a
    // 1000-executor deployment with fetch-failure recomputation (the
    // SPARK-23207 hazard a monotonically_increasing_id() component
    // would reintroduce: nondeterministic shuffle keys under partial
    // recompute). The residual caveat is FULLY identical left rows (no
    // distinguishing id): those share a salt — they are exact
    // duplicates, which the dedup battery removes upstream.
    def saltOf = pmod(
      xxhash64(left.columns.map(col).toSeq: _*), lit(salts))
    val (l, r) =
      if (salts == 1) (l0.withColumn("__s", lit(0L)),
        r0.withColumn("__s", lit(0L)))
      else if (saltHotOnlyAbove <= 0L)
        (l0.withColumn("__s", saltOf),
          r0.withColumn("__s", explode(sequence(lit(0L), lit(salts - 1L)))))
      else {
        val hot = l0.groupBy(col("__c"), col("__b"))
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") > saltHotOnlyAbove)
          .select(col("__c"), col("__b"), lit(1).as("__hot"))
        val lS = l0.join(broadcast(hot), Seq("__c", "__b"), "left")
          .withColumn("__s", when(col("__hot").isNotNull,
            saltOf).otherwise(lit(0L)))
          .drop("__hot")
        val rS = r0.join(broadcast(hot), Seq("__c", "__b"), "left")
          .withColumn("__s", explode(when(col("__hot").isNotNull,
            sequence(lit(0L), lit(salts - 1L))).otherwise(array(lit(0L)))))
          .drop("__hot")
        (lS, rS)
      }
    // `partitions > 0` (deriveFuzzyBlocking's third knob) widens the
    // verify join's shuffle so per-task sorted streams of key strings
    // fit executor memory at replica scale — the q_graph_triangles
    // derived-granularity rule (VERDICT r9 #4). The explicit
    // repartition by the join keys REPLACES the join's own exchanges
    // (the join consumes the partitioning), so gate-scale plans are
    // unchanged when the derivation degenerates to the session
    // constant. Results are identical at any partition count
    // (ScaleOpsSpec pins this).
    val lj = widenIfAbove(l, partitions, col("__c"), col("__b"), col("__s"))
    val rj = widenIfAbove(r, partitions, col("__c"), col("__b"), col("__s"))
    lj.join(rj, Seq("__c", "__b", "__s"))
      // levenshtein(a,b) >= |len(a)-len(b)|: reject on the cheap length
      // probe before any DP table is built
      .filter(abs(length(col(leftCol)) - length(col(rightCol))) <= maxDist)
      // thresholded levenshtein runs the banded O(n·maxDist) algorithm
      // (vs O(n·m) full DP) and returns -1 past the threshold — identical
      // kept rows, ~len/(2·maxDist+1)× less work per pair
      .withColumn(distCol,
        levenshtein(col(leftCol), col(rightCol), maxDist).cast("long"))
      .filter(col(distCol) >= 0)
      .drop("__c", "__b", "__s")
  }

  /** What a dedup job is being asked to do — the advisor's input
    * alongside the corpus aggregates (VERDICT r10 #8). */
  sealed trait DedupTask
  /** Byte-identical (or canonicalized) content duplicates. */
  case object ExactContent extends DedupTask
  /** Set-similarity near-duplicates at a Jaccard `threshold`;
    * `exactRecall` = the caller needs every qualifying pair
    * (contamination / legal holds), not a sketch's recall. */
  final case class SetSimilarity(threshold: Double,
                                 exactRecall: Boolean) extends DedupTask
  /** Edit-distance matching (record linkage) within `maxDist`. */
  final case class EditDistance(maxDist: Int, q: Int = 2) extends DedupTask

  /** Corpus aggregates the advisor decides from — all already computed
    * by the derivation helpers (one cheap scan):
    * `n` rows, `avgShinglesPerDoc` (tokens or q-grams per key),
    * `distinctShingles` (vocabulary size), `worstBlockOccupancy` (max
    * rows sharing the coarsest blocking key — deriveFuzzyBlocking's
    * neighborhood aggregate). */
  final case class DedupCorpusStats(n: Long, avgShinglesPerDoc: Double,
                                    distinctShingles: Long,
                                    worstBlockOccupancy: Long)

  /** The advisor's verdict: which operator, the predicted candidate
    * volume its verify stage will face, and the rule that fired —
    * LOG-ONLY (no plan changes): a driver logs this line before
    * launching the job, and a human reads it when the job misbehaves. */
  final case class DedupAdvice(operator: String, predictedCandidates: Long,
                               rationale: String)

  /** Corpus geometry for the ANN encoding decision: `totalSse` =
    * Σ‖v − μ‖² (variance around the global mean), `withinSse` =
    * Σ‖v − c(v)‖² (residual variance after the trained IVF cells) —
    * both one-aggregate cheap ([[ExtraSimilarityQueries
    * .annGeometryStats]]). Their ratio is the fraction of corpus
    * variance the cell structure explains — the single number that
    * separates manifold-shaped embedding corpora from isotropic
    * ones. */
  final case class AnnCorpusStats(n: Long, cells: Long,
                                  totalSse: Double, withinSse: Double) {
    def explained: Double =
      if (totalSse <= 0) 0.0 else 1.0 - withinSse / totalSse
  }

  final case class AnnAdvice(encoding: String, explained: Double,
                             rationale: String, m: Int = 8,
                             nprobe: Int = 4)

  /** Measured IVF routing-recall-vs-nprobe curve — (nprobe, routing
    * recall@10, scanned corpus fraction) — on 64 trained cells over
    * the near-isotropic 10× replica (`bench/ann_curve_10x_r14.jsonl`
    * ivf_curve rows). Routing recall is the CEILING any encoding can
    * reach at that candidate volume, so this curve prices the nprobe
    * knob (VERDICT r16 #4). On the clustered K=32 geometry routing
    * saturates far earlier — measured 1.000 at nprobe=4
    * (`bench/clustered_ann_r14.jsonl`, the ResidualCeilingProbe
    * routing ceiling) — so the isotropic curve is the conservative
    * side and the clustered branch pins nprobe=4. */
  val MeasuredRoutingRecallByNprobe: Seq[(Int, Double, Double)] =
    Seq((1, 0.917, 0.016), (2, 0.926, 0.032), (4, 0.946, 0.064),
      (8, 0.956, 0.128), (16, 0.968, 0.255))

  /** Measured residual-recall-vs-m curve on the clustered K=32
    * geometry (trained sub-codebooks, ks=256, fixed 64-cell/nprobe-4
    * routing — `bench/clustered_ann_r15.jsonl`): recall@10 0.373 at
    * m=8 vs 0.651 at m=16, at 2× the code bytes (still 16× under raw
    * vectors). The r15 ceiling sweep showed m — not training depth
    * (saturates at ~2 iterations: 0.373 → 0.375 from 2 → 8 iters) nor
    * the OPQ-lite permutation (−0.8 to −2.4 pts, an honest null on
    * i.i.d.-shaped residuals) — is the knob that moves residual
    * recall, so the advisor surfaces it (VERDICT r15 #3). Keys are m,
    * values the measured clustered-geometry recall floor. */
  val MeasuredResidualRecallByM: Seq[(Int, Double)] =
    Seq(8 -> 0.373, 16 -> 0.651)

  /** Raw-PQ recall on the near-isotropic gate corpus at m=8
    * (`q_ann_pq_trained_recall` tier, 10× replica measurements
    * `bench/ann_curve_10x_r14.jsonl`: 0.908–0.920) — the baseline the
    * isotropic branch prices m against. */
  val MeasuredIsotropicRecallM8: Double = 0.90

  /** Cell-explained-variance crossover for the PQ encoding choice,
    * calibrated r14 from BOTH measured geometries
    * (`bench/clustered_ann_r14.jsonl` + `bench/ann_curve_10x_r14
    * .jsonl`, identical trained routing + candidate sets per pair):
    *
    *  - clustered K=32 mixture (measured explained 0.89–0.98 across
    *    sigma 0.35/0.15): residual codes 0.32–0.38 recall vs raw
    *    0.06–0.10 — a 5–6× multiplier;
    *  - near-isotropic `embeddings` corpus (measured explained 0.14
    *    at the 10× replica over the same 64 trained cells): residual
    *    0.911–0.917 vs raw 0.908–0.920 — within noise of each other,
    *    not worth the nprobe× LUT.
    *
    * 0.5 is the interpolated midpoint of [0.14, 0.89]; as with
    * [[EdJoinCandidateBudgetPerRow]] the SIGN on each side is
    * measured, so any threshold inside the bracket routes both
    * measured geometries to their winners. */
  val ResidualExplainedThreshold: Double = 0.5

  /** One documented decision procedure for the ANN tier, mirroring
    * [[adviseDedup]]: raw-PQ vs RESIDUAL-PQ from measured cell
    * geometry, with the trained-codebook precondition the clustered
    * probe exposed (training below the mode count collapses onto
    * heavy modes — measured 0.011 → 0.003 at ks=16 vs K=32), plus the
    * subspace-count recommendation the r15 ceiling sweep calibrated:
    * given `recallTarget`, pick the smallest measured m whose
    * clustered-geometry recall floor meets it
    * ([[MeasuredResidualRecallByM]]) — "a user at 0.38 should double
    * m before touching training depth or decomposition". */
  /** Per-dimension variance imbalance (max/min over dims) above which
    * the advisor recommends the variance-balancing SNAKE subspace
    * permutation before anything else. Calibrated r16 from both
    * measured spectra (`bench/clustered_ann_r16.jsonl`,
    * `ResidualCeilingProbe`): at ratio ≈ e⁶ ≈ 400 (decaying spectrum,
    * both correlated modes) the free permutation bought +0.33–0.35
    * recall@10 at m=8 and +0.19–0.21 at m=16 — the largest single
    * effect in the sweep — while at ratio ≈ 1 (the i.i.d. r15 legs)
    * it was a two-sided null (−0.8 to −2.4 pts). As with
    * [[EdJoinCandidateBudgetPerRow]] the SIGN on each side is
    * measured and the bracket [1, 400] is wide; 4 sits at "imbalance
    * beyond what one codebook can absorb" and routes both measured
    * geometries to their winners. The same sweep measured the two
    * things NOT to do: a learned global PCA rotation added ≤0.013
    * over the permutation on both correlated geometries (pooled
    * covariance of per-cluster-correlated mixtures is near-diagonal —
    * only per-cluster rotation, full LOPQ, could see it), and Ge et
    * al.'s product (log-eigenvalue) allocation criterion landed at
    * plain-slicing level, 35 pts under raw-variance balance — it is
    * the Gaussian high-rate optimum and mixture residuals are not
    * Gaussian. */
  val SpectrumBalanceThreshold: Double = 4.0

  def adviseAnn(stats: AnnCorpusStats, ks: Long,
                recallTarget: Double = 0.0,
                spectrumRatio: Double = 1.0): AnnAdvice = {
    require(stats.n >= 0 && stats.cells > 0)
    val e = stats.explained
    // ONE CLAUSE PER KNOB (VERDICT r16 wrong #2): encoding, then
    // permutation / m / nprobe / ks in a fixed order, each citing its
    // measuring artifact, joined with "; " — no knob is mentioned
    // without a measured recommendation attached
    val permClause =
      if (spectrumRatio >= SpectrumBalanceThreshold) Some(
        f"spectrum max/min $spectrumRatio%.0f ≥ $SpectrumBalanceThreshold%.0f: apply the " +
          "variance-balancing snake subspace permutation FIRST — free, " +
          "+0.33@m=8/+0.20@m=16 measured on decaying spectra; learned " +
          "rotation and product-criterion allocation measured ≤0 over " +
          "it (clustered_ann_r16.jsonl)")
      else None
    val ksClause =
      if (ks < stats.cells) Some(
        s"WARNING ks=$ks < cells=${stats.cells}: train the codebook " +
          "only at ks above the mode count (q_ann_pq_trained_recall " +
          "inverted below it on the clustered probe)")
      else None
    if (e >= ResidualExplainedThreshold) {
      // m is the priced dial on clustered geometry: smallest measured
      // point meeting the target; past the measured ceiling the honest
      // advice is the largest measured m plus the ceiling's number
      val (mPick, _) = MeasuredResidualRecallByM
        .find { case (_, r) => r >= recallTarget }
        .getOrElse(MeasuredResidualRecallByM.last)
      val mClause =
        if (recallTarget > MeasuredResidualRecallByM.last._2)
          f"m=$mPick%d is the measured ceiling (recall ${MeasuredResidualRecallByM.last._2}%.3f " +
            f"< target $recallTarget%.2f) — the loss past it is PQ " +
            "quantization, not routing (bench/clustered_ann_r15.jsonl); " +
            "the unpriced next instrument is per-cluster LOPQ, not a knob " +
            "this advisor can recommend"
        else
          f"m=$mPick%d meets the $recallTarget%.2f target (measured " +
            MeasuredResidualRecallByM.map { case (m, r) => f"$r%.3f@m=$m" }
              .mkString(" -> ") +
            " at 2x code bytes per doubling; training saturates ~2 iters, " +
            "permutation a null on FLAT spectra — m is the knob, " +
            "bench/clustered_ann_r15.jsonl)"
      // routing is measured SATURATED on this geometry — nprobe=4 is
      // where the clustered probes hit recall 1.000 at 6.4 % scanned;
      // raising it past saturation only multiplies candidate volume
      val npClause =
        "nprobe=4: routing recall measured 1.000 at nprobe=4 on " +
          "clustered geometry (clustered_ann_r14.jsonl routing ceiling) " +
          "— raising nprobe buys nothing measured here"
      AnnAdvice("residual_pq", e,
        (Seq(f"cells explain ${e * 100}%.0f%% of corpus variance — raw " +
          "codes would re-encode cluster structure the IVF routing " +
          "already paid for; residual encoding measured 5-6x recall at " +
          "identical candidate volume (q_ann_ivfpq_residual_recall)") ++
          permClause ++ Seq(mClause, npClause) ++ ksClause)
          .mkString("; "),
        m = mPick, nprobe = 4)
    } else {
      // near-isotropic: m=8 raw already measures ~0.91 — doubling m
      // only pays past that measured floor
      val mPick = if (recallTarget > MeasuredIsotropicRecallM8) 16 else 8
      // nprobe from the measured routing curve: the smallest point
      // whose routing CEILING meets the target (an encoding cannot
      // out-recall its routing), with the scanned fraction it costs
      val (npPick, npRecall, npFrac) = MeasuredRoutingRecallByNprobe
        .find { case (_, r, _) => r >= recallTarget }
        .getOrElse(MeasuredRoutingRecallByNprobe.last)
      val npClause =
        if (recallTarget > MeasuredRoutingRecallByNprobe.last._2)
          f"nprobe=$npPick%d is the measured routing ceiling " +
            f"($npRecall%.3f@nprobe=$npPick at ${npFrac * 100}%.1f%% scanned < " +
            f"target $recallTarget%.2f) — past it the measured option is " +
            "brute force (100% scanned), ann_curve_10x_r14.jsonl"
        else
          f"nprobe=$npPick%d: routing recall measured $npRecall%.3f at " +
            f"${npFrac * 100}%.1f%% of corpus scanned — the smallest " +
            "measured point whose routing ceiling meets the target " +
            "(ann_curve_10x_r14.jsonl ivf_curve; encoding cannot " +
            "out-recall its routing)"
      AnnAdvice("raw_pq", e,
        (Seq(f"cells explain only ${e * 100}%.0f%% of corpus variance — " +
          "near-isotropic geometry, residual re-centering buys ~nothing " +
          "and costs an nprobe-times larger LUT (q_ann_ivfpq_recall)",
          f"m=$mPick%d (raw m=8 measured ~${MeasuredIsotropicRecallM8}%.2f recall " +
            "on this geometry, ann_curve_10x_r14.jsonl)") ++
          permClause ++ Seq(npClause) ++ ksClause)
          .mkString("; "),
        m = mPick, nprobe = npPick)
    }
  }

  /** Codebook-drift verdict for the incremental ANN path
    * (VERDICT r15 #2): a 100 TB corpus appends batches daily against a
    * FROZEN codebook ([[graft.operators.ExtraSimilarityQueries]]'
    * `q_ann_incremental` contract — assignment is a pure function of
    * the frozen centers, so batch codes equal a full-rebuild's), and
    * the operational question is WHEN to retrain. The statistic is the
    * one [[annGeometryStats]] already computes, evaluated on the
    * arrivals batch against the frozen cells: if the frozen codebook
    * explains much less of the batch's variance than it explained of
    * the corpus it was trained on, the batch has drifted off the
    * trained cell structure and recall decays like the UNtrained
    * operating points the probes measured. */
  final case class AnnDriftAdvice(retrain: Boolean, corpusExplained: Double,
                                  batchExplained: Double, rationale: String)

  /** Retrain when the frozen cells explain this many absolute points
    * less of the batch variance than of the training corpus. 0.1 sits
    * well inside the measured decision gap: the advisor's two
    * calibrated geometries are 0.75 apart (0.89 clustered vs 0.14
    * isotropic), and the gates' own explained values are stable to
    * ±0.02 across replicas — a 10-point drop is far above measurement
    * noise yet fires long before the batch looks isotropic to cells
    * trained on clustered data. */
  val AnnDriftMargin: Double = 0.1

  def adviseAnnDrift(corpus: AnnCorpusStats,
                     batch: AnnCorpusStats): AnnDriftAdvice = {
    val (ce, be) = (corpus.explained, batch.explained)
    val drifted = be < ce - AnnDriftMargin
    AnnDriftAdvice(drifted, ce, be,
      if (drifted)
        f"frozen cells explain ${be * 100}%.0f%% of batch variance vs " +
          f"${ce * 100}%.0f%% of the training corpus — drop exceeds the " +
          f"$AnnDriftMargin%.2f margin: retrain the codebook before the " +
          "next index build (assign-only ingest remains correct meanwhile)"
      else
        f"frozen cells explain ${be * 100}%.0f%% of batch variance " +
          f"(corpus ${ce * 100}%.0f%%) — within the $AnnDriftMargin%.2f " +
          "margin: keep assigning to the frozen codebook")
  }

  /** Tombstone-delete over an incremental index table (VERDICT r16
    * missing #2): the delete dual of the frozen-codebook append. A
    * 100 TB pipeline takes removals — takedowns, right-to-be-
    * forgotten, retracted crawls — and rebuilding the index per
    * takedown is the same full-corpus pass the incremental ingest
    * exists to avoid. Instead deleted ids live in a tombstone table
    * and every index read subtracts them with ONE anti-join. Because
    * postings (cells/codes rows) are pure per-id functions of the
    * FROZEN codebook, `index ∖ tombstones` is exactly the index a
    * from-scratch rebuild over the surviving ids would produce —
    * `q_ann_delete` PROVES that equality cross-engine (the DuckDB
    * oracle rebuilds without the deleted rows; hash match =
    * tombstone==rebuild, the exact dual of `q_ann_incremental`'s
    * ingest proof).
    *
    * Scale shape: the tombstone set is takedown-sized (≪ corpus) —
    * broadcast it so the anti-join is a map-side hash probe on every
    * index partition, no shuffle of the index itself. A tombstone set
    * too big to broadcast is past [[CompactionTombstoneFraction]]
    * anyway — compact instead of carrying it. */
  def tombstone(index: DataFrame, tombstones: DataFrame,
                idCol: String): DataFrame =
    index.join(broadcast(tombstones.select(col(idCol)).distinct()),
      Seq(idCol), "left_anti")

  final case class CompactionAdvice(tombstoneFraction: Double,
                                    compact: Boolean, rationale: String)

  /** Compact (rewrite the index tables without dead postings) once
    * tombstones exceed this fraction of indexed ids. The tradeoff:
    * carrying tombstones costs every query a broadcast-hash probe per
    * candidate plus scanning dead postings — wasted candidate work is
    * f/(1−f) of the live work, so at 0.2 every read scans 25 % dead
    * rows forever — while compaction is a ONE-TIME map-only filter
    * pass over the index tables (no shuffle: the anti-join broadcasts
    * the tombstones, partitioning is preserved). One-pass rewrite vs
    * a perpetual 25 % read tax is the standard LSM/segment-merge
    * break-even region. MEASURED in both regimes on the gates' own
    * 10× frozen-codebook index (`TombstoneCarryProbe`): cached —
    * rewrite 0.28–0.71 s (one anti-join map pass), break-even 2–3
    * reads (`bench/tombstone_carry_r17.jsonl`); cold-file (r18,
    * parquet-resident index, REAL parquet rewrite) — the rewrite
    * triples to 0.88–1.22 s but the carry tax grows too on the
    * decode-bound scans, so break-even stays 2–6 reads
    * (`bench/tombstone_carry_r18.jsonl`, page-cache-resident files:
    * a lower bound on a true cold object store). In both measured
    * regimes compaction pays for itself within a handful of reads —
    * 0.2 is the conservative carry bound. */
  val CompactionTombstoneFraction: Double = 0.2

  /** Decide tombstone-carry vs compaction from the two row counts a
    * pipeline already has (index metadata, not a corpus scan).
    * `indexedIds` counts ALL ids the index holds INCLUDING the
    * tombstoned ones — tombstones are a subset of the index by
    * construction, so f ≤ 1 always; the requires make a live-only
    * miscount fail loudly instead of printing an Infinity/negative
    * dead-posting percentage (review r17). f = 1 — an entirely
    * retracted crawl — is a LEGITIMATE state (ADVICE r17 #4): it
    * short-circuits to compact (the rewrite is a truncate; carrying
    * means every read scans only dead postings) without touching the
    * f/(1−f) read-tax formula, which is meaningless at f = 1. */
  def adviseCompaction(indexedIds: Long,
                       tombstonedIds: Long): CompactionAdvice = {
    require(indexedIds > 0, "adviseCompaction: empty index")
    require(tombstonedIds >= 0 && tombstonedIds <= indexedIds,
      s"adviseCompaction: tombstonedIds=$tombstonedIds must be in " +
        s"[0, indexedIds=$indexedIds] — indexedIds counts the whole " +
        "index INCLUDING tombstoned rows")
    if (tombstonedIds == indexedIds)
      return CompactionAdvice(1.0, compact = true,
        "every indexed id is tombstoned (a fully-retracted index): " +
          "compact now — the rewrite is a truncate of cells+codes, " +
          "and carrying would make every read scan only dead postings")
    val f = tombstonedIds.toDouble / indexedIds
    val compact = f >= CompactionTombstoneFraction
    CompactionAdvice(f, compact,
      if (compact)
        f"tombstones are ${f * 100}%.0f%% of indexed ids (≥ " +
          f"${CompactionTombstoneFraction * 100}%.0f%%): every read now " +
          f"scans ${f / (1 - f) * 100}%.0f%% dead postings — compact " +
          "(one map-only anti-join rewrite of cells+codes, tombstone " +
          "table then truncated)"
      else
        f"tombstones are ${f * 100}%.0f%% of indexed ids (< " +
          f"${CompactionTombstoneFraction * 100}%.0f%%): carry the " +
          "broadcast anti-join — a rewrite pass costs more than the " +
          f"${f / (1 - f) * 100}%.0f%% dead-posting read tax it removes")
  }

  /** One documented decision procedure for the dedup tier
    * (VERDICT r10 #8) — the rules the repo's operators each derive
    * locally (deriveFuzzyBlocking, deriveShufflePartitions, the PPJoin
    * prefix bound, the Ed-Join gram bound), collapsed into a single
    * driver-side function over the SAME corpus aggregates. Integer
    * arithmetic; every branch names the operator battery row that
    * gates it.
    *
    * The shared primitive is the mean postings-list length
    * `avgDf = n·shingles / vocab`: a prefix gram meets ~avgDf partners,
    * so candidate volume ≈ rows × prefix length × avgDf — the quantity
    * that actually bounds the verify stage, which a FIXED blocking key
    * (first-char × band) cannot bound because its candidate count
    * grows with the worst block's occupancy squared (the r10 lesson
    * that made blockedFuzzyJoin `weak`). */
  /** Qgram-vs-segment crossover for the EditDistance branch, in
    * predicted CANDIDATES PER ROW — calibrated from BOTH sides at the
    * same ~5e5-row scale in one r13 session (48 g, single-box quiet;
    * `bench/entropy_h2h_r13.jsonl` + `bench/fuzzy_remeasure_100x_r13
    * .jsonl`):
    *
    *  - gram-DIVERSE corpus (base64 keys, avgDf 1, 17 cand/row):
    *    qgram 19.2 s vs segment 52.5 s — qgram wins 2.7×;
    *  - LOW-ENTROPY corpus (first-4-words keys, avgDf 3 090,
    *    52 530 cand/row): qgram 967.1 s vs segment 430.9 s — segment
    *    wins 2.2× (identical 5 448 501 matches on both, exactness
    *    cross-checked).
    *
    * Under a linear-in-avgDf cost model for both operators (qgram's
    * verify volume IS n·(qd+1)·avgDf; segment's verify volume grows
    * with key-collision counts, measured at the same two points), the
    * equal-cost point sits at avgDf ≈ 181, i.e. ≈ 3 000 candidates
    * per row at the derived (q = 4, d = 4) — replacing the
    * unvalidated 64 the advisor shipped with (VERDICT r12 #1).
    *
    * VALIDATED AT THE BOUNDARY in r14 (VERDICT r13 #5,
    * `graft.examples.MidEntropyCrossover`,
    * `bench/midentropy_crossover_r14.jsonl`): tunable-gram-vocab
    * corpora (20-char keys over restricted alphabets, 520 k rows,
    * identical match sets asserted) at avgDf 55 / 174 / 230 / 426 —
    * the advisor routed ALL FOUR to their measured winners, the two
    * straddling points (2 958 and 3 910 cand/row) included, and at
    * avgDf 174 the measured walls agree within 5 % (qgram 63.7 s vs
    * segment 67.1 s): the interpolated crossover is where the real
    * one is. ScaleOpsSpec feeds all the measured stat rows through
    * the advisor and pins the winners. */
  val EdJoinCandidateBudgetPerRow: Long = 3000L

  def adviseDedup(stats: DedupCorpusStats, task: DedupTask): DedupAdvice = {
    require(stats.n >= 0 && stats.distinctShingles >= 0)
    val n = stats.n
    val avgDf = math.max(1L,
      (n * stats.avgShinglesPerDoc).toLong / math.max(stats.distinctShingles, 1L))
    val brute = if (n <= 3000L) Some(n * n / 2) else None
    task match {
      // exact content FIRST: the digest groupBy is O(n) — the brute
      // all-pairs shortcut is never cheaper for plain equality, even
      // at gate scale (it exists for the similarity tasks, whose index
      // BUILD can cost more than n²/2 verifies on tiny corpora)
      case ExactContent =>
        DedupAdvice("exact_digest", n,
          "content equality needs one digest groupBy — shuffle carries " +
            "digests only, never text (q_dedup_exact / q_dedup_canonical)")
      case _ if brute.isDefined =>
        DedupAdvice("brute_force", brute.get,
          s"n=$n is gate-scale: the all-pairs join (${brute.get} pairs) is " +
            "cheaper than any index build (q_fuzzy_match / q_dedup_embed_cosine shape)")
      case EditDistance(d, q) =>
        val cand = n * (q.toLong * d + 1) * avgDf
        if (cand <= EdJoinCandidateBudgetPerRow * n)
          DedupAdvice("qgram_edit_join", cand,
            s"guaranteed recall at ed<=$d: candidates = n x (q*d+1) prefix " +
              s"grams x avgDf=$avgDf postings (q_fuzzy_match_qgram); the fixed " +
              s"first-char x band key would put worstBlock^2=" +
              s"${stats.worstBlockOccupancy * stats.worstBlockOccupancy} pairs " +
              "on one block and grows quadratically with the corpus " +
              "(q_fuzzy_match_blocked, the r10 weak row)")
        else
          // low-entropy corpus: gram postings are long (avgDf high), so
          // the gram prefix filter stops filtering — exact-substring
          // segment keys survive a small alphabet. Crossover measured
          // from BOTH sides; see [[EdJoinCandidateBudgetPerRow]].
          DedupAdvice("segment_edit_join", n * (2L * d + 1L) * (d + 1L),
            s"guaranteed recall at ed<=$d with gram postings too long to " +
              s"filter (avgDf=$avgDf puts qgram candidates at $cand > " +
              s"${EdJoinCandidateBudgetPerRow}n): disjoint-segment " +
              "pigeonholing keys on exact len/(d+1)-char " +
              "substrings; probe volume is n x (2d+1)(d+1) windowed " +
              "substrings and candidates scale with segment-key rarity " +
              "(q_fuzzy_match_segment)")
      case SetSimilarity(t, exactRecall) =>
        val prefixLen = math.max(1L,
          (stats.avgShinglesPerDoc * (1.0 - t)).toLong + 1L)
        val prefixCand = n * prefixLen * avgDf
        if (exactRecall || prefixCand <= 64L * n)
          DedupAdvice("prefix_filter_ppjoin", prefixCand,
            s"jaccard>=$t with zero false negatives: candidates = n x " +
              s"prefix=(1-t)*shingles+1=$prefixLen x avgDf=$avgDf " +
              "(q_dedup_prefix_filter; verify granularity via " +
              "deriveShufflePartitions)")
        else
          DedupAdvice("minhash_lsh", n * avgDf,
            s"prefix-filter candidates ($prefixCand) exceed the 64n verify " +
              "budget and sketch recall is acceptable: band-bucket equi-join " +
              "bounds candidates by bucket collisions ~ n x avgDf " +
              "(q_dedup_minhash / q_dedup_corpus)")
    }
  }

  /** Exact, bit-DETERMINISTIC quantiles of a long column — the
    * adaptive-policy primitive `approxQuantile` cannot provide
    * (VERDICT r10 #2): a Greenwald–Khanna sketch's result depends on
    * partition merge order, so a pipeline cutting at "the corpus' own
    * 2/3 quantile" was not oracle-replayable. This operator's result
    * depends only on the value MULTISET: type-1 / inverse-CDF
    * semantics, `value(p) = min v such that |{x ≤ v}| ≥ ceil(p·n)`,
    * nulls excluded.
    *
    * Returns one row per requested p: `(p double, value long)`.
    *
    * Scale shape: one map-side-combining groupBy collapses the corpus
    * to (value, count) rows, and the cumulative sum then runs over
    * DISTINCT values only — for integer-SCALED scores (the intended
    * callers: `floor(score·10⁴)` grids) that table is bounded by the
    * grid's span, not the corpus, so the single-partition ordered
    * window is a deliberate, bounded choice (the same
    * small-by-construction contract as the broadcast stat tables).
    * Totals and cut rows are 1-row broadcasts; corpus rows are never
    * globally sorted.
    *
    * Evaluation contract (ADVICE r12): this function is EAGER — the
    * total/cardinality aggregate runs at CALL time (one job over the
    * grouped counts), even if the returned DataFrame is never
    * executed, because the grid-contract check must observe the
    * distinct-value cardinality before the plan is handed back. All
    * in-tree callers execute the result immediately (the cut is a
    * driver scalar), so the former lazy 1-row-crossJoin plan bought
    * them nothing; a caller that needs laziness should compute the
    * cumulative table itself. */
  /** Distinct-value cardinality past which [[exactQuantiles]] warns:
    * the cumulative window runs single-partition over the distinct
    * table, so a caller violating the integer-grid contract (raw
    * high-cardinality longs) would silently serialize it through one
    * task — make the violation observable (ADVICE r11). */
  val ExactQuantilesGridWarnAt: Long = 10L * 1000 * 1000

  def exactQuantiles(df: DataFrame, c: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
      "quantile fractions must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val counts = df.filter(col(c).isNotNull)
      .groupBy(col(c).cast("long").as("v")).agg(count(lit(1)).as("cnt"))
    // one eager aggregate gives BOTH the total (previously a lazy
    // 1-row crossJoin — same number of passes over df either way) and
    // the distinct-value cardinality the grid contract needs checked
    val totRow = counts.agg(sum(col("cnt")).as("n"),
      count(lit(1)).as("nv")).head()
    val n = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    val nv = totRow.getLong(1)
    if (nv > ExactQuantilesGridWarnAt)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"exactQuantiles($c): $nv distinct values exceed the integer-grid " +
          s"contract bound ($ExactQuantilesGridWarnAt); the cumulative " +
          "window will serialize them through ONE task — scale the column " +
          "to a bounded grid (e.g. floor(score*1e4)) before calling")
    // distinct-value table: grid-bounded by contract (see scaladoc)
    val cum = counts.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("v"))))
    val ptab = df.sparkSession.createDataFrame(
      ps.map(Tuple1(_))).toDF("p")
    // ceil(p·n) in IEEE double then long — an oracle replays the same
    // expression bit-for-bit (CAST(ceiling(p * n) AS BIGINT))
    cum.crossJoin(broadcast(ptab))
      .filter(col("cum") >=
        ceil(col("p") * lit(n).cast("double")).cast("long"))
      .groupBy(col("p")).agg(min(col("v")).as("value"))
  }

  /** Shuffle granularity for [[qgramFuzzyJoin]]'s candidate join: one
    * cheap aggregate over the key column, sized from the PREFIX-gram
    * table the join actually shuffles — `q·maxDist + 1` rows per
    * string, each carrying the full key string plus ~48 B of id/gram
    * bookkeeping; the right side replicates ×9 through the band ×
    * position-bucket neighborhood explode (1 left + 9 right = ×10).
    * Degenerates to the session constant at gate scale like every
    * other derivation ([[deriveShufflePartitions]]). */
  def deriveQgramPartitions(df: DataFrame, c: String,
                            q: Int, maxDist: Int): Int = {
    val row = df.agg(count(lit(1)).as("n"),
      sum(octet_length(col(c))).as("kb")).head()
    val n = row.getLong(0)
    val keyBytes = if (row.isNullAt(1)) 0L else row.getLong(1)
    val prefixRows = q.toLong * maxDist + 1L
    deriveShufflePartitions(df.sparkSession,
      (keyBytes + 48L * n) * prefixRows * 10L)
  }

  /** DATA-derived gram width + shuffle granularity for
    * [[qgramFuzzyJoin]] (the deriveFuzzyBlocking pattern): recall is
    * exact for ANY q (the prefix theorem is width-independent), so q
    * is a PHYSICAL knob, and the right value is corpus-dependent —
    * the candidate volume a width buys is
    * `n · (q·maxDist+1) · avgDf(q)` where `avgDf(q) = grams/vocab(q)`
    * is the mean postings-list length. On the 10× replica the probe
    * measured exactly the predicted ordering (q=2: vocab 142,
    * avgDf 9591, 138.6 s; q=4: vocab 1782, avgDf 708, 52.7 s —
    * identical 210 429 pairs at every q; `QgramProbe`,
    * bench/qgram_q_10x.jsonl). Walks q upward while the predicted
    * volume keeps strictly improving; `qMax` defaults to 4 because
    * the short-string fallback absorbs keys under `q·(maxDist+1)`
    * chars — at q=5, d=4 that is 25 chars, swallowing typical
    * first-4-words keys whole. One cheap aggregate per candidate q
    * over the key projection. */
  def deriveQgramParams(df: DataFrame, c: String, maxDist: Int,
                        qMax: Int = 4): (Int, Int) = {
    require(qMax >= 1)
    val n = df.count() // hoisted: one count, not one per candidate q
    def predicted(q: Int): Long = {
      // guard sequence(1, 0): Spark's sequence DESCENDS when start >
      // stop, so an unguarded bound of 0 emits two phantom grams
      // (positions 1 and 0) for every string shorter than q, inflating
      // total/vocab and skewing avgDf (ADVICE r11)
      val grams = df.select(explode(transform(
        when(length(col(c)) >= q,
          sequence(lit(1), length(col(c)) - lit(q - 1)))
          .otherwise(array().cast("array<int>")),
        i => col(c).substr(i, lit(q)))).as("__g"))
      val row = grams.agg(count(lit(1)).as("t"),
        count_distinct(col("__g")).as("v")).head()
      val (total, vocab) = (row.getLong(0), row.getLong(1))
      n * (q.toLong * maxDist + 1L) * (total / math.max(vocab, 1L))
    }
    var q = 1
    var best = predicted(1)
    while (q < qMax && { val p = predicted(q + 1); p < best && { best = p; true } })
      q += 1
    (q, deriveQgramPartitions(df, c, q, maxDist))
  }

  /** Guaranteed-recall edit-distance join (Ed-Join family: Xiao, Wang,
    * Lin, VLDB'08 — positional q-grams + count/prefix filtering) — the
    * subquadratic replacement for [[blockedFuzzyJoin]]'s fixed
    * (first-chars × length-band) blocking key. Candidate volume here
    * scales with GRAM RARITY, not a fixed key alphabet, and recall is
    * EXACT: the result equals the brute-force
    * `levenshtein(l, r) ≤ maxDist` join on distinct input rows
    * (ScaleOpsSpec pins this against brute force; the battery gate's
    * oracle IS the brute-force join — the same contract as
    * DedupQueries.prefixFilterPairs for set similarity).
    *
    * Why it is exact (the theorem chain, self-contained):
    *  1. An edit operation destroys at most `q` of a string's
    *     positional q-grams, so `ed(s,t) ≤ d` implies a matching of
    *     ≥ `max(|Gs|,|Gt|) − q·d` gram pairs — equal gram value,
    *     positions within `d` (a preserved gram shifts ≤ d).
    *  2. Order every string's grams by the SHARED total order
    *     (corpus df, gram, position) and keep the first
    *     `q·d + 1` as its prefix. If some matched pair lands in both
    *     prefixes, the candidate equi-join on (gram, |Δpos| ≤ d)
    *     finds the pair. Otherwise the standard counting argument
    *     forces a matched pair (e ∈ prefix_s, f ∈ suffix_t) and one
    *     (e' ∈ suffix_s, f' ∈ prefix_t); the order chain
    *     key(e') = key(f') ≤ key(f) = key(e) ≤ key(e') collapses all
    *     four to ONE gram value, and the position chain
    *     p_e ≤ p_e' ≤ p_f' + d, p_f' ≤ p_f ≤ p_e + d then puts
    *     (e, f') — both IN their prefixes — within distance d. Either
    *     way the join emits the pair; banded `levenshtein` verify
    *     removes false positives, so result == brute force.
    *  3. Strings too short for the bound (`max(|Gs|,|Gt|) ≤ q·d`,
    *     i.e. BOTH sides shorter than `q·(d+1)` chars) carry no
    *     guarantee from grams — they go through a bounded
    *     length-band equi-join instead (band width d, right side
    *     explodes ±1: the [[blockedFuzzyJoin]] band-completeness
    *     argument with no prefix key at all). A short×long pair needs
    *     no fallback: the long side's bound gives overlap ≥ 1 and the
    *     short side's prefix is ALL its grams.
    *
    * Spark shape: gram df = one groupBy over the exploded grams of
    * both sides; per-string prefixes = groupBy(row) + sort_array +
    * slice (no window, no UDF — `transform`/`substr` build the gram
    * arrays in codegen); candidates = one equi-join on the gram
    * value; verify = thresholded banded levenshtein. Skew note: the
    * candidate join's hot keys are the df-RAREST grams by
    * construction — the df ordering is itself the skew defense, which
    * is exactly what the fixed first-char key could never provide.
    *
    * Contract differences vs [[blockedFuzzyJoin]]: input rows must be
    * DISTINCT on each side (callers join on a unique id; duplicate
    * rows would collapse to one candidate — the dedup battery removes
    * exact duplicates upstream), and output pair order is unspecified
    * (sort downstream).
    *
    * Output = all left columns + all right columns + `distCol`
    * (long edit distance ≤ maxDist); names must not collide.
    */
  def qgramFuzzyJoin(left: DataFrame, right: DataFrame,
                     leftCol: String, rightCol: String,
                     maxDist: Int, q: Int = 2,
                     distCol: String = "dist",
                     partitions: Int = 0): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    require(q >= 1, "q must be >= 1")
    val dup = left.columns.intersect(right.columns)
    require(dup.isEmpty,
      s"left/right column names must not collide: ${dup.mkString(", ")}")
    val reserved =
      Seq("__g", "__gp", "__df", "__pl", "__pr", "__pref", "__b", "__b0",
        distCol)
    val clash = (left.columns ++ right.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"columns collide with qgramFuzzyJoin internals: ${clash.mkString(", ")}")
    val d = maxDist
    val prefLen = q * d + 1
    val shortLen = q * (d + 1) // len < shortLen ⇔ gram count ≤ q·d

    // positional q-grams as an in-codegen array expression: element i
    // of the array is (substr(s, i, q), i) — no UDF, no explode yet
    // when-guarded: sequence(1, 0) would DESCEND to [1, 0] and emit two
    // phantom grams for strings shorter than q (recall-safe — such
    // strings ride the short fallback and verify removes false
    // positives — but the phantoms inflate the df table; ADVICE r11)
    def gramsOf(c: String): Column =
      transform(
        when(length(col(c)) >= q,
          sequence(lit(1), length(col(c)) - lit(q - 1)))
          .otherwise(array().cast("array<int>")),
        i => struct(col(c).substr(i, lit(q)).as("g"), i.as("p")))
    val lg = left.withColumn("__gp", gramsOf(leftCol))
    val rg = right.withColumn("__gp", gramsOf(rightCol))

    // the SHARED global order: corpus-wide gram document frequency over
    // BOTH sides (any fixed order preserves recall — df-ascending is
    // the Ed-Join performance choice: rare grams head the prefixes, so
    // candidate lists stay short)
    val dfTab = lg.select(explode(col("__gp")("g")).as("__g"))
      .unionByName(rg.select(explode(col("__gp")("g")).as("__g")))
      .groupBy(col("__g")).agg(count(lit(1)).as("__df"))

    // per-row prefix: explode positional grams, attach df, re-group by
    // the (distinct-by-contract) original row, sort by (df, gram, pos)
    // — the occurrence-consistent total order the theorem needs — and
    // keep the first q·d+1
    def prefixGrams(g: DataFrame, posAs: String): DataFrame = {
      val orig = g.columns.filter(_ != "__gp").map(col).toSeq
      g.select(orig :+ explode(col("__gp")).as("__gp"): _*)
        .select(orig :+ col("__gp")("g").as("__g")
          :+ col("__gp")("p").as("__p"): _*)
        .join(dfTab, "__g")
        .groupBy(orig: _*)
        .agg(slice(array_sort(collect_list(
          struct(col("__df"), col("__g"), col("__p")))), 1, prefLen)
          .as("__pref"))
        .select(orig :+ explode(col("__pref")).as("__gp"): _*)
        .select(orig :+ col("__gp")("__g").as("__g")
          :+ col("__gp")("__p").as(posAs): _*)
    }
    // Ed-Join's LOCATION filter moved INTO the join key: a preserved
    // gram shifts position by ≤ d and the pair's lengths differ by
    // ≤ d, so with bucket width d the partner's length band and
    // position bucket each differ by at most 1 — the right side emits
    // its 3×3 neighborhood (×9 replication of small rows) and the
    // equi-join key becomes (gram, band, posBucket), dividing each
    // gram's postings join by the occupied cell count instead of
    // filtering the products afterwards. A matching right row's 9
    // replicas land in 9 DISTINCT cells, so a pair still meets at
    // most once per shared prefix gram.
    val w = math.max(d, 1)
    val pl = prefixGrams(lg, "__pl")
      .withColumn("__b", (length(col(leftCol)) / w).cast("long"))
      .withColumn("__pb", (col("__pl") / w).cast("long"))
    val pr = prefixGrams(rg, "__pr")
      .withColumn("__b",
        explode(array((length(col(rightCol)) / w).cast("long") - 1,
          (length(col(rightCol)) / w).cast("long"),
          (length(col(rightCol)) / w).cast("long") + 1)))
      .withColumn("__pb",
        explode(array((col("__pr") / w).cast("long") - 1,
          (col("__pr") / w).cast("long"),
          (col("__pr") / w).cast("long") + 1)))
    // derived granularity for the candidate join (deriveQgramParams at
    // call sites): the explicit repartition REPLACES the join's own
    // exchange; no-op at gate scale (widenIfAbove)
    val plW = widenIfAbove(pl, partitions, col("__g"), col("__b"), col("__pb"))
    val prW = widenIfAbove(pr, partitions, col("__g"), col("__b"), col("__pb"))
    val gramCand = plW.join(prW, Seq("__g", "__b", "__pb"))
      .filter(abs(col("__pl") - col("__pr")) <= d)
      .drop("__g", "__b", "__pb", "__pl", "__pr")

    // short×short fallback (theorem step 3): bounded by construction —
    // every key here is < q·(d+1) chars
    val sl = left.filter(length(col(leftCol)) < shortLen)
      .withColumn("__b", (length(col(leftCol)) / w).cast("long"))
    val sr = right.filter(length(col(rightCol)) < shortLen)
      .withColumn("__b0", (length(col(rightCol)) / w).cast("long"))
      .withColumn("__b",
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val shortCand = sl.join(sr, Seq("__b")).drop("__b")

    // VERIFY before dedup: the candidate stream pipelines from the
    // join straight through the length probe and the banded
    // O(len·d) levenshtein inside one stage — it never shuffles. Only
    // the MATCHED pairs (tiny by comparison) reach the distinct, so
    // the dedup exchange carries matches, not candidates. A near-dup
    // pair meeting through k shared prefix grams is verified k times —
    // k ≤ q·d+1 extra verifies on the small matched set, orders less
    // work than shuffling the full candidate volume (measured 1.9× on
    // the 10× replica, bench/qgram_q_10x.jsonl).
    gramCand.unionByName(shortCand)
      .filter(abs(length(col(leftCol)) - length(col(rightCol))) <= d)
      .withColumn(distCol,
        levenshtein(col(leftCol), col(rightCol), math.max(d, 1))
          .cast("long"))
      .filter(col(distCol) >= 0 && col(distCol) <= d)
      .dropDuplicates()
  }

  /** Physical plan choice for [[segmentFuzzyJoin]]'s candidate join:
    * broadcast the (small, `maxDist+1` rows per string) segment index
    * when it fits a conservative heap fraction, else a derived-width
    * shuffle join. One cheap aggregate, the deriveFuzzyBlocking
    * pattern — recall does not depend on the choice. */
  final case class SegmentJoinPlan(broadcastIndex: Boolean, partitions: Int)

  /** Derive [[SegmentJoinPlan]] from the index-side key column: the
    * hydrated broadcast estimate is `maxDist+1` segment rows per
    * string, each carrying the original row (~key bytes + 48 B of id
    * bookkeeping) plus its segment slice, ×2 for JVM object overhead
    * in the in-memory relation. Broadcast while that fits a 1/16 heap
    * budget (every task slot holds one copy of the hashed relation
    * plus its probe stream); past it — the genuinely-large-left-side
    * regime a 100 TB corpus is in — fall back to a shuffle join whose
    * width comes from [[deriveShufflePartitions]] over the probe
    * table's in-flight bytes (≈ `(2·maxDist+1)²` windowed substring
    * rows per probe string, each carrying the full key). */
  def deriveSegmentJoin(df: DataFrame, c: String, maxDist: Int): SegmentJoinPlan = {
    val row = df.agg(count(lit(1)).as("n"),
      sum(octet_length(col(c))).as("kb")).head()
    val n = row.getLong(0)
    val keyBytes = if (row.isNullAt(1)) 0L else row.getLong(1)
    val m = maxDist.toLong + 1L
    val idxBytes = (keyBytes + 48L * n) * m * 2L
    val ss = df.sparkSession
    val heap = ss.conf.getOption("spark.executor.memory").map(parseJvmBytes)
      .getOrElse(Runtime.getRuntime.maxMemory)
    val probeRows = (2L * maxDist + 1L) * (2L * maxDist + 1L)
    val probeBytes = (keyBytes + 48L * n) * probeRows
    SegmentJoinPlan(idxBytes <= heap / 16L,
      deriveShufflePartitions(ss, probeBytes))
  }

  /** Guaranteed-recall edit-distance join by DISJOINT-segment
    * pigeonholing (Pass-Join family: Li, Deng & Feng, ICDE'11) — the
    * low-entropy-corpus complement to [[qgramFuzzyJoin]]. Both are
    * exact (result == the brute-force `levenshtein ≤ maxDist` join on
    * distinct rows; ScaleOpsSpec pins both against the same brute
    * force), but their candidate volumes are bounded by different
    * corpus statistics: q-gram prefix filtering degrades when the
    * gram vocabulary is small (generated/templated text: the 100×
    * documents corpus measures vocab 4 782 over 14.8 M 4-gram
    * occurrences — mean postings 3 090, predicted candidates 2.6e10),
    * while segment matching keys on EXACT `len/(d+1)`-char substrings
    * at length-aligned positions, whose selectivity survives a small
    * word alphabet (measured 474 685 distinct (len, seg) values over
    * the same corpus' 2.5 M segment rows).
    *
    * Why it is exact: split each left string s into `d+1` DISJOINT
    * segments (even split, longer segments last). An edit script of
    * ≤ d operations touches at most d segments, so some segment i is
    * untouched and maps IDENTICALLY to a substring of r starting at
    * `st = p_i + δ`. Aligning prefixes and suffixes around that match
    * gives `|δ| + |Δ − δ| ≤ d` where `Δ = |r| − |s|` — so probing r's
    * substrings of segment length at `δ ∈ [⌈(Δ−d)/2⌉, ⌊(Δ+d)/2⌋]`
    * (≤ d+1 starts per segment) over partner lengths `|r|−d ≤ |s| ≤
    * |r|+d` finds every true pair; banded `levenshtein` verify then
    * removes false positives. Left strings shorter than `d+1` chars
    * have zero-length segments the pigeonhole cannot use — they take
    * a bounded length-band fallback (the [[qgramFuzzyJoin]] step-3
    * argument; such strings only pair with rights shorter than
    * `2d+1` chars).
    *
    * Spark shape — the property that makes this the 100 TB plan: the
    * candidate join needs NO pre-join shuffle at all in the common
    * case. The segment index is `d+1` rows per left string; under
    * [[deriveSegmentJoin]]'s heap budget it broadcasts, and the probe
    * side's windowed substrings are GENERATED inside the scan stage
    * (one `explode` over an in-codegen array — never materialized),
    * stream through the broadcast hash join and the banded-levenshtein
    * verify in the same stage, and only MATCHED pairs reach the
    * dedup exchange. Past the broadcast budget both sides hash-join
    * at derived width — still shuffling `O(d²)` small rows per
    * string, never candidates.
    *
    * Contract: same as [[qgramFuzzyJoin]] — distinct input rows,
    * non-colliding column names, output = left ++ right ++ `distCol`,
    * pair order unspecified.
    *
    * `symmetric = true` declares the SELF-JOIN contract: left and
    * right are the same relation under a positional column rename
    * (column i of left corresponds to column i of right). The probe
    * then only visits partner lengths ≤ its own (each unordered pair
    * is found once, from its longer side) and every verified match is
    * re-emitted mirrored — halving probe and verify work, which is
    * where this operator's time goes (the 100× replica measured
    * 1.4e9 candidate verifies). Results are identical to the
    * asymmetric run (ScaleOpsSpec pins it).
    */
  def segmentFuzzyJoin(left: DataFrame, right: DataFrame,
                       leftCol: String, rightCol: String,
                       maxDist: Int,
                       distCol: String = "dist",
                       broadcastIndex: Boolean = true,
                       partitions: Int = 0,
                       symmetric: Boolean = false): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val dup = left.columns.intersect(right.columns)
    require(dup.isEmpty,
      s"left/right column names must not collide: ${dup.mkString(", ")}")
    val reserved = Seq("__l", "__i", "__g", "__sp", "__b", "__b0", distCol)
    val clash = (left.columns ++ right.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"columns collide with segmentFuzzyJoin internals: ${clash.mkString(", ")}")
    val d = maxDist
    val m = d + 1 // disjoint segments; pigeonhole needs edits < m

    // even-split segmentation of a length-l string, longer segments
    // last (the Pass-Join convention): base = ⌊l/m⌋, k = l mod m;
    // segment i ∈ [1, m] has length base+1 iff i > m−k, and starts at
    // (i−1)·base + max(0, i−1−(m−k)) + 1 — all in-codegen integer
    // arithmetic on the length column
    def segLen(l: Column, i: Column): Column =
      floor(l / m).cast("int") +
        when(i > lit(m) - (l % m), lit(1)).otherwise(lit(0))
    def segPos(l: Column, i: Column): Column =
      ((i - 1) * floor(l / m).cast("int") +
        greatest(lit(0), i - 1 - (lit(m) - (l % m))) + lit(1)).cast("int")

    // index side: m segment rows per string of length ≥ m, keyed by
    // (exact length, segment ordinal, segment text)
    val ll = length(col(leftCol))
    val idx = left.filter(ll >= m)
      .select(left.columns.map(col) :+ ll.as("__l") :+ explode(
        transform(sequence(lit(1), lit(m)),
          i => struct(i.as("i"),
            col(leftCol).substr(segPos(ll, i), segLen(ll, i)).as("g"))))
        .as("__sp"): _*)
      .select(left.columns.map(col) :+ col("__l")
        :+ col("__sp")("i").as("__i") :+ col("__sp")("g").as("__g"): _*)

    // probe side: for each partner length l2 = |r|−Δ (Δ ∈ [−d, d],
    // l2 ≥ m) and segment i of THAT length's segmentation, the
    // window-bounded substrings substr(r, p_i+δ, len_i) — built as one
    // in-codegen nested array and exploded once; out-of-range starts
    // are dropped by the post-explode filter (cheap: the array is
    // ≤ (2d+1)·m·(d+1) structs)
    require(!symmetric || left.columns.length == right.columns.length,
      "symmetric mode needs positionally-corresponding left/right columns")
    val lr = length(col(rightCol))
    // symmetric: Δ = |r| − l2 ≥ 0 only — the pair is discovered from
    // its LONGER side once, and the mirror union below restores the
    // other orientation
    val probeArr = flatten(transform(
      sequence(lit(if (symmetric) 0 else -d), lit(d)), { dl =>
      val l2 = (lr - dl).cast("int")
      flatten(transform(sequence(lit(1), lit(m)), { i =>
        val p = segPos(l2, i)
        val sl = segLen(l2, i)
        val lo = ceil((dl - lit(d)).cast("double") / 2.0).cast("int")
        val hi = floor((dl + lit(d)).cast("double") / 2.0).cast("int")
        transform(sequence(lo, hi), { delta =>
          val st = p + delta
          struct(l2.as("l"), i.as("i"), st.as("st"), sl.as("sl"),
            col(rightCol).substr(st, sl).as("g"))
        })
      }))
    }))
    val probe = right
      .select(right.columns.map(col) :+ explode(probeArr).as("__sp"): _*)
      .filter(col("__sp")("l") >= m && col("__sp")("st") >= 1 &&
        col("__sp")("st") + col("__sp")("sl") - 1 <= lr)
      .select(right.columns.map(col) :+ col("__sp")("l").as("__l")
        :+ col("__sp")("i").as("__i") :+ col("__sp")("g").as("__g"): _*)

    val segCand =
      if (broadcastIndex)
        probe.join(broadcast(idx), Seq("__l", "__i", "__g"))
          .drop("__l", "__i", "__g")
      else {
        val keys = Seq(col("__l"), col("__i"), col("__g"))
        widenIfAbove(idx, partitions, keys: _*)
          .hint("shuffle_hash")
          .join(widenIfAbove(probe, partitions, keys: _*),
            Seq("__l", "__i", "__g"))
          .drop("__l", "__i", "__g")
      }

    // left-short fallback: strings under m chars have zero-length
    // segments — bounded length-band equi-join (right partner is
    // under m+d = 2d+1 chars by the length filter in verify)
    val w = math.max(d, 1)
    val sl0 = left.filter(length(col(leftCol)) < m)
      .withColumn("__b", (length(col(leftCol)) / w).cast("long"))
    val sr0 = right.filter(length(col(rightCol)) < m + d)
      .withColumn("__b0", (length(col(rightCol)) / w).cast("long"))
      .withColumn("__b",
        explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val shortCand = sl0.join(sr0, Seq("__b")).drop("__b")

    // verify inline (same stage as the candidate join — candidates
    // never shuffle), dedup only the matched pairs.
    // (Measured non-optimization, kept as a note: lexicographically
    // orienting EQUAL-length candidates before verify — memcmp gate,
    // mirror restores — ran 365 s vs 333 s at 100×: the banded
    // thresholded levenshtein already abandons false candidates
    // within a few band rows, so the per-candidate compare cost more
    // than the halved true-pair DP saved.)
    val verified = segCand.unionByName(shortCand)
      .filter(abs(length(col(leftCol)) - length(col(rightCol))) <= d)
      .withColumn(distCol,
        levenshtein(col(leftCol), col(rightCol), math.max(d, 1))
          .cast("long"))
      .filter(col(distCol) >= 0 && col(distCol) <= d)
    // symmetric mode found each unordered pair from its longer side
    // only — re-emit the mirrored orientation (positional rename;
    // edit distance is symmetric). Equal-length pairs and the short
    // fallback arrive in both orientations already; the dedup below
    // absorbs the overlap (matches only — never candidates).
    val emitted =
      if (!symmetric) verified
      else {
        val lc = left.columns
        val rc = right.columns
        verified.unionByName(verified.select(
          (lc.indices.map(i => col(rc(i)).as(lc(i))) ++
            rc.indices.map(i => col(lc(i)).as(rc(i)))
            :+ col(distCol)): _*))
      }
    emitted.dropDuplicates()
  }

  /** Two-phase salted aggregation for skewed group keys: phase 1
    * aggregates on (key, salt) — spreading one hot key over `salts`
    * reducers — phase 2 merges the partials. Works for any
    * algebraic aggregate; sum/count provided.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int = 16): DataFrame = {
    // content-hash salt, not partition-id/monotonic-id arithmetic: the
    // salt becomes a shuffle key of the phase-1 aggregate, and a
    // nondeterministic key recomputed under partial stage retry can
    // land partials in different reducers (SPARK-23207). Hashing the
    // (keys, value) tuple — not every column — is deterministic under
    // recompute AND cheap (the 100× replica measured all-column
    // hashing at 2.8× the row cost on a 16-column fact table). A hot
    // key whose rows all carry ONE value does collapse onto one salt —
    // harmless HERE because sum/count are algebraic: the map-side
    // partial aggregate combines those rows per mapper before the
    // shuffle, so that reducer receives ≤ one partial row per map
    // task, never the raw hot mass. (Joins have no such combine —
    // see saltedJoin's caveat.)
    val salted = df.withColumn("__salt",
      pmod(xxhash64((keys :+ valueCol).map(col): _*), lit(salts)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
    phase1
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"),
        sum(col("__n")).as("count"))
  }

  /** Salted join against a skewed key: replicate the (small) right side
    * `salts` times, salt the left side randomly-but-deterministically,
    * join on (key, salt). Turns one hot reducer into `salts` even ones.
    * (AQE's skew-join handles sort-merge skew automatically; this is
    * the explicit form for when the optimizer can't see the skew.)
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    // deterministic content-hash salt over EVERY left column: a retry-
    // recomputed row re-draws the same salt, so the join key is stable
    // under partial stage recompute (SPARK-23207). CAVEAT a caller
    // must know: joins have no map-side combine, so left rows that are
    // FULLY identical (hot key + identical payload columns — e.g. a
    // key-only projection) collapse onto one salt and keep their
    // straggler. Feed a projection that retains a distinguishing
    // column (a row id, or any varied payload) — the battery caller
    // passes the full fact row, whose measure columns vary.
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toSeq: _*), lit(salts)))
    val explodedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLeft.join(explodedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Z-order (Morton) write layout over two integral dimensions: range-
    * partition + sort by the interleaved key, so each output file's
    * min/max envelope is tight on BOTH columns and a downstream scan
    * with a predicate on either dimension prunes most files. A
    * lexicographic `sortWithinPartitions(c1, c2)` only clusters the
    * leading column — at 100 TB that is one prunable dimension vs two.
    *
    * `repartitionByRange` samples the z-key to build balanced range
    * bounds (one extra job over a sample, the standard cost of a total
    * ordering); the sort inside each partition is then local. The
    * helper returns the clustered frame ready for `.write` — the z-key
    * column is dropped after sorting, ordering is preserved.
    */
  def zorderSorted(df: DataFrame, c1: String, c2: String,
                   partitions: Int = 0): DataFrame = {
    require(!df.columns.contains("__z"), "column __z collides with zorderSorted internals")
    val keyed = df.withColumn("__z", zorderKey(col(c1), col(c2)))
    val ranged =
      if (partitions > 0) keyed.repartitionByRange(partitions, col("__z"))
      else keyed.repartitionByRange(col("__z"))
    ranged.sortWithinPartitions(col("__z")).drop("__z")
  }

  /** Compact a directory of small parquet files into ~`targetBytes`
    * outputs — the operational answer to the small-files problem every
    * incremental/streaming ingest accumulates (each micro-batch writes
    * its own files; a 100 TB table fed by minute-level triggers grows
    * millions of kilobyte files, and scan/listing cost degrades long
    * before data volume does).
    *
    * Sizing reads the REAL on-disk bytes via the filesystem (not row
    * counts — compression ratios vary); the rewrite is one round-robin
    * repartition, which both merges small files and splits oversized
    * ones with even output sizes (`coalesce` could only merge, and
    * skews). Returns the output file count.
    */
  def compactFiles(spark: org.apache.spark.sql.SparkSession,
                   srcDir: String, destDir: String,
                   targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val path = new org.apache.hadoop.fs.Path(srcDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(path).iterator
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nParts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(srcDir).repartition(nParts)
      .write.mode("overwrite").parquet(destDir)
    nParts
  }

  /** The Morton key itself (native codegen'd expression) — see
    * [[graft.plans.ZOrderKeyExpr]] for semantics and the oracle replay. */
  def zorderKey(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    column(graft.plans.ZOrderKeyExpr(
      expression(a.cast("long")), expression(b.cast("long"))))
  }
}
