package graft.examples

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ScaleOps, VectorQueries}

/** The residual-PQ recall CEILING on clustered geometry (VERDICT r14
  * #3): r14 measured residual encoding at 0.32–0.38 recall@10 on the
  * K=32 mixture — a 5–6× multiplier over raw PQ, yet far under the
  * 1.000 routing ceiling at identical candidate volume, so ALL the
  * remaining loss is PQ quantization. This probe holds the routing
  * fixed (trained 64-cell IVF, nprobe 4 — the SAME candidate sets for
  * every leg, so recall deltas isolate the encoder) and sweeps the
  * public-literature knobs on the residual encoder:
  *
  *   - `pqTrain` sub-codebook Lloyd iterations 0 (sampled) → 2 → 4 → 8;
  *   - subspace count m = 8 → 16 (subDim 8 → 4; code bytes double,
  *     still 16× under the raw 256-byte vectors);
  *   - an OPQ-LITE variance-balancing dimension PERMUTATION (the
  *     "free" half of Ge/He/Ke/Sun, Optimized Product Quantization,
  *     TPAMI 2014: allocate dimensions to subspaces so per-subspace
  *     residual variance is balanced, here greedy largest-first
  *     bin-packing on per-dimension residual variance). A permutation
  *     is orthogonal, so the L2 brute truth and the IVF routing are
  *     untouched — only the encoder's subspace decomposition moves.
  *
  * The mixture corpus is the deterministic ClusteredAnnProbe
  * generator (K cluster centers from xxhash64, per-vector noise
  * `sigma`) — no RNG, replayable from ids.
  *
  * Usage: runMain graft.examples.ResidualCeilingProbe
  *          [nCorpus] [nQueries] [K] [sigma]
  *   (defaults 50000 / 100 / 32 / 0.15; tee to
  *    bench/clustered_ann_r15.jsonl)
  */
object ResidualCeilingProbe {
  def main(args: Array[String]): Unit = {
    val nCorpus = if (args.length > 0) args(0).toLong else 50000L
    val nQ = if (args.length > 1) args(1).toLong else 100L
    val kClusters = if (args.length > 2) args(2).toInt else 32
    val sigma = if (args.length > 3) args(3).toDouble else 0.15
    val dim = 64
    val k = 10
    val cellsN = 64
    val nprobe = 4
    val ks = 256
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def secSince(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // the ClusteredAnnProbe mixture, verbatim: uniform[-1,1) cluster
    // centers + sigma-scaled per-vector noise, all from xxhash64
    def u(h: Column): Column =
      pmod(h, lit(2000001L)).cast("double") / 1000000.0 - 1.0
    val cl = pmod(xxhash64(col("id"), lit(7)), lit(kClusters.toLong))
    val emb = transform(sequence(lit(1), lit(dim)),
      j => u(xxhash64(cl, j)) + lit(sigma) * u(xxhash64(col("id"), j + lit(1000))))
    val all = spark.range(nCorpus + nQ)
      .select(col("id").as("vec_id"), emb.as("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpus = all.filter(col("vec_id") >= nQ)
    val queries = all.filter(col("vec_id") < nQ)

    val bruteL2 = ScaleOps.topKPerKey(
        corpus.crossJoin(broadcast(
            queries.select(col("vec_id").as("query_id"),
              col("embedding").as("qe"))))
          .select(col("query_id"), col("vec_id"),
            VectorQueries.pqSqd(col("qe"), col("embedding")).as("d2")),
        Seq(col("query_id")), Seq(col("d2"), col("vec_id")), k)
      .select(col("query_id"), col("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bruteL2.count()
    def recallOf(approx: DataFrame): Double = {
      val r = bruteL2.join(approx,
          bruteL2("query_id") === approx("qi") &&
            bruteL2("vec_id") === approx("vi"), "left")
        .agg(count(col("vi")).as("hit"), count(lit(1)).as("tot")).head()
      r.getLong(0).toDouble / r.getLong(1)
    }

    // ---- fixed routing: trained IVF cells, nprobe-cell candidates --
    val initC = corpus.orderBy(col("vec_id")).limit(cellsN)
      .select(col("vec_id").as("cent_id"),
        col("embedding").as("cv"))
    val cells = graft.operators.ExtraSimilarityQueries.lloydTrain(
      corpus.select(col("vec_id"), col("embedding").as("ev")), initC, 2)
    val corpusCells = graft.operators.ExtraSimilarityQueries.assignTo(cells)(
        corpus.select(col("vec_id"), col("embedding").as("ev")), "vec_id", "ev")
      .select(col("vec_id"), col("cent_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpusCells.count()
    val qAssign = graft.operators.ExtraSimilarityQueries
      .assignTo(cells, keepN = nprobe)(
        queries.select(col("vec_id").as("query_id"),
          col("embedding").as("qv")), "query_id", "qv")
      .select(col("query_id"), col("cent_id").as("q_cent"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    qAssign.count()
    val candidates = broadcast(qAssign)
      .join(corpusCells, col("q_cent") === col("cent_id"))
      .select(col("query_id"), col("q_cent"), col("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCand = candidates.count()
    val ceiling = recallOf(candidates
      .select(col("query_id").as("qi"), col("vec_id").as("vi")))
    println(s"""{"probe":"residual_ceiling_routing","n_corpus":$nCorpus,""" +
      s""""clusters":$kClusters,"sigma":$sigma,"cells":$cellsN,""" +
      s""""nprobe":$nprobe,"candidates":$nCand,""" +
      s""""routing_recall_ceiling":${fmt(ceiling)}}""")

    // ---- FULL residual vectors (permutation crosses subspace
    // boundaries, so residualize BEFORE slicing) --------------------
    val corpusResid = corpus.join(corpusCells, Seq("vec_id"))
      .join(broadcast(cells), Seq("cent_id"))
      .select(col("vec_id"),
        zip_with(col("embedding"), col("cv"), (a, b) => a - b).as("rv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpusResid.count()
    // query residual PER PROBED CELL (each probed cell gets its own
    // re-centering, exactly like q_ann_ivfpq_residual_recall)
    val queryResid = queries
      .select(col("vec_id").as("query_id"), col("embedding"))
      .join(qAssign, Seq("query_id"))
      .join(broadcast(cells.withColumnRenamed("cent_id", "q_cent")),
        Seq("q_cent"))
      .select(col("query_id"), col("q_cent"),
        zip_with(col("embedding"), col("cv"), (a, b) => a - b).as("rv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    queryResid.count()

    /** Subvector explode carrying arbitrary id columns (pqSub fixes
      * the id to a single `vec_id`; the query side needs
      * (query_id, q_cent)). */
    def subOf(df: DataFrame, idCols: Seq[String], m: Int, subDim: Int)
        : DataFrame =
      df.select(idCols.map(col) :+ expr(
        s"""inline(transform(sequence(0, ${m - 1}), mi -> named_struct(
             'm', CAST(mi AS BIGINT),
             'sv', slice(rv, mi*$subDim+1, $subDim))))"""): _*)

    /** OPQ-lite dimension allocation: per-dimension residual variance
      * (one tiny aggregate), dims sorted largest-first, each placed
      * greedily into the subspace bin with the lowest variance sum
      * (ties by bin index) — deterministic, orthogonal, routing- and
      * truth-preserving. Returns the permutation as subspace-major
      * dimension order. */
    def opqPerm(m: Int, subDim: Int): Seq[Int] = {
      val stats = corpusResid
        .select(posexplode(col("rv")).as(Seq("pos", "v")))
        .groupBy("pos")
        .agg(avg(col("v") * col("v")).as("m2"), avg(col("v")).as("m1"))
        .orderBy("pos").collect()
        .map(r => (r.getInt(0), r.getDouble(1) - r.getDouble(2) * r.getDouble(2)))
      val bins = Array.fill(m)(List.empty[Int])
      val sums = Array.fill(m)(0.0)
      stats.sortBy { case (pos, v) => (-v, pos) }.foreach { case (pos, v) =>
        val open = (0 until m).filter(b => bins(b).size < subDim)
        val b = open.minBy(b => (sums(b), b))
        bins(b) = bins(b) :+ pos
        sums(b) += v
      }
      bins.toSeq.flatten
    }
    def permuteRv(df: DataFrame, perm: Seq[Int]): DataFrame =
      df.withColumn("rv",
        array(perm.map(i => col("rv").getItem(i)): _*))

    // ---- the sweep: m × pqTrain-iters × (± OPQ-lite) ---------------
    val legs: Seq[(Int, Int, Boolean)] =
      (for (m <- Seq(8, 16); it <- Seq(0, 2, 4, 8)) yield (m, it, false)) ++
        Seq((8, 4, true), (16, 4, true), (16, 8, true))
    for ((m, iters, opq) <- legs) {
      val subDim = dim / m
      val perm = if (opq) opqPerm(m, subDim) else (0 until dim)
      val cres = if (opq) permuteRv(corpusResid, perm) else corpusResid
      val qres = if (opq) permuteRv(queryResid, perm) else queryResid
      val cSub = subOf(cres, Seq("vec_id"), m, subDim)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cSub.count()
      val cbIds = corpus.orderBy(col("vec_id")).limit(ks)
        .select(col("vec_id").as("cb_id"))
      val cb0 = cSub.join(broadcast(cbIds), col("vec_id") === col("cb_id"))
        .select(col("m").as("cb_m"), col("vec_id").as("code"),
          col("sv").as("cv"))
      val tTr = System.nanoTime()
      val cb = if (iters > 0) VectorQueries.pqTrain(cSub, cb0, iters) else cb0
      val cbM = broadcast(cb.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      cbM.count()
      val trainSec = if (iters > 0) secSince(tTr) else 0.0
      val codes = VectorQueries.pqCodes(cSub, cbM, "vec_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      codes.count()
      val t0 = System.nanoTime()
      val lut = subOf(qres, Seq("query_id", "q_cent"), m, subDim)
        .join(cbM, col("m") === col("cb_m"))
        .select(col("query_id"), col("q_cent"), col("m"), col("code"),
          floor(VectorQueries.pqSqd(col("sv"), col("cv")) * 1000000)
            .cast("long").as("pd"))
      val adc = candidates.join(codes, Seq("vec_id"))
        .join(broadcast(lut), Seq("query_id", "q_cent", "m", "code"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(sum(col("pd")).as("adc"))
      val top = ScaleOps.topKPerKey(adc,
          Seq(col("query_id")), Seq(col("adc"), col("vec_id")), k)
        .select(col("query_id").as("qi"), col("vec_id").as("vi"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      top.count()
      val searchSec = secSince(t0)
      val recall = recallOf(top)
      top.unpersist(); codes.unpersist(); cSub.unpersist(); cb.unpersist()
      println(s"""{"probe":"residual_ceiling","cells":$cellsN,""" +
        s""""nprobe":$nprobe,"m":$m,"ks":$ks,"pq_iters":$iters,""" +
        s""""opq_lite":$opq,"residual":true,"train_sec":${fmt(trainSec)},""" +
        s""""search_sec":${fmt(searchSec)},"recall":${fmt(recall)}}""")
    }
    spark.stop()
  }
}
