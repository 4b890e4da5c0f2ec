package graft.examples

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{asDouble, cosine}
import graft.operators.{ExtraSimilarityQueries, ScaleOps, VectorQueries}

/** ANN recall-vs-latency operating curve at replica scale (VERDICT
  * r11 #8 / r12 #8): the battery's IVF and PQ gates pin ONE
  * oracle-replayed operating point each; this probe sweeps the two
  * search knobs over the SAME production paths —
  * [[ExtraSimilarityQueries.lloydTrain]]/`assignTo` for the IVF
  * `nprobe` curve and [[VectorQueries.pqSub]]/`pqCodes`/`pqLut` for
  * the PQ `m` curve — giving the similarity tier the measured
  * operating-point story the dedup tier has.
  *
  *  - IVF: one trained codebook (`cells` Lloyd cells), corpus
  *    assigned once; per `nprobe` the timed leg is query assign →
  *    cell-routed cosine → native top-k. `scanned_frac` (candidates /
  *    brute pairs) is the scale-relevant cost — at 100 TB latency is
  *    proportional to it, while at replica scale fixed overheads
  *    flatten the wall-clock curve.
  *  - PQ: per `m` (subDim = dim/m) the codebook is the first-16
  *    corpus vectors' subvectors (the gate's init convention); encode
  *    timed separately from the ADC search (LUT join + integer sum +
  *    top-k). Recall vs the exact-L2 brute top-k (ADC approximates
  *    L2, so that is its honest reference; the IVF legs use cosine
  *    like their gate).
  *
  * Corpus split is deterministic: replica ids < 1000 are the original
  * sf copy — queries = every 10th of those (100 queries), corpus =
  * ids ≥ 1000.
  *
  * Usage: runMain graft.examples.AnnOperatingCurve <sfDir> [cells]
  * Emits one JSON line per operating point (tee to bench/).
  */
object AnnOperatingCurve {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cells = if (args.length > 1) args(1).toInt else 64
    val iters = 2
    val k = 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def secSince(t0: Long): Double = (System.nanoTime() - t0) / 1e9
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val corpus = e.filter(col("vec_id") >= 1000)
      .select(col("vec_id"), col("embedding").as("ev"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCorpus = corpus.count()
    val qraw = e.filter(col("vec_id") < 1000 && col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nQueries = qraw.count()

    def recallOf(approx: DataFrame, truth: DataFrame): Double = {
      val m = truth.join(approx,
          truth("query_id") === approx("qi") && truth("vec_id") === approx("vi"),
          "left")
        .agg(count(col("vi")).as("hit"), count(lit(1)).as("tot")).head()
      m.getLong(0).toDouble / m.getLong(1)
    }

    // ---- brute references (cosine for IVF, exact L2 for PQ) --------
    val tb = System.nanoTime()
    val bruteCos = ScaleOps.topKPerKey(
        corpus.crossJoin(broadcast(qraw.select(col("query_id"), col("qv"))))
          .select(col("query_id"), col("vec_id"),
            cosine(col("qv"), col("ev")).as("cos")),
        Seq(col("query_id")), Seq(col("cos").desc, col("vec_id")), k)
      .select(col("query_id"), col("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bruteCos.count()
    val bruteSec = secSince(tb)
    println(s"""{"probe":"ann_curve_brute","n_corpus":$nCorpus,""" +
      s""""n_queries":$nQueries,"k":$k,"sec":${fmt(bruteSec)}}""")

    // ---- IVF nprobe sweep ------------------------------------------
    val tTrain = System.nanoTime()
    val init = corpus.orderBy(col("vec_id")).limit(cells)
      .select(col("vec_id").as("cent_id"), asDouble(col("ev")).as("cv"))
    val cents = ExtraSimilarityQueries.lloydTrain(
      corpus.select(col("vec_id"), col("ev")), init, iters)
    val trainSec = secSince(tTrain)
    val tAssign = System.nanoTime()
    val corpusAssigned = ExtraSimilarityQueries.assignTo(cents)(
        corpus.select(col("vec_id"), col("ev")), "vec_id", "ev")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpusAssigned.count()
    val assignSec = secSince(tAssign)
    println(s"""{"probe":"ivf_build","cells":$cells,"iters":$iters,""" +
      s""""train_sec":${fmt(trainSec)},"assign_sec":${fmt(assignSec)}}""")
    // measured geometry → the adviseAnn decision (calibration source)
    val geo = ExtraSimilarityQueries.annGeometryStats(
      corpus.select(col("vec_id"), col("ev")), cents, corpusAssigned)
    val advE = ScaleOps.adviseAnn(geo, ks = 256)
    println(s"""{"probe":"ann_geometry","n":${geo.n},""" +
      s""""cells":${geo.cells},"explained":${fmt(geo.explained)},""" +
      s""""advice":"${advE.encoding}"}""")

    for (nprobe <- Seq(1, 2, 4, 8, 16)) {
      val queries = ExtraSimilarityQueries.assignTo(cents, keepN = nprobe)(
          qraw.select(col("query_id"), col("qv")), "query_id", "qv")
        .withColumnRenamed("cent_id", "q_cent")
      val routed = queries.join(corpusAssigned,
          col("q_cent") === col("cent_id"))
      val t0 = System.nanoTime()
      val ivf = ScaleOps.topKPerKey(
          routed.select(col("query_id"), col("vec_id"),
            cosine(col("qv"), col("ev")).as("cos")),
          Seq(col("query_id")), Seq(col("cos").desc, col("vec_id")), k)
        .select(col("query_id").as("qi"), col("vec_id").as("vi"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      ivf.count()
      val searchSec = secSince(t0)
      val candidates = routed.count()
      val recall = recallOf(ivf, bruteCos)
      ivf.unpersist()
      println(s"""{"probe":"ivf_curve","cells":$cells,"nprobe":$nprobe,""" +
        s""""search_sec":${fmt(searchSec)},"recall":${fmt(recall)},""" +
        s""""candidates":$candidates,""" +
        s""""scanned_frac":${fmt(candidates.toDouble / (nCorpus * nQueries))}}""")
    }

    // ---- PQ m sweep -------------------------------------------------
    val dim = 64
    val bruteL2 = ScaleOps.topKPerKey(
        corpus.crossJoin(broadcast(qraw.select(col("query_id"), col("qv"))))
          .select(col("query_id"), col("vec_id"),
            VectorQueries.pqSqd(asDouble(col("qv")), asDouble(col("ev")))
              .as("d2")),
        Seq(col("query_id")), Seq(col("d2"), col("vec_id")), k)
      .select(col("query_id"), col("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bruteL2.count()
    // sweep BOTH PQ knobs over the same production path: subspace
    // count m at the gate's ks = 16, then codebook size ks at the
    // gate's m = 8 (the knob the m-sweep's knee points at — recall
    // saturates in m once 16 codes can tile the subspace, so the
    // remaining headroom is codes-per-subspace). Codebooks stay the
    // gate's sampling convention (first-ks corpus subvectors).
    for ((m, ks) <- Seq((2, 16), (4, 16), (8, 16), (16, 16),
                        (8, 64), (8, 256))) {
      val subDim = dim / m
      val cbIds = corpus.orderBy(col("vec_id")).limit(ks)
        .select(col("vec_id").as("cb_id"))
      val corpusSub = VectorQueries.pqSub(
        corpus.select(col("vec_id"), col("embedding")), "vec_id", m, subDim)
      val cb = corpusSub.join(broadcast(cbIds), col("vec_id") === col("cb_id"))
        .select(col("m").as("cb_m"), col("vec_id").as("code"), col("sv").as("cv"))
      val tEnc = System.nanoTime()
      val codes = VectorQueries.pqCodes(corpusSub, cb, "vec_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      codes.count()
      val encodeSec = secSince(tEnc)
      val lut = VectorQueries.pqLut(
        VectorQueries.pqSub(qraw.select(col("query_id").as("vec_id"),
          col("embedding")), "query_id", m, subDim), cb, "query_id")
      val t0 = System.nanoTime()
      val pqTop = ScaleOps.topKPerKey(
          codes.join(broadcast(lut), Seq("m", "code"))
            .groupBy(col("query_id"), col("vec_id"))
            .agg(sum(col("pd")).as("adc")),
          Seq(col("query_id")), Seq(col("adc"), col("vec_id")), k)
        .select(col("query_id").as("qi"), col("vec_id").as("vi"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pqTop.count()
      val searchSec = secSince(t0)
      val recall = recallOf(pqTop, bruteL2)
      pqTop.unpersist(); codes.unpersist()
      println(s"""{"probe":"pq_curve","m":$m,"sub_dim":$subDim,"ks":$ks,""" +
        s""""encode_sec":${fmt(encodeSec)},"search_sec":${fmt(searchSec)},""" +
        s""""recall":${fmt(recall)},""" +
        s""""code_bytes_per_vec":$m,"raw_bytes_per_vec":${dim * 4}}""")
    }

    // ---- trained sub-codebooks (the q_ann_pq_trained_recall path) ---
    // Per-subspace Lloyd from the same sampled init: the estimator the
    // ks sweep points at (sampling saturates at +0.4 pts for 16x more
    // codes; training changes the estimator, not the sample size).
    for ((m, ks, iters) <- Seq((8, 16, 2), (8, 64, 2), (8, 256, 2))) {
      val subDim = dim / m
      val cbIds = corpus.orderBy(col("vec_id")).limit(ks)
        .select(col("vec_id").as("cb_id"))
      val corpusSub = VectorQueries.pqSub(
        corpus.select(col("vec_id"), col("embedding")), "vec_id", m, subDim)
      val cb0 = corpusSub.join(broadcast(cbIds), col("vec_id") === col("cb_id"))
        .select(col("m").as("cb_m"), col("vec_id").as("code"), col("sv").as("cv"))
      val tTr = System.nanoTime()
      val cbT = VectorQueries.pqTrain(corpusSub, cb0, iters)
      val trainSecPq = secSince(tTr)
      val tEnc = System.nanoTime()
      val codes = VectorQueries.pqCodes(corpusSub, cbT, "vec_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      codes.count()
      val encodeSec = secSince(tEnc)
      val lut = VectorQueries.pqLut(
        VectorQueries.pqSub(qraw.select(col("query_id").as("vec_id"),
          col("embedding")), "query_id", m, subDim), cbT, "query_id")
      val t0 = System.nanoTime()
      val pqTop = ScaleOps.topKPerKey(
          codes.join(broadcast(lut), Seq("m", "code"))
            .groupBy(col("query_id"), col("vec_id"))
            .agg(sum(col("pd")).as("adc")),
          Seq(col("query_id")), Seq(col("adc"), col("vec_id")), k)
        .select(col("query_id").as("qi"), col("vec_id").as("vi"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pqTop.count()
      val searchSec = secSince(t0)
      val recall = recallOf(pqTop, bruteL2)
      pqTop.unpersist(); codes.unpersist()
      println(s"""{"probe":"pq_trained_curve","m":$m,"sub_dim":$subDim,""" +
        s""""ks":$ks,"iters":$iters,"train_sec":${fmt(trainSecPq)},""" +
        s""""encode_sec":${fmt(encodeSec)},"search_sec":${fmt(searchSec)},""" +
        s""""recall":${fmt(recall)},""" +
        s""""code_bytes_per_vec":$m,"raw_bytes_per_vec":${dim * 4}}""")
    }

    // ---- composed IVF+PQ (the q_ann_ivfpq_recall production shape) --
    // ADC scoring INSIDE the probed cells: candidate volume from the
    // IVF tier, bytes-per-candidate from the PQ tier. Recall vs the
    // exact-L2 brute reference prices BOTH approximations at once —
    // the number the gate row pins at oracle scale, measured here at
    // replica scale across the nprobe x ks grid. The `trained` legs
    // (VERDICT r13 #6) compose IVF routing with the TRAINED ks=256
    // sub-codebooks ([[VectorQueries.pqTrain]]) — the production
    // composition a user would actually run, since the trained
    // estimator measured better than sampling at every ks.
    // The `residual` legs (r14) encode (v - cell centroid) with
    // per-(query, probed cell) LUTs - the q_ann_ivfpq_residual_recall
    // operator - completing the geometry story: on THIS near-isotropic
    // corpus residual gains should be modest, vs the 5-6x recall
    // multiplier ClusteredAnnProbe measures on manifold-shaped data.
    val csub = ExtraSimilarityQueries.centroidSub(cents, 8, 8)
    for ((nprobe, ks, trained, residual) <- Seq(
        (1, 256, false, false), (4, 256, false, false),
        (16, 256, false, false), (16, 16, false, false),
        (1, 256, true, false), (4, 256, true, false), (16, 256, true, false),
        (1, 256, false, true), (4, 256, false, true),
        (1, 256, true, true), (4, 256, true, true))) {
      val m = 8; val subDim = dim / m
      val cbIds = corpus.orderBy(col("vec_id")).limit(ks)
        .select(col("vec_id").as("cb_id"))
      val rawSub = VectorQueries.pqSub(
        corpus.select(col("vec_id"), col("embedding")), "vec_id", m, subDim)
      val corpusSub = if (residual)
        ExtraSimilarityQueries.residualSub(rawSub,
            corpusAssigned.select(col("vec_id"), col("cent_id")),
            csub, "vec_id", "cent_id")
          .select(col("vec_id"), col("m"), col("sv"))
        else rawSub
      val cb0 = corpusSub.join(broadcast(cbIds), col("vec_id") === col("cb_id"))
        .select(col("m").as("cb_m"), col("vec_id").as("code"), col("sv").as("cv"))
      val cb = if (trained) VectorQueries.pqTrain(corpusSub, cb0, 2) else cb0
      val codes = VectorQueries.pqCodes(corpusSub, cb, "vec_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      codes.count()
      val qsubRaw = VectorQueries.pqSub(qraw.select(
        col("query_id").as("vec_id"), col("embedding")), "query_id", m, subDim)
      val queries = ExtraSimilarityQueries.assignTo(cents, keepN = nprobe)(
          qraw.select(col("query_id"), col("qv")), "query_id", "qv")
        .withColumnRenamed("cent_id", "q_cent")
      val t0 = System.nanoTime()
      val (candidates, adc) = if (residual) {
        val qres = ExtraSimilarityQueries.residualSub(qsubRaw,
          queries.select(col("query_id"), col("q_cent")),
          csub, "query_id", "q_cent")
        val lut = qres.join(broadcast(cb), col("m") === col("cb_m"))
          .select(col("query_id"), col("q_cent"), col("m"), col("code"),
            floor(VectorQueries.pqSqd(col("sv"), col("cv")) * 1000000)
              .cast("long").as("pd"))
        val cand = queries.select(col("query_id"), col("q_cent"))
          .join(corpusAssigned.select(col("vec_id"), col("cent_id")),
            col("q_cent") === col("cent_id"))
          .select(col("query_id"), col("q_cent"), col("vec_id"))
        (cand.select(col("query_id"), col("vec_id")),
          cand.join(codes, Seq("vec_id"))
            .join(broadcast(lut), Seq("query_id", "q_cent", "m", "code"))
            .groupBy(col("query_id"), col("vec_id"))
            .agg(sum(col("pd")).as("adc")))
      } else {
        val lut = VectorQueries.pqLut(qsubRaw, cb, "query_id")
        val cand = queries.select(col("query_id"), col("q_cent"))
          .join(corpusAssigned.select(col("vec_id"), col("cent_id")),
            col("q_cent") === col("cent_id"))
          .select(col("query_id"), col("vec_id"))
        (cand,
          cand.join(codes, Seq("vec_id"))
            .join(broadcast(lut), Seq("query_id", "m", "code"))
            .groupBy(col("query_id"), col("vec_id"))
            .agg(sum(col("pd")).as("adc")))
      }
      val top = ScaleOps.topKPerKey(adc,
          Seq(col("query_id")), Seq(col("adc"), col("vec_id")), k)
        .select(col("query_id").as("qi"), col("vec_id").as("vi"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      top.count()
      val searchSec = secSince(t0)
      val nCand = candidates.count()
      val recall = recallOf(top, bruteL2)
      top.unpersist(); codes.unpersist()
      println(s"""{"probe":"ivfpq_curve","cells":$cells,"nprobe":$nprobe,""" +
        s""""m":$m,"ks":$ks,"trained":$trained,"residual":$residual,""" +
        s""""search_sec":${fmt(searchSec)},""" +
        s""""recall":${fmt(recall)},"candidates":$nCand,""" +
        s""""scanned_frac":${fmt(nCand.toDouble / (nCorpus * nQueries))},""" +
        s""""code_bytes_per_vec":$m,"raw_bytes_per_vec":${dim * 4}}""")
    }
    spark.stop()
  }
}
