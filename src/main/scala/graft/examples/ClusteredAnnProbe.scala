package graft.examples

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{ScaleOps, VectorQueries}

/** Trained-vs-sampled PQ on a CLUSTERED manifold (VERDICT r13 #8,
  * stretch): the r13 ks sweep measured trained sub-codebooks at
  * +0.4/+0.9/+1.6 pts over sampling on the synthetic `embeddings`
  * table — gains bounded by that corpus being near-isotropic
  * (BASELINE.md's own caveat). Real embedding manifolds are clustered,
  * and there the first-ks sampling convention collapses: the sampled
  * codes all land inside whichever clusters the first ks vectors
  * happen to occupy, while Lloyd iterations re-spread them across the
  * actual modes. This probe generates a deterministic mixture —
  * K cluster centers with per-coordinate uniform[-1,1] components
  * (xxhash64 of the cluster id), plus per-vector uniform noise scaled
  * by `sigma` — and measures recall@10 vs exact-L2 brute force for the
  * sampled and trained codebooks over the SAME production path
  * ([[VectorQueries.pqSub]]/`pqCodes`/`pqLut`/[[VectorQueries.pqTrain]])
  * the gates run. No RNG anywhere: the corpus is replayable from ids.
  *
  * Usage: runMain graft.examples.ClusteredAnnProbe
  *          [nCorpus] [nQueries] [K] [sigma]
  *   (defaults 50000 / 100 / 32 / 0.15; tee output to bench/)
  */
object ClusteredAnnProbe {
  def main(args: Array[String]): Unit = {
    val nCorpus = if (args.length > 0) args(0).toLong else 50000L
    val nQ = if (args.length > 1) args(1).toLong else 100L
    val kClusters = if (args.length > 2) args(2).toInt else 32
    val sigma = if (args.length > 3) args(3).toDouble else 0.15
    val dim = 64
    val m = 8
    val subDim = dim / m
    val k = 10
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

    // uniform[-1,1) from a 64-bit hash, exactly replayable
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
            VectorQueries.pqSqd(col("qe").cast("array<double>"),
              col("embedding").cast("array<double>")).as("d2")),
        Seq(col("query_id")), Seq(col("d2"), col("vec_id")), k)
      .select(col("query_id"), col("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bruteL2.count()

    def recallOf(approx: org.apache.spark.sql.DataFrame): Double = {
      val r = bruteL2.join(approx,
          bruteL2("query_id") === approx("qi") &&
            bruteL2("vec_id") === approx("vi"), "left")
        .agg(count(col("vi")).as("hit"), count(lit(1)).as("tot")).head()
      r.getLong(0).toDouble / r.getLong(1)
    }

    val corpusSub = VectorQueries.pqSub(
        corpus.select(col("vec_id"), col("embedding")), "vec_id", m, subDim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpusSub.count()
    val querySub = VectorQueries.pqSub(
      queries.select(col("vec_id"), col("embedding")), "query_id", m, subDim)

    for ((ks, trained) <- Seq((16, false), (16, true),
                              (256, false), (256, true))) {
      val cbIds = corpus.orderBy(col("vec_id")).limit(ks)
        .select(col("vec_id").as("cb_id"))
      val cb0 = corpusSub.join(broadcast(cbIds), col("vec_id") === col("cb_id"))
        .select(col("m").as("cb_m"), col("vec_id").as("code"), col("sv").as("cv"))
      val tTr = System.nanoTime()
      val cb = if (trained) VectorQueries.pqTrain(corpusSub, cb0, 2) else cb0
      val trainSec = if (trained) secSince(tTr) else 0.0
      val codes = VectorQueries.pqCodes(corpusSub, cb, "vec_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      codes.count()
      val lut = VectorQueries.pqLut(querySub, cb, "query_id")
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
      val recall = recallOf(pqTop)
      pqTop.unpersist(); codes.unpersist()
      println(s"""{"probe":"clustered_pq","n_corpus":$nCorpus,""" +
        s""""clusters":$kClusters,"sigma":$sigma,"m":$m,"ks":$ks,""" +
        s""""trained":$trained,"train_sec":${fmt(trainSec)},""" +
        s""""search_sec":${fmt(searchSec)},"recall":${fmt(recall)}}""")
    }

    // ---- composed IVF legs: raw-PQ vs RESIDUAL-PQ ------------------
    // (the q_ann_ivfpq_residual_recall operator at manifold geometry):
    // same trained IVF routing and candidate sets for all four legs,
    // so the recall delta isolates the ENCODING — raw codes spend
    // resolution separating clusters the routing already separated;
    // residual codes (v − cell centroid) spend it all within-cell.
    val cellsN = 64
    val nprobe = 4
    val ks = 256
    val initC = corpus.orderBy(col("vec_id")).limit(cellsN)
      .select(col("vec_id").as("cent_id"),
        col("embedding").cast("array<double>").as("cv"))
    // lloydTrain snaps the codebook per-iteration since r15 — no
    // outer re-snap (floor∘floor can shift a value off the grid).
    val cells = graft.operators.ExtraSimilarityQueries.lloydTrain(
      corpus.select(col("vec_id"), col("embedding").as("ev")), initC, 2)
    val corpusCells = graft.operators.ExtraSimilarityQueries.assignTo(cells)(
        corpus.select(col("vec_id"), col("embedding").as("ev")), "vec_id", "ev")
      .select(col("vec_id"), col("cent_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpusCells.count()
    val csub = graft.operators.ExtraSimilarityQueries
      .centroidSub(cells, m, subDim)
    val rsub = graft.operators.ExtraSimilarityQueries.residualSub(
        corpusSub, corpusCells, csub, "vec_id", "cent_id")
      .select(col("vec_id"), col("m"), col("sv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rsub.count()
    // measured geometry → the adviseAnn decision (calibration source)
    val geo = graft.operators.ExtraSimilarityQueries.annGeometryStats(
      corpus.select(col("vec_id"), col("embedding").as("ev")),
      cells, corpusCells)
    val adv = ScaleOps.adviseAnn(geo, ks = 256)
    println(s"""{"probe":"clustered_geometry","n":${geo.n},""" +
      s""""cells":${geo.cells},"explained":${fmt(geo.explained)},""" +
      s""""advice":"${adv.encoding}"}""")

    val qAssign = graft.operators.ExtraSimilarityQueries
      .assignTo(cells, keepN = nprobe)(
        queries.select(col("vec_id").as("query_id"),
          col("embedding").as("qv")), "query_id", "qv")
      .select(col("query_id"), col("cent_id").as("q_cent"))
    val candidates = broadcast(qAssign)
      .join(corpusCells, col("q_cent") === col("cent_id"))
      .select(col("query_id"), col("q_cent"), col("vec_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCand = candidates.count()
    // routing ceiling: the recall any encoding could reach with these
    // candidate sets
    val ceiling = recallOf(candidates
      .select(col("query_id").as("qi"), col("vec_id").as("vi")))
    println(s"""{"probe":"clustered_ivf_routing","cells":$cellsN,""" +
      s""""nprobe":$nprobe,"candidates":$nCand,""" +
      s""""scanned_frac":${fmt(nCand.toDouble / (nCorpus * nQ))},""" +
      s""""routing_recall_ceiling":${fmt(ceiling)}}""")

    for ((residual, trained) <- Seq((false, false), (false, true),
                                    (true, false), (true, true))) {
      val encSub = if (residual) rsub else corpusSub
      val cbIds = corpus.orderBy(col("vec_id")).limit(ks)
        .select(col("vec_id").as("cb_id"))
      val cb0 = encSub.join(broadcast(cbIds), col("vec_id") === col("cb_id"))
        .select(col("m").as("cb_m"), col("vec_id").as("code"),
          col("sv").as("cv"))
      val cb = if (trained) VectorQueries.pqTrain(encSub, cb0, 2) else cb0
      val codes = VectorQueries.pqCodes(encSub, cb, "vec_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      codes.count()
      val t0 = System.nanoTime()
      val adc = if (residual) {
        val qres = graft.operators.ExtraSimilarityQueries.residualSub(
          querySub, qAssign, csub, "query_id", "q_cent")
        val lut = qres.join(broadcast(cb), col("m") === col("cb_m"))
          .select(col("query_id"), col("q_cent"), col("m"), col("code"),
            floor(VectorQueries.pqSqd(col("sv"), col("cv")) * 1000000)
              .cast("long").as("pd"))
        candidates.join(codes, Seq("vec_id"))
          .join(broadcast(lut), Seq("query_id", "q_cent", "m", "code"))
          .groupBy(col("query_id"), col("vec_id"))
          .agg(sum(col("pd")).as("adc"))
      } else {
        val lut = VectorQueries.pqLut(querySub, cb, "query_id")
        candidates.select(col("query_id"), col("vec_id"))
          .join(codes, Seq("vec_id"))
          .join(broadcast(lut), Seq("query_id", "m", "code"))
          .groupBy(col("query_id"), col("vec_id"))
          .agg(sum(col("pd")).as("adc"))
      }
      val top = ScaleOps.topKPerKey(adc,
          Seq(col("query_id")), Seq(col("adc"), col("vec_id")), k)
        .select(col("query_id").as("qi"), col("vec_id").as("vi"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      top.count()
      val searchSec = secSince(t0)
      val recall = recallOf(top)
      top.unpersist(); codes.unpersist()
      println(s"""{"probe":"clustered_ivfpq","cells":$cellsN,""" +
        s""""nprobe":$nprobe,"m":$m,"ks":$ks,"residual":$residual,""" +
        s""""trained":$trained,"search_sec":${fmt(searchSec)},""" +
        s""""recall":${fmt(recall)}}""")
    }
    spark.stop()
  }
}
