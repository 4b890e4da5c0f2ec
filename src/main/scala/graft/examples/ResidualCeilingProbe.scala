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
  * r16 adds `mode=aniso` (VERDICT r15 #4): the r15 OPQ-lite null was
  * measured on i.i.d.-shaped residuals, where no decomposition can
  * beat another; real embedding manifolds have CORRELATED,
  * ANISOTROPIC per-dimension structure where Ge/He/Ke/Sun (Optimized
  * Product Quantization, TPAMI 2014) show a learned rotation pays.
  * The anisotropic mode keeps the cluster centers but shapes the
  * noise with (a) a global exponentially-decaying per-dimension
  * spectrum (variance imbalance — what the OPQ-lite permutation can
  * rebalance) and (b) a per-cluster banded linear map with
  * hash-derived coefficients mixing adjacent latents (cross-dimension
  * correlation — what only a ROTATION can remove). On this geometry
  * the probe adds the cheap learned rotation of OPQ's non-parametric
  * init: PCA of the pooled residual covariance (64×64 — driver-side
  * Jacobi) + eigenvalue allocation of the rotated dims to subspaces
  * (balance per-bin log-eigenvalue mass, Ge et al. §4).
  *
  * Usage: runMain graft.examples.ResidualCeilingProbe
  *          [nCorpus] [nQueries] [K] [sigma] [mode]
  *   mode ∈ iid | aniso (per-cluster banded mixing — pooled
  *   covariance near-diagonal, global rotation blind) | galiso
  *   (cluster-INDEPENDENT mixing — pooled covariance carries the
  *   band, the full-OPQ geometry). Defaults 50000 / 100 / 32 /
  *   0.15 / iid; r15 artifact = bench/clustered_ann_r15.jsonl,
  *   r16 aniso + galiso = bench/clustered_ann_r16.jsonl.
  *
  * r17 adds the per-cell legs on mode=aniso (VERDICT r16 stretch #6,
  * Kalantidis/Avrithis LOPQ CVPR 2014): `cellcb` = per-cell
  * codebooks, no rotation; `lopq` = per-cell PCA rotation + per-cell
  * codebooks. The pair attributes any gain between codebook LOCALITY
  * (K×m×ks sub-centroids vs m×ks) and per-cell ROTATION (K dim×dim
  * matrices vs one) — the r16 null proved a global rotation cannot
  * see aniso's per-cluster correlation; these are the instrument that
  * can. r17 artifact = bench/clustered_ann_r17.jsonl.
  */
object ResidualCeilingProbe {
  def main(args: Array[String]): Unit = {
    val nCorpus = if (args.length > 0) args(0).toLong else 50000L
    val nQ = if (args.length > 1) args(1).toLong else 100L
    val kClusters = if (args.length > 2) args(2).toInt else 32
    val sigma = if (args.length > 3) args(3).toDouble else 0.15
    val mode = if (args.length > 4) args(4) else "iid"
    require(mode == "iid" || mode == "aniso" || mode == "galiso",
      s"unknown mode $mode")
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
    def z(j: Column): Column = u(xxhash64(col("id"), j + lit(1000)))
    val emb =
      if (mode == "iid")
        transform(sequence(lit(1), lit(dim)),
          j => u(xxhash64(cl, j)) + lit(sigma) * z(j))
      else {
        // anisotropic-correlated noise: global decaying spectrum
        // s_j = exp(-3(j-1)/(dim-1)) ∈ [1, 0.05] (variance imbalance)
        // times a banded map w_j = z_j + g_j·z_{j⊕1} (hash-derived
        // coefficient g ∈ [-1,1), adjacent-latent mixing that wraps at
        // dim — correlation a permutation cannot remove).
        //
        // mode=aniso keys g on the CLUSTER (g_{c,j}): each cluster has
        // its own correlation structure, and because E_c[g] ≈ 0 the
        // POOLED residual covariance is near-diagonal — a single
        // global rotation cannot see it (the LOPQ motivation,
        // Kalantidis/Avrithis CVPR 2014). mode=galiso keys g on a
        // CONSTANT (g_j, identical in every cluster): the pooled
        // covariance then carries the full banded structure — the
        // geometry where a learned global rotation (full OPQ,
        // Ge et al. TPAMI 2014) is supposed to pay.
        transform(sequence(lit(1), lit(dim)), j => {
          val spectrum = exp((j - lit(1)).cast("double")
            * lit(-3.0 / (dim - 1)))
          val gKey = if (mode == "aniso") cl else lit(42L)
          val g = u(xxhash64(gKey, j + lit(3000)))
          val wrapNext = pmod(j, lit(dim.toLong)) + lit(1)
          u(xxhash64(cl, j)) +
            lit(sigma) * spectrum * (z(j) + g * z(wrapNext))
        })
      }
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
    println(s"""{"probe":"residual_ceiling_routing","mode":"$mode",""" +
      s""""n_corpus":$nCorpus,""" +
      s""""clusters":$kClusters,"sigma":$sigma,"cells":$cellsN,""" +
      s""""nprobe":$nprobe,"candidates":$nCand,""" +
      s""""routing_recall_ceiling":${fmt(ceiling)}}""")

    // ---- FULL residual vectors (permutation crosses subspace
    // boundaries, so residualize BEFORE slicing) --------------------
    val corpusResid = corpus.join(corpusCells, Seq("vec_id"))
      .join(broadcast(cells), Seq("cent_id"))
      // cent_id retained for the r17 per-cell (LOPQ) legs; the global
      // legs' subOf projections drop it
      .select(col("vec_id"), col("cent_id"),
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
    lazy val dimVariances: Array[(Int, Double)] = corpusResid
      .select(posexplode(col("rv")).as(Seq("pos", "v")))
      .groupBy("pos")
      .agg(avg(col("v") * col("v")).as("m2"), avg(col("v")).as("m1"))
      .orderBy("pos").collect()
      .map(r => (r.getInt(0), r.getDouble(1) - r.getDouble(2) * r.getDouble(2)))
    /** The one greedy balanced bin-packing every allocation leg
      * shares (review r17 — opqPerm, pcaBasis, and the per-cell LOPQ
      * bases previously carried three inline copies): items =
      * (index, sort weight, sum weight) — sort and sum weights are
      * SEPARATE because Ge et al.'s product criterion sorts by raw
      * eigenvalue while balancing log-eigenvalue mass. Items sorted
      * by sort weight desc (ties by index), each placed into the open
      * bin with the lowest sum-weight total (ties by bin index).
      * Returns bins in order, each a list of item indices. */
    def balancedBins(items: Seq[(Int, Double, Double)], m: Int,
                     subDim: Int): Seq[Seq[Int]] = {
      val bins = Array.fill(m)(List.empty[Int])
      val sums = Array.fill(m)(0.0)
      items.sortBy { case (idx, sw, _) => (-sw, idx) }
        .foreach { case (idx, _, w) =>
          val open = (0 until m).filter(b => bins(b).size < subDim)
          val b = open.minBy(b => (sums(b), b))
          bins(b) = bins(b) :+ idx
          sums(b) += w
        }
      bins.toSeq
    }
    def opqPerm(m: Int, subDim: Int): Seq[Int] =
      balancedBins(dimVariances.toSeq.map { case (p, v) => (p, v, v) },
        m, subDim).flatten
    /** Boustrophedon ("snake") allocation: dims sorted by variance
      * desc are dealt m-at-a-time, direction alternating per round —
      * bin = pos%m on even rounds, m-1-pos%m on odd. No sequential
      * state at all (one rank + arithmetic), so unlike the greedy
      * bin-packing it is expressible in pure SQL for an oracle replay;
      * the probe leg measures whether it gives up anything vs greedy. */
    def snakePerm(m: Int, subDim: Int): Seq[Int] = {
      // the deal only fills bins evenly when dim == m * subDim; a
      // mismatched probe config must fail loudly, not silently build
      // wrong-sized subspaces (ADVICE r16 #3 — opqPerm checks bin
      // capacity, this one is pure arithmetic so assert up front)
      require(dimVariances.length == m * subDim,
        s"snakePerm: dim ${dimVariances.length} != m*subDim ${m * subDim}")
      val sorted = dimVariances.sortBy { case (pos, v) => (-v, pos) }
      val bins = Array.fill(m)(List.empty[Int])
      sorted.zipWithIndex.foreach { case ((pos, _), r) =>
        val round = r / m
        val k = r % m
        val b = if (round % 2 == 0) k else m - 1 - k
        bins(b) = bins(b) :+ pos
      }
      bins.toSeq.flatten
    }
    def permuteRv(df: DataFrame, perm: Seq[Int]): DataFrame =
      df.withColumn("rv",
        array(perm.map(i => col("rv").getItem(i)): _*))

    /** Pooled residual covariance (64×64 — driver-sized by
      * construction): E[r_i r_j] via one posexplode² pass whose
      * shuffle carries only 4096 (i, j) partial-agg keys, minus the
      * mean outer product. */
    def residCovariance(): Array[Array[Double]] = {
      val mu = corpusResid.select(posexplode(col("rv")).as(Seq("i", "vi")))
        .groupBy("i").agg(avg("vi").as("m"))
        .orderBy("i").collect().map(_.getDouble(1))
      val eij = corpusResid
        .select(posexplode(col("rv")).as(Seq("i", "vi")), col("rv"))
        .select(col("i"),
          posexplode(transform(col("rv"), y => col("vi") * y))
            .as(Seq("j", "prod")))
        .groupBy("i", "j").agg(avg("prod").as("e"))
        .collect()
      val cov = Array.fill(dim, dim)(0.0)
      eij.foreach { r =>
        val (i, j) = (r.getInt(0), r.getInt(1))
        cov(i)(j) = r.getDouble(2) - mu(i) * mu(j)
      }
      cov
    }

    /** Cyclic Jacobi eigendecomposition of a symmetric matrix —
      * returns (eigenvalues, eigenvector COLUMNS); 64×64 converges in
      * a handful of sweeps, pure driver arithmetic. */
    def jacobiEigen(a0: Array[Array[Double]])
        : (Array[Double], Array[Array[Double]]) = {
      val n = a0.length
      val a = a0.map(_.clone())
      val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
      var sweep = 0
      var off = Double.MaxValue
      while (sweep < 30 && off > 1e-10) {
        for (p <- 0 until n - 1; q <- p + 1 until n
             if math.abs(a(p)(q)) > 1e-12) {
          val theta = 0.5 * math.atan2(2 * a(p)(q), a(q)(q) - a(p)(p))
          val (c, s) = (math.cos(theta), math.sin(theta))
          var i = 0
          while (i < n) { // A <- A·J
            val (aip, aiq) = (a(i)(p), a(i)(q))
            a(i)(p) = c * aip - s * aiq; a(i)(q) = s * aip + c * aiq
            i += 1
          }
          i = 0
          while (i < n) { // A <- Jᵀ·A
            val (api, aqi) = (a(p)(i), a(q)(i))
            a(p)(i) = c * api - s * aqi; a(q)(i) = s * api + c * aqi
            i += 1
          }
          i = 0
          while (i < n) { // V <- V·J (columns are eigenvectors)
            val (vip, viq) = (v(i)(p), v(i)(q))
            v(i)(p) = c * vip - s * viq; v(i)(q) = s * vip + c * viq
            i += 1
          }
        }
        off = (for (i <- 0 until n; j <- 0 until n if i != j)
          yield a(i)(j) * a(i)(j)).sum
        sweep += 1
      }
      (Array.tabulate(n)(i => a(i)(i)), v)
    }

    /** The cheap LEARNED rotation (OPQ non-parametric init, Ge et al.
      * TPAMI 2014 §4): rotate residuals into the PCA eigenbasis of
      * their pooled covariance, then allocate eigen-dims to subspaces
      * balancing per-bin log-eigenvalue mass (the product criterion) —
      * greedy largest-first, ties by bin index. Returns the basis rows
      * in subspace-major output order; rv'_k = basis(k)·rv is a
      * map-only expression. Deterministic: covariance, Jacobi, and the
      * greedy allocation are all order-fixed. */
    lazy val eigen = jacobiEigen(residCovariance())
    /** `balanceRaw = false` is Ge et al.'s product criterion (equal
      * per-bin log-eigenvalue mass — the Gaussian high-rate MSE
      * optimum); `balanceRaw = true` swaps in the same raw-variance
      * sum balance [[opqPerm]] uses, isolating the allocation
      * criterion from the rotation itself. */
    def pcaBasis(m: Int, subDim: Int,
                 balanceRaw: Boolean = false): Seq[Array[Double]] = {
      val (vals, vecs) = eigen
      balancedBins((0 until dim).map { i =>
          (i, vals(i),
            if (balanceRaw) vals(i)
            else math.log(math.max(vals(i), 1e-12)))
        }, m, subDim)
        .flatten.map(ei => Array.tabulate(dim)(i => vecs(i)(ei)))
    }
    def rotateRv(df: DataFrame, basis: Seq[Array[Double]]): DataFrame =
      df.withColumn("rv", array(basis.map(row =>
        row.zipWithIndex.map { case (w, i) =>
          col("rv").getItem(i) * lit(w)
        }.reduce(_ + _)): _*))

    // ---- PER-CELL rotations + codebooks: the LOPQ instrument -------
    // (Kalantidis/Avrithis, Locally Optimized Product Quantization,
    // CVPR 2014 — VERDICT r16 stretch #6). The r16 analysis proved a
    // GLOBAL rotation cannot see mode=aniso's per-cluster correlation
    // (pooled covariance near-diagonal); the only instrument that can
    // is a rotation PER IVF CELL, and full LOPQ pairs it with a
    // codebook per cell. Two legs isolate the two state costs:
    //   cellcb — per-cell CODEBOOKS, no rotation (prices codebook
    //            locality alone: K × m × ks sub-centroids vs m × ks);
    //   lopq   — per-cell PCA rotation + per-cell codebooks (adds
    //            K dim×dim rotation matrices; rotation's marginal
    //            value = lopq − cellcb).
    // Per-cell codebooks ride the EXISTING pq machinery via a key
    // remap: m' = cent_id·m + mi makes pqTrain/pqCodes/pqLut train,
    // assign, and look up independently per cell with zero new code —
    // a corpus vector only meets its own cell's codes, and a query's
    // per-probed-cell LUT rows carry that cell's m' keys.
    lazy val cellEigens: Map[Long, (Array[Double], Array[Array[Double]])] = {
      val mus = corpusResid
        .select(col("cent_id"), posexplode(col("rv")).as(Seq("i", "vi")))
        .groupBy("cent_id", "i").agg(avg("vi").as("mu"))
        .collect().groupBy(_.getLong(0)).map { case (c, rows) =>
          val mu = Array.fill(dim)(0.0)
          rows.foreach(r => mu(r.getInt(1)) = r.getDouble(2))
          c -> mu
        }
      // per-cell E[r_i r_j]: (cell, i, j)-keyed partial agg — 64×4096
      // keys in shuffle, driver-sized result
      corpusResid
        .select(col("cent_id"), posexplode(col("rv")).as(Seq("i", "vi")),
          col("rv"))
        .select(col("cent_id"), col("i"),
          posexplode(transform(col("rv"), y => col("vi") * y))
            .as(Seq("j", "prod")))
        .groupBy("cent_id", "i", "j").agg(avg("prod").as("e"))
        .collect().groupBy(_.getLong(0)).map { case (c, rows) =>
          val mu = mus(c)
          val cov = Array.fill(dim, dim)(0.0)
          rows.foreach { r =>
            val (i, j) = (r.getInt(1), r.getInt(2))
            cov(i)(j) = r.getDouble(3) - mu(i) * mu(j)
          }
          c -> jacobiEigen(cov)
        }
    }
    /** Per-cell PCA basis, flattened subspace-major (kk·dim+i), with
      * the RAW-variance-balanced allocation — the criterion the r16
      * sweep measured beating Ge et al.'s product criterion by 35 pts
      * off-Gaussian; the rotation leg gets its best measured shot. */
    def cellBasisDf(m: Int, subDim: Int): DataFrame = {
      import spark.implicits._
      cellEigens.toSeq.map { case (c, (vals, vecs)) =>
        (c, balancedBins((0 until dim).map(i => (i, vals(i), vals(i))),
            m, subDim)
          .flatten.flatMap(ei => (0 until dim).map(i => vecs(i)(ei))))
      }.toDF("__cell", "__b")
    }
    /** rv ← R_cell · rv, the basis joined per row from the broadcast
      * (cell, flattened-basis) table — 64 cells × 4096 doubles = 2 MB. */
    def rotatePerCell(df: DataFrame, cellCol: String,
                      basisDf: DataFrame): DataFrame =
      df.join(broadcast(basisDf.withColumnRenamed("__cell", cellCol)),
          Seq(cellCol))
        .withColumn("rv", expr(
          s"""transform(sequence(0, ${dim - 1}), kk ->
                aggregate(sequence(0, ${dim - 1}), CAST(0.0 AS DOUBLE),
                  (acc, i) -> acc + element_at(__b, kk * $dim + i + 1)
                                    * element_at(rv, i + 1)))"""))
        .drop("__b")

    // ---- the sweep: m × pqTrain-iters × encoder decomposition ------
    // iid mode re-runs the r15 leg set (plain + OPQ-lite permutation);
    // aniso mode adds the learned-rotation leg the correlated
    // geometry exists to price
    val legs: Seq[(Int, Int, String)] =
      if (mode == "iid")
        (for (m <- Seq(8, 16); it <- Seq(0, 2, 4, 8)) yield (m, it, "plain")) ++
          Seq((8, 4, "perm"), (16, 4, "perm"), (16, 8, "perm"))
      else if (mode == "aniso")
        Seq((8, 2, "plain"), (8, 4, "plain"), (16, 2, "plain"),
          (16, 4, "plain"), (8, 4, "perm"), (16, 4, "perm"),
          (8, 4, "pca"), (16, 4, "pca"),
          (8, 4, "pca_bal"), (16, 4, "pca_bal"),
          (8, 4, "snake"), (16, 4, "snake"),
          // r17 LOPQ legs: per-cell codebooks without/with per-cell
          // rotation — the control pair that attributes any gain —
          // plus a GLOBAL codebook at 4× ks (the same "more codes"
          // direction WITHOUT locality, so the cellcb gain can't be
          // misread as mere code count). Scaling the global control
          // further is MEASURED infeasible: the bigcb16 leg (16×ks =
          // 4096 global codes) OOMs the 50 k encode join — every
          // subvector × every code = 1.6e9 joined rows — which is
          // itself the locality finding: only the per-cell split
          // makes 64×ks total codes affordable, each vector meeting
          // its own cell's 256 codes only (r17 log: OutOfMemoryError
          // at stage 121, isolated SPARK_GRAFT_PROBE_LEGS=bigcb16 run)
          (8, 4, "cellcb"), (16, 4, "cellcb"),
          (8, 4, "lopq"), (16, 4, "lopq"),
          (8, 4, "bigcb4"), (16, 4, "bigcb4"))
      else // galiso: every encoder head-to-head at both m on the
           // globally-correlated geometry
        Seq((8, 4, "plain"), (8, 4, "perm"), (8, 4, "pca"),
          (8, 4, "pca_bal"), (16, 4, "plain"), (16, 4, "perm"),
          (16, 4, "pca"), (16, 4, "pca_bal"))
    // optional leg subset (comma-separated encoder names) — isolated
    // re-measure of one leg without re-running the sweep, the same
    // convention as Bench's SPARK_GRAFT_ONLY
    val onlyEnc = sys.env.get("SPARK_GRAFT_PROBE_LEGS")
      .map(_.split(",").map(_.trim).toSet)
    for ((m, iters, enc) <- legs if onlyEnc.forall(_.contains(enc))) {
      val subDim = dim / m
      val perCell = enc == "cellcb" || enc == "lopq"
      val (cres, qres) = enc match {
        case "plain" | "cellcb" => (corpusResid, queryResid)
        case e if e.startsWith("bigcb") => (corpusResid, queryResid)
        case "perm" =>
          val perm = opqPerm(m, subDim)
          (permuteRv(corpusResid, perm), permuteRv(queryResid, perm))
        case "snake" =>
          val perm = snakePerm(m, subDim)
          (permuteRv(corpusResid, perm), permuteRv(queryResid, perm))
        case "pca" =>
          val basis = pcaBasis(m, subDim)
          (rotateRv(corpusResid, basis), rotateRv(queryResid, basis))
        case "pca_bal" =>
          val basis = pcaBasis(m, subDim, balanceRaw = true)
          (rotateRv(corpusResid, basis), rotateRv(queryResid, basis))
        case "lopq" =>
          val bdf = cellBasisDf(m, subDim)
          (rotatePerCell(corpusResid, "cent_id", bdf),
            rotatePerCell(queryResid, "q_cent", bdf))
      }
      // per-cell legs: remap the subspace key to m' = cell·m + mi so
      // every pq helper trains/assigns/looks-up per cell unchanged
      val cSub0 = subOf(cres,
        if (perCell) Seq("vec_id", "cent_id") else Seq("vec_id"), m, subDim)
      val cSub = (if (perCell)
          cSub0.withColumn("m",
              col("cent_id") * lit(m.toLong) + col("m")).drop("cent_id")
        else cSub0)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cSub.count()
      // codebook sample: first-ks ids globally (global legs; bigcbN
      // legs take N×ks globally — the no-locality code-count
      // control), or first-ks ids PER CELL (per-cell legs — full
      // LOPQ state: cells × m × ks sub-centroids)
      val ksMult =
        if (enc.startsWith("bigcb")) enc.stripPrefix("bigcb").toInt else 1
      val ksTotal = if (perCell) ks * cellsN else ks * ksMult
      val cbIds =
        if (perCell)
          corpusCells.withColumn("rn", row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(col("cent_id")).orderBy(col("vec_id"))))
            .filter(col("rn") <= ks).select(col("vec_id").as("cb_id"))
        else
          corpus.orderBy(col("vec_id")).limit(ks * ksMult)
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
      val qSub0 = subOf(qres, Seq("query_id", "q_cent"), m, subDim)
      val qSub = if (perCell)
          qSub0.withColumn("m", col("q_cent") * lit(m.toLong) + col("m"))
        else qSub0
      val lut = qSub
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
      println(s"""{"probe":"residual_ceiling","mode":"$mode",""" +
        s""""cells":$cellsN,""" +
        s""""nprobe":$nprobe,"m":$m,"ks":$ks,"ks_total":$ksTotal,""" +
        s""""pq_iters":$iters,""" +
        s""""encoder":"$enc","residual":true,"train_sec":${fmt(trainSec)},""" +
        s""""search_sec":${fmt(searchSec)},"recall":${fmt(recall)}}""")
    }
    spark.stop()
  }
}
