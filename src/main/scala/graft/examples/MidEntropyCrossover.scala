package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ScaleOps

/** Qgram↔segment crossover measured NEAR the decision boundary
  * (VERDICT r13 #5): `ScaleOps.EdJoinCandidateBudgetPerRow = 3000`
  * (equal-cost avgDf ≈ 181 under the linear-in-avgDf model) was
  * calibrated from two corpora three decades apart — avgDf 1
  * (base64-diverse, `EntropyHeadToHead`) and avgDf 3 090 (first-4-
  * words, `FuzzyTierRemeasure`). A user with mid-entropy natural keys
  * (avgDf 50–500) sits exactly where the model interpolates and
  * nothing had measured. This probe generates corpora with a TUNABLE
  * gram vocabulary — 20-char keys drawn from a restricted alphabet of
  * size `a`, so the 4-gram vocabulary is a⁴ (saturated at 500 k rows)
  * and avgDf ≈ 17n/a⁴ — and measures both exact operators at points
  * spanning the interpolated boundary.
  *
  * Alphabet sizing at n = 5e5 (totalGrams ≈ 17n = 8.5e6):
  * a=20 → vocab 160 000 → avgDf ≈ 53; a=15 → 50 625 → ≈ 168;
  * a=14 → 38 416 → ≈ 221; a=12 → 20 736 → ≈ 410.
  *
  * Keys stay 20 chars so `deriveQgramParams` keeps q = 4 (at d = 4
  * the Ed-Join prefix needs q·d+1 grams, i.e. length ≥ 20 — larger q
  * cannot derive), making avgDf the ONLY moving knob. Everything is
  * deterministic (xxhash64 of the row id, no RNG); every 25th row
  * plants a guaranteed single-edit mutant (replacement is a 1..a-1
  * alphabet SHIFT of the original char, so it stays in-alphabet and
  * differs). Both operators run min-of-2; equal match sets are
  * asserted (both exact by theorem). Per point the advisor's verdict
  * over the measured corpus stats is printed next to the measured
  * winner — the boundary validation the budget constant lacked.
  *
  * Usage: runMain graft.examples.MidEntropyCrossover [nBase] [alphas]
  *   (defaults: 500000 and "20,15,14,12"; tee output to bench/)
  */
object MidEntropyCrossover {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.nonEmpty) args(0).toLong else 500000L
    val alphas = (if (args.length > 1) args(1) else "20,15,14,12")
      .split(",").map(_.trim.toInt).toSeq
    val fullAlpha =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = 4

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    for (a <- alphas) {
      val alpha = fullAlpha.take(a)
      // 20 chars, each hash-picked from the restricted alphabet
      val keyCol = array_join(transform(sequence(lit(1), lit(20)),
        i => lit(alpha).substr(
          (pmod(xxhash64(col("id"), i), lit(a)) + 1).cast("int"), lit(1))), "")
      val base = spark.range(nBase).select(col("id"), keyCol.as("k"))
      // guaranteed-distance-1 mutant: shift the original char by
      // 1..a-1 inside the SAME alphabet (stays in-vocabulary, never
      // equal), at a hash-picked position
      val mutated = base.filter(col("id") % 25 === 0)
        .withColumn("__p",
          (pmod(xxhash64(col("id"), lit(101)), lit(20)) + 1).cast("int"))
        .withColumn("__s",
          (pmod(xxhash64(col("id"), lit(102)), lit(a - 1)) + 1).cast("int"))
        .select((col("id") + nBase).as("id"),
          expr(s"concat(substring(k, 1, __p - 1), " +
            s"substring('$alpha', ((instr('$alpha', substring(k, __p, 1)) " +
            s"- 1 + __s) % $a) + 1, 1), " +
            "substring(k, __p + 1, 20 - __p))").as("k"))
      val docs = base.unionByName(mutated)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = docs.count()

      // corpus gram statistics at the derived q + the advisor verdict
      val (q, np) = ScaleOps.deriveQgramParams(docs, "k", maxDist = d)
      val grams = docs.select(explode(transform(
        when(length(col("k")) >= q,
          sequence(lit(1), length(col("k")) - lit(q - 1)))
          .otherwise(array().cast("array<int>")),
        i => col("k").substr(i, lit(q)))).as("__g"))
      val g = grams.agg(count(lit(1)).as("t"),
        count_distinct(col("__g")).as("v")).head()
      val (totalGrams, vocab) = (g.getLong(0), g.getLong(1))
      val avgDf = totalGrams / math.max(vocab, 1L)
      val worst = docs.groupBy(substring(col("k"), 1, 1)).count()
        .agg(max("count")).head().getLong(0)
      val stats = ScaleOps.DedupCorpusStats(
        n, totalGrams.toDouble / n, vocab, worst)
      val advice = ScaleOps.adviseDedup(stats, ScaleOps.EditDistance(d, q))
      println(f"""{"corpus":"alpha$a","n":$n,"q":$q,"gramVocab":$vocab,""" +
        f""""avgDf":$avgDf,"candPerRow":${(q.toLong * d + 1) * avgDf},""" +
        f""""advice":"${advice.operator}"}""")

      val left = docs.select(col("id").as("id_a"), col("k").as("s_a"))
      val right = docs.select(col("id").as("id_b"), col("k").as("s_b"))
      def minOf2(name: String)(f: => Long): (Double, Long) = {
        val p1 = timed(f); val p2 = timed(f)
        val best = if (p1._1 <= p2._1) p1 else p2
        println(f"""{"corpus":"alpha$a","op":"$name","sec":${best._1}%.1f,""" +
          f""""matches":${best._2},"passes":[${p1._1}%.1f,${p2._1}%.1f]}""")
        best
      }
      val (qs, mq) = minOf2("qgram") {
        ScaleOps.qgramFuzzyJoin(left, right, "s_a", "s_b",
            maxDist = d, q = q, partitions = np)
          .filter(col("id_a") < col("id_b")).count()
      }
      val plan = ScaleOps.deriveSegmentJoin(docs, "k", maxDist = d)
      val (ss, ms) = minOf2("segment") {
        ScaleOps.segmentFuzzyJoin(left, right, "s_a", "s_b", maxDist = d,
            broadcastIndex = plan.broadcastIndex,
            partitions = plan.partitions, symmetric = true)
          .filter(col("id_a") < col("id_b")).count()
      }
      require(mq == ms,
        s"exact operators disagree at alpha=$a: qgram=$mq segment=$ms")
      val winner = if (qs <= ss) "qgram_edit_join" else "segment_edit_join"
      println(f"""{"corpus":"alpha$a","avgDf":$avgDf,"qgram_sec":$qs%.1f,""" +
        f""""segment_sec":$ss%.1f,"measured_winner":"$winner",""" +
        f""""advice":"${advice.operator}",""" +
        f""""advice_matches":${advice.operator == winner},"matches":$mq}""")
      docs.unpersist()
    }
    spark.stop()
  }
}
