package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ScaleOps

/** Re-measure the LOW-ENTROPY fuzzy tier at replica scale on current
  * code (VERDICT r12 #5): the phantom-gram fix deliberately changed
  * `deriveQgramParams`' gram statistics and the gram tables
  * `qgramFuzzyJoin` builds, invalidating the pre-fix 100× walls. The
  * RAN record lives in `bench/fuzzy_remeasure_100x_r13.jsonl`
  * (qgram 967.1 s / segment 430.9 s / blocked 424.8 s at avgDf 3 090,
  * identical exact match sets). This probe re-runs all three
  * operators over the SAME
  * corpus shape the r11 battery used — first-4-words keys over the
  * FULL documents table (the battery's `q_fuzzy_match_qgram` gate has
  * since moved to a gram-diverse key with a downsized low-entropy
  * adversarial leg, so the full-corpus low-entropy point now lives
  * here) — and prints the refreshed gram statistics the advisor's
  * in-comment calibration (`ScaleOps.scala` qgram↔segment crossover)
  * rests on.
  *
  * One timed pass per operator (the r11 comparison numbers were
  * single battery rows). Match counts must agree between qgram and
  * segment (both exact by theorem); blocked reports its own (lossy)
  * count for the documented recall trade.
  *
  * Usage: runMain graft.examples.FuzzyTierRemeasure <sfDir>
  *   [ops: csv of qgram,segment,blocked]
  */
object FuzzyTierRemeasure {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val ops = if (args.length > 1) args(1).split(",").toSet
              else Set("qgram", "segment", "blocked")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.cleaner.periodicGC.interval", "2min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 4)).as("k"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = docs.count()
    val d = 4
    def j(s: String): Unit = println(s)
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val m = f
      j(f"""{"op":"$name","sec":${(System.nanoTime() - t0) / 1e9}%.1f,""" +
        s""""matches":$m}""")
    }

    // refreshed corpus statistics at the derived q (post-phantom-fix)
    val (q, np) = ScaleOps.deriveQgramParams(docs, "k", maxDist = d)
    val g = docs.select(explode(transform(
        when(length(col("k")) >= q,
          sequence(lit(1), length(col("k")) - lit(q - 1)))
          .otherwise(array().cast("array<int>")),
        i => col("k").substr(i, lit(q)))).as("__g"))
      .agg(count(lit(1)).as("t"), count_distinct(col("__g")).as("v")).head()
    val (total, vocab) = (g.getLong(0), g.getLong(1))
    val worst = docs.groupBy(substring(col("k"), 1, 1)).count()
      .agg(max("count")).head().getLong(0)
    val stats = ScaleOps.DedupCorpusStats(n, total.toDouble / n, vocab, worst)
    val advice = ScaleOps.adviseDedup(stats, ScaleOps.EditDistance(d, q))
    j(s"""{"corpus":"lowentropy-first4words","n":$n,"q":$q,""" +
      s""""gramTotal":$total,"gramVocab":$vocab,""" +
      s""""avgDf":${total / math.max(vocab, 1L)},""" +
      s""""advice":"${advice.operator}",""" +
      s""""advicePredicted":${advice.predictedCandidates}}""")

    val left = docs.select(col("doc_id").as("id_a"), col("k").as("s_a"))
    val right = docs.select(col("doc_id").as("id_b"), col("k").as("s_b"))
    if (ops("qgram")) timed("qgram") {
      ScaleOps.qgramFuzzyJoin(left, right, "s_a", "s_b",
          maxDist = d, q = q, partitions = np)
        .filter(col("id_a") < col("id_b")).count()
    }
    if (ops("segment")) timed("segment") {
      val plan = ScaleOps.deriveSegmentJoin(docs, "k", maxDist = d)
      ScaleOps.segmentFuzzyJoin(left, right, "s_a", "s_b", maxDist = d,
          broadcastIndex = plan.broadcastIndex,
          partitions = plan.partitions, symmetric = true)
        .filter(col("id_a") < col("id_b")).count()
    }
    if (ops("blocked")) timed("blocked") {
      val bp = ScaleOps.deriveFuzzyBlocking(docs, "k",
        targetRowsPerBlock = 200, pMax = 8, maxDist = d)
      ScaleOps.blockedFuzzyJoin(left, right, "s_a", "s_b", maxDist = d,
          salts = bp.salts, prefixLen = bp.prefixLen,
          saltHotOnlyAbove = 200L, partitions = bp.partitions)
        .filter(col("id_a") < col("id_b")).count()
    }
    docs.unpersist()
    spark.stop()
  }
}
