package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ScaleOps

/** The REVERSE edit-distance head-to-head: the r11 100× measurement
  * (BASELINE.md) showed the Ed-Join q-gram join LOSING to the
  * Pass-Join segment join on the replica's LOW-ENTROPY generated text
  * (gram vocab 4 782 → mean postings 3 090 → the gram prefix filter
  * stops filtering). `ScaleOps.adviseDedup` encodes the crossover in
  * the other direction too — qgram while predicted gram candidates
  * stay ≤ 64n — but that branch had no measurement behind it. This
  * probe builds the DIVERSE corpus the battery's generated text cannot
  * provide and measures both exact operators (plus the lossy blocked
  * join's predicted candidate volume) at the same 500 k-row scale as
  * the 100× corpus run.
  *
  * The corpus is deterministic (no RNG — xxhash64 of the row id), all
  * Spark-native: 20-char keys over the base64 alphabet (~6 bits/char,
  * so 4-gram vocabulary ≈ 16.7 M ≫ corpus grams and postings lists
  * collapse to ~1), with 4 % planted single-edit mutants so the two
  * exact operators have a non-trivial match set to agree on. Both
  * operators run min-of-2; equal match counts are asserted (both are
  * exact-recall by theorem, so a mismatch is a bug, not noise).
  *
  * Usage: runMain graft.examples.EntropyHeadToHead [nBase]
  */
object EntropyHeadToHead {
  def main(args: Array[String]): Unit = {
    val nBase = if (args.nonEmpty) args(0).toLong else 500000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 20 chars of base64(16 hash bytes) — deterministic, ~6 bits/char
    val keyExpr = expr(
      "substring(base64(concat(" +
        "unhex(lpad(hex(xxhash64(id, 1)), 16, '0')), " +
        "unhex(lpad(hex(xxhash64(id, 2)), 16, '0')))), 1, 20)")
    val base = spark.range(nBase).select(col("id"), keyExpr.as("k"))
    // every 25th row also emits a dist<=1 mutant: one char, at a
    // hash-picked position, replaced by a hash-picked base64 char
    val pos = (pmod(xxhash64(col("id"), lit(3)), lit(20)) + 1).cast("int")
    val alphabet =
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
    val sub = substring(lit(alphabet),
      (pmod(xxhash64(col("id"), lit(4)), lit(64)) + 1).cast("int"), lit(1))
    val mutated = base.filter(col("id") % 25 === 0)
      .select((col("id") + nBase).as("id"),
        concat(
          col("k").substr(lit(1), pos - 1),
          sub,
          col("k").substr(pos + 1, lit(20) - pos)).as("k"))
    val docs = base.unionByName(mutated)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = docs.count()
    val d = 4

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }
    def minOf2(name: String)(f: => Long): (Double, Long) = {
      val a = timed(f); val b = timed(f)
      val best = if (a._1 <= b._1) a else b
      println(f"""{"op":"$name","sec":${best._1}%.1f,"matches":${best._2},""" +
        f""""passes":[${a._1}%.1f,${b._1}%.1f]}""")
      best
    }

    // corpus gram statistics at the derived q + the advisor's verdict
    val (q, np) = ScaleOps.deriveQgramParams(docs, "k", maxDist = d)
    val grams = docs.select(explode(transform(
      when(length(col("k")) >= q,
        sequence(lit(1), length(col("k")) - lit(q - 1)))
        .otherwise(array().cast("array<int>")),
      i => col("k").substr(i, lit(q)))).as("__g"))
    val g = grams.agg(count(lit(1)).as("t"),
      count_distinct(col("__g")).as("v")).head()
    val (totalGrams, vocab) = (g.getLong(0), g.getLong(1))
    val worst = docs.groupBy(substring(col("k"), 1, 1)).count()
      .agg(max("count")).head().getLong(0)
    val stats = ScaleOps.DedupCorpusStats(
      n, totalGrams.toDouble / n, vocab, worst)
    val advice = ScaleOps.adviseDedup(stats, ScaleOps.EditDistance(d, q))
    println(f"""{"corpus":"base64-diverse","n":$n,"q":$q,""" +
      f""""gramVocab":$vocab,"avgDf":${totalGrams / math.max(vocab, 1L)},""" +
      f""""advice":"${advice.operator}",""" +
      f""""advicePredicted":${advice.predictedCandidates}}""")

    // the lossy blocker's own candidate volume on this corpus,
    // PREDICTED exactly from its (prefix, length-band) key histogram
    // (uniform 20-char keys collapse the bands to one, so the fixed
    // key space is just the 64-char first-char alphabet)
    val blocking = ScaleOps.deriveFuzzyBlocking(docs, "k", maxDist = d)
    val lh = docs.groupBy(
      substring(col("k"), 1, blocking.prefixLen).as("__c"),
      (length(col("k")) / d).cast("long").as("__b")).count()
    val rh = docs.select(col("k"),
        explode(sequence((length(col("k")) / d).cast("long") - 1,
          (length(col("k")) / d).cast("long") + 1)).as("__b"))
      .groupBy(substring(col("k"), 1, blocking.prefixLen).as("__c"),
        col("__b")).count()
    val blockedCand = lh.as("L").join(rh.as("R"), Seq("__c", "__b"))
      .agg(sum(col("L.count") * col("R.count"))).head().getLong(0)
    println(f"""{"op":"blocked_predicted","prefixLen":${blocking.prefixLen},""" +
      f""""candidates":$blockedCand}""")

    val left = docs.select(col("id").as("id_a"), col("k").as("s_a"))
    val right = docs.select(col("id").as("id_b"), col("k").as("s_b"))
    val (_, mq) = minOf2("qgram") {
      ScaleOps.qgramFuzzyJoin(left, right, "s_a", "s_b",
          maxDist = d, q = q, partitions = np)
        .filter(col("id_a") < col("id_b")).count()
    }
    val plan = ScaleOps.deriveSegmentJoin(docs, "k", maxDist = d)
    val (_, ms) = minOf2("segment") {
      ScaleOps.segmentFuzzyJoin(left, right, "s_a", "s_b", maxDist = d,
          broadcastIndex = plan.broadcastIndex,
          partitions = plan.partitions, symmetric = true)
        .filter(col("id_a") < col("id_b")).count()
    }
    require(mq == ms,
      s"exact operators disagree: qgram=$mq segment=$ms — recall bug")
    println(s"""{"agreement":true,"matches":$mq}""")
    docs.unpersist()
    spark.stop()
  }
}
