package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Driver-side BPE merge loop at a PRODUCTION budget (VERDICT r16
  * missing #3): `q_bpe_merges` gates the merge loop at budget 6 with
  * a distributed re-segmentation per iteration — right for a
  * cross-engine gate, wrong for a trainer, whose budget is 30 k+
  * merges and whose per-iteration state is the vocabulary-BOUNDED
  * (word, freq) table the one distributed corpus pass already
  * produced. Real trainers (Sennrich et al. 2016 §3.2, learn_bpe)
  * run the loop driver-side over that table with INCREMENTAL
  * pair-count maintenance: each merge touches only the words that
  * contain the merged pair (a pair→words index), subtracting the
  * affected words' old adjacent-pair contributions and adding the
  * new ones — never recounting the whole vocabulary, never touching
  * the corpus.
  *
  * This probe converts the gate docstring's claim into a measurement:
  *
  *   1. the ONE distributed pass (identical to the gate's): token
  *      count → (word, freq), collected — vocab-bounded driver state;
  *   2. correctness anchor: the first [[graft.operators.TextQueries
  *      .BpeMergeBudget]] driver merges must equal the gate's
  *      distributed merges triple-for-triple — the pricing probe
  *      rides the oracle-gated semantics, not a lookalike — then the
  *      loop runs the gate table to EXHAUSTION (the synthetic corpus
  *      has a 31-word vocabulary by construction, so every mergeable
  *      pair is consumed after ~10² merges);
  *   3. the production-budget pricing on a corpus-derived SCALE
  *      MODEL: the loop's cost drivers are vocabulary size and live
  *      pair-table size, and 31 words is the unrealistic part of the
  *      synthetic corpus, not the loop — so the probe re-runs the
  *      same distributed count with each adjacent word TRIGRAM
  *      concatenated as the "word" (deterministic, corpus-weighted;
  *      ~27 k distinct entries × ~14 chars at sf0.1 — a realistic
  *      tokenizer-training vocabulary shape) and prices ≥1 000
  *      merges of the identical loop over it;
  *   4. the distributed loop priced for comparison: the gate row's
  *      wall at the same SF ÷ its 6 merges — one Spark job chain per
  *      merge, which at a 30 k budget is 30 k sequential job chains.
  *
  * The argmax is a full scan of the live pair table with the gate's
  * exact tie order (count desc, l, r); merge application is the same
  * greedy left-to-right non-overlapping scan the gate's anchored
  * `replace` performs. Sennrich's lazy max-heap would shave the
  * argmax scan further; the plain scan already makes the verdict
  * unambiguous, so the probe keeps the simpler loop.
  *
  * Artifact: bench/bpe_trainer_r17.jsonl — one line per stage, plus
  * the crossover verdict (s/merge driver vs s/merge distributed).
  */
object BpeTrainerProbe {

  /** One BPE merge-loop run over a weighted word table. Returns the
    * merge triples, elapsed seconds, and whether the pair supply was
    * exhausted before the budget. */
  private def runLoop(vocab: Array[(String, Long)], budget: Int)
      : (Seq[(String, String, Long)], Double, Boolean, Int) = {
    val words: Array[mutable.ArrayBuffer[String]] =
      vocab.map { case (w, _) =>
        mutable.ArrayBuffer.from((w + "»").map(_.toString))
      }
    val freqs: Array[Long] = vocab.map(_._2)
    // live pair counts and pair→words index (lazy-deleted: a stale
    // index entry is skipped when the word no longer contains the pair)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val index = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def addPair(p: (String, String), wi: Int, f: Long): Unit = {
      counts.updateWith(p) { c => Some(c.getOrElse(0L) + f) }
      index.getOrElseUpdate(p, mutable.BitSet.empty) += wi
    }
    words.indices.foreach { wi =>
      val s = words(wi); val f = freqs(wi)
      var i = 0
      while (i < s.length - 1) { addPair((s(i), s(i + 1)), wi, f); i += 1 }
    }
    val t0 = System.nanoTime()
    val merges = mutable.Buffer.empty[(String, String, Long)]
    var k = 0
    var exhausted = false
    while (k < budget && !exhausted) {
      // argmax with the gate's tie order: count desc, then (l, r) asc
      var best: ((String, String), Long) = (null, 0L)
      counts.foreach { case (p, n) =>
        if (n > best._2 || (n == best._2 && best._1 != null &&
            (p._1 < best._1._1 ||
              (p._1 == best._1._1 && p._2 < best._1._2))))
          best = (p, n)
      }
      if (best._1 == null) exhausted = true
      else {
        val (l, r) = best._1
        merges += ((l, r, best._2))
        val lr = l + r
        // touch ONLY the words indexed under the merged pair
        val affected = index.remove(best._1).getOrElse(mutable.BitSet.empty)
        affected.foreach { wi =>
          val s = words(wi); val f = freqs(wi)
          // verify the pair is still present (lazy-deleted index)
          var has = false
          var i = 0
          while (!has && i < s.length - 1) {
            has = s(i) == l && s(i + 1) == r; i += 1
          }
          if (has) {
            // subtract the word's old adjacent-pair contributions
            i = 0
            while (i < s.length - 1) {
              val p = (s(i), s(i + 1))
              counts.updateWith(p)(c => c.map(_ - f).filter(_ != 0L))
              i += 1
            }
            // greedy left-to-right non-overlapping merge — the exact
            // scan order of the gate's anchored replace
            val ns = mutable.ArrayBuffer.empty[String]
            i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
                ns += lr; i += 2
              } else { ns += s(i); i += 1 }
            }
            words(wi) = ns
            // add back the new contributions
            i = 0
            while (i < ns.length - 1) { addPair((ns(i), ns(i + 1)), wi, f); i += 1 }
          }
        }
        k += 1
      }
    }
    (merges.toSeq, (System.nanoTime() - t0) / 1e9, exhausted, counts.size)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val budget = args.lift(1).map(_.toInt).getOrElse(1000)
    val outPath = args.lift(2).getOrElse("/root/repo/bench/bpe_trainer_r17.jsonl")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = mutable.Buffer.empty[String]

    // ---- stage 1: the one distributed corpus pass (gate-identical) --
    val t0 = System.nanoTime()
    val vocab: Array[(String, Long)] = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("wc"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val corpusPassSec = (System.nanoTime() - t0) / 1e9
    val totalSymbols = vocab.map(_._1.length + 1L).sum
    out += f"""{"stage":"corpus_pass","sec":$corpusPassSec%.2f,"vocab":${vocab.length},"total_symbols":$totalSymbols,"sf":"$sfDir"}"""

    // ---- stage 2: gate anchor + exhaustion on the real word table --
    val (gateTableMerges, gateTableSec, gateTableExhausted, _) =
      runLoop(vocab, Int.MaxValue)
    val gateBudget = graft.operators.TextQueries.BpeMergeBudget
    val t2 = System.nanoTime()
    val gate = graft.SparkEntry.queries("q_bpe_merges")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym"),
        r.getAs[Long]("n")))
      .toSeq
    val gateSec = (System.nanoTime() - t2) / 1e9
    val matches = gateTableMerges.take(gateBudget) == gate
    out += f"""{"stage":"gate_anchor","first_${gateBudget}_match":$matches,"gate_table_merges_to_exhaustion":${gateTableMerges.size},"gate_table_loop_sec":$gateTableSec%.3f,"distributed_gate_sec":$gateSec%.2f,"distributed_sec_per_merge":${gateSec / gateBudget}%.2f}"""
    require(matches,
      s"driver loop diverged from the oracle-gated merges:\n" +
        s" driver=${gateTableMerges.take(gateBudget)}\n gate=$gate")
    require(gateTableExhausted,
      "gate-table loop hit Int.MaxValue without exhausting — impossible")

    // ---- stage 3: production budget on the trigram scale model -----
    val t3 = System.nanoTime()
    val triVocab: Array[(String, Long)] = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(split(col("text"), " ").as("ts"))
      // filter BEFORE the sequence: sequence(1, 0) is the DESCENDING
      // [1, 0], not empty, so a <3-token doc would evaluate ts[-1] /
      // ts[size] and abort under ANSI mode (review r17)
      .filter(size(col("ts")) >= 3)
      .select(explode(expr(
        "transform(sequence(1, size(ts) - 2), " +
          "i -> concat(ts[i-1], ts[i], ts[i+1]))")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val triPassSec = (System.nanoTime() - t3) / 1e9
    val triSymbols = triVocab.map(_._1.length + 1L).sum
    out += f"""{"stage":"scale_model_pass","sec":$triPassSec%.2f,"vocab":${triVocab.length},"total_symbols":$triSymbols}"""
    val (triMerges, triSec, triExhausted, livePairs) = runLoop(triVocab, budget)
    val k = triMerges.size
    out += f"""{"stage":"driver_loop","merges":$k,"sec":$triSec%.2f,"merges_per_sec":${k / triSec}%.1f,"exhausted":$triExhausted,"live_pairs_end":$livePairs}"""

    // ---- verdict ----------------------------------------------------
    val driverSecPerMerge = triSec / math.max(k, 1)
    val distSecPerMerge = gateSec / gateBudget
    out += f"""{"stage":"crossover","driver_sec_per_merge":$driverSecPerMerge%.5f,"distributed_sec_per_merge":$distSecPerMerge%.2f,"ratio":${distSecPerMerge / driverSecPerMerge}%.0f,"sec_at_30k_driver":${30000 * driverSecPerMerge}%.1f,"sec_at_30k_distributed":${30000 * distSecPerMerge}%.0f}"""

    val txt = out.mkString("\n") + "\n"
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      txt.getBytes("UTF-8"))
    print(txt)
    spark.stop()
  }
}
