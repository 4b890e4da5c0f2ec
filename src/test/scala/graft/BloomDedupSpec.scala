package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.DedupQueries

/** The bloom membership pre-filter in incrementalExactKeep must (a)
  * never drop a non-duplicate (no false negatives — the gate row also
  * enforces this on real data), (b) actually drop true duplicates, and
  * (c) actually PRUNE: the sliver that pays the digest join must be
  * bounded by true dups + the fpp share, not the whole batch.
  */
class BloomDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact incremental keep == plain anti-join, with true drops") {
    val corpus = docs((0L until 400L).map(i => (i, s"corpus doc number $i")))
    // 60 fresh arrivals + 40 byte-identical replays of corpus docs
    val batch = docs((1000L until 1060L).map(i => (i, s"new doc $i")) ++
      (0L until 40L).map(i => (2000L + i, s"corpus doc number $i")))
    val kept = DedupQueries.incrementalExactKeep(batch, corpus,
        expectedItems = 1024, numBits = 1 << 16)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val plain = batch.join(
        corpus.select(md5(col("text")).as("__cfp")).distinct(),
        md5(col("text")) === col("__cfp"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == plain)
    assert(kept == (1000L until 1060L).toSet,
      "every replayed duplicate must drop, every fresh doc must survive")
  }

  test("the bloom membership check runs as a stateless streaming filter") {
    // the bloom bytes are a broadcast literal and the check is a pure
    // per-row predicate — so `!might` drops definitely-new arrivals
    // straight off a stream with zero state; only the bloom-positive
    // sliver needs the per-batch verify join (foreachBatch, as in the
    // incremental near-dup test)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    val corpus = docs((0L until 300L).map(i => (i, s"corpus doc number $i")))
    val batch = docs((1000L until 1200L).map(i => (i, s"new doc $i")) ++
      (0L until 30L).map(i => (5000L + i, s"corpus doc number $i")))
    val dir = java.nio.file.Files.createTempDirectory("bloomstream")
    val in = dir.resolve("in").toString
    batch.write.mode("overwrite").parquet(in)

    val bloom = DedupQueries.digestBloom(corpus,
      expectedItems = 1024, numBits = 1 << 16)
    def might = ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom),
      XxHash64(Seq(ColumnBridge.expression(md5(col("text")))), 42L)))

    val q = batchSchemaStream(in, batch)
      .filter(!might)
      .writeStream.outputMode("append")
      .format("memory").queryName("bloomclear")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("bloomclear")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batchClear = batch.filter(!might)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batchClear)
    // no false negatives: every replayed duplicate was held back
    assert(streamed.intersect((5000L until 5030L).toSet).isEmpty)
    // and the pass-through is the overwhelming majority of fresh docs
    assert(streamed.size >= 190)
  }

  private def batchSchemaStream(in: String, like: org.apache.spark.sql.DataFrame) =
    spark.readStream.schema(like.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)

  test("the bloom prunes: only ~dups reach the digest verify join") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    val corpus = docs((0L until 400L).map(i => (i, s"corpus doc number $i")))
    val batch = docs((1000L until 1500L).map(i => (i, s"new doc $i")) ++
      (0L until 25L).map(i => (3000L + i, s"corpus doc number $i")))
    val bloom = DedupQueries.digestBloom(corpus,
      expectedItems = 1024, numBits = 1 << 16)
    val might = ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom),
      XxHash64(Seq(ColumnBridge.expression(md5(col("text")))), 42L)))
    val positives = batch.filter(might).count()
    // 25 true dups; at 2^16 bits for ~400 items fpp is far below 1%,
    // so even a loose bound shows the pruning: under 10% of the
    // 525-row batch passes the bloom
    assert(positives >= 25, s"true duplicates must always bloom-positive, got $positives")
    assert(positives < 53, s"bloom failed to prune: $positives of 525 passed")
  }
}
