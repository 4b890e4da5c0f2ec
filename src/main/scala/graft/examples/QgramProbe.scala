package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Head-to-head q selection for [[graft.operators.ScaleOps.qgramFuzzyJoin]]
  * at replica scale: for each candidate gram width q, print the corpus'
  * gram statistics (vocabulary, mean postings length), the predicted
  * candidate volume `n·(q·d+1)·avgDf`, and the measured wall time of
  * the full join. Recall is EXACT for every q (the prefix-filter
  * theorem holds for any gram width), so q is a PHYSICAL knob — this
  * probe is how its derivation rule was calibrated.
  *
  * Usage: runMain graft.examples.QgramProbe <sfDir> [q ...]
  */
object QgramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qs = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(2, 3, 4)
    val maxDist = 4
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 4)).as("k"))
      .localCheckpoint()
    val n = docs.count()
    qs.foreach { q =>
      val grams = docs.select(explode(transform(
        when(length(col("k")) >= q,
          sequence(lit(1), length(col("k")) - lit(q - 1)))
          .otherwise(array().cast("array<int>")),
        i => col("k").substr(i, lit(q)))).as("g"))
      val row = grams.agg(count(lit(1)).as("total"),
        countDistinct(col("g")).as("vocab")).head()
      val (total, vocab) = (row.getLong(0), row.getLong(1))
      val avgDf = total / math.max(vocab, 1L)
      val predicted = n * (q.toLong * maxDist + 1) * avgDf
      val np = graft.operators.ScaleOps
        .deriveQgramPartitions(docs, "k", q, maxDist)
      val t0 = System.nanoTime()
      val pairs = graft.operators.ScaleOps.qgramFuzzyJoin(
          docs.select(col("doc_id").as("id_a"), col("k").as("s_a")),
          docs.select(col("doc_id").as("id_b"), col("k").as("s_b")),
          "s_a", "s_b", maxDist = maxDist, q = q, partitions = np)
        .filter(col("id_a") < col("id_b")).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(s"""{"probe":"qgram_q","sf":"$sfDir","q":$q,"n":$n,""" +
        s""""gram_total":$total,"gram_vocab":$vocab,"avg_df":$avgDf,""" +
        s""""predicted_candidates":$predicted,"partitions":$np,""" +
        s""""pairs":$pairs,"wall_sec":${f"$wall%.1f"}}""")
    }
    spark.stop()
  }
}
