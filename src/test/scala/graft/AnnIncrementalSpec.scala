package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q_ann_incremental contract (VERDICT r15 #2, mirroring
  * DedupQueries.prefixFilterIncremental's guaranteed batch-vs-corpus
  * parity): with the IVF codebook and PQ sub-codebooks FROZEN, the
  * incremental path — assign+encode the arrivals batch separately and
  * union with the untouched corpus artifacts — must be row-identical
  * to a full rebuild that assigns+encodes corpus ∪ batch in one pass.
  * The oracle gate already proves this cross-engine (the DuckDB replay
  * IS the one-pass rebuild); this spec proves it engine-internally on
  * both index artifacts, so a refactor that accidentally makes
  * assignment depend on batch composition (e.g. a per-batch
  * normalization) fails here first. */
class AnnIncrementalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("incremental assign/encode against a frozen codebook equals a " +
    "full rebuild (cells and codes)") {
    import graft.operators.{ExtraSimilarityQueries => ESQ, VectorQueries => VQ}
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val corpusE = e.filter(col("vec_id") >= 20 &&
        pmod(col("vec_id"), lit(5)) =!= 0)
      .select(col("vec_id"), col("embedding"))
    val batchE = e.filter(col("vec_id") >= 20 &&
        pmod(col("vec_id"), lit(5)) === 0)
      .select(col("vec_id"), col("embedding"))
    val unionE = e.filter(col("vec_id") >= 20)
      .select(col("vec_id"), col("embedding"))
    // frozen artifacts, trained on the corpus side only — exactly the
    // q_ann_incremental construction
    val cents = ESQ.lloydTrain(
      corpusE.select(col("vec_id"), col("embedding").as("ev")),
      e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cent_id"),
          graft.functions.VectorFunctions.asDouble(col("embedding")).as("cv")),
      2)
    val cb = VQ.pqSub(corpusE, "vec_id", 8, 8).filter(col("vec_id") < 36)
      .select(col("m").as("cb_m"), col("vec_id").as("code"),
        col("sv").as("cv"))

    // cells: two-pass union vs one-pass rebuild
    def cellsOf(df: org.apache.spark.sql.DataFrame) =
      ESQ.assignTo(cents)(
          df.select(col("vec_id"), col("embedding").as("ev")),
          "vec_id", "ev")
        .select(col("vec_id"), col("cent_id"))
    val incCells = cellsOf(corpusE).unionByName(cellsOf(batchE))
    val rebuildCells = cellsOf(unionE)
    assert(incCells.exceptAll(rebuildCells).isEmpty &&
      rebuildCells.exceptAll(incCells).isEmpty,
      "frozen-codebook cell assignment must not depend on batch composition")

    // codes: two-pass union vs one-pass rebuild
    def codesOf(df: org.apache.spark.sql.DataFrame) =
      VQ.pqCodes(VQ.pqSub(df, "vec_id", 8, 8), cb, "vec_id")
    val incCodes = codesOf(corpusE).unionByName(codesOf(batchE))
    val rebuildCodes = codesOf(unionE)
    assert(incCodes.exceptAll(rebuildCodes).isEmpty &&
      rebuildCodes.exceptAll(incCodes).isEmpty,
      "frozen-codebook PQ encoding must not depend on batch composition")

    // and the batch is genuinely non-trivial on this fixture
    assert(batchE.count() > 0 && corpusE.count() > 0)
  }
}
