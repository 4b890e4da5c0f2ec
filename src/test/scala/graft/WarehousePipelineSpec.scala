package graft

import org.scalatest.funsuite.AnyFunSuite

/** The composed warehouse-maintenance pipeline (incremental ingest →
  * profile → expectations gate → SCD2 → golden records → incremental
  * refresh → snapshot diff → funnel/cohort) runs end to end on real
  * testdata with internally consistent counts.
  */
class WarehousePipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pipeline composes with consistent stage counts") {
    val json = graft.examples.WarehousePipelineDemo
      .run(spark, "/root/testdata/sf0.001")
    val kv = "\"([a-z_]+)\":(\\d+)".r.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
    // the 1/20 orderkey slice of the staged batch all arrives
    assert(kv("n_ingested") > 0)
    assert(kv("n_profiled") == 4)
    assert(kv("n_checks_failed") == 0)
    // every tracked customer has exactly one open (valid_to IS NULL)
    // current version, and at least as many total versions
    assert(kv("n_open_versions") > 0)
    assert(kv("n_versions") >= kv("n_open_versions"))
    // golden records cover a superset customer range (custkey < 300 vs
    // the history's < 100), so there are at least as many golden
    // records as open versions
    assert(kv("n_golden") >= kv("n_open_versions"))
    assert(kv("n_agg_rows") == 3) // l_returnflag domain
    // snapshot diff / funnel / cohort all produce rows in-session
    assert(kv("n_diff_rows") > 0)
    assert(kv("n_funnel_rows") > 0)
    assert(kv("n_cohort_rows") > 0)
  }
}
