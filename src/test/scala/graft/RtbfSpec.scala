package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The right-to-be-forgotten composition (VERDICT r17 stretch #7):
  * one takedown list through all four delete surfaces, with the
  * audit classification agreeing everywhere. */
class RtbfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("one takedown list, four delete surfaces (ANN tombstone, " +
    "prefix tombstone, scrub decrement, streaming delta=-1): all four " +
    "agree on the APPLIED set; re-submitted ids audit ALREADY GONE; " +
    "unknown ids audit NEVER PRESENT") {
    val audits = graft.examples.RtbfDemo.run(spark,
      "/root/testdata/sf0.001",
      Files.createTempDirectory("rtbfspec").toString)

    assert(audits.map(_.surface) == Seq("ann", "prefix", "scrub", "stream"),
      s"surface order drifted: ${audits.map(_.surface)}")

    // the compliance statement: one request, one answer — every
    // surface applies exactly the fresh retracted slice
    val appliedSets = audits.map(_.applied).distinct
    assert(appliedSets.size == 1,
      s"surfaces disagree on the applied set: " +
        audits.map(a => s"${a.surface}=${a.applied.size}").mkString(", "))
    assert(appliedSets.head == (46L to 80L).toSeq,
      s"applied set wrong: ${appliedSets.head.take(10)}…")

    audits.foreach { a =>
      // the prior takedown's slice re-submits as a no-op everywhere
      assert(a.alreadyGone == (40L to 45L).toSeq,
        s"${a.surface}: already-gone ${a.alreadyGone}")
      // never-crawled ids remove nothing anywhere
      assert(a.neverPresent == (9000000000L to 9000000010L).toSeq,
        s"${a.surface}: never-present ${a.neverPresent}")
      assert(a.nRequested == 52, s"${a.surface}: ${a.nRequested} requested")
    }
  }
}
