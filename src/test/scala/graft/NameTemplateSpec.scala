package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.sources.NameTemplate

class NameTemplateSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("README example: {12:16} slices the YYYYMM year") {
    // reference README.md:32
    assert(NameTemplate.expand("super-table-{12:16}", "MON_FICHIER_20210612.csv")
      == "super-table-2021")
  }

  test("python slice semantics: a inclusive, b exclusive, clamped") {
    assert(NameTemplate.expand("t_{0:4}", "cars_202109.csv") == "t_cars")
    assert(NameTemplate.expand("t_{5:11}", "cars_202109.csv") == "t_202109")
    assert(NameTemplate.expand("t_{5:999}", "cars_202109.csv") == "t_202109.csv")
    assert(NameTemplate.expand("t_{7:5}", "cars_202109.csv") == "t_") // empty slice
    assert(NameTemplate.expand("{0:4}_{5:11}", "cars_202109.csv") == "cars_202109")
  }

  test("templates without {a:b} are untouched (property)") {
    val noSlice = Gen.asciiPrintableStr.suchThat(!_.matches("""(?s).*\{\d+:\d+\}.*"""))
    check(Prop.forAll(noSlice) { s =>
      NameTemplate.expand(s, "whatever.csv") == s
    })
  }

  test("expansion matches python slice on arbitrary bounds (property)") {
    val gen = for {
      a <- Gen.choose(0, 30)
      b <- Gen.choose(0, 30)
      name <- Gen.alphaNumStr.map(_.take(25))
    } yield (a, b, name)
    check(Prop.forAll(gen) { case (a, b, name) =>
      val expected = "t_" + name.slice(a, b) // scala slice == python slice for 0<=a,b
      NameTemplate.expand(s"t_{$a:$b}", name) == expected
    })
  }
}
