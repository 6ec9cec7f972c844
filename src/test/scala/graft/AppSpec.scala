package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI-contract parity (reference `src/cli.rs:73-94` unit tests). */
class AppSpec extends AnyFunSuite {

  test("\"30,10,500.0\" parses to three doubles (reference src/cli.rs:75-81)") {
    assert(GraftApp.parseRfmValues("30,10,500.0").toSeq == Seq(30.0, 10.0, 500.0))
    assert(GraftApp.parseRfmValues(" 1 , 2.5 , 3 ").toSeq == Seq(1.0, 2.5, 3.0))
  }

  test("wrong arity rejected (reference src/cli.rs:60-64)") {
    assertThrows[IllegalArgumentException](GraftApp.parseRfmValues("1,2"))
    assertThrows[IllegalArgumentException](GraftApp.parseRfmValues("1,2,3,4"))
  }

  test("non-numeric rejected (reference src/cli.rs:88-93)") {
    assertThrows[IllegalArgumentException](GraftApp.parseRfmValues("invalid"))
    assertThrows[IllegalArgumentException](GraftApp.parseRfmValues("1,x,3"))
  }

  test("arg parsing: flags, defaults, unknown flag") {
    val cfg = GraftApp.Config()
    assert(cfg.clusters == 4 && cfg.maxIters == 300 && cfg.tolerance == 1e-4 &&
      cfg.input == "data.csv" && cfg.output == "cluster_plot.png")
  }
}
