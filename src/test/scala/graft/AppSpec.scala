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

  test("short flags and --help parse like the reference's clap layer") {
    val cfg = GraftApp.parseArgs(
      List("-i", "in.csv", "-o", "out.png", "-p", "1,2,3", "-v"),
      GraftApp.Config())
    assert(cfg.input == "in.csv" && cfg.output == "out.png" &&
      cfg.predict.contains("1,2,3") && cfg.verbose)
    assert(GraftApp.parseArgs(List("-h"), GraftApp.Config()).help)
    assert(GraftApp.parseArgs(List("--help"), GraftApp.Config()).help)
    // help text names every flag it claims
    Seq("--input", "--clusters", "--output", "--predict", "--max-iters",
      "--tolerance", "--verbose", "--help").foreach(f =>
      assert(GraftApp.HelpText.contains(f), f))
  }

  test("numeric flags: clap-style errors name the flag (reference src/cli.rs:27-32)") {
    val badK = intercept[IllegalArgumentException](
      GraftApp.parseArgs(List("-k", "two"), GraftApp.Config()))
    assert(badK.getMessage.contains("-k/--clusters") &&
      badK.getMessage.contains("'two'"))
    val badIters = intercept[IllegalArgumentException](
      GraftApp.parseArgs(List("--max-iters", "many"), GraftApp.Config()))
    assert(badIters.getMessage.contains("--max-iters"))
    val badTol = intercept[IllegalArgumentException](
      GraftApp.parseArgs(List("--tolerance", "tiny"), GraftApp.Config()))
    assert(badTol.getMessage.contains("--tolerance"))
    // good values still parse (whitespace tolerated like clap's trim)
    val ok = GraftApp.parseArgs(
      List("-k", "6", "--max-iters", " 50 ", "--tolerance", "1e-3"),
      GraftApp.Config())
    assert(ok.clusters == 6 && ok.maxIters == 50 && ok.tolerance == 1e-3)
  }
}
