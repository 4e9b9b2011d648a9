package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** BenchCompare parse/compare on a synthetic history file — in
  * particular the malformed-line behavior: a corrupt or field-less
  * line is SKIPPED, never aborts the parse of the rest (the r18 form
  * used a non-local `return Seq.empty` whose NonLocalReturnControl the
  * catch-all absorbed into the same skip by accident — this pins the
  * now-explicit semantics).
  */
class BenchCompareSpec extends AnyFunSuite {

  private def line(code: String, floor: Double, total: Double,
      qs: (String, Double)*): String = {
    val q = qs.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    s"""{"metric":"total","value":$total,"unit":"sec","queries":$q,""" +
      s""""env_suspect":false,"sat_floor":$floor,"code":"$code","sf":"/x/sf0.1"}"""
  }

  private def withHistory(lines: Seq[String])(f: java.nio.file.Path => Unit): Unit = {
    val p = java.nio.file.Files.createTempFile("bench-history", ".jsonl")
    try {
      java.nio.file.Files.writeString(p, lines.mkString("", "\n", "\n"))
      f(p)
    } finally { java.nio.file.Files.deleteIfExists(p); () }
  }

  test("corrupt and field-less lines are skipped per-line, not a whole-parse abort") {
    withHistory(Seq(
      line("aaa", 0.55, 10.0, "q1" -> 4.0, "q2" -> 6.0),
      """{this is not json at all""",                       // parse error
      """{"value":9.9,"queries":{"q1":9.9},"sat_floor":0.5,"sf":"/x/sf0.1"}""", // no code
      """{"value":"NaNish","code":"ccc","queries":{"q1":1.0},"sat_floor":0.5,"sf":"/x/sf0.1"}""", // bad value type
      line("bbb", 0.56, 9.0, "q1" -> 4.0, "q2" -> 5.0),
    )) { p =>
      val runs = BenchCompare.parseRuns(p)
      // the two well-formed lines survive; the three bad ones are skipped
      assert(runs.map(_.code) == Seq("aaa", "bbb"))
      // lines AFTER a corrupt line are still parsed (the abort-vs-skip pin)
      assert(runs.exists(_.code == "bbb"))
    }
  }

  test("compare picks the floor-matched pair and sums the common set") {
    withHistory(Seq(
      line("old0", 0.55, 11.0, "q1" -> 5.0, "q2" -> 6.0),
      line("new1", 1.20, 30.0, "q1" -> 15.0, "q2" -> 15.0), // loaded run: floor mismatch
      line("new1", 0.57, 10.0, "q1" -> 4.5, "q2" -> 5.5, "q3" -> 0.1),
    )) { p =>
      val runs = BenchCompare.parseRuns(p)
      assert(BenchCompare.latestFingerprints(runs).contains(("new1", "old0")))
      val c = BenchCompare.compare(runs, "new1", "old0").get
      assert(c.nCommon == 2) // q3 exists on one side only
      assert(math.abs(c.totalA - 10.0) < 1e-9 && math.abs(c.totalB - 11.0) < 1e-9)
      assert(c.floorA == 0.57 && c.floorB == 0.55) // the loaded 1.20-floor run was not matched
    }
  }

  test("no floor-matched pair -> None (the honest no-answer)") {
    withHistory(Seq(
      line("old0", 0.50, 11.0, "q1" -> 5.0),
      line("new1", 0.90, 10.0, "q1" -> 4.5),
    )) { p =>
      val runs = BenchCompare.parseRuns(p)
      assert(BenchCompare.compare(runs, "new1", "old0").isEmpty)
    }
  }
}
