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

  private def withPaired(json: String)(f: java.nio.file.Path => Unit): Unit = {
    val p = java.nio.file.Files.createTempFile("paired", ".json")
    try { java.nio.file.Files.writeString(p, json + "\n"); f(p) }
    finally { java.nio.file.Files.deleteIfExists(p); () }
  }

  test("pairedFor embeds only a record matching fingerprint AND sf (r19 ADVICE)") {
    val rec = """{"paired":true,"fp_a":"new1","fp_b":"oldX","sf":"/x/sf0.1",""" +
      """"ratio_a_over_b":1.01}"""
    withPaired(rec) { p =>
      // fp matches either slot, same sf -> embedded
      assert(BenchCompare.pairedFor(p, "new1", "old0", "/x/sf0.1").contains(rec))
      assert(BenchCompare.pairedFor(p, "zzz", "oldX", "/x/sf0.1").contains(rec))
      // same fp pair, DIFFERENT sf -> rejected (a paired run at another
      // scale factor must not pose as this compare's decisive number)
      assert(BenchCompare.pairedFor(p, "new1", "old0", "/x/sf0.01").isEmpty)
      // no fp overlap -> rejected
      assert(BenchCompare.pairedFor(p, "aaa", "bbb", "/x/sf0.1").isEmpty)
    }
  }

  test("pairedFor rejects a record with no sf field (pre-guard vintage)") {
    withPaired("""{"paired":true,"fp_a":"new1","fp_b":"oldX"}""") { p =>
      assert(BenchCompare.pairedFor(p, "new1", "old0", "/x/sf0.1").isEmpty)
    }
  }

  test("PairedBench refuses a sync dir holding stale run state (r19 ADVICE)") {
    val dir = java.nio.file.Files.createTempDirectory("paired-sync")
    try {
      // residue only a FINISHED (or crashed) earlier run could leave:
      // without the guard, await() on these returns instantly and the
      // two sides free-run — "paired" in name only
      java.nio.file.Files.createFile(dir.resolve("turn-0"))
      java.nio.file.Files.createFile(dir.resolve("done-b"))
      val e = intercept[IllegalArgumentException] {
        PairedBench.main(Array("a", dir.toString))
      }
      assert(e.getMessage.contains("stale run state"))
      assert(e.getMessage.contains("turn-0"))
    } finally {
      java.nio.file.Files.deleteIfExists(dir.resolve("turn-0"))
      java.nio.file.Files.deleteIfExists(dir.resolve("done-b"))
      java.nio.file.Files.deleteIfExists(dir)
      ()
    }
  }

  test("PairedBench stale guard allows only the peer's step-1 files and the launcher logs") {
    val dir = java.nio.file.Files.createTempDirectory("paired-sync")
    val mk = Seq("label-b.txt", "names-b.txt", "up-b", // peer step-1: legit
      "log-a.txt", "log-b.txt",                        // launcher redirects: legit
      "turn-3", "result-a.jsonl", "ready-b", "warm-a") // any-run residue
    try {
      assert(PairedBench.staleFiles(dir, "b").isEmpty) // empty dir ok
      mk.foreach(n => java.nio.file.Files.createFile(dir.resolve(n)))
      // side a (peer=b): the peer's step-1 trio and both launcher
      // stdout/stderr redirects pass; the rest is stale
      assert(PairedBench.staleFiles(dir, "b") ==
        Seq("ready-b", "result-a.jsonl", "turn-3", "warm-a"))
      // side b (peer=a): label-b/names-b/up-b become OWN-side residue
      // — a role rerun in a used dir is stale too; logs stay allowed
      assert(PairedBench.staleFiles(dir, "a").size == mk.size - 2)
    } finally {
      mk.foreach(n => java.nio.file.Files.deleteIfExists(dir.resolve(n)))
      java.nio.file.Files.deleteIfExists(dir)
      ()
    }
  }
}
