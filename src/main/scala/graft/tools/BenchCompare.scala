package graft.tools

/** Floor-matched round-over-round bench comparison (r17 VERDICT #2 /
  * "what's missing" #2): the NOTES have hand-built this table every
  * round — common-query-set sums between runs of two code
  * fingerprints whose saturation floors match, because comparing a
  * quiet run of one fingerprint against a loaded run of another
  * measures the host, not the diff. The discipline is now code:
  *
  *  1. candidate pairs = (run of fingerprint A) × (run of fingerprint
  *     B) from `BENCH_FULL_HISTORY.jsonl`, same sf dir, both carrying
  *     a sat_floor;
  *  2. a pair is FLOOR-MATCHED when max(floor)/min(floor) ≤ 1.15 (the
  *     measured clean run-to-run floor spread is ~1.1×, the
  *     sat-pool-gate band);
  *  3. among matched pairs, prefer both-unflagged, then the QUIETEST
  *     (min of the pair's worse floor), then the tightest ratio;
  *  4. the verdict table is the COMMON query set's totals plus the
  *     top-10 absolute per-query movers.
  *
  * Bench invokes [[writeCompare]] after every full sweep (newest two
  * distinct fingerprints in history → `BENCH_COMPARE.json`), so the
  * round artifact always carries a code-produced round-over-round
  * number; this main compares any two fingerprints ad hoc:
  *
  *   runMain graft.tools.BenchCompare [fpA fpB] [historyPath]
  */
object BenchCompare {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  final case class Run(code: String, sf: String, value: Double,
      env: Boolean, floor: Double, queries: Map[String, Double])

  /** Floor-match band: clean same-box floors sit within ~1.1×; wider
    * gaps mean the two runs saw different effective machines.
    */
  val MatchRatio = 1.15

  /** Per-line parse; a malformed or field-less line yields None (skip)
    * rather than aborting the whole history — a mixed-vintage history
    * file is the normal case, not an error. No non-local `return` in
    * the lambda (the r18 form's `return Seq.empty` threw
    * NonLocalReturnControl, which the catch-all silently absorbed into
    * a per-line skip — same behavior, by accident), and the catch is
    * NonFatal so a genuine VM error still propagates.
    */
  def parseRuns(historyPath: java.nio.file.Path): Seq[Run] =
    if (!java.nio.file.Files.isRegularFile(historyPath)) Seq.empty
    else scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(historyPath)).asScala.toSeq.flatMap { line =>
      try {
        val j = JsonMethods.parse(line)
        val v = j \ "value" match { case JDouble(x) => x; case _ => -1.0 }
        val code = j \ "code" match { case JString(c) => c; case _ => "" }
        val sf = j \ "sf" match { case JString(x) => x; case _ => "" }
        val env = j \ "env_suspect" match { case JBool(b) => b; case _ => true }
        val floor = j \ "sat_floor" match { case JDouble(x) => x; case _ => -1.0 }
        val qs = j \ "queries" match {
          case JObject(fs) => fs.collect { case (k, JDouble(x)) => k -> x }.toMap
          case _ => Map.empty[String, Double]
        }
        if (qs.nonEmpty && code.nonEmpty && v >= 0) Some(Run(code, sf, v, env, floor, qs))
        else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** The two most recent DISTINCT fingerprints, newest first. */
  def latestFingerprints(runs: Seq[Run]): Option[(String, String)] = {
    val byLast = runs.zipWithIndex.groupBy(_._1.code)
      .map { case (c, rs) => c -> rs.map(_._2).max }.toSeq.sortBy(-_._2).map(_._1)
    byLast match { case a +: b +: _ => Some((a, b)); case _ => None }
  }

  final case class Compare(fpA: String, fpB: String, sf: String,
      floorA: Double, floorB: Double, envA: Boolean, envB: Boolean,
      nCommon: Int, totalA: Double, totalB: Double,
      movers: Seq[(String, Double, Double)])

  /** Pick the floor-matched pair and compute the common-set delta.
    * Returns None when no pair of runs with positive floors matches
    * the band (the honest answer the hand-built NOTES gave in rounds
    * where the host never went quiet twice).
    */
  def compare(runs: Seq[Run], fpA: String, fpB: String): Option[Compare] = {
    val as = runs.filter(r => r.code == fpA && r.floor > 0)
    val bs = runs.filter(r => r.code == fpB && r.floor > 0)
    val pairs = for {
      a <- as; b <- bs
      if a.sf == b.sf
      ratio = math.max(a.floor, b.floor) / math.min(a.floor, b.floor)
      if ratio <= MatchRatio
      common = a.queries.keySet & b.queries.keySet
      if common.nonEmpty
    } yield (a, b, ratio, common)
    if (pairs.isEmpty) return None
    val cleanFirst = {
      val clean = pairs.filter(p => !p._1.env && !p._2.env)
      if (clean.nonEmpty) clean else pairs
    }
    val (a, b, _, common) = cleanFirst.minBy { case (x, y, ratio, _) =>
      (math.max(x.floor, y.floor), ratio)
    }
    val movers = common.toSeq
      .map(q => (q, a.queries(q), b.queries(q)))
      .sortBy { case (_, va, vb) => -math.abs(va - vb) }
    Some(Compare(fpA, fpB, a.sf, a.floor, b.floor, a.env, b.env,
      common.size, movers.map(_._2).sum, movers.map(_._3).sum,
      movers.take(10)))
  }

  private def r3(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  def render(c: Compare, paired: Option[String] = None): String = {
    val mv = c.movers.map { case (q, va, vb) =>
      s"""{"q":"$q","a":${r3(va)},"b":${r3(vb)},"delta":${r3(va - vb)}}"""
    }.mkString("[", ",", "]")
    s"""{"fp_a":"${c.fpA}","fp_b":"${c.fpB}","sf":"${c.sf}",""" +
      s""""floor_a":${r3(c.floorA)},""" +
      s""""floor_b":${r3(c.floorB)},"env_a":${c.envA},"env_b":${c.envB},""" +
      s""""n_common":${c.nCommon},"total_a":${r3(c.totalA)},""" +
      s""""total_b":${r3(c.totalB)},"ratio_a_over_b":${r3(c.totalA / c.totalB)},""" +
      s""""top_movers":$mv""" +
      paired.fold("")(pj => s""","paired":$pj""") + "}"
  }

  /** A PAIRED_BENCH.json produced by [[PairedBench]] covering the
    * CURRENT fingerprint beats any floor-matched history pair — the
    * paired run shares every load window by construction, which is
    * the inference the floor label can only approximate. When one
    * matches, its record is embedded under `"paired"` so the round
    * artifact carries the decisive number alongside the floor-matched
    * one. Matching is on the current side's fp only (either slot):
    * the OLD side of a paired run is a clean rebuild whose fp cannot
    * reproduce the incremental build the history recorded (synthetic
    * class names depend on compile history) — that side is pinned by
    * its `label_b` commit tag inside the embedded record instead.
    * The record must also carry the SAME sf dir as the compare (r19
    * ADVICE: fp is code-only, so a paired run at another scale factor
    * would otherwise embed as the "decisive" number next to a
    * floor-matched compare at this one).
    */
  def pairedFor(pairedPath: java.nio.file.Path, fpA: String,
      fpB: String, sf: String): Option[String] =
    try {
      if (!java.nio.file.Files.isRegularFile(pairedPath)) None
      else {
        val raw = java.nio.file.Files.readString(pairedPath).trim
        val j = JsonMethods.parse(raw)
        (j \ "fp_a", j \ "fp_b", j \ "sf") match {
          case (JString(pa), JString(pb), JString(psf))
              if Set(pa, pb).intersect(Set(fpA, fpB)).nonEmpty &&
                psf == sf => Some(raw)
          case _ => None
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Bench's post-sweep hook: newest two fingerprints → out file.
    * Fail-soft — a malformed history must never fail the bench run.
    */
  def writeCompare(historyPath: java.nio.file.Path,
      outPath: java.nio.file.Path): Option[String] =
    try {
      val runs = parseRuns(historyPath)
      for {
        (fpA, fpB) <- latestFingerprints(runs)
        c <- compare(runs, fpA, fpB)
      } yield {
        val paired = pairedFor(
          outPath.resolveSibling("PAIRED_BENCH.json"), fpA, fpB, c.sf)
        if (paired.isEmpty)
          // said loudly (r19 VERDICT): a floor-matched compare without
          // a same-window paired record is the WEAKER evidence, and a
          // reader of the round artifact should know a paired run is
          // owed for this fingerprint pair
          System.err.println(s"[bench] NO PAIRED RECORD for fp pair " +
            s"($fpA, $fpB) at sf ${c.sf} — the compare below is " +
            "floor-matched only; run tools/paired_launch.sh for the " +
            "decisive same-window number")
        val json = render(c, paired)
        java.nio.file.Files.writeString(outPath, json + "\n")
        json
      }
    } catch { case e: Throwable =>
      System.err.println(s"[bench] compare failed: ${e.getMessage}"); None
    }

  def main(args: Array[String]): Unit = {
    val history = java.nio.file.Paths.get(
      args.lift(2).getOrElse("/root/repo/BENCH_FULL_HISTORY.jsonl"))
    val runs = parseRuns(history)
    val fps = (args.lift(0), args.lift(1)) match {
      case (Some(a), Some(b)) => Some((a, b))
      case _ => latestFingerprints(runs)
    }
    fps match {
      case None => println("""{"error":"need two fingerprints in history"}""")
      case Some((a, b)) => compare(runs, a, b) match {
        case Some(c) => println(render(c))
        case None =>
          println(s"""{"fp_a":"$a","fp_b":"$b","error":"no floor-matched pair within ${MatchRatio}x"}""")
      }
    }
  }
}
