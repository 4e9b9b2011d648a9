package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver runs this per round against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1) and records the single JSON line
  * it prints as `BENCH_r{N}.json`.
  *
  * Each query is forced end-to-end through the `noop` datasource sink
  * (full materialization of every row, no disk write, no driver
  * collect) — the same discipline you'd use on a cluster bench.
  */
object Bench {
  /** CPU-saturating calibration kernel: `threads` JVM threads each burn
    * a FIXED xorshift loop concurrently, so the wall time is inversely
    * proportional to the parallelism the OS actually grants this
    * process. The r14 close-out showed why the query-based sentinel
    * alone can't catch sustained shared-host pressure: a ~0.2 s
    * single query slips into scheduler gaps and moved ~5% under
    * external loads 5-8 that slowed the 32-thread-wide bench queries
    * 10-15% — while a saturating kernel must be granted ALL cores at
    * once to hit its floor, so the same pressure inflates it
    * proportionally. Pure JVM (no Spark job): no scheduler, codegen,
    * or shuffle noise — the loop JITs once at warm-up and the kernel's
    * code never changes within a run, so drift is BY CONSTRUCTION the
    * environment. The result of every thread escapes through
    * `Future.get` into the returned checksum, so the loop cannot be
    * dead-code-eliminated.
    */
  private[graft] def satKernel(threads: Int): Double = {
    // ~0.57 s at 32 free cores on the reference box (~0.53e9 xorshift
    // steps/s/core, measured); long enough to span scheduler quanta,
    // short enough to sample every CalibEvery queries without moving
    // the run's wall time materially (calibration is never part of
    // the "total" metric)
    val ItersPerThread = 300000000L
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val t0 = System.nanoTime()
      val futs = (0 until threads).map { t =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            var x = 0x9E3779B97F4A7C15L + t
            var i = 0L
            while (i < ItersPerThread) {
              x ^= x << 13; x ^= x >>> 7; x ^= x << 17
              i += 1
            }
            x
          }
        })
      }
      var acc = 0L
      futs.foreach(f => acc ^= f.get())
      val w = (System.nanoTime() - t0) / 1e9
      if (acc == 0x5DEECE66DL) System.err.println("[bench] sat checksum")
      w
    } finally { pool.shutdown(); () }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the test tables are single parquet files; split them finer so
      // scans parallelize across all cores (on a real cluster the data
      // arrives in many files and this is moot)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // v19 has been the sweep's biggest wall and noisiest row since r14
    // (r17 VERDICT #3): run it with its per-leg instrumentation on, so
    // every bench artifact carries the six-serve-legs + baseline split
    // and a cross-round move is attributable to a leg. Total work is
    // unchanged — the legs are 1-row frames the union ran once anyway,
    // just serialized instead of interleaved.
    spark.conf.set("graft.v19.timings", "true")
    // r19 (r18 VERDICT #3): the g-serve family — five of r18's ten
    // slowest rows, on the noise watch since r16 — gets the same
    // per-phase split: seed / seed_score / per-hop walls plus Spark
    // job/task attribution, emitted per g-serve query below.
    spark.conf.set("graft.gserve.timings", "true")

    // Process-CPU time alongside wall time (r9 verdict #1): on a shared
    // sandbox, wall time alone cannot distinguish "the code got slower"
    // from "another process ate the cores". cpu/wall ≈ effective
    // parallelism; a contaminated run shows wall inflating while cpu
    // stays flat (our process simply wasn't scheduled).
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]

    /** (wall sec, process-cpu sec) for one forced end-to-end run; (-1,-1) on failure. */
    def force(name: String): (Double, Double) = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return (-1.0, -1.0)
      }
      ((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
    }

    // Untimed hygiene between queries: drop the previous query's cache
    // slots and take full-GC pauses HERE rather than inside whichever
    // timed query would otherwise trip them. (Spark's ContextCleaner
    // only reclaims shuffle/broadcast state when the JVM GCs the
    // referencing objects; in a 100+-query run an organic full GC of a
    // big heap is a multi-second pause that historically landed on one
    // arbitrary timed query per round.)
    //
    // Two triggers (r5 verdict item 4): GENUINE heap pressure (80% of
    // max — at 50% the r4 run GC'd between most queries and smeared a
    // ~+0.3-0.5 s tax across the suite), plus an unconditional every-8-
    // queries floor. The floor matters because the used/totalMemory
    // check can't see a query that organically expands the heap past
    // the threshold MID-RUN — r5's residual 2-5 s in-query spikes; a
    // periodic untimed GC keeps the heap far enough from the organic-GC
    // point that timed queries don't pay it. Each firing is followed by
    // an untimed re-warm: a full GC flushes soft/weak-referenced state
    // (the file-status/listing cache and the Janino codegen cache, which
    // the rewarm scans repopulate; fresh codegen for a NEW query shape is
    // still repaid inside its timed region — known limitation).
    //
    // SPARK_GRAFT_NO_HYGIENE=1 disables GC+rewarm (not releaseSlots) —
    // the off-arm of the A/B recorded in NOTES_r7.md.
    val noHygiene = sys.env.get("SPARK_GRAFT_NO_HYGIENE").exists(_.nonEmpty)
    // re-warm every base table present in the sf dir (listing-derived:
    // a renamed table can't silently fall out of coverage)
    def rewarm(): Unit =
      for (f <- Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty[java.io.File])
          if f.getName.endsWith(".parquet"))
        try spark.read.parquet(f.getPath)
          .select(org.apache.spark.sql.functions.lit(1)).write
          .format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] rewarm ${f.getName} failed: ${e.getMessage}")
        }
    var sinceHygiene = 0
    def hygiene(): Unit = {
      operators.Dedup.releaseSlots()
      if (noHygiene) return
      sinceHygiene += 1
      val rt = Runtime.getRuntime
      val pressured = rt.totalMemory() - rt.freeMemory() > rt.maxMemory() / 5 * 4
      if (pressured || sinceHygiene >= 8) {
        System.gc()
        rewarm()
        sinceHygiene = 0
      }
    }

    // JIT/codegen warm-up on the flagship, not timed.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // dev-only filter: SPARK_GRAFT_ONLY=q_a,q_b benches a subset (the
    // driver never sets it, so its runs always cover every query)
    val only = sys.env.get("SPARK_GRAFT_ONLY").filter(_.trim.nonEmpty)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { req =>
      val unknown = req -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // Build-once queries (materialized index / learned centroids), if
    // selected: run once untimed so their timed run measures the
    // serve-many path, not the one-time batch build that amortizes
    // across every later query.
    //
    // The last three are not build-once but JIT-warm-in outliers: the
    // r12 verdict flagged d16/d11/d15 as swinging 1.5-3x across
    // same-code rounds, and VarianceProbe attributed it — per-rep
    // process-CPU on identical plans falls monotonically (d16
    // 10.9 -> 2.6 s, d11 46 -> 24 s, d15 22 -> 15 s over ~6 reps,
    // GC ≈ 0) — to C2 compilation of the suite's largest generated
    // kernel classes (fused shingle+minhash, banded Levenshtein,
    // KMV), so a single timed first-run sits at a session-history-
    // dependent point on that warm-in curve. One untimed rep moves
    // the timed sample to (near) steady state, like every other
    // query whose shape the flagship warm-up happens to cover.
    for (n <- Seq("q_v9_indexed_range", "q_v10_ivf_kmeans", "q_v12_pq_adc",
        "q_v13_sq8", "q_v14_ivfpq", "q_v16_filtered_ivf", "q_v17_batch_ivfpq",
        "q_v18_ivfadc_residual", "q_d12_semdedup", "q_d16_incremental_neardup",
        "q_j6_bucketed_join", "q_z2_zorder_serve", "q_g1_knn_graph",
        "q_g2_pagerank", "q_h5_bm25_indexed",
        "q_d11_fuzzy_edit", "q_d15_overlap_kmv") if names.contains(n);
         fn <- SparkEntry.queries.get(n))
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        // a broken build here silently shifts its one-time cost into the
        // timed run — surface it even though the bench itself continues
        System.err.println(s"[bench] warm-up $n failed: ${e.getMessage}")
      }
    // Locale.ROOT: a de_DE/fr_FR default locale would render "1,234"
    // and corrupt the JSON line the driver parses
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    // Environment sentinel (r9 verdict #1): the r9 driver artifact was
    // contaminated (d7 21 s / t1 6 s vs judge-re-measured 3.7 / 0.78 on
    // the same code) and NOTHING in the artifact let a reader tell
    // "slower code" from "busy sandbox" — the round's regression signal
    // burned silently. Fix: a fixed calibration query (the q1_agg
    // scan+shuffle+agg, warmed once untimed) is re-timed every
    // [[CalibEvery]] queries and at both ends of the run; its code never
    // changes within a run, so any mid-run drift is BY CONSTRUCTION the
    // environment, not the diff under test. Each sample also records the
    // OS 1-min load average (an external-pressure witness independent of
    // our own process). If calibration drifts >2x its best sample the
    // artifact self-identifies with a top-level "env_suspect": true —
    // the judge's bar for discarding a run without a manual re-measure.
    val CalibEvery = 15
    val CalibQuery = "q1_agg"
    val calib = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, Double, Double)]
    // clamp to the cores the host actually has: the kernel's floor is
    // meaningful only when every thread CAN run at once — on a box
    // with fewer cores than SPARK_GRAFT_CPUS an unclamped pool is
    // permanently oversubscribed and the drift/pool ratio gates
    // (calibrated on one reference host) would flag clean runs
    val nThreads = math.min(cpus.toInt,
      Runtime.getRuntime.availableProcessors)
    def calibrate(after: Int): Unit = {
      // min-of-2 per sample: a one-off GC/JIT event landing inside one
      // calibration timing is the same single-event noise the re-run
      // guard de-noises for real queries — as a single-shot sample it
      // read as environment drift (two clean-box runs self-flagged on
      // one 1.3 s outlier against a 0.3 s floor). SUSTAINED external
      // pressure — the thing the sentinel exists to catch — slows BOTH
      // back-to-back runs and still trips the >2x gate.
      val (w1, _) = force(CalibQuery)
      val (w2, _) = force(CalibQuery)
      val w = Seq(w1, w2).filter(_ >= 0).minOption.getOrElse(-1.0)
      // saturating kernel alongside the query sample (also min-of-2):
      // the query witnesses the Spark stack's health, the kernel
      // witnesses the CPUs the OS is actually granting — the r14
      // close-out measured external loads 5-8 moving the 0.2 s query
      // ~5% (inside its clean band) while slowing 32-wide queries
      // 10-15%; the kernel, which must be granted every core at once
      // to hit its floor, inflates ~1.55x under the same pressure
      // (SatKernelProbe, 6 busy processes: 0.83-0.93 s vs quiet
      // 0.54-0.63 s)
      val sat = math.min(satKernel(nThreads), satKernel(nThreads))
      if (w >= 0) {
        val load = osBean.getSystemLoadAverage
        calib += ((after, w, load, sat))
        println(s"""{"calibration_after":$after,"sec":${r3(w)},"load":${r3(load)},"sat":${r3(sat)}}""")
      }
    }
    force(CalibQuery) // untimed warm so sample 0 is steady-state, like the rest
    satKernel(nThreads) // JIT-warm the kernel loop once, untimed

    // Quiet-window wait (r15's bench gap): the final code fingerprint
    // of r15 was only ever measured under external load 3-15, so its
    // canonical number was a load artifact and round-over-round
    // comparison degenerated to cross-fingerprint inference. The
    // kernel's floor is CODE-INDEPENDENT (its loop never changes
    // across rounds), so the full history's minimum sat_floor IS this
    // box's quiet band regardless of fingerprint. Before the timed
    // sweep starts, probe the kernel and wait — bounded by
    // SPARK_GRAFT_QUIET_WAIT_SEC — for the host to go quiet rather
    // than measuring straight into the pressure. The wait only delays
    // the sweep; it never re-runs or re-selects samples (an in-JVM
    // sweep rerun would be JIT/cache-warm-biased below a cold run and
    // would change what the metric measures).
    val quietWaitBudget = sys.env.getOrElse(
      "SPARK_GRAFT_QUIET_WAIT_SEC", "240").toInt
    // Robust quiet reference (r16 ADVICE): the all-time minimum lets a
    // single anomalously low historical sample — or a hardware change
    // that made the box permanently slower — force every future run to
    // burn the whole wait budget. Use max(5th percentile of all
    // history, min of the most recent 40 samples): a lone low outlier
    // is discarded by the percentile; a permanently slower box raises
    // the recent-window min. SPARK_GRAFT_QUIET_REF overrides the
    // reference value itself for hosts where neither heuristic fits.
    val historySatRef: Option[Double] =
      sys.env.get("SPARK_GRAFT_QUIET_REF").flatMap(_.toDoubleOption)
        .orElse(try {
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        val hp = java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_BENCH_FILE", "/root/repo/BENCH_FULL.json")
            .stripSuffix(".json") + "_HISTORY.jsonl")
        if (!java.nio.file.Files.isRegularFile(hp)) None
        else {
          val floors = scala.jdk.CollectionConverters.ListHasAsScala(
              java.nio.file.Files.readAllLines(hp)).asScala.toSeq
            .flatMap { line =>
              try JsonMethods.parse(line) \ "sat_floor" match {
                case JDouble(x) if x > 0 => Some(x); case _ => None
              } catch { case _: Throwable => None }
            }
          if (floors.isEmpty) None
          else {
            val sorted = floors.sorted
            val p05 = sorted((0.05 * (sorted.size - 1)).round.toInt)
            val recentMin = floors.takeRight(40).min
            Some(math.max(p05, recentMin))
          }
        }
      } catch { case _: Throwable => None })
    var quietWaited = 0
    var satPrewait = math.min(satKernel(nThreads), satKernel(nThreads))
    // accept within 10% of the historical quiet floor by default —
    // the measured clean run-to-run floor spread is ~1.1x (r15 pool
    // analysis); env-overridable like the other two kernel ratio
    // gates, for hosts with a legitimately wider clean spread
    val quietAcceptRatio = sys.env.getOrElse(
      "SPARK_GRAFT_QUIET_ACCEPT_RATIO", "1.10").toDouble
    historySatRef.foreach { ref =>
      while (satPrewait > quietAcceptRatio * ref && quietWaited < quietWaitBudget) {
        Thread.sleep(15000); quietWaited += 15
        satPrewait = math.min(satKernel(nThreads), satKernel(nThreads))
      }
      println(s"""{"sat_prewait":${r3(satPrewait)},"quiet_ref":${r3(ref)},"quiet_wait_s":$quietWaited}""")
    }

    // Per-query re-run guard (r5 verdict item 1, r7 "what's wrong" #1):
    // a single organic full-GC / JIT / page-cache event can land inside
    // one arbitrary timed query and read as a 2-7x regression of code
    // that didn't change (q_t15 in r7: driver 7.12 s vs builder 2.0 s).
    // If a time exceeds 2x the trailing median of kept times (and a
    // 1 s noise floor — sub-second plans live in the scheduler-noise
    // band, r7 defect #5), run hygiene and re-measure ONCE, keep the
    // min, and record both values so the artifact distinguishes "code
    // got slower" from "the JVM hiccuped here".
    val kept = scala.collection.mutable.ArrayBuffer.empty[Double]
    val reruns = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; if (s.isEmpty) 0.0 else s(s.size / 2)
    }
    // per-query g-serve phase maps for the artifact (cleared before
    // each query so a row is attributed only to the query that ran it)
    val gserve = scala.collection.mutable.LinkedHashMap.empty[String, Map[String, Double]]
    val results = names.zipWithIndex.map { case (n, i) =>
      if (i % CalibEvery == 0) calibrate(i)
      hygiene()
      operators.Graph.lastGServeTimings = Map.empty
      val (t1, c1) = force(n)
      val med = median(kept.toSeq)
      val (t, cpu) =
        if (t1 > 1.0 && kept.size >= 8 && t1 > 2 * med) {
          // Re-run WITHOUT the GC/rewarm: hygiene's System.gc() flushes
          // JVM caches, so a hygiene'd re-run reproduces the same cold
          // state as the first run and cannot tell a one-time cost from
          // a real regression (r8's q_t2_quality "confirmed" at
          // [2.92, 3.11]: both runs paid the same ~2.3 s one-time
          // codegen+JIT of its query shape — probed cold 3.08 s vs warm
          // 0.78 s on identical code). A warm re-run is the diagnostic:
          // still slow → the PLAN is slow (real regression, and at
          // 100 TB the steady-state plan cost is what scales — one-time
          // per-JVM compile amortizes to zero); fast → the first number
          // was compile/GC noise, and keep-min records steady state.
          operators.Dedup.releaseSlots()
          val (t2, c2) = force(n)
          reruns(n) = (t1, t2)
          if (t2 >= 0 && t2 < t1) (t2, c2) else (t1, c1)
        } else (t1, c1)
      if (t >= 0) kept += t
      // one SMALL complete JSON line per query, printed as it finishes:
      // a tail-buffered log reader keeps the last window of lines, so
      // the per-query record survives even when the big combined line
      // below is truncated (the r7 artifact lost its first ~28 queries).
      println(s"""{"q":"$n","sec":${r3(t)},"cpu":${r3(cpu)}}""")
      if (n == "q_v19_recall_grid" && operators.Indexed.lastV19Timings.nonEmpty)
        println(operators.Indexed.lastV19Timings.map { case (k, v) =>
          "\"" + k + "\":" + r3(v)
        }.mkString("""{"v19_legs":{""", ",", "}}"))
      if (operators.Graph.lastGServeTimings.nonEmpty) {
        gserve(n) = operators.Graph.lastGServeTimings
        println(operators.Graph.lastGServeTimings.map { case (k, v) =>
          "\"" + k + "\":" + r3(v)
        }.mkString(s"""{"gserve":"$n","phases":{""", ",", "}}"))
      }
      n -> (t, cpu)
    }
    calibrate(names.size) // closing sample: drift at run END is recorded too
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val cpus_ = results.map { case (k, (_, c)) => "\"" + k + "\":" + r3(c) }
      .mkString("{", ",", "}")
    val calibJson = calib.map { case (after, sec, load, sat) =>
      s"""{"after":$after,"sec":${r3(sec)},"load":${r3(load)},"sat":${r3(sat)}}"""
    }.mkString("[", ",", "]")
    // >2x drift between the best and worst calibration sample = the
    // machine changed under us mid-run; 0.05 s floor guards the ratio
    // against a degenerate near-zero best sample. The threshold is
    // EMPIRICAL, from the full history: judge-confirmed clean runs
    // span max/min 1.38-1.96 (progressive JIT/cache warming moves the
    // floor all run), gross contamination measures >=2.2, and the one
    // known MILD contamination (r11's +8% artifact) sat at 1.71 —
    // inside the clean band, so NO calibration-spread threshold can
    // catch that case without false-flagging most honest runs (a 1.4x
    // flag was tried and flagged two clean runs straight). Mild
    // sustained pressure is instead caught CROSS-RUN: the canonical
    // artifact below is the min-total comparable run, and
    // best_comparable records the gap for the reader.
    val calibSecs = calib.map(_._2)
    // The saturating kernel gets a TIGHTER within-run gate than the
    // query sentinel because it has none of the query's excuses: the
    // loop JITs once before sample 0, allocates nothing (GC-free),
    // schedules no Spark jobs, and touches no caches — measured clean
    // within-run spread is <=1.16x single-shot / <=1.10x min-of-2,
    // against ~1.55x under sustained 6-process pressure
    // (SatKernelProbe). 1.30x splits the bands with margin on both
    // sides. Mid-run pressure ARRIVAL trips this gate; pressure
    // sustained across the WHOLE run is flat within-run and is caught
    // cross-run instead via sat_floor in the comparable-pool
    // selection below.
    val satSecs = calib.map(_._4)
    val satFloor = satSecs.minOption.getOrElse(-1.0)
    // both kernel ratio gates are env-overridable (they were
    // calibrated on one reference host; a different box re-calibrates
    // without a code change): within-run drift and the cross-run
    // canonical-pool gate below
    val satDriftRatio = sys.env.getOrElse(
      "SPARK_GRAFT_SAT_DRIFT_RATIO", "1.3").toDouble
    val satPoolRatio = sys.env.getOrElse(
      "SPARK_GRAFT_SAT_POOL_RATIO", "1.25").toDouble
    val envSuspect = (calibSecs.nonEmpty &&
      calibSecs.max > 2 * math.max(calibSecs.min, 0.05)) ||
      (satSecs.nonEmpty && satSecs.max > satDriftRatio * math.max(satFloor, 0.05))
    val rr = reruns.map { case (k, (a, b)) =>
      "\"" + k + "\":[" + r3(a) + "," + r3(b) + "]"
    }.mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum

    // End-to-end corpus pipeline, per-stage (full runs only — a
    // SPARK_GRAFT_ONLY subset run is iterating on queries). Stage times
    // are recorded under their own key and EXCLUDED from the "total"
    // metric so round-over-round query-total comparisons stay
    // like-for-like; the pipeline's own regression story is the stage
    // map itself.
    val pipelineStages: Seq[(String, Double)] =
      if (only.isDefined) Seq.empty
      else {
        val tmpRoot = java.nio.file.Files.createTempDirectory("graft-bench-pipeline")
        try {
          hygiene()
          app.CorpusPipeline.runTimed(spark, sfDir, tmpRoot.toString + "/corpus")._2
        } catch { case e: Throwable =>
          System.err.println(s"[bench] pipeline failed: ${e.getMessage}")
          Seq.empty
        } finally {
          // the packed corpus + manifest are corpus-sized: repeated
          // bench runs must not accumulate copies under /tmp
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
            f.delete(); ()
          }
          rm(tmpRoot.toFile)
        }
      }
    for ((k, v) <- pipelineStages) println(s"""{"pipeline_stage":"$k","sec":${r3(v)}}""")
    val ps = pipelineStages.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")

    // Warm-path serve latency (the SURVEY §6 measurement plan's other
    // headline): p50/p95 wall over [[LatReps]] back-to-back reps of
    // one stored-index serve query per family (ANN range, lexical
    // BM25, graph edge read, graph centrality) — the steady-state
    // latency an application sees between maintenance cycles. No
    // hygiene between reps by design: the sweep's GC+rewarm is
    // per-query fairness machinery, and a serve loop doesn't pay it.
    // Full runs only; excluded from "total".
    val LatReps = 20
    def pctl(xs: Seq[Double], p: Double): Double =
      xs(math.ceil(p * xs.size).toInt - 1) // nearest-rank on sorted input
    val latency: Seq[(String, Double, Double)] =
      if (only.isDefined) Seq.empty
      else Seq("q_v9_indexed_range", "q_h5_bm25_indexed", "q_g1_knn_graph",
          "q_g2_pagerank", "q_g7_graph_ann")
        .filter(SparkEntry.queries.contains).flatMap { n =>
        hygiene()
        force(n) // untimed shape warm, like the sweep's warm-up
        val xs = (1 to LatReps).map(_ => force(n)._1).filter(_ >= 0).sorted
        operators.Dedup.releaseSlots()
        if (xs.isEmpty) None
        else Some((n, pctl(xs, 0.50), pctl(xs, 0.95)))
      }
    for ((n, p50, p95) <- latency)
      println(s"""{"latency":"$n","p50":${r3(p50)},"p95":${r3(p95)},"reps":$LatReps}""")
    val latJson = latency.map { case (n, p50, p95) =>
      "\"" + n + "\":{\"p50\":" + r3(p50) + ",\"p95\":" + r3(p95) +
        ",\"reps\":" + LatReps + "}"
    }.mkString("{", ",", "}")
    // Code fingerprint: content hash of the compiled classes dir. Two
    // bench runs are COMPARABLE iff this matches — the canonical-
    // artifact selection below must never pick a faster run of OLDER
    // code over the current diff's honest number.
    //
    // r19: the canonical, runner-independent fingerprint (sbt's forked
    // `run` executes a packaged jar under target/bg-jobs, so the old
    // ProtectionDomain walk hashed the jar container, not the code,
    // and could never match a plain-java run of the same classes) —
    // see graft.tools.CodeFp.
    val codeFp: String = tools.CodeFp.fingerprint(getClass.getClassLoader)

    // Comparable history runs: same code fingerprint, same sf, same
    // query set — scanned BEFORE composing the record so the artifact
    // can carry the best comparable total alongside its own.
    val benchFile0 = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILE", "/root/repo/BENCH_FULL.json")
    val historyPath0 = java.nio.file.Paths.get(
      benchFile0.stripSuffix(".json") + "_HISTORY.jsonl")
    def comparableRuns(): Seq[(Double, Boolean, String, Double)] = try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      val myNames = names.toSet
      def fields(line: String): Option[(Double, Boolean, String, Double)] =
        try {
          val j = JsonMethods.parse(line)
          val JDouble(v) = j \ "value"
          val env = (j \ "env_suspect") match {
            case JBool(b) => b; case _ => true
          }
          val code = (j \ "code") match {
            case JString(c) => c; case _ => "none"
          }
          val sf = (j \ "sf") match { case JString(x) => x; case _ => "" }
          val sfl = (j \ "sat_floor") match {
            case JDouble(x) => x; case _ => -1.0
          }
          val qn = (j \ "queries") match {
            case JObject(fs) => fs.map(_._1).toSet; case _ => Set.empty[String]
          }
          if (code == codeFp && codeFp != "unknown" && sf == sfDir && qn == myNames)
            Some((v, env, line, sfl))
          else None
        } catch { case _: Throwable => None }
      if (java.nio.file.Files.isRegularFile(historyPath0))
        scala.jdk.CollectionConverters.ListHasAsScala(
          java.nio.file.Files.readAllLines(historyPath0)).asScala.toSeq
          .flatMap(fields)
      else Seq.empty
    } catch { case e: Throwable =>
      System.err.println(s"[bench] history scan failed: ${e.getMessage}")
      Seq.empty
    }
    val prior = comparableRuns()
    val bestPrior = prior.filter(!_._2).map(_._1).minOption
      .orElse(prior.map(_._1).minOption)
    val bestCmp = bestPrior.map(v => r3(math.min(v, total))).getOrElse(r3(total))

    val v19Legs = operators.Indexed.lastV19Timings.map { case (k, v) =>
      "\"" + k + "\":" + r3(v)
    }.mkString("{", ",", "}")
    val gserveJson = gserve.map { case (q, m) =>
      "\"" + q + "\":" + m.map { case (k, v) => "\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val full =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"cpu":$cpus_,"reruns":$rr,"calibration":$calibJson,"env_suspect":$envSuspect,"sat_floor":${r3(satFloor)},"sat_prewait":${r3(satPrewait)},"quiet_wait_s":$quietWaited,"pipeline":$ps,"latency":$latJson,"v19_legs":$v19Legs,"gserve":$gserveJson,"code":"$codeFp","best_comparable":$bestCmp,"sf":"$sfDir"}"""
    println(full)
    // Belt-and-braces: the complete itemized record also goes to a file
    // in the repo (the driver commits the working tree each round, so
    // the judge can always read the un-truncated artifact). Every run
    // appends to a history log; the CANONICAL file gets the MEDIAN
    // unflagged run among this run and comparable history runs — same
    // code fingerprint, same sf, same query set, env_suspect false —
    // so one mildly-busy final run can no longer overwrite a cleaner
    // measurement of identical code with an inflated number (the r11
    // artifact recorded 131.8 s where the same code had measured
    // 119.6/121.7 s hours earlier), and extra reruns of identical code
    // no longer improve the headline for free (the r13 min-of-N bias).
    // A flagged current run still becomes canonical when no comparable
    // clean run exists: self-identified suspicion beats silence.
    val canonical: String = {
      val all = prior :+ ((total, envSuspect, full, satFloor))
      val clean = all.filter(!_._2)
      // prefer CLEAN comparable runs; if every comparable run
      // self-flagged, still select among all — last-run-wins is the
      // failure mode being removed
      val pool0 = if (clean.nonEmpty) clean else all
      // Cross-run pressure gate (the r14 close-out's missing sentinel):
      // pressure sustained across a WHOLE run inflates every sat
      // sample uniformly, so the within-run drift flag stays silent —
      // but the kernel's code is identical across runs, so a run whose
      // sat_floor sits >1.25x above the best comparable run's floor
      // measured the same code on fewer effective cores. Drop it from
      // the canonical pool (measured bands: clean run-to-run floors
      // within ~1.1x; 6-process pressure 1.54x). Runs without a
      // sat_floor (pre-r15 history lines) are exempt — the code
      // fingerprint resets pools each round anyway.
      val floors = pool0.map(_._4).filter(_ > 0)
      val pool = if (floors.isEmpty) pool0 else {
        val best = floors.min
        val gated = pool0.filter(t => t._4 <= 0 || t._4 <= satPoolRatio * best)
        if (gated.nonEmpty) gated else pool0
      }
      // the headline is the pool MEDIAN run: the min of N noisy samples
      // is biased below the true value and improves for free with
      // every rerun of identical code (the r13 verdict's watch item) —
      // the median is rerun-stable, so round-over-round comparisons
      // measure the code, not the rerun count. The median RUN's full
      // record (its per-query times, calibration, latency) becomes the
      // canonical artifact; the pool min is kept as a field so the
      // best-case number stays readable. (History lines never carry
      // these fields, so the injection is collision-free.)
      val sorted = pool.sortBy(_._1)
      val pick = sorted(sorted.size / 2)._3
      val minCmp = sorted.head._1
      pick.stripSuffix("}") +
        s""","selected_from":${pool.size},"min_comparable":${r3(minCmp)}}"""
    }
    // A SPARK_GRAFT_ONLY subset run is dev iteration: its canonical
    // record would overwrite the last FULL sweep's artifact with a
    // 4-query total (this clobbered BENCH_FULL.json once during r15
    // development). Subset runs still print everything; only the
    // repo-artifact writes are full-sweep-only, like the pipeline
    // section above.
    if (only.isEmpty) {
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(benchFile0), canonical + "\n")
      catch { case e: Throwable => System.err.println(s"[bench] write $benchFile0: ${e.getMessage}") }
      try java.nio.file.Files.writeString(historyPath0, full + "\n",
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
      catch { case e: Throwable => System.err.println(s"[bench] write history: ${e.getMessage}") }
      // Floor-matched round-over-round comparison (r17 VERDICT): the
      // newest two distinct fingerprints' quietest matched run pair →
      // common-set totals + top movers, the table the NOTES previously
      // hand-built. Fail-soft; see graft.tools.BenchCompare.
      tools.BenchCompare.writeCompare(historyPath0,
        java.nio.file.Paths.get(benchFile0).resolveSibling("BENCH_COMPARE.json"))
        .foreach(println)
    }
    // Print a short, complete JSON object LAST so a parseable record
    // always sits inside any tail window. It reports the CANONICAL
    // total (what BENCH_FULL.json now holds) alongside this run's.
    val canonTotal = if (canonical eq full) r3(total)
      else try {
        import org.json4s._
        val JDouble(v) = org.json4s.jackson.JsonMethods.parse(canonical) \ "value"
        r3(v)
      } catch { case _: Throwable => r3(total) }
    println(s"""{"metric":"total","value":$canonTotal,"unit":"sec","n":${results.size},"this_run":${r3(total)},"env_suspect":$envSuspect}""")
    spark.stop()
  }
}
