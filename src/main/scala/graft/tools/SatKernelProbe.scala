package graft.tools

/** Threshold-selection probe for the bench's CPU-saturating
  * calibration kernel (dev tool): sample `Bench.satKernel` N times on
  * whatever environment the box currently presents, printing per-rep
  * wall + 1-min load. Run once on a quiet box and once with an
  * external stressor (e.g. 6 busy shells) to measure the separation
  * the kernel delivers where the query-based sentinel measured ~5%
  * (NOTES_r14's failed cross-run calibration-median comparison) — the
  * numbers choose the env_suspect threshold, recorded in NOTES_r15.
  */
object SatKernelProbe {
  def main(args: Array[String]): Unit = {
    val threads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "10").toInt
    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
    def r3(v: Double): String =
      "%.3f".formatLocal(java.util.Locale.ROOT, v)
    graft.Bench.satKernel(threads) // JIT warm, untimed
    for (i <- 0 until reps) {
      val w = graft.Bench.satKernel(threads)
      val load = osBean.getSystemLoadAverage
      println(s"""{"rep":$i,"sat_sec":${r3(w)},"load":${r3(load)}}""")
    }
  }
}
