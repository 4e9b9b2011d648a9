package graft

import graft.core.JobGroupMetrics
import org.apache.spark.sql.functions._

/** The per-job-group time accounting used by the v19 leg split and
  * the g-serve phase split — in particular the r20 per-instance
  * scoping (r19 ADVICE: two live instances sharing a bare prefix each
  * observed the other's job groups and double-attributed job/task
  * time).
  */
class JobGroupMetricsSpec extends SparkSuite {

  private def runUnder(group: String, n: Int): Unit = {
    spark.sparkContext.setJobGroup(group, "spec " + group)
    try spark.range(n).select(sum(col("id"))).collect()
    finally spark.sparkContext.clearJobGroup()
    ()
  }

  test("a section's job wall and task time are attributed to its group") {
    val m = new JobGroupMetrics(spark.sparkContext, "jgm:")
    runUnder(m.group("alpha"), 100000)
    runUnder(m.group("beta"), 100000)
    val out = m.finishAndDetach()
    // keys come back as SECTION names (instance prefix stripped)
    assert(out.keySet === Set("alpha", "beta"), out.keySet.toString)
    assert(out.values.forall { case (job, task) => job >= 0 && task >= 0 })
  }

  test("two concurrent instances with the same base prefix do not cross-attribute (r20)") {
    val m1 = new JobGroupMetrics(spark.sparkContext, "jgm:")
    val m2 = new JobGroupMetrics(spark.sparkContext, "jgm:")
    // run ONLY under m1's group: with the pre-r20 bare-prefix match,
    // m2 would observe the same jobs and report a phantom section
    runUnder(m1.group("mine"), 200000)
    val out1 = m1.finishAndDetach()
    val out2 = m2.finishAndDetach()
    assert(out1.keySet === Set("mine"))
    assert(out2.isEmpty,
      s"instance 2 attributed another instance's jobs: $out2")
  }

  test("a group that ran no jobs is absent, not zero") {
    val m = new JobGroupMetrics(spark.sparkContext, "jgm:")
    val unused = m.group("never-run")
    assert(unused.startsWith("jgm:"))
    assert(m.finishAndDetach(timeoutMs = 100).isEmpty)
  }
}
