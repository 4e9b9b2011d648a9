package graft.core

import org.apache.spark.SparkContext
import org.apache.spark.scheduler._

/** Per-job-group Spark-side time accounting for instrumented query
  * sections (the v19 per-leg split, the g-serve per-phase split): a
  * listener that, for every job whose `spark.jobGroup.id` starts with
  * `prefix`, accumulates
  *
  *  - JOB WALL: Σ (jobEnd.time − jobStart.time) over the group's jobs;
  *  - TASK RUN: Σ task `executorRunTime` over the group's stages —
  *    actual on-core execution, excluding scheduler queueing.
  *
  * The split exists because concurrently-timed sections share one
  * executor pool, so a section's driver-side wall includes contention
  * from its siblings and walls are NON-ADDITIVE (r18 ADVICE on the
  * v19 legs): a section whose wall inflates across rounds while its
  * task-run time stays flat was queued behind co-scheduled work — the
  * environment/overlap signature — whereas task-run inflation means
  * the section genuinely computed more.
  *
  * Usage: construct (self-registers), run the sections with
  * `sc.setJobGroup(group(name), …)` set in each section's thread,
  * then [[finishAndDetach]] once all sections' actions returned —
  * it returns SECTION names (the instance prefix stripped).
  * Listener callbacks are invoked serially on the listener-bus thread,
  * so the unsynchronized maps are safe; the caller thread only reads
  * after the drain-wait in [[finishAndDetach]].
  *
  * The effective prefix carries a per-instance id (r19 ADVICE: two
  * live instances sharing a bare prefix — e.g. overlapping timed
  * graphAnnBatchOn calls in one session — would each observe the
  * other's job groups and double-attribute job/task time; with the
  * id, each instance matches only groups minted by its own
  * [[group]]). The remaining drain caveat stands as documented
  * best-effort telemetry: a jobStart still in the bus queue when all
  * observed jobs have ended can escape the drain-wait.
  */
final class JobGroupMetrics(sc: SparkContext, prefix: String)
    extends SparkListener {
  private val runPrefix =
    prefix + JobGroupMetrics.ids.incrementAndGet() + ":"

  /** The job-group name sections must set for this instance. */
  def group(section: String): String = runPrefix + section
  private val stageGroup = scala.collection.concurrent.TrieMap.empty[Int, String]
  private val jobGroup = scala.collection.concurrent.TrieMap.empty[Int, String]
  private val jobStartMs = scala.collection.concurrent.TrieMap.empty[Int, Long]
  private val started = new java.util.concurrent.atomic.AtomicInteger
  private val ended = new java.util.concurrent.atomic.AtomicInteger
  private val jobMs = scala.collection.concurrent.TrieMap.empty[String, Long]
  private val taskMs = scala.collection.concurrent.TrieMap.empty[String, Long]

  override def onJobStart(e: SparkListenerJobStart): Unit = {
    val g = Option(e.properties)
      .map(_.getProperty("spark.jobGroup.id")).orNull
    if (g != null && g.startsWith(runPrefix)) {
      started.incrementAndGet()
      jobGroup(e.jobId) = g
      jobStartMs(e.jobId) = e.time
      e.stageIds.foreach(sid => stageGroup(sid) = g)
    }
  }

  // AQE submits stages the jobStart event never listed (runtime
  // re-planning creates them mid-job), and stage submission carries
  // the submitting thread's properties — attribute from here too so
  // task-run sums cover the adaptively-added stages
  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
    val g = Option(e.properties)
      .map(_.getProperty("spark.jobGroup.id")).orNull
    if (g != null && g.startsWith(runPrefix)) stageGroup(e.stageInfo.stageId) = g
  }

  override def onJobEnd(e: SparkListenerJobEnd): Unit =
    jobGroup.get(e.jobId).foreach { g =>
      jobMs(g) = jobMs.getOrElse(g, 0L) +
        (e.time - jobStartMs.getOrElse(e.jobId, e.time))
      ended.incrementAndGet()
    }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
    stageGroup.get(e.stageId).foreach { g =>
      val m = e.taskMetrics
      if (m != null) taskMs(g) = taskMs.getOrElse(g, 0L) + m.executorRunTime
    }

  sc.addSparkListener(this)

  /** Wait (bounded) for the async listener bus to deliver every
    * started group's jobEnd — the DAGScheduler posts a job's taskEnd
    * events before its jobEnd on the same bus queue, so seeing all
    * jobEnds means the task sums are complete too — then detach and
    * return group → (jobWallSec, taskRunSec). Groups that ran no jobs
    * are absent; a timeout returns what has arrived (best-effort — the
    * instrumentation must never wedge the query).
    */
  def finishAndDetach(timeoutMs: Long = 2000): Map[String, (Double, Double)] = {
    val deadline = System.currentTimeMillis + timeoutMs
    while (ended.get < started.get && System.currentTimeMillis < deadline)
      Thread.sleep(10)
    sc.removeSparkListener(this)
    (jobMs.keySet ++ taskMs.keySet).map { g =>
      g.stripPrefix(runPrefix) ->
        (jobMs.getOrElse(g, 0L) / 1e3, taskMs.getOrElse(g, 0L) / 1e3)
    }.toMap
  }
}

object JobGroupMetrics {
  private val ids = new java.util.concurrent.atomic.AtomicLong
}
