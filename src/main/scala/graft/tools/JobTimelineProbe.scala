package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-job wall timeline for one declared query (dev tool, opt r20).
  *
  * Most d-family/bench queries at sf0.1 run over KB-scale data, so
  * their wall is sequential job/stage latency, not compute. This probe
  * answers "how many sequential Spark jobs does one query execution
  * schedule, and where are the gaps": it warms the query (reps-1
  * untimed runs), then runs it once under a listener that records every
  * job's submit/complete wall and summed task time, printing the
  * timeline with inter-job gaps (driver-side planning/collect time).
  *
  * Usage: runMain graft.tools.JobTimelineProbe <query> [reps]
  */
object JobTimelineProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_d2_dedup_minhash_lsh")
    val reps = if (args.length >= 2) args(1).toInt else 3
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-jobtimeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(name)
    def once(): Unit = {
      q(s, d).write.format("noop").mode("overwrite").save()
      graft.operators.Dedup.releaseSlots()
    }
    (1 until reps).foreach(_ => once())

    case class J(id: Int, var sub: Long = 0, var end: Long = 0,
        var stages: Int = 0, var tasks: Int = 0, var taskMs: Long = 0,
        var desc: String = "")
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, J]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = jobs.getOrElseUpdate(e.jobId, J(e.jobId))
        j.sub = e.time
        j.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        j.stages = e.stageInfos.size
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val sid = e.stageInfo.stageId
        // attribute to the most recent job containing it — good enough
        jobs.values.lastOption.foreach { j =>
          j.tasks += e.stageInfo.numTasks
          j.taskMs += e.stageInfo.taskMetrics.executorRunTime
        }
        val _ = sid
      }
    }
    s.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    once()
    val wall = (System.nanoTime() - t0) / 1e9
    s.sparkContext.removeSparkListener(listener)
    Thread.sleep(500) // listener-bus drain, best-effort
    println(f"[probe] $name timed run wall = $wall%.3f s, jobs = ${jobs.size}")
    var prevEnd = 0L
    for (j <- jobs.values.toSeq.sortBy(_.sub)) {
      val gap = if (prevEnd == 0) 0.0 else (j.sub - prevEnd) / 1e3
      println(f"[probe] job ${j.id}%3d  wall=${(j.end - j.sub) / 1e3}%6.3f  " +
        f"gapBefore=$gap%6.3f  stages=${j.stages}%2d tasks=${j.tasks}%4d " +
        f"taskSec=${j.taskMs / 1e3}%7.3f  ${j.desc.take(60)}")
      prevEnd = math.max(prevEnd, j.end)
    }
    val jobWall = jobs.values.map(j => j.end - j.sub).sum / 1e3
    println(f"[probe] sum(job walls) = $jobWall%.3f s; wall - jobs = ${wall - jobWall}%.3f s (driver/planning)")
    s.stop()
  }
}
