package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-stage run/cpu attribution for one declared query (dev tool,
  * opt r20): which STAGES of a warm execution own the task time the
  * job-level probe measured. Prints stage id, task count, summed run
  * and cpu time, and the stage name's callsite hint.
  *
  * Usage: runMain graft.tools.StageTimelineProbe <query> [reps]
  */
object StageTimelineProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_d2_dedup_minhash_lsh")
    val reps = if (args.length >= 2) args(1).toInt else 3
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val extra: Map[String, String] = sys.env.get("SPARK_GRAFT_EXTRA_CONF")
      .map(_.split(";").flatMap { kv =>
        kv.split("=", 2) match { case Array(k, v) => Some(k.trim -> v.trim); case _ => None }
      }.toMap).getOrElse(Map.empty)
    val b0 = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-stagetimeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
    val s = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val q = graft.SparkEntry.queries(name)
    def once(): Unit = {
      q(s, d).write.format("noop").mode("overwrite").save()
      graft.operators.Dedup.releaseSlots()
    }
    (1 until reps).foreach(_ => once())
    case class St(id: Int, n: Int, runMs: Long, cpuMs: Long, dser: Long,
        ser: Long, sched: Double, nm: String)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        val wall = (for {a <- i.completionTime; b <- i.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        stages += St(i.stageId, i.numTasks, m.executorRunTime,
          m.executorCpuTime / 1000000, m.executorDeserializeTime,
          m.resultSerializationTime, wall, i.name.take(90))
      }
    }
    s.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    once()
    val wall = (System.nanoTime() - t0) / 1e9
    s.sparkContext.removeSparkListener(listener)
    Thread.sleep(500)
    println(f"[stp] $name wall = $wall%.3f s, stages = ${stages.size}")
    for (st <- stages.sortBy(-_.runMs).take(25))
      println(f"[stp] stage ${st.id}%4d tasks=${st.n}%4d wall=${st.sched}%6.3f " +
        f"run=${st.runMs / 1e3}%7.3f cpu=${st.cpuMs / 1e3}%7.3f " +
        f"dser=${st.dser / 1e3}%6.3f  ${st.nm}")
    println(f"[stp] totals: run=${stages.map(_.runMs).sum / 1e3}%.3f " +
      f"cpu=${stages.map(_.cpuMs).sum / 1e3}%.3f " +
      f"dser=${stages.map(_.dser).sum / 1e3}%.3f tasks=${stages.map(_.n).sum}")
    s.stop()
  }
}
