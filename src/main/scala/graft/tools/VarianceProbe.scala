package graft.tools

import graft.SparkEntry
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession

/** Rerun-variance probe for the three queries the r12 verdict flagged
  * as swinging 1.5-3x across same-code runs (dev tool): run each of
  * d16 / d11 / d15 N times warm in a bench-identical session,
  * recording per-rep wall, process-CPU, JVM GC time, and the OS load
  * average — enough to attribute a slow rep to (a) our own GC, (b)
  * external CPU pressure (cpu/wall collapses while load rises), or
  * (c) a genuine plan/cache effect (cpu and wall rise together on a
  * quiet box). Results and the named root cause go in NOTES.
  */
object VarianceProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "12").toInt
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-variance-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val targets = sys.env.get("SPARK_GRAFT_VP_QUERIES")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq("q_d16_incremental_neardup", "q_d11_fuzzy_edit",
        "q_d15_overlap_kmv"))
    for (name <- targets) {
      // untimed warm, as the bench's warm-up does
      SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      Dedup.releaseSlots()
      val xs = (1 to reps).map { i =>
        val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
        val g0 = gcMillis
        SparkEntry.queries(name)(spark, d)
          .write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        val c = (osBean.getProcessCpuTime - c0) / 1e9
        val g = (gcMillis - g0) / 1e3
        Dedup.releaseSlots()
        println(f"$name rep$i%-3d wall=$w%6.2f cpu=$c%7.2f gc=$g%5.2f load=${osBean.getSystemLoadAverage}%5.2f")
        w
      }.sorted
      println(f"$name: min=${xs.head}%.2f p50=${xs(xs.size / 2)}%.2f max=${xs.last}%.2f spread=${xs.last / xs.head}%.2fx")
    }
    spark.stop()
  }
}
