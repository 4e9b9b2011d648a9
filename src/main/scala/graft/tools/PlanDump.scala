package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` output for declared queries to files —
  * the plan evidence the optimization rounds commit under `plans/r<N>/`.
  *
  * Usage: runMain graft.tools.PlanDump <outDir> [q1,q2,...] [suffix]
  *
  * Writes `<outDir>/<query><suffix>.txt` per query (suffix defaults to
  * empty; the optimization-round convention is `_before` / `_after`).
  * Session config mirrors Bench (same sf dir/core-count envs, same
  * split sizing) so the dumped plan is the one the bench executes —
  * AQE's runtime re-optimization excepted, which `explain` cannot show
  * before execution.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/tmp")
    val names: Seq[String] =
      if (args.length >= 2 && args(1).trim.nonEmpty && args(1) != "all")
        args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val suffix = if (args.length >= 3) args(2) else ""
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    for (n <- names) {
      try {
        val df = graft.SparkEntry.queries(n)(s, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"$n$suffix.txt"), txt)
        System.err.println(s"[plandump] $n ok (${txt.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n FAILED: ${e.getMessage}")
      } finally graft.operators.Dedup.releaseSlots()
    }
    s.stop()
  }
}
