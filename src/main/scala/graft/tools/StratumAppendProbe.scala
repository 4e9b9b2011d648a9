package graft.tools

import graft.core.Tables
import graft.operators.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the STRATIFIED graph lifecycle's scale shape (dev tool):
  * one-shot all-strata build vs [[Graph.appendStratumGraph]] of a
  * held-out delta, plus the isolation claim as a number — how many
  * (stratum, bucket) edge directories the append rewrote vs carried
  * as hard links. If the one-pass per-stratum append is genuinely
  * bounded by the delta, its wall should sit far under the build's,
  * and a single-stratum delta should rewrite only that stratum's
  * affected buckets.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *      sbt "runMain graft.tools.StratumAppendProbe"
  */
object StratumAppendProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stratum-append-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("sap-wh").toString
    sys.props("graft.warehouse") = wh

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // (relative path -> file key) of the edge tree, for counting
    // carried-vs-rewritten files across the append's hard-link publish
    def edgeFiles(v: String): Map[String, Object] = {
      val root = java.nio.file.Paths.get(s"$v/edges")
      val st = java.nio.file.Files.walk(root)
      try st.filter(p => java.nio.file.Files.isRegularFile(p) &&
          !p.getFileName.toString.startsWith("_") &&
          !p.getFileName.toString.startsWith("."))
        .toArray.map(_.asInstanceOf[java.nio.file.Path])
        .map(p => root.relativize(p).toString ->
          java.nio.file.Files.readAttributes(p,
            classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey())
        .toMap
      finally st.close()
    }

    val full = Tables.embeddings(spark, sfDir)
    for (mode <- Seq("one-stratum", "all-strata")) {
      val d = java.nio.file.Files.createTempDirectory(s"sap-$mode").toString
      val isDelta = (pmod(xxhash64(col("vec_id")), lit(10L)) === 0) &&
        (lit(mode == "all-strata") ||
          col(Graph.StratumCol) === Graph.StratumServeLabel)
      full.filter(!isDelta).write.mode("overwrite")
        .parquet(s"$d/embeddings.parquet")
      val base = Tables.embeddings(spark, d)
      val delta = full.filter(isDelta)
        .select(col("vec_id"), col("embedding"), col(Graph.StratumCol))
      val nDelta = delta.count()
      val (v0, tBuild) = time(Graph.ensureStratumGraph(spark, d))
      val before = edgeFiles(v0)
      val (v1, tApp) = time(Graph.appendStratumGraph(spark, d, delta,
        base.select("vec_id", "embedding")))
      val after = edgeFiles(v1)
      val carried = after.count { case (n, k) => before.get(n).contains(k) }
      println(s"""{"probe":"stratum_append","sf":"$sfDir","mode":"$mode",""" +
        s""""delta_rows":$nDelta,""" +
        s""""build_s":${math.round(tBuild * 1000) / 1000.0},""" +
        s""""append_s":${math.round(tApp * 1000) / 1000.0},""" +
        s""""edge_files_carried":$carried,"edge_files_total":${after.size}}""")
      graft.operators.Dedup.releaseSlots()
    }
    spark.stop()
  }
}
