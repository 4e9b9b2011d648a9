package graft.tools

import graft.core.Tables
import graft.operators.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the stored-graph lifecycle's scale shape: one-shot build
  * vs delta append. A dataset dir is fixtured with all-but-delta of
  * the sf embeddings, `ensureKnnGraph` builds the artifact, then
  * `appendKnnGraph` lands the held-out delta — if the append is
  * genuinely bounded by the delta (routing-table joins + affected-node
  * re-rank + affected-partition rewrite), its time should sit far
  * under the build's and grow with the delta, not the corpus. The
  * final edge table is compared against a from-scratch build over the
  * full corpus (the GraphIndexSpec equality, here at probe scale).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *      sbt "runMain graft.tools.GraphAppendProbe"
  */
object GraphAppendProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-graph-append-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // isolate the probe's artifacts from the durable warehouse
    val wh = java.nio.file.Files.createTempDirectory("gap-wh").toString
    sys.props("graft.warehouse") = wh

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val full = Tables.embeddings(spark, sfDir)
    val n = full.count()
    for (deltaPct <- Seq(1, 5, 10)) {
      val d = java.nio.file.Files.createTempDirectory(s"gap-ds$deltaPct").toString
      val isDelta = pmod(xxhash64(col("vec_id")), lit(100L)) < deltaPct
      full.filter(!isDelta).write.mode("overwrite")
        .parquet(s"$d/embeddings.parquet")
      val base = Tables.embeddings(spark, d)
      val delta = full.filter(isDelta).select("vec_id", "embedding")
      val nd = delta.count()
      val (_, tBuild) = time(Graph.ensureKnnGraph(spark, d))
      val (_, tAppend) = time(Graph.appendKnnGraph(spark, d, delta, base))
      // correctness anchor: stored-after-append == one-shot full build
      val got = Graph.storedEdges(spark, d)
      val want = Graph.knnGraphEdgesOn(full)
      val diff = got.unionByName(want).groupBy("src", "dst", "w", "rk")
        .agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
      graft.operators.Dedup.releaseSlots()
      println(f"delta=$deltaPct%2d%% (base=${n - nd}%6d +$nd%5d vecs)  " +
        f"build=${tBuild}%6.2fs  append=${tAppend}%6.2fs  " +
        f"append/build=${tAppend / tBuild}%5.2f  edge-diff=$diff")
    }
    spark.stop()
  }
}
