package graft.tools

import graft.core.Tables
import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the stats refresh with the triangle census on its two
  * paths: INCREMENTAL (replaying the append's edge-delta logs) vs
  * FULL (the 3-way triangle join), everything else held equal — two
  * identical 90/10 fixtures take the same gen-0 build + append; one
  * keeps its logs, the other has them removed so the coverage check
  * fails. PageRank/PPR (always full) and the cc analytics
  * (incremental in both — the pair_delta logs are intact) are common
  * cost, so the wall difference isolates the census path.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *      sbt "runMain graft.tools.CensusProbe"
  */
object CensusProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-census-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // r17: below graft.graph.driverEdgeBudget the refresh prefers the
    // exact full path (small-graph admission) and the fixpoint loops
    // serve from the driver — the default measures THAT behavior. To
    // measure the past-budget regime (incremental replay vs
    // distributed full, the r16 comparison), set
    // SPARK_GRAFT_DRIVER_EDGE_BUDGET=-1.
    sys.env.get("SPARK_GRAFT_DRIVER_EDGE_BUDGET").foreach(b =>
      spark.conf.set("graft.graph.driverEdgeBudget", b))
    val wh = java.nio.file.Files.createTempDirectory("cns-wh").toString
    sys.props("graft.warehouse") = wh

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(); ()
    }

    // SPARK_GRAFT_CENSUS_XREP > 1 replicates the corpus N× with the
    // GraphScaleProbe sign-flip perturbation (distinct buckets per
    // replica) — the census's full path grows with the corpus (und
    // distinct + 3-way wedge join) while the replay grows with the
    // delta, so the replay's advantage is an ASYMPTOTE this knob makes
    // measurable rather than argued. SPARK_GRAFT_CENSUS_PMILS narrows
    // the delta sizes swept (default 2,10,100 per-mil).
    val xrep = sys.env.getOrElse("SPARK_GRAFT_CENSUS_XREP", "1").toInt
    val pmils = sys.env.getOrElse("SPARK_GRAFT_CENSUS_PMILS", "2,10,100")
      .split(",").toSeq.map(_.trim.toInt)
    val full0 = Tables.embeddings(spark, sfDir)
    val full =
      if (xrep <= 1) full0
      else full0
        .crossJoin(spark.range(xrep.toLong).select(col("id").as("__rep")))
        .withColumn("vec_id", col("vec_id") * xrep + col("__rep"))
        .withColumn("embedding",
          expr("transform(embedding, (x, i) -> CASE WHEN __rep > 0 AND i = CAST(__rep % 64 AS INT) THEN -x ELSE x END)"))
        .drop("__rep")
    def fixture(tag: String, pmil: Int): String = {
      val d = java.nio.file.Files.createTempDirectory(s"cns-$tag").toString
      val isDelta = pmod(xxhash64(col("vec_id")), lit(1000L)) < pmil
      full.filter(!isDelta).write.mode("overwrite")
        .parquet(s"$d/embeddings.parquet")
      val base = Tables.embeddings(spark, d)
      val delta = full.filter(isDelta).select("vec_id", "embedding")
      Graph.ensureKnnGraph(spark, d)
      Graph.ensureGraphStats(spark, d) // gen-0 build, untimed
      Graph.appendKnnGraph(spark, d, delta, base)
      Dedup.releaseSlots()
      d
    }
    def dropLogs(d: String): Unit = {
      val name = new java.io.File(d).getName
      for {
        a <- Option(new java.io.File(wh).listFiles()).getOrElse(Array.empty)
        if a.getName.startsWith("knn_graph_") && a.getName.contains(name)
        cur <- graft.core.ArtifactStore.current(a.toString)
      } {
        // both log families: the census keys on edge_delta, the cc
        // analytics on pair_delta — dropping both makes the nologs
        // fixture's census AND components phases take the full path,
        // so the TIMINGS meta compares each phase incremental vs full
        for (fam <- Seq("edge_delta", "pair_delta")) {
          val edl = new java.io.File(cur, fam)
          if (edl.isDirectory) rm(edl)
        }
      }
    }

    // per-mil delta sizes: 2 (a micro-batch), 10 (1%), 100 (bulk 10%)
    for (pmil <- pmils) {
      val d1 = fixture(s"inc$pmil", pmil)
      val (s1, tInc) = time(Graph.ensureGraphStats(spark, d1))
      Dedup.releaseSlots()
      val d2 = fixture(s"ful$pmil", pmil)
      dropLogs(d2) // coverage check fails → full 3-way join
      val (s2, tFul) = time(Graph.ensureGraphStats(spark, d2))
      Dedup.releaseSlots()
      println(s"""{"probe":"census_refresh","sf":"$sfDir","xrep":$xrep,"delta_pmil":$pmil,""" +
        s""""refresh_logs_s":${math.round(tInc * 1000) / 1000.0},""" +
        s""""refresh_nologs_s":${math.round(tFul * 1000) / 1000.0},""" +
        s""""tri_mode_logs":"${Graph.graphTriMode(s1)}",""" +
        s""""tri_mode_nologs":"${Graph.graphTriMode(s2)}",""" +
        s""""stats_mode_logs":"${Graph.graphStatsMode(s1)}",""" +
        s""""stats_mode_nologs":"${Graph.graphStatsMode(s2)}",""" +
        s""""kcore_mode_logs":"${Graph.graphKcoreMode(s1)}",""" +
        s""""kcore_decline_logs":"${Graph.graphKcoreDecline(s1)}",""" +
        // the isolated phase terms: whole-refresh differencing is
        // dominated by the always-full PageRank/PPR loops; these come
        // from the refresh's own TIMINGS meta file
        s""""phases_logs":${Graph.graphStatsTimings(s1)},""" +
        s""""phases_nologs":${Graph.graphStatsTimings(s2)}}""")
    }
    spark.stop()
  }
}
