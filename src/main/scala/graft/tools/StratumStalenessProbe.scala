package graft.tools

import graft.core.Tables
import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures what trickle ingest does to the STRATIFIED artifact's
  * serve quality (dev tool) — the number that motivates (or
  * deprioritizes) the cap-crossing rebuild trigger ported to it in
  * r16: split a held-out tenth into N tranches, append them one by
  * one, record the crossed-bucket counter trajectory, then compare
  * the g13-band recall (stratum walk + residual post-filter vs
  * filtered exact brute force) of the APPENDED artifact against a
  * FRESH one-shot build of the same union corpus. Append ≡ rebuild
  * exactness holds while no (stratum, tbl, bkt) occupancy crosses the
  * cap, so any recall gap here is exactly the staleness the counter
  * is supposed to witness.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *      sbt "runMain graft.tools.StratumStalenessProbe"
  */
object StratumStalenessProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val tranches = sys.env.getOrElse("SPARK_GRAFT_TRANCHES", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stratum-staleness-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("sst-wh").toString
    sys.props("graft.warehouse") = wh

    val full = Tables.embeddings(spark, sfDir)
    val st = Graph.StratumServeLabel.toLong
    val pred = col(Graph.StratumCol) === Graph.StratumServeLabel &&
      pmod(col("vec_id"), lit(10)) === 0
    val isQ = col("vec_id") < Graph.GannBatchQ

    // exact filtered top-K per query over the UNION corpus — the
    // recall baseline both artifacts are judged against
    val qv = full.filter(isQ)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = full.filter(pred).select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(qv))
      .select(col("qid"), col("vec_id"),
        Graph.intDot(col("embedding"), col("qv")).as("sc"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("sc").desc, col("vec_id").asc)))
      .filter(col("rk") <= Graph.GannTopK)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    def recallOf(artifactDataset: String): (Double, Double, Double) = {
      val t0 = System.nanoTime()
      val got = Graph.graphAnnBatchOn(full,
          Graph.stratumEdgesOf(spark, artifactDataset, st),
          Graph.stratumRoutingOf(spark, artifactDataset, st),
          Graph.stratumBucketSizesOf(spark, artifactDataset, st),
          isQ, allowed = Some(pred))
        .select("qid", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val wall = (System.nanoTime() - t0) / 1e9
      val rs = exact.toSeq.map { case (q, want) =>
        if (want.isEmpty) 1.0
        else got.getOrElse(q, Set.empty).count(want).toDouble / want.size
      }
      (rs.sum / rs.size, rs.min, wall)
    }

    // trickled fixture: 90% base, the held-out tenth appended in
    // `tranches` label-mixed steps (the realistic ingest shape)
    val isHeld = pmod(xxhash64(col("vec_id")), lit(10L)) === 0
    val d = java.nio.file.Files.createTempDirectory("sst-trickle").toString
    full.filter(!isHeld).write.mode("overwrite")
      .parquet(s"$d/embeddings.parquet")
    var corpus: DataFrame = Tables.embeddings(spark, d)
      .select("vec_id", "embedding")
    Graph.ensureStratumGraph(spark, d)
    for (i <- 0 until tranches) {
      val tr = full.filter(isHeld &&
          pmod(xxhash64(col("vec_id") + 7), lit(tranches.toLong)) === i)
        .select(col("vec_id"), col("embedding"), col(Graph.StratumCol))
      val n = tr.count()
      val t0 = System.nanoTime()
      val v = Graph.appendStratumGraph(spark, d, tr, corpus)
      val w = (System.nanoTime() - t0) / 1e9
      corpus = corpus.unionByName(tr.select("vec_id", "embedding"))
      println(s"""{"probe":"stratum_staleness","step":$i,"rows":$n,""" +
        s""""append_s":${math.round(w * 1000) / 1000.0},""" +
        s""""gen":${Graph.graphGen(v)},""" +
        s""""crossed":${Graph.graphCrossedBuckets(v)}}""")
      Dedup.releaseSlots()
    }
    val (mT, minT, wT) = recallOf(d)

    // fresh one-shot build over the identical union corpus
    val d2 = java.nio.file.Files.createTempDirectory("sst-fresh").toString
    full.write.mode("overwrite").parquet(s"$d2/embeddings.parquet")
    Graph.ensureStratumGraph(spark, d2)
    val (mF, minF, wF) = recallOf(d2)
    println(s"""{"probe":"stratum_staleness","sf":"$sfDir","tranches":$tranches,""" +
      s""""recall_trickled_mean":${math.round(mT * 1000) / 1000.0},""" +
      s""""recall_trickled_min":${math.round(minT * 1000) / 1000.0},""" +
      s""""recall_fresh_mean":${math.round(mF * 1000) / 1000.0},""" +
      s""""recall_fresh_min":${math.round(minF * 1000) / 1000.0},""" +
      s""""serve_trickled_s":${math.round(wT * 1000) / 1000.0},""" +
      s""""serve_fresh_s":${math.round(wF * 1000) / 1000.0}}""")
    spark.stop()
  }
}
