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
    // recall baseline both artifacts are judged against (computed
    // AFTER the appends so adversarial-mode duplicates that land in
    // the serve band are part of the truth set)
    def exactOf(union: DataFrame): Map[Long, Set[Long]] = {
      val qv = union.filter(isQ)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      union.filter(pred).select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(qv))
        .select(col("qid"), col("vec_id"),
          Graph.intDot(col("embedding"), col("qv")).as("sc"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("qid")
            .orderBy(col("sc").desc, col("vec_id").asc)))
        .filter(col("rk") <= Graph.GannTopK)
        .select("qid", "vec_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    }
    var exact: Map[Long, Set[Long]] = Map.empty

    // serve with the artifact's LIVE corpus frame, not the base table
    // (r18 probe fix): the adversarial appends add vectors `full`
    // never held, and graphAnnBatchOn scores seeds by joining `e` on
    // vec_id — a stale `e` silently DROPPED every appended seed from
    // scoring, so the walk was handicapped against a union-corpus
    // exact baseline and the measured recall floor was the probe's
    // own artifact, not the engine's
    def recallOf(artifactDataset: String,
        corpusE: DataFrame): (Double, Double, Double) = {
      val t0 = System.nanoTime()
      val got = Graph.graphAnnBatchOn(corpusE,
          Graph.stratumEdgesOf(spark, artifactDataset, st),
          Graph.stratumRoutingOf(spark, artifactDataset, st),
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

    // two ingest shapes:
    //  - "trickle" (default): 90% base, the held-out tenth appended in
    //    `tranches` label-mixed steps — the realistic shape (r16:
    //    zero crossings, recall parity);
    //  - "adversarial" (SPARK_GRAFT_STRATUM_MODE=adversarial):
    //    duplicate-heavy bursts — each tranche appends hundreds of
    //    copies of the same base signatures, driving their
    //    (stratum,tbl,bkt) occupancies across Dedup.MaxBucket so the
    //    cumulative crossed counter exceeds the rebuild budget and
    //    the r16 self-heal trigger FIRES mid-run (observable as a
    //    gen jump + counter reset in the step trajectory). The final
    //    recall compare against a fresh one-shot build of the same
    //    union corpus measures whether the healed artifact restored
    //    per-stratum exactness.
    val mode = sys.env.getOrElse("SPARK_GRAFT_STRATUM_MODE", "trickle")
    val isHeld = pmod(xxhash64(col("vec_id")), lit(10L)) === 0
    val d = java.nio.file.Files.createTempDirectory("sst-trickle").toString
    val baseTable = if (mode == "adversarial") full else full.filter(!isHeld)
    baseTable.write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    // carries the stratum/label column too: the serve-side `e` frame
    // must evaluate the band predicate over appended vectors as well
    var corpus: DataFrame = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"), col(Graph.StratumCol))
    // union of every appended tranche WITH all columns — the fresh
    // one-shot fixture needs the identical corpus
    var appendedAll: Option[DataFrame] = None
    Graph.ensureStratumGraph(spark, d)
    def trancheOf(i: Int): DataFrame = mode match {
      case "adversarial" =>
        // 30 base signatures, copy windows per tranche: 3 establish
        // old occupancy >= 2, then 499-copy bursts cross MaxBucket
        // (old in [2,1000] and old+new > 1000 => counted) at step 2
        val windows = Seq((0L, 3L), (3L, 502L), (502L, 1001L),
          (1001L, 1100L), (1100L, 1200L))
        // tranches past the scripted windows keep appending FRESH
        // copy indices (never the same vec_ids twice — a duplicate-id
        // append is a ledger violation this probe must not commit)
        val (lo, hi) =
          if (i < windows.size) windows(i)
          else (1200L + (i - windows.size) * 100L,
            1300L + (i - windows.size) * 100L)
        full.orderBy("vec_id").limit(30)
          .crossJoin(spark.range(lo, hi).select(col("id").as("__cp")))
          .withColumn("vec_id",
            lit(10000000L) + col("vec_id") * 2000L + col("__cp"))
          .drop("__cp")
          .select(col("vec_id"), col("embedding"), col(Graph.StratumCol))
      case _ =>
        full.filter(isHeld &&
            pmod(xxhash64(col("vec_id") + 7), lit(tranches.toLong)) === i)
          .select(col("vec_id"), col("embedding"), col(Graph.StratumCol))
    }
    for (i <- 0 until tranches) {
      val tr = trancheOf(i)
      val n = tr.count()
      val t0 = System.nanoTime()
      val v = Graph.appendStratumGraph(spark, d, tr, corpus)
      val w = (System.nanoTime() - t0) / 1e9
      corpus = corpus.unionByName(
        tr.select(col("vec_id"), col("embedding"), col(Graph.StratumCol)))
      appendedAll = Some(appendedAll.fold(tr)(_.unionByName(tr)))
      println(s"""{"probe":"stratum_staleness","mode":"$mode","step":$i,"rows":$n,""" +
        s""""append_s":${math.round(w * 1000) / 1000.0},""" +
        s""""gen":${Graph.graphGen(v)},""" +
        s""""crossed":${Graph.graphCrossedBuckets(v)}}""")
      Dedup.releaseSlots()
    }
    // fresh one-shot build over the identical union corpus
    val d2 = java.nio.file.Files.createTempDirectory("sst-fresh").toString
    val freshTable = (mode, appendedAll) match {
      case ("adversarial", Some(app)) => full.unionByName(app)
      case _ => full
    }
    freshTable.write.mode("overwrite").parquet(s"$d2/embeddings.parquet")
    exact = exactOf(Tables.embeddings(spark, d2))
    val (mT, minT, wT) = recallOf(d, corpus)
    Graph.ensureStratumGraph(spark, d2)
    val (mF, minF, wF) = recallOf(d2,
      Tables.embeddings(spark, d2)
        .select(col("vec_id"), col("embedding"), col(Graph.StratumCol)))
    println(s"""{"probe":"stratum_staleness","mode":"$mode","sf":"$sfDir","tranches":$tranches,""" +
      s""""recall_trickled_mean":${math.round(mT * 1000) / 1000.0},""" +
      s""""recall_trickled_min":${math.round(minT * 1000) / 1000.0},""" +
      s""""recall_fresh_mean":${math.round(mF * 1000) / 1000.0},""" +
      s""""recall_fresh_min":${math.round(minF * 1000) / 1000.0},""" +
      s""""serve_trickled_s":${math.round(wT * 1000) / 1000.0},""" +
      s""""serve_fresh_s":${math.round(wF * 1000) / 1000.0}}""")
    spark.stop()
  }
}
