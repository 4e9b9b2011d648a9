package graft.tools

import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Recall/latency curve for graph-ANN serving (dev tool): sweep the
  * graph out-degree G and the serve beam width at the bench scale and
  * report recall@10 against exact brute force next to visited_n and
  * wall time — the `q_v21_nprobe_curve` discipline on the graph path.
  * The shipped (G, beam) knee was tuned at sf0.01 (NOTES_r13's grid);
  * a 10× corpus moves the knee, so the curve must be re-measured at
  * the scale the bench claims (sf0.1), not asserted from the smaller
  * grid. Recall is averaged over the [[Graph.GannBatchQ]] benchmark-
  * prefix queries (the g8 batch), which includes g10's single query.
  *
  * G ≠ [[Graph.GraphTopG]] rows build their edge table from the same
  * scored-pair pass with a different top-G cut, served as in-memory
  * frames — recall/visited are exact; wall times for those rows are
  * indicative (no stored-layout partition pruning), so the shipped-G
  * row is the only one to read latency from.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *      sbt "runMain graft.tools.GannRecallProbe"
  */
object GannRecallProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = Graph.GannBatchQ
    val e = graft.core.Tables.embeddings(spark, d)
      .select("vec_id", "embedding").persist()
    val n = e.count()
    // exact brute-force top-K per query, once (the g10 oracle's metric)
    val qv = e.filter(col("vec_id") < q)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact: Map[Long, Set[Long]] = e.crossJoin(broadcast(qv))
      .select(col("qid"), col("vec_id"),
        Graph.intDot(col("embedding"), col("qv")).as("sc"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("sc").desc, col("vec_id").asc)))
      .filter(col("rn") <= Graph.GannTopK)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val routing = Graph.bucketRowsOf(e).persist()
    val scored = Graph.scoredPairsOn(e)
    println(s"corpus n=$n  shipped G=${Graph.GraphTopG} beam=${Graph.GannBeam}")
    val gSweep = sys.env.get("SPARK_GRAFT_PROBE_G")
      .map(_.split(",").toSeq.map(_.trim.toInt)).getOrElse(Seq(4, 8, 16))
    for (g <- gSweep) {
      val sym = scored.select(col("id_a").as("src"), col("id_b").as("dst"), col("w"))
        .union(scored.select(col("id_b").as("src"), col("id_a").as("dst"), col("w")))
      val edges = sym
        .withColumn("rk", row_number().over(
          Window.partitionBy("src").orderBy(col("w").desc, col("dst").asc)))
        .filter(col("rk") <= g)
        .join(e.select(col("vec_id").as("dst"), col("embedding").as("dvec")), "dst")
        .withColumn("bucket", Graph.edgeBucketOf(col("src")))
        .select("src", "dst", "w", "rk", "dvec", "bucket")
        .persist()
      edges.count()
      val stableK = sys.env.get("SPARK_GRAFT_PROBE_STABLEK")
        .map(_.trim.toInt)
      for (beam <- Seq(8, 16, 32, 64);
           hops <- sys.env.get("SPARK_GRAFT_PROBE_HOPS")
             .map(_.split(",").toSeq.map(_.trim.toInt))
             .getOrElse(Seq(Graph.GannHops))) {
        var wall = 0.0
        var rows: Array[org.apache.spark.sql.Row] = Array.empty
        for (_ <- 1 to 2) { // rep 1 warms codegen/JIT; rep 2 is reported
          val t0 = System.nanoTime()
          rows = Graph.graphAnnBatchOn(e, edges, routing,
            col("vec_id") < q, beam = beam, hops = hops,
            stableK = stableK).collect()
          wall = (System.nanoTime() - t0) / 1e9
        }
        val byQ = rows.groupBy(_.getLong(0))
        val recalls = byQ.map { case (qid, rs) =>
          qid -> rs.map(_.getLong(1)).count(exact(qid).contains) }
        val vis = byQ.values.map(_.head.getLong(4)).toSeq.sorted
        val hp = byQ.values.map(_.head.getLong(5)).toSeq.sorted
        println(f"G=$g%-3d beam=$beam%-3d hops=$hops%-3d wall=$wall%5.2fs  " +
          f"recall@10 mean=${recalls.values.sum.toDouble / recalls.size}%5.2f " +
          f"min=${recalls.values.min}%2d q1=${recalls.getOrElse(Graph.GannQueryId, -1)}%2d  " +
          f"visited med=${vis(vis.size / 2)}%4d max=${vis.max}%4d " +
          f"(${100.0 * vis(vis.size / 2) / n}%4.1f%%)  " +
          f"hops med=${hp(hp.size / 2)} max=${hp.max}")
      }
      edges.unpersist()
    }
    Dedup.releaseSlots()
    spark.stop()
  }
}
