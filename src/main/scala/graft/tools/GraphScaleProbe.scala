package graft.tools

import graft.core.Tables
import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-behavior probe for the graph family (dev tool, ScaleProbe's
  * sibling): replicate the sf0.1 embeddings N× with remapped ids and
  * PERTURBED vectors (pure replication would explode one LSH bucket
  * per source vector — N identical copies share every bucket — which
  * probes the cap, not the operator), then time kNN-graph build,
  * PageRank, k-core, and graph-ANN serving. Near-linear vec/s across
  * scales = per-candidate cost, the 100 TB claim. Results in
  * ARCHITECTURE.md.
  */
object GraphScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scales = Seq(1, 4, 10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (n <- scales) {
      // deterministic per-replica perturbation: every replica but the
      // source (__rep = 0) flips the sign of one replica-chosen
      // coordinate — preserves norms and neighborhood STATISTICS while
      // decorrelating bucket signs. Every replica must be distinct: an
      // unperturbed copy shares every LSH bucket with its source, so
      // buckets blow past MaxBucket and the probe measures the cap,
      // not the operator.
      val e0 = Tables.embeddings(spark, d)
      val e = e0.crossJoin(spark.range(n).select(col("id").as("__rep")))
        .withColumn("vec_id", col("vec_id") * n + col("__rep"))
        .withColumn("embedding",
          expr("transform(embedding, (x, i) -> CASE WHEN __rep > 0 AND i = CAST(__rep % 64 AS INT) THEN -x ELSE x END)"))
        .drop("__rep")
        .persist()
      val nv = e.count()

      val tGraph = time { noop(Graph.knnGraphEdgesOn(e)) }
      val edges = Graph.knnGraphEdgesOn(e)
      val tPr = time { noop(Graph.pageRankOn(e.select("vec_id"), edges)) }
      val tCore = time { noop(Graph.kcoreOn(
        graft.operators.Dedup.cacheSlot("gsp-thr", Graph.scoredPairsOn(e)
          .filter(col("w") >= Graph.CoreWmin)
          .select(col("id_a").as("src"), col("id_b").as("dst"))))) }
      val routing = Graph.bucketRowsOf(e)
      // live edges lack the stored layout's denormalized dst vector —
      // compose it, as the artifact build does
      val annEdges = Graph.knnGraphEdgesOn(e)
        .join(e.select(col("vec_id").as("dst"), col("embedding").as("dvec")),
          "dst")
      val tAnn = time { noop(Graph.graphAnnOn(e, annEdges, routing)) }
      println(f"x$n%-3d vecs=$nv%7d  graph=${tGraph}%6.2fs (${nv / tGraph}%8.0f v/s)  " +
        f"pagerank=${tPr}%6.2fs  kcore=${tCore}%6.2fs  ann=${tAnn}%6.2fs")
      graft.operators.Dedup.releaseSlots()
      e.unpersist()
    }
    spark.stop()
  }
}
