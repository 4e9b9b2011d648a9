package graft.tools

import graft.operators.{Dedup, Graph}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch-scaling probe for graph-ANN serving (dev tool): time
  * [[Graph.graphAnnBatchOn]] at Q = 8 / 64 / 256 queries on the
  * stored sf graph. The claim under test: the driver-paced shared-hop
  * loop's per-hop work is one partition-pruned edge job whose input is
  * the batch's beam pairs (≤ Q·beam rows broadcast) — so wall time
  * must grow far slower than Q (the hop count is the max per-query
  * fixpoint round, shared across the batch), and the per-query visited
  * attestations must stay inside the 1 + hops·beam·G construction
  * bound at every Q. Results recorded in NOTES/ARCHITECTURE.
  */
object GraphBatchProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graph.ensureKnnGraph(spark, d)
    val bound = graft.operators.Dedup.SrpTables.toLong *
      graft.operators.Dedup.MaxBucket +
      Graph.GannHops.toLong * Graph.GannBeam * Graph.GraphTopG
    for (q <- Seq(8L, 64L, 256L); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val rows = Graph.graphAnnBatchOn(
          graft.core.Tables.embeddings(spark, d),
          Graph.storedEdgesPartitioned(spark, d),
          Graph.storedBuckets(spark, d),
          col("vec_id") < q)
        .collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val perQ = rows.groupBy(_.getLong(0))
      val vis = perQ.values.map(_.head.getLong(4))
      val hops = perQ.values.map(_.head.getLong(5))
      println(f"Q=$q%-4d rep$rep wall=${wall}%6.2fs  per-q=${wall / q * 1000}%7.1f ms  " +
        f"hops max=${hops.max} med=${hops.toSeq.sorted.apply(hops.size / 2)}  " +
        f"visited max=${vis.max} (bound $bound) total=${vis.sum}")
      Dedup.releaseSlots()
    }
    spark.stop()
  }
}
