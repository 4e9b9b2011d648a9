package graft.tools

import graft.operators.{Dedup, Graph, Indexed}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Filtered graph-ANN recall vs filter selectivity (dev tool): the
  * g9/g11 discipline keeps the walk predicate-agnostic and constrains
  * only the final top-K, arguing recall from "visited pool ≫ K". This
  * probe turns that argument into numbers: for predicates of ~20%
  * (the registered [[Indexed.FilterLabels]]), ~10%, and ~1%
  * selectivity, it serves the [[Graph.GannBatchQ]]-query batch from
  * the STORED graph with the predicate and reports per-query filtered
  * recall against filtered exact brute force. The expected shape:
  * recall holds while K·(1/selectivity) stays well inside the visited
  * pool, and degrades once the eligible fraction of the pool
  * approaches K — the number that decides when a label-partitioned
  * index (the filtered-ANN literature's answer) becomes necessary.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *      sbt "runMain graft.tools.FilteredRecallProbe"
  */
object FilteredRecallProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Graph.ensureKnnGraph(spark, d)
    val q = Graph.GannBatchQ
    val e = graft.core.Tables.embeddings(spark, d).persist()
    val n = e.count()
    val qv = e.filter(col("vec_id") < q)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val preds: Seq[(String, Column)] = Seq(
      ("labels(3,7) ~20%", col("label").isin(Indexed.FilterLabels: _*)),
      ("label=3     ~10%", col("label") === 3),
      ("label=3,id%10=0 ~1%", col("label") === 3 && pmod(col("vec_id"), lit(10)) === 0))
    for ((nm, pred) <- preds) {
      val selN = e.filter(pred).count()
      // filtered exact brute force per query — the g11-style oracle's
      // metric restricted to eligible nodes
      val exact: Map[Long, Set[Long]] = e.filter(pred)
        .select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(qv))
        .select(col("qid"), col("vec_id"),
          Graph.intDot(col("embedding"), col("qv")).as("sc"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("qid").orderBy(col("sc").desc, col("vec_id").asc)))
        .filter(col("rn") <= Graph.GannTopK)
        .select("qid", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var wall = 0.0
      var rows: Array[org.apache.spark.sql.Row] = Array.empty
      for (_ <- 1 to 2) { // rep 1 warms, rep 2 reported
        val t0 = System.nanoTime()
        rows = Graph.graphAnnBatchOn(e,
          Graph.storedEdgesPartitioned(spark, d),
          Graph.storedBuckets(spark, d), Graph.storedBucketSizes(spark, d),
          col("vec_id") < q, allowed = Some(pred)).collect()
        wall = (System.nanoTime() - t0) / 1e9
      }
      val byQ = rows.groupBy(_.getLong(0))
      // denominator per query: |eligible exact top-K| (a 1% filter can
      // have fewer than K eligible nodes in total)
      val recalls = (0L until q).map { qid =>
        val want = exact.getOrElse(qid, Set.empty)
        val got = byQ.get(qid).map(_.map(_.getLong(1)).toSet).getOrElse(Set.empty)
        if (want.isEmpty) 1.0 else got.intersect(want).size.toDouble / want.size
      }
      val vis = byQ.values.map(_.head.getLong(4)).toSeq.sorted
      val visMed = if (vis.isEmpty) 0L else vis(vis.size / 2)
      println(f"$nm%-22s sel=${100.0 * selN / n}%5.1f%% (n=$selN%4d)  wall=$wall%5.2fs  " +
        f"filtered recall mean=${recalls.sum / recalls.size}%5.2f min=${recalls.min}%5.2f  " +
        f"visited med=$visMed%4d  eligible-in-pool≈${visMed * selN / n}%3d vs K=${Graph.GannTopK}")
      Dedup.releaseSlots()
    }
    spark.stop()
  }
}
