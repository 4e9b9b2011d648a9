package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cardinalities of the d2 pipeline's stages at a given sf (dev tool,
  * opt r20): how many band rows, candidate pairs, and verified pairs
  * the bucket self-join actually produces — the denominator for
  * reading the bench's task-time numbers.
  */
object D2CountsProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.documents(s, d)
    val par = s.sparkContext.defaultParallelism
    val sh = docs.repartition(par, col("doc_id"))
      .select(col("doc_id"), Dedup.shingles(col("text")).as("gs"))
      .filter(size(col("gs")) > 0)
      .persist()
    println(s"[d2c] docs=${docs.count()} shingled=${sh.count()} " +
      s"shingles=${sh.agg(sum(size(col("gs")))).head.getLong(0)}")
    val bands = sh.select(col("doc_id"),
      posexplode(graft.functions.TextHashKernels.minhashBands(
        col("gs"), Dedup.HashCoeffs, Dedup.HashPrime, Dedup.RowsPerBand))
        .as(Seq("band", "bh"))).persist()
    println(s"[d2c] bandRows=${bands.count()}")
    val bs = bands.groupBy("band", "bh").count()
    println(s"[d2c] buckets=${bs.count()} maxBucket=${bs.agg(max("count")).head.getLong(0)}")
    val cand = bands.as("a").join(bands.as("b"),
      col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    println(s"[d2c] candRows=${cand.count()} candDistinct=${cand.distinct().count()}")
    val res = Dedup.d2MinhashLsh(s, d)
    println(s"[d2c] verified=${res.count()}")
    s.stop()
  }
}
