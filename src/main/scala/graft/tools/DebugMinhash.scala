package graft.tools

import graft.core.Tables._
import graft.operators.Dedup._
import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the minhash pipeline stages (dev tool). */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val par = s.sparkContext.defaultParallelism
    val sh = documents(s, d)
      .repartition(par, col("doc_id"))
      .select(col("doc_id"), shingles(col("text")).as("gs"))
      .filter(size(col("gs")) > 0)
      .select(col("doc_id"), col("gs"), transform(col("gs"), g => baseHash(g)).as("hs"))
      .repartition(par, col("doc_id"))
    time("sh.count")(sh.count())
    val sigs = sh.select(
      (col("doc_id") +: minhashSig(col("hs")).zipWithIndex.map { case (c, i) => c.as(s"sig$i") }): _*)
    time("sigs.count")(sigs.count())
    time("sigs.noop")(sigs.write.format("noop").mode("overwrite").save())
    val bandStructs = (0 until Bands).map { b =>
      val parts = (0 until RowsPerBand).map(r => col(s"sig${b * RowsPerBand + r}").cast("string"))
      struct(lit(b).as("band"), md5(concat_ws(",", parts: _*).cast("binary")).as("bh"))
    }
    val buckets = sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
      .select(col("doc_id"), col("e.band").as("band"), col("e.bh").as("bh"))
    time("buckets.noop")(buckets.write.format("noop").mode("overwrite").save())
    val cand = buckets.as("a").join(buckets.as("b"),
      col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    time("cand.count")(cand.count())
    time("full query")(graft.operators.Dedup.d2MinhashLsh(s, d).write.format("noop").mode("overwrite").save())
    s.stop()
  }
}
